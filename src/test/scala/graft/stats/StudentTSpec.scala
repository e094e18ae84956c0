package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Student-t math vs classic table constants (scipy-parity check for
  * `t.ppf((1+0.95)/2, n-1)` at `/root/reference/etl_pipeline.py:42`). */
class StudentTSpec extends SparkSpec {
  import spark.implicits._

  test("t quantile matches classic two-sided 95% critical values") {
    // (df, t_0.975) — standard published table values
    val expected = Seq(1 -> 12.706204736, 4 -> 2.776445105, 9 -> 2.262157163)
    val got = expected.map(_._1).toDF("df")
      .select(col("df"), StudentT.tInv(lit(0.975), col("df").cast("double")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    expected.foreach { case (df, t) =>
      assert(math.abs(got(df) - t) < 1e-8, s"df=$df got ${got(df)} want $t")
    }
  }

  test("t quantile is null for df < 1 (n<2 CI guard)") {
    val r = Seq(0.0, -1.0).toDF("df")
      .select(StudentT.tInv(lit(0.975), col("df")).as("t")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("two-sided p-value: symmetric, 1 at t=0, small for large |t|") {
    val r = Seq((0.0, 10.0), (2.5, 10.0), (-2.5, 10.0), (50.0, 10.0)).toDF("t", "df")
      .select(StudentT.tPValue2(col("t"), col("df")).as("p")).collect().map(_.getDouble(0))
    assert(math.abs(r(0) - 1.0) < 1e-12)
    assert(math.abs(r(1) - r(2)) < 1e-12) // symmetry
    assert(r(1) > 0.02 && r(1) < 0.04)    // p(|t|=2.5, df=10) ≈ 0.0314
    assert(r(3) < 1e-10)
  }

  test("t CDF matches arbitrary-precision ground truth at hostile dfs and deep tails") {
    // (x, df, P(T<=x)) computed with mpmath at 40 digits (regularized
    // incomplete beta) — stronger reference than scipy's own doubles.
    // dfs: cauchy (1), fractional (1.5, 4.5), small (2), moderate (30),
    // near-normal (1e6); x spans deep left tail to deep right tail.
    val cases: Seq[(Double, Double, Double)] = Seq(
      (-30.0, 1.0, 0.010606402405535423),
      (-8.0, 1.0, 0.039583424160565542),
      (-3.5, 1.0, 0.088585532782904749),
      (-1.0, 1.0, 0.25),
      (-0.2, 1.0, 0.43716704181099882),
      (0.7, 1.0, 0.69440011221421479),
      (2.0, 1.0, 0.85241638234956673),
      (12.0, 1.0, 0.97353532394041012),
      (50.0, 1.0, 0.99363465089902720),
      (-30.0, 1.5, 0.0022928211614897026),
      (-8.0, 1.5, 0.016459175470453411),
      (-1.0, 1.5, 0.22556768363835516),
      (2.0, 1.5, 0.88790583482197447),
      (12.0, 1.5, 0.99097898536298607),
      (-30.0, 2.0, 0.00055463134097982946),
      (-3.5, 2.0, 0.036413675027234668),
      (2.0, 2.0, 0.90824829046386302),
      (50.0, 2.0, 0.99980011992005596),
      (-30.0, 4.5, 1.1719871493942603e-6),
      (-8.0, 4.5, 0.00039804739408227024),
      (-1.0, 4.5, 0.18400254194009429),
      (2.0, 4.5, 0.94587104640943749),
      (12.0, 4.5, 0.99993108401173363),
      (-30.0, 30.0, 3.1258958153044440e-24),
      (-8.0, 30.0, 3.1329112378503795e-9),
      (-3.5, 30.0, 0.00073840371882212653),
      (2.0, 30.0, 0.97268747751850845),
      (5.0, 30.0, 0.99998835165726650),
      (-8.0, 1e6, 6.2275317166012598e-16),
      (-3.5, 1e6, 0.00023263919684051749),
      (-1.0, 1e6, 0.15865537491678906),
      (2.0, 1e6, 0.97724973307434040),
      (5.0, 1e6, 0.99999971330010646),
    )
    cases.foreach { case (x, df, want) =>
      val got = TMath.cdf(x, df)
      val absErr = math.abs(got - want)
      val relErr = absErr / want
      // near-0/near-1 region: absolute ≤ 1e-12; tails below 1e-12:
      // commons-math3's continued fraction must keep relative accuracy
      assert(absErr <= 1e-12 || relErr <= 1e-9,
        s"cdf($x, df=$df): got $got want $want (abs $absErr rel $relErr)")
    }
    // symmetry identity everywhere on the grid
    cases.foreach { case (x, df, want) =>
      val s = TMath.cdf(x, df) + TMath.cdf(-x, df)
      assert(math.abs(s - 1.0) < 1e-12, s"symmetry at ($x, $df): $s")
    }
  }

  test("t PPF round-trips the CDF at hostile dfs including fractional") {
    for (df <- Seq(1.0, 1.5, 4.5, 30.0, 1e6); p <- Seq(1e-10, 1e-4, 0.3, 0.975, 1 - 1e-10)) {
      val x = TMath.ppf(p, df)
      val back = TMath.cdf(x, df)
      assert(math.abs(back - p) <= 1e-9 || math.abs(back - p) / p <= 1e-6,
        s"ppf/cdf roundtrip p=$p df=$df: x=$x back=$back")
    }
  }

  test("CI half-width: null when n<2, positive and shrinking in n") {
    val df = Seq((1.0, 1L), (1.0, 5L), (1.0, 50L)).toDF("sem", "n")
      .select(StudentT.ciHalfWidth(col("sem"), col("n")).as("ci")).collect()
    assert(df(0).isNullAt(0))
    val ci5 = df(1).getDouble(0)
    val ci50 = df(2).getDouble(0)
    assert(ci5 > ci50 && ci50 > 0)
  }
}
