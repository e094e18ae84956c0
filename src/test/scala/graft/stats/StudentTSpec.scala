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

  test("CI half-width: null when n<2, positive and shrinking in n") {
    val df = Seq((1.0, 1L), (1.0, 5L), (1.0, 50L)).toDF("sem", "n")
      .select(StudentT.ciHalfWidth(col("sem"), col("n")).as("ci")).collect()
    assert(df(0).isNullAt(0))
    val ci5 = df(1).getDouble(0)
    val ci50 = df(2).getDouble(0)
    assert(ci5 > ci50 && ci50 > 0)
  }
}
