package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Welch t-test aggregator: reference edge-case parity
  * (`/root/reference/etl_pipeline.py:136-139`), merge correctness under
  * arbitrary partitioning (SURVEY §7.4 #2), and agreement with the
  * independent relational formulation. */
class WelchSpec extends SparkSpec {
  import spark.implicits._

  /** Independent straight-line Welch implementation (two-pass). */
  private def welchRef(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    def meanVar(x: Seq[Double]) = {
      val m = x.sum / x.size
      (m, x.map(v => (v - m) * (v - m)).sum / (x.size - 1))
    }
    val (ma, va) = meanVar(a)
    val (mb, vb) = meanVar(b)
    val se2 = va / a.size + vb / b.size
    val t = (ma - mb) / math.sqrt(se2)
    val df = se2 * se2 / (va * va / (a.size * a.size * (a.size - 1.0)) +
      vb * vb / (b.size * b.size * (b.size - 1.0)))
    (t, df)
  }

  private def runAgg(a: Seq[Double], b: Seq[Double], parts: Int): WelchOut = {
    val data = a.map(WelchIn(_, after = false)) ++ b.map(WelchIn(_, after = true))
    spark.createDataset(data).repartition(parts)
      .groupByKey(_ => 1).agg(WelchTTest.toColumn)
      .collect().head._2
  }

  test("matches independent two-pass implementation") {
    val a = Seq(27.5, 21.0, 19.0, 23.6, 17.0, 17.9, 16.9, 20.1, 21.9, 22.6, 23.1, 19.6, 19.0, 21.7, 21.4)
    val b = Seq(27.1, 22.0, 20.8, 23.4, 23.4, 23.5, 25.8, 22.0, 24.8, 20.2, 21.9, 22.1, 22.9, 30.7, 26.5)
    val (tExp, dfExp) = welchRef(a, b)
    val out = runAgg(a, b, 3)
    assert(math.abs(out.t_stat.get - tExp) < 1e-10, s"t ${out.t_stat} vs $tExp")
    assert(math.abs(out.welch_df.get - dfExp) < 1e-10, s"df ${out.welch_df} vs $dfExp")
    assert(out.p_value.get > 0 && out.p_value.get < 1)
  }

  test("n<2 on either side yields no test (reference guard)") {
    val out1 = runAgg(Seq(1.0), Seq(2.0, 3.0, 4.0), 2)
    assert(out1.t_stat.isEmpty && out1.p_value.isEmpty)
    assert(out1.mean_before.contains(1.0)) // means still reported
    val out2 = runAgg(Seq(1.0, 2.0), Seq(5.0), 2)
    assert(out2.t_stat.isEmpty)
    // empty side: mean is None too
    val data = Seq(WelchIn(1.0, after = true), WelchIn(2.0, after = true))
    val out3 = spark.createDataset(data).groupByKey(_ => 1).agg(WelchTTest.toColumn).collect().head._2
    assert(out3.n_before == 0 && out3.mean_before.isEmpty && out3.t_stat.isEmpty)
  }

  test("merge is partition-invariant (Chan buffer)") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 10) {
      val a = Seq.fill(2 + rng.nextInt(40))(rng.nextDouble() * 200 - 100)
      val b = Seq.fill(2 + rng.nextInt(40))(rng.nextDouble() * 200 - 50)
      val r1 = runAgg(a, b, 1)
      val r7 = runAgg(a, b, 7)
      assert(math.abs(r1.t_stat.get - r7.t_stat.get) < 1e-9, s"trial $trial t")
      assert(math.abs(r1.welch_df.get - r7.welch_df.get) < 1e-9, s"trial $trial df")
      assert(r1.n_before == r7.n_before && r1.n_after == r7.n_after)
    }
  }

  private def typedResults(agg: org.apache.spark.sql.TypedColumn[WelchIn, WelchOut])
      : Map[(String, String), (Double, Double)] = {
    val w = graft.CoreParityQueries.W
    val fact = graft.analysis.EventsFact.fact(spark, sf())
    fact
      .filter(col("year").between(w.beforeLo, w.beforeHi) || col("year").between(w.afterLo, w.afterHi))
      .select(col("country"), col("antigen"), col("coverage_pct"),
        col("year").between(w.afterLo, w.afterHi).as("after"))
      .as[(String, String, Double, Boolean)]
      .groupByKey { case (c, a, _, _) => (c, a) }
      .mapValues { case (_, _, v, af) => WelchIn(v, af) }
      .agg(agg)
      .collect().collect { case ((c, a), out) if out.t_stat.isDefined =>
        (c, a) -> (out.t_stat.get, out.welch_df.get)
      }.toMap
  }

  test("agrees with the relational formulation on the events fact") {
    val w = graft.CoreParityQueries.W
    val fact = graft.analysis.EventsFact.fact(spark, sf())
    val rel = graft.analysis.CoverageQueries.welchRelational(fact, w)
      .filter(col("t_stat").isNotNull)
      .select("country", "antigen", "t_stat", "welch_df")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rel.nonEmpty, "expected at least one testable series at sf0.001")

    // exact lane: same quantized integers, same IEEE op chains ⇒
    // bitwise-equal t and df, no tolerance at all
    val exact = typedResults(WelchExactTTest.toColumn)
    assert(rel.keySet == exact.keySet)
    rel.foreach { case (k, (t, df)) =>
      assert(exact(k)._1 == t, s"$k t (exact lane must match bitwise)")
      assert(exact(k)._2 == df, s"$k df (exact lane must match bitwise)")
    }

    // Welford lane: full-double moments vs the relational quantized
    // ones — t shifts by O(quantization / stderr) ≈ 1e-5
    val welford = typedResults(WelchTTest.toColumn)
    assert(rel.keySet == welford.keySet)
    rel.foreach { case (k, (t, df)) =>
      assert(math.abs(welford(k)._1 - t) < 1e-4, s"$k t")
      assert(math.abs(welford(k)._2 - df) < 1e-4, s"$k df")
    }
  }

  test("exact lane is partition-invariant BITWISE and honors the n<2 guard") {
    def run(a: Seq[Double], b: Seq[Double], parts: Int): WelchOut = {
      val data = a.map(WelchIn(_, after = false)) ++ b.map(WelchIn(_, after = true))
      spark.createDataset(data).repartition(parts)
        .groupByKey(_ => 1).agg(WelchExactTTest.toColumn)
        .collect().head._2
    }
    val rng = new scala.util.Random(7)
    val a = Seq.fill(25)(rng.nextDouble() * 200 - 100)
    val b = Seq.fill(31)(rng.nextDouble() * 200 - 50)
    val r1 = run(a, b, 1)
    val r9 = run(a, b, 9)
    assert(r1.t_stat.get == r9.t_stat.get, "bitwise partition invariance (t)")
    assert(r1.welch_df.get == r9.welch_df.get, "bitwise partition invariance (df)")
    assert(r1.var_before.get == r9.var_before.get)
    assert(run(Seq(1.0), Seq(2.0, 3.0), 2).t_stat.isEmpty, "n<2 guard")
  }
}
