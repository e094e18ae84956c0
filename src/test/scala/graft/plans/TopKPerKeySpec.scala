package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("custom exec equals the window row_number formulation") {
    val fact = graft.analysis.EventsFact.fact(spark, sf())
    val got = TopKPerKey.topKPerKey(fact, Seq("country", "antigen"),
        "coverage_pct", descending = true, k = 3, tiebreakCols = Seq("year"))
      .select("country", "antigen", "year", "coverage_pct")
      .orderBy(col("country"), col("antigen"), col("coverage_pct").desc, col("year"))
      .collect().toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("country", "antigen")
      .orderBy(col("coverage_pct").desc, col("year"))
    val want = fact.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("country", "antigen", "year", "coverage_pct")
      .orderBy(col("country"), col("antigen"), col("coverage_pct").desc, col("year"))
      .collect().toSeq
    assert(got == want)
  }

  test("partial-phase key cap: results identical under a pathological cap of 2") {
    // 250 distinct keys against maxPartialKeys=2 forces a flush every
    // few rows in the partial phase — output must not change (any
    // global top-k row is in the top-k of every segment containing it)
    val df = (0 until 1000).map(i => (i % 250, i)).toDF("key", "v").repartition(4)
    def run(): Seq[(Int, Int)] =
      TopKPerKey.topKPerKey(df, Seq("key"), "v", descending = true, k = 2)
        .select("key", "v").orderBy("key", "v")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val unbounded = run()
    spark.conf.set("graft.topk.maxPartialKeys", "2")
    try assert(run() == unbounded, "flush-capped partial must be lossless")
    finally spark.conf.unset("graft.topk.maxPartialKeys")
    assert(unbounded.size == 500, "2 rows per each of 250 keys")
  }

  test("the plan is the custom exec with one exchange and NO sort") {
    val fact = graft.analysis.EventsFact.factUncached(spark, sf())
    val df = TopKPerKey.topKPerKey(fact, Seq("country", "antigen"),
      "coverage_pct", descending = true, k = 3, tiebreakCols = Seq("year"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), s"custom exec missing:\n$plan")
    assert(plan.contains("TopKPerKeyPartial ["),
      s"map-side partial top-k missing:\n$plan")
    // partial runs BELOW the exchange (shuffles at most k rows per
    // key per input partition), final above it
    assert(plan.indexOf("TopKPerKeyPartial") > plan.indexOf("Exchange"),
      s"partial phase must be below the exchange:\n$plan")
    assert(!plan.contains("Window"), s"should not fall back to Window:\n$plan")
    assert(!plan.contains("\nSort") && !plan.contains("+- Sort"),
      s"per-group sort should not appear:\n$plan")
  }

  test("keys smaller than k, duplicates, and empty input behave") {
    val tiny = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 5.0))
      .toDF("key", "year", "v")
    val got = TopKPerKey.topKPerKey(tiny, Seq("key"), "v", descending = true,
        k = 3, tiebreakCols = Seq("year"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 5.0)))
    val empty = TopKPerKey.topKPerKey(tiny.filter(col("v") > 100),
      Seq("key"), "v", descending = true, k = 3)
    assert(empty.count() == 0)
    intercept[IllegalArgumentException](
      TopKPerKey.topKPerKey(tiny, Seq("nope"), "v", descending = true, k = 1))
  }
}
