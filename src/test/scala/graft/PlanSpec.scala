package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan discipline: the properties that make these plans
  * survive a 100 TB scale-up are asserted here, not just eyeballed —
  * filter/projection pushdown into the parquet scan, broadcast joins
  * for bounded dims, top-k instead of total sort, partial aggregation
  * before the shuffle. A regression that silently de-optimizes a plan
  * (e.g. a UDF blocking pushdown) fails the suite. */
class PlanSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("parquet scan gets both the filter and the projection pushed down") {
    val df = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1999-12-31 00:00:00").cast("timestamp"))
      .select("l_returnflag", "l_quantity")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed to scan:\n$plan")
    assert(plan.contains("ReadSchema") &&
      plan.contains("l_returnflag") && !plan.contains("l_extendedprice"),
      s"projection not pruned to 3 columns:\n$plan")
  }

  test("star join broadcasts the bounded dimensions") {
    val q12 = SparkEntry.queries("q12_region_revenue")(spark, sf())
    val plan = physical(q12)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("ordered head is top-k (TakeOrderedAndProject), not a full sort") {
    val q07 = SparkEntry.queries("q07_series_head")(spark, sf())
    assert(physical(q07).contains("TakeOrderedAndProject"))
  }

  test("grouped aggregation is partial (map-side combine) before the shuffle") {
    val q11 = SparkEntry.queries("q11_pricing_summary")(spark, sf())
    val plan = physical(q11)
    // two HashAggregates around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2 && plan.contains("Exchange"),
      s"no partial aggregation:\n$plan")
  }

  test("min_by/max_by KPIs need exactly one shuffle (no sort, no window)") {
    val q03 = SparkEntry.queries("q03_kpis")(spark, sf())
    val agg = q03.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(q03.queryExecution.executedPlan)
    def count(p: SparkPlan, name: String): Int =
      (if (p.nodeName.contains(name)) 1 else 0) + p.children.map(count(_, name)).sum
    // one exchange for the groupBy, one for the final orderBy — and no
    // per-group Window/sort machinery for earliest/latest
    assert(!agg.toString.contains("Window"), s"KPIs should not use a window:\n$agg")
  }

  test("near-dup fan-out decides from plan metadata, not an RDD probe") {
    // fanOut must not convert to RDD (that forces a second physical
    // planning of the subtree and defeats AQE reuse). Constructing the
    // near-dup plan therefore must not run any Spark job.
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    docs.schema // schema inference may run its own job; exclude it
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = graft.ext.Dedup.nearDuplicatePairs(docs)
    df.queryExecution.executedPlan // force full physical planning
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "planning the near-dup query ran Spark jobs")
    // single-file test input still fans out to defaultParallelism
    assert(physical(df).contains("REPARTITION_BY_NUM"),
      "few-file input should round-robin repartition before the explode")
  }

  test("text analysis is expression-only: no UDFs, single-pass, no extra shuffle") {
    val q26 = SparkEntry.queries("q26_text_stats")(spark, sf())
    val plan = physical(q26)
    // Built-in expressions only (HOF lambdas are CodegenFallback but
    // still evaluate once per row with no serialization round-trip —
    // a ScalaUDF would add encoder costs, a Python UDF a process hop).
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF found on the hot path:\n$plan")
    // exactly one exchange: the final orderBy. The stats themselves are
    // a narrow map over the scan.
    assert("Exchange".r.findAllIn(plan).size == 1, s"extra shuffle:\n$plan")
  }
}
