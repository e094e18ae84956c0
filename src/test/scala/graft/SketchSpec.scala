package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: not cross-engine hash-stable by construction
  * (HyperLogLog++ buckets differ per implementation), so they are
  * asserted against the exact answer here instead of the DuckDB oracle
  * (see the q21 note in RelationalQueries). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct lands within the configured rsd of exact") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx=$approx exact=$exact — outside 3x rsd")
  }

  test("approx quantiles bracket the exact median") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val Array(q50) = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01)
    val n = li.count()
    val below = li.filter(col("l_extendedprice") <= q50).count()
    assert(math.abs(below.toDouble / n - 0.5) < 0.03)
  }
}
