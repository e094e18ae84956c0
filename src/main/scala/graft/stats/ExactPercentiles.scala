package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-key percentiles as a DISTRIBUTED rank
  * election — the scale-safe replacement for `percentile(...)`.
  *
  * Spark's built-in exact `percentile` aggregate buffers every
  * (value, count) pair of a group inside the aggregation buffer (an
  * in-memory map merged across partials): a hot group at 100 TB is an
  * executor OOM, not a spill. The same exact semantics decompose into
  * relational steps that all spill:
  *
  *   1. `groupBy(key, value).count` — map-side combined; the frame
  *      shrinks to distinct values per key, each row carrying only a
  *      count;
  *   2. TWO window aggregates per key over that frame, served by ONE
  *      sort/exchange (same partitioning, compatible ordering): the
  *      cumulative sum (ordered by value) gives each distinct value
  *      its 1-based rank span [lo, hi], and an unbounded-frame sum
  *      gives the key's total count n — no second scan, no separate
  *      totals lane, no broadcast join (both were measured slower:
  *      every extra lane is an extra AQE stage, and the probe join's
  *      broadcast build is a whole exchange for a #keys×#fractions
  *      frame);
  *   3. the target ranks — `index = p·(n−1)` per (key, fraction), its
  *      floor/ceil ranks and interpolation fraction — are computed
  *      per ROW (a #fractions explode), and rows whose rank span
  *      contains neither target rank are filtered out immediately
  *      (≤ 2 survivors per (key, fraction));
  *   4. survivors interpolate:
  *      `(ceil(i)−i)·lower + (i−floor(i))·higher` — the exact
  *      two-product form `percentile` and DuckDB's `quantile_cont`
  *      evaluate, on the same doubles, so results are bitwise
  *      identical to both.
  *
  * NULL values are excluded (the built-in's contract); NULL KEYS form
  * their own group exactly like GROUP BY. DIVERGENCE: a key whose
  * values are ALL NULL still forms a GROUP BY group, for which the
  * built-in returns a NULL-percentile row — here the NULL-value
  * filter removes the key entirely, so that row is absent (deliberate,
  * encoded in ExactPercentilesSpec "keys whose values are all NULL
  * are absent"; emit such rows with an outer join against the key
  * universe if the built-in's shape is needed).
  *
  * Scale shape: everything after step 1 operates on distinct
  * (key, value) rows, never raw data; WindowExec sorts and SPILLS.
  * This utility targets the hot-GROUP axis (few keys, enormous
  * groups — where the built-in OOMs); at extreme key cardinality
  * (per-user percentiles) the built-in's per-group buffers are small
  * and fine — use it there.
  * Signed zeros: values are grouped with SQL equality, so −0.0 and 0.0
  * merge (result surfaces as 0.0) — the built-in keeps them as
  * distinct sort positions and can return −0.0; this is the one
  * deliberate last-bit value divergence.
  */
object ExactPercentiles {

  /** Per-key exact percentiles: one output row per key, one column per
    * requested `(name, fraction)`. Fractions must lie in [0, 1]. */
  def percentiles(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "at least one (name, fraction) required")
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"fractions must be within [0, 1]: ${ps.map(_._2).mkString(", ")}")
    val vals = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("_pk"), col(valCol).cast("double").as("_pv"))
    val counts = vals.groupBy("_pk", "_pv").agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy("_pk").orderBy("_pv")
    val wAll = Window.partitionBy("_pk")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val spans = counts
      .withColumn("_hi", sum(col("_c")).over(w))
      .withColumn("_lo", col("_hi") - col("_c") + 1)
      .withColumn("_n", sum(col("_c")).over(wAll))
    val targets = ps.map { case (name, p) =>
      struct(lit(name).as("name"), lit(p).as("p"))
    }
    val probed = spans
      .withColumn("_t", explode(array(targets: _*)))
      .withColumn("_idx", col("_t.p") * (col("_n") - 1).cast("double"))
      .withColumn("_rlo", floor(col("_idx")).cast("long") + 1)
      .withColumn("_rhi", ceil(col("_idx")).cast("long") + 1)
      .filter(col("_rlo").between(col("_lo"), col("_hi")) ||
        col("_rhi").between(col("_lo"), col("_hi")))
    val interpolated = probed
      .groupBy(col("_pk"), col("_t.name").as("_pname"), col("_idx"))
      .agg(
        max(when(col("_rlo").between(col("_lo"), col("_hi")), col("_pv"))).as("_vlo"),
        max(when(col("_rhi").between(col("_lo"), col("_hi")), col("_pv"))).as("_vhi"))
      .withColumn("_val",
        when(floor(col("_idx")) === ceil(col("_idx")), col("_vlo"))
          .otherwise((ceil(col("_idx")) - col("_idx")) * col("_vlo") +
            (col("_idx") - floor(col("_idx"))) * col("_vhi")))
    interpolated
      .groupBy(col("_pk").as(keyCol))
      .agg(
        max(when(col("_pname") === ps.head._1, col("_val"))).as(ps.head._1),
        ps.tail.map { case (name, _) =>
          max(when(col("_pname") === name, col("_val"))).as(name)
        }: _*)
  }
}
