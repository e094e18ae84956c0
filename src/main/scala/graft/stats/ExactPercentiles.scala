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
  *   2. one cumulative-sum window per key over that frame (ordered by
  *      value) gives each distinct value its 1-based rank span
  *      [lo, hi] — WindowExec sorts and SPILLS, and the rows are
  *      (key, value, count) triples, never the raw data;
  *   3. the target ranks — `index = p·(n−1)` per (key, fraction), its
  *      floor/ceil ranks and interpolation fraction — live on a
  *      #keys × #fractions frame, broadcast back;
  *   4. the rows whose rank span contains a target rank (≤ 2 per
  *      (key, fraction)) are interpolated:
  *      `lower + (index − floor(index)) · (higher − lower)` — the
  *      formula `percentile` and DuckDB's `quantile_cont` share, on
  *      the same doubles, so results are bitwise identical to both.
  *
  * NULL values are excluded (the built-in's contract); NULL KEYS form
  * their own group exactly like GROUP BY (the probe join is
  * null-safe). Keys with zero non-NULL values are absent from the
  * output (no group, like the built-in's empty-group NULL row never
  * forming).
  *
  * Contract bounds: the probe frame is #keys × #fractions × 2 rows and
  * is BROADCAST — the same driver-bounded #keys contract as
  * [[graft.ext.Curation.quotaSample]]'s seat allocation. This utility
  * targets the hot-GROUP axis (few keys, enormous groups — where the
  * built-in OOMs); at extreme key cardinality (per-user percentiles)
  * the built-in's per-group buffers are small and fine — use it there.
  * Signed zeros: values are grouped with SQL equality, so −0.0 and 0.0
  * merge (result surfaces as 0.0) — the built-in keeps them as
  * distinct sort positions and can return −0.0; this is the one
  * deliberate last-bit divergence.
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
    val spans = counts
      .withColumn("_hi", sum(col("_c")).over(w))
      .withColumn("_lo", col("_hi") - col("_c") + 1)
    // per-key totals re-aggregate the counts frame; the two lanes'
    // count subtrees canonicalize to the SAME partial-agg exchange, so
    // AQE ReusedExchange serves the probe lane from the span lane's
    // shuffle at runtime — the source is scanned once (verified on the
    // executed plan; deriving _n from the windowed spans instead
    // measured SLOWER, because that trades a reused-exchange hash agg
    // for a second per-key sort)
    val ns = counts.groupBy("_pk").agg(sum(col("_c")).as("_n"))
    // #keys × #fractions × 2 rank probes — a driver-bounded tiny frame
    val probes = ns
      .select(col("_pk"), col("_n"), explode(array(ps.map { case (name, p) =>
        struct(lit(name).as("name"), lit(p).as("p"))
      }: _*)).as("_t"))
      .withColumn("_idx", col("_t.p") * (col("_n") - 1).cast("double"))
      .select(col("_pk"), col("_t.name").as("_pname"), col("_idx"),
        explode(array(
          struct(lit("lo").as("which"), (floor(col("_idx")).cast("long") + 1).as("rank")),
          struct(lit("hi").as("which"), (ceil(col("_idx")).cast("long") + 1).as("rank"))))
          .as("_probe"))
      .select(col("_pk").as("_qk"), col("_pname"), col("_idx"),
        col("_probe.which").as("_which"), col("_probe.rank").as("_rank"))
    // null-safe key match: a NULL key is a real group (GROUP BY
    // semantics, the built-in returns a row for it) — a plain
    // equi-join would silently drop it
    val matched = spans.join(broadcast(probes),
      col("_pk") <=> col("_qk") &&
        col("_rank").between(col("_lo"), col("_hi")))
    // the exact two-product form the built-in `percentile` (and DuckDB
    // quantile_cont) evaluates — NOT lo + frac·(hi−lo), which differs
    // in the last bit: (ceil(i)−i)·lo + (i−floor(i))·hi, with the
    // integral-index case short-circuited (both products are 0 there)
    val interpolated = matched
      .groupBy(col("_pk"), col("_pname"), col("_idx"))
      .agg(
        max(when(col("_which") === "lo", col("_pv"))).as("_vlo"),
        max(when(col("_which") === "hi", col("_pv"))).as("_vhi"))
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
