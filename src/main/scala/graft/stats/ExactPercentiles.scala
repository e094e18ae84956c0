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
  *   1. a #keys stats pass (min/max of the non-NaN values, total
  *      count n — map-side combined) is broadcast back, and every row
  *      gets a VALUE-RANGE bucket `floor((v−min)/(max−min)·B)`:
  *      monotone in v, so (bucket, value) order == value order;
  *   2. ONE raw shuffle `repartition(key, bucket)`, off which BOTH
  *      the distinct-value counts (`groupBy(key, bucket, value)
  *      .count`, map-side combined) and the within-bucket cumulative
  *      window run exchange-free (subset partitioning satisfies both)
  *      — and every sort is a PARALLEL ~n/B-row within-bucket sort,
  *      not one task sorting a whole hot key's distinct values (the
  *      per-key-window formulation is the q87 skew magnet: a key with
  *      a billion distinct values sorts in ONE task);
  *   3. per-(key, bucket) totals (`groupBy`, also exchange-free)
  *      prefix-sum across buckets over a ≤ #keys·B frame, and the
  *      broadcast offsets turn within-bucket cumulative counts into
  *      GLOBAL 1-based rank spans [lo, hi] per distinct value;
  *   4. the target ranks — `index = p·(n−1)` per (key, fraction) and
  *      its floor/ceil ranks — are probed per ROW inside ONE
  *      conditional aggregate (`max(when(rank ∈ [lo, hi], v))` per
  *      fraction, map-side combined into ≤ #keys·2·#fractions
  *      partials);
  *   5. the bracketing values interpolate per key:
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
  * Scale shape: no stage ever holds a whole key in one task — sorts
  * are within-(key, bucket) and WindowExec SPILLS; the only
  * key-proportional frames are #keys (stats) and ≤ #keys·buckets
  * (offsets), both broadcast. This utility targets the hot-GROUP axis
  * (few keys, enormous groups — where the built-in OOMs and a per-key
  * window skews); at extreme key cardinality (per-user percentiles)
  * the broadcast frames grow with #keys — the built-in's small
  * per-group buffers are the right tool there.
  * Bucket edge shapes: NaN values route to the top bucket (they sort
  * after every number, matching the built-in's sort); a key whose
  * values are all equal, or whose min/max span is not finite, uses a
  * single bucket (monotonicity is trivial); ±Infinity clamps into the
  * end buckets. The result is identical for ANY bucket count.
  * Signed zeros: values are grouped with SQL equality, so −0.0 and 0.0
  * merge (result surfaces as 0.0) — the built-in keeps them as
  * distinct sort positions and can return −0.0; this is the one
  * deliberate last-bit value divergence.
  */
object ExactPercentiles {

  /** Per-key exact percentiles: one output row per key, one column per
    * requested `(name, fraction)`. Fractions must lie in [0, 1].
    * `buckets` bounds every sort task at ~n_key/buckets distinct
    * values (the result is identical for any value ≥ 1). */
  def percentiles(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      ps: Seq[(String, Double)],
      buckets: Int = 256): DataFrame = {
    require(ps.nonEmpty, "at least one (name, fraction) required")
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"fractions must be within [0, 1]: ${ps.map(_._2).mkString(", ")}")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val vals = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("_pk"), col(valCol).cast("double").as("_pv"))
    // #keys stats frame: value range for bucketing (NaN-free: NaN would
    // poison max and the quotient below) + the key's total count n
    val stats = vals.groupBy(col("_pk").as("_spk")).agg(
      min(when(!isnan(col("_pv")), col("_pv"))).as("_vmin"),
      max(when(!isnan(col("_pv")), col("_pv"))).as("_vmax"),
      count(lit(1)).as("_n"))
    val span = col("_vmax") - col("_vmin")
    // monotone value→bucket map; guards keep floor()'s input NaN-free
    // (ANSI-safe: floor(double) is a LongType expression, not a cast).
    // NaN → top bucket (sorts after every number, like the sort order
    // the built-in buffers under); non-finite span (all-equal values,
    // ±Inf endpoints, all-NaN key) → single bucket; ±Inf values clamp.
    val bkt =
      when(isnan(col("_pv")), lit((buckets - 1).toLong))
        .when(!(span > 0.0) || span === Double.PositiveInfinity, lit(0L))
        .otherwise(least(greatest(
          floor((col("_pv") - col("_vmin")) / span * buckets), lit(0L)),
          lit((buckets - 1).toLong)))
    // null-safe join: a NULL key is a real GROUP BY group and must
    // meet its stats row (a USING/=== join would silently drop it)
    val bucketed = vals.join(broadcast(stats), col("_pk") <=> col("_spk"))
      .withColumn("_bkt", bkt)
      .select(col("_pk"), col("_pv"), col("_bkt"), col("_n"))
    // explicit partition count: a bare repartition(cols) is an AQE
    // coalesce target — at small volumes it collapses to ~1 partition
    // and serializes every within-bucket sort (measured 2×)
    val shufflePartitions = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = bucketed.repartition(shufflePartitions, col("_pk"), col("_bkt"))
    val counts = parted.groupBy("_pk", "_bkt", "_pv")
      .agg(count(lit(1)).as("_c"), first(col("_n")).as("_n"))
    // cross-bucket rank offsets: per-(key, bucket) totals prefix-summed
    // over a ≤ #keys·buckets frame, broadcast back. Branched off the
    // SCAN, not off `parted`: totals are map-side combined straight
    // into #keys·buckets partials, so this lane re-reads the (cheap,
    // column-pruned) source in parallel with the raw shuffle instead
    // of serializing behind it — one fewer hop on the critical path.
    // (Re-measured r11: deriving this from `parted` — zero extra scan,
    // exchange-reuse — holds the steady state but REGRESSES the
    // driver-shaped one-shot 4.3 → 5.1-6.1 s, because the offsets
    // broadcast then waits on the full shuffle before the spans join
    // can even start. The extra scan buys critical-path overlap.)
    val offsets = bucketed.groupBy("_pk", "_bkt")
      .agg(count(lit(1)).as("_bt"))
      .withColumn("_off", coalesce(
        sum(col("_bt")).over(Window.partitionBy("_pk").orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pk").as("_opk"), col("_bkt").as("_obkt"), col("_off"))
    val wIn = Window.partitionBy("_pk", "_bkt").orderBy("_pv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = counts
      .join(broadcast(offsets),
        col("_pk") <=> col("_opk") && col("_bkt") === col("_obkt"))
      .withColumn("_hi", col("_off") + sum(col("_c")).over(wIn))
      .withColumn("_lo", col("_hi") - col("_c") + 1)
    // Rank probe + interpolation in ONE conditional aggregate: for each
    // fraction, `index = p·(n−1)` and its floor/ceil ranks are per-row
    // codegen'd arithmetic over the spans, and `max(when(rank ∈
    // [lo, hi], v))` picks the lower/upper bracketing values directly —
    // map-side combined into ≤ #keys·(2·#fractions) partials, no
    // explode, no intermediate per-(key, fraction) aggregate (an
    // earlier formulation pre-filtered + exploded + aggregated twice;
    // same bitwise result, two more stages of plan+codegen on the
    // critical path). The interpolation is the exact two-product form
    // `percentile`/`quantile_cont` evaluate, on the same doubles.
    def idxOf(p: Double, n: Column): Column = lit(p) * (n - 1).cast("double")
    val aggs = max(col("_n")).as("_kn") +: ps.zipWithIndex.flatMap { case ((_, p), i) =>
      val idx = idxOf(p, col("_n"))
      val rlo = floor(idx).cast("long") + 1
      val rhi = ceil(idx).cast("long") + 1
      Seq(
        max(when(rlo.between(col("_lo"), col("_hi")), col("_pv"))).as(s"_vlo$i"),
        max(when(rhi.between(col("_lo"), col("_hi")), col("_pv"))).as(s"_vhi$i"))
    }
    val agged = spans.groupBy(col("_pk")).agg(aggs.head, aggs.tail: _*)
    val outCols = col("_pk").as(keyCol) +: ps.zipWithIndex.map { case ((name, p), i) =>
      val idx = idxOf(p, col("_kn"))
      when(floor(idx) === ceil(idx), col(s"_vlo$i"))
        .otherwise((ceil(idx) - idx) * col(s"_vlo$i") +
          (idx - floor(idx)) * col(s"_vhi$i"))
        .as(name)
    }
    agged.select(outCols: _*)
  }
}
