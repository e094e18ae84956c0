package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the vector-store compression
  * path next to [[Pq]]'s product quantization: each vector is mapped
  * to 256 levels over its own [min, max] range (per-vector scale, the
  * `SQ8` layout every ANN store ships), and the report quantifies the
  * information loss per label.
  *
  * Determinism discipline: the quantization level
  * `q = ⌊(x − min)/scale⌋` and the reconstruction error
  * `x − (min + q·scale)` are plain IEEE expression chains over the
  * float-widened inputs — identical in any engine evaluating the same
  * association order — and every aggregate is either an integer sum
  * or a floor-quantized long (the q36/q113 discipline), so the DuckDB
  * oracle matches bit for bit. Degenerate vectors (min = max) map to
  * level 0 with zero error.
  *
  * Scale shape: one explode over the vectors with per-vector min/max
  * hoisted ABOVE the generate (evaluated once per vector, not per
  * element), then one map-side-combinable groupBy(label) — no joins,
  * no windows, no driver collects.
  */
object Quantize {

  /** Per-label int8 quantization report over `(vecCol: array<float>,
    * labelCol)`: element count, quantized total squared
    * reconstruction error (×1e12, floored), total of the assigned
    * levels, and the level histogram extremes.
    *
    * Input-range bound (the [[graft.stats.WeightedPercentiles]]
    * overflow discipline): the per-element error is bounded by one
    * quantization step `(mx − mn)/255`, so
    * `e2q ≤ ((mx − mn)/255)² · 1e12` — which fits a long only while
    * the per-vector range `mx − mn ≤ ~7.7e5` (beyond that Spark's
    * non-ANSI long cast WRAPS where DuckDB's BIGINT cast raises,
    * breaking the bit-for-bit oracle contract). Embedding coordinates
    * live in O(1) ranges, so the bound holds by orders of magnitude;
    * callers quantizing un-normalized magnitudes past ~1e5 must
    * rescale first or lower the 1e12 error quantum. */
  def int8Report(df: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    // fail LOUD on NULL/empty vectors: explode() generates ZERO rows
    // for them, so such a vector would silently vanish from the report
    // (under-counted n_elems, unnoticed — the silent-degradation class
    // the r13/r14 sweeps kept finding). Same discipline as
    // [[Similarity.withLshBuckets]]; the guard gates the vector column
    // itself BEFORE the generate, so it cannot be pruned away and runs
    // for every input row including the ones explode would drop.
    val ok = assert_true(col(vecCol).isNotNull && size(col(vecCol)) > 0,
      lit(s"int8Report: NULL or empty $vecCol — the vector would be " +
        "silently dropped from the report; filter or impute upstream")).isNull
    val checked = df.select(col(labelCol).as("label"),
      when(ok, col(vecCol)).as("_v"))
    val exploded = checked.select(
      col("label"),
      array_min(col("_v")).cast("double").as("mn"),
      array_max(col("_v")).cast("double").as("mx"),
      explode(col("_v")).as("xf"))
    val x = col("xf").cast("double")
    val scale = (col("mx") - col("mn")) / lit(255.0)
    val q = when(col("mx") === col("mn"), lit(0L))
      .otherwise(least(lit(255L), floor((x - col("mn")) / scale)))
    val err = when(col("mx") === col("mn"), lit(0.0))
      .otherwise(x - (col("mn") + q.cast("double") * scale))
    exploded
      .withColumn("q", q)
      .withColumn("e2q", floor(err * err * lit(1000000000000.0)).cast("long"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_elems"),
        sum(col("e2q")).as("sq_err_q"),
        sum(col("q")).as("level_sum"),
        min(col("q")).as("level_min"),
        max(col("q")).as("level_max"))
  }
}
