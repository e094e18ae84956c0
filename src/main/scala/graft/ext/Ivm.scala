package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over a [[TxTable]] change feed, with
  * the NON-ALGEBRAIC fallback lane.
  *
  * count/sum are SELF-MAINTAINABLE: every feed row contributes
  * (−before, +after) and the rollup never re-reads the source (the
  * q163 lane). max/min are NOT — a delete (or downward update) of the
  * current per-key max cannot be expressed as a delta, because the
  * new max lives in rows the feed never mentions. The standard
  * fallback: keys TOUCHED by this version's feed recompute their
  * non-algebraic aggregates from the source slice — and because the
  * view key here IS the table's partition column, that slice is
  * manifest-pruned to exactly the touched partitions
  * ([[TxTable.readPruned]]), so the recompute costs ∝ changed
  * partitions, never the table (the q150 property). Untouched keys
  * keep their maintained values bit-for-bit.
  *
  * Value arithmetic rides quantized longs (floor(value·1e6)) so the
  * delta path and the direct aggregate are EXACTLY equal — the
  * equality the oracle asserts — rather than float-rounding-close.
  */
object Ivm {

  /** floor-quantized long for SUM lanes (NULL contributes 0 — a null
    * value counts toward n but not the sum, both engines). */
  def qSum(c: Column): Column =
    coalesce(floor(c * lit(1000000.0)).cast("long"), lit(0L))

  /** floor-quantized long for MAX lanes (NULL stays NULL — max skips
    * it in both engines; an all-NULL key surfaces a NULL max). */
  def qMax(c: Column): Column = floor(c * lit(1000000.0)).cast("long")

  /** The (k, n, value_q, min_q, max_q) rollup of `dir` at `version`,
    * keyed by the table's partition column — the view's baseline. */
  def baseline(
      spark: SparkSession, dir: String, version: Long,
      partitionCol: String, valueCol: String): DataFrame =
    TxTable.read(spark, dir, versionAsOf = Some(version))
      .groupBy(col(partitionCol).cast("long").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(qSum(col(valueCol))).as("value_q"),
        min(qMax(col(valueCol))).as("min_q"),
        max(qMax(col(valueCol))).as("max_q"))

  /** Bring `view` (the rollup of version v−1) to version `v`:
    * count/sum by deltas only; min/max by affected-key recompute over
    * the manifest-pruned partition slice. Returns the maintained
    * rollup — output-sized (≤ #keys rows), never source-sized. */
  def maintainStep(
      spark: SparkSession, dir: String, view: DataFrame, v: Long,
      keyCol: String, partitionCol: String, valueCol: String): DataFrame = {
    val feed = TxTable.changesBetweenImages(spark, dir, v - 1, v, keyCol)
    val kOf = coalesce(col(s"after.$partitionCol"), col(s"before.$partitionCol"))
      .cast("long")
    // bounded driver collect: ≤ #partition values by definition. A
    // NULL partition value would silently read back as 0 through the
    // primitive accessor (conflating it with bucket 0) — partition
    // keys are non-null by TxTable's path-literal contract, so fail
    // loud if one slips through
    val touched = feed.select(kOf.as("k")).distinct()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"NULL $partitionCol in the change feed — partition keys must " +
            "be non-null (TxTable path-literal contract)")
        r.getLong(0)
      }.toSet
    val deltas = feed.groupBy(kOf.as("k")).agg(
      sum(when(col("after").isNotNull, 1L).otherwise(0L) -
        when(col("before").isNotNull, 1L).otherwise(0L)).as("dn"),
      sum(when(col("after").isNotNull, qSum(col(s"after.$valueCol"))).otherwise(0L) -
        when(col("before").isNotNull, qSum(col(s"before.$valueCol"))).otherwise(0L))
        .as("dq"))
    // the fallback: ONLY touched partitions are read, at the target
    // version, straight off the manifest — pruned before any footer
    val recomputed = TxTable.readPruned(
        spark, dir, touched.map(_.toString), versionAsOf = Some(v))
      .groupBy(col(partitionCol).cast("long").as("k"))
      .agg(min(qMax(col(valueCol))).as("new_min"),
        max(qMax(col(valueCol))).as("new_max"))
    view
      .join(deltas, Seq("k"), "full_outer")
      .join(recomputed, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("value_q"), lit(0L)) + coalesce(col("dq"), lit(0L))).as("value_q"),
        when(col("k").isInCollection(touched), col("new_min"))
          .otherwise(col("min_q")).as("min_q"),
        when(col("k").isInCollection(touched), col("new_max"))
          .otherwise(col("max_q")).as("max_q"))
      .where(col("n") > 0)
  }
}
