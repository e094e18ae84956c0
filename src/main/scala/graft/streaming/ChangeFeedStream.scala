package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Subscribe to a [[graft.ext.TxTable]] COMMIT LOG as a stream: every
  * published manifest is one file in `_graft_log/`, so the standard
  * file source turns the log itself into the change notification
  * channel — each micro-batch resolves the versions it saw and hands
  * the per-version NET changeset ([[graft.ext.TxTable.changesBetween]]
  * of (v−1, v)) to the consumer. Spark's file-source checkpoint gives
  * EXACTLY-ONCE version delivery across restarts for free: a manifest
  * file, once processed, is never re-delivered — the property a
  * hand-rolled poll loop has to rebuild with its own offset store.
  *
  * Cost per version ∝ that commit's changed partitions (the
  * changesBetween manifest-diff pruning), never table size.
  *
  * Ordering contract: versions are processed in ascending order WITHIN
  * a batch; across batches the file source lists manifests in
  * modification-time order, which matches version order for the
  * sequential writers the commit protocol enforces (concurrent losers
  * never publish). Staged `.tmp-*` manifests are dot-prefixed and thus
  * invisible to the file source by Spark's hidden-file rule.
  *
  * Retention interplay: resolving version v needs manifest v−1 —
  * consumers must run ahead of [[graft.ext.TxTable.vacuum]]'s
  * `keepVersions` horizon (same contract as any CDC reader on any
  * log-structured table).
  */
object ChangeFeedStream {

  /** Drain every version published so far (AvailableNow) from
    * `tableDir`'s log, invoking `f(version, netChangeset)` for each
    * version AFTER `fromVersion` — `fromVersion` itself is the
    * consumer's baseline snapshot, not a change. Returns the number
    * of versions delivered this run (previously checkpointed versions
    * are not re-delivered). */
  def followAvailable(
      spark: SparkSession,
      tableDir: String,
      keyCol: String,
      checkpoint: String,
      fromVersion: Long = 1L)(f: (Long, DataFrame) => Unit): Long = {
    val logDir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(tableDir), "_graft_log").toString
    val delivered = new java.util.concurrent.atomic.AtomicLong(0L)
    val versionRe = """"version":(\d+)""".r
    val q = spark.readStream.format("text")
      .option("maxFilesPerTrigger", "1")
      .load(logDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one manifest per trigger: the batch's header lines carry the
        // version numbers (bounded collect — ≤ lines of one manifest)
        val vs = batch.select(col("value"))
          .where(col("value").contains("\"version\":"))
          .collect()
          .flatMap(r => versionRe.findFirstMatchIn(r.getString(0)).map(_.group(1).toLong))
          .distinct.sorted
        vs.filter(_ > fromVersion).foreach { v =>
          f(v, graft.ext.TxTable.changesBetween(spark, tableDir, v - 1, v, keyCol))
          delivered.incrementAndGet()
        }
        ()
      }
      .start()
    q.awaitTermination()
    delivered.get()
  }
}
