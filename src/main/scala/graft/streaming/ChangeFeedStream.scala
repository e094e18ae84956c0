package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Subscribe to a [[graft.ext.TxTable]] COMMIT LOG as a stream: every
  * published manifest is one file in `_graft_log/`, so the standard
  * file source turns the log itself into the change notification
  * channel — each micro-batch resolves the versions it saw and hands
  * the per-version NET changeset to the consumer in ascending version
  * order. Spark's file-source checkpoint gives EXACTLY-ONCE version
  * delivery across restarts for free: a manifest file, once processed,
  * is never re-delivered — the property a hand-rolled poll loop has to
  * rebuild with its own offset store.
  *
  * Catch-up shape: up to `maxVersionsPerTrigger` manifests land in ONE
  * micro-batch (a consumer replaying N versions pays ~N/batch triggers,
  * not N — the r10 `maxFilesPerTrigger=1` crawl, retired), and the
  * whole batch's versions are reconstructed with ONE log replay
  * ([[graft.ext.TxTable.readManifests]]) before consecutive pairs are
  * diffed. Cost per version stays ∝ that commit's changed partitions
  * (the manifest-diff pruning), never table size. Checkpoint files
  * (`_ckpt-*`) are underscore-prefixed and thus invisible to the file
  * source by Spark's hidden-file rule — only real commits notify.
  *
  * Ordering contract: versions are processed in ascending order WITHIN
  * a batch; across batches the file source lists manifests in
  * modification-time order, which matches version order for the
  * sequential writers the commit protocol enforces (concurrent losers
  * never publish). Staged `.tmp-*` manifests are dot-prefixed and thus
  * also invisible.
  *
  * Retention interplay: resolving version v needs the log back to the
  * nearest checkpoint at or below v−1 — consumers must run ahead of
  * [[graft.ext.TxTable.vacuum]]'s `keepVersions` horizon (same
  * contract as any CDC reader on any log-structured table); a
  * consumer behind the horizon fails LOUD (missing-manifest error),
  * never silently wrong.
  *
  * Consumer idempotence: exactly-once here means exactly-once VERSION
  * DELIVERY — the callback itself runs under foreachBatch's
  * at-least-once contract, so consumer SIDE-EFFECTS must be
  * replay-safe. Sinks that are TxTables get this from the
  * idempotent-writer ledger (tag the write with the delivered version,
  * as the q164/q170 view refreshes do via
  * `commitReplace(txn = Some((app, v)))`); append-only sinks need
  * their own dedup key (`_commit_version` is in the frame for exactly
  * that).
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
      fromVersion: Long = 1L,
      maxVersionsPerTrigger: Int = 8)(f: (Long, DataFrame) => Unit): Long =
    followAvailableCounted(spark, tableDir, keyCol, checkpoint, fromVersion,
      maxVersionsPerTrigger)(f)._1

  /** Sink-composable drain: each non-empty trigger hands the consumer
    * ONE DataFrame — the batch's changesets unioned and stamped with
    * `_commit_version` (ascending within the frame; columns widen by
    * name across schema-evolved versions, the absent side reading
    * NULL) — so the feed composes with any batch writer (a TxTable
    * merge, a parquet append, an aggregate refresh) instead of forcing
    * the per-version callback shape. Exactly-once per version across
    * restarts via the same file-source checkpoint. Returns the number
    * of versions delivered. */
  def followAvailableFrames(
      spark: SparkSession,
      tableDir: String,
      keyCol: String,
      checkpoint: String,
      fromVersion: Long = 1L,
      maxVersionsPerTrigger: Int = 8)(f: DataFrame => Unit): Long = {
    val delivered = new java.util.concurrent.atomic.AtomicLong(0L)
    drain(spark, tableDir, checkpoint, maxVersionsPerTrigger) { vs0 =>
      val vs = vs0.filter(_ > fromVersion)
      if (vs.nonEmpty) {
        val needed = (vs.map(_ - 1) ++ vs).distinct.sorted
        val ms = graft.ext.TxTable.readManifests(spark, tableDir, needed)
        val frame = vs.map { v =>
          graft.ext.TxTable.changesBetweenManifests(
              spark, tableDir, ms(v - 1), ms(v), keyCol)
            .withColumn("_commit_version", lit(v))
        }.reduce(_.unionByName(_, allowMissingColumns = true))
        f(frame)
        delivered.addAndGet(vs.size.toLong)
      }
    }
    delivered.get()
  }

  /** [[followAvailable]] that also reports how many NON-EMPTY triggers
    * the drain took — the observable the catch-up contract is specified
    * against (a 10-version replay at `maxVersionsPerTrigger=4` must
    * complete in ≤ 3 triggers, not 10). */
  def followAvailableCounted(
      spark: SparkSession,
      tableDir: String,
      keyCol: String,
      checkpoint: String,
      fromVersion: Long = 1L,
      maxVersionsPerTrigger: Int = 8)(f: (Long, DataFrame) => Unit): (Long, Long) = {
    val delivered = new java.util.concurrent.atomic.AtomicLong(0L)
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    drain(spark, tableDir, checkpoint, maxVersionsPerTrigger) { vs0 =>
      val vs = vs0.filter(_ > fromVersion)
      if (vs.nonEmpty) {
        batches.incrementAndGet()
        // ONE log replay resolves every manifest this batch needs
        // (each version and its predecessor)
        val needed = (vs.map(_ - 1) ++ vs).distinct.sorted
        val ms = graft.ext.TxTable.readManifests(spark, tableDir, needed)
        vs.foreach { v =>
          f(v, graft.ext.TxTable.changesBetweenManifests(
            spark, tableDir, ms(v - 1), ms(v), keyCol))
          delivered.incrementAndGet()
        }
      }
    }
    (delivered.get(), batches.get())
  }

  /** Shared micro-batch loop: stream the log dir, surface each batch's
    * ascending version list to `onBatch`, await completion. */
  private def drain(
      spark: SparkSession, tableDir: String, checkpoint: String,
      maxVersionsPerTrigger: Int)(onBatch: Seq[Long] => Unit): Unit = {
    require(maxVersionsPerTrigger >= 1, "maxVersionsPerTrigger must be >= 1")
    val logDir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(tableDir), "_graft_log").toString
    val versionRe = """"version":(\d+)""".r
    val q = spark.readStream.format("text")
      .option("maxFilesPerTrigger", maxVersionsPerTrigger.toString)
      .load(logDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the batch holds up to maxVersionsPerTrigger manifests' lines;
        // header lines carry the version numbers (bounded collect —
        // ≤ header-count; delta body lines have no "version" field)
        onBatch(batch.select(col("value"))
          .where(col("value").contains("\"version\":") &&
            col("value").contains("\"kind\":"))
          .collect()
          .flatMap(r => versionRe.findFirstMatchIn(r.getString(0)).map(_.group(1).toLong))
          .distinct.sorted.toSeq)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
