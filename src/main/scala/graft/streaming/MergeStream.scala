package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming MERGE sink: a change feed (insert/update/delete rows)
  * drained micro-batch by micro-batch into a PARTITIONED parquet
  * snapshot, rewriting ONLY the partitions a batch touches — the
  * incremental-upsert shape that replaces "recompute the snapshot
  * nightly" with "apply the day's changes", and the streaming face of
  * [[graft.ext.Cdc.applyChangeSet]].
  *
  * Per batch: the affected partition values are the distinct change
  * buckets (a bounded driver collect — ≤ #partitions by definition),
  * the snapshot is read WITH a partition filter (only those
  * directories are listed/scanned), the merge runs on that slice, and
  * `partitionOverwriteMode=dynamic` writes back just the touched
  * directories. Cost per batch ∝ touched partitions, not snapshot
  * size — the property that makes a 100 TB snapshot maintainable.
  *
  * Correctness contract: at most one change per key across the whole
  * feed (CDC-compacted upstream), so batch boundaries and file order
  * cannot change the final state; the result equals the one-shot
  * batch [[graft.ext.Cdc.applyChangeSet]] — which is exactly what the
  * q138 oracle replays relationally.
  */
object MergeStream {

  /** Drain `changesDir` (parquet change files, one micro-batch per
    * file) into the snapshot at `snapshotDir` (parquet partitioned by
    * `pbucket`). Returns the number of micro-batches applied. */
  def mergeAvailable(
      spark: SparkSession,
      snapshotDir: String,
      changesDir: String,
      changesSchema: org.apache.spark.sql.types.StructType,
      checkpoint: String): Long = {
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    try {
      val stream = spark.readStream
        .schema(changesSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(changesDir)
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (changes: DataFrame, _: Long) =>
          // bounded collect: ≤ #partition values by definition
          val touched = changes.select(col("pbucket")).distinct()
            .collect().map(_.getLong(0))
          if (touched.nonEmpty) {
            val slice = spark.read.parquet(snapshotDir)
              .where(col("pbucket").isin(touched.toIndexedSeq: _*))
            // localCheckpoint: the merged plan lazily READS the very
            // partitions the write below overwrites — Spark rejects
            // overwrite-from-own-input; materializing the (touched-
            // partition-sized) merge breaks the file dependency
            val merged = graft.ext.Cdc.applyChangeSet(
              slice, changes, "event_id", "op").localCheckpoint()
            // dynamic overwrite: ONLY the touched pbucket directories
            // are replaced; untouched partitions are never read or
            // written
            merged.write.mode("overwrite")
              .partitionBy("pbucket").parquet(snapshotDir)
            // dynamic overwrite replaces only partitions the write
            // EMITS — a batch that deletes a partition's last row
            // writes nothing for it, and the stale directory would
            // survive (diverging from the batch apply). Drop touched
            // partitions the merge left empty explicitly; the distinct
            // is bounded by #touched.
            val present = merged.select(col("pbucket")).distinct()
              .collect().map(_.getLong(0)).toSet
            touched.filterNot(present).foreach { b =>
              val dir = java.nio.file.Paths.get(snapshotDir, s"pbucket=$b")
              if (java.nio.file.Files.exists(dir)) graft.Fs.deleteTree(dir)
            }
            batches.incrementAndGet()
          }
          ()
        }
        .start()
      q.awaitTermination()
      batches.get()
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
