package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact deduplication with BOUNDED state:
  * `dropDuplicatesWithinWatermark` keeps a key in the state store only
  * until the watermark passes its event time, so state size is
  * arrival-rate x watermark-delay — the scale-honest shape for a
  * continuous ingest feed, unlike a global streaming `dropDuplicates`
  * whose state grows with corpus lifetime forever
  * ([[IncrementalIngest]] documents that trap and solves the global
  * case batch-side instead; this module is the in-flight complement
  * for duplicates that arrive CLOSE together — retries, at-least-once
  * sources, fan-in of overlapping feeds).
  */
object DedupStream {

  /** Per-type counts of the deduplicated event stream.
    *
    * The input deliberately contains every event TWICE (the same file
    * source unioned with itself — the at-least-once/fan-in shape), so
    * the dedup is doing real work: the result matches the batch
    * `count(*)` per type only because every duplicate was dropped.
    *
    * Run-to-completion: append-mode file sink (dedup emits a key on
    * first sight, so append holds nothing back), Trigger.Once, then a
    * batch read-back aggregation. The returned frame is
    * DRIVER-LOCALIZED (bounded by #event_types rows) so the temp sink
    * and checkpoint can be deleted rather than pinned. */
  def dedupedTypeCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.analysis.EventsFact.eventsSchema(spark, sfDir)
    def source(): DataFrame =
      graft.analysis.EventsFact.canonicalTs(spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
    val deduped = source().unionAll(source())
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "event_type")
    val outDir = java.nio.file.Files.createTempDirectory("graft_dedup_sink")
      .toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dedup_ckpt")
      .toFile.getAbsolutePath
    // dedup state is per-key tiny; 4 fat stores beat 32 thin ones at
    // local scale for the same reason as EventsStream (StreamTuning)
    val q = StreamTuning.withStreamPartitions(spark, 4) {
      deduped.writeStream
        .outputMode("append")
        .trigger(Trigger.Once())
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", outDir)
        .start()
    }
    q.awaitTermination()
    val result = spark.read.parquet(outDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("event_type")
    val local = result.collect().toSeq
    val resSchema = result.schema
    graft.Fs.deleteTree(java.nio.file.Paths.get(outDir))
    graft.Fs.deleteTree(java.nio.file.Paths.get(ckpt))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(local.asJava, resSchema)
  }
}
