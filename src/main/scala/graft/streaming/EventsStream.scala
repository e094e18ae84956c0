package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming over the events table — the engine's
  * incremental-ingest surface. The reference is strictly batch
  * (weekly full reload, SURVEY §2.10); this is the extension for
  * continuous arrival: file-source stream → event-time windowed
  * aggregation with a watermark → sink.
  *
  * Batch/stream equivalence is the correctness contract: the same
  * windowed aggregation run as a batch query over the same files must
  * produce the same rows (checked by the q-entry's DuckDB oracle and
  * StreamingSpec).
  */
object EventsStream {

  /** Daily per-type counts/sums as a streaming aggregation. Runs the
    * stream to completion over the available files and returns the
    * final result — which equals the batch answer.
    *
    * Contract: the returned frame is DRIVER-LOCALIZED, not a lazy
    * plan — the last-update-per-key read-back is collected (it is
    * output-sized by construction: #days × #types rows) so the temp
    * file sink can be deleted instead of pinned forever. A variant of
    * this pattern whose grouping keys are high-cardinality (per-user,
    * per-document) must NOT collect — keep the sink on disk and return
    * the lazy read-back instead, or the driver pays the full result in
    * memory. */
  def dailyTypeCounts(spark: SparkSession, sfDir: String, queryName: String = "daily_counts"): DataFrame = {
    // The file stream source wants a directory; select just the events
    // table out of the shared sf dir with a glob filter. Schema is
    // probed from the footer, ts canonicalized to an instant — see
    // EventsFact.canonicalTs for the cross-generation ts contract.
    val stream = graft.analysis.EventsFact.canonicalTs(spark.readStream
      .schema(graft.analysis.EventsFact.eventsSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") / count(col("value"))).as("mean_value"))
      .select(
        col("window.start").cast("date").cast("string").as("day"),
        col("event_type"), col("n"), col("mean_value"))
    // Update mode + a file sink: each micro-batch emits ONLY the
    // windows whose aggregate changed, appended to parquet — nothing
    // is ever materialized whole on the driver (complete-mode memory
    // sink would re-emit the full result every trigger; append mode
    // would hold back the newest, still-open window at end-of-input).
    // The read-back keeps each key's LAST update, so the final frame
    // equals the batch aggregation — the scale-honest sink shape: the
    // per-batch write is bounded by changed keys, the final dedup by
    // output size (#days × #types).
    // stateful windowed agg: one state store per shuffle partition,
    // paid per micro-batch — 4 fat stores beat 32 thin ones at this
    // state size (see StreamTuning)
    val outDir = java.nio.file.Files.createTempDirectory(s"graft_$queryName")
      .toFile.getAbsolutePath
    // Trigger.Once (single batch): in update mode every window touched
    // by the batch emits, so a run-to-completion needs no second
    // watermark-advance batch (that batch only evicts state this
    // terminating query discards anyway)
    val q = StreamTuning.withStreamPartitions(spark, 4) {
      stream.writeStream
        .outputMode("update")
        .trigger(Trigger.Once())
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          df.withColumn("_batch", lit(batchId))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
    }
    q.awaitTermination()
    // The read-back (last update per key) is OUTPUT-sized by
    // construction (#days × #types rows), so localize it and delete
    // the temp sink — a lazy frame over the temp dir would pin it on
    // disk forever (each run leaked a graft_daily_counts* tree).
    val result = spark.read.parquet(outDir)
      .groupBy("day", "event_type")
      .agg(
        max_by(col("n"), col("_batch")).as("n"),
        max_by(col("mean_value"), col("_batch")).as("mean_value"))
    val local = result.collect().toSeq
    val schema = result.schema
    graft.Fs.deleteTree(java.nio.file.Paths.get(outDir))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(local.asJava, schema)
  }
}
