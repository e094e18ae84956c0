package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-STATIC join: a continuous feed enriched against a batch
  * dimension. Stateless on the stream side — the dim is broadcast into
  * every micro-batch (no state store, no watermark needed for the join
  * itself; the watermark below belongs to the downstream windowed
  * aggregation). This is the third join shape next to
  * [[StreamJoin]]'s stream-stream interval join and the batch joins:
  * at 100 TB the dim refresh cadence is the only twist (each
  * micro-batch re-resolves the dim plan, so a slowly-changing
  * dimension read from a table picks up updates between batches).
  */
object StreamStatic {

  /** The enrichment dim for the events feed: type -> (category,
    * weight). A literal frame here; production would read a table. */
  def eventDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("click", "engagement", 1),
      ("view", "engagement", 1),
      ("purchase", "conversion", 3),
      ("signup", "conversion", 5),
      ("error", "ops", 0))
      .toDF("event_type", "category", "weight")
  }

  /** Daily per-category counts and weighted sums of the enriched
    * stream, run to completion — equals the batch join+agg (q110's
    * oracle). Same update-mode file-sink + last-update read-back
    * contract as [[EventsStream.dailyTypeCounts]]: the returned frame
    * is DRIVER-LOCALIZED (#days x #categories rows by construction). */
  def dailyCategoryStats(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = graft.analysis.EventsFact.canonicalTs(spark.readStream
      .schema(graft.analysis.EventsFact.eventsSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))
      .join(broadcast(eventDim(spark)), "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("category"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("weight").cast("long")).as("weight_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .select(
        col("window.start").cast("date").cast("string").as("day"),
        col("category"), col("n"), col("weight_sum"), col("value_sum"))
    val outDir = java.nio.file.Files.createTempDirectory("graft_streamstatic")
      .toFile.getAbsolutePath
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
    val result = spark.read.parquet(outDir)
      .groupBy("day", "category")
      .agg(
        max_by(col("n"), col("_batch")).as("n"),
        max_by(col("weight_sum"), col("_batch")).as("weight_sum"),
        max_by(col("value_sum"), col("_batch")).as("value_sum"))
    val local = result.collect().toSeq
    val schema = result.schema
    graft.Fs.deleteTree(java.nio.file.Paths.get(outDir))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(local.asJava, schema)
  }
}
