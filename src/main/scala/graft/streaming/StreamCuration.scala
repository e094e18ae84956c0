package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Streaming corpus curation: the quality/language gate as a
  * continuous pipeline — documents stream in, per-row scoring
  * ([[graft.ext.TextProfile]] — stateless, codegen'd, so it runs in a
  * streaming plan unchanged) gates them, survivors append to the sink.
  * No state store at all: the gate is embarrassingly parallel, which
  * is exactly why the same curation logic serves batch backfills and
  * live ingestion — run to completion it equals the batch filter, and
  * the DuckDB oracle checks that (q67).
  */
object StreamCuration {

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
  ))

  def qualityGate(
      spark: SparkSession,
      sfDir: String,
      minQuality: Double = 0.5,
      queryName: String = "quality_gate"): DataFrame = {
    val gated = spark.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .withColumn("quality", graft.ext.TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_pred", graft.ext.TextAnalysis.langIdHeuristic(col("text")))
      .filter(col("quality") >= minQuality && col("lang_pred") =!= "und")
      .select(col("doc_id"), col("lang_pred"), col("quality"))
    val q = gated.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
