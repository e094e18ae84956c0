package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamCurationSpec extends SparkSpec {

  test("streaming quality gate equals the batch filter (values bitwise)") {
    val streamed = StreamCuration.qualityGate(spark, sf(), queryName = "spec_qgate")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val batch = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("quality", graft.ext.TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_pred", graft.ext.TextAnalysis.langIdHeuristic(col("text")))
      .filter(col("quality") >= 0.5 && col("lang_pred") =!= "und")
      .select("doc_id", "lang_pred", "quality")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(streamed.nonEmpty && streamed.length < 500, "gate must actually filter")
    assert(streamed.toSeq == batch.toSeq)
  }
}
