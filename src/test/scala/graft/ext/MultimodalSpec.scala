package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary plumbing: features are deterministic functions of payload") {
    val docs = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFromBinary(docs, "doc_id", "text", "image")
    assert(assets.schema("payload").dataType.typeName == "binary")
    val f = Multimodal.extractFeatures(assets, parallelism = 2)
      .collect().map(m => m.asset_id -> m).toMap
    assert(f(1L).n_bytes == 4 && f(1L).byte_entropy == 0.0) // single symbol
    assert(f(2L).n_bytes == 4 && math.abs(f(2L).byte_entropy - 2.0) < 1e-12) // 4 distinct
    assert(f(1L).mean_byte == 'a'.toInt.toDouble)
    assert(f(3L).n_bytes == 0 && f(3L).frame_count == 0)
  }

  test("frame sampling stride depends on media type") {
    val payload = Array.fill(10000)('x'.toByte)
    val video = Multimodal.extractFeatures(
      Multimodal.assetsFromBinary(
        Seq((1L, new String(payload))).toDF("doc_id", "text"), "doc_id", "text", "video"))
      .collect().head
    assert(video.frame_count == 3) // ceil(10000 / 4096)
    val audio = Multimodal.extractFeatures(
      Multimodal.assetsFromBinary(
        Seq((1L, new String(payload))).toDF("doc_id", "text"), "doc_id", "text", "audio"))
      .collect().head
    assert(audio.frame_count == 10) // ceil(10000 / 1024)
  }

  test("decode runs distributed over repartitioned assets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val assets = Multimodal.assetsFromBinary(docs, "doc_id", "text", "image")
    val out = Multimodal.extractFeatures(assets, parallelism = 4)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.count() == docs.count())
  }
}
