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

  test("codec lifecycle: open per partition, bounded batches, close always runs") {
    CountingCodec.reset()
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val assets = Multimodal.assetsFromBinary(docs, "doc_id", "text", "image")
    val viaTrait = Multimodal.extractFeatures(assets, () => CountingCodec,
        parallelism = 4, batchSize = 8)
      .collect().map(m => m.asset_id -> m.byte_entropy).toMap
    assert(CountingCodec.opens.get() == 4, "one open per partition")
    assert(CountingCodec.closes.get() == 4, "close must run for every task")
    assert(CountingCodec.maxBatch.get() <= 8, "batches bounded by batchSize")
    assert(CountingCodec.batches.get() >= (docs.count() / 8).toInt, "work arrived in batches")
    // decoding through the trait produces the stub path's features
    val direct = Multimodal.extractFeatures(assets, parallelism = 4)
      .collect().map(m => m.asset_id -> m.byte_entropy).toMap
    assert(viaTrait == direct)
    // close still runs when the consumer stops early (limit)
    CountingCodec.reset()
    Multimodal.extractFeatures(assets, () => CountingCodec, parallelism = 2).limit(3).collect()
    assert(CountingCodec.closes.get() == CountingCodec.opens.get(),
      "early termination must still close every opened codec")
  }
}

/** Spec fake: counts lifecycle calls through static (JVM-singleton)
  * state — local mode shares the JVM, so executor-side increments are
  * visible to the driver assertions. */
object CountingCodec extends Multimodal.MediaCodec {
  import java.util.concurrent.atomic.AtomicInteger
  val opens = new AtomicInteger
  val closes = new AtomicInteger
  val batches = new AtomicInteger
  val maxBatch = new AtomicInteger
  def reset(): Unit = Seq(opens, closes, batches, maxBatch).foreach(_.set(0))
  override def open(): Unit = opens.incrementAndGet()
  override def close(): Unit = closes.incrementAndGet()
  override def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[Multimodal.MediaFeatures] = {
    batches.incrementAndGet()
    maxBatch.updateAndGet(m => math.max(m, batch.size))
    super.decodeBatch(batch)
  }
  override def decode(assetId: Long, mediaType: String, payload: Array[Byte]): Multimodal.MediaFeatures =
    Multimodal.StubCodec.decode(assetId, mediaType, payload)
}
