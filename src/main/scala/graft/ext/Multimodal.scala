package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads plus typed metadata (see [[graft.model.Schemas.mediaAsset]]).
  *
  * The Spark-side plumbing — schema, partition-batched decode loop,
  * feature projection — is real and tested; the codec itself is a
  * deterministic STUB (this environment ships no image/audio
  * libraries). `decodeBatch` is the single seam to swap in a real
  * decoder (JNI/FFI per executor); everything around it (mapPartitions
  * batching so the codec amortizes per-partition init, repartition by
  * asset so decode parallelism is independent of file layout) is the
  * shape a production pipeline needs.
  */
object Multimodal {

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      // stubbed "decoded" features — deterministic functions of payload
      mean_byte: Double,
      byte_entropy: Double,
      frame_count: Int)

  /** The codec seam: a real decoder (JNI/FFI image/audio library)
    * drops in behind this trait without touching the plan.
    *
    * Lifecycle per PARTITION (not per row): `open()` once before the
    * first batch — native contexts, model weights, scratch buffers;
    * `close()` exactly once when the task ends, including failure and
    * early-termination paths (registered as a task-completion
    * listener, the only hook that survives a `limit` downstream).
    * `decodeBatch` receives at most `batchSize` assets at a time so a
    * vectorizing codec amortizes its per-call overhead — the same
    * batch shape `mapInPandas`/Arrow would hand a Python decoder. */
  trait MediaCodec extends Serializable {
    def open(): Unit = ()
    def close(): Unit = ()
    def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
      batch.map { case (id, mt, bytes) => decode(id, mt, bytes) }
    def decode(assetId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures
  }

  /** The in-repo deterministic stub codec (no media libraries ship in
    * this environment): byte-level "features" standing in for decoded
    * pixels/samples. */
  object StubCodec extends MediaCodec {
    override def decode(assetId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures =
      decodeStub(assetId, mediaType, payload)
  }

  /** STUB decode: deterministic features from raw bytes. A real
    * implementation decodes pixels/samples here; signature and batch
    * shape are what matter. */
  private[ext] def decodeStub(assetId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures = {
    val n = if (payload == null) 0 else payload.length
    var sum = 0L
    val hist = new Array[Long](256)
    var i = 0
    while (i < n) {
      val b = payload(i) & 0xff
      sum += b
      hist(b) += 1
      i += 1
    }
    val mean = if (n > 0) sum.toDouble / n else 0.0
    var entropy = 0.0
    if (n > 0) {
      var j = 0
      while (j < 256) {
        if (hist(j) > 0) {
          val p = hist(j).toDouble / n
          entropy -= p * math.log(p) / math.log(2.0)
        }
        j += 1
      }
    }
    // "frame sampling": pretend fixed-size frames; video/audio stride differs
    val frameSize = mediaType match {
      case "video" => 4096
      case "audio" => 1024
      case _ => n.max(1)
    }
    MediaFeatures(assetId, mediaType, n.toLong, mean, entropy,
      if (n == 0) 0 else 1 + (n - 1) / frameSize)
  }

  /** Decode/feature-extract over partition-batched rows. Repartitions
    * by asset_id so decode work spreads across executors regardless of
    * how few input files there are (binary blobs make row-group
    * boundaries coarse).
    *
    * The codec is created PER TASK via `codecFactory` — concurrent
    * tasks in one executor JVM must not share a codec instance, or one
    * task's completion listener would close() the native context other
    * tasks are still decoding with. Each task's instance is opened
    * before its first batch, fed `batchSize`-asset batches, and closed
    * on task completion (success, failure, or early termination
    * alike). Stateless codecs (like [[StubCodec]]) may safely return a
    * shared singleton from the factory. */
  def extractFeatures(
      assets: DataFrame,
      codecFactory: () => MediaCodec = () => StubCodec,
      parallelism: Int = 0,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    val parts = if (parallelism > 0) parallelism
      else spark.sessionState.conf.numShufflePartitions
    assets
      .select(col("asset_id"), col("media_type"), col("payload"))
      .repartition(parts, col("asset_id"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = codecFactory()
        codec.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
        rows.grouped(batchSize).flatMap(batch => codec.decodeBatch(batch))
      }
  }

  /** Build a media-asset table from any binary-able column — used by
    * tests and as the documented ingestion pattern (payloads stay
    * opaque; metadata is first-class columns). */
  def assetsFromBinary(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))
}
