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
    * boundaries coarse). */
  def extractFeatures(assets: DataFrame, parallelism: Int = 0): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    val parts = if (parallelism > 0) parallelism
      else spark.sessionState.conf.numShufflePartitions
    assets
      .select(col("asset_id"), col("media_type"), col("payload"))
      .repartition(parts, col("asset_id"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here (amortized once)
        rows.map { case (id, mt, bytes) => decodeStub(id, mt, bytes) }
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
