package graft.ext

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Count–min sketch (Cormode & Muthukrishnan 2005) as a typed, partial-
  * mergeable [[Aggregator]]: `depth × width` counters, each row bumps
  * one counter per depth lane, merge is elementwise add — so the
  * sketch builds map-side like any partial aggregate and a frequency
  * query never shuffles the corpus.
  *
  * Guarantees (proved in CountMinSpec against exact counts):
  * estimate ≥ true count (always), and estimate ≤ true + εN with
  * probability 1−δ where ε = e/width, δ = e^−depth.
  *
  * At 100 TB: a token-frequency `groupBy` must shuffle every distinct
  * token; the sketch is a constant `depth·width·8` bytes per partition
  * merged in one reduce — the standard first pass for heavy-hitter
  * candidates, vocabulary pruning, or stop-list discovery, with exact
  * verification (a semi-join on the candidate set) as the second pass
  * when exactness matters — the same sketch-then-verify shape as
  * [[Curation.contaminatedBloom]].
  */
object CountMin {

  final val DefaultDepth = 4
  final val DefaultWidth = 2048

  def hashLane(token: String, lane: Int, width: Int): Int = {
    val bytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = Murmur3_x86_32.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 0x9e3779b9 + lane * 0x85ebca6b)
    java.lang.Math.floorMod(h, width)
  }

  /** Cross-engine-mirrorable lane family: ONE md5 per token (the same
    * 60-bit hex-prefix base mod P the minhash mirror uses), then one
    * affine lane per depth — `((a_d·base + b_d) mod P) mod width`,
    * all non-negative long arithmetic with no overflow (a, base < P ≈
    * 2^31 ⇒ product < 2^62). Murmur3 ([[hashLane]]) stays the
    * production default; this family exists so a CMS estimate can be
    * reproduced bit for bit by an external SQL oracle. */
  // MessageDigest is not thread-safe and getInstance per token is the
  // dominant cost of the reduce path — one instance per task thread.
  private val digestLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Base(token: String): Long = {
    val md = digestLocal.get()
    md.reset()
    val d = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars == first 60 bits of the digest, assembled
    // directly (formatting a hex string per token measured ~10× the
    // digest itself): 7 whole bytes then the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xffL) >>> 4)
    v % Dedup.MinhashP
  }

  def md5Lane(base: Long, lane: Int, width: Int): Int = {
    val (a, b) = laneParams(lane)
    (((a * base + b) % Dedup.MinhashP) % width).toInt
  }

  /** Affine constants per depth lane — the shared splitmix-derived
    * generator, so the SQL mirror inlines the same literals.
    * Precomputed: the reduce path asks once per token per lane. */
  private val MaxLanes = 64
  private lazy val laneTable: Array[(Long, Long)] =
    Dedup.affineParams(MaxLanes).toArray
  def laneParams(lane: Int): (Long, Long) = {
    require(lane >= 0 && lane < MaxLanes, s"lane out of range: $lane")
    laneTable(lane)
  }

  /** Point estimate = min over lanes (each lane overestimates). */
  def estimate(sketch: Array[Long], token: String, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + hashLane(token, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }

  /** [[estimate]] over a sketch built with `md5Lanes = true`. */
  def estimateMd5(sketch: Array[Long], token: String, depth: Int, width: Int): Long = {
    val base = md5Base(token)
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + md5Lane(base, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }

  /** The flattened counter matrix (row-major by depth lane). */
  final case class CmsState(counters: Array[Long])

  /** Aggregator over a string column producing the sketch;
    * `md5Lanes = true` swaps in the mirrorable lane family. */
  final class SketchAggregator(depth: Int = DefaultDepth, width: Int = DefaultWidth,
      md5Lanes: Boolean = false)
      extends Aggregator[String, CmsState, CmsState] {
    override def zero: CmsState = CmsState(new Array[Long](depth * width))
    override def reduce(buf: CmsState, token: String): CmsState = {
      if (token != null) {
        if (md5Lanes) {
          val base = CountMin.md5Base(token)
          var d = 0
          while (d < depth) {
            buf.counters(d * width + CountMin.md5Lane(base, d, width)) += 1L
            d += 1
          }
        } else {
          var d = 0
          while (d < depth) {
            buf.counters(d * width + CountMin.hashLane(token, d, width)) += 1L
            d += 1
          }
        }
      }
      buf
    }
    override def merge(a: CmsState, b: CmsState): CmsState = {
      var i = 0
      while (i < a.counters.length) { a.counters(i) += b.counters(i); i += 1 }
      a
    }
    override def finish(buf: CmsState): CmsState = buf
    override def bufferEncoder: Encoder[CmsState] = Encoders.product[CmsState]
    override def outputEncoder: Encoder[CmsState] = Encoders.product[CmsState]
  }

  def sketch(depth: Int = DefaultDepth, width: Int = DefaultWidth,
      md5Lanes: Boolean = false): TypedColumn[String, CmsState] =
    new SketchAggregator(depth, width, md5Lanes).toColumn.name("cms")
}
