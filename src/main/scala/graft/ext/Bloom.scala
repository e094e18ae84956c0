package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Bloom filter over a string key column, as the pair of native
  * expressions a distributed build/probe needs:
  *
  *   - [[BloomPositions]] (build side): key → its `numHashes` bit
  *     positions; explode + distinct + a bounded collect turns any
  *     keyed frame into the packed bit array (the sketch is KB-scale
  *     regardless of corpus size — same driver-size contract as IVF's
  *     k×dim centroid matrix).
  *   - [[BloomMightContain]] (probe side): per-row membership test
  *     against the packed bits, codegen'd, no join, no shuffle — the
  *     bit array rides into generated code as a reference object, not
  *     a plan literal (a 2k-element array literal would bloat every
  *     plan string and its snapshot).
  *
  * Both sides share one static hash kernel (two murmur3 lanes +
  * splitmix64-derived second hash, Kirsch–Mitzenmacher double
  * hashing), so build/probe consistency holds by construction — there
  * is no "mirror the builtin hash" risk, and a spec asserts zero false
  * negatives on the real corpus.
  *
  * Why it matters at 100 TB: a broadcast semi-join needs the whole key
  * set on every executor; the bloom needs `m` BITS for any set size at
  * a chosen false-positive rate. Probing locally drops ~(1−fpr) of the
  * stream BEFORE any exchange, turning "shuffle everything to verify"
  * into "shuffle the survivors".
  */
object Bloom {

  /** Bit positions of `s` in an `mBits`-bit filter (Kirsch–Mitzenmacher:
    * pos_i = h1 + i·h2 mod m). */
  def positions(s: UTF8String, mBits: Int, numHashes: Int): Array[Long] = {
    val h1 = hash64(s)
    val h2 = splitmix64(h1 ^ 0x6a09e667f3bcc909L) | 1L // odd ⇒ full cycle mod 2^k m
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val h = h1 + i.toLong * h2
      out(i) = java.lang.Math.floorMod(h, mBits.toLong)
      i += 1
    }
    out
  }

  def mightContain(s: UTF8String, bits: Array[Long], numHashes: Int): Boolean = {
    val mBits = bits.length * 64
    val pos = positions(s, mBits, numHashes)
    var i = 0
    while (i < numHashes) {
      val p = pos(i)
      if ((bits((p >>> 6).toInt) & (1L << (p & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Two seeded 32-bit murmur3 lanes over the UTF-8 bytes (the
    * [[SimHash64]] kernel's construction with distinct seeds). */
  private def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val lo = Murmur3_x86_32.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 0x5f3759df)
    val hi = Murmur3_x86_32.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 0x27d4eb2f)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  private def splitmix64(in: Long): Long = {
    var z = in + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Build the packed bit array from keys already on the driver — for
    * callers that need the exact key set locally anyway (e.g.
    * [[Curation.contaminatedBloom]], whose verify join broadcasts the
    * same set): one pass instead of build-then-broadcast. For key sets
    * too large to hold, use [[build]], which keeps keys distributed. */
  def buildLocal(keys: IterableOnce[String], mBits: Int = 1 << 17, numHashes: Int = 4): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    val bits = new Array[Long](mBits / 64)
    keys.iterator.foreach { k =>
      positions(UTF8String.fromString(k), mBits, numHashes)
        .foreach { p => bits((p >>> 6).toInt) |= (1L << (p & 63L)) }
    }
    bits
  }

  /** Build the packed bit array from a one-column string frame: the
    * distributed side computes positions and distincts them; only
    * distinct BIT POSITIONS (≤ mBits) reach the driver. */
  def build(keys: DataFrame, mBits: Int = 1 << 17, numHashes: Int = 4): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    val posCol = BloomPositions(
      org.apache.spark.sql.functions.col(keys.columns.head), mBits, numHashes)
    val bits = new Array[Long](mBits / 64)
    keys.select(org.apache.spark.sql.functions.explode(posCol).as("p"))
      .distinct()
      .collect()
      .foreach { r => val p = r.getLong(0); bits((p >>> 6).toInt) |= (1L << (p & 63L)) }
    bits
  }

  /** Column API: probe `key` against a built filter. */
  def mightContainCol(key: Column, bits: Array[Long], numHashes: Int = 4): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomMightContain(org.apache.spark.sql.GraftColumnBridge.expression(key),
        new BloomBits(bits), numHashes))
}

/** Immutable packed-bits holder for [[BloomMightContain]]. A bare
  * `Array[Long]` field has reference equality, which defeats expression
  * canonicalization (two probes of the same filter never
  * `semanticEquals`, so common-subexpression elimination can't fire)
  * and lets the caller mutate the shared array after the column is
  * built. The constructor takes a defensive copy and equality/hashCode
  * are content-based. */
final class BloomBits(source: Array[Long]) extends Serializable {
  val bits: Array[Long] = source.clone()
  override def equals(other: Any): Boolean = other match {
    case b: BloomBits => java.util.Arrays.equals(bits, b.bits)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(bits)
  override def toString: String = s"BloomBits(m=${bits.length * 64})"
}

/** Build-side expression: the key's bit positions (array<long>). */
case class BloomPositions(child: Expression, mBits: Int, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_positions"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(Bloom.positions(input.asInstanceOf[UTF8String], mBits, numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.ext.Bloom.positions($c, $mBits, $numHashes))")

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

object BloomPositions {
  def apply(key: Column, mBits: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomPositions(org.apache.spark.sql.GraftColumnBridge.expression(key), mBits, numHashes))
}

/** Probe-side expression: membership test against packed bits carried
  * as a codegen reference object (never a plan literal). The bits ride
  * in a [[BloomBits]] holder so two probes of the same filter compare
  * equal (canonicalization → CSE) and the caller's array can't mutate
  * the expression after construction. */
case class BloomMightContain(child: Expression, bloomBits: BloomBits, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    Bloom.mightContain(input.asInstanceOf[UTF8String], bloomBits.bits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bloomBits.bits, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.ext.Bloom.mightContain($c, $ref, $numHashes)")
  }

  // keep plan strings sketch-free: 2k longs of filter state is payload,
  // not structure (and would destabilize plan snapshots)
  override def toString: String =
    s"bloom_might_contain($child, m=${bloomBits.bits.length * 64}, k=$numHashes)"

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
