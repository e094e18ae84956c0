package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking via a Rabin-style ROLLING HASH, as a
  * native codegen'd Catalyst expression (the SURVEY §7.3 preference
  * order (b), like [[SimHash64]]/[[graft.ext.TextProfile]]).
  *
  * The rsync/LBFS/dedup-store discipline: a polynomial hash of the
  * trailing [[CdcChunks.Window]] codepoints rolls across the text in
  * O(1) per position, and a cut is placed wherever
  * `H % `[[CdcChunks.Mask]]` == 0` — so chunk boundaries are decided
  * by CONTENT, not offsets. Insert one word into a document and byte-
  * offset chunking shifts every later chunk; content-defined chunks
  * realign after one window, so near-identical documents share almost
  * all their chunks — the property sub-document dedup
  * ([[Dedup.dedupSegments]]) and delta storage build on, without
  * depending on the author's paragraph structure.
  *
  * Exactness contract (what makes the q143 oracle possible): the
  * incremental roll `H_i = (H_{i−1}·B + c_i − c_{i−w}·B^w) mod P`
  * equals the direct window sum `Σ_k c_{i−k}·B^k mod P` — mod is a
  * ring homomorphism — so a SQL engine can recompute every H from
  * eight `ascii(substring(...))·B^k` products and match the cut set
  * bit for bit. Positions and characters are Unicode CODEPOINTS
  * (what SQL `substring`/`ascii` count), not UTF-16 chars or bytes.
  *
  * Degenerate shapes: text shorter than the window (or with no cut
  * positions) is one whole-text chunk; empty text is an empty array;
  * a cut landing on the last position merges with the implicit final
  * boundary (no empty trailing chunk).
  */
case class CdcChunks(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    CdcChunks.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.CdcChunks.split($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** Rolling window (codepoints), polynomial base, modulus, cut mask:
    * expected chunk length ≈ Mask codepoints. */
  final val Window = 8
  final val Base = 257L
  final val Mod = 1000003L
  final val Mask = 64L

  private val BPowW: Long = {
    var p = 1L
    var i = 0
    while (i < Window) { p = p * Base % Mod; i += 1 }
    p
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def split(text: UTF8String): ArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    // codepoint walk (SQL substring/ascii semantics)
    val cps = s.codePoints().toArray
    val n = cps.length
    val ring = new Array[Long](Window)
    var h = 0L
    val cutsB = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < n) {
      val c = cps(i).toLong
      h = (h * Base + c) % Mod
      if (i >= Window) {
        h = ((h - ring(i % Window) * BPowW) % Mod + Mod) % Mod
      }
      ring(i % Window) = c
      // 1-based position i+1; eligible once a full window is behind it
      if (i + 1 >= Window && h % Mask == 0L && i + 1 < n) cutsB += (i + 1)
      i += 1
    }
    cutsB += n
    val out = new Array[Any](cutsB.length)
    var prevCp = 0
    var prevCharIdx = 0
    var j = 0
    while (j < cutsB.length) {
      val endCp = cutsB(j)
      val endCharIdx = s.offsetByCodePoints(prevCharIdx, endCp - prevCp)
      out(j) = UTF8String.fromString(s.substring(prevCharIdx, endCharIdx))
      prevCp = endCp
      prevCharIdx = endCharIdx
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: cdc_chunks(text). */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CdcChunks(org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
