package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** 64-bit SimHash over a token array as a native Catalyst `Expression`
  * (SURVEY §7.3 preference order (b): cheaper than a Scala UDF — no
  * encoder round-trip, operates on UTF8String bytes in place, and
  * participates in whole-stage codegen via the static `eval` helper
  * referenced from [[doGenCode]]).
  *
  * Algorithm (Charikar 2002, as popularized for web dedup): each token
  * hashes to 64 bits via two 32-bit murmur3 lanes; a per-bit counter
  * adds +1/−1 per token; the sign vector is the fingerprint. Near-dup
  * docs differ in few bits (Hamming distance ≤ 3 is the usual web
  * threshold).
  */
case class SimHash64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // getUTF8String on a non-string array segfault-class-misreads; demand
  // array<string> at analysis (castable inputs are upgraded, the rest
  // rejected before execution).
  // (return type inferred — AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    SimHash64.hashTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.SimHash64.hashTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static kernel shared by interpreted eval and generated code. */
  def hashTokens(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h64 = hash64(t)
        var b = 0
        while (b < 64) {
          if (((h64 >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 64 bits from two seeded 32-bit murmur3 lanes over the UTF-8 bytes. */
  private def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val lo = Murmur3_x86_32.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 0x9747b28c)
    val hi = Murmur3_x86_32.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** Column API: simhash64(tokens). */
  def apply(tokens: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimHash64(org.apache.spark.sql.GraftColumnBridge.expression(tokens)))

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
