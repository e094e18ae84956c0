package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Partial-mergeable sketch aggregates for the manifest-stats path —
  * the [[DvPack]] shape applied to the two remaining per-file gathers
  * [[TxTable]] runs at commit time:
  *
  *   - [[BloomPack]] replaces `gatherBlooms`' explode→distinct→
  *     collect_list→pack-UDF pipeline (the last UDF-gather in main):
  *     each task ORs key positions straight into a fixed mBits/64-long
  *     buffer, partials merge by OR at the exchange, and the driver
  *     receives one base64 string per file — shuffle bytes = manifest
  *     bytes, no position list ever materializes, and the explode's
  *     ×numHashes row blow-up is gone.
  *   - [[HllRegs]] records the 256-register HyperLogLog sketch of a
  *     stats column per file (the [[Hll]] register semantics, byte-
  *     array face): registers merge by element-wise MAX, which is what
  *     makes per-file sketches COMPOSABLE — union registers across any
  *     file subset and [[Hll.estimateFromRegisters]] answers NDV for
  *     that subset off the manifest alone, no data file opened.
  *
  * Both buffers are fixed-size (mBits/8 and 256 bytes) regardless of
  * row count — a 10M-row file costs the same aggregation state as a
  * 10-row one, the property that makes the commit-time stats pass safe
  * at any file size.
  */
case class BloomPack(
    child: Expression, mBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(mBits % 64 == 0 && mBits > 0,
    s"bloomBits must be a positive multiple of 64: $mBits")

  override def prettyName: String = "bloom_pack"
  /** base64 of the packed bit array — the manifest's wire rendering,
    * emitted once per GROUP (file), so producing the string here costs
    * #files allocations, not #rows. */
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def inputTypes = Seq(StringType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val ps = Bloom.positions(v.asInstanceOf[UTF8String], mBits, numHashes)
      var i = 0
      while (i < ps.length) {
        val p = ps(i)
        buffer((p >>> 6).toInt) |= (1L << (p & 63L))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < other.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  private def isEmpty(buffer: Array[Long]): Boolean = {
    var i = 0
    while (i < buffer.length) { if (buffer(i) != 0L) return false; i += 1 }
    true
  }

  /** NULL for a group that saw no non-null key (such a file records no
    * bloom — the read side's conservative must-read path). */
  override def eval(buffer: Array[Long]): Any =
    if (isEmpty(buffer)) null
    else UTF8String.fromString(
      java.util.Base64.getEncoder.encodeToString(BloomPack.toBytes(buffer)))

  override def serialize(buffer: Array[Long]): Array[Byte] = BloomPack.toBytes(buffer)

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(storageFormat)
    Array.fill(storageFormat.length / 8)(buf.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomPack =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomPack =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomPack =
    copy(child = newChild)
}

object BloomPack {
  private[ext] def toBytes(bits: Array[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(buf.putLong)
    buf.array()
  }

  /** Column builder: `BloomPack.agg(col("k").cast("string"), m, k)`. */
  def agg(key: Column, mBits: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomPack(org.apache.spark.sql.GraftColumnBridge.expression(key),
        mBits, numHashes).toAggregateExpression())
}

/** `hll_regs(h60)`: the [[Hll]] 256-register sketch as one 256-byte
  * array per group. Input is the 60-bit hash ([[Hll.hash60]] — the
  * production xxhash64 lane by default), register index = top 8 bits,
  * register value = max over the group of rho(52-bit suffix). A byte 0
  * means "register never hit" (Hll's v_empty). Merge = element-wise
  * max, the HLL composition law — [[graft.ext.SketchPackSpec]] proves
  * it exactly (not approximately: registers are maxima, so any
  * partitioning of the same rows yields byte-identical merged state).
  * NULL hashes are ignored; a group with no non-null hash evaluates to
  * NULL. */
case class HllRegs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "hll_regs"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = (h >>> Hll.SuffixBits).toInt
      require(reg < Hll.M,
        s"hll_regs input is not a ${Hll.SuffixBits + 8}-bit hash: $h — " +
          "feed it Hll.hash60's lanes, not a raw 64-bit hash")
      val suf = h & ((1L << Hll.SuffixBits) - 1)
      val rho =
        if (suf == 0L) Hll.SuffixBits + 1
        else java.lang.Long.numberOfLeadingZeros(suf) - (63 - Hll.SuffixBits)
      if (rho > buffer(reg)) buffer(reg) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Hll.M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  private def isEmpty(buffer: Array[Byte]): Boolean = {
    var i = 0
    while (i < Hll.M) { if (buffer(i) != 0) return false; i += 1 }
    true
  }

  override def eval(buffer: Array[Byte]): Any =
    if (isEmpty(buffer)) null else buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegs =
    copy(child = newChild)
}

object HllRegs {
  /** Column builder over a 60-bit hash column ([[Hll.hash60]]). */
  def agg(h60: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HllRegs(org.apache.spark.sql.GraftColumnBridge.expression(h60))
        .toAggregateExpression())
}
