package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional clustering. Writing a table range-partitioned and
  * sorted by the Z-value of two query dimensions gives min/max-stat
  * pruning on BOTH dimensions from ONE sort order — the standard
  * layout trick for large scan-heavy tables (a linear sort on x leaves
  * y scattered across every file; the Z-curve keeps (x,y)-neighbors in
  * the same few files).
  *
  * Everything here is plain integer Column math (shifts/masks inside
  * whole-stage codegen, no UDF, no shuffle), and bit-for-bit
  * mirrorable in any engine with 64-bit integer ops — the oracle
  * computes the identical interleave.
  */
object Layout {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i —
    * the classic mask ladder (public-domain "Interleave bits by binary
    * magic numbers" bit-twiddling identity), on longs. */
  private def spread16(v: Column): Column = {
    val m0 = lit(0x0000FFFFL)
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val s0 = v.bitwiseAND(m0)
    val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(m1)
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(m2)
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(m3)
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(m4)
  }

  /** Morton/Z-value of two 16-bit dimensions: x's bits at even
    * positions, y's at odd — a 32-bit curve index as a long. Inputs
    * are masked to 16 bits (callers bucket raw values first, e.g.
    * `pmod(col, lit(65536))`). */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Spread the low 21 bits of `v` so bit i lands at position 3i —
    * the 3-D mask ladder (same public-domain identity, stride 3). */
  private def spread21(v: Column): Column = {
    val m0 = lit(0x1FFFFFL)
    val m1 = lit(0x1F00000000FFFFL)
    val m2 = lit(0x1F0000FF0000FFL)
    val m3 = lit(0x100F00F00F00F00FL)
    val m4 = lit(0x10C30C30C30C30C3L)
    val m5 = lit(0x1249249249249249L)
    val s0 = v.bitwiseAND(m0)
    val s1 = s0.bitwiseOR(shiftleft(s0, 32)).bitwiseAND(m1)
    val s2 = s1.bitwiseOR(shiftleft(s1, 16)).bitwiseAND(m2)
    val s3 = s2.bitwiseOR(shiftleft(s2, 8)).bitwiseAND(m3)
    val s4 = s3.bitwiseOR(shiftleft(s3, 4)).bitwiseAND(m4)
    s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(m5)
  }

  /** 3-D Morton/Z-value of three 21-bit dimensions (63-bit curve index
    * as a long) — the arity layout tables typically need (e.g. user ×
    * time × value). Inputs masked to 21 bits. */
  def zValue3(x: Column, y: Column, z: Column): Column =
    spread21(x.cast("long"))
      .bitwiseOR(shiftleft(spread21(y.cast("long")), 1))
      .bitwiseOR(shiftleft(spread21(z.cast("long")), 2))

  /** The identical interleave in DuckDB SQL (for oracles): same mask
    * ladder on BIGINT. */
  def zValueSql(xExpr: String, yExpr: String): String = {
    def spread(e: String): String = {
      val s0 = s"(($e) & 65535)"
      val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
      val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
      val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
      s"(($s3 | ($s3 << 1)) & 1431655765)"
    }
    s"(${spread(s"CAST($xExpr AS BIGINT)")} | (${spread(s"CAST($yExpr AS BIGINT)")} << 1))"
  }

  /** Cluster a frame along the Z-curve of two bucketed dimensions:
    * range-partition by Z-value (so each output partition owns a
    * contiguous curve segment ≈ a rectangle in (x,y)) and sort within
    * partitions (so per-file column min/max stats are tight on BOTH
    * dimensions). This is a one-shuffle layout pass run before a
    * write — the read side needs nothing special, pruning comes from
    * ordinary parquet min/max stats. */
  def zOrderBy(
      df: DataFrame,
      x: Column,
      y: Column,
      numPartitions: Int): DataFrame = {
    val z = zValue(x, y)
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
