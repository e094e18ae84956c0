package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Expression, Literal, ShiftLeft}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional clustering. Writing a table range-partitioned and
  * sorted by the Z-value of its query dimensions gives min/max-stat
  * pruning on ALL of them from ONE sort order — the standard layout
  * trick for large scan-heavy tables (a linear sort on x leaves
  * y scattered across every file; the Z-curve keeps (x,y)-neighbors in
  * the same few files).
  *
  * The interleaves are built directly as trees of Spark's bitwise
  * expressions (shifts/masks inside whole-stage codegen, no UDF, no
  * custom Expression class), exposed both as `Column` ops and as the
  * SQL functions `z_value`/`z_value3` (via [[graft.GraftExtensions]]),
  * and bit-for-bit mirrorable in any engine with 64-bit integer ops —
  * the oracle computes the identical interleave.
  */
object Layout {

  private def lant(a: Expression, m: Long): Expression = BitwiseAnd(a, Literal(m))
  private def step(a: Expression, shift: Int, m: Long): Expression =
    lant(BitwiseOr(a, ShiftLeft(a, Literal(shift))), m)

  /** Spread the low 16 bits of `v` so bit i lands at position 2i —
    * the classic mask ladder (public-domain "Interleave bits by binary
    * magic numbers" bit-twiddling identity), on longs. */
  private def spread16(v: Expression): Expression = {
    val s0 = lant(v, 0x0000FFFFL)
    val s1 = step(s0, 8, 0x00FF00FFL)
    val s2 = step(s1, 4, 0x0F0F0F0FL)
    val s3 = step(s2, 2, 0x33333333L)
    step(s3, 1, 0x55555555L)
  }

  /** Spread the low 21 bits of `v` so bit i lands at position 3i —
    * the 3-D mask ladder (same identity, stride 3). */
  private def spread21(v: Expression): Expression = {
    val s0 = lant(v, 0x1FFFFFL)
    val s1 = step(s0, 32, 0x1F00000000FFFFL)
    val s2 = step(s1, 16, 0x1F0000FF0000FFL)
    val s3 = step(s2, 8, 0x100F00F00F00F00FL)
    val s4 = step(s3, 4, 0x10C30C30C30C30C3L)
    step(s4, 2, 0x1249249249249249L)
  }

  private def asLong(e: Expression): Expression = Cast(e, LongType)

  /** 2-D Morton/Z-value as a raw expression tree (SQL function path —
    * the registry needs resolved catalyst nodes, not Column sugar). */
  def zValueExpr(x: Expression, y: Expression): Expression =
    BitwiseOr(spread16(asLong(x)),
      ShiftLeft(spread16(asLong(y)), Literal(1)))

  /** 3-D Morton/Z-value expression (63-bit curve index). */
  def zValue3Expr(x: Expression, y: Expression, z: Expression): Expression =
    BitwiseOr(
      BitwiseOr(spread21(asLong(x)), ShiftLeft(spread21(asLong(y)), Literal(1))),
      ShiftLeft(spread21(asLong(z)), Literal(2)))

  /** Morton/Z-value of two 16-bit dimensions: x's bits at even
    * positions, y's at odd — a 32-bit curve index as a long. Inputs
    * are masked to 16 bits (callers bucket raw values first, e.g.
    * `pmod(col, lit(65536))`). */
  def zValue(x: Column, y: Column): Column =
    column(zValueExpr(expression(x), expression(y)))

  /** 3-D Morton/Z-value of three 21-bit dimensions (63-bit curve index
    * as a long) — the arity layout tables typically need (e.g. user ×
    * time × value). Inputs masked to 21 bits. */
  def zValue3(x: Column, y: Column, z: Column): Column =
    column(zValue3Expr(expression(x), expression(y), expression(z)))

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
