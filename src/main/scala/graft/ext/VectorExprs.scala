package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression (SURVEY §7.3 preference (b)).
  *
  * The `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order form is
  * semantically identical but CodegenFallback: every element evaluates
  * an interpreted lambda with boxed doubles — at near-dup scale
  * (O(pairs) × dim evaluations) that interpretation tax dominates the
  * whole operator. This expression is one tight primitive loop, shared
  * verbatim between interpreted eval and generated code, with the same
  * left-to-right accumulation order (bitwise-identical results).
  *
  * NULL if either side is NULL or lengths differ; element NULLs are
  * treated as 0 contribution (embeddings never contain them — the
  * guard keeps the expression total rather than throwing mid-scan).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  // Analysis-time contract: ArrayData.getDouble reads 8-byte lanes, so a
  // raw array<float>/array<int> child would return garbage widths. The
  // implicit-cast variant upgrades castable inputs (array<float> — the
  // shipped embeddings element type — widens to array<double>) and fails
  // analysis, not runtime, for the rest.
  // (return type inferred — AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r.isNaN && java.lang.Double.doubleToRawLongBits(r) == DotProduct.MismatchBits) null
    else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |double ${ev.value}_r = graft.ext.DotProduct.dot($a, $b);
      |if (Double.isNaN(${ev.value}_r) &&
      |    Double.doubleToRawLongBits(${ev.value}_r) == graft.ext.DotProduct.MismatchBits()) {
      |  ${ev.isNull} = true;
      |} else { ${ev.value} = ${ev.value}_r; }
      |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object DotProduct {
  /** Sentinel NaN payload marking "length mismatch → NULL" (a real NaN
    * from the data keeps the canonical payload and passes through). */
  val MismatchBits: Long = 0x7ff8dead00000000L

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return java.lang.Double.longBitsToDouble(MismatchBits)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DotProduct(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}
