package graft.stats

import org.apache.commons.math3.distribution.TDistribution
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Student-t CDF / quantile as native Catalyst expressions (SURVEY §7.3:
  * optional codegen-friendly upgrade over the [[StudentT]] UDFs; used by
  * the SQL surface registered in [[graft.GraftExtensions]]).
  *
  * Both share a static kernel ([[TMath]]) between interpreted eval and
  * generated code; invalid domains (df < 1, p outside (0,1)) yield NaN
  * in the kernel which the expression surfaces as SQL NULL — the
  * reference's n<2 guard (`/root/reference/etl_pipeline.py:38-39`).
  */
object TMath {
  /** CDF of Student-t with `df` degrees of freedom; NaN if df <= 0. */
  def cdf(x: Double, df: Double): Double =
    if (df <= 0.0 || x.isNaN || df.isNaN) Double.NaN
    else new TDistribution(df).cumulativeProbability(x)

  /** Quantile (inverse CDF); NaN outside the domain. */
  def ppf(p: Double, df: Double): Double =
    if (df < 1.0 || p.isNaN || df.isNaN || p <= 0.0 || p >= 1.0) Double.NaN
    else new TDistribution(df).inverseCumulativeProbability(p)
}

object TDistExpression {
  /** Children arrive from SQL with whatever numeric type the user
    * wrote; normalize to double at construction (AbstractDataType —
    * the implicit-cast hook — is private[sql] in Spark 4). */
  def toDouble(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)
}

abstract class TDistExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  def kernel: String // static method name on graft.stats.TMath
  def kernelEval(a: Double, b: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = kernelEval(a.asInstanceOf[Double], b.asInstanceOf[Double])
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |double ${ev.value}_r = graft.stats.TMath.$kernel($a, $b);
      |if (Double.isNaN(${ev.value}_r)) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r; }
      |""".stripMargin)
}

/** SQL: `t_cdf(x, df)` — P(T_df <= x). */
case class TCdf(left: Expression, right: Expression) extends TDistExpression {
  override def prettyName: String = "t_cdf"
  override def kernel: String = "cdf"
  override def kernelEval(a: Double, b: Double): Double = TMath.cdf(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TCdf =
    copy(left = l, right = r)
}

/** SQL: `t_ppf(p, df)` — quantile of Student-t. */
case class TPpf(left: Expression, right: Expression) extends TDistExpression {
  override def prettyName: String = "t_ppf"
  override def kernel: String = "ppf"
  override def kernelEval(a: Double, b: Double): Double = TMath.ppf(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TPpf =
    copy(left = l, right = r)
}
