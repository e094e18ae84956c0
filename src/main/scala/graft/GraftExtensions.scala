package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.ext.SimHash64
import graft.stats.{TCdf, TPpf}

/** The engine as an installable Spark extension: register with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`), or
  * on an already-running session with `GraftExtensions.install(spark)`.
  * Either way the engine's native expressions become SQL functions —
  * the SURVEY §7.3 "(c)" integration path, so a SQL-only user of the
  * library needs no Scala imports:
  *
  *   - `simhash64(tokens)`    — 64-bit SimHash of a string array
  *     ([[graft.ext.SimHash64]])
  *   - `t_cdf(x, df)`         — Student-t CDF ([[graft.stats.TCdf]])
  *   - `t_ppf(p, df)`         — Student-t quantile ([[graft.stats.TPpf]])
  *   - `vec_dot(a, b)`        — array<double> dot product
  *     ([[graft.ext.DotProduct]])
  *   - `text_profile(text)`   — single-pass token/char/stopword struct
  *     ([[graft.ext.TextProfile]])
  *   - `z_value(x, y)` / `z_value3(x, y, z)` — Morton/Z-order curve
  *     index ([[graft.ext.Layout]] — composed bitwise expressions)
  *
  * All are codegen'd `Expression` trees, not UDFs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // the custom grouped-top-k physical operator (graft.plans)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // rewrite row_number-top-k window patterns onto that operator
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "misc_funcs", "", "", "built-in")

  import graft.stats.TDistExpression.toDouble

  /** The SQL function surface, shared by the extensions path (new
    * session) and [[install]] (existing session). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint of an array<string>"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (FunctionIdentifier("t_cdf"),
      info("t_cdf", "t_cdf(x, df) - Student-t cumulative distribution function"),
      (children: Seq[Expression]) => TCdf(toDouble(children(0)), toDouble(children(1)))),
    (FunctionIdentifier("t_ppf"),
      info("t_ppf", "t_ppf(p, df) - Student-t quantile (inverse CDF)"),
      (children: Seq[Expression]) => TPpf(toDouble(children(0)), toDouble(children(1)))),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double> vectors"),
      (children: Seq[Expression]) => graft.ext.DotProduct(children(0), children(1))),
    (FunctionIdentifier("text_profile"),
      info("text_profile",
        "text_profile(text) - struct(n_tokens, n_distinct, n_punct, n_chars, stop_hits) in one scan"),
      (children: Seq[Expression]) =>
        graft.ext.TextProfile(children.head, graft.ext.TextAnalysis.stopwordsByLang)),
    // z_value builders compose existing codegen'd bitwise expressions
    // (the Layout mask ladder), so SQL users get the layout key
    // without any custom Expression class
    (FunctionIdentifier("z_value"),
      info("z_value", "z_value(x, y) - 2-D Morton/Z-order curve index of two 16-bit dims"),
      (children: Seq[Expression]) =>
        graft.ext.Layout.zValueExpr(children(0), children(1))),
    (FunctionIdentifier("z_value3"),
      info("z_value3", "z_value3(x, y, z) - 3-D Morton/Z-order curve index of three 21-bit dims"),
      (children: Seq[Expression]) =>
        graft.ext.Layout.zValue3Expr(children(0), children(1), children(2))),
    (FunctionIdentifier("cdc_chunks"),
      info("cdc_chunks",
        "cdc_chunks(text) - content-defined chunks (Rabin rolling hash) of a string"),
      (children: Seq[Expression]) => graft.ext.CdcChunks(children.head)),
  )

  /** Register the SQL functions on an existing session (notebooks,
    * shells — anywhere the builder config is already out of reach). */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
