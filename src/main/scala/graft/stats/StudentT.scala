package graft.stats

import org.apache.commons.math3.distribution.TDistribution
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Student-t distribution math the reference gets from scipy.
  *
  * `scipy.stats.t.ppf((1+conf)/2, n-1)` at `/root/reference/etl_pipeline.py:42`
  * and the two-sided p-value inside `scipy.stats.ttest_ind`
  * (`/root/reference/etl_pipeline.py:137`) both reduce to the Student-t
  * quantile/CDF, which commons-math3 (already on Spark's classpath)
  * provides. Wrapped as Scala UDFs: the per-row work is a handful of
  * special-function evaluations on *aggregated* rows (one per
  * (country, antigen) group), so the non-codegen cost is irrelevant —
  * these never run on the fact-table hot path.
  */
object StudentT extends Serializable {

  /** Inverse CDF (quantile). Returns null for df < 1 — the reference's
    * n<2 guard (`etl_pipeline.py:38-39`) surfaces as a NULL CI. */
  val tInv: UserDefinedFunction = udf { (p: Double, df: Double) =>
    if (df < 1.0 || p.isNaN || df.isNaN) None
    else Some(new TDistribution(df).inverseCumulativeProbability(p))
  }

  /** Two-sided p-value for a t statistic at the given df; null when the
    * test is undefined (df <= 0, reference guard `etl_pipeline.py:136`). */
  val tPValue2: UserDefinedFunction = udf { (t: Double, df: Double) =>
    if (df <= 0.0 || t.isNaN || df.isNaN) None
    else Some(2.0 * (1.0 - new TDistribution(df).cumulativeProbability(math.abs(t))))
  }

  /** 95%-style CI half-width: tinv((1+conf)/2, n-1) * sem.
    * sem must be stddev_samp/sqrt(n) (scipy sem ddof=1 — SURVEY §4.3 #4). */
  def ciHalfWidth(sem: Column, n: Column, conf: Double = 0.95): Column =
    tInv(lit((1.0 + conf) / 2.0), n.cast("double") - lit(1.0)) * sem

  /** Welch–Satterthwaite degrees of freedom from per-side (var_samp, n).
    * Spelled with plain multiplication, not pow: x*x is one IEEE op in
    * every engine, while pow(x, 2) may route through exp/log — the
    * mirrored DuckDB oracle uses the identical x*x form. */
  def welchDf(v1: Column, n1: Column, v2: Column, n2: Column): Column = {
    val a = v1 / n1
    val b = v2 / n2
    val se2 = a + b
    se2 * se2 / (a * a / (n1 - lit(1)) + b * b / (n2 - lit(1)))
  }

  /** Welch t statistic from per-side (mean, var_samp, n). */
  def welchT(m1: Column, v1: Column, n1: Column, m2: Column, v2: Column, n2: Column): Column =
    (m1 - m2) / sqrt(v1 / n1 + v2 / n2)
}
