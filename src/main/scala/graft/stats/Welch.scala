package graft.stats

import org.apache.commons.math3.distribution.TDistribution
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input sample: a value tagged with which side of the campaign window it
  * falls on (after = true ⇒ the [start, start+post] window). */
final case class WelchIn(value: Double, after: Boolean)

/** Mergeable moment buffer: (n, mean, M2) per side — Chan et al.'s
  * parallel variance formulation, so any partitioning of the input
  * merges to the same result (required: Spark combines partial
  * aggregates in arbitrary order). */
final case class WelchBuf(
    nB: Long, meanB: Double, m2B: Double,
    nA: Long, meanA: Double, m2A: Double)

/** Full Welch result; fields null (boxed None→null) when a side has n<2,
  * mirroring the reference's guard that skips the t-test unless both
  * windows have >1 point (`/root/reference/etl_pipeline.py:136-139`). */
final case class WelchOut(
    n_before: Long, n_after: Long,
    mean_before: Option[Double], mean_after: Option[Double],
    var_before: Option[Double], var_after: Option[Double],
    t_stat: Option[Double], welch_df: Option[Double], p_value: Option[Double])

/** Welch two-sample t-test (unequal variance) as a typed Spark
  * `Aggregator` — the one genuinely custom aggregate the reference
  * surface needs (`scipy.stats.ttest_ind(..., equal_var=False)`,
  * `/root/reference/etl_pipeline.py:137`). Partial-mergeable, so it
  * runs as a normal two-phase (partial + final) hash aggregate with
  * map-side combine: at 100 TB each executor reduces its partitions to
  * one 48-byte buffer per group before the shuffle.
  */
object WelchTTest extends Aggregator[WelchIn, WelchBuf, WelchOut] {

  override def zero: WelchBuf = WelchBuf(0L, 0.0, 0.0, 0L, 0.0, 0.0)

  private def step(n: Long, mean: Double, m2: Double, x: Double): (Long, Double, Double) = {
    val n1 = n + 1
    val d = x - mean
    val mean1 = mean + d / n1
    (n1, mean1, m2 + d * (x - mean1))
  }

  override def reduce(b: WelchBuf, in: WelchIn): WelchBuf =
    if (in.after) {
      val (n, m, m2) = step(b.nA, b.meanA, b.m2A, in.value)
      b.copy(nA = n, meanA = m, m2A = m2)
    } else {
      val (n, m, m2) = step(b.nB, b.meanB, b.m2B, in.value)
      b.copy(nB = n, meanB = m, m2B = m2)
    }

  private def mergeSide(n1: Long, mean1: Double, m21: Double,
                        n2: Long, mean2: Double, m22: Double): (Long, Double, Double) = {
    if (n1 == 0) (n2, mean2, m22)
    else if (n2 == 0) (n1, mean1, m21)
    else {
      val n = n1 + n2
      val d = mean2 - mean1
      // Chan's update: numerically stable for n1 ≈ n2 and n1 >> n2 alike.
      val mean = mean1 + d * n2 / n
      val m2 = m21 + m22 + d * d * n1.toDouble * n2.toDouble / n
      (n, mean, m2)
    }
  }

  override def merge(x: WelchBuf, y: WelchBuf): WelchBuf = {
    val (nb, mb, m2b) = mergeSide(x.nB, x.meanB, x.m2B, y.nB, y.meanB, y.m2B)
    val (na, ma, m2a) = mergeSide(x.nA, x.meanA, x.m2A, y.nA, y.meanA, y.m2A)
    WelchBuf(nb, mb, m2b, na, ma, m2a)
  }

  override def finish(b: WelchBuf): WelchOut = {
    val meanB = if (b.nB > 0) Some(b.meanB) else None
    val meanA = if (b.nA > 0) Some(b.meanA) else None
    val varB = if (b.nB > 1) Some(b.m2B / (b.nB - 1)) else None
    val varA = if (b.nA > 1) Some(b.m2A / (b.nA - 1)) else None
    // Reference guard: test requires n>1 on BOTH sides (etl_pipeline.py:136).
    val test = for { vb <- varB; va <- varA } yield {
      val sb = vb / b.nB
      val sa = va / b.nA
      val se2 = sb + sa
      val t = (b.meanB - b.meanA) / math.sqrt(se2)
      val df = se2 * se2 / (sb * sb / (b.nB - 1) + sa * sa / (b.nA - 1))
      val p = 2.0 * (1.0 - new TDistribution(df).cumulativeProbability(math.abs(t)))
      (t, df, p)
    }
    WelchOut(b.nB, b.nA, meanB, meanA, varB, varA,
      test.map(_._1), test.map(_._2), test.map(_._3))
  }

  override def bufferEncoder: Encoder[WelchBuf] = Encoders.product[WelchBuf]
  override def outputEncoder: Encoder[WelchOut] = Encoders.product[WelchOut]
}
