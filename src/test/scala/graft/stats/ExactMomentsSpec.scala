package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExactMoments is the load-bearing cross-engine math: these specs pin
  * (1) semantic agreement with naive two-pass moments of the QUANTIZED
  * values, and (2) bitwise partition invariance — the property plain
  * var_samp does not have. */
class ExactMomentsSpec extends SparkSpec {
  import spark.implicits._

  private def naiveVar(xs: Seq[Double]): Double = {
    val q = xs.map(x => math.floor(x * 1e6) / 1e6)
    val m = q.sum / q.size
    q.map(v => (v - m) * (v - m)).sum / (q.size - 1)
  }

  test("exactVar/exactCovar/exactCorr agree with two-pass quantized moments") {
    val rng = new scala.util.Random(11)
    val xs = Seq.fill(500)(rng.nextDouble() * 2000 - 1000)
    val ys = xs.map(x => 3.5 * x + rng.nextDouble() * 100)
    val df = xs.zip(ys).toDF("x", "y")
    val row = df.agg(
      ExactMoments.exactVar(col("x")).as("v"),
      ExactMoments.exactCovar(col("x"), col("y")).as("c"),
      ExactMoments.exactCorr(col("x"), col("y")).as("r"),
      ExactMoments.exactSlope(col("y"), col("x")).as("s")).head()
    assert(math.abs(row.getDouble(0) - naiveVar(xs)) / naiveVar(xs) < 1e-12)
    val qx = xs.map(x => math.floor(x * 1e6) / 1e6)
    val qy = ys.map(y => math.floor(y * 1e6) / 1e6)
    val (mx, my) = (qx.sum / qx.size, qy.sum / qy.size)
    val cov = qx.zip(qy).map { case (a, b) => (a - mx) * (b - my) }.sum / (qx.size - 1)
    assert(math.abs(row.getDouble(1) - cov) / math.abs(cov) < 1e-10)
    val corr = cov / math.sqrt(naiveVar(xs) * naiveVar(ys))
    assert(math.abs(row.getDouble(2) - corr) < 1e-10)
    assert(math.abs(row.getDouble(3) - cov / naiveVar(xs)) < 1e-10)
  }

  test("exact moments are BITWISE partition-invariant (var_samp is not even stable)") {
    val rng = new scala.util.Random(7)
    val xs = Seq.fill(2000)(rng.nextDouble() * 1e6)
    def run(parts: Int): (Double, Double) = {
      val df = xs.toDF("x").repartition(parts)
      val r = df.agg(
        ExactMoments.exactVar(col("x")).as("v"),
        ExactMoments.exactStddev(col("x")).as("s")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (v1, s1) = run(1)
    val (v32, s32) = run(32)
    assert(v1 == v32, "exactVar must not depend on partitioning — bitwise")
    assert(s1 == s32)
  }

  test("NULL guards: n<2 and all-NULL inputs yield NULL, not NaN/throw") {
    val df = Seq(Some(1.0), None, None).toDF("x")
    val r = df.agg(
      ExactMoments.exactVar(col("x")).as("v"),
      ExactMoments.exactCorr(col("x"), col("x")).as("c")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    val empty = Seq.empty[Option[Double]].toDF("x")
    assert(empty.agg(ExactMoments.exactVar(col("x"))).head().isNullAt(0))
  }

  test("zero-variance input: corr NULL (guard), var exactly 0") {
    val df = Seq.fill(10)((5.0, 7.0)).toDF("x", "y")
    val r = df.agg(
      ExactMoments.exactVar(col("x")).as("v"),
      ExactMoments.exactCorr(col("x"), col("y")).as("c")).head()
    assert(r.getDouble(0) == 0.0)
    assert(r.isNullAt(1), "corr undefined at zero variance must be NULL")
  }
}
