package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistogramSketchSpec extends SparkSpec {
  import spark.implicits._

  private val fractions = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  test("estimates land within one bin width of the exact percentile") {
    val rnd = new scala.util.Random(7)
    // lognormal-ish skew — the shape where equi-width bins are weakest
    val values = Seq.fill(20000)(math.exp(rnd.nextGaussian()) * 100.0)
    val df = values.toDF("v").repartition(8)
    val bins = 256
    val sorted = values.sorted
    val width = (sorted.last - sorted.head) / bins
    val est = HistogramSketch.quantiles(df, col("v"), bins, fractions)
      .as[(Double, Double)].collect().toMap
    for (f <- fractions) {
      // exact percentile under the same convention: smallest v with
      // rank >= f*n
      val exact = sorted(math.ceil(f * values.size).toInt - 1)
      assert(math.abs(est(f) - exact) <= width + 1e-9,
        s"f=$f est=${est(f)} exact=$exact width=$width")
    }
  }

  test("histogram bin counts cover every row exactly once") {
    val df = (1 to 5000).map(_.toDouble).toDF("v")
    val hist = HistogramSketch.histogram(df, col("v"), 64)
    assert(hist.agg(sum("cnt")).as[Long].head() == 5000L)
    assert(hist.select("bin").as[Int].collect().forall(b => b >= 0 && b < 64))
  }

  test("constant column degenerates to the constant, not NaN") {
    val df = Seq.fill(100)(42.5).toDF("v")
    val est = HistogramSketch.quantiles(df, col("v"), 16, Seq(0.5, 1.0))
      .as[(Double, Double)].collect().toMap
    assert(est(0.5) == 42.5 && est(1.0) == 42.5)
  }

  test("fraction 1.0 matches the maximum's bin (never out of range)") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val est = HistogramSketch.quantiles(df, col("v"), 32, Seq(1.0))
      .as[(Double, Double)].head()._2
    assert(est >= 1000.0 - 1000.0 / 32 && est <= 1000.0 + 1e-9)
  }

  test("histograms with shared bounds merge by elementwise add") {
    val all = (1 to 8000).map(i => (i % 2, (i % 977).toDouble)).toDF("half", "v")
    // fix bounds over the WHOLE corpus, then histogram each half with
    // those bounds by reusing histogram() on the full frame vs the sum
    // of per-half counts computed against full-corpus min/max.
    val whole = HistogramSketch.histogram(all, col("v"), 32)
      .select("bin", "cnt").as[(Int, Long)].collect().toMap
    val halves = HistogramSketch.histogram(all.filter(col("half") === 0), col("v"), 32)
      .select("bin", "cnt").as[(Int, Long)].collect().toMap
    val other = HistogramSketch.histogram(all.filter(col("half") === 1), col("v"), 32)
      .select("bin", "cnt").as[(Int, Long)].collect().toMap
    // both halves span the same min/max (0..976 appears in each), so
    // the bounds — and hence the bins — coincide and counts add
    val merged = (halves.keySet ++ other.keySet).map(b =>
      b -> (halves.getOrElse(b, 0L) + other.getOrElse(b, 0L))).toMap
    assert(merged == whole)
  }
}
