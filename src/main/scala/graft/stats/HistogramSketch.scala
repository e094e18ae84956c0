package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-width histogram quantile sketch — the APPROXIMATE percentile
  * path next to [[ExactPercentiles]]' exact one.
  *
  * Two scans, both trivially combinable:
  *   1. `min/max/count` (map-side combine to one row per partition);
  *   2. `groupBy(bin)` over `bins` fixed-width buckets (map-side
  *      combine to <= bins rows per partition, one tiny shuffle).
  * The cumulative walk and the interpolation run over <= `bins` rows —
  * constant work regardless of input size. Error is bounded by one bin
  * width `(max-min)/bins`; [[ExactPercentiles]] pays a value-bucketed
  * rank election per query instead. At 100 TB this is the profiling
  * pass you run first (and the histograms are elementwise-ADD mergeable
  * across partitions/snapshots once the bounds are fixed), with the
  * exact path reserved for the fractions that matter.
  *
  * Determinism: every float step (`width = (max-min)/bins`, bin
  * assignment, `target = fraction*n`, the interpolation) is a fixed
  * IEEE expression tree mirrored verbatim by the SQL oracle
  * ([[graft.ScaleOpsQueries]] q104), so the estimates compare UNROUNDED
  * cross-engine. min/max/count over doubles are exact selections, not
  * accumulations — no float-order hazard anywhere.
  */
object HistogramSketch {

  /** Histogram frame: `bin (0..bins-1), cnt`, plus the bound columns
    * `mn, mx, n` replicated (broadcast scalar join). Missing bins are
    * simply absent. */
  def histogram(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins > 1, s"bins must be > 1: $bins")
    val bounds = df.agg(
      min(value).cast("double").as("mn"),
      max(value).cast("double").as("mx"),
      count(value).as("n"))
    val w = (col("mx") - col("mn")) / lit(bins.toDouble)
    df.crossJoin(broadcast(bounds))
      .groupBy(
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(floor((value.cast("double") - col("mn")) / w), lit(bins - 1)))
          .cast("int").as("bin"),
        col("mn"), col("mx"), col("n"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Interpolated quantile estimates at `fractions` (each in (0, 1]):
    * `fraction, est`. `est = mn + w*(bin + (fraction*n - cumBefore)/
    * cnt)` for the first bin whose cumulative count reaches
    * `fraction*n`. */
  def quantiles(df: DataFrame, value: Column, bins: Int,
      fractions: Seq[Double]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f > 0 && f <= 1),
      s"fractions must lie in (0, 1]: $fractions")
    val hist = histogram(df, value, bins)
    // <= bins rows: a single-partition cumulative window is fine —
    // and is the point of sketching (the heavy data never sorts).
    val cum = hist
      .withColumn("cum", sum("cnt").over(Window.orderBy("bin")))
      .withColumn("cumb", col("cum") - col("cnt"))
    val fr = fractions.foldLeft(Option.empty[DataFrame]) { (acc, f) =>
      val row = cum.sparkSession.range(1).select(lit(f).as("fraction"))
      Some(acc.fold(row)(_.unionAll(row)))
    }.get
    val target = col("fraction") * col("n")
    val w = (col("mx") - col("mn")) / lit(bins.toDouble)
    fr.crossJoin(cum)
      .where(col("cum") >= target && col("cumb") < target)
      .select(
        col("fraction"),
        when(col("mx") === col("mn"), col("mn"))
          .otherwise(col("mn") + w *
            (col("bin") + (target - col("cumb")) / col("cnt")))
          .as("est"))
      .orderBy("fraction")
  }
}
