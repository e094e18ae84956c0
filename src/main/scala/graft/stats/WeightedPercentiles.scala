package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key WEIGHTED lower-bound percentiles as a distributed
  * rank election — [[ExactPercentiles]]' bucketed recipe generalized
  * from row counts to integer weights.
  *
  * Semantics (lower-bound / "type 1", no interpolation): for a key
  * with total weight W and a fraction p = num/den, the answer is the
  * smallest value v whose cumulative weight (over values ≤ v, in
  * value order) reaches the target rank r* = ⌈num·W/den⌉. Because
  * weights and cumulative sums are integers and the fraction rides as
  * an exact rational, EVERY comparison is integer arithmetic — the
  * result is bitwise reproducible across engines with no
  * interpolation-float bridge at all (the reason this utility exists
  * next to [[ExactPercentiles]], whose interpolated form is the
  * built-in `percentile`'s contract).
  *
  * Scale shape — identical to [[ExactPercentiles]] (see its scaladoc
  * for the full argument): a #keys stats broadcast assigns each row a
  * monotone value-range bucket, ONE explicit-width shuffle on
  * (key, bucket) feeds the per-distinct-value weight sums and the
  * within-bucket cumulative window exchange-free, cross-bucket
  * offsets prefix-sum over a ≤ #keys·buckets frame, and the rank
  * probe is one conditional aggregate. No task ever sorts a whole
  * key; every sort is a within-(key, bucket) spill-safe window.
  *
  * Row contract: rows with a NULL value, or a NULL/non-positive
  * weight, are excluded up front (a zero weight cannot move a
  * cumulative rank and a negative one would make it non-monotone; the
  * NULL-key/NULL-metric exclusion precedent is relativeRankGate /
  * budgetSelect). A key whose rows are all excluded is absent from
  * the output. Overflow: num·W must stay below 2^63 — fine for any
  * realistic (fraction, corpus) pair, documented rather than checked
  * row-wise. Non-integral weights TRUNCATE (Spark long cast); an
  * oracle mirroring this utility must truncate too (DuckDB's bare
  * BIGINT cast rounds — q126's mirror casts through trunc()).
  */
object WeightedPercentiles {

  /** One output row per key, one column per requested
    * `(name, num, den)` fraction (0 < num ≤ den). `weightCol` is cast
    * to long; `buckets` bounds every sort task (result identical for
    * any value ≥ 1). */
  def lowerBound(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      weightCol: String,
      ps: Seq[(String, Long, Long)],
      buckets: Int = 256): DataFrame = {
    require(ps.nonEmpty, "at least one (name, num, den) required")
    require(ps.forall { case (_, n, d) => n > 0 && d > 0 && n <= d },
      s"fractions must satisfy 0 < num <= den: ${ps.mkString(", ")}")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val vals = df
      .filter(col(valCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol).cast("long") > 0L)
      .select(col(keyCol).as("_pk"), col(valCol).cast("double").as("_pv"),
        col(weightCol).cast("long").as("_pw"))
    // #keys stats: NaN-free value range for bucketing + total weight W
    val stats = vals.groupBy(col("_pk").as("_spk")).agg(
      min(when(!isnan(col("_pv")), col("_pv"))).as("_vmin"),
      max(when(!isnan(col("_pv")), col("_pv"))).as("_vmax"),
      sum(col("_pw")).as("_w"))
    val span = col("_vmax") - col("_vmin")
    val bkt =
      when(isnan(col("_pv")), lit((buckets - 1).toLong))
        .when(!(span > 0.0) || span === Double.PositiveInfinity, lit(0L))
        .otherwise(least(greatest(
          floor((col("_pv") - col("_vmin")) / span * buckets), lit(0L)),
          lit((buckets - 1).toLong)))
    val bucketed = vals.join(broadcast(stats), col("_pk") <=> col("_spk"))
      .withColumn("_bkt", bkt)
      .select(col("_pk"), col("_pv"), col("_pw"), col("_bkt"), col("_w"))
    // explicit width: a bare repartition(cols) is an AQE coalesce target
    val shufflePartitions = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = bucketed.repartition(shufflePartitions, col("_pk"), col("_bkt"))
    val counts = parted.groupBy("_pk", "_bkt", "_pv")
      .agg(sum(col("_pw")).as("_c"), first(col("_w")).as("_w"))
    // cross-bucket weight offsets, branched off the scan (parallel to
    // the raw shuffle — the ExactPercentiles critical-path argument)
    val offsets = bucketed.groupBy("_pk", "_bkt")
      .agg(sum(col("_pw")).as("_bt"))
      .withColumn("_off", coalesce(
        sum(col("_bt")).over(Window.partitionBy("_pk").orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pk").as("_opk"), col("_bkt").as("_obkt"), col("_off"))
    val wIn = Window.partitionBy("_pk", "_bkt").orderBy("_pv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = counts
      .join(broadcast(offsets),
        col("_pk") <=> col("_opk") && col("_bkt") === col("_obkt"))
      .withColumn("_hi", col("_off") + sum(col("_c")).over(wIn))
      .withColumn("_lo", col("_hi") - col("_c") + 1)
    // rank probe: r* = ceil(num·W/den) in pure integer arithmetic
    // ((num·W + den − 1) div den — all operands positive; `div` is the
    // INTEGRAL divide, `/` would detour through doubles and lose
    // exactness past 2^53); exactly one distinct value's weighted span
    // [lo, hi] contains r*
    val probed = ps.zipWithIndex.foldLeft(spans) { case (d, ((_, num, den), i)) =>
      d.withColumn(s"_r$i", expr(s"(${num}L * _w + ${den - 1}L) div ${den}L"))
    }
    val aggs = ps.zipWithIndex.map { case (_, i) =>
      max(when(col(s"_r$i").between(col("_lo"), col("_hi")), col("_pv")))
        .as(s"_v$i")
    }
    val agged = probed.groupBy(col("_pk")).agg(aggs.head, aggs.tail: _*)
    val outCols = col("_pk").as(keyCol) +: ps.zipWithIndex.map {
      case ((name, _, _), i) => col(s"_v$i").as(name)
    }
    agged.select(outCols: _*)
  }
}
