package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WeightedPercentilesSpec extends SparkSpec {

  private val fracs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L),
    ("p90", 9L, 10L), ("p100", 1L, 1L))

  /** Naive reference: per-key cumulative-weight window (the skew-magnet
    * formulation the bucketed election replaces) — same semantics,
    * completely different plan. */
  private def naive(df: DataFrame): Map[String, Seq[Any]] = {
    val vals = df
      .filter(col("v").isNotNull && col("w").isNotNull && col("w").cast("long") > 0L)
      .select(col("k"), col("v").cast("double").as("v"), col("w").cast("long").as("w"))
    val g = vals.groupBy("k", "v").agg(sum("w").as("c"))
    val c = g
      .withColumn("cum", sum(col("c")).over(Window.partitionBy("k").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy("k")))
    val aggs = fracs.map { case (name, num, den) =>
      min(when(lit(den) * col("cum") >= lit(num) * col("tot"), col("v"))).as(name)
    }
    c.groupBy("k").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) -> fracs.indices.map(i => r.get(i + 1))).toMap
  }

  private def ours(df: DataFrame, buckets: Int = 256): Map[String, Seq[Any]] =
    WeightedPercentiles.lowerBound(df, "k", "v", "w", fracs, buckets)
      .collect().map(r => r.getString(0) -> fracs.indices.map(i => r.get(i + 1))).toMap

  test("matches the naive window formulation on random weighted groups") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 300 + rnd.nextInt(500)).map { _ =>
        (s"g${rnd.nextInt(5)}", (rnd.nextInt(300) - 150) / 4.0, 1L + rnd.nextInt(20))
      }
      val df = rows.toDF("k", "v", "w").repartition(1 + rnd.nextInt(8))
      assert(ours(df) == naive(df), s"seed=$seed")
    }
  }

  test("hand-computed election: r* = ceil(num*W/den) lands on the right value") {
    import spark.implicits._
    // values 10,20,30 with weights 1,2,3 -> W=6, cum = 1,3,6
    // p25: r*=ceil(6/4)=2 -> 20; p50: r*=3 -> 20; p90: r*=ceil(5.4)=6 -> 30
    val df = Seq(("a", 10.0, 1L), ("a", 20.0, 2L), ("a", 30.0, 3L)).toDF("k", "v", "w")
    assert(ours(df)("a") == Seq(20.0, 20.0, 30.0, 30.0))
  }

  test("all-weight-one reduces to the unweighted lower-bound rank") {
    import spark.implicits._
    // 4 rows, p50: r* = 2 -> second-smallest value
    val df = Seq(("a", 4.0, 1L), ("a", 1.0, 1L), ("a", 3.0, 1L), ("a", 2.0, 1L))
      .toDF("k", "v", "w")
    assert(ours(df)("a") == Seq(1.0, 2.0, 4.0, 4.0))
  }

  test("NULL/zero/negative weights and NULL values are excluded; " +
      "fully-excluded keys are absent") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(2L)), ("a", Some(5.0), Some(0L)),
      ("a", Some(9.0), Some(-3L)), ("a", None, Some(4L)),
      ("a", Some(2.0), None),
      ("gone", Some(7.0), Some(0L)), ("gone", None, Some(1L)))
      .toDF("k", "v", "w")
    val out = ours(df)
    assert(out.keySet == Set("a"), "key with no qualifying rows is absent")
    // only (1.0, w=2) qualifies -> every fraction elects 1.0
    assert(out("a") == Seq(1.0, 1.0, 1.0, 1.0))
  }

  test("bucket count never changes the result (1, 2, 7, 256)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val df = (1 to 400).map(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(100) / 3.0, 1L + rnd.nextInt(9)))
      .toDF("k", "v", "w")
    val ref = ours(df, buckets = 256)
    for (b <- Seq(1, 2, 7)) assert(ours(df, b) == ref, s"buckets=$b")
  }

  test("result is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (s"g${i % 3}", i * 1.5, (i % 7 + 1).toLong))
    val one = ours(rows.toDF("k", "v", "w").repartition(1))
    val many = ours(rows.toDF("k", "v", "w").repartition(17))
    assert(one == many)
  }

  test("invalid fractions and empty fraction lists are rejected") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L)).toDF("k", "v", "w")
    intercept[IllegalArgumentException] {
      WeightedPercentiles.lowerBound(df, "k", "v", "w", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      WeightedPercentiles.lowerBound(df, "k", "v", "w", Seq(("bad", 0L, 4L)))
    }
    intercept[IllegalArgumentException] {
      WeightedPercentiles.lowerBound(df, "k", "v", "w", Seq(("bad", 5L, 4L)))
    }
  }
}
