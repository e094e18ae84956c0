package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactPercentilesSpec extends SparkSpec {

  private val fracs = Seq("p0" -> 0.0, "p37" -> 0.37, "p50" -> 0.5,
    "p99" -> 0.99, "p100" -> 1.0)

  /** Compare against Spark's built-in exact percentile, bitwise. */
  private def assertMatchesBuiltin(rows: Seq[(String, java.lang.Double)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("k", "v")
    val ours = ExactPercentiles.percentiles(df, "k", "v", fracs)
      .collect().map(r => r.getString(0) -> fracs.indices.map(i => r.get(i + 1))).toMap
    val builtin = df.groupBy("k")
      .agg(expr("percentile(v, 0.0)"), expr("percentile(v, 0.37)"),
        expr("percentile(v, 0.5)"), expr("percentile(v, 0.99)"),
        expr("percentile(v, 1.0)"))
      .collect().map(r => r.getString(0) -> fracs.indices.map(i => r.get(i + 1))).toMap
    assert(ours.keySet == builtin.keySet.filter(k => builtin(k).exists(_ != null)),
      "keys with non-null values must match")
    for (k <- ours.keySet; i <- fracs.indices)
      assert(ours(k)(i) == builtin(k)(i),
        s"key $k ${fracs(i)._1}: ours=${ours(k)(i)} builtin=${builtin(k)(i)}")
  }

  test("matches the built-in percentile bitwise on mixed groups") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      (s"g${i % 7}", java.lang.Double.valueOf((rnd.nextInt(10000) / 100.0)))
    }
    assertMatchesBuiltin(rows)
  }

  test("edge shapes: single-row group, two-row group, ties, nulls") {
    assertMatchesBuiltin(Seq(
      ("solo", java.lang.Double.valueOf(5.0)),
      ("pair", java.lang.Double.valueOf(1.0)),
      ("pair", java.lang.Double.valueOf(2.0)),
      ("ties", java.lang.Double.valueOf(3.0)),
      ("ties", java.lang.Double.valueOf(3.0)),
      ("ties", java.lang.Double.valueOf(3.0)),
      ("ties", java.lang.Double.valueOf(4.0)),
      ("withnull", java.lang.Double.valueOf(9.0)),
      ("withnull", null),
      ("withnull", java.lang.Double.valueOf(11.0))))
  }

  test("a NULL key is a real group (GROUP BY semantics, like the built-in)") {
    import spark.implicits._
    val df = Seq((Option("a"), 1.0), (Option("a"), 3.0),
      (Option.empty[String], 10.0), (Option.empty[String], 20.0))
      .toDF("k", "v")
    val ours = ExactPercentiles.percentiles(df, "k", "v", Seq("p50" -> 0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(ours == Map(Option("a") -> 2.0, None -> 15.0))
  }

  test("signed zeros merge under SQL equality (documented divergence)") {
    import spark.implicits._
    val df = Seq(("z", -0.0), ("z", 0.0)).toDF("k", "v")
    val out = ExactPercentiles.percentiles(df, "k", "v", Seq("p0" -> 0.0))
      .collect()
    assert(out.length == 1 &&
      java.lang.Double.doubleToRawLongBits(out(0).getDouble(1)) == 0L,
      "both zeros collapse to +0.0")
  }

  test("keys whose values are all NULL are absent") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("b", None), ("b", None))
      .toDF("k", "v")
    val out = ExactPercentiles.percentiles(df, "k", "v", Seq("p50" -> 0.5))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("bucket count never changes the result (1, 2, 7, 256)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 400).map(i => (s"g${i % 5}", rnd.nextDouble() * 1000 - 500))
      .toDF("k", "v")
    val ref = ExactPercentiles.percentiles(df, "k", "v", fracs, buckets = 256)
      .orderBy("k").collect().toSeq
    for (b <- Seq(1, 2, 7)) {
      val got = ExactPercentiles.percentiles(df, "k", "v", fracs, buckets = b)
        .orderBy("k").collect().toSeq
      assert(got == ref, s"buckets=$b diverged from buckets=256")
    }
  }

  test("non-finite values: NaN sorts last, ±Inf clamp into end buckets") {
    import spark.implicits._
    // NaN routes to the top bucket and interpolates like the built-in's
    // sort order (NaN after every number); ±Inf endpoints degrade the
    // span to a single bucket without poisoning the quantizer.
    val df = Seq(
      ("nan", 1.0), ("nan", 2.0), ("nan", Double.NaN),
      ("inf", Double.NegativeInfinity), ("inf", 0.0), ("inf", 5.0),
      ("inf", Double.PositiveInfinity)).toDF("k", "v")
    val ours = ExactPercentiles.percentiles(df, "k", "v",
      Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .collect().map(r => r.getString(0) -> (1 to 3).map(r.get)).toMap
    val builtin = df.groupBy("k")
      .agg(expr("percentile(v, 0.0)"), expr("percentile(v, 0.5)"),
        expr("percentile(v, 1.0)"))
      .collect().map(r => r.getString(0) -> (1 to 3).map(r.get)).toMap
    for (k <- builtin.keySet)
      assert(ours(k).toString == builtin(k).toString,
        s"key $k: ours=${ours(k)} builtin=${builtin(k)}")
  }

  test("property: random data, fractions, duplicates and partitionings " +
      "all match the built-in bitwise") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(6)
      // heavy duplication (quantized values) exercises multi-row rank
      // spans; a scattering of negatives exercises bucket-edge math
      val rows = (0 until 300 + rnd.nextInt(700)).map { _ =>
        (s"k${rnd.nextInt(nKeys)}",
          java.lang.Double.valueOf((rnd.nextInt(400) - 200) / 8.0))
      }
      val fr = (0 until 1 + rnd.nextInt(4)).map(i => s"p$i" -> rnd.nextDouble()) :+
        ("pEdge" -> (if (rnd.nextBoolean()) 0.0 else 1.0))
      val df = rows.toDF("k", "v").repartition(1 + rnd.nextInt(16))
      val ours = ExactPercentiles.percentiles(df, "k", "v", fr,
          buckets = 1 + rnd.nextInt(300))
        .collect().map(r => r.getString(0) -> fr.indices.map(i => r.get(i + 1))).toMap
      val builtin = df.groupBy("k")
        .agg(expr(s"percentile(v, ${fr.head._2})"),
          fr.tail.map { case (_, p) => expr(s"percentile(v, $p)") }: _*)
        .collect().map(r => r.getString(0) -> fr.indices.map(i => r.get(i + 1))).toMap
      assert(ours.keySet == builtin.keySet, s"seed=$seed keys")
      for (k <- ours.keySet; i <- fr.indices)
        assert(ours(k)(i) == builtin(k)(i),
          s"seed=$seed key=$k ${fr(i)._1}=${fr(i)._2}: ours=${ours(k)(i)} builtin=${builtin(k)(i)}")
    }
  }

  test("result is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (s"g${i % 3}", i * 1.5))
    val one = ExactPercentiles.percentiles(
      rows.toDF("k", "v").repartition(1), "k", "v", fracs)
      .orderBy("k").collect().toSeq
    val many = ExactPercentiles.percentiles(
      rows.toDF("k", "v").repartition(17), "k", "v", fracs)
      .orderBy("k").collect().toSeq
    assert(one == many)
  }
}
