package graft

import org.apache.spark.sql.functions._

/** Operator specs for the data-ops batch (q129–q133): CDC apply
  * semantics, spatial-join boundary shapes, and the MAD composition —
  * the contracts the relational oracle exercises only on one dataset. */
class DataOpsSpec extends SparkSpec {

  // ----------------------------------------------------------------- CDC

  test("applyChangeSet: delete removes, update replaces the full row, " +
      "insert adds; untouched rows survive; column order preserved") {
    import spark.implicits._
    val snapshot = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")
    val changes = Seq(
      (2L, "delete", "x", 0.0),
      (3L, "update", "c2", 33.0),
      (4L, "insert", "d", 40.0))
      .toDF("k", "op", "tag", "v")
    val out = graft.ext.Cdc.applyChangeSet(snapshot, changes, "k", "op")
    assert(out.columns.toSeq == Seq("k", "tag", "v"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "a", 10.0), (3L, "c2", 33.0), (4L, "d", 40.0)))
  }

  test("applyChangeSet: empty changeset is identity; all-delete empties") {
    import spark.implicits._
    val snapshot = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val none = Seq.empty[(Long, String, Double)].toDF("k", "op", "v")
    assert(graft.ext.Cdc.applyChangeSet(snapshot, none, "k", "op")
      .collect().length == 2)
    val wipe = Seq((1L, "delete", 0.0), (2L, "delete", 0.0)).toDF("k", "op", "v")
    assert(graft.ext.Cdc.applyChangeSet(snapshot, wipe, "k", "op")
      .collect().isEmpty)
  }

  // ------------------------------------------------------------- spatial

  test("grid spatial join: half-open boundaries, multi-cell boxes, " +
      "overlapping boxes each count the shared point") {
    import spark.implicits._
    val cell = 30L
    // two overlapping boxes; points on edges probe the [min, max) contract
    val boxes = Seq(
      (0L, 0L, 90L, 0L, 60L),   // box 0: x in [0,90), y in [0,60)
      (1L, 60L, 150L, 0L, 60L)) // box 1: x in [60,150), y in [0,60)
      .toDF("box_id", "xi0", "xi1", "yi0", "yi1")
    val cells = boxes
      .withColumn("cx", explode(sequence(
        expr(s"xi0 div $cell"), expr(s"(xi1 + ${cell - 1}) div $cell - 1"))))
      .withColumn("cy", explode(sequence(
        expr(s"yi0 div $cell"), expr(s"(yi1 + ${cell - 1}) div $cell - 1"))))
      .select(col("box_id"), col("cx"), col("cy"),
        col("xi0").cast("double").as("xmin"), col("xi1").cast("double").as("xmax"),
        col("yi0").cast("double").as("ymin"), col("yi1").cast("double").as("ymax"))
    val points = Seq(
      (1L, 0.0, 0.0),    // box 0 lower-left corner: inside (closed min)
      (2L, 90.0, 10.0),  // x = box0 xmax: OUTSIDE box 0 (open max), inside box 1
      (3L, 75.0, 30.0),  // overlap zone: inside BOTH
      (4L, 150.0, 10.0), // x = box1 xmax: outside everything
      (5L, 10.0, 60.0))  // y = ymax: outside everything
      .toDF("pid", "x", "y")
      .withColumn("cx", floor(col("x") / cell))
      .withColumn("cy", floor(col("y") / cell))
    val got = points.join(broadcast(cells), Seq("cx", "cy"))
      .where(col("x") >= col("xmin") && col("x") < col("xmax") &&
        col("y") >= col("ymin") && col("y") < col("ymax"))
      .select("pid", "box_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 1L), (3L, 0L), (3L, 1L)))
  }

  // -------------------------------------------------------------- digest

  test("bucket digests: identical content matches, a one-row change " +
      "flips exactly its bucket, a missing row flips count and digest") {
    import spark.implicits._
    def digest(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h", conv(substring(
        md5(concat_ws(":", col("id"), col("v"))), 1, 15), 16, 10).cast("long"))
      .groupBy((col("id") % 8).as("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = (0L until 100L).map(i => (i, i * 7)).toDF("id", "v")
    assert(digest(base) == digest(base.orderBy(rand(42))),
      "digest is order-independent")
    val changed = (0L until 100L).map(i => (i, if (i == 13L) 999L else i * 7))
      .toDF("id", "v")
    val diff = digest(base).toSet.diff(digest(changed).toSet).map(_._1)
    assert(diff == Set(13L % 8), "exactly the changed row's bucket differs")
    val missing = (0L until 100L).filter(_ != 20L).map(i => (i, i * 7))
      .toDF("id", "v")
    val d0 = digest(base)(20L % 8); val d1 = digest(missing)(20L % 8)
    assert(d1._1 == d0._1 - 1 && d1._2 != d0._2)
  }

  // --------------------------------------------------------- concurrency

  test("sweep-line concurrency: hand-built overlapping intervals") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // [1,3] [2,5] [4,6] as day numbers -> open counts: d1:1 d2:2 d3:2
    // (first closes AFTER d3) ... deltas at start, -1 at end+1
    val iv = Seq((1, 3), (2, 5), (4, 6)).toDF("d0", "d1")
      .select(to_date(concat(lit("2024-01-0"), col("d0"))).as("s"),
        to_date(concat(lit("2024-01-0"), col("d1"))).as("e"))
    val deltas = iv.select(col("s").as("d"), lit(1L).as("delta"))
      .unionAll(iv.select(date_add(col("e"), 1).as("d"), lit(-1L).as("delta")))
      .groupBy("d").agg(sum("delta").as("delta"))
    val run = deltas.withColumn("open", sum(col("delta")).over(Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(run("2024-01-01") == 1L)
    assert(run("2024-01-02") == 2L) // [1,3] and [2,5] open
    assert(run("2024-01-04") == 2L) // [2,5] and [4,6] open ([1,3] closed)
    assert(run("2024-01-07") == 0L) // everything closed
  }

  // ------------------------------------------------------------ quantize

  test("int8 quantization: hand-computed levels, degenerate vector, " +
      "error bounded by one quantization step") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(0.0f, 255.0f)),        // exact endpoints: q=0,255, err=0
      (2, Seq(3.0f, 3.0f, 3.0f)),    // degenerate: q=0, err=0
      (3, Seq(0.0f, 100.0f, 255.0f)) // interior point quantizes below step
    ).toDF("label", "embedding")
    val out = graft.ext.Quantize.int8Report(df, "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1) == ((2L, 0L, 255L, 0L, 255L)))
    assert(out(2) == ((3L, 0L, 0L, 0L, 0L)))
    val (n3, err3, _, min3, max3) = out(3)
    assert(n3 == 3L && min3 == 0L && max3 == 255L)
    // max error per element < one step = 1.0 -> e2q < 1e12 per element
    assert(err3 >= 0L && err3 < 1000000000000L)
  }

  test("int8 quantization refuses NULL and empty vectors loudly (explode would silently drop them)") {
    import spark.implicits._
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val withNull = Seq((1, Some(Seq(1.0f, 2.0f))), (2, None))
      .toDF("label", "embedding")
    val e1 = intercept[Exception] {
      graft.ext.Quantize.int8Report(withNull, "embedding", "label").collect()
    }
    assert(messages(e1).exists(_.contains("int8Report")), messages(e1).toString)
    val withEmpty = Seq((1, Seq(1.0f)), (2, Seq.empty[Float]))
      .toDF("label", "embedding")
    val e2 = intercept[Exception] {
      graft.ext.Quantize.int8Report(withEmpty, "embedding", "label").collect()
    }
    assert(messages(e2).exists(_.contains("silently dropped")), messages(e2).toString)
  }

  // ----------------------------------------------------------------- MAD

  test("MAD composition: hand-computed medians and deviations") {
    import spark.implicits._
    // values 1,2,3,4,100 -> median 3 (odd n), |dev| = 2,1,0,1,97 -> MAD 1
    val df = Seq.tabulate(5)(i => ("g", Seq(1.0, 2.0, 3.0, 4.0, 100.0)(i)))
      .toDF("k", "v")
    val med = graft.stats.ExactPercentiles.percentiles(
      df, "k", "v", Seq(("median", 0.5)))
    val dev = df.join(broadcast(med), "k")
      .withColumn("adev", abs(col("v") - col("median")))
    val mad = graft.stats.ExactPercentiles.percentiles(
      dev, "k", "adev", Seq(("mad", 0.5)))
    val row = med.join(mad, "k").collect().head
    assert(row.getDouble(1) == 3.0 && row.getDouble(2) == 1.0)
  }
}
