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
