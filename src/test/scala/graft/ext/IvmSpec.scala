package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IvmSpec extends SparkSpec {

  private def inDir[T](f: String => T): T = graft.QueryUtil.inTempDir("graft_ivm")(f)

  private def viewRows(df: DataFrame): Map[Long, (Long, Long, Option[Long], Option[Long])] =
    df.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    }.toMap

  private def direct(dir: String, v: Long): DataFrame =
    Ivm.baseline(spark, dir, v, "pbucket", "value")

  test("a delete of the current per-key max maintains exactly; untouched keys never recompute") {
    inDir { dir =>
      import spark.implicits._
      // bucket = id % 4; bucket 1 holds ids 1 (max value 90), 5 (10),
      // 9 (20); bucket 0 holds 0 (1), 4 (2), 8 (3)...
      val base = Seq(
        (0L, 1.0, 0L), (4L, 2.0, 0L), (8L, 3.0, 0L),
        (1L, 90.0, 1L), (5L, 10.0, 1L), (9L, 20.0, 1L),
        (2L, 7.0, 2L), (6L, 70.0, 2L),
        (3L, 5.0, 3L)
      ).toDF("event_id", "value", "pbucket")
      TxTable.commitReplace(spark, dir, base, Some("pbucket"))
      // v2: delete bucket 1's MAX (id 1, value 90) — the delta-
      // inexpressible case: the new max (20 at id 9) lives in rows the
      // feed never mentions
      TxTable.deleteWhere(spark, dir, col("event_id") === 1L, Some("pbucket"))
      val v1View = Ivm.baseline(spark, dir, 1L, "pbucket", "value")
      val maintained = Ivm.maintainStep(
        spark, dir, v1View, 2L, "event_id", "pbucket", "value")
      // maintained == direct recompute of v2, min/max included
      assert(viewRows(maintained) === viewRows(direct(dir, 2L)))
      // and the max actually CHANGED to the second-highest
      assert(viewRows(maintained)(1L)._4 === Some(20000000L))
      assert(viewRows(v1View)(1L)._4 === Some(90000000L))
      // the min is untouched by a max-delete (recompute agrees)
      assert(viewRows(maintained)(1L)._3 === Some(10000000L))
      // untouched buckets carry their maintained values verbatim
      Seq(0L, 2L, 3L).foreach { k =>
        assert(viewRows(maintained)(k) === viewRows(v1View)(k))
      }
      // the fallback recompute slice is manifest-pruned to the touched
      // partition only — the q150 property applied to IVM: the feed
      // touched bucket 1, so the recompute reads pbucket=1 files, none
      // of the other three partitions'
      val recomputeSlice = TxTable.readPruned(spark, dir, Set("1"), Some(2L))
      val files = recomputeSlice.inputFiles.toSeq
      assert(files.nonEmpty && files.forall(_.contains("pbucket=1")),
        s"recompute must stay inside the touched partition: $files")
    }
  }

  test("a downward update of the max and an emptied bucket both maintain exactly") {
    inDir { dir =>
      import spark.implicits._
      val base = Seq(
        (0L, 4.0, 0L), (4L, 8.0, 0L),
        (1L, 90.0, 1L), (5L, 10.0, 1L),
        (2L, 7.0, 2L)
      ).toDF("event_id", "value", "pbucket")
      TxTable.commitReplace(spark, dir, base, Some("pbucket"))
      // v2: drop bucket 0's max BELOW the runner-up (8 -> 1): max must
      // become 4.0, which only a recompute can discover
      TxTable.updateWhere(spark, dir, col("event_id") === 4L,
        Seq("value" -> lit(1.0)), Some("pbucket"))
      // v3: empty bucket 2 entirely — its view row must vanish
      TxTable.deleteWhere(spark, dir, col("event_id") === 2L, Some("pbucket"))
      var view = Ivm.baseline(spark, dir, 1L, "pbucket", "value")
      (2L to 3L).foreach { v =>
        view = Ivm.maintainStep(spark, dir, view, v, "event_id", "pbucket", "value")
      }
      assert(viewRows(view) === viewRows(direct(dir, 3L)))
      // the downward update moved BOTH ends: min 4→1, max 8→4
      assert(viewRows(view)(0L) === ((2L, 5000000L, Some(1000000L), Some(4000000L))))
      assert(!viewRows(view).contains(2L), "emptied bucket must leave the view")
    }
  }
}
