package graft.streaming

import graft.SparkSpec
import graft.ext.TxTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ChangeFeedStreamSpec extends SparkSpec {

  private def inDir[T](f: String => T): T = graft.QueryUtil.inTempDir("graft_cfs")(f)

  test("catch-up on 10 versions batches manifests: ≤ 3 triggers, identical net result") {
    inDir { tmp =>
      import spark.implicits._
      val table = s"$tmp/table"
      val snap = (0L until 16L).map(i => (i, i * 1.0, i % 4))
        .toDF("event_id", "value", "pbucket")
      TxTable.commitReplace(spark, table, snap, Some("pbucket"))
      // 10 more versions (2..11), each a single-key change
      (1 to 10).foreach { i =>
        TxTable.mergeChangeSet(spark, table,
          Seq((100L + i, "insert", i * 10.0, (i % 4).toLong))
            .toDF("event_id", "op", "value", "pbucket"),
          "event_id", "op", "pbucket")
      }
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val (delivered, batches) = ChangeFeedStream.followAvailableCounted(
        spark, table, "event_id", s"$tmp/ckpt",
        maxVersionsPerTrigger = 4) { (v, changes) =>
        changes.select("event_id").collect().foreach(r => seen += ((v, r.getLong(0))))
      }
      assert(delivered === 10L)
      assert(batches <= 3L, s"10-version catch-up must take ≤ 3 triggers, took $batches")
      // in-order, once each, with the right per-version content
      assert(seen.map(_._1).toSeq === (2L to 11L).toSeq, "ascending version order")
      assert(seen.toSeq === (1 to 10).map(i => ((i + 1).toLong, 100L + i)))
      // exactly-once across restarts, batched or not
      assert(ChangeFeedStream.followAvailable(
        spark, table, "event_id", s"$tmp/ckpt") { (_, _) => fail("re-delivery") } === 0L)
    }
  }

  test("checkpoint files in the log dir are invisible to the feed (no duplicate versions)") {
    inDir { tmp =>
      import spark.implicits._
      val prevInterval = TxTable.checkpointInterval
      TxTable.checkpointInterval = 2 // checkpoints at v1 (full), v2, v4
      try {
        val table = s"$tmp/table"
        val snap = (0L until 8L).map(i => (i, i * 1.0, i % 2))
          .toDF("event_id", "value", "pbucket")
        TxTable.commitReplace(spark, table, snap, Some("pbucket"))
        (1 to 3).foreach { i =>
          TxTable.mergeChangeSet(spark, table,
            Seq((200L + i, "insert", 1.0, (i % 2).toLong))
              .toDF("event_id", "op", "value", "pbucket"),
            "event_id", "op", "pbucket")
        }
        val logFiles = new java.io.File(s"$table/_graft_log").listFiles().map(_.getName)
        assert(logFiles.count(_.startsWith("_ckpt-")) >= 2, s"setup needs checkpoints: ${logFiles.toSeq}")
        val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
        ChangeFeedStream.followAvailable(
          spark, table, "event_id", s"$tmp/ckpt") { (v, changes) =>
          changes.count(); seen += v
        }
        // versions 2, 3, 4 exactly once — the _ckpt files never
        // surfaced as extra batches or duplicate headers
        assert(seen.sorted.toSeq === Seq(2L, 3L, 4L))
      } finally TxTable.checkpointInterval = prevInterval
    }
  }

  test("frames drain hands one version-stamped DataFrame per trigger, sink-composable") {
    inDir { tmp =>
      import spark.implicits._
      val table = s"$tmp/table"
      val snap = (0L until 12L).map(i => (i, i * 1.0, i % 4))
        .toDF("event_id", "value", "pbucket")
      TxTable.commitReplace(spark, table, snap, Some("pbucket"))
      (1 to 3).foreach { i =>
        TxTable.mergeChangeSet(spark, table,
          Seq((300L + i, "insert", i * 1.0, (i % 4).toLong))
            .toDF("event_id", "op", "value", "pbucket"),
          "event_id", "op", "pbucket")
      }
      val frames = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, String)]]
      val delivered = ChangeFeedStream.followAvailableFrames(
        spark, table, "event_id", s"$tmp/ckpt", maxVersionsPerTrigger = 8) { df =>
        // the consumer gets ONE frame per trigger — e.g. to append to a
        // sink verbatim; here it is materialized for assertion
        frames += df.select(col("_commit_version").cast("long"),
            col("event_id"), col("op"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      }
      assert(delivered === 3L)
      assert(frames.size === 1, "8-version budget -> all 3 versions in one trigger")
      assert(frames.head.sortBy(_._1) === Seq(
        (2L, 301L, "insert"), (3L, 302L, "insert"), (4L, 303L, "insert")))
      // exactly-once across restarts holds for the frames shape too
      assert(ChangeFeedStream.followAvailableFrames(
        spark, table, "event_id", s"$tmp/ckpt") { _ => fail("re-delivery") } === 0L)
    }
  }

  test("a consumer behind the vacuum horizon fails loud, not wrong") {
    inDir { tmp =>
      import spark.implicits._
      val table = s"$tmp/table"
      val snap = (0L until 8L).map(i => (i, i * 1.0, i % 2))
        .toDF("event_id", "value", "pbucket")
      TxTable.commitReplace(spark, table, snap, Some("pbucket"))
      (1 to 3).foreach { i =>
        TxTable.mergeChangeSet(spark, table,
          Seq((400L + i, "insert", 1.0, (i % 2).toLong))
            .toDF("event_id", "op", "value", "pbucket"),
          "event_id", "op", "pbucket")
      }
      // retire everything but the newest version — a FRESH consumer now
      // needs manifest v-1 for the one remaining manifest and must
      // surface the retention breach instead of emitting a wrong diff
      TxTable.vacuum(spark, table, keepVersions = Some(1), retentionMs = 0L)
      val e = intercept[Exception] {
        ChangeFeedStream.followAvailable(
          spark, table, "event_id", s"$tmp/ckpt_fresh") { (_, df) => df.count(); () }
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("missing")),
        s"expected the vacuumed-manifest error, got: ${messages(e)}")
    }
  }

  test("log subscription delivers each version's net changeset exactly once") {
    inDir { tmp =>
      import spark.implicits._
      val table = s"$tmp/table"
      val snap = (0L until 12L).map(i => (i, i * 1.0, i % 4))
        .toDF("event_id", "value", "pbucket")
      TxTable.commitReplace(spark, table, snap, Some("pbucket"))
      TxTable.mergeChangeSet(spark, table,
        Seq((100L, "insert", 5.0, 0L)).toDF("event_id", "op", "value", "pbucket"),
        "event_id", "op", "pbucket")
      TxTable.mergeChangeSet(spark, table,
        Seq((1L, "delete", 0.0, 1L)).toDF("event_id", "op", "value", "pbucket"),
        "event_id", "op", "pbucket")
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      def consume(): Long = ChangeFeedStream.followAvailable(
        spark, table, "event_id", s"$tmp/ckpt") { (v, changes) =>
        changes.select("event_id", "op").collect()
          .foreach(r => seen += ((v, r.getString(1), r.getLong(0))))
      }
      assert(consume() === 2L) // versions 2 and 3
      assert(seen.sorted.toSeq === Seq((2L, "insert", 100L), (3L, "delete", 1L)))
      // exactly-once: a re-run against the same checkpoint delivers nothing
      assert(consume() === 0L)
      // a new commit is picked up incrementally
      TxTable.mergeChangeSet(spark, table,
        Seq((2L, "update", 99.0, 2L)).toDF("event_id", "op", "value", "pbucket"),
        "event_id", "op", "pbucket")
      assert(consume() === 1L)
      assert(seen.exists(t => t._1 == 4L && t._2 == "update" && t._3 == 2L))
    }
  }
}
