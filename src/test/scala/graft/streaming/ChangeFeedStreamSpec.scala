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
