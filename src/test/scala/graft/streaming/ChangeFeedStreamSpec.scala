package graft.streaming

import graft.SparkSpec
import graft.ext.TxTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ChangeFeedStreamSpec extends SparkSpec {

  private def inDir[T](f: String => T): T = graft.QueryUtil.inTempDir("graft_cfs")(f)

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
