package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 batch: snapshot-isolated table commits (graft.ext.TxTable
  * — manifest commit log, atomic version swap, time travel) in both
  * their batch (q146) and streaming (q147) faces, plus the rn = 1
  * dedup idiom through the TopKWindowRewrite optimizer rule against
  * q92's oracle (q148). The TxTable oracles replay every version's
  * changeset relationally — which is exactly what the commit log
  * promises a reader at any version sees.
  */
object SnapshotQueries {

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  private def localized(df: DataFrame): DataFrame = QueryUtil.localized(df)

  private def inTempDir[T](prefix: String)(f: String => T): T =
    QueryUtil.inTempDir(prefix)(f)

  val all: Seq[Q] = Seq(

    // Versioned MERGE with time travel: base snapshot (v1), two CDC
    // changesets committed as v2 and v3 (each rewriting only touched
    // pbucket files, untouched entries carried by reference), then ALL
    // THREE versions read back AFTER the last commit — the per-version
    // aggregates prove every historical version is intact under later
    // commits. The oracle replays the changeset chain relationally.
    Q("q146_tx_time_travel", SnapshotOracles.txTimeTravel) { (s, dir) =>
      val ev = graft.analysis.EventsFact.events(s, dir)
      inTempDir("graft_tx") { tmp =>
        val table = s"$tmp/table"
        val base = ev.where(col("event_id") % 2 === 0)
          .select(col("event_id"), col("value"), (col("event_id") % 8).as("pbucket"))
        graft.ext.TxTable.commitReplace(s, table, base, Some("pbucket"))
        val changesA = ev.where(col("event_id") % 3 === 0)
          .select(col("event_id"),
            when(col("event_id") % 2 =!= 0, "insert")
              .when(col("event_id") % 12 === 0, "delete")
              .otherwise("update").as("op"),
            (col("value") + 500).as("value"),
            (col("event_id") % 8).as("pbucket"))
        graft.ext.TxTable.mergeChangeSet(s, table, changesA, "event_id", "op", "pbucket")
        val changesB = ev.where(col("event_id") % 5 === 0)
          .select(col("event_id"),
            when(col("event_id") % 2 =!= 0 && col("event_id") % 3 =!= 0, "insert")
              .when(col("event_id") % 20 === 0, "delete")
              .otherwise("update").as("op"),
            (col("value") + 900).as("value"),
            (col("event_id") % 8).as("pbucket"))
        graft.ext.TxTable.mergeChangeSet(s, table, changesB, "event_id", "op", "pbucket")
        // every read below TIME-TRAVELS from the final (v3) log state
        val perVersion = (1 to 3).map { v =>
          graft.ext.TxTable.read(s, table, versionAsOf = Some(v.toLong))
            .groupBy((col("event_id") % 10).as("bucket"))
            .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
            .withColumn("version", lit(v))
        }
        localized(perVersion.reduce(_ unionByName _)
          .select("version", "bucket", "n", "value_sum")
          .orderBy("version", "bucket"))
      }
    },

    // Streaming MERGE onto the commit log: the q138 change feed
    // drained micro-batch by micro-batch, each non-empty batch one
    // ATOMIC TxTable version (readers racing the stream see only
    // committed versions; emptied partitions vanish structurally).
    // Final state must equal the one-shot relational apply — the same
    // oracle as q138, which is the point: same answer, isolation
    // upgraded from "rewrites live dirs" to "atomic manifest swap".
    Q("q147_stream_merge_versioned", DataOpsOracles.streamMerge) { (s, dir) =>
      import org.apache.spark.sql.types._
      val ev = graft.analysis.EventsFact.events(s, dir)
      inTempDir("graft_txs") { tmp =>
        val table = s"$tmp/table"
        graft.ext.TxTable.commitReplace(s,
          table,
          ev.where(col("event_id") % 2 === 0)
            .select(col("event_id"), col("value"), (col("event_id") % 8).as("pbucket")),
          Some("pbucket"))
        ev.where(col("event_id") % 3 === 0)
          .select(col("event_id"),
            when(col("event_id") % 2 =!= 0, "insert")
              .when(col("event_id") % 12 === 0, "delete")
              .otherwise("update").as("op"),
            (col("value") + 500).as("value"),
            (col("event_id") % 8).as("pbucket"))
          .repartition(3, col("pbucket"))
          .write.parquet(s"$tmp/changes")
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("op", StringType),
          StructField("value", DoubleType), StructField("pbucket", LongType)))
        graft.streaming.MergeStream.mergeAvailableVersioned(
          s, table, s"$tmp/changes", schema, s"$tmp/ckpt")
        localized(graft.ext.TxTable.read(s, table)
          .groupBy((col("event_id") % 7).as("k"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
          .orderBy("k"))
      }
    },

    // q92's canonical election asked through the PLAIN window idiom
    // (rn = 1 over the cluster partition) under the TopKWindowRewrite
    // rule: the rn = 1 dedup shape — not just rn <= k (q144) — must
    // land on TopKPerKeyExec's bounded heaps, with q92's oracle
    // unchanged. TopKWindowRewriteSpec asserts the executed plan
    // (TopKPerKeyExec present, WindowExec gone) for this exact shape;
    // here the ROWS are held to the recursive-CTE oracle. localized()
    // forces optimization inside scoped() (the q144 discipline; the
    // result is one row per cluster — #docs-bounded at any SF this
    // lane runs at; the production form stays q92's explicit
    // keepClusterCanonicalBy operator).
    Q("q148_canonical_window_rewrite", CorpusOpsQueries.canonicalByQualityOracle) { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "n_chars")
      val comp = graft.ext.Dedup.componentsFor(s, dir, minJaccard = 0.4, maxBucket = 256)
        .withColumnRenamed("id", "doc_id")
      val clustered = docs.join(comp, Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("component"), col("doc_id")))
        .drop("component")
      graft.plans.TopKWindowRewrite.scoped(s) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster").orderBy(desc("n_chars"), asc("doc_id"))
        localized(clustered.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1).drop("rn")
          .select("doc_id", "cluster", "n_chars")
          .orderBy("doc_id"))
      }
    },
  )
}

object SnapshotOracles {

  /** The q129/q138 merge recipe applied twice, aggregated per version
    * — DuckDB replays the chain; the engine reads each version from
    * the commit log AFTER all commits. */
  val txTimeTravel: String =
    """WITH s1 AS (SELECT event_id, value FROM events WHERE event_id % 2 = 0),
      |ca AS (SELECT event_id,
      |    CASE WHEN event_id % 2 <> 0 THEN 'insert'
      |      WHEN event_id % 12 = 0 THEN 'delete'
      |      ELSE 'update' END AS op,
      |    value + 500 AS value
      |  FROM events WHERE event_id % 3 = 0),
      |s2 AS (
      |  SELECT s1.event_id, s1.value FROM s1
      |  LEFT JOIN ca ON s1.event_id = ca.event_id AND ca.op IN ('update', 'delete')
      |  WHERE ca.event_id IS NULL
      |  UNION ALL
      |  SELECT event_id, value FROM ca WHERE op IN ('insert', 'update')),
      |cb AS (SELECT event_id,
      |    CASE WHEN event_id % 2 <> 0 AND event_id % 3 <> 0 THEN 'insert'
      |      WHEN event_id % 20 = 0 THEN 'delete'
      |      ELSE 'update' END AS op,
      |    value + 900 AS value
      |  FROM events WHERE event_id % 5 = 0),
      |s3 AS (
      |  SELECT s2.event_id, s2.value FROM s2
      |  LEFT JOIN cb ON s2.event_id = cb.event_id AND cb.op IN ('update', 'delete')
      |  WHERE cb.event_id IS NULL
      |  UNION ALL
      |  SELECT event_id, value FROM cb WHERE op IN ('insert', 'update')),
      |a1 AS (SELECT 1 AS version, CAST(event_id % 10 AS BIGINT) AS bucket,
      |    count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
      |  FROM s1 GROUP BY 2),
      |a2 AS (SELECT 2 AS version, CAST(event_id % 10 AS BIGINT) AS bucket,
      |    count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
      |  FROM s2 GROUP BY 2),
      |a3 AS (SELECT 3 AS version, CAST(event_id % 10 AS BIGINT) AS bucket,
      |    count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
      |  FROM s3 GROUP BY 2)
      |SELECT version, bucket, n, value_sum FROM (
      |  SELECT * FROM a1 UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3)
      |ORDER BY version, bucket""".stripMargin
}
