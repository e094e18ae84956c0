package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Incremental ETL: the reference's refresh model is a weekly FULL
  * re-extract + table replace (`refresh_vaccination_db.yml:4-6`,
  * SURVEY §2.10). This is the engine's upgrade path: new wide-CSV
  * drops land in a staging directory, a file-source stream picks up
  * only unseen files (checkpointed source offsets ⇒ exactly-once per
  * file), runs the same tidy transform as the batch ETL, and appends
  * to the published parquet fact.
  *
  * Design notes:
  *   - the unpivot column set must be FIXED for a stream (schema can't
  *     drift mid-query) — callers pass the resolved schema from a
  *     sample drop; a schema change is a new stream version, matching
  *     the reference's fail-fast "OWID schema changed" guard;
  *   - `Trigger.AvailableNow` drains everything staged then stops, so
  *     the weekly cron becomes "run the query until idle" — same
  *     operational shape, none of the re-processing;
  *   - dedup within the stream batch mirrors the batch PK convention
  *     (cross-drop duplicates are handled downstream by
  *     [[graft.ext.Dedup.exactDuplicates]]-style canonicalization or a
  *     compaction job; a global streaming dropDuplicates would keep
  *     unbounded state).
  */
object IncrementalIngest {

  /** Drain all staged wide CSVs into the fact parquet. Returns after
    * the stream goes idle (AvailableNow). */
  def ingestAvailable(
      spark: SparkSession,
      stagingDir: String,
      rawSchema: StructType,
      coverageCols: Seq[String],
      entityCol: String,
      yearCol: String,
      outPath: String,
      checkpoint: String): Unit = {
    val raw = spark.readStream
      .schema(rawSchema)
      .option("header", "true")
      .csv(stagingDir)
    // the SAME column pipeline as the batch ingest (shared definition —
    // a forked copy here once diverged on prefix-strip case semantics)
    val tidy = graft.ingest.WideCsvIngest.tidyColumns(
      raw.unpivot(
        Array(col(entityCol).as("country"), col(yearCol).as("year")),
        coverageCols.map(col).toArray,
        "antigen", "coverage_pct"),
      yearLo = 1980, yearHi = 2100)
    // NOTE deliberately NO streaming dropDuplicates here: a global
    // streaming dedup keeps every PK in the state store forever
    // (unbounded at 100 TB). The PK convention is enforced where it is
    // bounded — per-drop in the batch ETL, corpus-wide by the
    // exactDuplicates compaction pass.
    val q = tidy.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
