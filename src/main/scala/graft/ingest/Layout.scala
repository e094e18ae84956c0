package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}

/** At-rest layouts that decide whether 100 TB plans shuffle.
  *
  * Three tiers, composing with [[WideCsvIngest.writeFact]]'s
  * sorted-row-group layout (the PK-index analog):
  *
  *   - [[writePartitioned]] — hive-style directory partitioning on a
  *     low-cardinality column: equality/IN predicates prune whole
  *     directories at planning time (`PartitionFilters`, zero I/O for
  *     pruned values).
  *   - [[writeBucketed]] — hash-bucketed table on the join/agg key:
  *     two tables bucketed the same way join with NO exchange on
  *     either side; a groupBy on the bucket key needs no shuffle.
  *     This is the "pre-paid shuffle": pay it once at write, never at
  *     read.
  *   - row-group sorting (writeFact) — min/max stats prune within a
  *     file for point lookups.
  */
object Layout {

  /** Directory-partitioned parquet. Partition column cardinality should
    * be bounded (directories = distinct values); everything else stays
    * in the row payload. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Hash-bucketed + in-bucket-sorted table (bucketing requires the
    * table catalog, so this is `saveAsTable` with an explicit external
    * path). Readers get `outputPartitioning = HashPartitioning(key,
    * buckets)` and skip the exchange when the key matches. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
}
