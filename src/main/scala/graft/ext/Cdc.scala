package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: merge an insert/update/delete changeset
  * into a keyed snapshot — the write-side MERGE INTO a plain-parquet
  * pipeline needs next to the read-side reconciliation (q114's
  * snapshot diff) and the history build (q122's SCD2).
  *
  * Semantics (the lakehouse MERGE contract):
  *   - `delete`: the key's current row is removed;
  *   - `update`: the key's current row is REPLACED by the change row
  *     (full-row replace, not column patch);
  *   - `insert`: the change row is added.
  *
  * Contract: at most ONE change row per key per batch (CDC compaction
  * upstream — `Dedup.keepCanonical` by sequence number produces
  * exactly that); inserts are assumed new keys, updates/deletes
  * existing ones. With a duplicate-key changeset the union would emit
  * duplicates — enforcing it here would cost a distinct over the
  * changeset, so it stays the caller's contract (spec'd, documented).
  *
  * Scale shape: ONE anti-join shuffle on the key (snapshot side) plus
  * a shuffle-free union with the change rows — no full-outer join, no
  * window. On a day-partitioned snapshot with a pre-bucketed key
  * layout ([[graft.ingest.Layout]]) the anti-join is exchange-free on
  * the snapshot side, which is what makes daily 100 TB merges viable.
  */
object Cdc {

  /** `changes` must carry `keyCol`, `opCol` ∈ {insert, update, delete},
    * and the snapshot's payload columns (same names). Returns the
    * merged snapshot with the snapshot's column order.
    *
    * `evolveSchema = true` additionally admits NEW payload columns in
    * the changeset (the Delta `mergeSchema` contract): the output
    * carries `snapshot.columns ++ (new change columns)`, with kept
    * snapshot rows NULL in the new columns — additive-only evolution,
    * never a type change or drop (both are rewrites, not merges). */
  def applyChangeSet(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      opCol: String,
      evolveSchema: Boolean = false): DataFrame = {
    val extras = changes.schema.fields.toSeq
      .filterNot(f => f.name == opCol || snapshot.columns.contains(f.name))
    // fail loud rather than silently dropping a column the caller
    // provided: an unnoticed drop is how evolution bugs ship
    require(evolveSchema || extras.isEmpty,
      s"changeset carries columns the snapshot lacks " +
        s"(${extras.map(_.name).mkString(", ")}) — pass evolveSchema = true " +
        "to admit them (additive evolution) or project them away")
    val gone = changes
      .where(col(opCol).isin("update", "delete"))
      .select(col(keyCol))
    val kept = snapshot.join(gone, Seq(keyCol), "left_anti")
    val newCols = if (!evolveSchema) Seq.empty else extras
    val outCols = snapshot.columns.toIndexedSeq ++ newCols.map(_.name)
    val keptWide = newCols.foldLeft(kept) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val added = changes
      .where(col(opCol).isin("insert", "update"))
      .select(outCols.map(col): _*)
    keptWide.select(outCols.map(col): _*).unionByName(added)
  }
}
