package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for every left row, attach the most
  * recent right row with `right.ts <= left.ts` within the same key —
  * the market-data / feature-store operator Spark has no built-in for
  * (the reference has no joins at all, SURVEY §2.4; this is engine
  * breadth per the build plan's M4/M5).
  *
  * Implementation is the union + keyed-ordered-window form, not
  * join-then-rank:
  *
  *   - tag both inputs, union them, sort within each key by
  *     (ts, tag) — right rows sort before left rows at equal ts, so
  *     the match is inclusive like DuckDB/kdb `ASOF`;
  *   - running `last(value, ignoreNulls)` over rows-unbounded-preceding
  *     carries each right payload forward to every later left row;
  *   - keep only left rows.
  *
  * Scale shape: ONE shuffle (hash on the key) + an in-partition sort.
  * The join+filter+rank alternative shuffles both sides AND explodes
  * O(left × right-per-key) candidates before ranking them away — on a
  * hot key at 100 TB that is the difference between a sort and an OOM.
  * Skewed keys degrade to a per-key sort, not a cross product.
  */
object AsOfJoin {

  /** @param keys      equi-join key columns (present in both inputs)
    * @param leftTs    event-time column in `left`
    * @param rightTs   event-time column in `right`
    * @param rightVals right payload columns to carry (attached to the
    *                  output as-is; NULL where no right row precedes)
    * @param tolerance optional maximum lookback: a match counts only
    *                  when `left.ts <= matched.right.ts + tolerance`
    *                  (interval for timestamp keys, numeric for numeric
    *                  keys); beyond it every `asof_*` column is NULL —
    *                  the feature-store "max staleness" variant
    *                  (DuckDB-oracle: ASOF + gap filter).
    *
    * Right rows must be unique per (keys, rightTs) — pre-aggregate
    * otherwise (the match at a duplicate timestamp would be
    * nondeterministic in any engine).
    *
    * The right payload is carried as ONE `last(struct, ignoreNulls)`
    * column, not per-column lasts: all `asof_*` outputs come from the
    * same matched right row, and that row's genuinely-NULL payload
    * fields survive (a per-column carry would skip them and resurrect
    * an older row's values — diverging from DuckDB/kdb ASOF). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      tolerance: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    // the carried struct: matched right ts (for the tolerance gate) +
    // payload fields. Non-null on right rows even when every payload
    // field is NULL — that's what keeps the attribution atomic.
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_rts", right.schema(rightTs).dataType) +:
        rightVals.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("_asof_ts"), lit(1).as("_is_left")) ++
        leftPayload.map(col) :+
        lit(null).cast(rStructType).as("_r"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_asof_ts"), lit(0).as("_is_left")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTs).as("_rts") +: rightVals.map(col): _*).as("_r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL match (or match older than the tolerance) ⇒ NULL payload;
    // col("_r._rts") is NULL on no-match, so the gate stays false.
    val withinTol = tolerance
      .map(t => col("_asof_ts") <= col("_r")("_rts") + t)
      .getOrElse(col("_r").isNotNull)
    l.unionByName(r)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(
        keys.map(col) ++ Seq(col("_asof_ts").as(leftTs)) ++ leftPayload.map(col) ++
          rightVals.map(c => when(withinTol, col("_r")(c)).as(s"asof_$c")): _*)
  }
}
