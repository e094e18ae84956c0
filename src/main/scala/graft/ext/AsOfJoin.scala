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
    *
    * Right rows must be unique per (keys, rightTs) — pre-aggregate
    * otherwise (the match at a duplicate timestamp would be
    * nondeterministic in any engine). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("_asof_ts"), lit(1).as("_is_left")) ++
        leftPayload.map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_asof_ts"), lit(0).as("_is_left")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightVals.foldLeft(l.unionByName(r)) { (df, c) =>
        df.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
      }
      .filter(col("_is_left") === 1)
      .select(
        keys.map(col) ++ Seq(col("_asof_ts").as(leftTs)) ++ leftPayload.map(col) ++
          rightVals.map(c => col(s"_r_$c").as(s"asof_$c")): _*)
  }
}
