package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong
  * to one session while the inter-event gap stays ≤ `gap`; a larger gap
  * starts a new session. The standard clickstream/user-journey operator.
  *
  * Batch form (this object): keyed ordered window — a boundary flag
  * from `lag`, a running sum to number sessions, then a grouped
  * aggregate per session. ONE shuffle on the key (the session agg
  * reuses the same hash partitioning, so Catalyst plans no second
  * exchange). The streaming form with explicit state lives in
  * [[graft.streaming.SessionStream]].
  */
object Sessionize {

  /** Per-event session index (0-based per key, in time order). */
  def withSessionIndex(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: Column): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(tsCol)
    val newSession = when(
      col(tsCol).cast("long") - lag(col(tsCol), 1).over(byKey).cast("long") > gap.cast("long"),
      1).otherwise(0)
    events
      .withColumn("_boundary", newSession)
      .withColumn("session_idx",
        sum(col("_boundary")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_boundary")
  }

  /** One row per (key, session): event count, start/end, duration. */
  def sessions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long): DataFrame =
    withSessionIndex(events, keyCol, tsCol, lit(gapSeconds))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration_s",
        col("session_end").cast("long") - col("session_start").cast("long"))
}
