package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("gap boundary semantics: > gap splits, == gap does not") {
    val events = Seq(
      (1L, ts(0)), (1L, ts(100)),          // same session (gap 100 <= 100)
      (1L, ts(201)),                        // gap 101 > 100 → new session
      (2L, ts(50)),                         // single-event session
    ).toDF("user_id", "ts")
    val out = Sessionize.sessions(events, "user_id", "ts", gapSeconds = 100)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_s")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 2L, 100L), (1L, 1L, 1L, 0L), (2L, 0L, 1L, 0L)))
  }

  test("sessions partition the events: counts add up, no overlaps") {
    val ev = graft.analysis.EventsFact.events(spark, sf())
    val sessions = Sessionize.sessions(ev, "user_id", "ts", gapSeconds = 86400)
    val total = sessions.agg(sum("n_events")).as[Long].head()
    assert(total == ev.count())
    // within each user, session time ranges must not overlap
    val overlaps = sessions.alias("a").join(sessions.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_idx") < col("b.session_idx") &&
          col("a.session_end") >= col("b.session_start"))
      .count()
    assert(overlaps == 0)
  }

  test("agrees with Spark's native session_window aggregation") {
    // session_window merges while gap < g (strict); Sessionize merges
    // while gap <= g. Identical unless an inter-event gap equals g
    // exactly — assert that precondition, then require equality.
    val gap = 86400L
    val ev = graft.analysis.EventsFact.events(spark, sf())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val exactTies = ev
      .withColumn("gap_s", col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
      .filter(col("gap_s") === gap).count()
    assert(exactTies == 0, "testdata has an exact-gap tie; pick another gap")
    val native = ev
      .groupBy(col("user_id"), session_window(col("ts"), s"$gap seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val ours = Sessionize.sessions(ev, "user_id", "ts", gap)
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(ours == native)
  }
}
