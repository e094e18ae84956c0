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
}
