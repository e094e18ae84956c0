package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stream/batch equivalence for the stateful sessionizer: every session
  * the stream emits must be exactly a batch session (same bounds, same
  * count); sessions the watermark never sealed may legitimately stay in
  * state (a stream has no end-of-input). */
class SessionStreamSpec extends SparkSpec {

  test("emitted streaming sessions are exactly batch sessions") {
    val gap = 86400L
    val emitted = SessionStream.sessions(spark, sf(), gap, "spec_sessions")
    val batch = graft.ext.Sessionize
      .sessions(graft.analysis.EventsFact.events(spark, sf()), "user_id", "ts", gap)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"))
    val emittedN = emitted.count()
    assert(emittedN > 0, "stream emitted nothing — watermark/timeout path broken")
    // every emitted session matches a batch session exactly
    val unmatched = emitted.join(batch,
      Seq("user_id", "start_us", "end_us", "n_events"), "left_anti").count()
    assert(unmatched == 0)
    // and emission is complete up to the watermark: all but at most one
    // trailing (possibly-open) session per user must have been emitted
    val users = batch.select("user_id").distinct().count()
    assert(emittedN >= batch.count() - users)
  }
}
