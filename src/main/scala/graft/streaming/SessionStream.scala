package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming gap-sessionization with explicit keyed state —
  * `flatMapGroupsWithState`, the custom-state path of Structured
  * Streaming (SURVEY §2.10 extension; batch equivalent:
  * [[graft.ext.Sessionize]]).
  *
  * State per user: the open session (start, last-seen, count). Each
  * micro-batch folds that user's new events in event-time order:
  * a gap > `gapSeconds` closes the open session (emitted downstream)
  * and starts a new one. An event-time timeout (watermark passing
  * last-seen + gap) flushes sessions of users that went quiet.
  *
  * Emission contract (what the spec asserts): every emitted session is
  * exactly a batch session; sessions still open at end-of-input stay in
  * state (a stream has no "end" — AvailableNow just stops scheduling),
  * so completeness is "all sessions the watermark has sealed".
  */
object SessionStream {

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Epoch micros from a Timestamp (getTime alone is ms-truncated). */
  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private[streaming] def foldUser(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession],
      gapSeconds: Long): Iterator[ClosedSession] = {
    val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    if (state.hasTimedOut) {
      state.getOption.foreach { s =>
        closed += ClosedSession(userId, s.startUs, s.lastUs, s.n)
      }
      state.remove()
    } else {
      // Micro-batch delivers an unordered group; event-time order is
      // re-established per batch. Cross-batch disorder is bounded by
      // the watermark (late rows beyond it are dropped upstream).
      val sorted = events.toArray.sortBy(e => micros(e.ts))
      var cur = state.getOption.orNull
      sorted.foreach { e =>
        val us = micros(e.ts)
        if (cur == null) cur = OpenSession(us, us, 1L)
        // second-truncated gap test — the batch Sessionize compares
        // ts.cast(long) (epoch seconds, floor), so the stream must
        // truncate identically or boundary gaps (e.g. 86400.8 s) would
        // split sessions the batch keeps, breaking stream==batch parity
        else if (us / 1000000L - cur.lastUs / 1000000L > gapSeconds) {
          closed += ClosedSession(userId, cur.startUs, cur.lastUs, cur.n)
          cur = OpenSession(us, us, 1L)
        } else cur = OpenSession(cur.startUs, math.max(cur.lastUs, us), cur.n + 1L)
      }
      if (cur != null) {
        state.update(cur)
        // Flush once the watermark proves no event can extend this session.
        state.setTimeoutTimestamp(cur.lastUs / 1000L + gapSeconds * 1000L)
      }
    }
    closed.iterator
  }

  /** Run sessionization over the events table as a stream (AvailableNow)
    * and return every session the watermark sealed. */
  def sessions(spark: SparkSession, sfDir: String, gapSeconds: Long,
               queryName: String = "sessions"): DataFrame = {
    import spark.implicits._
    // Schema probed from the footer, ts canonicalized to an instant
    // (EventsFact.canonicalTs cross-generation contract).
    val stream = graft.analysis.EventsFact.canonicalTs(spark.readStream
      .schema(graft.analysis.EventsFact.eventsSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[SessionEvent], st: GroupState[OpenSession]) =>
          foldUser(uid, it, st, gapSeconds))
    // stateful (flatMapGroupsWithState): per-partition state stores —
    // same 4-partition scope as the other stateful streams
    val q = StreamTuning.withStreamPartitions(spark, 4) {
      stream.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    spark.table(queryName)
  }
}
