package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamJoinSpec extends SparkSpec {

  test("stream-stream interval join equals the batch join") {
    val streamed = StreamJoin.purchaseAttribution(spark, sf(), "spec_attrib")
      .orderBy("event_id", "signup_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = graft.analysis.EventsFact.events(spark, sf())
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val batch = p.join(s,
        col("user_id") === col("s_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("p_ts")).as("purchase_us"),
        unix_micros(col("s_ts")).as("signup_us"))
      .orderBy("event_id", "signup_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty, "expected at least one attributed purchase")
    assert(streamed.toSeq == batch.toSeq)
  }

  test("a purchase can attribute to MULTIPLE signups (interval, not as-of)") {
    val streamed = StreamJoin.purchaseAttribution(spark, sf(), "spec_attrib2")
    val multi = streamed.groupBy("event_id").count().filter(col("count") > 1).count()
    // the synthetic corpus has users with repeated signups within the
    // window (152 such purchases at sf0.001) — this is what separates
    // the interval join from as-of
    assert(multi > 0, "expected purchases attributed to multiple signups")
    // as-of join (most-recent-only) is a strict subset
    val asofRows = graft.ext.AsOfJoin.asOf(
        graft.analysis.EventsFact.events(spark, sf())
          .filter(col("event_type") === "purchase").select("user_id", "event_id", "ts"),
        graft.analysis.EventsFact.events(spark, sf())
          .filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("sts"), unix_micros(col("ts")).as("sus"))
          .distinct(),
        Seq("user_id"), "ts", "sts", Seq("sus"))
      .filter(col("asof_sus").isNotNull).count()
    assert(streamed.select("event_id").distinct().count() <= asofRows,
      "every interval-attributed purchase has an as-of match (within 7d ⊆ at-or-before)")
  }
}
