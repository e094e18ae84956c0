package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream event-time interval join: every purchase matched to
  * ALL of the same user's signups in the preceding 7 days — the
  * attribution-window join, as two live streams (vs [[graft.ext.AsOfJoin]]
  * which is the batch most-recent-only variant).
  *
  * State boundedness is the whole design: BOTH sides carry a
  * watermark and the join condition bounds event time in BOTH
  * directions (`s_ts <= p_ts <= s_ts + 7d`), which is exactly what
  * lets Spark expire buffered rows — a signup older than
  * watermark − 7d can never match again and is dropped from the state
  * store. Without the range bound the state grows forever; with it,
  * state ≈ 7 days of signups + the watermark delay of purchases,
  * independent of stream length. Inner-join results emit as soon as
  * both sides arrive (no watermark holdback — that's outer-join
  * semantics), so running the stream to completion equals the batch
  * join, which is what the DuckDB oracle checks.
  */
object StreamJoin {

  def purchaseAttribution(
      spark: SparkSession,
      sfDir: String,
      queryName: String = "purchase_attribution"): DataFrame = {
    // ONE source, both sides filtered off it (streaming self-join):
    // two independent readStreams would each run their own file
    // listing and scan per micro-batch. Schema probed from the footer,
    // ts canonicalized (EventsFact.canonicalTs cross-generation contract).
    val src = graft.analysis.EventsFact.canonicalTs(spark.readStream
      .schema(graft.analysis.EventsFact.eventsSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))
    def side(tpe: String): DataFrame = src.filter(col("event_type") === tpe)
    val purchases = side("purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = side("signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val joined = purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("p_ts")).as("purchase_us"),
        unix_micros(col("s_ts")).as("signup_us"))
    // 4 state partitions, not the batch-side 32: a stream-stream join
    // keeps FOUR state stores per shuffle partition and every
    // micro-batch pays each store's open/commit — at this state size
    // fewer, fatter stores win (see StreamTuning).
    // Trigger.Once (single batch), not AvailableNow: an INNER interval
    // join emits eagerly, so running to completion needs no second
    // watermark-advance batch — that batch only evicts state, which a
    // terminating query throws away anyway. (A resuming/long-lived
    // deployment would use AvailableNow + a durable checkpoint.)
    val q = StreamTuning.withStreamPartitions(spark, 4) {
      joined.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("append")
        .trigger(Trigger.Once())
        .start()
    }
    q.awaitTermination()
    spark.table(queryName)
  }

  /** LEFT OUTER stream-stream interval join — purchases with NO signup
    * in the window must also emit (with a −1 sentinel), which is the
    * semantically hard half of streaming joins: an unmatched left row
    * can only be declared unmatched once the WATERMARK has passed its
    * whole join window, so emission is driven by watermark advance,
    * not data arrival.
    *
    * A terminating query therefore needs the watermark pushed PAST the
    * last real event or every late-window unmatched purchase stays
    * buffered in the state store and the run-to-completion result
    * diverges from the batch LEFT JOIN. The staging pass appends two
    * far-future SENTINEL events (one per side, filtered back out of
    * the result); after the data batch the watermark sits beyond every
    * real window and the engine's no-data batch flushes the remaining
    * unmatched rows. That sentinel discipline is the operational
    * recipe for draining an outer-join stream at end-of-feed.
    *
    * State boundedness: same two-sided time bound as the inner
    * variant; outer rows additionally wait out the watermark — state ≈
    * window + delay, independent of stream length. */
  def purchaseAttributionLeftOuter(
      spark: SparkSession,
      sfDir: String,
      stagingDir: String,
      queryName: String = "purchase_attribution_outer"): DataFrame = {
    // max(ts) rides the staging write via observe() — the q156
    // discipline: the sentinel arithmetic needs one scalar, and a
    // separate agg pass would re-scan the whole feed for it (at 100 TB
    // a second full read; the accumulator is free in the write pass)
    val obs = org.apache.spark.sql.Observation()
    val ev = graft.analysis.EventsFact.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .observe(obs, max(col("ts")).as("max_ts"))
    ev.write.mode("overwrite").parquet(stagingDir)
    val maxTs = obs.get("max_ts") match {
      case t: java.sql.Timestamp => t
      case null => null // all-NULL ts (or empty feed) observes NULL
      case other => sys.error( // fail loud, never silently "empty"
        s"observed max_ts has unexpected type ${other.getClass}: $other")
    }
    // empty/all-NULL-ts input: the batch LEFT JOIN is empty; starting
    // a stream just to drain nothing (and NPE-ing on the sentinel
    // arithmetic) is wrong on both counts
    if (maxTs == null) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("event_id", "user_id", "purchase_us", "signup_us")
    }
    import spark.implicits._
    Seq(
      (-1L, -1L, "purchase", new java.sql.Timestamp(maxTs.getTime + 30L * 86400 * 1000)),
      (-2L, -1L, "signup", new java.sql.Timestamp(maxTs.getTime + 30L * 86400 * 1000)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("append").parquet(stagingDir)
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("ts", TimestampType))))
      .parquet(stagingDir)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = src.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val joined = purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"),
        "leftOuter")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("p_ts")).as("purchase_us"),
        coalesce(unix_micros(col("s_ts")), lit(-1L)).as("signup_us"))
    val q = StreamTuning.withStreamPartitions(spark, 4) {
      joined.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    // sentinel rows out; real rows only
    spark.table(queryName).where(col("event_id") >= 0)
  }
}
