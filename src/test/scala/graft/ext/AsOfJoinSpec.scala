package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the most recent right row at-or-before, null when none") {
    val left = Seq(
      ("k1", 10L, "l_a"), ("k1", 20L, "l_b"), ("k1", 5L, "l_early"),
      ("k2", 100L, "l_c"),
      ("k3", 50L, "l_orphan"), // key with no right rows at all
    ).toDF("key", "t", "tag")
    val right = Seq(
      ("k1", 10L, "r_at10"), ("k1", 15L, "r_at15"),
      ("k2", 99L, "r_at99"), ("k2", 101L, "r_future"),
    ).toDF("key", "rt", "rv")

    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("rv"))
      .select("key", "t", "tag", "asof_rv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet

    assert(out == Set(
      ("k1", 5L, "l_early", None),          // nothing at or before 5
      ("k1", 10L, "l_a", Some("r_at10")),   // inclusive: equal ts matches
      ("k1", 20L, "l_b", Some("r_at15")),   // most recent, not first
      ("k2", 100L, "l_c", Some("r_at99")),  // future right row ignored
      ("k3", 50L, "l_orphan", None),
    ))
  }

  test("matched right row is attributed atomically — its NULL payload fields survive") {
    val left = Seq(("k1", 20L, "l")).toDF("key", "t", "tag")
    // the match at rt=15 has x NULL / y set; the older row at rt=10 has
    // both set. A per-column carry would resurrect x="old_x" — the
    // struct carry must report (NULL, "new_y") from the SAME row.
    val right = Seq(
      ("k1", 10L, Option("old_x"), Option("old_y")),
      ("k1", 15L, Option.empty[String], Option("new_y")),
    ).toDF("key", "rt", "x", "y")
    val row = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("x", "y"))
      .select("asof_x", "asof_y").head()
    assert(row.isNullAt(0), "matched row's NULL field must not be back-filled")
    assert(row.getString(1) == "new_y")
  }

  test("tolerance nulls matches older than the max staleness") {
    val left = Seq(("k1", 18L, "near"), ("k1", 30L, "stale"), ("k1", 5L, "none"))
      .toDF("key", "t", "tag")
    val right = Seq(("k1", 15L, "r")).toDF("key", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("rv"),
        tolerance = Some(lit(5L)))
      .select("tag", "asof_rv")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out == Set(
      ("near", Some("r")),  // 18 <= 15 + 5
      ("stale", None),      // 30 > 15 + 5: matched but too stale → NULL
      ("none", None),       // nothing at or before 5
    ))
  }

  test("as-of join against events equals a per-row subquery check") {
    val ev = graft.analysis.EventsFact.events(spark, sf())
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts").limit(200)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("sts"), unix_micros(col("ts")).as("sus"))
      .distinct()
    val got = AsOfJoin.asOf(purchases, signups, Seq("user_id"), "ts", "sts", Seq("sus"))
    // oracle: max(right ts at-or-before left ts) via plain join + groupBy
    // (null-preserving: purchases with no qualifying signup keep NULL)
    val expected = purchases.join(signups, Seq("user_id"), "left")
      .groupBy("user_id", "event_id", "ts")
      .agg(max(when(col("sts") <= col("ts"), col("sus"))).as("exp_sus"))
    val joined = got.join(expected, Seq("user_id", "event_id"))
    assert(joined.count() == purchases.count())
    assert(joined.filter(
      !(col("asof_sus") <=> col("exp_sus"))).count() == 0)
  }
}
