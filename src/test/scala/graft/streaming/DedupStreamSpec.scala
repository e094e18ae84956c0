package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-state streaming dedup ([[DedupStream]],
  * `dropDuplicatesWithinWatermark`) — the complement of
  * [[StreamDedupSpec]]'s global `dropDuplicates`: state here expires
  * with the watermark instead of growing for corpus lifetime. */
class DedupStreamSpec extends SparkSpec {

  test("doubled event stream dedups to the batch per-type counts") {
    val got = DedupStream.dedupedTypeCounts(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(s"${sf()}/events.parquet")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"deduped stream counts must equal batch counts (every event arrived twice): $got vs $want")
    // and the total really is the distinct id count, not the doubled feed
    val distinctIds = spark.read.parquet(s"${sf()}/events.parquet")
      .select("event_id").distinct().count()
    assert(got.values.sum == distinctIds)
  }
}
