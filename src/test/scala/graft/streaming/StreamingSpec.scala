package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stream/batch equivalence: the streaming windowed aggregation over
  * the events files must equal the same aggregation run as a batch
  * query (the q37 oracle checks this against DuckDB too). */
class StreamingSpec extends SparkSpec {

  test("streaming daily counts equal the batch aggregation") {
    val streamed = EventsStream.dailyTypeCounts(spark, sf(), "spec_daily")
      .orderBy("day", "event_type").collect()
    val batch = graft.analysis.EventsFact.events(spark, sf())
      .groupBy(col("ts").cast("date").cast("string").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") / count(col("value"))).as("mean_value"))
      .orderBy("day", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getString(0) == b.getString(0) && s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-12)
    }
  }
}
