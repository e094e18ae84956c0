package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamStaticSpec extends SparkSpec {

  test("stream-static join + windowed agg equals the batch equivalent") {
    val got = StreamStatic.dailyCategoryStats(spark, sf())
      .orderBy("day", "category").collect().toSeq
    val want = graft.analysis.EventsFact.events(spark, sf())
      .join(broadcast(StreamStatic.eventDim(spark)), "event_type")
      .groupBy(col("ts").cast("date").cast("string").as("day"), col("category"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("weight").cast("long")).as("weight_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .orderBy("day", "category").collect().toSeq
    assert(got == want, s"stream ${got.take(3)}... vs batch ${want.take(3)}...")
  }

  test("every event type is covered by the dim (inner join drops nothing)") {
    val types = graft.analysis.EventsFact.events(spark, sf())
      .select("event_type").distinct()
    val uncovered = types.join(StreamStatic.eventDim(spark), Seq("event_type"), "left_anti")
    assert(uncovered.isEmpty, "dim must cover every live event_type")
  }
}
