package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def results(df: org.apache.spark.sql.DataFrame, k: Int = 5, minDocs: Int = 2) =
    Boilerplate.removeBoilerplateSpans(df, k = k, minDocs = minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("a 5-gram shared by two docs is scrubbed from both; unique text survives") {
    val docs = Seq(
      (1L, "visit our site for more info unique tail one"),
      (2L, "visit our site for more info unique tail two"),
      (3L, "completely different words with no shared span at all"),
    ).toDF("doc_id", "text")
    val r = results(docs)
    // every 5-gram through start=4 ("for more info unique tail") is
    // shared ⇒ tokens 1..8 covered; only the differing tail survives
    assert(r(1L)._3 == "one")
    assert(r(2L)._3 == "two")
    assert(r(1L)._2 == 1 && r(1L)._1 == 9)
    assert(r(3L)._3 == "completely different words with no shared span at all")
  }

  test("coverage extends k-1 tokens past the last boilerplate start") {
    val docs = Seq(
      (1L, "a b c d e tail"),
      (2L, "a b c d e other"),
    ).toDF("doc_id", "text")
    val r = results(docs)
    // only "a b c d e" is shared; it covers positions 1..5 exactly
    assert(r(1L)._3 == "tail" && r(2L)._3 == "other")
  }

  test("docs shorter than k tokens are never scrubbed") {
    val docs = Seq(
      (1L, "tiny doc"),
      (2L, "tiny doc"),
      (3L, "x y z"),
    ).toDF("doc_id", "text")
    val r = results(docs)
    assert(r(1L)._3 == "tiny doc" && r(2L)._3 == "tiny doc" && r(3L)._3 == "x y z")
  }

  test("a fully-boilerplate doc comes back empty but stays in the output") {
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five"),
    ).toDF("doc_id", "text")
    val r = results(docs)
    assert(r(1L) == ((5L, 0L, "")) && r(2L) == ((5L, 0L, "")))
  }

  test("boilerplate dictionary joins broadcast; windows reuse one doc partitioning") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = Boilerplate.removeBoilerplateSpans(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dictionary must broadcast:\n$plan")
  }

  test("output keeps every input doc exactly once") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = Boilerplate.removeBoilerplateSpans(docs)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // kept tokens are a subsequence: n_kept ≤ n_tokens, and cleaned
    // token count equals n_kept
    val bad = out.filter(col("n_kept") > col("n_tokens") ||
        (col("n_kept") > 0 && size(split(col("cleaned"), " ")) =!= col("n_kept")))
      .count()
    assert(bad == 0L)
  }
}
