package graft.ext

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("greedy packing: docs fill a sequence until the budget, then roll over") {
    // one shard (ids all ≡ 0 mod 8 ⇒ use numShards=1), budget 10
    val docs = Seq(
      (0L, tokensOf(4)), // seq 0 (acc 4)
      (1L, tokensOf(5)), // seq 0 (acc 9)
      (2L, tokensOf(2)), // 9+2 > 10 ⇒ seq 1 (acc 2)
      (3L, tokensOf(8)), // 2+8 = 10 ⇒ seq 1 (acc 10)
      (4L, tokensOf(1)), // 10+1 > 10 ⇒ seq 2
    ).toDF("doc_id", "text")
    val packed = Packing.packSequences(spark, docs, budget = 10, numShards = 1)
      .collect().map(p => p.doc_id -> p.seq).toMap
    assert(packed == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("a doc longer than the budget occupies its own sequence") {
    val docs = Seq(
      (0L, tokensOf(3)),  // seq 0
      (1L, tokensOf(99)), // oversized ⇒ seq 1 alone
      (2L, tokensOf(3)),  // 99+3 > 10 ⇒ seq 2
    ).toDF("doc_id", "text")
    val packed = Packing.packSequences(spark, docs, budget = 10, numShards = 1)
      .collect().map(p => p.doc_id -> p.seq).toMap
    assert(packed == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("sequence totals never exceed the budget except oversized singletons") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val packed = Packing.packSequences(spark, docs, budget = 256, numShards = 8)
    val bad = packed.groupByKey(p => (p.shard, p.seq))
      .mapGroups { (_, it) =>
        val ds = it.toSeq
        (ds.map(_.n_tokens.toLong).sum, ds.size)
      }
      .filter(t => t._1 > 256 && t._2 > 1)
      .count()
    assert(bad == 0L, "multi-doc sequence over budget")
  }

  test("offsets: each doc starts where the previous one ended within its sequence") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val packed = Packing.packSequences(spark, docs, budget = 256, numShards = 8)
      .collect().groupBy(p => (p.shard, p.seq))
    packed.values.foreach { ds =>
      val sorted = ds.sortBy(_.doc_id)
      var expect = 0
      sorted.foreach { p =>
        assert(p.offset == expect, s"doc ${p.doc_id}")
        expect += p.n_tokens
      }
      // multi-doc sequences stay within budget end-to-end
      if (sorted.length > 1)
        assert(sorted.last.offset + sorted.last.n_tokens <= 256)
    }
  }

  test("assignment is deterministic and repartition-invariant") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Packing.packSequences(spark, df, budget = 256, numShards = 8)
        .collect().map(p => p.doc_id -> ((p.shard, p.seq))).toMap
    assert(run(docs) == run(docs.repartition(13)))
  }
}
