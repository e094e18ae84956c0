package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q113's bigram-LM scoring against a hand-computed reference: add-1
  * smoothing, floor-quantized log-probs, multiplicity-weighted sums. */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val df = docs.toDF("doc_id", "text").repartition(3)
    val run = graft.SparkEntry.queries("q113_bigram_lm_score")
    // run the registered query body against a temp dir holding the docs
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    try {
      df.withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      run(spark, dir).as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    } finally graft.Fs.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("matches a scala reference on a tiny corpus") {
    val docs = Seq(
      1L -> "a b a b c",
      2L -> "a b",
      3L -> "c c c",
      4L -> "solo")
    val got = score(docs)
    // reference
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val bis = toks.flatMap { case (id, ws) =>
      ws.zip(ws.drop(1)).map(b => (id, b._1, b._2))
    }
    val c2 = bis.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size }
    val c1 = bis.groupBy(_._2).map { case (k, v) => k -> v.size }
    val v = toks.flatMap(_._2).distinct.size // a, b, c, solo -> 4
    def qln(w1: String, w2: String): Long =
      math.floor(math.log((c2((w1, w2)) + 1).toDouble / (c1(w1) + v)) * 1e6).toLong
    val want = bis.groupBy(_._1).map { case (id, bs) =>
      id -> (bs.size.toLong, bs.map(b => qln(b._2, b._3)).sum)
    }
    assert(!got.contains(4L), "single-token doc has no bigrams")
    assert(got == want, s"$got vs $want")
  }

  test("deterministic under repartitioning (quantized-long sums)") {
    val docs = (1L to 30L).map(i =>
      i -> Seq.fill(20)(s"w${(i * 7 + 3) % 11}").zipWithIndex
        .map { case (w, j) => s"$w${(i + j) % 5}" }.mkString(" "))
    assert(score(docs) == score(docs))
  }
}
