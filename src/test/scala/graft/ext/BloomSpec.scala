package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every built key probes true") {
    val keys = (0 until 5000).map(i => s"key_$i")
    val bits = Bloom.build(keys.toDF("k"), mBits = 1 << 17, numHashes = 4)
    keys.foreach { k =>
      assert(Bloom.mightContain(UTF8String.fromString(k), bits, 4), s"false negative on $k")
    }
  }

  test("false-positive rate stays near the design point") {
    val keys = (0 until 5000).map(i => s"key_$i")
    val bits = Bloom.build(keys.toDF("k"), mBits = 1 << 17, numHashes = 4)
    // n=5000, m=131072, k=4 ⇒ fpr ≈ (1−e^(−kn/m))^k ≈ 0.04%
    val probes = (0 until 20000).map(i => s"absent_$i")
    val fp = probes.count(p => Bloom.mightContain(UTF8String.fromString(p), bits, 4))
    assert(fp.toDouble / probes.size < 0.005, s"fpr ${fp.toDouble / probes.size}")
  }

  test("build and probe expressions agree through codegen on the real corpus") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val grams = docs.select(explode(Dedup.shingles(col("text"), 8)).as("gram")).distinct()
    val bits = Bloom.build(grams, mBits = 1 << 17, numHashes = 4)
    // probing the exact build set through the Column API must all pass
    val misses = grams.filter(!Bloom.mightContainCol(col("gram"), bits, 4)).count()
    assert(misses == 0L, s"$misses false negatives through codegen path")
  }

  test("bloom prefilter preserves the exact decontamination result") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val eval = docs.filter(col("doc_id") % 7 === 0)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toMap(Curation.contaminatedBloom(train, eval, k = 8)) ==
      toMap(Curation.contaminated(train, eval, k = 8)))
  }

  test("plan shows no exchange before the bloom probe") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = Curation.contaminatedBloom(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0))
      .queryExecution.executedPlan.toString
    // the probe filter must sit below any exchange on the train side
    assert(plan.contains("bloom_might_contain"), s"probe missing:\n$plan")
  }

  test("build rejects a bit count that is not a multiple of 64") {
    intercept[IllegalArgumentException](Bloom.build(Seq("a").toDF("k"), mBits = 100))
  }

  test("probe expressions are content-equal: canonicalization/CSE can fire") {
    // one shared child: attribute Origins differ per call site, and the
    // point here is the BITS equality semantics, not the child's
    val child = org.apache.spark.sql.GraftColumnBridge.expression(col("k"))
    val bits = Bloom.build(Seq("a", "b").toDF("k"), mBits = 64 * 4, numHashes = 2)
    val e1 = BloomMightContain(child, new BloomBits(bits), 2)
    val e2 = BloomMightContain(child, new BloomBits(bits.clone()), 2)
    assert(e1 == e2, "identical filters must compare equal (content, not reference)")
    assert(e1.semanticEquals(e2), "semanticEquals must hold for identical probes")
    // defensive copy: mutating the caller's array must not reach the expression
    val mutated = bits.clone()
    val e3 = BloomMightContain(child, new BloomBits(mutated), 2)
    mutated(0) = ~mutated(0)
    assert(e3 == e1, "post-construction mutation of the source array must not leak in")
    // different filter state ⇒ not equal
    val other = Bloom.build(Seq("c", "d").toDF("k"), mBits = 64 * 4, numHashes = 2)
    assert(e1 != BloomMightContain(child, new BloomBits(other), 2))
  }
}
