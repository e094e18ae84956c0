package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags exactly the docs sharing a k-gram with eval") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta suffix"), // contains the 6-gram
      (2L, "alpha beta gamma delta epsilon"),                          // only 5 shared tokens
      (3L, "completely unrelated text with other words here"),
    ).toDF("doc_id", "text")
    val hits = Curation.contaminated(train, eval, k = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(1L))
    assert(hits(1L) == 1L) // one distinct shared 6-gram
    // the clean split: anti-join removes exactly the flagged docs
    val clean = train.join(Curation.contaminated(train, eval, k = 6),
      Seq("doc_id"), "left_anti").select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L))
  }

  test("eval gram set is broadcast (training text never shuffles for the match)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = Curation.contaminated(
        docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast match:\n$plan")
  }

  test("per-key k-sample: exact size per key, deterministic, custom-plan") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val sample = Curation.sampleKPerKey(docs, Seq("lang"), k = 3)
    val sizes = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val available = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    available.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(3L, n), s"$lang: ${sizes.get(lang)} of $n")
    }
    val ids = sample.select("doc_id").as[Long].collect().toSet
    assert(Curation.sampleKPerKey(docs.repartition(5), Seq("lang"), k = 3)
      .select("doc_id").as[Long].collect().toSet == ids,
      "hash-ranked sample must be partition-invariant")
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"must run through the custom plan:\n$plan")
    assert(!plan.contains("Window"), "no row_number fallback")
  }

  test("data mixing: output proportions track targets, binding source kept whole") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val targets = Map("en" -> 0.6, "fr" -> 0.25, "zh" -> 0.15)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val thresholds = Curation.mixToProportionsThresholds(counts, targets)
    // the binding source (min n/p) is kept whole
    val binding = targets.keys.minBy(s => counts(s) / targets(s))
    assert(thresholds(binding) == 1000000, s"binding source $binding must keep all rows")
    val mixed = Curation.mixToProportions(docs, "lang", targets)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // untargeted sources dropped entirely
    assert(!mixed.contains("de") && !mixed.contains("es"))
    // realized mix within hash-sampling noise of the target proportions
    val total = mixed.values.sum.toDouble
    targets.foreach { case (lang, p) =>
      val got = mixed.getOrElse(lang, 0L) / total
      assert(math.abs(got - p) < 0.12, s"$lang: got $got want $p")
    }
  }

  test("data mixing: no targeted source present yields an empty mix, not a crash") {
    assert(Curation.mixToProportionsThresholds(
      Map("de" -> 100L, "es" -> 50L), Map("en" -> 0.6, "fr" -> 0.4))
      == Map("en" -> 0, "fr" -> 0))
    val onlyDe = Seq((1L, "de"), (2L, "de")).toDF("doc_id", "lang")
    assert(Curation.mixToProportions(onlyDe, "lang", Map("en" -> 1.0)).isEmpty)
    // the materialized (localCheckpoint) lane must hit the same empty case
    assert(Curation.mixToProportions(onlyDe, "lang", Map("en" -> 1.0),
      materialize = true).isEmpty)
  }

  test("data mixing: materialize=true selects the identical row set") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val targets = Map("en" -> 0.6, "fr" -> 0.25, "zh" -> 0.15)
    def ids(materialize: Boolean) =
      Curation.mixToProportions(docs, "lang", targets, materialize = materialize)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(materialize = true) == ids(materialize = false),
      "localCheckpoint materialization must not change the sample")
  }

  test("stratified sample: deterministic, label-thresholded, exact-mirrorable") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val thresholds = Map("en" -> 200000, "fr" -> 500000)
    def run() = Curation.stratifiedSample(docs, "lang", thresholds, 800000)
      .select("doc_id").as[Long].collect().toSet
    val s1 = run()
    assert(run() == s1, "hash-keyed sample must be identical across runs")
    // repartitioning must not change membership (unlike sample())
    val s2 = Curation.stratifiedSample(docs.repartition(7), "lang", thresholds, 800000)
      .select("doc_id").as[Long].collect().toSet
    assert(s2 == s1)
    // per-label keep rates approximate the thresholds (md5 is uniform)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curation.stratifiedSample(docs, "lang", thresholds, 800000)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    total.foreach { case (lang, n) =>
      val want = thresholds.getOrElse(lang, 800000) / 1000000.0
      val got = kept.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(got - want) < 0.25, s"$lang keep rate $got vs $want (n=$n)")
    }
  }

  test("split assignment is total, disjoint by construction, and growth-stable") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val assigned = Curation.assignSplits(docs)
    assert(assigned.count() == docs.count())
    val bySplit = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val n = docs.count().toDouble
    assert(math.abs(bySplit.getOrElse("train", 0L) / n - 0.8) < 0.15)
    // growth stability: restricting the corpus never reassigns a doc
    val small = Curation.assignSplits(docs.filter($"doc_id" < 100))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = assigned.select("doc_id", "split").as[(Long, String)].collect().toMap
    small.foreach { case (id, s) => assert(full(id) == s, s"doc $id reassigned") }
  }

  test("split bands must cover the full hash range") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    intercept[IllegalArgumentException](
      Curation.assignSplits(docs, bands = Seq("train" -> 800000, "val" -> 900000)))
  }
}
