package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positive-path tests for the dedup stack on crafted near/exact dups
  * (the synthetic corpus has none at default thresholds). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
  private val nearDup = base.replace("lazy", "sleepy") // 1-token edit
  private val unrelated = "completely different words about database engines and spark query planning with columns"

  private def docs = Seq(
    (0L, base), (1L, base.toUpperCase), (2L, "  " + base + "  "),
    (3L, nearDup), (4L, unrelated),
  ).toDF("doc_id", "text")

  test("exact dedup: case/whitespace-normalized fingerprint groups") {
    val r = Dedup.exactDuplicates(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(r(0) == (0L, false)) // canonical
    assert(r(1) == (0L, true))  // case-normalized dup
    assert(r(2) == (0L, true))  // whitespace-normalized dup
    assert(r(3) == (3L, false))
    assert(r(4) == (4L, false))
  }

  test("minhash LSH finds the near-dup pair and not the unrelated one") {
    val pairs = Dedup.nearDuplicatePairs(docs, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)), s"expected near-dup pair, got $pairs")
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated doc must not pair")
  }

  test("shingles: k-grams in order; short docs yield empty") {
    val r = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq())
  }

  test("simhash: near-dups are close in Hamming distance, unrelated far") {
    val sigs = docs
      .select(col("doc_id"), SimHash64(TextAnalysis.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(3)) <= 12, s"near-dup hamming ${ham(sigs(0), sigs(3))}")
    assert(ham(sigs(0), sigs(4)) > 12, s"unrelated hamming ${ham(sigs(0), sigs(4))}")
    assert(sigs(0) == sigs(2), "whitespace-only difference: identical tokens → identical simhash")
  }

  test("simhash expression works inside whole-stage codegen plans") {
    val n = docs.withColumn("sig", SimHash64(TextAnalysis.tokens(col("text"))))
      .filter(col("sig") =!= 0L).count()
    assert(n == 5)
  }

  test("ngram jaccard: 1 for identical, 0 for disjoint, monotone") {
    val r = Seq(
      (base, base),
      (base, nearDup),
      (base, unrelated),
      ("xyz", "abc"),
    ).toDF("a", "b")
      .select(Dedup.ngramJaccard(col("a"), col("b")).as("j"))
      .collect().map(_.getDouble(0))
    assert(r(0) == 1.0)
    assert(r(1) > 0.7 && r(1) < 1.0)
    assert(r(3) == 0.0)
    assert(r(2) < r(1))
  }

  test("degenerate corpus: 10k identical-signature docs star-pair, no quadratic blowup") {
    // All 10k docs share every band key -> one hot bucket per band.
    // Uncapped, this would expand ~50M pairs inside one task; capped,
    // it degrades to star pairing: n-1 pairs, all through the min id,
    // one connected component — same dedup grouping as brute force.
    val n = 10000
    val hot = spark.range(n).select(col("id").as("doc_id"), lit(base).as("text"))
    val pairs = Dedup.nearDuplicatePairs(hot, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == n - 1, s"expected star pairing, got ${pairs.length} pairs")
    assert(pairs.forall(_._1 == 0L), "every member must connect to the canonical id")
    assert(pairs.map(_._2).toSet == (1L until n).toSet)

    val sim = Dedup.simhashNearDupPairs(hot, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sim.length == n - 1, s"expected star pairing, got ${sim.length} pairs")
    assert(sim.forall(_._1 == 0L))
  }

  test("salted sub-buckets recover member-member pairs star mode loses") {
    // 600 identical docs: signatures collide into one hot bucket per
    // band. Star mode only lists (min, member); salted mode adds full
    // pairings inside each hash-salted sub-bucket at bounded cost.
    val n = 600
    val hot = spark.range(n).select(col("id").as("doc_id"), lit(base).as("text"))
    val star = Dedup.nearDuplicatePairs(hot, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Dedup.nearDuplicatePairs(hot, minJaccard = 0.5, saltOversized = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star.subsetOf(salted), "salted coverage must be a strict superset of star")
    assert(salted.size > star.size, "salting must add member-member pairs")
    val memberPairs = salted.filter { case (a, b) => a != 0L && b != 0L }
    assert(memberPairs.nonEmpty, "expected pairs between non-canonical members")
    // every added pair is verified (identical docs ⇒ jaccard 1.0) and
    // still bounded far below the quadratic listing
    assert(salted.size.toLong < n.toLong * 300, "salted candidates must stay O(n·maxBucket)")
    assert(memberPairs.forall { case (a, b) => a < b })
  }

  test("simhash salted sub-buckets are a strict superset of star mode") {
    // identical docs ⇒ identical 64-bit fingerprints ⇒ one hot bucket
    // per band; hamming 0 everywhere so every candidate survives.
    val n = 600
    val hot = spark.range(n).select(col("id").as("doc_id"), lit(base).as("text"))
    val star = Dedup.simhashNearDupPairs(hot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Dedup.simhashNearDupPairs(hot, saltOversized = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star.subsetOf(salted), "salted coverage must include all star pairs")
    assert(salted.size > star.size, "salting must add member-member pairs")
    assert(salted.size.toLong < n.toLong * 300, "candidates must stay O(n·maxBucket)")
    assert(salted.forall { case (a, b) => a < b })
  }

  test("hot bucket does not disturb small-bucket pairs (mixed corpus)") {
    val n = 600 // > maxBucket=256 hot group, plus the crafted near-dups
    val boiler = "standard legal disclaimer text repeated verbatim across every scraped page footer today"
    val hot = spark.range(n)
      .select((col("id") + 100).as("doc_id"), lit(boiler).as("text"))
    val pairs = Dedup.nearDuplicatePairs(docs.union(hot), minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)), s"near-dup pair lost in mixed corpus: $pairs")
    // hot group stays one component through its canonical member
    val hotPairs = pairs.filter { case (a, b) => a >= 100 || b >= 100 }
    assert(hotPairs.forall(_._1 == 100L), s"hot bucket must star-pair: $hotPairs")
    assert(hotPairs.map(_._2) == (101L until 100 + n).toSet)
  }

  test("band bucket stats surface hot bands") {
    val hot = spark.range(500).select(col("id").as("doc_id"), lit(base).as("text"))
    val stats = Dedup.bandBucketStats(hot, threshold = 256).collect()
    assert(stats.nonEmpty && stats.forall(_.getLong(1) == 500L))
    val quiet = Dedup.bandBucketStats(docs, threshold = 256).collect()
    assert(quiet.isEmpty)
  }

  test("signature frame memoizes per (session, dir) and invalidates") {
    val a = Dedup.signaturesFor(spark, sf())
    assert(Dedup.signaturesFor(spark, sf()) eq a, "second call must hit the cache")
    assert(a.storageLevel.useMemory, "cached frame must be persisted")
    // cached path produces the same pairs as the one-shot path
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val direct = Dedup.nearDuplicatePairs(docs, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cached = Dedup.nearDuplicatePairsFromSignatures(
        a, docs, "doc_id", "text", 16, 4, 0.4, 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cached == direct)
    Dedup.invalidateSignatures(spark, sf())
    assert(!(Dedup.signaturesFor(spark, sf()) eq a), "invalidate must evict")
    Dedup.invalidateSignatures(spark, sf())
  }

  test("md5-simhash signature frame memoizes per (session, dir) and invalidates") {
    val a = Dedup.md5SignaturesFor(spark, sf())
    assert(Dedup.md5SignaturesFor(spark, sf()) eq a, "second call must hit the cache")
    assert(a.storageLevel.useMemory, "cached frame must be persisted")
    // cached frame carries the same fingerprints as a direct build
    val direct = Dedup.md5SimHash(spark.read.parquet(s"${sf()}/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cached = a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cached == direct)
    Dedup.invalidateSignatures(spark, sf())
    assert(!(Dedup.md5SignaturesFor(spark, sf()) eq a), "invalidate must evict the md5 tier")
    Dedup.invalidateSignatures(spark, sf())
  }

  test("simhash banded near-dup pairs equal brute-force hamming pairs") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      // add guaranteed near-dups: two exact copies of doc 0's text
      .union(spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") < 2)
        .withColumn("doc_id", col("doc_id") + 10000))
    val got = Dedup.simhashNearDupPairs(docs, maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all pairs with XOR popcount <= 3
    val sigs = docs.select(col("doc_id").as("id"),
      SimHash64(TextAnalysis.tokens(col("text"))).as("sig"))
    val brute = sigs.alias("a").crossJoin(sigs.alias("b"))
      .filter(col("a.id") < col("b.id") &&
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= 3)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"banded=$got brute=$brute")
    assert(got.contains((0L, 10000L)) && got.contains((1L, 10001L)),
      "exact copies must be found (hamming 0)")
  }

  test("md5-simhash 48-bit banding equals brute force; sign ties mirror SQL") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .union(spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") < 2)
        .withColumn("doc_id", col("doc_id") + 10000))
    val sigs = Dedup.md5SimHash(docs)
    // fingerprints fit the declared width and duplicates collide
    val rows = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.values.forall(s => s >= 0 && s < (1L << 48)), "48-bit range")
    assert(rows(0L) == rows(10000L) && rows(1L) == rows(10001L),
      "identical token streams → identical md5-simhash")
    val got = Dedup.simhashNearDupPairsFromSignatures(
        sigs, sigBits = 48, maxHamming = 3, maxBucket = Int.MaxValue)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sigs.alias("a").crossJoin(sigs.alias("b"))
      .filter(col("a.id") < col("b.id") &&
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= 3)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"banded=$got brute=$brute")
    assert(got.contains((0L, 10000L)), "exact copies must be found (hamming 0)")
  }

  test("q44's registered config: capped + salted banding on a hot band matches the model") {
    // the REGISTERED scale-safe q44 configuration (bounded cap, salted
    // degraded mode) against an independent reimplementation of all
    // three candidate lanes — the same model the DuckDB oracle mirrors.
    // Corpus: real docs plus a 40-clone hot group so at least one band
    // bucket far exceeds the cap.
    val (maxHamming, maxBucket, bits) = (3, 16, 48)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .union(spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") === 0)
        .crossJoin(spark.range(40).select((col("id") + 20000).as("nid")))
        .select(col("nid").as("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")))
    val sigFrame = Dedup.md5SimHash(docs)
    val got = Dedup.simhashNearDupPairsFromSignatures(
        sigFrame, sigBits = bits, maxHamming = maxHamming,
        maxBucket = maxBucket, saltOversized = true)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // independent model over the collected signatures
    val sigs = sigFrame.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bandBits = bits / (maxHamming + 1)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def saltOf(id: Long, nSub: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % nSub
    }
    val buckets = sigs.toSeq.flatMap { case (id, sig) =>
      (0 to maxHamming).map { b =>
        ((b, sig & (((1L << bandBits) - 1) << (b * bandBits))), id)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = buckets.values.flatMap { ids =>
      if (ids.size <= maxBucket) ids.combinations(2).map(p => (p(0), p(1))).toSeq
      else {
        val minId = ids.min
        val nSub = (ids.size + maxBucket - 1) / maxBucket
        val star: Seq[(Long, Long)] =
          ids.filter(_ != minId).map(i => (math.min(minId, i), math.max(minId, i)))
        val salted: Seq[(Long, Long)] = ids.groupBy(saltOf(_, nSub)).values.toSeq
          .flatMap(_.sorted.combinations(2).map(p => (p(0), p(1))).toSeq)
        star ++ salted
      }
    }.toSet.filter { p: (Long, Long) => hamming(sigs(p._1), sigs(p._2)) <= maxHamming }
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // the hot group really went through the degraded lanes: clones pair
    // via star edges AND member-member sub-bucket pairs exist
    val clonePairs = got.filter { case (a, b) => a >= 20000 || b >= 20000 }
    assert(clonePairs.nonEmpty, "hot clone group must emit pairs")
    assert(clonePairs.exists { case (a, b) => a >= 20000 && b >= 20000 },
      "salted mode must recover member-member pairs inside the hot bucket")
  }
}
