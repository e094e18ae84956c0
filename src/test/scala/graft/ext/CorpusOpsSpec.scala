package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 corpus-ops tranche: weighted sampling, quota balancing,
  * novelty, incremental dedup, Z-order layout. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- weightedSample -------------------------------------------------

  test("weightedSample: matches brute-force xi top-k, excludes w <= 0, repartition-invariant") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val k = 25
    val got = Curation.weightedSample(docs, "n_chars", k)
      .select("doc_id").as[Long].collect().toSet
    assert(got.size == k)
    // brute force: same md5 bucket and division chain, computed via a
    // full sort instead of TakeOrderedAndProject
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("long"), lit(1000000L))
    val brute = docs.filter(col("n_chars") > 0)
      .withColumn("xi", bucket.cast("double") / lit(1000000.0) / col("n_chars").cast("double"))
      .orderBy(col("xi"), col("doc_id")).limit(k)
      .select("doc_id").as[Long].collect().toSet
    assert(got == brute)
    // stable under repartitioning (per-partition heaps merge to the
    // same global k regardless of layout)
    val reparted = Curation.weightedSample(docs.repartition(17), "n_chars", k)
      .select("doc_id").as[Long].collect().toSet
    assert(reparted == got)
    // zero/negative/null weights can never be sampled
    val weird = Seq((1L, 0L), (2L, -5L), (3L, 10L)).toDF("doc_id", "w")
      .withColumn("w", when(col("doc_id") === 2L, lit(null).cast("long")).otherwise(col("w")))
    val kept = Curation.weightedSample(weird, "w", k = 3).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("weightedSample: heavier rows are sampled more often (PPS direction)") {
    // 200 rows, weight 100 for ids < 20, weight 1 otherwise: the heavy
    // 10% should dominate a k=30 sample (each heavy row's xi is scaled
    // down 100x)
    val df = (0L until 200L).map(i => (i, if (i < 20) 100L else 1L)).toDF("doc_id", "w")
    val heavy = Curation.weightedSample(df, "w", k = 30)
      .filter(col("doc_id") < 20).count()
    assert(heavy >= 15, s"expected heavy rows to dominate, got $heavy/30")
  }

  // --- quotaSample ----------------------------------------------------

  test("quotaSample: largest-remainder quotas, exact sizes, budget >= N degrades to identity") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val budget = 120L
    val out = Curation.quotaSample(docs, "source", budget)
    val sizes = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == budget)
    // recompute Hamilton apportionment locally
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val ideal = counts.map { case (s, n) => s -> budget.toDouble * n / total }
    val base = ideal.map { case (s, v) => s -> math.floor(v).toLong }
    val leftover = budget - base.values.sum
    val ranked = ideal.toSeq
      .map { case (s, v) => (s, v - math.floor(v)) }
      .sortBy { case (s, r) => (-r, s) }
      .map(_._1)
    val quota = base.map { case (s, b) =>
      s -> (b + (if (ranked.indexOf(s) < leftover) 1L else 0L))
    }
    assert(sizes == quota.filter(_._2 > 0))
    // output is the per-source smallest-md5 prefix (same pick rule)
    val firstSource = counts.keys.min
    val expect = docs.filter(col("source") === firstSource)
      .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
      .orderBy("h", "doc_id").limit(quota(firstSource).toInt)
      .select("doc_id").as[Long].collect().toSet
    val got = out.filter(col("source") === firstSource)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect)
    // a budget >= corpus keeps everything
    assert(Curation.quotaSample(docs, "source", 10_000_000L).count() == docs.count())
  }

  // --- crossDocNovelty ------------------------------------------------

  test("crossDocNovelty: unique docs score 1.0, exact copies 0.0, short docs drop out") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),          // 3 distinct 8-grams, unique
      (2L, "a b c d e f g h i j"),          // exact copy of 1 -> both 0.0
      (3L, "p q r s t u v w x y z"),        // unique -> 1.0
      (4L, "too short"),                     // < 8 tokens -> absent
    ).toDF("doc_id", "text")
    val nov = Dedup.crossDocNovelty(docs, k = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(nov.keySet == Set(1L, 2L, 3L))
    assert(nov(1L) == ((3L, 0L, 0.0)))
    assert(nov(2L) == ((3L, 0L, 0.0)))
    assert(nov(3L)._3 == 1.0)
  }

  // --- dedupSegments --------------------------------------------------

  test("dedupSegments: first global occurrence wins, docs rebuild in order, empty docs flagged") {
    val docs = Seq(
      (1L, Seq("aa", "bb", "cc")),
      (2L, Seq("bb", "dd")),       // bb already in doc 1
      (3L, Seq("aa", "bb")),       // everything seen -> empty
    ).toDF("doc_id", "segments")
    val out = Dedup.dedupSegments(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 0L, "aa bb cc")))
    assert(out(2L) == ((1L, 1L, "dd")))
    assert(out(3L) == ((0L, 2L, "")))
    // a segment repeated WITHIN one doc also keeps only its first slot
    val intra = Seq((1L, Seq("xx", "xx", "yy"))).toDF("doc_id", "segments")
    val r = Dedup.dedupSegments(intra).collect().head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) == ((2L, 1L, "xx yy")))
  }

  test("dedupSegments: hot segment in every doc — no window in the plan, election stays exact") {
    // one boilerplate segment repeated in EVERY doc: the old
    // window-on-seg formulation sorts all of its rows in one task; the
    // groupBy(min(struct)) election must map-side combine instead
    val n = 200
    val docs = (0 until n).map { i =>
      (i.toLong, Seq("HOT", s"u$i"))
    }.toDF("doc_id", "segments")
    val out = Dedup.dedupSegments(docs)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "segment election must not use a per-seg window (skew magnet)")
    val got = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) == ((2L, 0L, "HOT u0")))
    (1 until n).foreach { i =>
      assert(got(i.toLong) == ((1L, 1L, s"u$i")))
    }
  }

  test("dedupSegments: property — matches a sequential first-occurrence reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genDoc = Gen.listOfN(6, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.take(6))
    val genCorpus = for {
      n <- Gen.choose(0, 8)
      docs <- Gen.listOfN(n, genDoc)
    } yield docs.zipWithIndex.map { case (segs, i) => (i.toLong, segs) }
    val prop = Prop.forAll(genCorpus) { corpus =>
      // sequential reference: ascending (id, pos), keep first sighting
      val seen = scala.collection.mutable.Set[String]()
      val expect = corpus.sortBy(_._1).map { case (id, segs) =>
        val kept = segs.filter(s => seen.add(s))
        id -> ((kept.size.toLong, (segs.size - kept.size).toLong, kept.mkString(" ")))
      }.toMap
      val got = Dedup.dedupSegments(corpus.toDF("doc_id", "segments")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      // docs with zero segments never explode -> absent from the output
      got == expect.filter { case (id, _) =>
        corpus.find(_._1 == id).exists(_._2.nonEmpty) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.toString)
  }

  // --- incrementalDuplicates ------------------------------------------

  test("incrementalDuplicates: exact beats near, new docs absent, match_id is min") {
    val existing = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"), // same text, higher id
      (12L, "completely different content about distributed query engines"),
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (20L, "the quick brown fox jumps over the lazy dog today"),    // exact (match 10, not 11)
      (21L, "the quick brown fox jumps over the lazy dog yesterday"),// near of 10/11
      (22L, "entirely novel words nowhere else in any corpus at all"),
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDuplicates(existing, incoming, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(20L, 21L))
    assert(out(20L) == (("exact", 10L)))
    assert(out(21L)._1 == "near")
    assert(out(21L)._2 == 10L)
  }

  test("incrementalDuplicates: hot existing band degrades to representative but still detects") {
    // 40 existing docs with identical text -> every band bucket holds
    // all 40, far over maxBucket=8; the incoming copy must still match
    // via the bucket's min-id representative
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val existing = (100L until 140L).map(i => (i, text)).toDF("doc_id", "text")
    val incoming = Seq((1L, text)).toDF("doc_id", "text")
    // drop the exact lane's help: perturb incoming so only near fires
    val nearOnly = Seq((1L, text + " lambda")).toDF("doc_id", "text")
    val exact = Dedup.incrementalDuplicates(existing, incoming, minJaccard = 0.5, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(exact.toSeq == Seq((1L, "exact", 100L)))
    val near = Dedup.incrementalDuplicates(existing, nearOnly, minJaccard = 0.5, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(near.toSeq == Seq((1L, "near", 100L)))
  }

  // --- Layout ---------------------------------------------------------

  test("zValue: interleave round-trips against a bit-loop reference") {
    def refZ(x: Int, y: Int): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1).toLong << (2 * i)
        z |= ((y >> i) & 1).toLong << (2 * i + 1)
      }
      z
    }
    val rng = new scala.util.Random(0xC0FFEE)
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (1023, 511)) ++
      Seq.fill(500)((rng.nextInt(65536), rng.nextInt(65536)))
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == refZ(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("zValue3: 3-D interleave matches a bit-loop reference") {
    def refZ3(x: Long, y: Long, z: Long): Long = {
      var r = 0L
      for (i <- 0 until 21) {
        r |= ((x >> i) & 1) << (3 * i)
        r |= ((y >> i) & 1) << (3 * i + 1)
        r |= ((z >> i) & 1) << (3 * i + 2)
      }
      r
    }
    val rng = new scala.util.Random(0xBEEF)
    val max = (1 << 21) - 1
    val cases = Seq((0L, 0L, 0L), (max.toLong, max.toLong, max.toLong)) ++
      Seq.fill(300)((rng.nextInt(1 << 21).toLong, rng.nextInt(1 << 21).toLong,
        rng.nextInt(1 << 21).toLong))
    val df = cases.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        Layout.zValue3(col("x"), col("y"), col("z")).as("m"))
    df.collect().foreach { r =>
      assert(r.getLong(3) == refZ3(r.getLong(0), r.getLong(1), r.getLong(2)),
        s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})")
    }
  }

  test("incrementalDuplicates: empty sides are empty results, not errors") {
    val docs = Seq((1L, "some words here repeated across the frame")).toDF("doc_id", "text")
    val empty = docs.limit(0)
    assert(Dedup.incrementalDuplicates(docs, empty).count() == 0)
    assert(Dedup.incrementalDuplicates(empty, docs).count() == 0)
    assert(Dedup.incrementalDuplicates(empty, empty).count() == 0)
  }

  // --- ruleSignals ----------------------------------------------------

  test("ruleSignals: signals match a scala reference on real docs") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet").limit(60)
    val got = TextAnalysis.ruleSignals(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val toks = text.trim.split("\\s+")
      val n = toks.length.toLong
      val sumLen = toks.map(_.length.toLong).sum
      // ASCII letter class, matching the implementation AND the oracle
      // ([A-Za-z]) — Char.isLetter would diverge on non-ASCII corpora
      val alpha = toks.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
      val tri = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val dup3 = if (tri.nonEmpty) 1.0 - tri.distinct.size.toDouble / tri.size else 0.0
      val bi = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val topBi = if (bi.nonEmpty)
        bi.groupBy(identity).values.map(_.size).max.toDouble / bi.size else 0.0
      val g = got(id)
      assert(g.getAs[Long]("n_tokens") == n, s"doc $id n_tokens")
      assert(g.getAs[Double]("mean_word_len") == sumLen.toDouble / n, s"doc $id mwl")
      assert(g.getAs[Double]("alpha_ratio") == alpha.toDouble / n, s"doc $id alpha")
      assert(g.getAs[Double]("dup_trigram_frac") == dup3, s"doc $id dup3")
      assert(g.getAs[Double]("top_bigram_frac") == topBi, s"doc $id topbi")
    }
  }

  test("ruleSignals: verdict boundaries — repeated bigram fails, clean doc passes") {
    val clean = (1 to 40).map(i => s"word$i").mkString(" ")   // 40 distinct tokens
    val spam = Seq.fill(30)("buy now").mkString(" ")           // one dominating bigram
    val numbers = (1 to 40).map(_.toString).mkString(" ")      // no letters
    val docs = Seq((1L, clean), (2L, spam), (3L, numbers)).toDF("doc_id", "text")
    val byId = TextAnalysis.ruleSignals(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass")).toMap
    assert(byId(1L), "clean doc must pass")
    assert(!byId(2L), "repeated-bigram spam must fail")
    assert(!byId(3L), "all-numeric doc must fail alpha_ratio")
  }

  // --- relativeRankGate -----------------------------------------------

  test("relativeRankGate: keeps exactly floor(n*num/den) best rows per key") {
    val df = (1 to 37).map(i => (i.toLong, if (i % 3 == 0) "a" else "b", (i * 7 % 31).toDouble))
      .toDF("doc_id", "k", "m")
    val kept = Curation.relativeRankGate(df, "k", "m", keepNum = 2, keepDen = 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    val byKey = df.collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
      .groupBy(_._1)
    byKey.foreach { case (k, rows) =>
      val want = rows.sortBy(r => (-r._3, r._2)).take(rows.length * 2 / 3).map(_._2).toSet
      val got = kept.filter(_._1 == k).map(_._2).toSet
      assert(got == want, s"key $k")
    }
  }

  test("relativeRankGate: keepNum=0 keeps nothing; keepNum=keepDen keeps all") {
    val df = (1 to 10).map(i => (i.toLong, "x", i.toDouble)).toDF("doc_id", "k", "m")
    assert(Curation.relativeRankGate(df, "k", "m", 0, 1).count() == 0)
    assert(Curation.relativeRankGate(df, "k", "m", 1, 1).count() == 10)
    intercept[IllegalArgumentException] {
      Curation.relativeRankGate(df, "k", "m", 3, 2)
    }
  }

  test("relativeRankGate: NULL metrics are excluded, not ranked into kept slots") {
    val df = Seq((1L, "x", Some(3.0)), (2L, "x", Some(2.0)), (3L, "x", Some(1.0)),
        (4L, "x", None))
      .toDF("doc_id", "k", "m")
    // 3 non-null rows, keep 2/3 → exactly docs 1 and 2; the NULL row
    // must neither be kept nor inflate the count to admit doc 3
    val kept = Curation.relativeRankGate(df, "k", "m", 2, 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("relativeRankGate: kept set is bucket-count-invariant and equals the naive window") {
    // deterministic pseudo-random [0,1] metrics incl. exact ties
    val df = (1 to 500).map { i =>
      (i.toLong, s"k${i % 3}", ((i * 2654435761L) % 1000).toDouble / 1000.0)
    }.toDF("doc_id", "k", "m")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k")
    val naive = df.filter(col("m").isNotNull)
      .withColumn("_rn", row_number().over(w.orderBy(col("m").desc, col("doc_id"))))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_rn").cast("long") * 4 <= col("_n") * 3)
      .collect().map(_.getLong(0)).toSet
    for (b <- Seq(1, 7, 1024)) {
      val got = Curation.relativeRankGate(df, "k", "m", 3, 4, buckets = b)
        .collect().map(_.getLong(0)).toSet
      assert(got == naive, s"buckets=$b")
    }
  }

  test("relativeRankGate: verdict cap falls back to the window form, same kept set") {
    val df = (1 to 500).map { i =>
      (i.toLong, s"k${i % 3}", ((i * 2654435761L) % 1000).toDouble / 1000.0)
    }.toDF("doc_id", "k", "m")
    val bucketed = Curation.relativeRankGate(df, "k", "m", 3, 4)
      .collect().map(_.getLong(0)).toSet
    // a cap below the verdict size must route to the per-key window
    // fallback instead of collecting, with an identical kept set
    val fallback = Curation.relativeRankGate(df, "k", "m", 3, 4, maxVerdictRows = 2)
      .collect().map(_.getLong(0)).toSet
    assert(fallback == bucketed)
  }

  test("relativeRankGate: NaN metrics and NULL keys are excluded, not ranked") {
    // NaN would sort ABOVE every real value in Spark's window order
    // but quantize into the WORST bucket — neither placement is a
    // contract; it is excluded like NULL. NULL keys likewise (the
    // quotaSample family rule).
    val df = Seq(
      (1L, "x", 0.9), (2L, "x", 0.5), (3L, "x", Double.NaN),
      (4L, null.asInstanceOf[String], 0.99))
      .toDF("doc_id", "k", "m")
    // 2 rankable rows in key x, keep 1/2 → exactly doc 1; the NaN row
    // must neither occupy the kept slot nor inflate the count
    val kept = Curation.relativeRankGate(df, "k", "m", 1, 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("relativeRankGate: threshold exactly at a bucket edge — no boundary bucket exists") {
    // 8 rows, one per bucket (m = i/8, buckets = 8); keep 1/2 → the
    // kept count (4) lands exactly on a bucket boundary, so every
    // bucket is wholly in or wholly out and the boundary lane is empty
    val df = (0 until 8).map(i => (i.toLong, "x", i.toDouble / 8.0))
      .toDF("doc_id", "k", "m")
    val kept = Curation.relativeRankGate(df, "k", "m", 1, 2, buckets = 8)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L, 5L, 6L, 7L)) // top half by metric desc
  }

  test("relativeRankGate: ascending order elects from the LOW-metric end") {
    // keep the 25% shortest-metric rows per key, bucketed — the
    // ascending path flips both the bucket ordering and the
    // within-bucket ordering; verify against the naive ascending window
    val df = (1 to 200).map { i =>
      (i.toLong, s"k${i % 2}", ((i * 2654435761L) % 97).toDouble / 97.0)
    }.toDF("doc_id", "k", "m")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k")
    val naive = df
      .withColumn("_rn", row_number().over(w.orderBy(col("m").asc, col("doc_id"))))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_rn").cast("long") * 4 <= col("_n") * 1)
      .collect().map(_.getLong(0)).toSet
    for (b <- Seq(1, 16)) {
      val got = Curation.relativeRankGate(df, "k", "m", 1, 4,
        descending = false, buckets = b)
        .collect().map(_.getLong(0)).toSet
      assert(got == naive, s"buckets=$b")
    }
  }

  test("relativeRankGate: dominant key never sorts whole-key — only a boundary bucket windows") {
    // one key holds everything: the old shape was a single-task sort
    // of the full frame; the election shape must window at most ONE
    // bucket's rows, partitioned by (key, bucket). Keep 1/3 of 400
    // (not 1/2): rank 133 falls strictly INSIDE a 4-row bucket, so a
    // boundary bucket exists and the window lane is in the plan — at
    // an exact bucket-edge threshold the driver-known verdict lets
    // Catalyst eliminate the empty boundary lane altogether (covered
    // by the bucket-edge spec above)
    val df = (1 to 400).map(i => (i.toLong, "hot", (i % 100).toDouble / 100.0))
      .toDF("doc_id", "k", "m")
    val gated = Curation.relativeRankGate(df, "k", "m", 1, 3, buckets = 100)
    val plan = gated.queryExecution.executedPlan.toString
    // every Window in the physical plan must partition by BOTH key and
    // bucket — a Window on the bare key would be the whole-key sort
    val windowSpecs = plan.split("\n").filter(_.contains("Window"))
      .filter(_.contains("row_number"))
    assert(windowSpecs.nonEmpty)
    assert(windowSpecs.forall(_.contains("_rg_bkt")),
      s"row_number window not bucket-partitioned:\n$plan")
    assert(gated.count() == 133) // floor(400/3)
  }

  test("quotaSample: survives thousands of distinct keys (no per-key expression chain)") {
    // 4000 keys × 2 rows; budget 4000 → quota 1 each. A CASE-chain
    // formulation nests 4000 deep and stack-overflows in Catalyst.
    val df = (1 to 8000).map(i => (i.toLong, s"k${i % 4000}")).toDF("doc_id", "source")
    val got = Curation.quotaSample(df, "source", budget = 4000)
    assert(got.count() == 4000)
  }

  test("quotaSample: NULL-key rows are excluded from both seats and output") {
    val df = ((1 to 40).map(i => (i.toLong, Some(if (i % 2 == 0) "a" else "b"))) ++
        (41 to 60).map(i => (i.toLong, Option.empty[String])))
      .toDF("doc_id", "source")
    val got = Curation.quotaSample(df, "source", budget = 10)
    assert(got.count() == 10, "the full budget lands on non-NULL keys")
    assert(got.filter(col("source").isNull).count() == 0)
  }

  // --- chunkTokens ----------------------------------------------------

  test("chunkTokens: covers every token, boundaries match the reference slicer") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet").limit(50)
    val (w, s) = (16, 10)
    val got = Packing.chunkTokens(docs, window = w, stride = s)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    docs.select("doc_id", "text").collect().foreach { r =>
      val (id, toks) = (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq)
      // reference: windows at offsets 0, s, 2s, ...; 1 + ceil(max(0, n-w)/s)
      val nWin = 1 + (toks.length - w + s - 1).max(0) / s
      val want = (0 until nWin).map { i =>
        val c = toks.slice(i * s, i * s + w)
        (i.toLong, c.length.toLong, c.mkString(" "))
      }
      val g = got(id).map(x => (x.getAs[Long]("chunk_id"),
        x.getAs[Long]("n_chunk_tokens"), x.getAs[String]("chunk_text"))).sortBy(_._1).toSeq
      assert(g == want, s"doc $id")
      // coverage: last chunk reaches the end
      assert((nWin - 1) * s + g.last._2 == toks.length, s"doc $id coverage")
    }
  }

  test("chunkTokens: stride == window produces disjoint exact partition") {
    val docs = Seq((1L, (1 to 100).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    val rows = Packing.chunkTokens(docs, window = 8, stride = 8)
      .orderBy("chunk_id").collect()
    assert(rows.length == 13)  // 12 full + 1 of 4 tokens
    assert(rows.map(_.getAs[Long]("n_chunk_tokens")).sum == 100)
    val rebuilt = rows.map(_.getAs[String]("chunk_text")).mkString(" ")
    assert(rebuilt == (1 to 100).map("t" + _).mkString(" "))
    intercept[IllegalArgumentException] {
      Packing.chunkTokens(docs, window = 8, stride = 9)
    }
  }

  test("chunkTokens: a blank document yields ZERO chunks, not a phantom empty one") {
    // split-on-whitespace tokenization yields [""] for blank text —
    // without the blank guard every whitespace-only doc emitted a
    // (chunk_id=0, n=1, "") garbage training chunk
    val docs = Seq((1L, "   "), (2L, ""), (3L, "one two three"))
      .toDF("doc_id", "text")
    val got = Packing.chunkTokens(docs, window = 2, stride = 2)
      .orderBy("doc_id", "chunk_id").collect()
    assert(got.forall(_.getLong(0) == 3L), s"blank docs chunked: ${got.toSeq}")
    assert(got.map(_.getAs[String]("chunk_text")).toSeq == Seq("one two", "three"))
  }

  // --- budgetSelect ---------------------------------------------------

  test("budgetSelect: NaN metrics are excluded (they would corrupt the greedy order)") {
    val df = Seq((1L, 0.9, 5L), (2L, Double.NaN, 1L), (3L, 0.5, 5L))
      .toDF("doc_id", "m", "c")
    val got = Curation.budgetSelect(df, "m", "c", budget = 10L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L), s"NaN row must not select or displace: $got")
  }

  test("budgetSelect: equals the sequential greedy prefix, invariant to bucket count") {
    val rng = new scala.util.Random(0xB06E7)
    val rows = (1L to 400L).map(i =>
      (i, rng.nextInt(1000) / 1000.0, (1 + rng.nextInt(50)).toLong))
    val df = rows.toDF("doc_id", "m", "c")
    val budget = 3000L
    // sequential reference: sort by (m desc, id), take while cum <= budget
    var acc = 0L
    val want = rows.sortBy(r => (-r._2, r._1)).iterator.map { case (id, _, c) =>
      acc += c; (id, acc)
    }.takeWhile(_._2 <= budget).toSeq
    for (buckets <- Seq(1, 7, 1024)) {
      val got = Curation.budgetSelect(df, "m", "c", budget, buckets = buckets)
        .select("doc_id", "cum_cost").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("budgetSelect: zero budget keeps nothing; huge budget keeps everything") {
    val df = Seq((1L, 0.5, 10L), (2L, 0.9, 5L)).toDF("doc_id", "m", "c")
    assert(Curation.budgetSelect(df, "m", "c", 0L).count() == 0)
    val all = Curation.budgetSelect(df, "m", "c", 1000L)
      .orderBy("cum_cost").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(all.toSeq == Seq((2L, 5L), (1L, 15L)))  // best-first running totals
    // null metric rows are excluded, not sorted engine-arbitrarily
    val withNull = Seq((1L, Some(0.5), 10L), (2L, None, 5L))
      .toDF("doc_id", "m", "c")
    assert(Curation.budgetSelect(withNull, "m", "c", 1000L).count() == 1)
  }

  // --- lengthBatches ---------------------------------------------------

  test("lengthBatches: batches are bucket-homogeneous, full except the last, invariant") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val got = Packing.lengthBatches(docs, bucketWidth = 16, batchSize = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("bucket"), r.getAs[Long]("batch")))
    got.foreach { case (_, n, b, _) => assert(b == n / 16) }
    got.groupBy(x => (x._3, x._4)).foreach { case ((b, batch), members) =>
      assert(members.length <= 8, s"batch ($b, $batch) over size")
      // only the highest-numbered batch in a bucket may be short
      val maxBatch = got.filter(_._3 == b).map(_._4).max
      if (batch < maxBatch) assert(members.length == 8, s"non-final batch ($b, $batch) short")
    }
    val rep = Packing.lengthBatches(docs.repartition(11), bucketWidth = 16, batchSize = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("batch")).toMap
    assert(rep == got.map(x => x._1 -> x._4).toMap, "repartition-invariant")
  }

  // --- sourceOverlap ---------------------------------------------------

  test("sourceOverlap: containment 1.0 for a subset source, disjoint pairs absent") {
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ")   // 13 8-grams
    val docs = Seq(
      (1L, "a", shared + " extra words beyond the shared span here now"),
      (2L, "b", shared),                                     // b ⊂ a
      (3L, "c", (100 to 120).map(i => s"other$i").mkString(" "))  // disjoint
    ).toDF("doc_id", "source", "text")
    val rows = Dedup.sourceOverlap(docs, k = 8).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("containment"))).toMap
    assert(rows.keySet == Set(("a", "b")), "only the overlapping pair appears")
    val (nShared, containment) = rows(("a", "b"))
    assert(nShared == 13L)       // b's 20 tokens -> 13 distinct 8-grams, all in a
    assert(containment == 1.0, "subset source has full containment")
  }

  // --- dedupSegmentsWithin ---------------------------------------------

  test("dedupSegmentsWithin: drops only intra-doc repeats; cross-doc repeats survive") {
    val docs = Seq(
      (1L, Seq("a b", "c d", "a b", "e f")),   // "a b" repeated inside doc 1
      (2L, Seq("a b", "g h"))                  // "a b" also in doc 2 — survives
    ).toDF("doc_id", "segments")
    val got = Dedup.dedupSegmentsWithin(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((3L, 1L, "a b c d e f")))
    assert(got(2L) == ((2L, 0L, "a b g h")))
    // empty segment arrays still yield a row (pure projection, no explode)
    val withEmpty = Seq((9L, Seq.empty[String])).toDF("doc_id", "segments")
    val e = Dedup.dedupSegmentsWithin(withEmpty).collect().head
    assert(e.getLong(1) == 0L && e.getLong(2) == 0L && e.getString(3) == "")
  }

  // --- keepClusterCanonicalBy -----------------------------------------

  test("keepClusterCanonicalBy: keeps highest-priority member per component, singletons survive") {
    // components: {1,2,3} (chain), {10,11}; singletons 20, 21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 7L),    // best = 2 (len 9)
      (10L, 4L), (11L, 4L),            // tie -> min id 10
      (20L, 1L), (21L, 2L)             // singletons
    ).toDF("doc_id", "n_chars")
    val kept = Dedup.keepClusterCanonicalBy(docs, pairs, "n_chars")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(kept.keySet == Set(2L, 10L, 20L, 21L))
    assert(kept(2L) == 1L)    // cluster label = component min id
    assert(kept(10L) == 10L)
    assert(kept(20L) == 20L && kept(21L) == 21L)
  }

  test("zOrderBy: partitions own contiguous z ranges (layout clusters both dims)") {
    val df = (0 until 4096).map(i => (i % 64, i / 64)).toDF("x", "y")
    val parts = Layout.zOrderBy(df, col("x"), col("y"), numPartitions = 8)
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // ranges must not overlap: each partition is one curve segment
    parts.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: ${parts.toSeq}")
      case _ =>
    }
  }

  // --- Vocab (frozen-vocabulary tokenization) -------------------------

  test("Vocab.buildVocab: rank-deterministic ids (count desc, token asc), size-bounded") {
    val docs = Seq("b b b a a c", "a c c d").toDF("text")
    // counts: a=3 b=3 c=3 d=1 -> ties by token asc: a=0, b=1, c=2
    val v = Vocab.buildVocab(docs, col("text"), size = 3)
    assert(v === Seq("a" -> 0, "b" -> 1, "c" -> 2))
    assert(Vocab.buildVocab(docs, col("text"), size = 100).toMap
      === Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3),
      "size past the vocabulary must not invent entries")
  }

  test("Vocab OOV policies: Unk substitutes, Drop removes, Fail raises naming the token") {
    val vocab = Map("the" -> 0, "cat" -> 1, "sat" -> 2)
    val df = Seq(
      (1L, Seq("the", "cat", "sat")),
      (2L, Seq("the", "dog", "sat")),
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
    def ids(policy: Vocab.OovPolicy): Map[Long, Seq[Int]] =
      df.select(col("id"), Vocab.applyIds(col("toks"), vocab, policy).as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val unk = ids(Vocab.Unk(-1))
    assert(unk(1L) === Seq(0, 1, 2))
    assert(unk(2L) === Seq(0, -1, 2), "OOV must map to the unk id IN PLACE")
    assert(unk(3L) === Seq.empty)
    val drop = ids(Vocab.Drop)
    assert(drop(2L) === Seq(0, 2), "Drop must remove OOV tokens, preserving order")
    assert(drop(1L) === Seq(0, 1, 2))
    // Fail: in-vocab rows pass, an OOV row raises naming the token
    val ok = df.filter(col("id") === 1L)
      .select(Vocab.applyIds(col("toks"), vocab, Vocab.Fail).as("ids"))
      .collect().head.getSeq[Int](0)
    assert(ok === Seq(0, 1, 2))
    val e = intercept[Exception] {
      df.select(Vocab.applyIds(col("toks"), vocab, Vocab.Fail)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dog")),
      s"Fail must name the offending token: ${messages(e)}")
  }

  test("Vocab.applyIds refuses a colliding unk id and an empty vocab") {
    val df = Seq(Seq("a")).toDF("toks")
    intercept[IllegalArgumentException] {
      Vocab.applyIds(col("toks"), Map("a" -> 0), Vocab.Unk(0))
    }
    intercept[IllegalArgumentException] {
      Vocab.applyIds(col("toks"), Map.empty, Vocab.Drop)
    }
  }

  test("Vocab engine path == relational replay (explode + join + re-collect) on the corpus") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val out = Vocab.tokenizeWithVocab(spark, docs, "text", 30, Vocab.Unk(-1))
      .select(col("doc_id"), col("token_ids"))
    // relational replay: posexplode -> broadcast-join the vocab frame
    // -> re-collect ordered by position (the q184 oracle's shape)
    val vocabDf = Vocab.buildVocab(docs, col("text"), 30)
      .toDF("token", "tid")
    val replay = docs
      .select(col("doc_id"),
        posexplode_outer(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
      .join(broadcast(vocabDf), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(expr("sort_array(collect_list(struct(pos, coalesce(tid, -1) AS t)))")
        .as("ps"))
      .select(col("doc_id"), expr("transform(ps, x -> x.t)").as("token_ids"))
    assert(out.exceptAll(replay).isEmpty && replay.exceptAll(out).isEmpty,
      "map-literal path and join replay must agree row for row")
    // the corpus really exercises OOV (31 distinct tokens, vocab 30)
    assert(out.filter(array_contains(col("token_ids"), -1)).count() > 0)
  }

  test("Vocab.freeze/loadAsOf: token ids PINNED across a corpus append; " +
      "oovRate surfaces the drift") {
    graft.QueryUtil.inTempDir("graft_vocab_frozen") { tmp =>
      val asset = s"$tmp/vocab"
      val corpusA = Seq("the cat sat", "the cat ran", "the end").toDF("text")
      // ids at freeze time: the=0 cat=1, then ties by token asc
      val v1 = Vocab.freeze(spark, corpusA, col("text"), vocabSize = 10, asset)
      assert(v1 === 1L)
      val frozen = Vocab.loadAsOf(spark, asset, Some(v1))
      assert(frozen === Map("the" -> 0, "cat" -> 1, "end" -> 2, "ran" -> 3, "sat" -> 4))
      // the corpus grows with a token that OUTRANKS everything — a
      // naive rebuild would renumber the world
      val corpusB = corpusA
        .union(Seq("zebra zebra zebra zebra zebra quokka").toDF("text"))
      val v2 = Vocab.freeze(spark, corpusB, col("text"), vocabSize = 10, asset)
      assert(v2 === 2L)
      // the re-frozen head DOES renumber (that's what freezing is for)…
      val head = Vocab.loadAsOf(spark, asset, None)
      assert(head("zebra") === 0 && head("the") === 1)
      // …while AS OF v1 every original id is bit-identical forever
      assert(Vocab.loadAsOf(spark, asset, Some(1L)) === frozen)
      // tokenizing the APPENDED corpus AS OF v1: old docs keep their
      // exact ids; the new surface shows up as OOV, never as a renumber
      val ids = Vocab.tokenizeWithFrozenVocab(
          spark, corpusB, "text", asset, Some(1L), Vocab.Unk(-1))
        .select(col("text"), col("token_ids")).collect()
        .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
      assert(ids("the cat sat") === Seq(0, 1, 4))
      assert(ids("zebra zebra zebra zebra zebra quokka") === Seq.fill(6)(-1))
      // the drift metric: 0.0 on covered docs, 1.0 on the new surface
      val rates = corpusB
        .select(col("text"),
          Vocab.oovRate(TextAnalysis.tokens(col("text")), frozen).as("r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(rates("the cat sat") === 0.0)
      assert(rates("zebra zebra zebra zebra zebra quokka") === 1.0)
    }
  }

  test("Vocab.loadAsOf refuses a corrupt asset (duplicate tokens or ids)") {
    graft.QueryUtil.inTempDir("graft_vocab_corrupt") { tmp =>
      val dupTok = s"$tmp/dup_tok"
      TxTable.commitReplace(spark, dupTok,
        Seq(("a", 0), ("a", 1)).toDF("token", "id"))
      intercept[IllegalArgumentException](Vocab.loadAsOf(spark, dupTok))
      val dupId = s"$tmp/dup_id"
      TxTable.commitReplace(spark, dupId,
        Seq(("a", 0), ("b", 0)).toDF("token", "id"))
      intercept[IllegalArgumentException](Vocab.loadAsOf(spark, dupId))
    }
  }
}
