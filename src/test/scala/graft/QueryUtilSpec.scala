package graft

import org.apache.spark.sql.functions._

class QueryUtilSpec extends SparkSpec {

  test("localized round-trips a bounded frame, order and schema intact") {
    val df = spark.range(10).select(col("id"), (col("id") * 2).as("v"))
      .orderBy(desc("id"))
    val local = QueryUtil.localized(df)
    assert(local.schema === df.schema)
    assert(local.collect().map(_.getLong(0)).toSeq === (9L to 0L by -1L))
  }

  test("localized fails loud past maxRows instead of collecting the frame") {
    val big = spark.range(100).toDF("id")
    val e = intercept[IllegalStateException] {
      QueryUtil.localized(big, maxRows = 50)
    }
    assert(e.getMessage.contains("maxRows=50"))
    // explicit raise of the bound is the documented escape hatch
    assert(QueryUtil.localized(big, maxRows = 100).count() === 100)
  }

  test("Bench.median: odd takes the middle, even AVERAGES the middle pair") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    // even n must not return the upper-middle (the r14 ADVICE bias:
    // with 2 surviving repeat samples, upper-middle = MAX)
    assert(Bench.median(Seq(4.0, 2.0)) === 3.0)
    assert(Bench.median(Seq(1.0, 2.0, 3.0, 10.0)) === 2.5)
    assert(Bench.median(Seq(7.5)) === 7.5)
  }

  test("Bench.codeIdentOf: fp records match on fp, legacy same-sha " +
      "records adopt the run's fingerprint, other legacy records keep " +
      "their sha (never match a fingerprint)") {
    // fp-carrying record: its own fp, whatever the shas say
    assert(Bench.codeIdentOf("a", Some("fp1"), "z", "fpZ") === "fp1")
    // legacy record at the SAME sha: same code by construction
    assert(Bench.codeIdentOf("z", None, "z", "fpZ") === "fpZ")
    // legacy record at another sha: keeps its sha
    assert(Bench.codeIdentOf("a", None, "z", "fpZ") === "a")
    // unknown shas never alias each other into one identity
    assert(Bench.codeIdentOf("unknown", None, "unknown", "fpZ") === "unknown")
  }

  test("Bench.codeFingerprint: invariant under non-code changes (the " +
      "metadata-commit shape that orphaned r18's closing samples), " +
      "moves with src content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp")
    try {
      java.nio.file.Files.createDirectories(dir.resolve("src/main"))
      java.nio.file.Files.writeString(dir.resolve("src/main/A.scala"), "object A")
      java.nio.file.Files.writeString(dir.resolve("build.sbt"), "name := \"x\"")
      val fp1 = Bench.codeFingerprint(dir)
      assert(fp1 !== "unknown")
      // a docs-only change leaves the code identity alone
      java.nio.file.Files.writeString(dir.resolve("NOTES.md"), "docs only")
      assert(Bench.codeFingerprint(dir) === fp1)
      // a source change moves it
      java.nio.file.Files.writeString(
        dir.resolve("src/main/A.scala"), "object A { val x = 1 }")
      assert(Bench.codeFingerprint(dir) !== fp1)
    } finally graft.Fs.deleteTree(dir)
  }

  test("Bench.headlineOf: ≥2 closing-sha samples take the headline, HEAD regression unmasked") {
    val priors = Seq("a" -> 200.0, "b" -> 198.0, "c" -> 202.0, "d" -> 199.0)
    // lone HEAD sample: cross-sha median de-noises (the r15 behavior)…
    val (v1, c1) = Bench.headlineOf(priors, "e", Seq(273.0), anyFailed = false)
    assert(v1 === 200.0)
    // …but HEAD's own figure rides alongside, never hidden
    assert(c1 === 273.0)
    // confirm pass agreed it's slow: 2 HEAD samples OUTVOTE history —
    // a regression at the closing commit owns the headline
    val (v2, c2) = Bench.headlineOf(priors, "e", Seq(273.0, 270.0), anyFailed = false)
    assert(v2 === 271.5 && c2 === 271.5)
    // confirm pass read fast: the spike is visible but averaged down
    val (v3, _) = Bench.headlineOf(priors, "e", Seq(273.0, 201.0), anyFailed = false)
    assert(v3 === 237.0)
    // prior runs AT the closing sha count as closing-sha samples too
    val (v4, _) = Bench.headlineOf(
      Seq("a" -> 200.0, "e" -> 230.0), "e", Seq(232.0), anyFailed = false)
    assert(v4 === 231.0)
  }

  test("Bench.headlineOf: a run with failures reports its own total, no median") {
    // ADVICE low #1: a failed run's deflated total must not vote into
    // (or borrow from) the cross-run median
    val priors = Seq("a" -> 200.0, "b" -> 198.0)
    val (v, _) = Bench.headlineOf(priors, "e", Seq(120.0), anyFailed = true)
    assert(v === 120.0)
  }

  test("Bench.confirmNeeded: fires only for a lone >20% outlier above prior history") {
    val priors = Seq("a" -> 200.0, "b" -> 198.0, "c" -> 202.0)
    assert(Bench.confirmNeeded(priors, "e", 273.0))
    assert(!Bench.confirmNeeded(priors, "e", 212.0)) // within 20%
    assert(!Bench.confirmNeeded(Seq.empty, "e", 273.0)) // no history
    // a prior run at the SAME sha already breaks the tie — no re-run
    assert(!Bench.confirmNeeded(priors :+ ("e" -> 205.0), "e", 273.0))
    // a FAST outlier is not confirmed: it can only deflate the median
    // it participates in, and the per-entry spreads expose it
    assert(!Bench.confirmNeeded(priors, "e", 150.0))
  }

  test("Bench.spreadOf: the spread gate's criterion — a wide same-sha pair " +
      "reads as its max/min ratio, fewer than two samples as 1.0") {
    assert(Bench.spreadOf(Seq.empty) === 1.0)
    assert(Bench.spreadOf(Seq(252.2)) === 1.0)
    // the r17 closing pair: 413.7/252.2 spans 1.64× — the gate fires
    assert(Bench.spreadOf(Seq(413.7, 252.2)) > 1.3)
    // a tight pair passes
    assert(Bench.spreadOf(Seq(260.0, 252.2)) < 1.3)
    // order-free
    assert(Bench.spreadOf(Seq(252.2, 413.7)) === Bench.spreadOf(Seq(413.7, 252.2)))
  }

  test("streaming lane re-runs need a FRESH checkpoint namespace under the " +
      "session default location — the silently-discarded confirm pass") {
    // Bench sets spark.sql.streaming.checkpointLocation once per JVM,
    // which makes every default-location streaming lane derive a
    // DETERMINISTIC per-queryName dir — a second run in the same
    // namespace tries to RESUME the first run's offset log, and
    // stream-stream interval joins refuse recovery. This is exactly
    // how the first real outlier-confirm pass lost its sample (q63/
    // q67 "failed" on the re-run, confirmOk=false, sample dropped).
    val lane = SparkEntry.queries("q63_stream_interval_join")
    QueryUtil.inTempDir("graft_ckpt_ns") { tmp =>
      val prev = spark.conf.getOption("spark.sql.streaming.checkpointLocation")
      try {
        spark.conf.set("spark.sql.streaming.checkpointLocation", s"$tmp/p0")
        assert(lane(spark, sf()).count() >= 0)
        // same namespace ⇒ resume attempt ⇒ refused (the failure mode)
        val e = intercept[Exception](lane(spark, sf()).count())
        assert(e.getMessage != null &&
          e.getMessage.contains("recovering from checkpoint"), e.getMessage)
        // a fresh per-pass namespace is the whole fix
        spark.conf.set("spark.sql.streaming.checkpointLocation", s"$tmp/p1")
        assert(lane(spark, sf()).count() >= 0)
      } finally prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.checkpointLocation", p)
        case None => spark.conf.unset("spark.sql.streaming.checkpointLocation")
      }
    }
  }

  test("unpersistLocalCheckpoints releases checkpoint blocks, spares persisted caches") {
    val sc = spark.sparkContext
    val cached = spark.range(1000).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    val ckpt = spark.range(1000).toDF("id").localCheckpoint()
    ckpt.count()
    val released = org.apache.spark.rdd.GraftRddHygiene.unpersistLocalCheckpoints(sc)
    assert(released >= 1)
    // idempotent: a second sweep finds nothing left to release
    assert(org.apache.spark.rdd.GraftRddHygiene.unpersistLocalCheckpoints(sc) === 0)
    // the persisted cache is still registered and readable
    assert(cached.count() === 1000)
    cached.unpersist()
  }
}
