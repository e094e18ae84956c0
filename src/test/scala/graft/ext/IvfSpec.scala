package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
  private lazy val centroids = Ivf.trainCentroids(emb, k = 8, iters = 3)

  test("training yields k unit centroids and a total cell assignment") {
    assert(centroids.length == 8)
    centroids.foreach { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, "centroids must be unit vectors")
    }
    val cells = Ivf.withCells(emb, centroids)
    assert(cells.filter(col("cell").isNull || col("cell") < 0 || col("cell") >= 8).count() == 0)
    assert(cells.count() == emb.count())
  }

  test("degenerate inputs fail LOUD (or exclude) instead of corrupting the index") {
    // a dimension mismatch against the trained centroids must not
    // silently drop rows into a NULL cell (the LSH lane's r13 bug class)
    val mixed = Seq((900001L, Array.fill(3)(1.0), 0)).toDF("vec_id", "embedding", "label")
    val e = intercept[Exception](Ivf.withCells(mixed, centroids).collect())
    def all(t: Throwable): String =
      Option(t.getMessage).getOrElse("") + Option(t.getCause).map(_.getMessage).getOrElse("")
    assert(all(e).contains("dimension differs"), all(e))
    // a zero-norm row is EXCLUDED (NULL cell), like every cosine lane
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val withZero = emb.limit(5).select(col("vec_id"), col("embedding"), col("label"))
      .union(Seq((900002L, Array.fill(dim)(0.0f), 0))
        .toDF("vec_id", "embedding", "label"))
    val cells = Ivf.withCells(withZero, centroids).collect()
    assert(cells.count(_.isNullAt(cells.head.fieldIndex("cell"))) == 1)
    // missing / direction-less QUERY ids are named, not NPE'd
    val eMissing = intercept[IllegalArgumentException](
      Ivf.topK(emb, -999L, 5, centroids, nProbe = 2))
    assert(eMissing.getMessage.contains("not found"))
    val eZero = intercept[IllegalArgumentException](
      Ivf.topK(withZero, 900002L, 5, centroids, nProbe = 2))
    assert(eZero.getMessage.contains("zero-norm"))
  }

  test("probing all cells reproduces exact brute-force top-k") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val all = Ivf.topK(emb, 0L, 10, centroids, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(all == brute)
  }

  test("centroid cache memoizes per (session, key) and invalidates") {
    val a = Ivf.centroidsFor(emb, "spec_key", k = 4, iters = 1)
    assert(Ivf.centroidsFor(emb, "spec_key", k = 4, iters = 1) eq a,
      "second call must hit the cache")
    Ivf.invalidate(spark, "spec_key")
    val b = Ivf.centroidsFor(emb, "spec_key", k = 4, iters = 1)
    assert(!(b eq a), "invalidate must force a retrain")
    assert(b.map(_.toSeq).toSeq == a.map(_.toSeq).toSeq,
      "deterministic training: retrained values identical")
    Ivf.invalidate(spark, "spec_key")
  }

  test("topKExact: bound-pruned probe reproduces exact brute-force top-k") {
    val radii = Ivf.cellRadii(emb, centroids)
    val brute = Similarity.bruteForceTopK(emb, 7L, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val exact = Ivf.topKExact(emb, 7L, 20, centroids, radii, nProbe0 = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(exact == brute, "the triangle-inequality bound must never lose a true neighbour")
  }

  test("topKExact: the bound actually prunes cells on clustered data") {
    // four tight clusters on orthogonal axes: the nearest cell's
    // provisional k-th sim (~1) beats every far cluster's upper bound
    // (~0), so only the query's cluster scans
    val dim = 8
    val rows = for {
      c <- 0 until 4
      i <- 0 until 40
    } yield {
      val noise = Array.tabulate(dim)(d => math.sin(c * 131 + i * 17 + d) * 0.01)
      val v = Array.tabulate(dim)(d => (if (d == c) 1.0 else 0.0) + noise(d))
      val n = math.sqrt(v.map(x => x * x).sum)
      // interleave ids across clusters so the deterministic seeds (the
      // 4 lowest vec_ids) start one-per-cluster
      ((i * 4 + c).toLong, c, v.map(_ / n).map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val cs = Ivf.trainCentroids(df, k = 4, iters = 3)
    val radii = Ivf.cellRadii(df, cs)
    // one probe pass for result + diagnostic (topKExact and probeCells
    // separately would rerun the driver-side lookup/provisional jobs)
    val (exactDf, probes) = Ivf.topKExactProbed(df, 0L, 10, cs, radii, nProbe0 = 1)
    assert(probes.size < 4, s"far clusters must be pruned, probed $probes")
    val brute = Similarity.bruteForceTopK(df, 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    val exact = exactDf.collect().map(_.getLong(0)).toSeq
    assert(exact == brute)
  }

  test("radii cache keys on centroid CONTENT: retrained centroids never reuse stale radii") {
    val c1 = Ivf.centroidsFor(emb, "radii-digest-key", k = 4, iters = 1)
    val c2 = Ivf.centroidsFor(emb, "radii-digest-key", k = 4, iters = 3)
    assume(!c1.zip(c2).forall { case (a, b) => a.sameElements(b) },
      "iters=1 vs iters=3 should move at least one centroid")
    val r1 = Ivf.radiiFor(emb, "radii-digest-key", c1)
    val r2 = Ivf.radiiFor(emb, "radii-digest-key", c2)
    // same length, different centroids — a length-keyed cache would
    // alias these and hand c2 the radii measured against c1
    assert(!(r1 eq r2), "different centroid content must not share a radii entry")
    assert(Ivf.radiiFor(emb, "radii-digest-key", c1) eq r1, "c1 entry still cached")
    Ivf.invalidate(spark, "radii-digest-key")
  }

  test("radii cache memoizes per (session, key) and invalidate drops both tiers") {
    val cs = Ivf.centroidsFor(emb, "radii-spec-key", k = 4, iters = 1)
    val a = Ivf.radiiFor(emb, "radii-spec-key", cs)
    assert(Ivf.radiiFor(emb, "radii-spec-key", cs) eq a, "second call must hit the cache")
    Ivf.invalidate(spark, "radii-spec-key")
    val b = Ivf.radiiFor(emb, "radii-spec-key", cs)
    assert(!(b eq a), "invalidate must drop radii with the centroids")
    assert(b.toSeq == a.toSeq, "deterministic: recomputed radii identical")
    Ivf.invalidate(spark, "radii-spec-key")
  }

  test("cells cache: persisted per (session, key, centroid content); cached probe = uncached") {
    val cs = Ivf.centroidsFor(emb, "cells-spec-key", k = 4, iters = 1)
    val a = Ivf.cellsFor(emb, "cells-spec-key", cs)
    assert(Ivf.cellsFor(emb, "cells-spec-key", cs) eq a, "second call must hit the cache")
    assert(a.storageLevel.useMemory, "cell frame must be persisted")
    // content-keyed like radii: different centroids → different entry
    val cs3 = Ivf.centroidsFor(emb, "cells-spec-key", k = 4, iters = 3)
    assume(!cs.zip(cs3).forall { case (x, y) => x.sameElements(y) })
    assert(!(Ivf.cellsFor(emb, "cells-spec-key", cs3) eq a),
      "different centroid content must not alias a cell assignment")
    // the cached probe path returns exactly the uncached result
    val radii = Ivf.radiiFor(emb, "cells-spec-key", cs)
    val direct = Ivf.topKExact(emb, 7L, 20, cs, radii, nProbe0 = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val cached = Ivf.topKExactCached(emb, "cells-spec-key", 7L, 20, cs, radii, nProbe0 = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(cached == direct)
    Ivf.invalidate(spark, "cells-spec-key")
    assert(!(Ivf.cellsFor(emb, "cells-spec-key", cs) eq a), "invalidate must drop the cell tier")
    Ivf.invalidate(spark, "cells-spec-key")
  }

  test("narrow probe keeps useful recall at a fraction of the scan") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = Ivf.topK(emb, 0L, 10, centroids, nProbe = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 with 3/8 probes was $recall")
  }

  test("frozen index: freeze/load round-trips byte-identical, old versions " +
      "survive a corpus change, corrupt assets are refused") {
    graft.QueryUtil.inTempDir("graft_ivf_freeze") { tmp =>
      val asset = s"$tmp/ivf"
      val v1 = Ivf.freeze(spark, emb, k = 8, iters = 3, asset)
      val loaded = Ivf.loadAsOf(spark, asset, Some(v1))
      // vs a SEPARATE training run, equality is only approximate: the
      // centroid update is a distributed avg() whose float summation
      // order is deterministic only under identical partitioning — a
      // parallelism/split change may move the last ulps (r16 ADVICE).
      // Bit-exactness is asserted below where it is actually promised:
      // reloading the SAME frozen version.
      assert(loaded.length == centroids.length)
      loaded.zip(centroids).foreach { case (a, b) =>
        assert(a.length == b.length)
        a.zip(b).foreach { case (x, y) =>
          assert(math.abs(x - y) <= 1e-9,
            s"frozen centroids must match the training run: $x vs $y")
        }
      }
      // corpus changes; a retrain freezes as a NEW version of the same
      // asset, and AS OF v1 still serves the original matrix — search
      // behavior at the old deploy stays reproducible
      val grown = emb.unionByName(
        emb.limit(3).select(col("vec_id") + 900000L, col("embedding"), col("label"))
          .toDF("vec_id", "embedding", "label"))
      val v2 = Ivf.freeze(spark, grown, k = 8, iters = 3, asset)
      assert(v2 == v1 + 1)
      val reloadedV1 = Ivf.loadAsOf(spark, asset, Some(v1))
      reloadedV1.zip(loaded).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
      assert(Ivf.loadAsOf(spark, asset).length == 8, "latest = v2, still k rows")
      // the frozen matrix feeds the exact-probe path unchanged: provably
      // brute-force rows through asset-loaded centroids
      val radii = Ivf.cellRadii(emb, reloadedV1)
      val viaAsset = Ivf.topKExact(emb, 0L, 10, reloadedV1, radii)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val brute = Similarity.bruteForceTopK(emb, 0L, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(viaAsset == brute)
      // corrupt-asset states are refused loud, never guessed around
      import spark.implicits._
      val ragged = s"$tmp/ragged"
      TxTable.commitReplace(spark, ragged,
        Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0))).toDF("cell", "centroid"))
      val e1 = intercept[IllegalArgumentException](Ivf.loadAsOf(spark, ragged))
      assert(e1.getMessage.contains("ragged"), e1.getMessage)
      val gapped = s"$tmp/gapped"
      TxTable.commitReplace(spark, gapped,
        Seq((0, Seq(1.0)), (2, Seq(0.5))).toDF("cell", "centroid"))
      val e2 = intercept[IllegalArgumentException](Ivf.loadAsOf(spark, gapped))
      assert(e2.getMessage.contains("cell ids"), e2.getMessage)
    }
  }
}
