package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

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

  test("narrow probe keeps useful recall at a fraction of the scan") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = Ivf.topK(emb, 0L, 10, centroids, nProbe = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 with 3/8 probes was $recall")
  }
}
