package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: known vectors") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0), 1.0),
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, 0.0), Array(-1.0, 0.0), -1.0),
      (Array(3.0, 4.0), Array(3.0, 4.0), 1.0),
    ).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("cosine: zero vector yields null, not an ANSI error") {
    val r = Seq((Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(r.head.isNullAt(0))
  }

  test("withUnit equals unitVec bitwise, incl. the zero-norm NULL case") {
    val df = Seq(
      (1L, Array(3.0, 4.0)),
      (2L, Array(-1.5, 2.5)),
      (3L, Array(0.0, 0.0)),
      (4L, Array(1e-8, -1e-8))).toDF("id", "v")
    val got = Similarity.withUnit(df, col("v"), "u")
      .withColumn("u2", Similarity.unitVec(col("v")))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.get(2), r.get(3))
      if (a == null || b == null) assert(a == null && b == null,
        s"NULL semantics must agree for id ${r.getLong(0)}")
      else assert(
        r.getSeq[Double](2).map(java.lang.Double.doubleToRawLongBits) ==
          r.getSeq[Double](3).map(java.lang.Double.doubleToRawLongBits),
        s"unit vectors must match bitwise for id ${r.getLong(0)}")
    }
    assert(got.count(_.isNullAt(2)) == 1, "exactly the zero vector is NULL")
  }

  test("knnJoin: a zero-norm embedding is excluded, never an ANSI divide error") {
    val emb = Seq(
      (1L, "a", Array(1.0, 0.0)),
      (2L, "a", Array(0.0, 1.0)),
      (3L, "a", Array(0.0, 0.0)), // failed-encode artifact
      (4L, "a", Array(1.0, 1.0))).toDF("vec_id", "block", "embedding")
    val got = Similarity.knnJoin(emb, emb, k = 3,
      blockCol = "block", idCol = "vec_id", vecCol = "embedding").collect()
    assert(got.nonEmpty, "real vectors still rank")
    assert(!got.exists(r => r.getLong(1) == 3L || r.getLong(2) == 3L),
      "the zero vector must appear neither as query nor as neighbor")
  }

  test("withLshBuckets fails loud on an embedding-dimension mismatch") {
    val emb = Seq((1L, Array.fill(8)(1.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      Similarity.withLshBuckets(emb, numPlanes = 4, dim = 64).collect())
    assert(e.getMessage.contains("dimension must equal dim=64") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension must equal dim=64")),
      s"expected the dimension assertion, got: ${e.getMessage}")
    // matching dim works
    assert(Similarity.withLshBuckets(emb, numPlanes = 4, dim = 8).count() == 1L)
  }

  test("withLshBuckets names NULLNESS, not dimension, for a null embedding") {
    val emb = Seq((1L, Array.fill(8)(1.0)), (2L, null: Array[Double]))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](
      Similarity.withLshBuckets(emb, numPlanes = 4, dim = 8).collect())
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("")
    val all = msg(e) + Option(e.getCause).map(msg).getOrElse("")
    assert(all.contains("must not be NULL"),
      s"expected the null-vector assertion, got: $all")
    assert(!all.contains("dimension"),
      s"a null vector must not be reported as a dimension mismatch: $all")
  }

  test("lshBucket refuses more planes than a long's bit budget") {
    intercept[IllegalArgumentException](
      Similarity.lshBucket(col("v"), Similarity.hyperplanes(63, 4)))
  }

  test("knnJoin: matches a window-function brute force per query, excludes self") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val k = 4
    val got = Similarity.knnJoin(queries, emb, k)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"), r.getAs[Double]("sim")))
      .groupBy(_._1)
    // brute force: plain join + window rank over the same rounded sim
    val q = queries.select(col("label"), col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("label"), col("vec_id").as("n_id"),
      col("embedding").cast("array<double>").as("nv"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    val want = q.join(c, Seq("label"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", round(Similarity.dot(col("qv"), col("nv")) /
        (Similarity.l2Norm(col("qv")) * Similarity.l2Norm(col("nv"))), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"), r.getAs[Double]("sim")))
      .groupBy(_._1)
    assert(got.keySet == want.keySet)
    got.keySet.foreach { qid =>
      assert(got(qid).sortBy(x => (-x._3, x._2)).toSeq ==
        want(qid).sortBy(x => (-x._3, x._2)).toSeq, s"query $qid")
      assert(!got(qid).exists(_._2 == qid), s"query $qid must exclude itself")
    }
  }

  test("knnJoin: degenerate one-block corpus — salting leaves the result identical") {
    // everything in ONE block: unsalted this is the O(n²) single-task
    // case; with maxBlock=8 the corpus splits into ~n/8 sub-blocks and
    // the kept set must not move (every pair scored exactly once)
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .withColumn("label", lit(0))
      .limit(120)
    val queries = emb.filter(col("vec_id") % 7 === 0)
    def keyOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"), r.getAs[Double]("sim")))
      .sortBy(x => (x._1, -x._3, x._2)).toSeq
    val salted = Similarity.knnJoin(queries, emb, 5, maxBlock = 8)
    val whole = Similarity.knnJoin(queries, emb, 5, maxBlock = 1 << 20)
    assert(keyOf(salted) == keyOf(whole))
    // the salted plan joins on (block, salt) — the hot block's pair
    // product is spread across sub-block tasks, not one task
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"expected salted join keys:\n$plan")
  }

  test("knnJoin: excludeSelf=false keeps equal ids across disjoint id spaces") {
    // query table with its OWN id space: id 1 coincides with a corpus
    // id; with excludeSelf=false that corpus row must stay rankable
    val corpus = Seq((1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.9f, 0.1f)))
      .toDF("vec_id", "label", "embedding")
    val queries = Seq((1L, 0, Array(1.0f, 0.05f)))
      .toDF("vec_id", "label", "embedding")
    val withSelf = Similarity.knnJoin(queries, corpus, 2, excludeSelf = false)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(withSelf == Set(1L, 2L))
    val without = Similarity.knnJoin(queries, corpus, 2)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(without == Set(2L))
  }

  test("centroidDistances: matches the quantized reference, repartition-invariant") {
    val vecs = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(3.0f, 0.0f)),   // centroid x = 2
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.0f, 1.0f)),   // centroid = (0,1)
      (5L, 1, Array(0.0f, 7.0f))                                 // centroid y = 3
    ).toDF("vec_id", "label", "embedding")
    def refDist(v: Array[Double], c: Array[Double]): Double =
      v.zip(c).map { case (x, y) =>
        math.floor((x - y) * (x - y) * 1e12).toLong
      }.sum.toDouble / 1e12
    // reference centroids via the same floor-quantized mean
    def qMean(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1e6).toLong).sum.toDouble / xs.size / 1e6
    val c0 = Array(qMean(Seq(1.0, 3.0)), qMean(Seq(0.0, 0.0)))
    val c1 = Array(qMean(Seq(0.0, 0.0, 0.0)), qMean(Seq(1.0, 1.0, 7.0)))
    val want = Map(
      1L -> refDist(Array(1.0, 0.0), c0), 2L -> refDist(Array(3.0, 0.0), c0),
      3L -> refDist(Array(0.0, 1.0), c1), 4L -> refDist(Array(0.0, 1.0), c1),
      5L -> refDist(Array(0.0, 7.0), c1))
    val got = Similarity.centroidDistances(vecs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == want)
    val rep = Similarity.centroidDistances(vecs.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rep == want, "bitwise-stable under repartitioning")
    // the far vector is the top outlier
    val top = Similarity.centroidOutliers(vecs, 1).collect()
    assert(top.head.getLong(0) == 5L)
  }

  test("brute-force top-k is ordered and excludes the query") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val top = Similarity.bruteForceTopK(emb, 0L, 10).collect()
    assert(top.length == 10)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "descending")
  }

  test("LSH ANN: same-bucket recall vs brute force is substantial") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    // Uniform-random embeddings are LSH's worst case (no cluster
    // structure) — with 1 plane (~half the corpus probed) expect at
    // least a third of the true neighbors back.
    val ann = Similarity.annTopK(emb, 0L, 10, numPlanes = 1).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall (ann=$ann exact=$exact)")
    // every ANN hit must come from the probed bucket — verified by
    // construction (join on bucket); sanity: results are non-empty
    assert(ann.nonEmpty)
  }

  test("closest pair per block breaks exact-sim ties to the lowest ids") {
    // three identical vectors in one block: every pair has sim = 1.0
    // exactly; the argmax must deterministically pick (1, 2) — the
    // q43 oracle's ORDER BY sim DESC, a_id, b_id tiebreak
    val emb = Seq(
      ("b0", 3L, Array(1.0, 2.0)),
      ("b0", 1L, Array(1.0, 2.0)),
      ("b0", 2L, Array(1.0, 2.0)),
    ).toDF("blk", "vec_id", "embedding")
    val best = Similarity.closestPairPerBlock(emb, "blk").head()
    assert((best.getAs[Long]("a_id"), best.getAs[Long]("b_id")) == (1L, 2L))
    assert(best.getAs[Long]("n_pairs") == 3L)
  }

  test("closest pair: a NEAR-tie plateau (equal at 6 dp, apart in the last " +
      "ulps) ranks on the rounded sim, not on float noise — the sf1 q43 bug") {
    // pair (5,6) is exactly 1.0 (identical vectors); pair (1,2) is a
    // hair under but rounds to 1.0 at 6 dp. Ranking UNROUNDED sims
    // would pick (5,6) here, and on a replicated corpus whichever
    // clone-pair's evaluation order produced the largest last-ulp sum
    // — which is what diverged engine-vs-oracle at sf1. The contract
    // (rank rounded, break by id) must pick (1, 2).
    val emb = Seq(
      ("b0", 1L, Array(1.0, 2.0)),
      ("b0", 2L, Array(1.0 + 1e-9, 2.0)),
      ("b0", 5L, Array(3.0, 4.0)),
      ("b0", 6L, Array(3.0, 4.0)),
    ).toDF("blk", "vec_id", "embedding")
    val best = Similarity.closestPairPerBlock(emb, "blk").head()
    assert((best.getAs[Long]("a_id"), best.getAs[Long]("b_id")) == (1L, 2L),
      s"rounded-rank must break the 6 dp plateau to the lowest ids, got $best")
    assert(best.getAs[Double]("sim") == 1.0)
    assert(best.getAs[Long]("n_pairs") == 6L)
  }

  test("hyperplanes are deterministic across calls") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("label stats cover all labels with positive norms") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val stats = Similarity.labelStats(emb).collect()
    assert(stats.length == emb.select("label").distinct().count())
    assert(stats.forall(_.getDouble(2) > 0))
  }

  test("sign bucket matches a driver-side recomputation and partitions invariantly") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val got = emb.select(col("vec_id"),
        Similarity.signBucket(col("embedding"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = emb.select("vec_id", "embedding").collect().map { r =>
      val v = r.getSeq[Float](1)
      r.getLong(0) -> (0 until 8).map(i => if (v(i) > 0) 1L << i else 0L).sum
    }.toMap
    assert(got == want)
    // dedup canonical = min id per signature, stable under repartition
    val d1 = Similarity.signBucketDedup(emb, bits = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val d2 = Similarity.signBucketDedup(emb.repartition(7), bits = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d1 == d2)
    assert(d1.values.map(_._1).sum == emb.count())
  }

  test("sign bucket rejects widths that overflow a long") {
    intercept[IllegalArgumentException](Similarity.signBucket(col("embedding"), 63))
    intercept[IllegalArgumentException](Similarity.signBucket(col("embedding"), 0))
  }
}
