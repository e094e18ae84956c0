package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
  private lazy val books = Pq.train(emb, m = 8, k = 16, iters = 10)

  test("codebooks: m subspaces × k centroids × dsub dims, deterministic") {
    assert(books.length == 8)
    assert(books.forall(_.length == 16))
    assert(books.forall(_.forall(_.length == 64 / 8)))
    val again = Pq.train(emb, m = 8, k = 16, iters = 10)
    assert(books.flatten.flatten.toSeq == again.flatten.flatten.toSeq,
      "hash-sampled training must be reproducible")
  }

  test("training excludes NULL embeddings and names mixed dimensions loud") {
    import spark.implicits._
    // NULLs are excluded (a direction-less row trains nothing) — the
    // old path NPE'd on the null seq mid-collect
    val withNull = Seq(
      (1L, Array.fill(8)(1.0)), (2L, Array.fill(8)(2.0)),
      (3L, null: Array[Double]))
      .toDF("vec_id", "embedding")
    val trained = Pq.train(withNull, m = 2, k = 2, iters = 2)
    assert(trained.length == 2 && trained.forall(_.forall(_.length == 4)))
    // mixed dims fail with both lengths named, never an
    // ArrayIndexOutOfBounds mid-Lloyd
    val mixed = Seq((1L, Array.fill(8)(1.0)), (2L, Array.fill(6)(1.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Pq.train(mixed, m = 2, k = 2, iters = 2))
    assert(e.getMessage.contains("mixed embedding dimensions") &&
      e.getMessage.contains("6") && e.getMessage.contains("8"), e.getMessage)
  }

  test("codes compress the vector 8:1 in arity and reconstruct coarsely") {
    val coded = Pq.withCodes(emb, books)
    val row = coded.select("pq_code").head()
    val code = row.getSeq[Int](0)
    assert(code.length == 8, "one code per subspace")
    assert(code.forall(c => c >= 0 && c < 16))
    assert(coded.count() == emb.count())
  }

  test("codebooksFor memoizes per (session, key) and invalidate drops") {
    val a = Pq.codebooksFor(emb, "pq-spec-key")
    val b = Pq.codebooksFor(emb, "pq-spec-key")
    assert(a eq b, "same (session, key) must serve the cached model")
    val other = Pq.codebooksFor(emb, "pq-spec-other")
    assert(!(a eq other), "a different key is a different index")
    Pq.invalidate(spark, "pq-spec-key")
    val c = Pq.codebooksFor(emb, "pq-spec-key")
    assert(!(a eq c), "invalidate must force a retrain")
    assert(a.flatten.flatten.toSeq == c.flatten.flatten.toSeq,
      "retraining the unchanged corpus reproduces the same codebooks")
    Pq.invalidate(spark, "pq-spec-key")
    Pq.invalidate(spark, "pq-spec-other")
  }

  test("withCodes stores the reconstruction residual next to the code") {
    val coded = Pq.withCodes(emb, books)
    val row = coded.select(col("embedding").cast("array<double>"), col("pq_code"), col("pq_res")).head()
    val v = row.getSeq[Double](0).toArray
    val code = row.getSeq[Int](1)
    val res = row.getDouble(2)
    // recon = concatenated chosen centroids; residual = ||v - recon||
    val dsub = v.length / books.length
    val recon = books.zipWithIndex.flatMap { case (cs, s) => cs(code(s)) }
    val expect = math.sqrt(v.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum)
    assert(math.abs(res - expect) < 1e-12, s"pq_res $res != recomputed $expect")
    assert(dsub == 8)
  }

  test("topKExact: residual bound makes ADC+re-rank provably exact") {
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val exact = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](2)
        val d = math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
        (r.getLong(0), BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, d) => (d, id) }.take(20).toSeq
    val coded = Pq.withCodes(emb, books).filter(col("vec_id") =!= 0L)
    val got = Pq.topKExact(coded, books, q, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == exact,
      s"bound-filtered refine must equal brute force\n got=$got\n want=$exact")
  }

  test("ADC top-k recall vs exact L2 brute force") {
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    // exact L2 top-10 (excluding the query itself)
    val exact = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1)
        val d = v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (r.getLong(0), d)
      }
      .sortBy(_._2).take(10).map(_._1).toSet
    val coded = Pq.withCodes(emb, books).filter(col("vec_id") =!= 0L)
    val ann = Pq.topK(coded, books, q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    // uniform-random embeddings are the worst case for PQ; at 8×16
    // codes expect a solid fraction of the true neighbors back
    assert(recall >= 0.3, s"recall@10 was $recall (ann=$ann exact=$exact)")
    // and the scored frame only needed codes, not embeddings
    val plan = Pq.topK(coded.select("vec_id", "pq_code"), books, q, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }
}
