package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-compression
  * scale path of the ANN toolbox (brute force → sign-LSH → IVF → PQ):
  * each vector is split into `m` subspaces; each subspace is encoded
  * as the index of its nearest codebook centroid, so a 64-float
  * embedding becomes `m` small ints (32× smaller at m=8), and query
  * scoring is `m` table lookups per candidate (ADC — asymmetric
  * distance computation) instead of a 64-dim dot product.
  *
  * Division of labor at 100 TB:
  *   - codebook TRAINING reads a bounded deterministic sample to the
  *     driver (≤ `maxTrainRows` × dim doubles — megabytes; same
  *     contract as [[Ivf]]: only the tiny model crosses to the driver);
  *   - ENCODING is a distributed one-pass native expression
  *     ([[PqEncode]] — per row: m × k × dsub multiply-adds, codegen'd);
  *   - SEARCH scans codes with [[PqAdc]] (m array lookups per row) —
  *     the corpus read is code-bytes, not float-bytes.
  */
object Pq {

  /** Codebooks: codebooks(s)(c) = centroid c of subspace s (dsub dims). */
  type Codebooks = Array[Array[Array[Double]]]

  /** Memoized training per (session, key): PQ codebooks are a
    * build-once index artifact exactly like [[Ivf.centroidsFor]]'s
    * centroid matrix — encode/search only probe them; rebuild happens
    * through [[invalidate]] when the corpus at `key` changes. No lock:
    * a losing race trains twice and caches identical codebooks
    * (training is deterministic — hash sample + value-distinct seeds),
    * and nothing persisted can leak (the model is plain arrays). */
  def codebooksFor(
      emb: DataFrame,
      key: String,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 10): Codebooks =
    trainedCache.getOrElseUpdate((emb.sparkSession, key, m, k, iters),
      train(emb, m = m, k = k, iters = iters))

  private val trainedCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Int, Int, Int), Codebooks]

  /** Drop every trained codebook for (session, key) — the refresh path
    * after the corpus at `key` changes (mirrors [[Ivf.invalidate]]). */
  def invalidate(spark: org.apache.spark.sql.SparkSession, key: String): Unit =
    trainedCache.filterInPlace { case ((s, k2, _, _, _), _) => !((s eq spark) && k2 == key) }

  /** Train per-subspace k-means codebooks on a deterministic hash
    * sample (driver-side Lloyd — the model is m·k·dsub doubles). */
  def train(
      emb: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      m: Int = 8,
      k: Int = 16,
      iters: Int = 10,
      maxTrainRows: Int = 4096): Codebooks = {
    val total = emb.count()
    // hash filter + hard limit: the ceil'd threshold floors at 1/1e6,
    // which at extreme corpus sizes (> ~4e9 rows) would keep total/1e6
    // rows — the limit enforces the stated driver-memory bound exactly
    val sampled =
      if (total <= maxTrainRows) emb
      else emb.filter(
        pmod(xxhash64(col(idCol)), lit(1000000L)) <
          lit(math.ceil(maxTrainRows.toDouble / total * 1000000L).toLong))
        .limit(maxTrainRows)
    val rows = sampled.select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "empty training sample")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val sub = rows.map(_.slice(s * dsub, (s + 1) * dsub))
      kmeans(sub, k, iters)
    }
  }

  /** Deterministic driver-side Lloyd (seeds = first k VALUE-distinct
    * points — Array equality is by reference, so dedupe via toSeq;
    * duplicate seeds would freeze empty twin centroids forever). */
  private def kmeans(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val distinctSeeds = points.map(_.toSeq).distinct.take(k).map(_.toArray)
    var centroids = Array.tabulate(math.min(k, distinctSeeds.length))(distinctSeeds(_))
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](points.head.length))
      val counts = new Array[Long](centroids.length)
      points.foreach { p =>
        val c = nearest(p, centroids)
        counts(c) += 1
        var d = 0
        while (d < p.length) { sums(c)(d) += p(d); d += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  private def nearest(p: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < p.length) { val t = p(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Corpus with PQ codes attached (array<int>, length m). */
  def withCodes(emb: DataFrame, codebooks: Codebooks,
                vecCol: String = "embedding"): DataFrame =
    emb.withColumn("pq_code",
      org.apache.spark.sql.GraftColumnBridge.column(PqEncode(
        org.apache.spark.sql.GraftColumnBridge.expression(col(vecCol).cast("array<double>")),
        codebooks)))

  /** ADC top-k: score candidates by summed per-subspace distances from
    * the query to each code's centroid (one table lookup per
    * subspace). Returns approximate L2 distance, ascending. */
  def topK(coded: DataFrame, codebooks: Codebooks, query: Array[Double],
           k: Int, idCol: String = "vec_id"): DataFrame = {
    val m = codebooks.length
    val dsub = query.length / m
    val table: Array[Array[Double]] = Array.tabulate(m) { s =>
      val q = query.slice(s * dsub, (s + 1) * dsub)
      codebooks(s).map { c =>
        var d = 0.0; var i = 0
        while (i < dsub) { val t = q(i) - c(i); d += t * t; i += 1 }
        d
      }
    }
    coded.withColumn("pq_dist",
        org.apache.spark.sql.GraftColumnBridge.column(PqAdc(
          org.apache.spark.sql.GraftColumnBridge.expression(col("pq_code")), table)))
      .orderBy(col("pq_dist"), col(idCol))
      .limit(k)
  }
}

/** vec → array<int> of per-subspace nearest-centroid indices.
  * One pass: m × k × dsub fused multiply-adds per row, codegen'd. */
case class PqEncode(child: Expression, codebooks: Pq.Codebooks) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.ext.PqEncode.encode($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def encode(vec: ArrayData, codebooks: Pq.Codebooks): ArrayData = {
    val m = codebooks.length
    val dsub = vec.numElements() / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cs = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = vec.getDouble(s * dsub + i) - cs(c)(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** codes → Σ_s table(s)(code(s)) — the ADC score (approx L2²). */
case class PqAdc(child: Expression, table: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(input: Any): Any =
    PqAdc.score(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTable", table, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.ext.PqAdc.score($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

object PqAdc {
  def score(codes: ArrayData, table: Array[Array[Double]]): Double = {
    var acc = 0.0
    var s = 0
    while (s < table.length) { acc += table(s)(codes.getInt(s)); s += 1 }
    acc
  }
}
