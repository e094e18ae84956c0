package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign consecutive documents to fixed
  * token-budget training sequences.
  *
  * The operator every LLM data pipeline runs last: documents are
  * concatenated into `budget`-token sequences (a doc opens a new
  * sequence when it no longer fits; a doc longer than the budget
  * occupies a sequence of its own). Packing is inherently a stateful
  * left-to-right scan — a running token accumulator — so it is NOT a
  * window function (`floor(cumsum/budget)` is a different, split-doc
  * semantics). The Spark-native form is a per-group sorted iterator
  * fold: `groupByKey(shard).flatMapSortedGroups(orderBy doc_id)`.
  *
  * Scale contract (100 TB): packing is embarrassingly parallel across
  * SHARDS, and strictly sequential within one. Shard count = desired
  * parallelism (a deterministic function of the doc id, so results are
  * reproducible across cluster sizes and reruns). Each task streams
  * its shard's iterator — O(1) state (accumulator + counter), no
  * materialized group, no OOM risk on a big shard. The determinism
  * mirror is a DuckDB recursive CTE over the same (shard, doc order).
  */
object Packing {

  final case class PackedDoc(
      doc_id: Long, shard: Long, seq: Long, n_tokens: Int,
      // position of the doc's first token within its packed sequence —
      // what a loader needs to build per-doc attention masks /
      // position ids over the concatenated sequence
      offset: Int)

  /** Sliding-window token chunking: split each document's tokens into
    * fixed-`window`-token chunks advancing by `stride` tokens
    * (stride < window ⇒ overlapping context, the standard long-document
    * prep for a fixed-context model). Every token is covered: the
    * number of windows is 1 + ceil(max(0, n − window) / stride), so the
    * last chunk always reaches the end of the doc (and is the only one
    * allowed to be short). Returns one row per chunk:
    * (idCol, chunk_id, n_chunk_tokens, chunk_text).
    *
    * Scale shape: a pure per-row projection + generator — tokenize
    * once, build the chunk array with `transform` over a `sequence`,
    * explode. No shuffle at any scale; output size is
    * input · window/stride. Chunk math is all integer, so any engine
    * reproduces the exact chunk boundaries. */
  def chunkTokens(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      window: Int = 64,
      stride: Int = 48): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window]: stride=$stride window=$window")
    // two-step select: tokens become an attribute, so the chunk
    // transform references the materialized array (not a per-element
    // re-tokenization — the ExtractGenerator hoisting trap)
    // blank guard: TextAnalysis.tokens (split on whitespace) yields
    // [""] — size 1 — for empty/whitespace-only text, which would emit
    // a phantom 1-token empty chunk per blank doc; tokenize only
    // genuinely non-blank text so the n == 0 branch is the one that
    // fires (the shared tokens() itself keeps its split semantics —
    // other lanes' oracles mirror them)
    val toked = docs.select(col(idCol),
      when(coalesce(trim(col(textCol)), lit("")) === "",
        array().cast("array<string>"))
        .otherwise(TextAnalysis.tokens(col(textCol))).as("_toks"))
    val n = size(col("_toks")).cast("long")
    // 1 + ceil(max(0, n-window)/stride), as integer math; sequence()
    // runs DESCENDING when start > stop, so the n==0 case is guarded
    val nWin = (greatest(lit(0L), n - lit(window.toLong)) + lit(stride.toLong - 1L))
      .divide(lit(stride.toLong)).cast("long") + lit(1L)
    val chunks = when(n > 0,
      transform(sequence(lit(0L), nWin - 1), i =>
        struct(
          i.as("chunk_id"),
          least(lit(window.toLong), n - i * stride).as("n_chunk_tokens"),
          concat_ws(" ", slice(col("_toks"), (i * stride + 1).cast("int"), lit(window)))
            .as("chunk_text"))))
      .otherwise(array().cast("array<struct<chunk_id:bigint,n_chunk_tokens:bigint,chunk_text:string>>"))
    toked
      .select(col(idCol), explode(chunks).as("_c"))
      .select(col(idCol), col("_c.chunk_id"), col("_c.n_chunk_tokens"),
        col("_c.chunk_text"))
  }

  /** Length-bucketed batch assignment: group docs of similar token
    * length into fixed-size training batches so padding waste inside a
    * batch is bounded by the bucket width (the standard "bucketed
    * batching" prep for variable-length sequence training). Docs land
    * in buckets `floor(n_tokens / bucketWidth)`, are ordered inside
    * each bucket by md5(id) — deterministic shuffle, no RNG — and
    * numbered into `batchSize`-doc batches. Returns
    * (idCol, n_tokens, bucket, batch) where `batch` counts from 0
    * within each bucket.
    *
    * Scale shape: one window shuffle partitioned by bucket (buckets
    * are corpus/width-uniform; WindowExec spills). The batch id is
    * pure integer math off the rank, so any engine reproduces the
    * exact assignment. */
  def lengthBatches(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      bucketWidth: Int = 16,
      batchSize: Int = 8): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import org.apache.spark.sql.expressions.Window
    val n = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val w = Window.partitionBy("bucket")
      .orderBy(col("_lb_hash"), col(idCol))
    docs
      .select(col(idCol), n.as("n_tokens"),
        (n / bucketWidth).cast("long").as("bucket"),
        Curation.md5Hex(col(idCol)).as("_lb_hash"))
      .withColumn("batch", ((row_number().over(w) - 1) / batchSize).cast("long"))
      .drop("_lb_hash")
  }

  /** Pack `docs` into `budget`-token sequences within `numShards`
    * deterministic shards (shard = doc_id % numShards, scan order =
    * doc_id ascending). Returns (doc_id, shard, seq, n_tokens) where
    * `seq` numbers sequences within the shard from 0. */
  def packSequences(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      budget: Int = 512,
      numShards: Int = 8): Dataset[PackedDoc] = {
    import spark.implicits._
    val sized = docs.select(
        col(idCol).cast("long").as("doc_id"),
        (col(idCol).cast("long") % numShards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("int").as("n_tokens"))
      .as[(Long, Long, Int)]
    sized
      .groupByKey(_._2)
      .flatMapSortedGroups($"doc_id") { (shard: Long, it: Iterator[(Long, Long, Int)]) =>
        // O(1)-state greedy fold over the shard's sorted doc stream
        var acc = 0L
        var seq = -1L
        it.map { case (id, _, n) =>
          var off = 0L
          if (seq < 0 || acc + n > budget) { seq += 1; acc = n.toLong }
          else { off = acc; acc += n }
          PackedDoc(id, shard, seq, n, off.toInt)
        }
      }
  }
}
