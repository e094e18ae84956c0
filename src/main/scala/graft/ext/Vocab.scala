package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frozen-vocabulary tokenization — the asset-application step between
  * "corpus tokenized" and "corpus packed": a training pipeline ships a
  * FROZEN vocab (token → id) and every downstream stage (packing,
  * chunking, length batching — [[Packing]]) consumes ids, not strings.
  *
  * Scale shape: the vocab is a bounded artifact by construction (it
  * was CHOSEN, typically ≤ a few hundred thousand entries), so it
  * applies as a driver-held map literal riding the task binary to
  * every executor exactly once — the broadcast-asset shape. The apply
  * itself is `transform` + `try_element_at` over the token array:
  * whole-stage codegen, ZERO shuffle, zero join — at 100 TB the cost
  * is one map probe per token, embarrassingly parallel. (The
  * relational replay — explode, left-join the vocab frame, re-collect
  * by position — is the oracle's job, q184: same rows, one exchange
  * heavier, which is exactly why the map literal is the engine path.)
  *
  * OOV policy is explicit — silent degradation on unknown tokens is
  * the LSH-bug class this repo keeps regression-testing against:
  *   - [[Vocab.Unk]]: map to a designated id (the `<unk>` convention);
  *   - [[Vocab.Drop]]: remove OOV tokens (bag-of-words shapes);
  *   - [[Vocab.Fail]]: raise naming the first offending token (strict
  *     validation runs — a frozen vocab plus a cleaned corpus should
  *     have NO OOV, so one is a pipeline bug).
  */
object Vocab {

  sealed trait OovPolicy
  /** Map out-of-vocabulary tokens to `id` (must not collide with a
    * real id — enforced in [[applyIds]]). */
  final case class Unk(id: Int) extends OovPolicy
  /** Remove out-of-vocabulary tokens. */
  case object Drop extends OovPolicy
  /** Error loudly on the first out-of-vocabulary token. */
  case object Fail extends OovPolicy

  /** Deterministic vocab build: the `size` most frequent tokens of the
    * corpus (count desc, token asc — the q59 rank recipe), ids 0-based
    * in rank order. One map-side-combined count + a top-k
    * (TakeOrderedAndProject) — never a global sort; the collect is
    * bounded by `size`, which is the definition of a vocab. */
  def buildVocab(docs: DataFrame, textCol: Column, size: Int): Seq[(String, Int)] = {
    require(size > 0, s"vocab size must be positive: $size")
    docs.select(explode(TextAnalysis.tokens(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(size)
      .collect()
      .zipWithIndex
      .map { case (r, i) => r.getString(0) -> i }
      .toSeq
  }

  /** token array → id array under `vocab` and the given OOV policy.
    * Native functions end to end ([[transform]]/[[try_element_at]]);
    * the map literal is the broadcast asset. */
  def applyIds(tokens: Column, vocab: Map[String, Int], oov: OovPolicy): Column = {
    require(vocab.nonEmpty, "empty vocabulary")
    oov match {
      case Unk(id) => require(!vocab.values.exists(_ == id),
        s"unk id $id collides with a vocabulary id")
      case _ => ()
    }
    val m = typedlit(vocab)
    oov match {
      case Unk(id) =>
        transform(tokens, t => coalesce(try_element_at(m, t), lit(id)))
      case Drop =>
        filter(transform(tokens, t => try_element_at(m, t)), _.isNotNull)
      case Fail =>
        transform(tokens, t =>
          when(try_element_at(m, t).isNull,
            raise_error(concat(lit("out-of-vocabulary token: '"), t, lit("'")))
              .cast("int"))
            .otherwise(try_element_at(m, t)))
    }
  }

  /** Whole-table convenience over `documents`-shaped input: tokenize
    * `textCol` (whitespace, the corpus-wide recipe) and apply a vocab
    * built from the corpus itself at `vocabSize`. */
  def tokenizeWithVocab(
      spark: SparkSession, docs: DataFrame, textCol: String,
      vocabSize: Int, oov: OovPolicy): DataFrame = {
    val vocab = buildVocab(docs, col(textCol), vocabSize).toMap
    docs.withColumn("token_ids",
      applyIds(TextAnalysis.tokens(col(textCol)), vocab, oov))
  }

  /** FREEZE a vocab as a versioned [[TxTable]] asset: build from
    * `docs`, publish the (token, id) frame as a commit at `assetDir`,
    * return the version. A real pipeline tokenizes against a frozen
    * asset, not against whatever the corpus currently counts — the
    * asset's version is what makes token ids REPRODUCIBLE across
    * corpus recomputes (append more documents, re-run tokenization AS
    * OF the frozen version: every old id is bit-identical, new
    * surface shows up as OOV instead of silently renumbering the
    * world). Each freeze is one more version of the same asset table:
    * time travel IS the vocab registry. */
  def freeze(
      spark: SparkSession, docs: DataFrame, textCol: Column,
      vocabSize: Int, assetDir: String): Long = {
    import spark.implicits._
    val vocabDf = buildVocab(docs, textCol, vocabSize).toDF("token", "id")
    TxTable.commitReplace(spark, assetDir, vocabDf)
  }

  /** Load a frozen vocab AS OF a version (latest when None) back into
    * the broadcast-asset map. Bounded by construction — the asset IS a
    * chosen vocab — and validated: duplicate tokens or ids in the
    * stored frame fail loud rather than silently shadowing mappings. */
  def loadAsOf(
      spark: SparkSession, assetDir: String,
      versionAsOf: Option[Long] = None): Map[String, Int] = {
    val rows = TxTable.read(spark, assetDir, versionAsOf)
      .select(col("token").cast("string"), col("id").cast("int"))
      .collect()
    val vocab = rows.map(r => r.getString(0) -> r.getInt(1)).toMap
    require(vocab.size == rows.length,
      s"frozen vocab at $assetDir carries duplicate tokens")
    require(rows.map(_.getInt(1)).distinct.length == rows.length,
      s"frozen vocab at $assetDir carries duplicate ids")
    vocab
  }

  /** Tokenize against the FROZEN asset at `assetDir` (AS OF `version`
    * when given): [[loadAsOf]] + [[applyIds]] — the engine path of a
    * pipeline whose vocab is a published artifact. */
  def tokenizeWithFrozenVocab(
      spark: SparkSession, docs: DataFrame, textCol: String,
      assetDir: String, versionAsOf: Option[Long], oov: OovPolicy): DataFrame =
    docs.withColumn("token_ids",
      applyIds(TextAnalysis.tokens(col(textCol)),
        loadAsOf(spark, assetDir, versionAsOf), oov))

  /** Session-memoized frozen-vocab asset over the `documents` corpus
    * at `dir` — the serving-state tier of the tokenize path, the same
    * build-once discipline as [[Ivf.centroidsFor]] / the dedup
    * signature caches: a pipeline freezes its vocab ONCE per corpus
    * snapshot and every downstream stage tokenizes through the frozen
    * version. First call freezes top-`vocabSize` tokens of
    * `documents.text` into a session-scoped asset table and returns
    * (assetDir, version); later calls return the same asset, so a
    * query through it measures APPLY cost, not build cost (the r16
    * q184 finding: an in-lane freeze buried the zero-shuffle tokenize
    * path under 3× of build; the freeze cost is q189's own lane). */
  def assetFor(
      spark: SparkSession, dir: String, vocabSize: Int = 30): (String, Long) =
    assetCache.getOrElseUpdate((dir, vocabSize), {
      val tmp = java.nio.file.Files.createTempDirectory("graft_vocab_asset")
      tempDirs.add(tmp)
      val assetDir = s"$tmp/vocab"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val v = freeze(spark, docs, col("text"), vocabSize, assetDir)
      (assetDir, v)
    })

  /** Keyed on the CORPUS location alone, not the SparkSession: the
    * frozen asset is a path + version on local disk, readable through
    * any session, and a session-keyed strong reference pinned dead
    * sessions, their temp dirs and one shutdown hook each for the
    * process lifetime (the r17 ADVICE leak). ASSUMPTION (documented,
    * same as every `*For` serving cache here): the corpus at `dir` is
    * immutable for the process lifetime — a rewritten corpus needs a
    * fresh process or an explicit [[freeze]] to a caller-owned asset
    * dir. */
  private val assetCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), (String, Long)]

  /** ONE process-wide shutdown hook draining a registry of asset temp
    * dirs — not one hook per entry. */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var p = tempDirs.poll()
    while (p != null) { graft.Fs.deleteTree(p); p = tempDirs.poll() }
  }))

  /** Per-row OOV rate of `tokens` under `vocab` (0.0 on an empty
    * array) — the drift metric a frozen-vocab pipeline watches: a
    * rising corpus-level average means the asset no longer covers the
    * surface and needs a re-freeze. Same map-literal probe as
    * [[applyIds]]: codegen, zero shuffle. */
  def oovRate(tokens: Column, vocab: Map[String, Int]): Column = {
    require(vocab.nonEmpty, "empty vocabulary")
    val m = typedlit(vocab)
    when(size(tokens) === 0, lit(0.0))
      .otherwise(
        size(filter(tokens, t => try_element_at(m, t).isNull)).cast("double") /
          size(tokens).cast("double"))
  }
}
