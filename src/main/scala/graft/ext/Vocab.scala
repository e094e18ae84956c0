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
    * built from the corpus itself at `vocabSize` — the q184 lane. */
  def tokenizeWithVocab(
      spark: SparkSession, docs: DataFrame, textCol: String,
      vocabSize: Int, oov: OovPolicy): DataFrame = {
    val vocab = buildVocab(docs, col(textCol), vocabSize).toMap
    docs.withColumn("token_ids",
      applyIds(TextAnalysis.tokens(col(textCol)), vocab, oov))
  }
}
