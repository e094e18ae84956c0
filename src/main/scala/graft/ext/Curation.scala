package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline needs beyond
  * dedup/quality: benchmark decontamination and deterministic
  * stratified sampling. Both are shuffle-disciplined and oracle-
  * mirrorable (no RNG — sampling keys off a cryptographic hash of the
  * row id, so any engine reproduces the same sample).
  */
object Curation {

  /** Benchmark decontamination: training docs that share any word
    * `k`-gram with the eval corpus (the standard pre-training hygiene
    * pass — eval text leaking into training data inflates scores).
    * Returns (idCol, n_hits = distinct shared grams), contaminated
    * docs only; anti-join against it to clean.
    *
    * Scale shape: the eval side is a benchmark — tiny relative to the
    * corpus — so its distinct gram set is BROADCAST; the training side
    * streams through one explode + hash semi-match + per-doc count,
    * never shuffling the text itself. A hot gram ("the the the")
    * cannot skew: the broadcast side is distinct, and the count
    * aggregates per doc id. */
  def contaminated(
      train: DataFrame,
      eval: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 8): DataFrame = {
    val evalGrams = eval
      .select(explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .distinct()
    val trainGrams = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), k)).as("gram"))
    trainGrams
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(idCol)
      .agg(count_distinct(col("gram")).as("n_hits"))
  }

  /** [[contaminated]] with a Bloom prefilter: the eval gram set is
    * compiled into an `mBits`-bit [[Bloom]] filter probed per training
    * gram BEFORE any join — the ~(1−fpr) of grams that can't match
    * never reach an exchange. The surviving candidates then verify
    * against the exact eval set, so the RESULT is identical to
    * [[contaminated]] (same oracle) — the sketch only prunes.
    *
    * At 100 TB this is the difference between shipping every training
    * gram into a join and shipping ~0.1% of them: the filter is KB-MB
    * for any eval-set size, while a broadcast hash set grows with it.
    */
  def contaminatedBloom(
      train: DataFrame,
      eval: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 8,
      mBits: Int = 1 << 17,
      numHashes: Int = 4): DataFrame = {
    // persisted because it feeds TWO actions: the bloom build's
    // position collect and the exact verify join — without it the
    // eval-side shingle+distinct runs twice (release via unpersist()
    // on the returned frame's parent when done; MEMORY_AND_DISK is
    // bounded by the distinct gram set, benchmark-sized by contract)
    val evalGrams = eval
      .select(explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bits = Bloom.build(evalGrams, mBits, numHashes)
    val candidates = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .filter(Bloom.mightContainCol(col("gram"), bits, numHashes))
    candidates
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(idCol)
      .agg(count_distinct(col("gram")).as("n_hits"))
  }

  /** Deterministic stratified sample: keep a row iff
    * `md5(id) mod 1e6 < threshold(label)` — per-label integer
    * thresholds out of 1,000,000 (e.g. 200000 = 20%). Hash-keyed, so
    * the sample is reproducible across runs, engines, and cluster
    * sizes (unlike `sample()`/RAND), stable under repartitioning, and
    * exactly mirrorable in SQL. The md5-hex-prefix → BIGINT bridge is
    * the cross-engine-verified lane from the minhash oracle. */
  def stratifiedSample(
      df: DataFrame,
      labelCol: String,
      thresholds: Map[String, Int],
      defaultThreshold: Int,
      idCol: String = "doc_id"): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("long"),
      lit(1000000L))
    val thresholdCol = thresholds.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultThreshold)) { case (acc, (label, t)) =>
        when(col(labelCol) === label, lit(t)).otherwise(acc)
      }
    df.filter(bucket < thresholdCol)
  }

  /** Deterministic uniform k-sample PER KEY: rank rows within each key
    * by md5(id) and keep the k smallest — reproducible "random"
    * sampling with an exact per-key size, where [[stratifiedSample]]
    * gives an exact per-key RATE. Runs through the custom two-phase
    * [[graft.plans.TopKPerKey]] plan, so a hot key ships ≤ k rows per
    * input partition and nothing is ever fully sorted — at 100 TB this
    * is the difference between a sample and a global shuffle. */
  def sampleKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      k: Int,
      idCol: String = "doc_id"): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
        df.withColumn("_sample_rank",
          md5(col(idCol).cast("string").cast("binary"))),
        keyCols, "_sample_rank", descending = false, k,
        tiebreakCols = Seq(idCol))
      .drop("_sample_rank")

  /** Mixture reweighting ("data mixing"): downsample sources so the
    * output corpus matches `targetProps` (e.g. 60% web / 30% code /
    * 10% books) while keeping it as LARGE as possible — the binding
    * source (smallest n_s/p_s) is kept whole and every other source
    * downsamples to match. Two passes: a count per source (one tiny
    * aggregate), then the [[stratifiedSample]] hash-threshold filter
    * with computed thresholds — so the result is deterministic,
    * repartition-invariant, and engine-mirrorable like every other
    * sampler here.
    *
    * Threshold math (mirrored in [[mixToProportionsThresholds]]):
    * scale = min_s(n_s / p_s); keep_s = p_s · scale;
    * threshold_s = floor(keep_s / n_s · 1e6) out of 1e6.
    */
  def mixToProportions(
      df: DataFrame,
      sourceCol: String,
      targetProps: Map[String, Double],
      idCol: String = "doc_id"): DataFrame = {
    // the per-source count collect is the operator's contract (the
    // thresholds are |sources| integers), but it forces df's whole
    // lineage — persist so the sampling pass reads the materialized
    // frame instead of recomputing an arbitrarily expensive upstream
    // pipeline (q68: dedup + components + contamination) a second time
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = cached.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val thresholds = mixToProportionsThresholds(counts, targetProps)
    stratifiedSample(cached, sourceCol, thresholds, defaultThreshold = 0, idCol)
  }

  /** The per-source thresholds (of 1e6) for [[mixToProportions]] —
    * separated so oracles can compute the identical integers. Sources
    * absent from `targetProps` get 0 (dropped). */
  def mixToProportionsThresholds(
      counts: Map[String, Long],
      targetProps: Map[String, Double]): Map[String, Int] = {
    val scales = targetProps.collect {
      case (s, p) if p > 0 && counts.getOrElse(s, 0L) > 0 => counts(s) / p
    }
    // no targeted source present in the corpus ⇒ empty mix (the SQL
    // formulation's NULL scale → zero rows), not an empty.min crash
    if (scales.isEmpty) return targetProps.map { case (s, _) => s -> 0 }
    val scale = scales.min
    targetProps.map { case (s, p) =>
      val n = counts.getOrElse(s, 0L)
      val frac = if (n == 0) 0.0 else p * scale / n
      s -> math.floor(math.min(1.0, frac) * 1e6).toInt
    }
  }

  /** Deterministic train/val/test assignment: the same md5-mod-1e6 key
    * as [[stratifiedSample]], carved into contiguous bands — e.g.
    * `Seq("train" -> 800000, "val" -> 900000, "test" -> 1000000)` is an
    * 80/10/10 split. Hash-keyed ⇒ every engine, rerun, and cluster size
    * assigns each row to the SAME split (no RNG, no state file), rows
    * never leak between splits when the corpus grows (a doc's band
    * depends only on its own id), and the split is a pure per-row
    * projection — no shuffle at any scale. */
  def assignSplits(
      df: DataFrame,
      bands: Seq[(String, Int)] = Seq("train" -> 800000, "val" -> 900000, "test" -> 1000000),
      idCol: String = "doc_id"): DataFrame = {
    require(bands.nonEmpty && bands.last._2 == 1000000,
      s"split bands must cover the full hash range (last bound 1000000): $bands")
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("long"),
      lit(1000000L))
    val splitCol = bands.init.reverse
      .foldLeft(lit(bands.last._1)) { case (acc, (name, upper)) =>
        when(bucket < upper, lit(name)).otherwise(acc)
      }
    df.withColumn("split", splitCol)
  }

  /** The [[stratifiedSample]] predicate's DuckDB spelling, for oracles
    * and external verification. */
  def stratifiedSampleSql(
      labelExpr: String,
      thresholds: Map[String, Int],
      defaultThreshold: Int,
      idExpr: String): String = {
    val cases = thresholds.toSeq.sortBy(_._1).reverse
      .foldLeft(defaultThreshold.toString) { case (acc, (label, t)) =>
        s"CASE WHEN ($labelExpr) = '$label' THEN $t ELSE $acc END"
      }
    s"(('0x' || substring(md5(CAST($idExpr AS VARCHAR)), 1, 15))::BIGINT % 1000000) < ($cases)"
  }
}
