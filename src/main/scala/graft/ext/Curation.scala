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

  /** The ONE deterministic-bucket kernel every sampler keys off:
    * md5(id) hex prefix → 60-bit integer → mod 1e6. Shared so the hash
    * width/modulus can never silently diverge between samplers (the
    * SQL spellings in [[stratifiedSampleSql]]/[[weightedSampleXiSql]]
    * mirror it). */
  private def md5Bucket(id: Column): Column =
    pmod(
      conv(substring(md5Hex(id), 1, 15), 16, 10)
        .cast("long"),
      lit(1000000L))

  /** The deterministic ORDERING key the rank-based samplers share
    * (md5 of the id's decimal string — hex compares lexicographically
    * the same in every engine): [[sampleKPerKey]], [[quotaSample]],
    * [[graft.ext.Packing.lengthBatches]], q71's interleave. Public so
    * no caller re-spells the string/binary cast chain (a divergent
    * copy would silently break cross-engine ordering parity). */
  def md5Hex(id: Column): Column =
    md5(id.cast("string").cast("binary"))

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
    val evalGrams = Dedup.withTokenArray(eval, textCol)
      .select(explode(Dedup.shinglesOfTokens(col("_toks"), k)).as("gram"))
      .distinct()
    val trainGrams = Dedup.withTokenArray(train, textCol)
      .select(col(idCol),
        explode(Dedup.shinglesOfTokens(col("_toks"), k)).as("gram"))
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
    // ONE eval pass: the verify join below broadcasts the eval gram set
    // anyway (a broadcast collects to the driver by definition — the
    // "eval is benchmark-sized" contract), so collecting the grams here
    // and building the bloom bits locally costs the same driver memory
    // as the broadcast while skipping a whole second shingle+distinct
    // job (the old shape) — and needs no persist, so nothing leaks into
    // the session CacheManager. An eval set too large to broadcast
    // would need the shuffle-join verify variant anyway (and
    // [[Bloom.build]]'s distributed construction).
    val spark = train.sparkSession
    import spark.implicits._
    val evalGramSet = Dedup.withTokenArray(eval, textCol)
      .select(explode(Dedup.shinglesOfTokens(col("_toks"), k)).as("gram"))
      .distinct()
      .as[String].collect()
    val bits = Bloom.buildLocal(evalGramSet, mBits, numHashes)
    val verify = evalGramSet.toSeq.toDF("gram")
    Dedup.withTokenArray(train, textCol)
      .select(col(idCol),
        explode(Dedup.shinglesOfTokens(col("_toks"), k)).as("gram"))
      .filter(Bloom.mightContainCol(col("gram"), bits, numHashes))
      .join(broadcast(verify), Seq("gram"))
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
    val bucket = md5Bucket(col(idCol))
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
        df.withColumn("_sample_rank", md5Hex(col(idCol))),
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
    *
    * Fully declarative — ONE action, no driver collect, no persist:
    * the per-source counts, the binding scale, and the thresholds are
    * all tiny frames inside the same plan, broadcast back onto the
    * corpus for the keep filter — unlike the collect-then-filter
    * formulation, which pays two separate jobs or a corpus-sized
    * persist with no release point (a leaked MEMORY_AND_DISK cache
    * that CacheManager then splices into every unrelated plan scanning
    * the same source).
    *
    * The upstream `df` appears in BOTH branches (count + probe), and
    * exchange reuse canNOT merge them: column pruning narrows the
    * count branch to `sourceCol`, so its subtree never canonicalizes
    * equal to the probe's. For a TABLE upstream that is the right
    * trade — the extra pass is a single-column scan. For an expensive
    * UNmaterialized pipeline upstream (q68: dedup + components +
    * decontamination), pass `materialize = true`: the input is
    * local-checkpointed once (RDD blocks, eager=false — materialized
    * by the count job, reread by the probe job, freed by the
    * ContextCleaner when the frame is GC'd; never in CacheManager, so
    * no cross-query plan substitution). Caveat inherited from
    * localCheckpoint: blocks are not replicated, so an executor loss
    * mid-query fails the query — fault-critical runs should write the
    * cleaned corpus to a table first and mix from that instead.
    */
  def mixToProportions(
      df: DataFrame,
      sourceCol: String,
      targetProps: Map[String, Double],
      idCol: String = "doc_id",
      materialize: Boolean = false): DataFrame = {
    val input = if (materialize) df.localCheckpoint(eager = false) else df
    // identical IEEE double ops, in the same order, as the driver-side
    // mirror [[mixToProportionsThresholds]] (which oracles/specs use
    // to reproduce the exact thresholds)
    val propCol = targetProps.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (s, p)) =>
        when(col(sourceCol) === s, lit(p)).otherwise(acc)
      }
    val counts = input.groupBy(sourceCol).agg(count(lit(1)).as("_mix_n"))
      .withColumn("_mix_p", propCol)
    // min_s(n_s / p_s) over targeted, non-empty sources; empty input
    // (no targeted source present) yields a NULL scale, which nulls
    // every threshold and keeps zero rows — the SQL mirror's semantics
    val scale = counts.filter(col("_mix_p") > 0 && col("_mix_n") > 0)
      .agg(min(col("_mix_n").cast("double") / col("_mix_p")).as("_mix_scale"))
    // NOT `least(1.0, frac)`: least/greatest IGNORE nulls (both here
    // and in DuckDB), which would turn the empty-mix NULL scale into a
    // keep-everything 1e6 threshold — the when/otherwise clamp
    // propagates NULL so an absent-source mix keeps zero rows
    val frac = col("_mix_p") * col("_mix_scale") / col("_mix_n")
    val thresholds = counts.crossJoin(scale)
      .select(col(sourceCol),
        floor(when(frac > 1.0, lit(1.0)).otherwise(frac) * lit(1e6))
          .as("_mix_threshold"))
    val bucket = md5Bucket(col(idCol))
    input.join(broadcast(thresholds), Seq(sourceCol))
      .filter(bucket < col("_mix_threshold"))
      .select(df.columns.map(col): _*)
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
    // misordered bounds would silently misassign: the fold below keys
    // each row to the FIRST band whose upper bound exceeds its bucket,
    // which is only the intended band when bounds strictly increase
    require(bands.head._2 > 0 &&
      bands.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      s"split band bounds must be strictly increasing and positive: $bands")
    val bucket = md5Bucket(col(idCol))
    val splitCol = bands.init.reverse
      .foldLeft(lit(bands.last._1)) { case (acc, (name, upper)) =>
        when(bucket < upper, lit(name)).otherwise(acc)
      }
    df.withColumn("split", splitCol)
  }

  /** Sequential Poisson sample (Ohlsson 1998): deterministic weighted
    * sampling without replacement, probability ~ proportional to
    * `weightCol`. Each row draws the uniform u = md5-bucket/1e6 from
    * its OWN id and gets priority ξ = u / w; the k smallest ξ are the
    * sample. P(ξ < t) = min(1, w·t), so heavier rows rank earlier in
    * proportion to their weight — the order-sampling scheme surveys
    * use for πps ("probability proportional to size") samples.
    *
    * Determinism contract matches the other samplers here: no RNG, the
    * draw is a pure function of the row id, so any engine/rerun/
    * cluster size reproduces the same sample, and ξ uses only
    * correctly-rounded IEEE ops (two divisions — never pow/log, which
    * differ across runtimes) so the oracle can hash-match it.
    *
    * Scale shape: ξ is a per-row projection and the top-k runs through
    * `TakeOrderedAndProject` — each partition keeps a k-element heap
    * and only k rows per partition reach the driver-side merge; the
    * corpus is never globally sorted. Rows with non-positive or NULL
    * weight are excluded (ξ undefined; NULL ordering differs across
    * engines). */
  def weightedSample(
      df: DataFrame,
      weightCol: String,
      k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val bucket = md5Bucket(col(idCol))
    val xi = bucket.cast("double") / lit(1000000.0) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("xi", xi)
      .orderBy(col("xi"), col(idCol))
      .limit(k)
  }

  /** The [[weightedSample]] priority's DuckDB spelling. */
  def weightedSampleXiSql(idExpr: String, weightExpr: String): String =
    s"((('0x' || substring(md5(CAST($idExpr AS VARCHAR)), 1, 15))::BIGINT % 1000000)" +
      s" / 1000000.0) / CAST($weightExpr AS DOUBLE)"

  /** Per-key quota sample: allocate a global row `budget` across the
    * values of `keyCol` proportionally to their counts (largest-
    * remainder / Hamilton apportionment, so quotas are integers that
    * sum exactly to min(budget, rows available)), then keep each key's
    * `quota` smallest-md5 rows — the "domain balancing" pass a crawl
    * corpus needs so one giant domain can't dominate a fixed token
    * budget.
    *
    * Allocation math (mirrored in oracles): ideal_s = budget·n_s/N;
    * base_s = floor(ideal_s); the L = budget − Σ base_s leftover seats
    * go to the L largest remainders (ties by key asc). With
    * budget < N a key's quota never exceeds its count; a budget ≥ N
    * yields quotas ≥ counts and the filter keeps every row — the
    * operator degrades to identity instead of failing.
    *
    * Scale shape: the allocation runs on the per-key COUNT frame (one
    * map-side-combined aggregate; #keys rows), and the per-key pick
    * runs through the two-phase [[graft.plans.TopKPerKey]] plan with
    * k = max quota, so ≤ k rows per key per partition cross the one
    * exchange and nothing is globally sorted. The max quota is read
    * off the #keys-row allocation frame — a contractually bounded
    * driver value (same cardinality class as [[mixToProportions]]'s
    * per-source counts).
    *
    * Contract bounds: exact integer quotas require per-key SELECTION,
    * so the partial heaps hold up to maxQuota rows — right when the
    * budget is human-scale (top-N docs per run). For a budget so
    * large that maxQuota-row heaps don't fit an executor (billions),
    * use [[stratifiedSample]] with thresholds quota_s/n_s instead:
    * O(1) state, same determinism, binomially-approximate sizes. */
  def quotaSample(
      df: DataFrame,
      keyCol: String,
      budget: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    // NULL keys are excluded up front: NULL groups through an
    // aggregate but never matches an equality — apportioning seats to
    // a group the final filter cannot keep would silently undershoot
    // the budget (same exclusion contract as weightedSample's NULL
    // weights)
    val input = df.filter(col(keyCol).isNotNull)
    val counts = input.groupBy(keyCol).agg(count(lit(1)).as("_q_n"))
    val wAll = Window.partitionBy()
    // ideal/base/remainder on the #keys-row frame; windows over the
    // whole (tiny) frame are one-partition by construction
    val ideal = lit(budget.toDouble) * col("_q_n").cast("double") /
      sum(col("_q_n")).over(wAll).cast("double")
    val alloc = counts
      .withColumn("_q_base", floor(ideal).cast("long"))
      .withColumn("_q_rem", ideal - floor(ideal))
      .withColumn("_q_rank",
        row_number().over(wAll.orderBy(col("_q_rem").desc, col(keyCol))))
      .withColumn("_q_leftover", lit(budget) - sum(col("_q_base")).over(wAll))
      .withColumn("quota",
        col("_q_base") + when(col("_q_rank") <= col("_q_leftover"), 1L).otherwise(0L))
      .select(col(keyCol), col("quota"))
    // ONE driver job reads the whole #keys-row allocation frame (a
    // contractually bounded driver value) — both the heap size and the
    // per-key quota filter derive from it locally, so the upstream is
    // computed once here and once in the final pick, never a third
    // time through a broadcast-join branch that column pruning would
    // stop exchange reuse from merging
    val quotaRows = alloc.collect()
    if (quotaRows.isEmpty) return df.limit(0)
    val maxQuota = quotaRows.map(_.getLong(1)).max
    // a quota beyond Int.MaxValue can't ride the k-heap plan; capping
    // silently would under-fill the key — fail loud (scaladoc: use
    // stratifiedSample thresholds for budgets at that scale)
    require(maxQuota <= Int.MaxValue.toLong,
      s"max quota $maxQuota exceeds the per-key selection limit; " +
        "use stratifiedSample with quota/count thresholds for budgets this large")
    if (maxQuota == 0) return df.limit(0)
    val pruned = graft.plans.TopKPerKey.topKPerKey(
      input.withColumn("_q_hash", md5Hex(col(idCol))),
      Seq(keyCol), "_q_hash", descending = false, k = maxQuota.toInt,
      tiebreakCols = Seq(idCol))
    // rebuild the allocation as a LOCAL relation from the collected
    // rows (no upstream recompute) and broadcast-join it: a per-key
    // CASE chain would nest #keys deep — Catalyst transforms stack-
    // overflow at a few thousand levels and lit() can't encode every
    // key type, while an equi-join handles any cardinality and type
    val spark = df.sparkSession
    val allocLocal = spark.createDataFrame(
      java.util.Arrays.asList(quotaRows: _*), alloc.schema)
    // rank within key over the pruned (≤ maxQuota rows/key) survivors —
    // the window sorts only what TopKPerKey already whittled down
    val wKey = Window.partitionBy(keyCol).orderBy(col("_q_hash"), col(idCol))
    pruned
      .withColumn("_q_rn", row_number().over(wKey))
      .join(broadcast(allocLocal), Seq(keyCol))
      .filter(col("_q_rn") <= col("quota"))
      .select(df.columns.map(col): _*)
  }

  /** Relative (percentile-rank) gate: keep the top `keepNum/keepDen`
    * fraction of rows WITHIN each key, ranked by `metricCol` — the
    * "keep the best 75% per language" filter that absolute thresholds
    * can't express when score distributions differ per key (a 0.5
    * cutoff that is strict for English is vacuous for a low-resource
    * language). The kept count per key is exactly
    * floor(n_key · keepNum / keepDen), decided by integer
    * cross-multiplication (rn·den ≤ n·num) — no float percentile, no
    * interpolation, so any engine reproduces the same kept set.
    *
    * Scale shape — boundary-bucket election, NOT one window per key
    * (a `row_number` window partitioned only by `keyCol` serializes a
    * dominant key — one language holding half the corpus — into a
    * single sequential sort task):
    *   1. quantize the metric into `buckets` monotone buckets
    *      (bucket-major order == global order, so per-key rank
    *      decomposes into "rows in strictly better buckets" + rank
    *      WITHIN the row's bucket);
    *   2. per-(key, bucket) counts (map-side-combined aggregate,
    *      ≤ #keys·buckets rows) → each bucket's better-count and the
    *      key total via a window over that tiny frame;
    *   3. broadcast the per-bucket verdict back: buckets entirely
    *      inside the kept prefix pass with NO shuffle of their rows,
    *      buckets entirely outside drop, and only the ONE boundary
    *      bucket per key (~n_key/buckets rows) pays a `row_number`
    *      window — partitioned by (key, bucket), so even the dominant
    *      key's boundary sort is bounded and parallel.
    * The kept set is IDENTICAL for any bucket count (the quantizer is
    * monotone and within-bucket ranking is exact); `buckets` only
    * bounds the boundary-task size. Kept-count arithmetic stays
    * integer cross-multiplication (rank·den ≤ n·num) — no float
    * percentile anywhere.
    *
    * Contract: `metricCol` must lie in [0, 1] (a score/ratio — the
    * same quantizer domain as [[budgetSelect]]; values outside clamp
    * into the edge buckets, which stays CORRECT — edge buckets just
    * absorb more rows — but a metric far outside [0, 1] degrades the
    * boundary bound back toward one-task-per-key). The broadcast
    * verdict frame holds one row per NON-EMPTY (key, bucket) pair —
    * ≤ min(#rows, #keys·buckets) — and must stay driver-broadcastable:
    * `buckets` trades boundary-task size (↑buckets = smaller boundary
    * sorts) against verdict-frame size (↑buckets·#keys rows). The
    * skew this operator defends against is a DOMINANT key, i.e. few
    * keys — the regime where the frame is tiny; at extreme key
    * cardinality (millions of keys, each small) per-key windows were
    * never skewed, and the gate protects itself: if the verdict frame
    * would exceed `maxVerdictRows`, it falls back to the plain per-key
    * window form instead of collecting an unbounded frame to the
    * driver (high cardinality ⇒ small keys ⇒ the window was never the
    * skew risk). EXECUTION IS EAGER: the call materializes the scored
    * frame (one localCheckpoint pass — the histogram and tag lanes
    * then both read the checkpoint, so an expensive upstream metric is
    * computed ONCE, not per lane) and collects the bounded verdict —
    * this is a query API like [[Ivf.topKExact]], not a lazy-plan
    * builder. NULL metrics are
    * excluded, not ranked: engines disagree on NULL ordering, and a
    * ranked NULL row would both occupy a kept slot and inflate the
    * per-key count the keep fraction is taken of. NaN metrics are
    * excluded for the same reason (Spark's sort order puts NaN ABOVE
    * every real value — ranking a garbage score as the best document
    * is never the intent — while the bucket quantizer would send it to
    * the WORST bucket; neither engine-accidental placement is a
    * contract). NULL keys are excluded too — the same rule as
    * [[quotaSample]]/[[budgetSelect]]'s NULL-key exclusion: a NULL
    * "group" is almost always missing metadata, and the broadcast-back
    * equi-join cannot match it; callers wanting NULLs as a real group
    * coalesce the key first. Ties break by `idCol` so the kept set is
    * deterministic even on tied metrics. */
  def relativeRankGate(
      df: DataFrame,
      keyCol: String,
      metricCol: String,
      keepNum: Int,
      keepDen: Int,
      descending: Boolean = true,
      idCol: String = "doc_id",
      buckets: Int = 1024,
      maxVerdictRows: Int = 1 << 20): DataFrame = {
    require(keepDen > 0 && keepNum >= 0 && keepNum <= keepDen,
      s"keep fraction must be within [0, 1]: $keepNum/$keepDen")
    require(buckets >= 1, s"buckets must be positive: $buckets")
    import org.apache.spark.sql.expressions.Window
    val rows = df.filter(col(metricCol).isNotNull &&
      !isnan(col(metricCol).cast("double")) && col(keyCol).isNotNull)
    // monotone quantizer; clamp handles metric == 1.0 (and strays)
    val bkt = least(greatest(
      floor(col(metricCol) * buckets).cast("long"), lit(0L)),
      lit(buckets - 1L))
    // ONE pass computes the (possibly expensive) metric + bucket; the
    // histogram lane and the tag lane both read the checkpoint instead
    // of re-running the upstream plan (q90's tokenize-and-score scan
    // ran twice before this)
    val withB = rows.withColumn("_rg_bkt", bkt).localCheckpoint()
    val ordM = if (descending) col(metricCol).desc else col(metricCol).asc
    // tiny frame: per-(key, bucket) counts, then per bucket the count
    // of rows in strictly BETTER buckets and the key total
    val wKey = Window.partitionBy(keyCol)
    val ordB = if (descending) col("_rg_bkt").desc else col("_rg_bkt").asc
    val hist = withB.groupBy(keyCol, "_rg_bkt").agg(count(lit(1)).as("_rg_cnt"))
      .withColumn("_rg_better",
        coalesce(sum("_rg_cnt").over(
          wKey.orderBy(ordB).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_rg_n", sum("_rg_cnt").over(wKey))
    // verdict per bucket: the whole bucket is inside the kept prefix
    // iff its LAST row's rank passes (better+cnt)·den ≤ n·num; it is
    // entirely outside iff its FIRST row's rank fails
    val verdict = hist.select(col(keyCol), col("_rg_bkt"),
      ((col("_rg_better") + col("_rg_cnt")) * keepDen <= col("_rg_n") * keepNum)
        .as("_rg_all"),
      ((col("_rg_better") + 1L) * keepDen > col("_rg_n") * keepNum).as("_rg_none"),
      col("_rg_better"), col("_rg_n"))
    // materialize the verdict ONCE as a driver-local relation (bounded
    // by the broadcast contract above — the same bounded-#keys driver
    // read as quotaSample's seat allocation). Referencing the lazy
    // frame from both lanes would recompute the histogram aggregation
    // per lane — each lane's filter pushes into its broadcast subtree,
    // making the two exchanges non-identical and defeating reuse.
    // limit(max+1) bounds the driver read: a verdict PAST the cap
    // means extreme key cardinality, where per-key groups are small
    // and the plain window form was never the skew risk — fall back
    // instead of OOMing the driver.
    val spark = df.sparkSession
    val verdictRows = verdict.limit(maxVerdictRows + 1).collect()
    if (verdictRows.length > maxVerdictRows) {
      val ranked = withB
        .withColumn("_rg_rn", row_number().over(wKey.orderBy(ordM, col(idCol))))
        .withColumn("_rg_kn", count(lit(1)).over(wKey))
        .filter(col("_rg_rn").cast("long") * keepDen <= col("_rg_kn") * keepNum)
      return ranked.select(df.columns.map(col): _*)
    }
    val verdictLocal = spark.createDataFrame(
      java.util.Arrays.asList(verdictRows: _*), verdict.schema)
    val tagged = withB.join(broadcast(verdictLocal), Seq(keyCol, "_rg_bkt"))
    val keptWhole = tagged.filter(col("_rg_all"))
    // only the boundary bucket's rows enter a window — partitioned by
    // (key, bucket), so the sort is ~n_key/buckets and parallel
    val boundary = tagged.filter(!col("_rg_all") && !col("_rg_none"))
      .withColumn("_rg_rn", row_number().over(
        Window.partitionBy(keyCol, "_rg_bkt").orderBy(ordM, col(idCol))))
      .filter((col("_rg_better") + col("_rg_rn").cast("long")) * keepDen
        <= col("_rg_n") * keepNum)
    keptWhole.select(df.columns.map(col): _*)
      .union(boundary.select(df.columns.map(col): _*))
  }

  /** Token-budget selection: walk the corpus in `metricCol`-descending
    * order (ties → `idCol`) and keep each row while the RUNNING total
    * of `costCol` stays ≤ `budget` — "take the best documents until
    * the token budget is spent", the data-selection step between
    * scoring and training. Keeps the exact greedy prefix (the first
    * row that would overflow stops the take, like a sequential scan
    * would), and returns the kept rows with their global running
    * total appended as `cum_cost`.
    *
    * Scale shape — a distributed prefix sum, NOT a global window (a
    * naive `Window.orderBy(metric)` with no partition key pulls the
    * whole corpus into ONE task):
    *   1. quantize the metric into `buckets` coarse buckets (the
    *      mapping is monotone, so bucket-major order == global order);
    *   2. per-bucket cost totals (map-side-combined aggregate,
    *      #buckets rows) → running offsets via a window over that tiny
    *      frame;
    *   3. broadcast the offsets back and compute each row's global
    *      running total as `bucket_offset + within-bucket running
    *      sum` — the within-bucket windows are PARTITIONED by bucket,
    *      so they parallelize across the cluster and each task sorts
    *      only ~corpus/buckets rows.
    * Raising `buckets` bounds the per-task sort; the result is
    * identical for any bucket count.
    *
    * Contract: `metricCol` must be non-null and in [0, 1) ∪ {1} (a
    * score/ratio — the quantizer is floor(metric · buckets) clamped);
    * `costCol` non-null, non-negative integers. NULL- and NaN-metric
    * rows are excluded (their position in the order would be
    * engine-defined / ANSI-fatal). */
  def budgetSelect(
      df: DataFrame,
      metricCol: String,
      costCol: String,
      budget: Long,
      buckets: Int = 1024,
      idCol: String = "doc_id"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val m = col(metricCol)
    // NaN joins NULL in the exclusion: floor(NaN·buckets) throws under
    // ANSI, and a sorted NaN would outrank every real metric inside
    // bucket 0, breaking the greedy-prefix contract (same rule as
    // relativeRankGate, whose quantizer this shares)
    val base = df
      .filter(m.isNotNull && !isnan(m) && col(costCol).isNotNull)
      .withColumn("_bs_bucket",
        least(floor(m * buckets).cast("long"), lit(buckets.toLong - 1)))
    val offsets = base
      .groupBy("_bs_bucket")
      .agg(sum(col(costCol).cast("long")).as("_bs_total"))
      .withColumn("_bs_offset",
        coalesce(
          sum(col("_bs_total")).over(
            Window.orderBy(col("_bs_bucket").desc)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_bs_bucket"), col("_bs_offset"))
    val wIn = Window.partitionBy("_bs_bucket")
      .orderBy(m.desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(offsets), Seq("_bs_bucket"))
      .withColumn("cum_cost",
        col("_bs_offset") + sum(col(costCol).cast("long")).over(wIn))
      .filter(col("cum_cost") <= budget)
      .drop("_bs_bucket", "_bs_offset")
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
