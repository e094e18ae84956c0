package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join with PREFIX FILTERING (the
  * AllPairs/PPJoin candidate-generation discipline): find every pair
  * of sets whose Jaccard similarity reaches a rational threshold
  * τ = num/den, WITHOUT the all-pairs join — and provably without
  * missing a pair.
  *
  * The filter: order all tokens by ascending global frequency
  * (rarest first; ties by token — one deterministic total order), and
  * for a set of size n keep only its first `n − ⌈τ·n⌉ + 1` tokens as
  * its PREFIX. Two sets with J ≥ τ share at least
  * α = max(⌈τ·|x|⌉, ⌈τ·|y|⌉) elements (J ≥ τ ⇒ |∩| ≥ τ·|x| since
  * |y| ≥ |∩|, and symmetrically), and the globally smallest shared
  * element must sit inside BOTH prefixes: were it past x's prefix,
  * every shared element would be among x's last ⌈τ·|x|⌉ − 1 tokens —
  * fewer than α. So joining on prefix tokens alone loses nothing;
  * the verify pass computes the exact intersection and keeps
  * `den·|∩| ≥ num·(|x|+|y|−|∩|)` — pure integer arithmetic, no float
  * similarity anywhere (cross-multiplication, the q90/q123
  * discipline).
  *
  * Why this scales where LSH-banding ([[Dedup]]) is probabilistic:
  * prefix filtering is EXACT (no false negatives by construction),
  * and the candidate volume is governed by the frequency of PREFIX
  * tokens — the rarest of each set, so a token of global frequency f
  * contributes at most f²/2 candidate pairs and hot boilerplate
  * tokens (high f) are exactly the ones excluded from prefixes.
  * The per-set ordering window partitions by set id (uniform-sized
  * sets — no hot key); the verify join shuffles on the pair key and
  * materializes ONLY intersection rows (the token is part of the
  * equi-join key). Set sizes ride per-row from the input arrays —
  * no sizes aggregate, no post-verify size joins.
  */
object SetJoin {

  /** `sets`: one row per set — (id: long, toks: array<string>) with
    * DISTINCT elements (use `array_distinct` upstream; duplicate
    * elements would inflate sizes and intersections). Returns
    * (id_a, id_b, n_a, n_b, inter, uni) for every pair with
    * Jaccard ≥ num/den, id_a < id_b. Empty sets never pair (J
    * undefined); they are dropped.
    *
    * `materialize` (default true) localCheckpoints the exploded
    * membership frame and the prefix frame — the [[Graph]] lineage
    * discipline: the membership frame is consumed four times
    * (frequencies, ordering, both verify sides) and the prefix frame
    * twice (both candidate sides), and the re-derived subtrees do not
    * canonicalize equal, so without the cut the caller's
    * tokenize+shingle pipeline re-executes per consumer. RDD blocks,
    * GC-cleaned, never CacheManager. */
  def jaccardJoin(sets: DataFrame, num: Long, den: Long,
      materialize: Boolean = true): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"threshold must satisfy 0 < num/den <= 1: $num/$den")
    def mat(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    // materialize the per-set ARRAY frame before exploding: the
    // explode's plan otherwise inlines the caller's array-building
    // expression under the Generate and interpreted eval rebuilds the
    // whole array PER OUTPUT ROW (measured 6.8 s of a 0.3 s explode at
    // sf0.1 — the ExtractGenerator re-inline form of the NOTES
    // interpreted-HOF lesson). One row per set — tiny.
    val arrays = mat(sets
      .select(col("id").cast("long").as("id"), col("toks"))
      .where(size(col("toks")) >= 1))
    // per-row set size from the array — no sizes aggregate anywhere
    val t = mat(arrays
      .select(col("id"), size(col("toks")).cast("long").as("n"),
        explode(col("toks")).as("tok")))
    // global frequency of each token — the prefix order key.
    // broadcast hint: checkpointed frames carry NO stats
    // (defaultSizeInBytes = max), so every downstream join would plan
    // as SMJ — full sorts of the membership frame (the pageRank
    // lesson; measured 3.4 → 1.3 s on the prefix stage). At
    // vocabulary sizes past broadcast reach, drop the hints and
    // pre-bucket membership + frequency frames by token instead.
    val dfreq = t.groupBy("tok").agg(count(lit(1)).as("df"))
    val ordered = t.join(broadcast(dfreq), "tok")
      .withColumn("rank",
        row_number().over(Window.partitionBy("id").orderBy("df", "tok")))
      // prefix length n − ⌈num·n/den⌉ + 1 in integer arithmetic
      .withColumn("pref_len",
        col("n") - expr(s"(${num}L * n + ${den - 1}L) div ${den}L") + 1)
    val prefix = mat(ordered.where(col("rank") <= col("pref_len"))
      .select(col("id"), col("tok")))
    // candidates: sets sharing ANY prefix token (distinct pairs).
    // EXPLICIT width after the distinct, on a DIFFERENT key set than
    // the distinct's exchange: AQE coalesces the aggregate output to a
    // handful of partitions, and since the verify joins below are
    // broadcast-shaped, verify parallelism IS the candidate frame's
    // partitioning — left coalesced, 400k interpreted array_intersect
    // calls serialize onto ~3 cores (measured 2×3.5 s stages; the q48
    // explicit-width lesson). A repartition on the SAME (id_a, id_b)
    // keys canonicalizes into the distinct's exchange and gets
    // coalesced with it — the id_a-only hash is a real second
    // exchange of skinny pair rows that AQE must leave at full width.
    val shufflePartitions = sets.sparkSession.sessionState.conf.numShufflePartitions
    val cand = prefix.select(col("id").as("id_a"), col("tok"))
      .join(prefix.select(col("id").as("id_b"), col("tok")), "tok")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .repartition(shufflePartitions, col("id_a"))
    // verify: exact intersection PER PAIR via array_intersect over the
    // materialized array frame — one row per candidate pair, two id
    // equi-joins, no row-per-shared-token expansion. The alternative
    // (pair ⋈ membership rows ⋈ membership rows + count) shuffles
    // Σ|set_a| rows per candidate (21M at sf0.1, measured 4.1 s) where
    // this shape moves #candidates rows with array payloads (0.9 s).
    // At extreme set sizes the array payload per row grows, but so
    // does the row expansion of the alternative — the pair-local
    // intersect also keeps the post-join work a pure projection
    // (map-side, no second aggregate).
    // broadcast: same no-stats reasoning as dfreq — at corpus sizes
    // past broadcast reach this becomes a shuffle join on the id,
    // which is the correct generic plan (one row per candidate pair
    // either way)
    // mat() before the threshold filter: pushed through the
    // projection, the filter lands IN the join condition and the
    // whole intersect tree evaluates three times per pair (filter ×2
    // via substitution + projection — interpreted HOFs have no CSE,
    // NOTES lesson #2). The checkpoint pins the per-pair numbers as
    // attributes; the frame is #candidates × 5 longs.
    val inter = mat(cand
      .join(broadcast(arrays.select(col("id").as("id_a"), col("toks").as("toks_a"))), "id_a")
      .join(broadcast(arrays.select(col("id").as("id_b"), col("toks").as("toks_b"))), "id_b")
      .select(col("id_a"), col("id_b"),
        size(col("toks_a")).cast("long").as("n_a"),
        size(col("toks_b")).cast("long").as("n_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long").as("inter")))
    inter
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .where(lit(den) * col("inter") >= lit(num) * col("uni"))
      .select("id_a", "id_b", "n_a", "n_b", "inter", "uni")
  }
}
