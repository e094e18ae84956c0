package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate span removal (the C4/RefinedWeb "remove
  * lines repeated across documents" cleanup, at token-span granularity
  * since this corpus has no line structure): any word k-gram appearing
  * in ≥ `minDocs` distinct documents is boilerplate, and every token
  * covered by a boilerplate k-gram occurrence is removed; the document
  * is reassembled from the surviving tokens.
  *
  * Plan shape (and why it scales):
  *   1. one `posexplode` of the token array (narrow);
  *   2. k-grams formed per position with `lead` windows — partitioned
  *      by doc, so the "shuffle" is one hash exchange on doc_id that
  *      every later window REUSES (no second exchange);
  *   3. the boilerplate dictionary is a grouped distinct-count — at
  *      100 TB this is the one real shuffle (on gram), and its output
  *      (grams above threshold) is small ⇒ broadcast back;
  *   4. coverage is a windowed running max over marked gram STARTS
  *      (`rows between k-1 preceding and current`), not a range
  *      self-join — per-doc linear, no quadratic term;
  *   5. reassembly is one conditional `collect_list(struct(pos,
  *      token))` per doc over the same doc_id partitioning, sorted
  *      in-row (bounded by doc length, not corpus size) — no join
  *      back to the input, so nothing corpus-sized is broadcast.
  *
  * The gram stream is deliberately evaluated twice (dictionary build +
  * marking): recompute of a narrow projection beats materializing it
  * through a shuffle at corpus scale; callers that iterate (multiple
  * thresholds) should persist the tokenized frame first.
  */
object Boilerplate {

  /** Returns (doc_id, n_tokens, n_kept, cleaned).
    *
    * `broadcastDict` opts into a forced broadcast of the boilerplate
    * dictionary. The default leaves the join strategy to the planner
    * (`autoBroadcastJoinThreshold` / AQE's runtime stats): with
    * `minDocs=2` on a real web corpus the shared-gram dictionary is
    * NOT small — a hard hint would bypass the threshold and can OOM
    * the driver, and when AQE sees it oversized the safe fallback is
    * the shuffle join on `gram` (a 16-byte-digest-like uniform key).
    */
  def removeBoilerplateSpans(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5,
      minDocs: Int = 2,
      broadcastDict: Boolean = false): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val toks = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        posexplode(col("toks")).as(Seq("pos0", "token")))
      .withColumn("pos", col("pos0") + 1).drop("pos0")
    // k-gram starting at each position (null within k-1 of the end)
    val gramCol: Column = {
      val parts = col("token") +: (1 until k).map(i => lead(col("token"), i).over(byDoc))
      // concat_ws skips NULLs, so guard: a start needs all k tokens
      when(parts.last.isNotNull, concat_ws(" ", parts: _*))
    }
    val grams = toks.withColumn("gram", gramCol)
    val boiler = grams.filter(col("gram").isNotNull)
      .groupBy("gram")
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("gram"), lit(1).as("bp"))
    val marked = grams
      .join(if (broadcastDict) broadcast(boiler) else boiler, Seq("gram"), "left")
      .withColumn("covered",
        max(coalesce(col("bp"), lit(0)))
          .over(byDoc.rowsBetween(-(k - 1), Window.currentRow)))
    // ONE conditional aggregation covers every doc (split yields ≥1
    // position even for empty text, and collect_list skips the NULLs
    // of removed positions) — no join back to the input, so nothing
    // row-count-shaped is ever broadcast or re-scanned.
    marked
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("covered") === 0, 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("covered") === 0, struct(col("pos"), col("token"))))),
            x => x.getField("token")),
          " ").as("cleaned"))
  }
}
