package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace runs, leading/trailing space") {
    val r = Seq("a b  c", "  x ", "one", "a a a").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.distinctTokenCount(col("text")).as("d"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(r.toSeq == Seq((3, 3), (1, 1), (1, 1), (3, 1)))
  }

  test("BPE-ish tokenizer splits punctuation and numbers out") {
    val r = Seq("don't stop, it's 42 tokens!").toDF("text")
      .select(TextAnalysis.tokensBpeIsh(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(r == Seq("don", "'t", "stop", ",", "it", "'s", "42", "tokens", "!"))
  }

  test("quality score stays in [0,1] on real documents") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val bounds = docs.select(
      min(TextAnalysis.qualityScore(col("text"))).as("lo"),
      max(TextAnalysis.qualityScore(col("text"))).as("hi")).collect().head
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
  }

  test("quality score guards empty text (no ANSI division error)") {
    val r = Seq("", "   ").toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q")).collect()
    assert(r.forall(row => !row.isNullAt(0)))
  }

  test("langId picks the language whose function words dominate") {
    val r = Seq(
      "the cat sat on the mat and it is a good day for the dog",
      "le chat est sur le tapis et la maison est une belle chose que je vois",
      "el gato es un animal y la casa es una cosa que los hombres ven",
      "der hund und die katze sind ein gutes team zu hause mit den kindern",
      "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod",
    ).toDF("text")
      .select(TextAnalysis.langIdHeuristic(col("text")).as("lang"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "fr", "es", "de", "und"))
  }

  test("fingerprint is invariant to case and whitespace, not content") {
    val r = Seq("Hello  World", "hello world", " HELLO\tWORLD ", "hello world!")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(_.getString(0))
    assert(r(0) == r(1) && r(1) == r(2))
    assert(r(3) != r(0))
    assert(r(0).matches("[0-9a-f]{32}"))
  }

  test("TextProfile matches the HOF built-in formulation bit-for-bit") {
    // hostile whitespace: tabs/newlines (leading/trailing empty-field
    // semantics of split(trim(s), "\\s+")), empty, all-space, unicode
    val hostile = Seq(
      "plain words here", "", "   ", "\tleading tab", "trailing tab\t",
      "a\t\tb\nc", "one", ". , ; : ! ?", "héllo wörld héllo",
      "the of to and the the", "le la les de et", "  padded  ")
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("text")).limit(300)
      .union(hostile.toDF("text"))
    // legacy formulations, inlined (what TextAnalysis used pre-profile)
    def toks(t: org.apache.spark.sql.Column) = split(trim(t), "\\s+")
    val legacy = docs.select(
      size(toks(col("text"))).as("n"),
      size(array_distinct(toks(col("text")))).as("d"),
      length(regexp_replace(col("text"), "[^.,;:!?]", "")).as("p"),
      size(filter(toks(col("text")),
        t => t.isin(TextAnalysis.englishStopwords: _*))).as("en"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val profiled = docs.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.distinctTokenCount(col("text")).as("d"),
      TextAnalysis.punctCount(col("text")).as("p"),
      TextProfile.profile(col("text"))("stop_hits")(0).as("en"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(profiled.toSeq == legacy.toSeq)
  }

  test("TextProfile appears once per projection (subexpression-eliminated)") {
    val docs = Seq(("x", "the quick brown fox")).toDF("doc_id", "text")
    val plan = docs.select(
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langIdHeuristic(col("text")).as("l"),
      TextAnalysis.tokenCount(col("text")).as("n"))
      .queryExecution.executedPlan
    val codegen = org.apache.spark.sql.execution.debug.codegenString(plan)
    val computeCalls = "graft\\.ext\\.TextProfile\\.compute".r.findAllIn(codegen).size
    assert(computeCalls <= 2, // subexpr-eliminated: 1 shared eval (+1 in the subexpr function def)
      s"expected one shared TextProfile evaluation, found $computeCalls:\n" +
        codegen.take(2000))
  }
}
