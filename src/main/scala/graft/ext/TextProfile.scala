package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text profile as a native codegen'd `Expression` (SURVEY
  * §7.3 preference (b)) — the per-document counters every downstream
  * text score needs, computed in a single byte-level scan:
  *
  *   struct(n_tokens, n_distinct, n_punct, n_chars, stop_hits[lang])
  *
  * Why: [[TextAnalysis.qualityScore]] + [[TextAnalysis.langIdHeuristic]]
  * built from HOF built-ins evaluate `split` + an interpreted
  * `ArrayFilter` lambda per stopword list — ~10 regex tokenizations
  * and O(tokens × stopwords) boxed comparisons per document, repeated
  * again wherever a filter predicate duplicates the projection (NOTES
  * r1 lesson #1). This expression tokenizes once, counts everything in
  * one loop with a hash lookup per token, and — being deterministic —
  * is subexpression-eliminated across a projection, so quality AND
  * lang-ID together cost one scan per row.
  *
  * Bit-parity contract (the DuckDB oracles must keep passing
  * unchanged): tokenization replicates `split(trim(text), "\\s+")` —
  * trim strips 0x20 only; fields are the between-run substrings of
  * `[\t\n\x0B\f\r ]+` runs with Java's limit=-1 semantics (leading
  * empty field when the trimmed text starts with whitespace, trailing
  * empty field when it ends with one, [""] for empty input). Punct and
  * char counts run over the ORIGINAL untrimmed text. All compared
  * bytes are ASCII, so byte-level scanning is exact for any UTF-8.
  */
case class TextProfile(child: Expression, langWords: Seq[(String, Seq[String])])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def prettyName: String = "text_profile"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("stop_hits", ArrayType(IntegerType, containsNull = false), nullable = false)))

  @transient private lazy val lookup = TextProfile.buildLookup(langWords)

  override def nullSafeEval(input: Any): Any =
    TextProfile.compute(input.asInstanceOf[UTF8String], lookup, langWords.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lookupRef = ctx.addReferenceObj("stopLookup", lookup,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, Integer>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.TextProfile.compute($c, $lookupRef, ${langWords.size});")
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

object TextProfile {

  def buildLookup(langWords: Seq[(String, Seq[String])])
      : java.util.HashMap[UTF8String, Integer] = {
    require(langWords.size <= 31, "bitmask lookup supports at most 31 languages")
    val m = new java.util.HashMap[UTF8String, Integer]()
    langWords.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String,
              lookup: java.util.HashMap[UTF8String, Integer],
              nLangs: Int): InternalRow = {
    // punct + chars over the ORIGINAL text
    val raw = text.getBytes
    var punct = 0
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?') punct += 1
      i += 1
    }
    val nChars = text.numChars()

    // tokenize the trimmed text (trim strips 0x20 only — StringTrim parity)
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw(lo) == 0x20) lo += 1
    while (hi > lo && raw(hi - 1) == 0x20) hi -= 1

    var nTokens = 0
    val distinct = new java.util.HashSet[UTF8String]()
    val stopHits = new Array[Int](nLangs)

    def field(start: Int, end: Int): Unit = {
      nTokens += 1
      val tok = UTF8String.fromBytes(raw, start, end - start)
      distinct.add(tok)
      val mask = lookup.get(tok)
      if (mask != null) {
        var l = 0
        val m = mask.intValue()
        while (l < nLangs) {
          if (((m >> l) & 1) == 1) stopHits(l) += 1
          l += 1
        }
      }
    }

    // Java split(regex, -1) field semantics over \s+ runs
    var start = lo
    i = lo
    while (i < hi) {
      if (isWs(raw(i))) {
        field(start, i) // empty when a run starts the string
        while (i < hi && isWs(raw(i))) i += 1
        start = i
      } else i += 1
    }
    field(start, hi) // tail field; empty when a run ended the string or input is empty

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, distinct.size(), punct, nChars,
        new GenericArrayData(stopHits.map(Integer.valueOf(_)).toArray[Any])))
  }

  /** Column API over [[TextAnalysis.stopwordsByLang]] (en at index 0). */
  def profile(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TextProfile(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        TextAnalysis.stopwordsByLang))
}
