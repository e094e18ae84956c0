package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcChunksSpec extends SparkSpec {

  private def chunksOf(texts: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(CdcChunks(col("text")).as("c"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  test("chunks partition the text losslessly") {
    val rnd = new scala.util.Random(5)
    val texts = (1 to 20).map(_ =>
      (1 to 300).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    for ((t, cs) <- texts.zip(chunksOf(texts))) {
      assert(cs.mkString == t, "concatenated chunks must equal the text")
      assert(cs.forall(_.nonEmpty), "no empty chunks")
    }
  }

  test("content-defined realignment: a prefix insertion leaves the " +
      "tail chunks identical") {
    val rnd = new scala.util.Random(11)
    val base = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "INSERTED PREFIX " + base
    val Seq(c0, c1) = chunksOf(Seq(base, edited))
    // offset chunking would shift EVERY boundary; content-defined
    // boundaries realign within one window, so the chunk multisets
    // share (almost) all tail chunks
    val shared = c0.toSet.intersect(c1.toSet)
    assert(shared.size >= c0.size - 2,
      s"expected tail realignment: ${shared.size} shared of ${c0.size}")
    assert(c0.last == c1.last, "final chunks identical")
  }

  test("degenerate shapes: shorter than the window, empty, " +
      "cut-at-end merges with the final boundary") {
    assert(chunksOf(Seq("abc")) == Seq(Seq("abc")),
      "sub-window text is one whole chunk")
    assert(chunksOf(Seq("")) == Seq(Seq.empty),
      "empty text chunks to an empty array")
  }

  test("codepoint semantics: astral-plane characters count once " +
      "(SQL substring/ascii contract) and survive chunking") {
    val emoji = new String(Character.toChars(0x1F600))
    val text = ("x" * 100) + emoji + ("y" * 100)
    val cs = chunksOf(Seq(text)).head
    assert(cs.mkString == text)
  }

  test("deterministic across partitionings and identical for " +
      "identical content") {
    import spark.implicits._
    val texts = (1 to 50).map(i => s"doc content ${i % 5} " * 30)
    val a = texts.toDF("text").repartition(1)
      .select(CdcChunks(col("text"))).collect().map(_.getSeq[String](0))
    val b = texts.toDF("text").repartition(13)
      .select(CdcChunks(col("text"))).collect().map(_.getSeq[String](0))
    assert(a.toSet == b.toSet)
    // identical texts -> identical chunk lists
    assert(texts.zipWithIndex.groupBy(_._1).forall { case (_, g) =>
      g.map(x => a(x._2).toSeq).distinct.size == 1
    })
  }
}
