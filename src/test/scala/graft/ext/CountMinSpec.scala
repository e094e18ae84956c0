package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(tokens: Seq[String]): Map[String, Long] =
    tokens.groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }

  test("estimate never underestimates and respects the εN bound") {
    val tokens = (0 until 2000).map(i => s"t${i % 97}") ++ Seq.fill(500)("heavy")
    val ds = tokens.toDF("token").as[String]
    val cms = ds.select(CountMin.sketch()).head().counters
    val exact = exactCounts(tokens)
    val n = tokens.size.toLong
    val eps = math.E / CountMin.DefaultWidth
    exact.foreach { case (t, c) =>
      val est = CountMin.estimate(cms, t, CountMin.DefaultDepth, CountMin.DefaultWidth)
      assert(est >= c, s"$t underestimated: $est < $c")
      assert(est <= c + math.ceil(eps * n).toLong * 4,
        s"$t overestimated far beyond εN: $est vs $c (N=$n)")
    }
  }

  test("md5-lane family: same CMS guarantees, plus a JVM-side mirror " +
      "of the lane arithmetic the SQL oracle inlines") {
    val tokens = (0 until 2000).map(i => s"t${i % 97}") ++ Seq.fill(500)("heavy")
    val cms = tokens.toDF("token").as[String]
      .select(CountMin.sketch(md5Lanes = true)).head().counters
    val exact = exactCounts(tokens)
    val n = tokens.size.toLong
    val eps = math.E / CountMin.DefaultWidth
    exact.foreach { case (t, c) =>
      val est = CountMin.estimateMd5(cms, t, CountMin.DefaultDepth, CountMin.DefaultWidth)
      assert(est >= c, s"$t underestimated: $est < $c")
      assert(est <= c + math.ceil(eps * n).toLong * 4,
        s"$t overestimated far beyond εN: $est vs $c (N=$n)")
    }
    // the base is the md5 hex prefix mod P — the exact expression the
    // DuckDB mirror evaluates; recompute it independently to catch drift
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("heavy".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(CountMin.md5Base("heavy") ==
      java.lang.Long.parseLong(hex.take(15), 16) % Dedup.MinhashP)
  }

  test("sketch is merge-associative: partitioning never changes it") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    def build(parts: Int) =
      docs.repartition(parts)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .as[String].select(CountMin.sketch()).head().counters.toSeq
    assert(build(1) == build(7))
  }

  test("heavy hitter ranks by estimate match exact ranks on a skewed stream") {
    val tokens = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(100)("gamma") ++ (0 until 500).map(i => s"noise$i")
    val cms = tokens.toDF("t").as[String].select(CountMin.sketch()).head().counters
    val est = Seq("alpha", "beta", "gamma").map(t =>
      t -> CountMin.estimate(cms, t, CountMin.DefaultDepth, CountMin.DefaultWidth)).toMap
    assert(est("alpha") > est("beta") && est("beta") > est("gamma"))
    assert(est("alpha") >= 300 && est("beta") >= 200 && est("gamma") >= 100)
  }
}
