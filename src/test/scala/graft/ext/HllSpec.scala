package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups with known distinct cardinalities (ids overlap across
  // groups on purpose — registers must be per-group).
  private lazy val df = {
    val rows =
      (1 to 4000).map(i => ("a", i.toLong)) ++        // 4000 distinct
        (1 to 4000).map(i => ("a", i.toLong)) ++      // duplicated once
        (1 to 900).map(i => ("b", (i % 300).toLong)) ++ // 300 distinct
        (1 to 3).map(i => ("c", i.toLong))            // 3 distinct
    rows.toDF("g", "id")
  }
  private val exact = Map("a" -> 4000.0, "b" -> 300.0, "c" -> 3.0)

  private def errors(mirrorable: Boolean): Map[String, Double] =
    Hll.distinctEstimate(df, Seq("g"), col("id"), mirrorable)
      .select("g", "est_distinct").as[(String, Double)].collect()
      .map { case (g, est) => g -> math.abs(est - exact(g)) / exact(g) }
      .toMap

  test("both hash lanes estimate within ~3 standard errors (m=256 => 6.5% sigma)") {
    for (lane <- Seq(true, false); (g, err) <- errors(lane)) {
      assert(err < 0.20, s"group $g lane mirrorable=$lane error $err")
    }
  }

  test("NULL ids are ignored in BOTH lanes — no phantom distinct, no phantom register group") {
    // r15 edge sweep: Spark's xxhash64(NULL) is the SEED (42), not
    // NULL — unguarded, the production lane counted a NULL id as one
    // phantom value; and a null hash formed a NULL-register group that
    // inflated n_regs (corrupting v_empty/s_total) in the md5 lane too
    val withNulls = Seq(
      ("g", Some("x")), ("g", Some("y")), ("g", None), ("g", None)
    ).toDF("g", "id")
    val clean = Seq(("g", "x"), ("g", "y")).toDF("g", "id")
    for (lane <- Seq(true, false)) {
      val a = Hll.distinctEstimate(withNulls, Seq("g"), col("id"), lane)
        .select("n_regs", "v_empty", "s_total", "est_distinct").collect().head
      val b = Hll.distinctEstimate(clean, Seq("g"), col("id"), lane)
        .select("n_regs", "v_empty", "s_total", "est_distinct").collect().head
      assert(a === b, s"lane mirrorable=$lane: NULL ids must be invisible")
      assert(a.getAs[Long]("n_regs") <= 2L)
    }
    // the aggregate face agrees: HllRegs over the null-bearing frame
    // equals HllRegs over the clean frame, byte for byte
    for (lane <- Seq(true, false)) {
      def sketch(d: org.apache.spark.sql.DataFrame): Array[Byte] =
        d.agg(HllRegs.agg(Hll.hash60(col("id"), lane)).as("r"))
          .collect().head.getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(sketch(withNulls), sketch(clean)))
    }
  }

  test("small-range groups take the linear-counting branch and are near-exact") {
    val c = Hll.distinctEstimate(df, Seq("g"), col("id"), mirrorable = true)
      .filter(col("g") === "c").select("v_empty", "est_distinct")
      .as[(Long, Double)].head()
    assert(c._1 > 0, "3 ids cannot fill all 256 registers")
    assert(math.abs(c._2 - 3.0) < 0.5, s"linear counting on 3 ids gave ${c._2}")
  }

  test("register frames are elementwise-max mergeable across splits") {
    val (left, right) = (df.filter(col("id") % 2 === 0), df.filter(col("id") % 2 =!= 0))
    val merged = Hll.registers(left, Seq("g"), col("id"), mirrorable = true)
      .unionAll(Hll.registers(right, Seq("g"), col("id"), mirrorable = true))
      .groupBy("g", "reg").agg(max("m").as("m"))
    val whole = Hll.registers(df, Seq("g"), col("id"), mirrorable = true)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty,
      "merge of split registers must equal the whole-corpus registers")
    // and therefore identical estimates
    val estM = Hll.estimate(merged, Seq("g")).select("g", "est_distinct")
      .as[(String, Double)].collect().toMap
    val estW = Hll.estimate(whole, Seq("g")).select("g", "est_distinct")
      .as[(String, Double)].collect().toMap
    assert(estM == estW)
  }

  test("the register fold is the documented exact integer: s_total check on a tiny set") {
    // one group, ids 1..3 — recompute S by hand from the register frame
    val one = Seq(("x", 1L), ("x", 2L), ("x", 3L)).toDF("g", "id")
    val regs = Hll.registers(one, Seq("g"), col("id"), mirrorable = true)
      .select("reg", "m").as[(Long, Int)].collect()
    val expected = regs.map { case (_, m) => 1L << (53 - m) }.sum +
      (256L - regs.length) * (1L << 53)
    val got = Hll.estimate(Hll.registers(one, Seq("g"), col("id"), mirrorable = true),
      Seq("g")).select("s_total").as[Long].head()
    assert(got == expected)
  }
}
