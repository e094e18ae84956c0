package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  // seeded defects: one dup PK, one null qty, one out-of-range qty,
  // one bad flag, two orphan keys
  private lazy val bad = Seq(
    (1L, 1, Some(10.0), "A"),
    (1L, 1, Some(99.0), "A"),   // dup PK + out of range
    (2L, 1, None, "N"),         // null quantity
    (3L, 1, Some(5.0), "X"),    // bad flag
    (7L, 1, Some(5.0), "R"),    // orphan (ref has 1,2,3)
    (8L, 1, Some(5.0), "R"))    // orphan
    .toDF("k", "ln", "qty", "flag")
  private lazy val ref = Seq(1L, 2L, 3L).toDF("rk")

  test("row checks count seeded violations in one scan") {
    val got = Validation.rowChecks(bad, Seq(
      Validation.RowCheck("range", !col("qty").between(1, 50)),
      Validation.RowCheck("domain", !col("flag").isin("A", "N", "R")),
      Validation.RowCheck("complete", col("qty").isNull)))
      .as[(String, Long)].collect().toMap
    // null qty: between -> null -> NOT null -> null -> no violation
    assert(got == Map("range" -> 1L, "domain" -> 1L, "complete" -> 1L), got.toString)
  }

  test("uniqueness and referential checks") {
    assert(Validation.uniquenessCheck("pk", bad, Seq("k", "ln"))
      .as[(String, Long)].head() == ("pk", 1L))
    assert(Validation.referentialCheck("fk", bad, "k", ref, "rk")
      .as[(String, Long)].head() == ("fk", 2L))
  }

  test("suite unions verdicts with passed flags") {
    val rep = Validation.suite(
      Validation.rowChecks(bad, Seq(
        Validation.RowCheck("range", !col("qty").between(1, 50)))),
      Validation.uniquenessCheck("pk", bad, Seq("k", "ln")),
      Validation.referentialCheck("fk", bad.filter(col("k") < 7), "k", ref, "rk"))
      .as[(String, Long, Boolean)].collect()
    assert(rep.toSeq == Seq(("fk", 0L, true), ("pk", 1L, false), ("range", 1L, false)))
  }

  test("profile casts after aggregating (numeric min is numeric, not lexicographic)") {
    val df = Seq((9L, "b"), (10L, "a"), (100L, "c")).toDF("n", "s")
    val p = Validation.profile(df, Seq("n", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("n")._5 == "9" && p("n")._6 == "100",
      s"lexicographic min/max would be 10/9: ${p("n")}")
    assert(p("s")._5 == "a" && p("s")._6 == "c")
    assert(p("n")._2 == 3 && p("n")._3 == 0 && p("n")._4 == 3)
  }

  test("profile counts nulls and distincts per column") {
    val df = Seq(Some(1.5), None, Some(1.5), Some(2.25)).toDF("v")
    val r = Validation.profile(df, Seq("v"), decimal4 = Set("v"))
      .as[(String, Long, Long, Long, String, String)].head()
    assert(r == ("v", 4L, 1L, 2L, "1.5000", "2.2500"), r.toString)
  }
}
