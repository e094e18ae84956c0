package graft

import org.apache.spark.sql.functions._
import graft.ext.Iso3166

/** Full ISO-3166 dim: coverage, normalization, alias resolution, and
  * the broadcast miss-fallback path (the reference resolves ANY
  * country name through pycountry's dataset with fuzzy lookup;
  * the engine's stand-in must hit the same names deterministically). */
class Iso3166Spec extends SparkSpec {

  test("dim covers all 249 officially assigned alpha-2 codes, keys distinct") {
    assert(Iso3166.officialNames.size == 249)
    assert(Iso3166.officialNames.map(_._2).distinct.size == 249)
    // every alias resolves to an officially assigned code
    val codes = Iso3166.officialNames.map(_._2).toSet
    assert(Iso3166.aliases.forall { case (_, a) => codes.contains(a) })
    // normalized keys are unique (aliases never shadow officials)
    assert(Iso3166.dim.map(_._1).distinct.size == Iso3166.dim.size)
  }

  test("normalize: case, diacritics, punctuation, whitespace") {
    assert(Iso3166.normalize("Côte d'Ivoire") == "cote divoire")
    assert(Iso3166.normalize("  VIET   NAM ") == "viet nam")
    assert(Iso3166.normalize("Türkiye") == "turkiye")
    assert(Iso3166.normalize("Curaçao") == "curacao")
    assert(Iso3166.normalize("Guinea-Bissau") == "guinea bissau")
    assert(Iso3166.normalize("Bolivia (Plurinational State of)") ==
      "bolivia plurinational state of")
  }

  test("scala-side and column-side normalization agree") {
    import spark.implicits._
    val names = (Iso3166.officialNames ++ Iso3166.aliases).map(_._1)
    val fromCol = names.toDF("n")
      .select(Iso3166.normalizeCol(col("n")))
      .collect().map(_.getString(0)).toSeq
    assert(fromCol == names.map(Iso3166.normalize))
  }

  test("resolve: officials, aliases, accents and misses") {
    import spark.implicits._
    val in = Seq("Germany", "VIETNAM", "U.S.A.", "Republic of Korea",
      "Côte d'Ivoire", "Czech Republic", "Russia", "Turkey",
      "Narnia", "").toDF("country")
    val got = Iso3166.resolve(in, "country")
      .select("country", "alpha2").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("Germany") == Some("DE"))
    assert(got("VIETNAM") == Some("VN"))
    assert(got("U.S.A.") == Some("US"))
    assert(got("Republic of Korea") == Some("KR"))
    assert(got("Côte d'Ivoire") == Some("CI"))
    assert(got("Czech Republic") == Some("CZ"))
    assert(got("Russia") == Some("RU"))
    assert(got("Turkey") == Some("TR"))
    assert(got("Narnia") == None) // miss → NULL, caller owns fallback
    assert(got("") == None)
  }

  test("resolve is a broadcast join (dim never shuffles the fact side)") {
    import spark.implicits._
    val in = Seq("Germany", "France").toDF("country")
    val plan = Iso3166.resolve(in, "country").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("flagCol: regional-indicator arithmetic reaches plane 1") {
    import spark.implicits._
    val flags = Seq("DE", "US").toDF("alpha2")
      .select(Iso3166.flagCol(col("alpha2")).as("flag"))
      .collect().map(_.getString(0))
    assert(flags(0) == new String(Character.toChars(127462 + 3)) +
      new String(Character.toChars(127462 + 4))) // D, E
    assert(flags(1) == new String(Character.toChars(127462 + 20)) +
      new String(Character.toChars(127462 + 18))) // U, S
  }
}
