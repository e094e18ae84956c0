package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library as a SQL-surfaced Spark extension: a session configured
  * with spark.sql.extensions=graft.GraftExtensions (or retro-fitted via
  * GraftExtensions.install) can call the native expressions from plain
  * SQL with no Scala imports. The spec goes through install() because
  * the shared-JVM test harness may already hold a session, which the
  * builder config cannot amend; both paths register the same
  * GraftExtensions.functions list. */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("GraftExtensionsSpec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.install(s)
    s
  }

  test("simhash64 is callable from SQL and matches the column API") {
    val viaSql = spark.sql(
      "SELECT simhash64(array('alpha', 'beta', 'gamma')) AS h").head().getLong(0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaApi = Seq(Seq("alpha", "beta", "gamma")).toDF("toks")
      .select(graft.ext.SimHash64(col("toks"))).head().getLong(0)
    assert(viaSql == viaApi)
  }

  test("t_cdf/t_ppf round-trip and match reference values") {
    val r = spark.sql(
      """SELECT t_cdf(2.0, 10.0) AS c,
        |       t_ppf(0.975, 10) AS q,
        |       t_cdf(t_ppf(0.9, 7.0), 7.0) AS roundtrip,
        |       t_ppf(0.975, 0) AS invalid""".stripMargin).head()
    // scipy.stats.t.cdf(2.0, 10) = 0.963305...; t.ppf(0.975, 10) = 2.228138...
    // (commons-math3 incomplete-beta/Brent tolerances: ~1e-10 absolute
    // vs scipy — fine for p-values, documented here)
    assert(math.abs(r.getDouble(0) - 0.9633059826662254) < 1e-9)
    assert(math.abs(r.getDouble(1) - 2.2281388519649385) < 1e-8)
    assert(math.abs(r.getDouble(2) - 0.9) < 1e-8)
    assert(r.isNullAt(3))
  }

  test("t functions appear in the catalog with usage docs") {
    val fns = spark.sql("SHOW FUNCTIONS").collect().map(_.getString(0)).toSet
    assert(Set("simhash64", "t_cdf", "t_ppf").subsetOf(fns))
  }
}
