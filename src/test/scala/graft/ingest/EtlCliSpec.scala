package graft.ingest

import graft.SparkSpec
import java.nio.file.Files

class EtlCliSpec extends SparkSpec {

  test("arg parsing mirrors the reference CLI") {
    val c = EtlCli.parse(List("--source", "s.csv", "--out", "/tmp/o",
      "--country", "India", "--antigen", "dtp3",
      "--start-year", "2001", "--pre-years", "4", "--post-years", "3"))
    assert(c == EtlCli.Config("s.csv", "/tmp/o", Some("India"), Some("dtp3"), 2001, 4, 3))
    intercept[IllegalArgumentException](EtlCli.parse(List("--nope")))
  }

  test("etl-only run publishes raw + fact; analysis run adds artifact + stats") {
    val dir = Files.createTempDirectory("graft_cli")
    val csv = dir.resolve("wide.csv")
    val rows = (1996 to 2003).map(y => s"S,$y,${10.0 + y - 1996}").mkString("\n")
    Files.writeString(csv, s"entity,year,coverage__x\n$rows\n")
    val out = dir.resolve("warehouse").toString

    // ETL only (no selection) — the reference's bare `python etl_pipeline.py`
    val none = EtlCli.run(spark, EtlCli.Config(csv.toString, out))
    assert(none.isEmpty)
    assert(spark.read.parquet(s"$out/immunization").count() == 8)
    assert(spark.read.parquet(s"$out/owid_raw").columns.contains("coverage__x"))

    // with a selection — analysis path
    val row = EtlCli.run(spark, EtlCli.Config(csv.toString, out,
      Some("S"), Some("x"), startYear = 2000, preYears = 4, postYears = 3)).get
    assert(row.getAs[String]("verdict") == "significant_increase")
    assert(new java.io.File(s"$out/coverage_S_x").listFiles()
      .exists(_.getName.endsWith(".csv")))

    // unknown selection aborts like the reference's empty-series guard
    intercept[IllegalArgumentException](
      EtlCli.run(spark, EtlCli.Config(csv.toString, out, Some("Nowhere"), Some("x"))))
  }
}
