package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wide-CSV → tidy fact-table ETL, the reference's `run_etl`
  * (`/root/reference/etl_pipeline.py:49-100`) re-expressed as a lazy
  * Catalyst plan.
  *
  * Stages: schema resolution/validation (fail fast, driver-side on
  * `df.columns` — `etl_pipeline.py:56-66`), wide→long unpivot of the
  * dynamic `coverage__*` column set (`df.melt`, `etl_pipeline.py:68-73`),
  * clean + year-range filter (`etl_pipeline.py:73-75`), and a
  * deduplicated, sorted Parquet write standing in for the SQLite table
  * with composite PK (`etl_pipeline.py:84-95`).
  *
  * Scale notes: the unpivot multiplies rows ×N(antigens) but is a
  * narrow (no-shuffle) transform; dedup is the only shuffle and keys on
  * the full PK so it is maximally parallel; the write repartitions by
  * `country` and sorts within partitions by (country, antigen, year) so
  * parquet row-group min/max stats serve point lookups the way the
  * reference's PK index does (SURVEY §4.2).
  */
object WideCsvIngest {

  val CoveragePrefix = "coverage__"

  final case class ResolvedColumns(entity: String, year: String, coverage: Seq[String])

  /** Case-insensitive resolution of the entity/year columns plus
    * data-driven discovery of the `coverage__*` value columns; raises
    * with a schema sample otherwise ("OWID schema changed" guard,
    * `etl_pipeline.py:56-66`). Never hard-code the antigen set — it
    * drifts weekly upstream (SURVEY §7.4 #3). */
  def resolveColumns(df: DataFrame): ResolvedColumns = {
    // Locale.ROOT: default-locale lowercasing breaks the match for any
    // header containing an I under tr_TR/az (dotted/dotless i) — same
    // rule as Iso3166.normalize
    val byLower = df.columns.map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
    def need(name: String): String = byLower.getOrElse(name,
      throw new IllegalArgumentException(
        s"required column '$name' missing (schema: ${df.columns.mkString(", ")})"))
    val cov = df.columns
      .filter(_.toLowerCase(java.util.Locale.ROOT).startsWith(CoveragePrefix)).toSeq
    if (cov.isEmpty) throw new IllegalArgumentException(
      s"no '$CoveragePrefix*' columns found (schema: ${df.columns.mkString(", ")})")
    ResolvedColumns(need("entity"), need("year"), cov)
  }

  /** Read the raw wide CSV with header; schema inferred by design — the
    * upstream column set is dynamic (`etl_pipeline.py:53`). */
  def readWideCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Wide → tidy: unpivot, strip the `coverage__` prefix into the
    * antigen key, coerce-or-null the numeric columns, drop missing,
    * filter to the plausible year range (inclusive bounds,
    * `etl_pipeline.py:75`), dedup on the composite PK. */
  def tidy(raw: DataFrame, yearLo: Int = 1980, yearHi: Int = 2100): DataFrame = {
    val cols = resolveColumns(raw)
    tidyColumns(
      raw.unpivot(
        Array(col(cols.entity).as("country"), col(cols.year).as("year")),
        cols.coverage.map(col).toArray,
        "antigen", "coverage_pct"),
      yearLo, yearHi)
      .select("country", "antigen", "year", "coverage_pct")
      // SQLite PK would reject duplicate (country, antigen, year) keys;
      // Spark enforces nothing, so make the convention explicit (S5).
      .dropDuplicates("country", "antigen", "year")
  }

  /** The shared unpivoted→tidy column pipeline — ONE definition for the
    * batch ([[tidy]]) and streaming ([[graft.streaming.IncrementalIngest]])
    * ingests, so the semantics cannot fork.
    *
    * pandas melt keeps NaN then the explicit dropna removes them
    * (etl_pipeline.py:73); Spark unpivot already drops NULL values, but
    * entity/year NULLs still need the drop for parity. The prefix strip
    * is case-INsensitive to match [[resolveColumns]]'s case-insensitive
    * discovery (a `Coverage__MCV1` header must yield antigen `MCV1`,
    * not leak the prefix). */
  private[graft] def tidyColumns(unpivoted: DataFrame, yearLo: Int, yearHi: Int): DataFrame =
    unpivoted
      .withColumn("year", col("year").cast("int"))
      .withColumn("coverage_pct", col("coverage_pct").cast("double"))
      .na.drop("any")
      .filter(col("year").between(yearLo, yearHi))
      .withColumn("antigen", regexp_replace(col("antigen"), "(?i)^" + CoveragePrefix, ""))

  /** Publish the tidy fact table as Parquet laid out for point lookups:
    * hash-distributed on country, row-groups sorted by the full PK. */
  def writeFact(fact: DataFrame, path: String, numPartitions: Int = 0): Unit = {
    val repartitioned =
      if (numPartitions > 0) fact.repartition(numPartitions, col("country"))
      else fact.repartition(col("country"))
    repartitioned
      .sortWithinPartitions("country", "antigen", "year")
      .write.mode("overwrite").parquet(path)
  }

  /** Single-file CSV artifact sink (`etl_pipeline.py:152-154`). coalesce(1)
    * is deliberate: these exports are per-(country,antigen) series or
    * small stat frames, never the raw fact table. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Filename sanitization for artifact names (`etl_pipeline.py:152`):
    * spaces → underscores, slashes → dashes. Driver-side scalar. */
  def sanitizeName(s: String): String = s.replace(" ", "_").replace("/", "-")
}
