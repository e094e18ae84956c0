package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter from the driver's `events` table (TESTDATA.md) to the
  * reference-shaped fact table (country, antigen, year, coverage_pct).
  *
  * Role mapping per FIXTURES.md: user cohort (user_id % 10) ≈ country,
  * event_type ≈ antigen, day-of-month ≈ year (the sf events span one
  * month), per-cell mean value ≈ coverage_pct. This gives every
  * downstream reference-parity operator a real multi-series input with
  * enough points per window for the t-test path.
  *
  * coverage_pct is computed as an EXACT mean — the values are summed as
  * DECIMAL (order-independent) and divided by the count — so both
  * engines produce bitwise-identical doubles. A plain double `avg`
  * differs across engines in the last ulp (accumulation order), and the
  * event values are quantized, which makes `round(avg, k)` land exactly
  * on half-way ties that Spark and DuckDB resolve differently.
  */
object EventsFact {

  /** The events parquet's `ts` physical shape has varied across driver
    * data generations: TIMESTAMP(NANOS) (read as long nanos via
    * `nanosAsLong`, since the vectorized reader rejects NANOS) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ).
    * [[canonicalTs]] folds either into ONE canonical type — TIMESTAMP
    * (instant) — so every downstream event-time operation
    * (`unix_micros`, epoch casts, watermarks) resolves identically
    * regardless of which generation is on disk. All entry points pin
    * the session to UTC, so the NTZ wall clock and the instant agree
    * with the DuckDB oracle's naive-timestamp arithmetic. */
  def canonicalTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      // long nanos → micros; integer `div` — a double division would
      // lose precision above 2^53 ns
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** The on-disk schema of the events table (probed from the parquet
    * footer) — streaming readers need an explicit schema, and guessing
    * the ts shape instead of probing is how a data regeneration turns
    * into silently-wrong timestamps (a micros column read as long).
    *
    * Session-conf contract: the probe runs under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (a TIMESTAMP(NANOS)
    * footer would otherwise fail schema conversion outright). If the
    * probe finds a long-typed ts the conf STAYS set — the subsequent
    * reads/streams built from this schema need it at execution time
    * too, and [[canonicalTs]] is the single place that long shape is
    * rebuilt into a timestamp. On non-nanos generations (the current
    * micros one) the prior value is RESTORED, so probing a schema no
    * longer mutates how unrelated long-nanos parquet reads behave for
    * the rest of the session. */
  def eventsSchema(spark: SparkSession, sfDir: String): org.apache.spark.sql.types.StructType = {
    val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    def restore(): Unit = prior match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // restore on the throw path too (missing/corrupt path must not
    // leave the probe's conf mutation behind), and on the success path
    // unless this generation's ts really is long-nanos
    val schema =
      try spark.read.parquet(s"$sfDir/events.parquet").schema
      catch { case e: Throwable => restore(); throw e }
    val tsIsNanosLong = schema.fields.exists(f =>
      f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
    if (!tsIsNanosLong) restore()
    schema
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // the probe decides whether the nanosAsLong conf must stay set for
    // this generation (and restores it otherwise) — same contract as
    // the streaming readers; the footer re-read is FileStatusCache-warm
    eventsSchema(spark, sfDir)
    canonicalTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** The derived fact table is the hub 12+ queries hang off, so it is
    * persisted per (session, dir) — the engine-layer mapping of the
    * reference's result cache (`st.cache_data(ttl=3600)`,
    * `/root/reference/streamlit_app.py:99,111`; SURVEY §4.1). The
    * reference's explicit refresh invalidation (`streamlit_app.py:
    * 144-145`) maps to [[invalidate]]. The reference's TIME-based
    * expiry (`ttl=3600`) is deliberately NOT mirrored: it exists there
    * because the upstream HTTP source mutates under a long-lived UI
    * process, whereas this engine reads immutable parquet snapshots —
    * staleness is a property of the input path, so the correct refresh
    * trigger is explicit ([[invalidate]] on new data), not a wall
    * clock. A deployment with mutating sources would wrap [[fact]]
    * with a (session, dir, floor(now/ttl)) key — the cache structure
    * already supports it. MEMORY_AND_DISK: the fact is
    * orders of magnitude smaller than the raw events (one row per
    * (cohort, type, day)), so this holds at any scale the groupBy holds. */
  def fact(spark: SparkSession, sfDir: String): DataFrame =
    // synchronized: TrieMap.getOrElseUpdate may race the thunk in two
    // threads, and a losing persist() would leak executor storage with
    // no handle to unpersist it (parallel suites / concurrent drivers)
    cache.synchronized {
      cache.getOrElseUpdate((spark, sfDir),
        factUncached(spark, sfDir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  def factUncached(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(
        concat(lit("cohort_"), (col("user_id") % 10).cast("string")).as("country"),
        col("event_type").as("antigen"),
        dayofmonth(col("ts")).as("year"))
      .agg((sum(col("value").cast("decimal(18,6)")).cast("double") / count(col("value")))
        .as("coverage_pct"))

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Drop the persisted fact for a dir (the reference's refresh path).
    * Synchronized on the same monitor as [[fact]]: an invalidation
    * racing a build would otherwise let the build re-insert a frame
    * snapshotted BEFORE the invalidation the caller believes took
    * effect (same fix as Dedup's cacheLock). */
  def invalidate(spark: SparkSession, sfDir: String): Unit =
    cache.synchronized { cache.remove((spark, sfDir)).foreach(_.unpersist()) }

  /** The oracle-side equivalent of [[fact]], as a DuckDB CTE body. */
  val factSql: String =
    """SELECT 'cohort_' || CAST(user_id % 10 AS VARCHAR) AS country,
      |       event_type AS antigen,
      |       CAST(date_part('day', ts) AS INTEGER) AS year,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS coverage_pct
      |FROM events
      |GROUP BY 1, 2, 3""".stripMargin

  /** Prefix a per-query oracle SQL with the shared fact CTE. */
  def withFactCte(body: String): String =
    s"WITH fact AS (\n$factSql\n)\n$body"
}
