package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is registered as a [[Q]]
  * in one of the query batches; `queries`/`oracleSql` are derived views
  * of that single registry so names can never drift apart.
  */
object SparkEntry {

  val registry: Seq[Q] =
    CoreParityQueries.all ++ RelationalQueries.all ++ ExtensionQueries.all ++
      AdvancedQueries.all ++ PipelineQueries.all ++ TrainingQueries.all ++
      CorpusOpsQueries.all ++ ScaleOpsQueries.all ++ WarehouseQueries.all ++
      DataOpsQueries.all ++ MaintenanceQueries.all ++ SnapshotQueries.all ++
      GovernanceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full before/after campaign analysis (means, CI, Welch t/p, verdict)
    * for every (cohort, event_type) series — the reference's entire
    * analytics surface as one distributed plan. */
  def entry(spark: SparkSession): DataFrame =
    graft.analysis.CoverageQueries.beforeAfterFull(
      graft.analysis.EventsFact.fact(spark, "/root/testdata/sf0.001"),
      CoreParityQueries.W)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
