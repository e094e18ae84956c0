package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression converters so
  * graft's custom Catalyst expressions can be exposed as `Column`s
  * (Spark 4 removed the public `new Column(expr)` constructor). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) logical plan — for graft's custom
    * logical operators (`Dataset.ofRows` is private[sql]). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

/** Bridge to the checkpoint RDD backing a `localCheckpoint()`'d
  * Dataset. `Dataset.unpersist` only clears CacheManager entries;
  * a local checkpoint's blocks are RDD-level persisted and are
  * otherwise reclaimed only when the RDD object is GC'd and the
  * ContextCleaner notices. Iterative operators that checkpoint per
  * round (connected components, PageRank) use this to release round
  * N-1's blocks deterministically once round N is materialized —
  * [[execution.LogicalRDD]] (the plan a checkpointed Dataset wraps)
  * is `private[sql]`, hence the package-placed accessor. */
object GraftCheckpointBridge {
  def checkpointRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
