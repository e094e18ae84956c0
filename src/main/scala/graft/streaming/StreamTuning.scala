package graft.streaming

import org.apache.spark.sql.SparkSession

/** Stream-local shuffle-partition scope. A streaming query's state
  * lives in one state store PER shuffle partition (a stream-stream
  * join keeps four per partition), and every micro-batch pays each
  * store's open/commit/snapshot cost — so the batch-side default
  * (sized for scan parallelism) overprovisions stateful streams whose
  * per-partition state is small. The number is captured at query
  * START and baked into the checkpoint, so it must be set before
  * `start()` and can be restored immediately after: this helper scopes
  * it to the query-launching closure.
  *
  * At scale the trade reverses (state must shard across executors) —
  * the parameter is per-call, not a global constant.
  */
object StreamTuning {

  /** Run `f` with `spark.sql.shuffle.partitions` = `n`, restoring the
    * previous value afterwards (the launched query KEEPS n — the conf
    * is read at stream start). */
  def withStreamPartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }
}
