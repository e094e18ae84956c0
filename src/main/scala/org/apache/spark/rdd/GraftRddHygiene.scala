package org.apache.spark.rdd

import org.apache.spark.SparkContext

/** Package-placed accessor for `RDD.isLocallyCheckpointed`
  * (`private[rdd]`) — same pattern as
  * [[org.apache.spark.sql.execution.streaming.state.GraftStateHygiene]].
  *
  * Why: `df.localCheckpoint()` persists the target RDD and truncates
  * its lineage; the blocks are released only when the RDD OBJECT is
  * GC'd and the ContextCleaner notices. In a long serial run on a
  * mostly-idle heap that can be never — dead checkpoint blocks from
  * iterative queries (components rounds, PageRank mass frames, the
  * materialized pipeline lanes) accumulate and tax every later query
  * (the r9 driver bench: a 7–12× regression cluster on untouched
  * queries, positioned AFTER the checkpoint-heavy q1xx block in the
  * serial order). [[unpersistLocalCheckpoints]] frees them
  * deterministically through the BlockManager instead of waiting for
  * a GC cycle.
  *
  * Safety contract: ONLY locally-checkpointed RDDs are touched —
  * `.persist()`ed serving caches (Dataset persistence registers a
  * plain cached RDD, never a checkpointed one) survive untouched. A
  * localCheckpointed RDD cannot be recomputed after unpersist (its
  * lineage is gone), so callers must only invoke this BETWEEN units of
  * work, when no live plan still leans on checkpoint blocks — the
  * serving caches are themselves fully materialized and disk-backed,
  * so they never re-execute their (checkpoint-holding) build lineage.
  */
object GraftRddHygiene {

  /** Unpersist every locally-checkpointed RDD still registered with
    * the context. Returns how many were released. */
  def unpersistLocalCheckpoints(sc: SparkContext): Int = {
    val dead = sc.getPersistentRDDs.values.filter(_.isLocallyCheckpointed).toSeq
    dead.foreach(_.unpersist(blocking = false))
    dead.size
  }
}
