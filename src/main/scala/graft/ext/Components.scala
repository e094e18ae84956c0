package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS ([[Dedup.nearDuplicatePairs]],
  * [[Similarity.nearDupPairs]]) into duplicate CLUSTERS, so "keep one
  * canonical doc per group of mutual near-dups" becomes a groupBy on
  * the component id. Pairs alone under-dedup: A~B and B~C puts A and C
  * in the same cluster even when the A~C similarity missed the
  * threshold.
  *
  * Algorithm: iterative min-label propagation. Each node starts
  * labeled with its own id; every round each node takes the min of its
  * label and its neighbors' labels; stop when no label changes.
  * Rounds = graph diameter, and near-dup clusters are shallow (dozens
  * of docs, diameter ≤ a few hops), so 3–5 rounds settle real corpora.
  * Each round is one shuffle-join + aggregate; the label frame is
  * localCheckpoint()ed per round to truncate lineage (an iterative
  * plan otherwise re-derives every prior round on each action — the
  * classic Spark iteration trap).
  */
object Components {

  /** @param edges (aCol, bCol) undirected pairs, ids long
    * @param maxIter hard round cap; label propagation needs rounds =
    *                graph diameter, so if this binds the result would
    *                be SILENTLY split — the loop THROWS instead
    * @return (id, component) — component = min node id reachable */
  def connectedComponents(
      edges: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIter: Int = 50): DataFrame = {
    // checkpoint the symmetrized edges ONCE, pre-partitioned on dst:
    // without the checkpoint the (possibly expensive — minhash
    // banding, Jaccard verify) edge subtree would re-execute every
    // iteration, and without the explicit hash layout every round's
    // frontier join would re-shuffle the WHOLE edge frame
    // (localCheckpoint preserves outputPartitioning, so the join below
    // exchanges only the frontier side — O(Δ) per round, not O(E))
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("dst"))
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // Delta iteration: a node's label only ever decreases, and a
    // decrease can only be caused by a neighbor whose label DECREASED
    // last round — so round r only propagates from the round-(r−1)
    // frontier (initially: everyone). Classic Pregel-style CC; at
    // scale the frontier collapses after the first rounds, so late
    // rounds shuffle almost nothing instead of re-walking every edge.
    var frontier = labels
    var prevRoundRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    var converged = false
    var i = 0
    val spark = edges.sparkSession
    import spark.implicits._
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(frontier, sym("dst") === frontier("id"))
        .groupBy(col("src").as("nid"))
        .agg(min("label").as("nlabel"))
      // Convergence detection rides the SAME job that materializes the
      // round: the eager localCheckpoint below already executes every
      // partition, so a changed-row accumulator read after it replaces
      // the separate `frontier.isEmpty` action the loop used to pay
      // (two driver round-trips per iteration → one). Task retries can
      // only over-count, and the branch is zero-vs-nonzero, so a retry
      // can never fake convergence.
      val changedAcc = spark.sparkContext.longAccumulator(s"cc_changed_round_$i")
      val updated = labels
        .join(neighborMin, labels("id") === neighborMin("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          coalesce(col("nlabel") < col("label"), lit(false)).as("changed"))
        .as[(Long, Long, Boolean)]
        .map { r => if (r._3) changedAcc.add(1L); r }
        .toDF("id", "label", "changed")
        .localCheckpoint()
      // the new round is now fully materialized (eager checkpoint), so
      // the previous round's blocks are dead weight — without this a
      // deep graph holds maxIter label-frame copies in block storage
      // until driver GC happens to reclaim them. The release must hit
      // the checkpoint RDD itself (Dataset.unpersist only clears
      // CacheManager entries, which a localCheckpoint never makes) —
      // [[org.apache.spark.sql.GraftCheckpointBridge]] digs it out of
      // the LogicalRDD the checkpointed frame wraps.
      prevRoundRdd.foreach(_.unpersist(blocking = false))
      prevRoundRdd =
        org.apache.spark.sql.GraftCheckpointBridge.checkpointRdd(updated)
      converged = changedAcc.value == 0L
      frontier = updated.filter(col("changed")).select("id", "label")
      labels = updated.select("id", "label")
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — the " +
          s"graph has a component of diameter > $maxIter; raise maxIter " +
          "(a silently split clustering would under-dedup)")
    labels.withColumnRenamed("label", "component")
  }

  /** Cluster view of a pair list: every node with its component plus
    * the cluster's canonical (minimum) id — groupBy-ready. */
  def nearDupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("id"), col("component"))
}
