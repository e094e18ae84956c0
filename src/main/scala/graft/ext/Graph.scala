package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as dataframe fixpoints — PageRank here,
  * with the same loop discipline as [[Components.connectedComponents]]
  * (which covers the label-propagation family).
  *
  * Arithmetic is FIXED-POINT INTEGER: ranks are longs scaled by
  * [[Scale]], contributions use integral division, and the damping
  * step is `(85 * inMass) div 100`. Floating-point PageRank is
  * order-dependent (the per-node incoming sum re-associates across
  * partitionings); the integer form is bitwise-deterministic under ANY
  * partitioning and SQL-expressible, which is what lets the q108
  * oracle replay every iteration exactly. Precision cost: each
  * division floors away < 1 ulp of 1e-9 per edge — immaterial next to
  * the O(0.85^k) truncation of stopping at k iterations.
  *
  * Scale shape per iteration: one equi-join pr⋈edges on the source key
  * and one `groupBy(dst)` — both map-side-combinable shuffles on the
  * same keys every round, so a production deployment pre-buckets
  * `edges` by src (write-once shuffle, [[graft.ingest.Layout]]) and
  * every iteration's join is exchange-free on the edge side.
  *
  * Iteration is where dataframe loops quietly go quadratic: without a
  * cut, round k's plan re-executes rounds 1..k-1 (measured 11-16 s for
  * 4 rounds at sf0.1 — the static edge subtree alone appeared ~20x in
  * the plan). `materialize = true` (default, the [[Curation]]
  * localCheckpoint pattern: RDD blocks, GC-cleaned, never
  * CacheManager) cuts lineage at the static frames (edges+outdeg,
  * nodes) AND at each round's rank frame, so every round executes
  * exactly once and plan depth stays O(1). Same bitwise result either
  * way ([[GraphSpec]] asserts it).
  *
  * Dangling nodes (no out-edges) simply do not redistribute their
  * mass — the standard simplification; feed symmetric edge sets when
  * conservation matters (the q108 lane does).
  */
object Graph {

  /** Rank fixed-point scale: 1e9 ≈ nano-rank units. Headroom: the
    * damping multiply is `85 * sum(in-contributions)`; the sum is
    * bounded by total mass `n * Scale`, so longs survive up to ~1e8
    * nodes per connected sink — far past any per-key mass a real graph
    * concentrates. */
  final val Scale = 1000000000L
  final val Base = Scale * 15L / 100L // (1 - d) * Scale, d = 0.85

  /** `iterations` rounds of damped PageRank over `edges(src, dst)`
    * (long node ids). Returns `node, pr` with pr in [[Scale]] units
    * (mean rank ≈ Scale on a dangling-free graph). Every node present
    * as a source or destination participates. */
  def pageRank(edges: DataFrame, iterations: Int,
      materialize: Boolean = true): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    def mat(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    // Cut at the INPUT first: e is read 4x below (nodes' union reads
    // it twice, edgesDeg twice more via outdeg) and each eager
    // localCheckpoint otherwise re-executes the caller's whole edge
    // pipeline — for q108 that re-ran a join+distinct over the fact
    // table five times.
    val e = mat(edges.select(col("src").cast("long"), col("dst").cast("long")))
    val nodes = mat(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct())
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgesDeg = mat(e.join(outdeg, "src"))
    var pr = nodes.withColumn("pr", lit(Scale))
    // Rank-side frames are #nodes-sized while the edge frame is
    // #edges-sized — broadcast the small side so no iteration ever
    // sorts or shuffles the edges (checkpointed stats don't propagate,
    // so without the hint Catalyst falls back to SMJ over the full
    // edge frame every round — measured 2x the whole query). At node
    // counts past broadcast reach, drop the hints and pre-bucket both
    // sides by the join key instead (see class scaladoc).
    for (_ <- 1 to iterations) {
      val inMass = edgesDeg
        .join(broadcast(pr), edgesDeg("src") === pr("node"))
        .select(col("dst"), expr("pr div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("m"))
      pr = mat(nodes
        .join(broadcast(inMass), nodes("node") === inMass("dst"), "left")
        .select(col("node"),
          (lit(Base) + expr("85 * coalesce(m, 0L) div 100")).as("pr")))
    }
    pr
  }
}
