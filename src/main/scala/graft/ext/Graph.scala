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
  * Scale shape per iteration: one equi-join mass⋈edges on the source
  * key (mass broadcast — it is #nodes-sized) and one `groupBy(dst)` —
  * map-side-combinable shuffles on the same keys every round, so a
  * production deployment pre-buckets `edges` by src (write-once
  * shuffle, [[graft.ingest.Layout]]) and every iteration's join is
  * exchange-free on the edge side.
  *
  * Iteration is where dataframe loops quietly go quadratic: without a
  * cut, round k's plan re-executes rounds 1..k-1 (measured 11-16 s for
  * 4 rounds at sf0.1 — the static edge subtree alone appeared ~20x in
  * the plan). `materialize = true` (default, the [[Curation]]
  * localCheckpoint pattern: RDD blocks, GC-cleaned, never
  * CacheManager) cuts lineage at the degree-annotated edge frame and
  * at every second round's mass frame, so every round executes exactly
  * once and plan depth stays O(1). Same bitwise result either way
  * ([[GraphSpec]] asserts it).
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
    // ONE materialization of the caller's edge pipeline: out-degree is
    // annotated by a window count over src (one shuffle on src, no
    // outdeg join, no second pass over the input), and the cut lands
    // on the finished (src, dst, outdeg) frame — every downstream
    // consumer (nodes' union, all iterations) reads the RDD blocks.
    // The earlier shape (cut the raw edges, groupBy outdeg, join back,
    // cut again) materialized the edge frame TWICE and paid a
    // broadcast build per run; the window form is the same single
    // src-clustered shuffle the join's aggregation needed anyway.
    // null endpoints (e.g. a silent non-ANSI cast failure upstream)
    // are DROPPED explicitly: the r9 rank-frame loop ignored null-src
    // edges implicitly (inner join never matched) while the mass loop
    // would count them — normalizing at entry makes the semantics
    // explicit and identical for both loop formulations
    val edgesDeg = mat(edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src"))))
    // consumed ONCE (the final output join) — no cut needed
    val nodes = edgesDeg.select(col("src").as("node"))
      .unionAll(edgesDeg.select(col("dst").as("node"))).distinct()
    // The loop iterates on the IN-MASS frame, not the rank frame: the
    // rank is the pure expression `Base + 85·m div 100` of a node's
    // in-mass (0 for nodes nobody links to), so intermediate rounds
    // never need the per-node frame at all — round 1's contribution is
    // the constant initial rank spread over outdeg, and each later
    // round turns the previous round's mass into contributions INSIDE
    // the edge join (a left join: un-linked sources contribute Base
    // div outdeg). That removes one #nodes-sized join + broadcast per
    // round vs the textbook rank-frame loop; only the final output
    // materializes per-node ranks. Integer arithmetic is unchanged
    // expression-for-expression, so results are bitwise identical.
    //
    // Mass frames are #nodes-sized while the edge frame is
    // #edges-sized — broadcast the small side so no iteration ever
    // sorts or shuffles the edges (checkpointed stats don't propagate,
    // so without the hint Catalyst falls back to SMJ over the full
    // edge frame every round — measured 2x the whole query). At node
    // counts past broadcast reach, drop the hints and pre-bucket both
    // sides by the join key instead (see class scaladoc).
    //
    // Lineage cut cadence: every SECOND round (and never the last —
    // the caller's action executes the ≤2 un-cut rounds inline). Each
    // mass frame is consumed exactly once by the next round, so a
    // 2-round un-cut chain still executes every round once; what the
    // cut buys is bounded PLAN DEPTH, and depth 2 is as bounded as
    // depth 1. Joins are by-name (renames instead of df("col")
    // references): an un-cut mass frame CONTAINS the edgesDeg subtree,
    // and a dataframe-column condition against edgesDeg would then be
    // a self-join ambiguity.
    val prOfMass = lit(Base) + expr("85 * coalesce(m, 0L) div 100")
    var inMass = edgesDeg
      .select(col("dst"), expr(s"${Scale}L div outdeg").as("contrib"))
      .groupBy("dst").agg(sum("contrib").as("m"))
    // each NEW mass checkpoint supersedes the previous one (the cut
    // frame contains all history), so the prior round's blocks are
    // dead the moment mat() returns — release them at the RDD level
    // (same discipline as Components: Dataset.unpersist would be a
    // no-op on localCheckpoint blocks), or a deep run holds
    // iterations/2 #nodes-sized block sets until driver GC
    var prevMassRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 2 to iterations) {
      val next = edgesDeg
        .join(broadcast(inMass.withColumnRenamed("dst", "src")), Seq("src"), "left")
        .select(col("dst"), prOfMass.as("pr"), col("outdeg"))
        .select(col("dst"), expr("pr div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("m"))
      inMass = if (i % 2 == 0 && i < iterations) {
        val cut = mat(next)
        prevMassRdd.foreach(_.unpersist(blocking = false))
        prevMassRdd =
          org.apache.spark.sql.GraftCheckpointBridge.checkpointRdd(cut)
        cut
      } else next
    }
    nodes
      .join(broadcast(inMass.withColumnRenamed("dst", "node")), Seq("node"), "left")
      .select(col("node"), prOfMass.as("pr"))
  }

  /** Per-node triangle counts over an undirected graph given as a
    * DEDUPLICATED edge list `(src, dst)` with `src < dst`, one row per
    * edge, no self-loops. Returns `(node, n_triangles)` — every corner
    * of every triangle credited once.
    *
    * Algorithm: degree orientation (the MapReduce-era
    * Suri–Vassilvitskii discipline). Define the total order
    * `x ≺ y ⇔ (deg(x), x) < (deg(y), y)` and orient every edge from
    * its ≺-smaller endpoint. Every triangle then has EXACTLY one
    * corner with two out-edges (its ≺-minimum), so enumerating
    * out-neighbor pairs `(b, c)` of each node with `b ≺ c` and closing
    * against the oriented edge `b→c` finds each triangle once.
    *
    * Scale shape — why orientation instead of the naive `a<b<c` id
    * ordering: the wedge frame is Σ_a outdeg(a)², and under degree
    * orientation outdeg is bounded by O(√E) REGARDLESS of skew (a
    * celebrity node of degree millions has huge IN-degree but only
    * edges to ≺-larger, i.e. rarer, nodes as OUT-edges), while id
    * ordering leaves Σ deg² — quadratic in the hottest node. The
    * degree frame is #nodes-sized (broadcast); the wedge→close join
    * shuffles on the (b, c) pair key with map-side-combinable counts
    * after. All arithmetic is integer, so the whole computation is
    * SQL-mirrorable bit for bit (the q124 oracle replays it).
    *
    * Like [[pageRank]], the input and the oriented edge frame are
    * materialized (`localCheckpoint`) by default: `edges` is read
    * three times (degrees twice, orientation once) and `oriented`
    * three more (both wedge sides + the closing join), and the
    * re-derived subtrees do NOT canonicalize equal across differing
    * projections — without the cut the caller's whole edge pipeline
    * executes ~6× (the q124 plan showed 139 Exchanges before the cut).
    */
  def triangleCounts(edges: DataFrame, materialize: Boolean = true): DataFrame = {
    def mat(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val e = mat(edges.select(col("src").cast("long"), col("dst").cast("long")))
    val deg = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(broadcast(deg.select(col("node").as("src"), col("d").as("d1"))), "src")
      .join(broadcast(deg.select(col("node").as("dst"), col("d").as("d2"))), "dst")
    val srcFirst = struct(col("d1"), col("src")) < struct(col("d2"), col("dst"))
    // carry the out-endpoint's degree: the wedge join's b ≺ c
    // comparison needs it
    val oriented = mat(withDeg.select(
      when(srcFirst, col("src")).otherwise(col("dst")).as("u"),
      when(srcFirst, col("dst")).otherwise(col("src")).as("v"),
      when(srcFirst, col("d2")).otherwise(col("d1")).as("dv")))
    val x = oriented.select(col("u"), col("v").as("b"), col("dv").as("db"))
    val y = oriented.select(col("u"), col("v").as("c"), col("dv").as("dc"))
    val wedges = x.join(y, Seq("u"))
      .where(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
    val closing = oriented.select(col("u").as("b"), col("v").as("c"))
    val tri = wedges.join(closing, Seq("b", "c"))
      .select(col("u").as("a"), col("b"), col("c"))
    tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
