package graft.ext

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, triangles, singletons-in-pairs, and transitive closure") {
    // A~B, B~C: A and C cluster despite no direct edge
    assert(run(Seq((1L, 2L), (2L, 3L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // two disjoint clusters + a long chain (diameter > 2 needs >1 round)
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (20L, 21L), (30L, 31L), (31L, 30L))
    assert(run(edges) == unionFind(edges))
  }

  test("random graphs match driver-side union-find") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 60
      val edges = Seq.fill(50)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) == unionFind(edges))
    }
  }

  test("hot cluster: one giant star component converges in few rounds") {
    // 5k nodes all attached to hub 0 — the degenerate everything-is-a-
    // dup corpus. One round of propagation must settle it (diameter 2).
    val edges = (1L to 5000L).map(i => (0L, i))
    val comp = run(edges)
    assert(comp.size == 5001)
    assert(comp.values.forall(_ == 0L), "all nodes label to the hub's min id")
  }

  test("per-round checkpoint blocks are actually released (not just marked)") {
    // a 12-link chain forces ~12 propagation rounds; without the
    // per-round RDD-level unpersist every round's label frame stays
    // registered as a persistent RDD until driver GC. Bound: the
    // symmetrized edges, the initial labels and the FINAL round may
    // survive the loop — intermediate rounds must not.
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (0L until 12L).map(i => (i, i + 1))
    assert(run(edges) == unionFind(edges))
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 3,
      s"expected <=3 surviving checkpoint RDDs (sym, labels0, final round), got $leaked")
  }

  test("near-dup pairs from the corpus cluster transitively") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val pairs = Dedup.nearDuplicatePairs(docs, minJaccard = 0.4)
      .select("a_id", "b_id")
    val comp = Components.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = unionFind(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(comp == expected)
    // every component id is the minimum member id
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c)
    }
  }
}
