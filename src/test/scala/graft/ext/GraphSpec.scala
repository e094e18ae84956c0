package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int, parts: Int = 4): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst").repartition(parts), iters)
      .as[(Long, Long)].collect().toMap

  test("star graph: hub dominates, leaves tie exactly") {
    // 1..6 all point at 0 and back (symmetric, dangling-free)
    val edges = (1L to 6L).flatMap(i => Seq((i, 0L), (0L, i)))
    val pr = ranks(edges, 8)
    val leaves = (1L to 6L).map(pr)
    assert(leaves.distinct.size == 1, s"symmetric leaves must tie exactly: $leaves")
    assert(pr(0L) > 3 * leaves.head, s"hub ${pr(0L)} vs leaf ${leaves.head}")
  }

  test("deep runs release superseded mass checkpoints (blocks bounded)") {
    // a 16-round run cuts lineage ~7 times; each new cut supersedes the
    // previous, which must be unpersisted at the RDD level — surviving
    // persistent RDDs: the edge frame plus at most the LAST mass cut
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1L to 6L).flatMap(i => Seq((i, 0L), (0L, i)))
    assert(ranks(edges, 16).nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 2,
      s"expected <=2 surviving checkpoint RDDs (edges + last mass cut), got $leaked")
  }

  test("matches a double-arithmetic reference within fixed-point tolerance") {
    val rnd = new scala.util.Random(11)
    val raw = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = raw ++ raw.map(_.swap) // symmetric => no dangling mass loss
    val pr = ranks(edges, 6)
    // reference: plain double PageRank, same iterations
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var ref = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 6) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => ref(e._1) / out(e._1)).sum
      }
      ref = nodes.map(n => n -> (0.15 + 0.85 * in.getOrElse(n, 0.0))).toMap
    }
    for (n <- nodes) {
      val got = pr(n).toDouble / Graph.Scale
      assert(math.abs(got - ref(n)) < 1e-6,
        s"node $n fixed-point $got vs reference ${ref(n)}")
    }
  }

  test("bitwise-deterministic under any partitioning") {
    val rnd = new scala.util.Random(5)
    val raw = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = raw ++ raw.map(_.swap)
    assert(ranks(edges, 4, parts = 1) == ranks(edges, 4, parts = 7),
      "integer fixed-point ranks must not depend on partitioning")
    // and the lineage cut is purely physical: same bits without it
    val unmaterialized = Graph.pageRank(
      edges.toDF("src", "dst").repartition(3), 4, materialize = false)
      .as[(Long, Long)].collect().toMap
    assert(unmaterialized == ranks(edges, 4, parts = 7))
  }

  test("total mass is conserved up to floor truncation on a symmetric graph") {
    val edges = (0L until 10L).flatMap(i => Seq((i, (i + 1) % 10), ((i + 1) % 10, i)))
    val pr = ranks(edges, 5)
    val total = pr.values.sum
    val exact = 10L * Graph.Scale
    // each of the 20 edge-divisions floors away < 1 unit per iteration
    assert(total <= exact && total > exact - 5 * 20 * 2,
      s"mass $total vs $exact")
  }
}
