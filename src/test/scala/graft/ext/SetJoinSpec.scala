package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetJoinSpec extends SparkSpec {

  /** Brute-force reference: all pairs, exact Jaccard. */
  private def brute(sets: Map[Long, Set[String]], num: Long, den: Long)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      (a, b) = (ids(i), ids(j))
      inter = (sets(a) & sets(b)).size.toLong
      uni = (sets(a) | sets(b)).size.toLong
      if den * inter >= num * uni
    } yield (a, b, sets(a).size.toLong, sets(b).size.toLong, inter, uni)).toSet
  }

  private def run(sets: Map[Long, Set[String]], num: Long, den: Long)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = sets.toSeq.map { case (id, s) => (id, s.toSeq.sorted) }
      .toDF("id", "toks")
    SetJoin.jaccardJoin(df, num, den).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
  }

  test("equals brute force on random set families (prefix filter is lossless)") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 60).map(i => s"w$i")
      // skewed frequencies: low-index tokens appear in most sets (the
      // boilerplate case prefix filtering must exclude from prefixes)
      val sets = (0L until 30L).map { id =>
        id -> vocab.filter(w =>
          rnd.nextDouble() < 0.8 / (1 + vocab.indexOf(w) / 8)).toSet
      }.filter(_._2.nonEmpty).toMap
      for ((num, den) <- Seq((1L, 2L), (7L, 10L), (9L, 10L))) {
        assert(run(sets, num, den) == brute(sets, num, den),
          s"seed=$seed tau=$num/$den")
      }
    }
  }

  test("tau = 1 finds exactly the identical sets") {
    val sets = Map(
      1L -> Set("a", "b", "c"),
      2L -> Set("a", "b", "c"),
      3L -> Set("a", "b"),
      4L -> Set("a", "b"))
    assert(run(sets, 1L, 1L) ==
      Set((1L, 2L, 3L, 3L, 3L, 3L), (3L, 4L, 2L, 2L, 2L, 2L)))
  }

  test("disjoint sets and below-threshold overlaps are absent") {
    val sets = Map(
      1L -> Set("a", "b", "c", "d"),
      2L -> Set("e", "f", "g", "h"),
      3L -> Set("a", "x", "y", "z")) // J(1,3) = 1/7 < 1/2
    assert(run(sets, 1L, 2L).isEmpty)
  }

  test("empty sets never pair") {
    val sets = Map(1L -> Set("a"), 2L -> Set.empty[String], 3L -> Set("a"))
    assert(run(sets, 1L, 2L) == Set((1L, 3L, 1L, 1L, 1L, 1L)))
  }

  test("invalid thresholds are rejected") {
    import spark.implicits._
    val df = Seq((1L, Seq("a"))).toDF("id", "toks")
    intercept[IllegalArgumentException] { SetJoin.jaccardJoin(df, 0L, 2L) }
    intercept[IllegalArgumentException] { SetJoin.jaccardJoin(df, 3L, 2L) }
  }
}
