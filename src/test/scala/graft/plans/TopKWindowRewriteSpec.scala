package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKWindowRewriteSpec extends SparkSpec {

  private def df: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    (1 to 500).map(i => (s"k${i % 7}", i.toLong, rnd.nextInt(1000)))
      .toDF("k", "id", "v")
  }

  private def planOf(d: DataFrame): String =
    d.queryExecution.executedPlan.toString

  test("the row_number pattern plans as TopKPerKeyExec with no WindowExec") {
    TopKWindowRewrite.scoped(spark) {
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val out = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    val plan = planOf(out)
    assert(plan.contains("TopKPerKey"), s"rewrite must fire:\n$plan")
    assert(!plan.contains("Window"), s"WindowExec must be gone:\n$plan")
    // results: exact same rows as the window formulation computes
    // (total order, so ties cannot differ)
    val expected = df.collect()
      .groupBy(_.getString(0)).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r.getInt(2), r.getLong(1))).take(3)
      }.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val got = out.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    }
  }

  test("rn < k and rn = 1 bounds rewrite; k from the strict form is k-1") {
    TopKWindowRewrite.scoped(spark) {
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val strict = df.withColumn("rn", row_number().over(w))
      .where(col("rn") < 3).drop("rn")
    assert(planOf(strict).contains("TopKPerKey"))
    assert(strict.groupBy("k").count().collect().forall(_.getLong(1) == 2))
    val top1 = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    assert(planOf(top1).contains("TopKPerKey"))
    assert(top1.count() == 7)
    }
  }

  test("the q92 canonical-election shape (join + coalesce cluster, rn = 1) " +
      "rewrites and matches the explicit operator") {
    import spark.implicits._
    // docs with a partial cluster map — exactly keepClusterCanonicalBy's
    // frame shape: left join, coalesce to own id, elect per cluster
    val docs = (1L to 40L).map(i => (i, (i * 37 % 100)))
      .toDF("doc_id", "n_chars")
    val comp = Seq((2L, 1L), (5L, 1L), (9L, 7L), (7L, 7L), (1L, 1L))
      .toDF("doc_id", "component")
    val clustered = docs.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .drop("component")
    val viaOperator = graft.plans.TopKPerKey.topKPerKey(
        clustered, Seq("cluster"), "n_chars",
        descending = true, k = 1, tiebreakCols = Seq("doc_id"))
      .select("doc_id", "cluster", "n_chars")
    TopKWindowRewrite.scoped(spark) {
      val w = Window.partitionBy("cluster").orderBy(desc("n_chars"), asc("doc_id"))
      val viaWindow = clustered.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn")
        .select("doc_id", "cluster", "n_chars")
      val plan = planOf(viaWindow)
      assert(plan.contains("TopKPerKey"), s"rn=1 dedup shape must rewrite:\n$plan")
      assert(!plan.contains("Window"), s"WindowExec must be gone:\n$plan")
      val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(viaWindow.collect().map(key).toSet === viaOperator.collect().map(key).toSet)
    }
  }

  test("guard: a surviving rank column prevents the rewrite") {
    TopKWindowRewrite.scoped(spark) {
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val keepsRn = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("k", "id", "rn")
    val plan = planOf(keepsRn)
    assert(plan.contains("Window"), s"rn is consumed — no rewrite:\n$plan")
    assert(!plan.contains("TopKPerKey"))
    }
  }

  test("guard: rank() and multi-expression windows are left alone") {
    TopKWindowRewrite.scoped(spark) {
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val ranked = df.withColumn("rn", rank().over(w))
      .where(col("rn") <= 3).drop("rn")
    assert(!planOf(ranked).contains("TopKPerKey"), "rank() has tie semantics")
    val multi = df
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max("v").over(Window.partitionBy("k")))
      .where(col("rn") <= 3).drop("rn")
    assert(!planOf(multi).contains("TopKPerKey"))
    }
  }
}
