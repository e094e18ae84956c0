package graft

import org.apache.spark.sql.functions._

class QueryUtilSpec extends SparkSpec {

  test("localized round-trips a bounded frame, order and schema intact") {
    val df = spark.range(10).select(col("id"), (col("id") * 2).as("v"))
      .orderBy(desc("id"))
    val local = QueryUtil.localized(df)
    assert(local.schema === df.schema)
    assert(local.collect().map(_.getLong(0)).toSeq === (9L to 0L by -1L))
  }

  test("localized fails loud past maxRows instead of collecting the frame") {
    val big = spark.range(100).toDF("id")
    val e = intercept[IllegalStateException] {
      QueryUtil.localized(big, maxRows = 50)
    }
    assert(e.getMessage.contains("maxRows=50"))
    // explicit raise of the bound is the documented escape hatch
    assert(QueryUtil.localized(big, maxRows = 100).count() === 100)
  }

  test("Bench.median: odd takes the middle, even AVERAGES the middle pair") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    // even n must not return the upper-middle (the r14 ADVICE bias:
    // with 2 surviving repeat samples, upper-middle = MAX)
    assert(Bench.median(Seq(4.0, 2.0)) === 3.0)
    assert(Bench.median(Seq(1.0, 2.0, 3.0, 10.0)) === 2.5)
    assert(Bench.median(Seq(7.5)) === 7.5)
  }

  test("unpersistLocalCheckpoints releases checkpoint blocks, spares persisted caches") {
    val sc = spark.sparkContext
    val cached = spark.range(1000).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    val ckpt = spark.range(1000).toDF("id").localCheckpoint()
    ckpt.count()
    val released = org.apache.spark.rdd.GraftRddHygiene.unpersistLocalCheckpoints(sc)
    assert(released >= 1)
    // idempotent: a second sweep finds nothing left to release
    assert(org.apache.spark.rdd.GraftRddHygiene.unpersistLocalCheckpoints(sc) === 0)
    // the persisted cache is still registered and readable
    assert(cached.count() === 1000)
    cached.unpersist()
  }
}
