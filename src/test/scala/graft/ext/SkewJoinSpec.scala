package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows, spread over salts") {
    // 90% of probe rows share one hot key — the salting target
    val probe = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", s"payload_$i")).toDF("key", "p")
    val build = Seq(("hot", 1), ("k0", 2), ("k3", 3), ("absent", 9)).toDF("key", "v")

    val plain = probe.join(build, Seq("key")).select("key", "p", "v")
    val salted = SkewJoin.saltedJoin(probe, build, "key", salts = 8).select("key", "p", "v")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)

    // left join keeps unmatched probe rows exactly once
    val plainLeft = probe.join(build, Seq("key"), "left").count()
    assert(SkewJoin.saltedJoin(probe, build, "key", 8, "left").count() == plainLeft)

    // the hot key's probe rows actually spread across several salts
    val saltSpread = probe.filter(col("key") === "hot")
      .withColumn("s", pmod(hash(col("p")), lit(8)))
      .select("s").distinct().count()
    assert(saltSpread > 4)
  }
}
