package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[BloomPack]] and [[HllRegs]] — the partial-mergeable aggregates
  * behind the manifest-stats gathers. The load-bearing properties:
  * byte-identity with the driver-side reference builds (the aggregate
  * must be a pure refactor of the gather it replaced), and the merge
  * laws (OR / element-wise max) that make per-file state composable. */
class SketchPackSpec extends SparkSpec {

  test("BloomPack over a frame == Bloom.buildLocal over the same keys, bit for bit") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"key-$i")
    val mBits = 1 << 10
    val got = keys.toDF("k").repartition(7) // force partial merges
      .agg(BloomPack.agg(col("k"), mBits, 4).as("b64"))
      .collect().head.getString(0)
    val expect = java.util.Base64.getEncoder.encodeToString(
      BloomPack.toBytes(Bloom.buildLocal(keys, mBits, 4)))
    assert(got === expect)
  }

  test("BloomPack: NULL keys ignored; all-NULL group evaluates to NULL; per-group isolation") {
    import spark.implicits._
    val df = Seq(
      ("a", Some("x")), ("a", None), ("a", Some("y")),
      ("b", None), ("b", None)
    ).toDF("g", "k")
    val out = df.groupBy("g").agg(BloomPack.agg(col("k"), 256, 4).as("b64"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("b") === None, "a group with no non-null key must have no bloom")
    val expect = java.util.Base64.getEncoder.encodeToString(
      BloomPack.toBytes(Bloom.buildLocal(Seq("x", "y"), 256, 4)))
    assert(out("a") === Some(expect))
    // probe consistency with the shared kernel
    val bits = {
      val bytes = java.util.Base64.getDecoder.decode(out("a").get)
      val buf = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(buf.getLong())
    }
    assert(Bloom.mightContain(UTF8String.fromString("x"), bits, 4))
    assert(Bloom.mightContain(UTF8String.fromString("y"), bits, 4))
  }

  test("HllRegs == Hll.registers (same hash lane), register for register") {
    import spark.implicits._
    val ids = (0 until 2000).map(i => s"id-${i % 700}") // duplicates on purpose
    val df = ids.toDF("id").repartition(9)
    val regs = df.agg(HllRegs.agg(Hll.hash60(col("id"))).as("regs"))
      .collect().head.getAs[Array[Byte]](0)
    // reference: the plain-aggregate register frame
    val frame = Hll.registers(df.withColumn("g", lit(1)), Seq("g"), col("id"))
      .collect().map(r => r.getAs[Long]("reg").toInt -> r.getAs[Int]("m")).toMap
    (0 until Hll.M).foreach { j =>
      assert(regs(j).toInt === frame.getOrElse(j, 0),
        s"register $j diverges from Hll.registers")
    }
    // ... and the two estimate faces agree exactly
    val viaFrame = Hll.estimate(
        Hll.registers(df.withColumn("g", lit(1)), Seq("g"), col("id")), Seq("g"))
      .collect().head.getAs[Double]("est_distinct")
    assert(Hll.estimateFromRegisters(regs) === viaFrame)
    // ... and the estimate is in HLL's error envelope (~6.5% stderr)
    assert(math.abs(Hll.estimateFromRegisters(regs) - 700.0) / 700.0 < 0.2)
  }

  test("HllRegs merge law is EXACT: sketch(A) max sketch(B) == sketch(A union B), any split") {
    import spark.implicits._
    val all = (0 until 1200).map(i => s"v${i % 450}")
    def sketch(xs: Seq[String]): Array[Byte] =
      xs.toDF("id").repartition(5)
        .agg(HllRegs.agg(Hll.hash60(col("id"))).as("r"))
        .collect().head.getAs[Array[Byte]](0)
    val whole = sketch(all)
    // three different splits, same merged bytes
    Seq(400, 777, 1100).foreach { cut =>
      val merged = Hll.mergeRegisters(sketch(all.take(cut)), sketch(all.drop(cut)))
      assert(java.util.Arrays.equals(merged, whole),
        s"merge law must be byte-exact at cut $cut")
    }
  }

  test("HllRegs refuses a raw 64-bit hash loudly") {
    import spark.implicits._
    val e = intercept[org.apache.spark.SparkException] {
      Seq("a").toDF("id")
        .agg(HllRegs.agg(lit(Long.MaxValue)).as("r")).collect()
    }
    assert(e.getMessage.contains("hash") || Option(e.getCause).exists(
      _.getMessage.contains("hash")))
  }
}
