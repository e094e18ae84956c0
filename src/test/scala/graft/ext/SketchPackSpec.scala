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

  test("scalacheck: BloomPack under random keys, partial splits, merge orders and ser/de hops == buildLocal") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    val mBits = 512
    val agg = BloomPack(BoundReference(0, StringType, nullable = true), mBits, 3)
    val gen = for {
      n <- Gen.choose(0, 200)
      keys <- Gen.listOfN(n, Gen.alphaNumStr.map(_.take(12)))
      cuts <- Gen.choose(1, 5)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (keys, cuts, seed)
    val prop = Prop.forAllNoShrink(gen) { case (keys, cuts, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(keys)
      val parts = (0 until cuts).map(i =>
        shuffled.zipWithIndex.collect { case (k, j) if j % cuts == i => k })
      val partials = parts.map { part =>
        val buf = agg.createAggregationBuffer()
        part.foreach(k => agg.update(buf,
          InternalRow(UTF8String.fromString(k))))
        // some partials take the shuffle wire hop; NULLs interleave
        agg.update(buf, InternalRow(null))
        if (rnd.nextBoolean()) agg.deserialize(agg.serialize(buf)) else buf
      }
      val merged = partials.reduceLeft { (a, b) => agg.merge(a, b); a }
      val expect =
        if (keys.isEmpty) null
        else java.util.Base64.getEncoder.encodeToString(
          BloomPack.toBytes(Bloom.buildLocal(keys, mBits, 3)))
      String.valueOf(agg.eval(merged)) == String.valueOf(expect)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.toString)
  }

  test("scalacheck: HllRegs merged across random splits == whole-set sketch, byte for byte") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val agg = HllRegs(BoundReference(0, LongType, nullable = true))
    // 60-bit hashes like Hll.hash60 produces
    val gen = for {
      n <- Gen.choose(1, 400)
      hs <- Gen.listOfN(n, Gen.choose(0L, (1L << 60) - 1))
      cuts <- Gen.choose(1, 4)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (hs, cuts, seed)
    val prop = Prop.forAllNoShrink(gen) { case (hs, cuts, seed) =>
      val rnd = new scala.util.Random(seed)
      def sketch(xs: Seq[Long]): Array[Byte] = {
        val buf = agg.createAggregationBuffer()
        xs.foreach(h => agg.update(buf, InternalRow(h)))
        agg.update(buf, InternalRow(null))
        if (rnd.nextBoolean()) agg.deserialize(agg.serialize(buf)) else buf
      }
      val whole = sketch(hs)
      val parts = rnd.shuffle(hs).grouped(math.max(1, hs.size / cuts)).map(sketch).toSeq
      val merged = parts.reduceLeft { (a, b) => agg.merge(a, b); a }
      java.util.Arrays.equals(merged, whole)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.toString)
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
