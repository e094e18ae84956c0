package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The partial-mergeable DV aggregate ([[DvPack]]/[[DvAcc]]) must be
  * byte-identical to [[DvBitmap.pack]] of the same position set, no
  * matter how positions split across partials, in which order partials
  * merge, or whether a partial crossed a serialize/deserialize
  * (shuffle) boundary in between. */
class DvPackSpec extends SparkSpec {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, s"$name: $res")
  }

  private val posSets: Gen[Array[Long]] = for {
    span <- Gen.oneOf(64L, 4096L, 1L << 20, 1L << 36)
    n <- Gen.choose(1, 300)
    ps <- Gen.listOfN(n, Gen.choose(0L, span))
  } yield ps.distinct.sorted.toArray

  test("acc equals pack under random partials, merge orders and ser/de hops") {
    val gen = for {
      ps <- posSets
      cuts <- Gen.choose(1, 5)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (ps, cuts, seed)
    // NoShrink: a shrink storm over large position arrays re-runs the
    // body thousands of times; the (ps, cuts, seed) triple is already
    // self-describing on failure
    check("partials", Prop.forAllNoShrink(gen) { case (ps, cuts, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(ps.toList)
      val parts = (0 until cuts).map(i =>
        shuffled.zipWithIndex.collect { case (p, j) if j % cuts == i => p })
      val partials = parts.filter(_.nonEmpty).map { part =>
        val acc = new DvAcc
        part.foreach(acc.add)
        // half the partials take the wire hop (serialize == packed form)
        if (rnd.nextBoolean()) DvAcc.from(acc.packed()) else acc
      }
      val merged = partials.reduceLeft { (a, b) => a.mergeFrom(b); a }
      java.util.Arrays.equals(merged.packed(), DvBitmap.pack(ps))
    })
  }

  test("descending position stream: correct, and core growth stays geometric (bounded rebuilds)") {
    // the r14 ADVICE shape: merge order after a shuffle can deliver
    // positions high-to-low; top-only slack reallocated every ≤64
    // adds. With symmetric slack the whole descending run must cost
    // FEW rebuilds — proxied here by wall-clock sanity plus exactness
    // (the quadratic shape took visibly long on this size).
    val n = 400000
    val desc = new DvAcc
    (n - 1 to 0 by -1).foreach(i => desc.add(i.toLong * 2))  // every other bit
    val expect = DvBitmap.pack((0 until n).map(_.toLong * 2).toArray)
    assert(java.util.Arrays.equals(desc.packed(), expect))
    // interleaved two-sided growth (alternating low/high) stays exact
    val sides = new DvAcc
    (0 until n / 2).foreach { i =>
      sides.add(i.toLong * 2)
      sides.add((n - 1 - i).toLong * 2)
    }
    assert(java.util.Arrays.equals(sides.packed(), expect))
  }

  test("adoption path: merging a dense partial into a FRESH buffer is exact") {
    val dense = new DvAcc
    (100L until 5000L).foreach(dense.add)
    val fresh = new DvAcc
    fresh.mergeFrom(DvAcc.from(dense.packed()))
    assert(java.util.Arrays.equals(
      fresh.packed(), DvBitmap.pack((100L until 5000L).toArray)))
    // and the adopted container is a private copy — mutating the donor
    // afterwards must not corrupt the adopter
    dense.add(6000L)
    assert(java.util.Arrays.equals(
      fresh.packed(), DvBitmap.pack((100L until 5000L).toArray)))
  }

  test("a scattered set that flips dense mid-stream still emits the sparse form") {
    val acc = new DvAcc
    // a tight cluster flips the acc dense ...
    (0L until 200L).foreach(acc.add)
    // ... then far outliers stretch the span so sparse wins at the end
    Seq(1L << 30, 1L << 31, 1L << 32).foreach(acc.add)
    val expect = DvBitmap.pack(((0L until 200L) ++ Seq(1L << 30, 1L << 31, 1L << 32)).toArray)
    assert(expect(0) == 1, "sanity: the reference pick is sparse")
    assert(java.util.Arrays.equals(acc.packed(), expect))
  }

  test("far-apart dense partials DECANT instead of unioning a span-sized core") {
    // two genuinely clustered partials, 2^30 positions apart: a naive
    // core union would allocate ~128 MB; the pays-rule decants the
    // incoming core into placed positions instead. Exactness first,
    // and the merged buffer must stay far below the union span.
    val a = new DvAcc
    (0L until 5000L).foreach(a.add)
    val b = new DvAcc
    val far = 1L << 30
    (far until far + 5000L).foreach(b.add)
    assert(a.core != null && b.core != null, "both partials are dense")
    a.mergeFrom(b)
    val expect = DvBitmap.pack(((0L until 5000L) ++ (far until far + 5000L)).toArray)
    assert(java.util.Arrays.equals(a.packed(), expect))
    val coreBytes = if (a.core == null) 0 else a.core.length
    assert(coreBytes + 8 * a.looseN < (1 << 20),
      s"merged buffer must not approach the union span: core=$coreBytes loose=${a.looseN}")
  }

  test("deserialize(dense container) recovers count/min/max for later merges") {
    val acc = new DvAcc
    (100L until 1000L).foreach(acc.add)
    val wire = acc.packed()
    assert(wire(0) == 0, "sanity: dense on the wire")
    val back = DvAcc.from(wire)
    assert(back.count === 900L)
    assert(back.minPos === 100L && back.maxPos === 999L)
    // and the recovered buffer keeps merging exactly
    val more = new DvAcc
    (1000L until 1100L).foreach(more.add)
    back.mergeFrom(more)
    assert(java.util.Arrays.equals(back.packed(),
      DvBitmap.pack((100L until 1100L).toArray)))
  }

  test("DataFrame face: groupBy + dv_pack across partitions equals DvBitmap.pack") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 3).flatMap { f =>
      val ps = Seq.fill(400)(rnd.nextLong(1L << 22)).distinct
      ps.map(p => (s"file_$f", p))
    }
    val got = rows.toDF("file", "pos").repartition(8)
      .groupBy("file")
      .agg(DvPack.agg(col("pos")).as("bits"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getAs[Array[Byte]](1), r.getLong(2))).toMap
    rows.groupBy(_._1).foreach { case (f, fps) =>
      val sorted = fps.map(_._2).distinct.sorted.toArray
      val (bits, n) = got(f)
      assert(n == sorted.length)
      assert(java.util.Arrays.equals(bits, DvBitmap.pack(sorted)),
        s"$f: aggregate bytes differ from the batch pack")
    }
  }

  test("NULL positions are ignored; an all-NULL group packs to NULL") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("b", None))
      .toDF("file", "pos")
    val got = df.groupBy("file").agg(DvPack.agg(col("pos")).as("bits"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").isDefined &&
      java.util.Arrays.equals(got("a").get.asInstanceOf[Array[Byte]],
        DvBitmap.pack(Array(1L))))
    assert(got("b").isEmpty)
  }

  test("mass-delete shape: a 4M-position near-full file stays in the dense container") {
    // the whole point of the aggregator: ~4M tombstones accumulate into
    // a ~0.5 MB dense payload, never a 32 MB long array. Assert the
    // emitted container and its size bound; feed positions through the
    // real DataFrame path with several partitions so map-side partials
    // and the OR-merge actually run.
    val n = 4000000L
    import spark.implicits._
    val bits = spark.range(0, n).filter(col("id") % 10 =!= 0)
      .select(lit("f").as("file"), col("id").as("pos"))
      .repartition(8)
      .groupBy("file").agg(DvPack.agg(col("pos")).as("bits"))
      .collect().head.getAs[Array[Byte]]("bits")
    assert(bits(0) == 0, "90%-full file must pick the dense container")
    assert(bits.length <= n / 8 + 16,
      s"dense payload must be span/8-bounded, got ${bits.length} bytes")
    // spot-check membership without decoding 3.6M positions
    val probe = Seq(1L, 9L, 11L, n - 1).filter(_ % 10 != 0)
    assert(probe.forall(DvBitmap.contains(bits, _)))
    assert((0L until n by 10L).take(50).forall(!DvBitmap.contains(bits, _)))
  }
}
