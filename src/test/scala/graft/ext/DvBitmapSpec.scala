package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Codec-level properties of the per-file deletion-vector bitmap
  * containers (the engine-level behavior — byte identity, stacking,
  * metaCount, legacy sidecars — lives in TxTableSpec). */
class DvBitmapSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private val posSets: Gen[Array[Long]] = for {
    // both regimes: tight clusters (dense container wins) and scattered
    // points across a wide span (sparse container wins)
    span <- Gen.oneOf(64L, 1024L, 1L << 20, 1L << 40)
    n <- Gen.choose(1, 200)
    ps <- Gen.listOfN(n, Gen.choose(0L, span))
  } yield ps.distinct.sorted.toArray

  test("round-trip: positions(pack(ps)) == ps, contains exact") {
    val prop = Prop.forAll(posSets) { ps =>
      val packed = DvBitmap.pack(ps)
      val members = ps.toSet
      // neighbors and extremes must NOT be members
      val absent = (ps.flatMap(p => Seq(p - 1, p + 1)) ++
        Seq(0L, ps.last + 1, ps.last + 64, Long.MaxValue >>> 1))
        .filterNot(members).filter(_ >= 0)
      DvBitmap.positions(packed).toSeq == ps.toSeq &&
        ps.forall(DvBitmap.contains(packed, _)) &&
        absent.forall(!DvBitmap.contains(packed, _))
    }
    check("round-trip", prop)
  }

  test("container selection: clustered picks dense, scattered picks sparse") {
    val clustered = (1000L until 1800L).toArray // span 800 bits = 100 bytes
    assert(DvBitmap.pack(clustered)(0) == 0)
    assert(DvBitmap.pack(clustered).length == 9 + 100)
    val scattered = Array.tabulate(10)(i => i * (1L << 30)) // span 2^33+
    assert(DvBitmap.pack(scattered)(0) == 1)
    assert(DvBitmap.pack(scattered).length == 5 + 8 * 10)
  }

  test("single position and bit boundaries") {
    for (p <- Seq(0L, 7L, 8L, 63L, 64L, (1L << 33) + 7)) {
      val packed = DvBitmap.pack(Array(p))
      assert(DvBitmap.contains(packed, p))
      assert(!DvBitmap.contains(packed, p + 1))
      if (p > 0) assert(!DvBitmap.contains(packed, p - 1))
      assert(DvBitmap.positions(packed).toSeq == Seq(p))
      // a lone tombstone costs O(1) bytes wherever it sits in the file
      assert(packed.length <= 13)
    }
  }

  test("DvUnion merge law: OR of packed containers == pack of the union, any spans") {
    // the r16 read-path collapse: stacked per-commit containers of ONE
    // file OR-merge into bytes IDENTICAL to packing the united
    // position set — across disjoint sets in every container-shape
    // combination (dense×dense, dense×sparse, near and far spans)
    val prop = Prop.forAll(Gen.listOfN(4, posSets)) { sets =>
      // disjoint-ify: stacked DML refs tombstone distinct positions
      // (each commit matches only still-visible rows); shift each set
      // to its own position band so shapes stay diverse
      val shifted = sets.zipWithIndex.map { case (ps, i) =>
        ps.map(_ + i * (1L << 22))
      }
      val all = shifted.flatten.distinct.sorted.toArray
      val acc = new DvAcc
      shifted.filter(_.nonEmpty).foreach(ps =>
        acc.mergeFrom(DvAcc.from(DvBitmap.pack(ps))))
      all.isEmpty || java.util.Arrays.equals(acc.packed(), DvBitmap.pack(all))
    }
    check("dv-union merge law", prop)
  }

  test("DvUnion merge law holds for OVERLAPPING containers (repair replays)") {
    val a = DvBitmap.pack(Array(5L, 6L, 1000L))
    val b = DvBitmap.pack(Array(6L, 1000L, 1L << 35)) // overlaps a
    val acc = new DvAcc
    acc.mergeFrom(DvAcc.from(a))
    acc.mergeFrom(DvAcc.from(b))
    val merged = acc.packed()
    for (p <- Seq(5L, 6L, 1000L, 1L << 35)) assert(DvBitmap.contains(merged, p))
    for (p <- Seq(0L, 7L, 999L, (1L << 35) + 1)) assert(!DvBitmap.contains(merged, p))
  }

  test("pack refuses an empty set; dense/sparse agree at the size tie") {
    intercept[IllegalArgumentException](DvBitmap.pack(Array.empty[Long]))
    // 2 positions: sparse = 21 bytes; dense wins iff span ≤ 12 bytes
    val tight = DvBitmap.pack(Array(0L, 95L)) // span 96 bits = 12 bytes
    assert(tight(0) == 0 && tight.length == 21)
    val loose = DvBitmap.pack(Array(0L, 104L)) // 14 bytes dense > sparse
    assert(loose(0) == 1 && loose.length == 21)
    for (packed <- Seq(tight, loose)) {
      assert(DvBitmap.contains(packed, 0L))
      assert(!DvBitmap.contains(packed, 50L))
    }
  }
}
