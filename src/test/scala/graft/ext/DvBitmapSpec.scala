package graft.ext

import org.apache.spark.sql.catalyst.util.GenericArrayData
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

  test("containsAny probes a stack of containers") {
    val a = DvBitmap.pack(Array(5L, 6L))
    val b = DvBitmap.pack(Array(1L << 35))
    val stack = new GenericArrayData(Array[Any](a, b))
    assert(DvBitmap.containsAny(stack, 5L))
    assert(DvBitmap.containsAny(stack, 6L))
    assert(DvBitmap.containsAny(stack, 1L << 35))
    assert(!DvBitmap.containsAny(stack, 7L))
    assert(!DvBitmap.containsAny(stack, 0L))
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
