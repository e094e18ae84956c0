package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** scalacheck properties (SURVEY §5.2 #3) at the aggregation-buffer
  * level — no Spark session, so hundreds of cases run in milliseconds:
  *   - Welch buffer merge is partition-invariant for ANY split of the
  *     input (Spark may combine partials in any order/shape);
  *   - the t CDF/quantile kernels are monotone and inverse to each
  *     other (CI half-width therefore shrinks as n grows).
  */
class WelchPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private def reduceAll(xs: Seq[WelchIn]): WelchBuf =
    xs.foldLeft(WelchTTest.zero)(WelchTTest.reduce)

  private val genIn: Gen[WelchIn] = for {
    v <- Gen.choose(-1e4, 1e4)
    after <- Gen.oneOf(true, false)
  } yield WelchIn(v, after)

  test("welch merge equals single-pass reduce for any split") {
    val prop = Prop.forAll(Gen.listOf(genIn), Gen.choose(0, 100)) { (xs, cut) =>
      val i = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (l, r) = xs.splitAt(i)
      val merged = WelchTTest.merge(reduceAll(l), reduceAll(r))
      val direct = reduceAll(xs)
      def close(a: Double, b: Double) =
        math.abs(a - b) <= 1e-9 * (1.0 + math.abs(a) + math.abs(b))
      merged.nB == direct.nB && merged.nA == direct.nA &&
        close(merged.meanB, direct.meanB) && close(merged.meanA, direct.meanA) &&
        close(merged.m2B, direct.m2B) && close(merged.m2A, direct.m2A)
    }
    check("merge-split", prop)
  }

  test("merge of three parts is association-order independent") {
    val prop = Prop.forAll(Gen.listOf(genIn), Gen.listOf(genIn), Gen.listOf(genIn)) {
      (a, b, c) =>
        val (ba, bb, bc) = (reduceAll(a), reduceAll(b), reduceAll(c))
        val left = WelchTTest.merge(WelchTTest.merge(ba, bb), bc)
        val right = WelchTTest.merge(ba, WelchTTest.merge(bb, bc))
        def close(x: Double, y: Double) =
          math.abs(x - y) <= 1e-9 * (1.0 + math.abs(x) + math.abs(y))
        left.nB == right.nB && left.nA == right.nA &&
          close(left.meanB, right.meanB) && close(left.m2B, right.m2B) &&
          close(left.meanA, right.meanA) && close(left.m2A, right.m2A)
    }
    check("merge-assoc", prop)
  }

  test("t quantile/CDF are inverse and monotone; CI shrinks with n") {
    val genP = Gen.choose(0.51, 0.99)
    val genDf = Gen.choose(1.0, 500.0)
    check("ppf-cdf-roundtrip", Prop.forAll(genP, genDf) { (p, df) =>
      math.abs(TMath.cdf(TMath.ppf(p, df), df) - p) < 1e-7
    })
    check("cdf-monotone-x", Prop.forAll(Gen.choose(-50.0, 50.0), Gen.choose(-50.0, 50.0), genDf) {
      (x1, x2, df) => x1 == x2 || (TMath.cdf(math.min(x1, x2), df) <= TMath.cdf(math.max(x1, x2), df))
    })
    // t_{0.975, n-1} decreases in n ⇒ for fixed sample sd the CI
    // half-width sd/sqrt(n) * t is strictly tighter as n grows
    check("ci-shrinks", Prop.forAll(Gen.choose(2, 400)) { n =>
      val h1 = TMath.ppf(0.975, n - 1.0) / math.sqrt(n.toDouble)
      val h2 = TMath.ppf(0.975, n.toDouble) / math.sqrt(n + 1.0)
      h2 < h1
    })
  }
}
