package graft

import graft.operators.Sampling
import graft.similarity.Knn
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the pure (driver-side) helpers whose
  * correctness the distributed operators lean on. No SparkSession — these
  * run in milliseconds and pin down edge cases example tests miss.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("hexThreshold is monotone in fraction and spans the full range") {
    check(Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      Sampling.hexThreshold(lo) <= Sampling.hexThreshold(hi)
    })
    assert(Sampling.hexThreshold(0.0) == "0" * 15)
    assert(Sampling.hexThreshold(1.0) == "g") // past every hex digit
    // thresholds are valid lowercase fixed-width hex below 1.0
    check(Prop.forAll(Gen.choose(0.0, 0.999999)) { f =>
      val t = Sampling.hexThreshold(f)
      t.length == 15 && t.forall(c => c.isDigit || ('a' to 'f').contains(c))
    })
  }

  test("probeMasks: correct count, distinct, within radius") {
    def choose(n: Int, k: Int): Long =
      if (k == 0) 1L else choose(n, k - 1) * (n - k + 1) / k
    check(Prop.forAll(Gen.choose(1, 12), Gen.choose(0, 3)) { (planes, radius) =>
      val r = math.min(radius, planes)
      val masks = Knn.probeMasks(planes, r)
      masks.size == (0 to r).map(choose(planes, _)).sum &&
        masks.distinct.size == masks.size &&
        masks.forall(m => java.lang.Long.bitCount(m) <= r) &&
        masks.forall(m => (m >> planes) == 0L) && // only low bits perturbed
        masks.contains(0L)                        // own bucket always probed
    })
  }

  test("exact-quantile rank selections stay in [1, n] and are ordered") {
    check(Prop.forAll(Gen.choose(1L, 100000L)) { n =>
      val p50 = (n + 1) / 2
      val p90 = (9 * n + 9) / 10
      val q1 = (n + 3) / 4
      val q3 = (3 * n + 3) / 4
      Seq(p50, p90, q1, q3).forall(r => r >= 1 && r <= n) &&
        (n < 10 || (q1 <= p50 && p50 <= q3 && q3 <= p90))
    })
  }

  test("splitAssign threshold chain is strictly layered for binary-exact splits") {
    // the cumulative thresholds used by splitAssign must be strictly
    // increasing, otherwise a split label would be unreachable
    val splits = Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.125, "d" -> 0.125)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val ts = cum.init.map(Sampling.hexThreshold)
    assert(ts == ts.sorted && ts.distinct.size == ts.size)
  }
}
