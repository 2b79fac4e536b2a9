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

  test("BPE subword counts are bounded and merge-monotone") {
    import graft.text.Bpe
    val ranks = Bpe.defaultRanks
    val wordGen = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    check(Prop.forAll(wordGen) { w =>
      val c = Bpe.subwordCount(w, ranks)
      // merging only ever reduces: between 1 (full merge) and len (none);
      // empty words count zero
      if (w.isEmpty) c == 0 else c >= 1 && c <= w.length
    })
    // an empty merges table means no merging at all: count == chars
    check(Prop.forAll(wordGen) { w =>
      Bpe.subwordCount(w, Map.empty) == w.length
    })
    // appending a character never DECREASES the count by more than the
    // merges it can participate in (sanity: counts don't jump wildly)
    check(Prop.forAll(wordGen, Gen.alphaLowerChar) { (w, ch) =>
      Bpe.subwordCount(w + ch, ranks) <= Bpe.subwordCount(w, ranks) + 1
    })
  }

  test("sliding-chunk geometry covers every token exactly ceil-style") {
    // formula-level property over the full random grid; the REAL Column
    // operator is exercised on a deterministic (n, W, S) grid by
    // ChunkSourceSpec's coverage test (and hash-gated by q89) — this
    // mirror exists to explore far more (n, W, S) combinations than a
    // Spark-backed test affordably can
    check(Prop.forAll(
      Gen.chooseNum(0, 500), Gen.chooseNum(1, 64)) { (n, wRaw) =>
      val w = wRaw
      Prop.forAll(Gen.chooseNum(1, w)) { s =>
        val nc = if (n <= w) 1 else ((n - w + s - 1) / s) + 1
        val starts = (0 until nc).map(_ * s)
        val covered = starts.flatMap(st => st until math.min(st + w, math.max(n, 1)))
        // every token index < n covered; last chunk start < n (non-empty)
        (if (n == 0) true else covered.toSet == (0 until n).toSet) &&
          starts.last < math.max(n, 1)
      }
    })
  }

  test("dyadic sqrt-chain decomposition equals math.pow within rounding slack") {
    // literal Scala mirror of Sampling.dyadicPow's pinned chain (the
    // Column form is hash-gated end-to-end by q87 and the quarters
    // bit-identity spec; this property validates the exponent
    // DECOMPOSITION across the whole grid): binary-expand num/den,
    // multiply matching nested sqrts ascending, integer part first
    def chain(r: Double, num: Int, den: Int): Double = {
      val k = java.lang.Integer.numberOfTrailingZeros(den)
      var acc = 1.0
      var accSet = false
      def mul(x: Double): Unit = { acc = if (accSet) acc * x else x; accSet = true }
      var intPart = num / den
      var whole = r
      while (intPart > 0) {
        if ((intPart & 1) == 1) mul(whole)
        intPart >>= 1
        if (intPart > 0) whole = whole * whole
      }
      var cur = r
      var j = 1
      val frac = num % den
      while (j <= k) {
        cur = math.sqrt(cur)
        if (((frac >> (k - j)) & 1) == 1) mul(cur)
        j += 1
      }
      acc
    }
    check(Prop.forAll(Gen.choose(1e-6, 1.0), Gen.chooseNum(1, 63)) { (r, num) =>
      val den = 64
      val exact = math.pow(r, num.toDouble / den)
      val got = chain(r, num, den)
      // k correctly-rounded sqrts + multiplies accumulate a few ulps
      math.abs(got - exact) <= math.ulp(exact) * 16
    })
    // integer + fractional parts compose: r^(5/2) = r^2 * sqrt(r)
    check(Prop.forAll(Gen.choose(0.1, 2.0)) { r =>
      math.abs(chain(r, 5, 2) - r * r * math.sqrt(r)) <= math.ulp(r * r) * 8
    })
  }
}
