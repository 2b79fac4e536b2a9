package graft

import graft.quality.GroupSequential
import org.apache.spark.sql.functions._

/** The group-sequential boundary solver's anchors and the monitor's
  * closure invariants: K = 1 reduces to the fixed test at every pinned
  * α; the K = 5 and K = 2 OBF boundaries reproduce the published
  * Lan–DeMets tables (DeMets & Lan 1994 — an EXTERNAL anchor, the
  * convention the r14 ADVICE prescribed); Pocock-like boundaries match
  * their published first look and keep their structural shape; each
  * look's first-crossing probability re-verifies against an INDEPENDENT
  * bivariate-normal quadrature (Simpson over the conditional tail — a
  * different formulation than the solver's grid recursion + bisection);
  * and the Spark monitor is monotone, boundary-safe, and NULL-correct
  * past the planned K.
  */
class GroupSequentialSpec extends SparkSpec {
  import spark.implicits._

  test("K = 1 reduces to the fixed test at every pinned alpha") {
    for ((a, z) <- Seq(0.05 -> 1.959964, 0.01 -> 2.575829, 0.10 -> 1.644854);
        sp <- Seq("obf", "pocock")) {
      val b = GroupSequential.boundaries(1, a, sp)
      assert(b.size === 1)
      assert(math.abs(b.head.z - z) < 2e-4, s"$sp alpha $a")
      assert(math.abs(b.head.alphaSpent - a) < 1e-9)
    }
  }

  test("OBF boundaries reproduce the published Lan-DeMets tables (external anchor)") {
    // DeMets & Lan 1994, two-sided alpha = 0.05, equally spaced looks
    val k5 = GroupSequential.boundaries(5, 0.05, "obf").map(_.z)
    for ((got, pub) <- k5.zip(Seq(4.8769, 3.3569, 2.6803, 2.2898, 2.0310)))
      assert(math.abs(got - pub) < 1e-3, s"K=5 got $got want $pub")
    val k2 = GroupSequential.boundaries(2, 0.05, "obf").map(_.z)
    for ((got, pub) <- k2.zip(Seq(2.9626, 1.9686)))
      assert(math.abs(got - pub) < 1e-3, s"K=2 got $got want $pub")
  }

  test("K = 12 gate boundary vectors are pinned (solver regression cannot drift gate + oracle together)") {
    // The q330/q331 oracles interpolate their boundary constants from
    // this solver, so the DuckDB gate verifies only the data path — a
    // solver regression would move gate and oracle identically. These
    // literals are the exact vectors the r15 gates shipped with
    // (captured from the anchored solver); any drift fails HERE.
    val obfZ = Seq(7.676100223690981, 5.366557708692614, 4.333096944621097,
      3.7166404968410887, 3.3012058624805176, 2.9987560702935494,
      2.7666429126357053, 2.580130638666605, 2.4276677263630044,
      2.2990318510332552, 2.1883614725433613, 2.093963057900293)
    val pocZ = Seq(2.7118375888718207, 2.676783457289674, 2.6401200262400986,
      2.6111751117359465, 2.5857712155929207, 2.5642114438999477,
      2.54679765143705, 2.533261080049832, 2.519757244947883,
      2.508729072130312, 2.499754518097727, 2.4902657038483245)
    for ((got, want) <- GroupSequential.boundaries(12, 0.05, "obf").map(_.z).zip(obfZ))
      assert(math.abs(got - want) < 1e-9, s"obf K=12 got $got want $want")
    for ((got, want) <- GroupSequential.boundaries(12, 0.05, "pocock").map(_.z).zip(pocZ))
      assert(math.abs(got - want) < 1e-9, s"pocock K=12 got $got want $want")
    // full spend on both (the cumulative-spend invariant at the gate K)
    assert(math.abs(GroupSequential.boundaries(12, 0.05, "obf").last.alphaSpent - 0.05) < 1e-12)
    assert(math.abs(GroupSequential.boundaries(12, 0.05, "pocock").last.alphaSpent - 0.05) < 1e-12)
  }

  test("Pocock-like boundaries: published first look, near-flat decreasing shape, full spend") {
    val bs = GroupSequential.boundaries(5, 0.05, "pocock")
    assert(math.abs(bs.head.z - 2.4380) < 1e-3) // ldbounds/gsDesign first look
    for (Seq(a, b) <- bs.map(_.z).sliding(2))
      assert(a > b, "Pocock-like boundaries decrease")
    assert(bs.last.z > 1.959964) // always above the fixed test
    assert(math.abs(bs.last.alphaSpent - 0.05) < 1e-12)
    // OBF is more conservative early, less at the end
    val obf = GroupSequential.boundaries(5, 0.05, "obf")
    assert(obf.head.z > bs.head.z && obf.last.z < bs.last.z)
  }

  test("power-family spending: K = 1 reduction, full spend, the rho ordering") {
    for (sp <- Seq("power1", "power3", "power0.5")) {
      val b1 = GroupSequential.boundaries(1, 0.05, sp)
      assert(math.abs(b1.head.z - 1.959964) < 2e-4, sp)
      val b5 = GroupSequential.boundaries(5, 0.05, sp)
      assert(math.abs(b5.last.alphaSpent - 0.05) < 1e-12, sp)
    }
    // bigger rho spends later: first boundaries order power0.5 < power1
    // < power3, and power3's last look sits near OBF's (both back-load)
    def first(sp: String) = GroupSequential.boundaries(5, 0.05, sp).head.z
    assert(first("power0.5") < first("power1") && first("power1") < first("power3"))
    val p3 = GroupSequential.boundaries(5, 0.05, "power3").last.z
    val obf = GroupSequential.boundaries(5, 0.05, "obf").last.z
    assert(math.abs(p3 - obf) < 0.15, s"power3 last $p3 vs obf last $obf")
    intercept[IllegalArgumentException] {
      GroupSequential.boundaries(2, 0.05, "power0")
    }
  }

  test("boundariesAt: arbitrary information fractions — equal-grid consistency + unequal looks") {
    val eq = GroupSequential.boundaries(2, 0.05, "obf")
    val at = GroupSequential.boundariesAt(Seq(0.5, 1.0), 0.05, "obf")
    assert(eq.map(_.z) === at.map(_.z))
    val un = GroupSequential.boundariesAt(Seq(0.3, 0.6, 1.0), 0.05, "obf")
    assert(un.map(_.t) === Seq(0.3, 0.6, 1.0))
    assert(math.abs(un.last.alphaSpent - 0.05) < 1e-12)
    for (Seq(a, b) <- un.map(_.z).sliding(2)) assert(a > b)
    // late first look spends more than the equally-spaced first look
    val eqFirstSpend = GroupSequential.spend(1.0 / 3, 0.05, "obf")
    assert(GroupSequential.spend(0.3, 0.05, "obf") < eqFirstSpend)
    intercept[IllegalArgumentException] {
      GroupSequential.boundariesAt(Seq(0.5, 0.4), 0.05, "obf")
    }
  }

  test("first-crossing probabilities re-verify against an independent bivariate quadrature") {
    // P(first crossing at look 2 of K=2) = ∫_{-∞}^{b1} φ_{t1}(y)·
    // (1 − Φ((b2−y)/√Δ)) dy — Simpson on a fine grid, a genuinely
    // different path than the solver's trapezoid recursion + bisection
    for (sp <- Seq("obf", "pocock", "power2"); a <- Seq(0.05, 0.01)) {
      val bs = GroupSequential.boundaries(2, a, sp)
      val t1 = 0.5; val d = 0.5
      val b1 = bs(0).z * math.sqrt(t1)
      val b2 = bs(1).z * math.sqrt(1.0)
      val lo = -8.0 * math.sqrt(t1)
      val n = 16000 // even
      val h = (b1 - lo) / n
      def f(y: Double): Double =
        math.exp(-0.5 * y * y / t1) / math.sqrt(2.0 * math.Pi * t1) *
          (1.0 - GroupSequential.phi((b2 - y) / math.sqrt(d)))
      var s = f(lo) + f(b1)
      for (i <- 1 until n)
        s += (if (i % 2 == 1) 4.0 else 2.0) * f(lo + i * h)
      val p2 = s * h / 3.0
      val inc = GroupSequential.spend(1.0, a, sp) - GroupSequential.spend(t1, a, sp)
      // the solver's design budget: grid O(h²) + the barrier-cell cut
      // ⇒ |Δp| ≲ 3e-5 per look (|Δz| ≲ 1e-3 — what the published-table
      // anchors confirm); the quadrature must agree within that budget
      assert(math.abs(p2 - inc) < 5e-5, s"$sp alpha $a: quad $p2 vs spend $inc")
    }
  }

  test("monitor: immediate huge effect crosses at look 1; null effect never crosses; monotone") {
    val big = Seq((1L, 1000L, 900L, 1000L, 100L), (2L, 100L, 50L, 100L, 50L))
      .toDF("peek", "n1", "s1", "n2", "s2")
    val rb = GroupSequential.groupSequentialTwoProportion(
      big, Nil, "peek", "n1", "s1", "n2", "s2", k = 2).orderBy("peek").collect()
    assert(rb(0).getAs[Boolean]("reject_at") && rb(0).getAs[Boolean]("crossed"))
    assert(rb(1).getAs[Boolean]("crossed")) // monotone even if look 2 is quiet
    val nul = Seq((1L, 500L, 100L, 500L, 100L), (2L, 500L, 100L, 500L, 100L))
      .toDF("peek", "n1", "s1", "n2", "s2")
    val rn = GroupSequential.groupSequentialTwoProportion(
      nul, Nil, "peek", "n1", "s1", "n2", "s2", k = 2).orderBy("peek").collect()
    assert(rn.forall(r => !r.getAs[Boolean]("reject_at")))
    assert(rn.forall(r => !r.getAs[Boolean]("crossed")))
    assert(rn(0).getAs[Double]("z") === -rn(0).getAs[Double]("z") * -1.0) // defined
  }

  test("mean monitor: hand Welch z, K = 1 fixed-test boundary, tiny-arm NULL") {
    // one look: A moments n=4 Σ=12 Σ²=56 (values 0,2,4,6), B n=4 Σ=4 Σ²=6
    // (1,1,1,1 → zero variance contributes V2=n·q−s²=24−16=8... use 0,1,1,2:
    // Σ=4 Σ²=6, V2 = 4·6−16 = 8)
    val df = Seq((1L, 4L, 12L, 56L, 4L, 4L, 6L))
      .toDF("peek", "n1", "s1", "q1", "n2", "s2", "q2")
    val r = GroupSequential.groupSequentialMean(
      df, Nil, "peek", "n1", "s1", "q1", "n2", "s2", "q2", k = 1).collect()(0)
    val v1 = 4.0 * 56 - 144; val v2 = 4.0 * 6 - 16
    val v = v1 / (4.0 * 4 * 3) + v2 / (4.0 * 4 * 3)
    val z = (12.0 * 4 - 4.0 * 4) / (4.0 * 4) / math.sqrt(v)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
    assert(math.abs(r.getAs[Double]("z_bound") - 1.959964) < 2e-4)
    assert(r.getAs[Boolean]("reject_at") === (math.abs(z) >= r.getAs[Double]("z_bound")))
    // n < 2 on an arm: NULL z, no crossing, no crash (ANSI)
    val tiny = GroupSequential.groupSequentialMean(
      Seq((1L, 1L, 5L, 25L, 4L, 4L, 6L))
        .toDF("peek", "n1", "s1", "q1", "n2", "s2", "q2"),
      Nil, "peek", "n1", "s1", "q1", "n2", "s2", "q2", k = 1).collect()(0)
    assert(tiny.isNullAt(tiny.fieldIndex("z")))
    assert(!tiny.getAs[Boolean]("crossed"))
  }

  test("phiCol evaluates the driver Phi bit-for-bit in-engine") {
    import spark.implicits._
    val xs = Seq(-6.0, -2.5, -1.0, -0.1, 0.0, 0.3, 1.0, 1.959964, 3.7, 6.0)
    val got = xs.toDF("x").select(GroupSequential.phiCol(col("x")).as("p"))
      .collect().map(_.getDouble(0))
    for ((x, p) <- xs.zip(got))
      assert(p === GroupSequential.phi(x), s"phi($x)")
  }

  test("conditional power: hand B-value replay, trend==null at z=0, certain-win, last-look NULL") {
    // one experiment, 2 of 4 looks observed: counts chosen so z is stable
    val incr = Seq((1L, 400L, 140L, 400L, 100L), (2L, 400L, 120L, 400L, 120L),
      (3L, 400L, 130L, 400L, 110L), (4L, 400L, 130L, 400L, 110L))
      .toDF("peek", "n1", "s1", "n2", "s2")
    val r = GroupSequential.conditionalPowerTwoProportion(
      incr, Nil, "peek", "n1", "s1", "n2", "s2", k = 4, deltaDesign = 0.05)
      .orderBy("peek").collect()
    // hand replay at look 1 (t = 1/4): delta/v from the cumulative counts
    val (n1, s1, n2, s2) = (400.0, 140.0, 400.0, 100.0)
    val delta = (s1 * n2 - s2 * n1) / (n1 * n2)
    val pp = (s1 + s2) / (n1 + n2)
    val v = pp * (1 - pp) * (1 / n1 + 1 / n2)
    val t = 0.25
    val b = delta / math.sqrt(v) * math.sqrt(t)
    def cp(theta: Double) = 1.0 - GroupSequential.phi(
      (1.959964 - b - theta * (1 - t)) / math.sqrt(1 - t))
    assert(math.abs(r(0).getAs[Double]("cp_null") - cp(0.0)) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("cp_trend") - cp(b / t)) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("cp_design") -
      cp(0.05 / (math.sqrt(v) * math.sqrt(t)))) < 1e-12)
    // the trend CP of a strong positive start dominates the null CP
    assert(r(0).getAs[Double]("cp_trend") > r(0).getAs[Double]("cp_null"))
    // final look: the fixed test answers, CPs are NULL
    val last = r.last
    for (c <- Seq("cp_null", "cp_trend", "cp_design"))
      assert(last.isNullAt(last.fieldIndex(c)), c)
    // balanced arms → z = 0 → B = 0 → cp_trend == cp_null exactly
    val flat = GroupSequential.conditionalPowerTwoProportion(
      Seq((1L, 400L, 100L, 400L, 100L), (2L, 400L, 100L, 400L, 100L))
        .toDF("peek", "n1", "s1", "n2", "s2"),
      Nil, "peek", "n1", "s1", "n2", "s2", k = 2, deltaDesign = 0.05)
      .orderBy("peek").collect()(0)
    assert(flat.getAs[Double]("cp_trend") === flat.getAs[Double]("cp_null"))
    // an overwhelming interim effect makes every CP ≈ 1
    val win = GroupSequential.conditionalPowerTwoProportion(
      Seq((1L, 1000L, 900L, 1000L, 100L), (2L, 10L, 5L, 10L, 5L))
        .toDF("peek", "n1", "s1", "n2", "s2"),
      Nil, "peek", "n1", "s1", "n2", "s2", k = 2, deltaDesign = 0.05)
      .orderBy("peek").collect()(0)
    for (c <- Seq("cp_null", "cp_trend", "cp_design"))
      assert(win.getAs[Double](c) > 0.999, c)
  }

  test("monitor: looks past the planned K carry NULL boundary, never drop; unusable peeks NULL z") {
    val df = Seq((1L, 100L, 30L, 100L, 20L), (2L, 100L, 30L, 100L, 20L),
      (3L, 100L, 30L, 100L, 20L)).toDF("peek", "n1", "s1", "n2", "s2")
    val r = GroupSequential.groupSequentialTwoProportion(
      df, Nil, "peek", "n1", "s1", "n2", "s2", k = 2).orderBy("peek").collect()
    assert(r.length === 3)
    val third = r(2)
    assert(third.isNullAt(third.fieldIndex("z_bound")))
    assert(third.isNullAt(third.fieldIndex("reject_at")))
    // empty-arm peek: z NULL, no crash (ANSI), no evidence
    val e = GroupSequential.groupSequentialTwoProportion(
      Seq((1L, 100L, 30L, 0L, 0L)).toDF("peek", "n1", "s1", "n2", "s2"),
      Nil, "peek", "n1", "s1", "n2", "s2", k = 1).collect()(0)
    assert(e.isNullAt(e.fieldIndex("z")))
    assert(!e.getAs[Boolean]("crossed"))
  }
}
