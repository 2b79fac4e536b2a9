package graft

import graft.quality.BayesAb
import org.apache.spark.sql.functions._

/** The Bayesian A/B read, pinned three independent ways: EXACT
  * closed-form integrals (for integer Beta parameters every posterior
  * integral is a polynomial with rational coefficients — computed here
  * with BigInt rational arithmetic, no floats, no shared code with the
  * operator), hand goldens on textbook-integrable cases (uniform vs
  * Beta(2,1) etc.), and structural invariants (exact posterior means,
  * the grid-quantile rank selection on the uniform, the loss-difference
  * == mean-difference identity, k-arm subset consistency). The
  * cross-engine determinism of the integration itself is what the
  * q359/q360 DuckDB gate pins.
  */
class BayesAbSpec extends SparkSpec {
  import spark.implicits._

  // --- exact rational polynomial toolkit (spec-only, independent) ------

  private case class Rat(n: BigInt, d: BigInt) {
    def +(o: Rat): Rat = Rat.norm(n * o.d + o.n * d, d * o.d)
    def -(o: Rat): Rat = Rat.norm(n * o.d - o.n * d, d * o.d)
    def *(o: Rat): Rat = Rat.norm(n * o.n, d * o.d)
    def /(o: Rat): Rat = Rat.norm(n * o.d, d * o.n)
    def toDouble: Double = (BigDecimal(n) / BigDecimal(d)).toDouble
  }
  private object Rat {
    val zero: Rat = Rat(0, 1)
    def norm(n: BigInt, d: BigInt): Rat = {
      val s = if (d.signum < 0) -1 else 1
      val g = n.gcd(d)
      if (g == 0) Rat(0, 1) else Rat(s * n / g, s * d / g)
    }
    def int(n: BigInt): Rat = Rat(n, 1)
  }
  private type Poly = IndexedSeq[Rat] // coefficient by degree

  private def pAdd(a: Poly, b: Poly): Poly =
    (0 until math.max(a.size, b.size)).map(i =>
      (if (i < a.size) a(i) else Rat.zero) + (if (i < b.size) b(i) else Rat.zero))
  private def pMul(a: Poly, b: Poly): Poly = {
    val out = Array.fill(a.size + b.size - 1)(Rat.zero)
    for (i <- a.indices; j <- b.indices) out(i + j) = out(i + j) + a(i) * b(j)
    out.toIndexedSeq
  }
  private def pScale(a: Poly, r: Rat): Poly = a.map(_ * r)
  /** Antiderivative with F(0) = 0. */
  private def pInt(a: Poly): Poly =
    Rat.zero +: a.zipWithIndex.map { case (c, i) => c / Rat.int(i + 1) }
  private def pShiftX(a: Poly): Poly = Rat.zero +: a // multiply by x
  private def evalAt1(a: Poly): Rat = a.foldLeft(Rat.zero)(_ + _)

  private def fact(n: Int): BigInt = (BigInt(1) to BigInt(n)).product
  private def choose(n: Int, k: Int): BigInt = fact(n) / (fact(k) * fact(n - k))

  /** The Beta(a, b) pdf as an exact polynomial (integer a, b >= 1). */
  private def betaPdf(a: Int, b: Int): Poly = {
    val c = Rat.norm(fact(a + b - 1), fact(a - 1) * fact(b - 1))
    // x^(a-1) * sum_k C(b-1,k) (-1)^k x^k
    val base = (0 until b).map(k =>
      Rat.int(choose(b - 1, k) * (if (k % 2 == 0) BigInt(1) else BigInt(-1))))
    val shifted = IndexedSeq.fill(a - 1)(Rat.zero) ++ base
    pScale(shifted, c)
  }

  /** P(X > Y), X ~ Beta(a1,b1), Y ~ Beta(a2,b2) — exact. */
  private def exactPBeat(a1: Int, b1: Int, a2: Int, b2: Int): Double = {
    val fX = betaPdf(a1, b1); val fY = betaPdf(a2, b2)
    evalAt1(pInt(pMul(fX, pInt(fY)))).toDouble
  }

  /** E[max(X − Y, 0)] — exact: ∫ f_X(x)·(x·F_Y(x) − H_Y(x)) dx. */
  private def exactLoss(a1: Int, b1: Int, a2: Int, b2: Int): Double = {
    val fX = betaPdf(a1, b1); val fY = betaPdf(a2, b2)
    val cdfY = pInt(fY)
    val hY = pInt(pShiftX(fY)) // ∫ y f_Y
    val inner = pAdd(pShiftX(cdfY), pScale(hY, Rat.int(-1)))
    evalAt1(pInt(pMul(fX, inner))).toDouble
  }

  private def cellsOf(rows: Seq[(String, Long, Long, Long)]) =
    rows.toDF("arm", "peek", "n", "s_hit")

  private def run(cells: org.apache.spark.sql.DataFrame,
      arms: Seq[String], control: String) =
    BayesAb.bayesAbKArmFromCells(cells, arms, control)

  // --- hand goldens -----------------------------------------------------

  test("bayesAb: no data -> uniform posteriors, p_beat 1/2, symmetric loss 1/6, exact grid CI") {
    val out = run(cellsOf(Seq(("C", 0L, 0L, 0L), ("T", 0L, 0L, 0L))),
      Seq("C", "T"), "C").collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("a_arm") === 1L && r.getAs[Long]("b_arm") === 1L)
    assert(r.getAs[Double]("post_mean_arm") === 0.5d)
    assert(math.abs(r.getAs[Double]("p_beat_ctl") - 0.5) < 1e-9)
    // E[max(U1 - U2, 0)] = E|U1-U2|/2 = 1/6, both directions
    assert(math.abs(r.getAs[Double]("exp_loss_arm") - 1d / 6d) < 1e-6)
    assert(math.abs(r.getAs[Double]("exp_loss_ctl") - 1d / 6d) < 1e-6)
    // uniform grid quantiles: smallest i with (i+1)*200 >= 8192*5 is
    // 204 -> x = 409/16384; upper (>= 8192*195) is 7987 -> 15975/16384
    assert(r.getAs[Double]("ci_lo_arm") === 409d / 16384d)
    assert(r.getAs[Double]("ci_hi_arm") === 15975d / 16384d)
    assert(r.getAs[Double]("ci_lo_ctl") === 409d / 16384d)
    assert(r.getAs[Double]("ci_hi_ctl") === 15975d / 16384d)
  }

  test("bayesAb: Beta(2,1) vs uniform and vs Beta(1,2) — textbook integrals") {
    // T: n=1, s=1 -> Beta(2,1); C: no data -> Beta(1,1)
    val r1 = run(cellsOf(Seq(("C", 0L, 0L, 0L), ("T", 0L, 1L, 1L))),
      Seq("C", "T"), "C").collect()(0)
    assert(math.abs(r1.getAs[Double]("p_beat_ctl") - 2d / 3d) < 1e-6)
    assert(math.abs(r1.getAs[Double]("exp_loss_arm") - 1d / 12d) < 1e-6)
    assert(math.abs(r1.getAs[Double]("exp_loss_ctl") - 1d / 4d) < 1e-6)
    assert(r1.getAs[Double]("post_mean_arm") === 2d / 3d)
    // C: n=1, s=0 -> Beta(1,2)
    val r2 = run(cellsOf(Seq(("C", 0L, 1L, 0L), ("T", 0L, 1L, 1L))),
      Seq("C", "T"), "C").collect()(0)
    assert(math.abs(r2.getAs[Double]("p_beat_ctl") - 5d / 6d) < 1e-6)
    assert(math.abs(r2.getAs[Double]("exp_loss_arm") - 1d / 30d) < 1e-6)
    assert(math.abs(r2.getAs[Double]("exp_loss_ctl") - 11d / 30d) < 1e-6)
  }

  // --- exact-formula differential fuzz ----------------------------------

  test("bayesAb: differential fuzz vs exact rational polynomial integrals") {
    val rnd = new scala.util.Random(20260816L)
    // monotone cumulative counts so each peek IS an independent trial
    // under the operator's cumulative-read convention
    var nc = 0L; var sc = 0L; var nt = 0L; var st = 0L
    val rows = (0 until 12).flatMap { peek =>
      val dnc = rnd.nextInt(4); val dsc = if (dnc == 0) 0 else rnd.nextInt(dnc + 1)
      val dnt = rnd.nextInt(4); val dst = if (dnt == 0) 0 else rnd.nextInt(dnt + 1)
      Seq(("C", peek.toLong, dnc.toLong, dsc.toLong),
        ("T", peek.toLong, dnt.toLong, dst.toLong))
    }
    // replay the cumulative targets for the exact side
    val cumTargets = {
      var c = (0L, 0L, 0L, 0L)
      rows.grouped(2).map { case Seq((_, p, dnc, dsc), (_, _, dnt, dst)) =>
        c = (c._1 + dnc, c._2 + dsc, c._3 + dnt, c._4 + dst)
        (p, c._1, c._2, c._3, c._4)
      }.toSeq
    }
    val out = run(cellsOf(rows), Seq("C", "T"), "C")
      .orderBy("peek").collect()
    assert(out.length === 12)
    out.zip(cumTargets).foreach { case (r, (p, cn, cs, tn, ts)) =>
      assert(r.getAs[Long]("peek") === p)
      val (a1, b1) = (1 + ts.toInt, 1 + (tn - ts).toInt) // treatment
      val (a2, b2) = (1 + cs.toInt, 1 + (cn - cs).toInt) // control
      val pb = exactPBeat(a1, b1, a2, b2)
      val lossArm = exactLoss(a2, b2, a1, b1) // E[max(c - t, 0)]
      val lossCtl = exactLoss(a1, b1, a2, b2)
      assert(math.abs(r.getAs[Double]("p_beat_ctl") - pb) < 1e-5,
        s"p_beat peek $p: got ${r.getAs[Double]("p_beat_ctl")} want $pb")
      assert(math.abs(r.getAs[Double]("exp_loss_arm") - lossArm) < 1e-5,
        s"loss_arm peek $p")
      assert(math.abs(r.getAs[Double]("exp_loss_ctl") - lossCtl) < 1e-5,
        s"loss_ctl peek $p")
      assert(r.getAs[Double]("post_mean_arm") ===
        a1.toDouble / (a1 + b1).toDouble)
      assert(r.getAs[Double]("post_mean_ctl") ===
        a2.toDouble / (a2 + b2).toDouble)
    }
  }

  // --- structural invariants --------------------------------------------

  test("bayesAb: loss difference equals grid mean difference; k-arm subset consistency") {
    val cells4 = cellsOf(Seq(
      ("A", 0L, 40L, 10L), ("B", 0L, 38L, 16L), ("C", 0L, 35L, 9L),
      ("A", 1L, 22L, 6L), ("B", 1L, 25L, 12L), ("C", 1L, 30L, 8L)))
    val karm = run(cells4, Seq("A", "B", "C"), "A")
      .orderBy("peek", "arm").collect()
    assert(karm.length === 4) // 2 peeks x 2 treatments
    karm.foreach { r =>
      // L_ctl - L_arm = E_grid[p_t] - E_grid[p_c]; the grid means sit on
      // the exact posterior means up to the documented O(1/N^2) grid error
      val lhs = r.getAs[Double]("exp_loss_ctl") - r.getAs[Double]("exp_loss_arm")
      val rhs = r.getAs[Double]("post_mean_arm") - r.getAs[Double]("post_mean_ctl")
      assert(math.abs(lhs - rhs) < 1e-6, s"identity: $lhs vs $rhs")
      // posterior params are the exact counts
      assert(r.getAs[Long]("a_arm") === 1L + r.getAs[Long]("s_arm"))
      assert(r.getAs[Long]("b_arm") ===
        1L + r.getAs[Long]("n_arm") - r.getAs[Long]("s_arm"))
    }
    // the B-vs-A read is identical whether or not C is in the design
    val sub = run(cells4.filter(col("arm") =!= "C"), Seq("A", "B"), "A")
      .orderBy("peek").collect()
    val bRows = karm.filter(_.getAs[String]("arm") == "B")
    sub.zip(bRows).foreach { case (s, b) =>
      assert(s.toSeq === b.toSeq, s"subset consistency: $s vs $b")
    }
  }

  // --- P(best) ----------------------------------------------------------

  test("bayesBest: k = 2 reduces to the pairwise p_beat; probabilities sum to 1") {
    val cells = cellsOf(Seq(("C", 0L, 40L, 10L), ("T", 0L, 38L, 16L),
      ("C", 1L, 30L, 9L), ("T", 1L, 25L, 12L)))
    val best = BayesAb.bayesBestKArmFromCells(cells, Seq("C", "T"))
      .orderBy("peek", "arm").collect()
    val pair = run(cells, Seq("C", "T"), "C").orderBy("peek").collect()
    assert(best.length === 4)
    // T's P(best) == the pairwise P(T beats C); C's == the complement
    for (p <- 0 to 1) {
      val bT = best.filter(r => r.getAs[Long]("peek") == p &&
        r.getAs[String]("arm") == "T")(0).getAs[Double]("p_best")
      val bC = best.filter(r => r.getAs[Long]("peek") == p &&
        r.getAs[String]("arm") == "C")(0).getAs[Double]("p_best")
      val pb = pair(p).getAs[Double]("p_beat_ctl")
      assert(math.abs(bT - pb) < 1e-9, s"peek $p: $bT vs pairwise $pb")
      assert(math.abs(bT + bC - 1d) < 1e-9, s"peek $p sums to ${bT + bC}")
    }
  }

  test("bayesBest: three empty arms split P(best) exactly three ways") {
    val out = BayesAb.bayesBestKArmFromCells(
      cellsOf(Seq(("A", 0L, 0L, 0L), ("B", 0L, 0L, 0L), ("C", 0L, 0L, 0L))),
      Seq("A", "B", "C")).collect()
    assert(out.length === 3)
    out.foreach(r =>
      assert(math.abs(r.getAs[Double]("p_best") - 1d / 3d) < 1e-6, r.toString))
  }

  test("bayesBest: exact rational differential on a 3-arm posterior") {
    // P(X best) = ∫ f_X · F_Y · F_Z — the poly toolkit extends directly
    def exactBest(a1: Int, b1: Int, a2: Int, b2: Int,
        a3: Int, b3: Int): Double = {
      val fX = betaPdf(a1, b1)
      val inner = pMul(pMul(fX, pInt(betaPdf(a2, b2))), pInt(betaPdf(a3, b3)))
      evalAt1(pInt(inner)).toDouble
    }
    val cells = cellsOf(Seq(("A", 0L, 6L, 2L), ("B", 0L, 5L, 3L),
      ("C", 0L, 7L, 4L)))
    val out = BayesAb.bayesBestKArmFromCells(cells, Seq("A", "B", "C"))
      .collect().map(r => r.getAs[String]("arm") -> r.getAs[Double]("p_best"))
      .toMap
    // posteriors: A ~ Beta(3,5), B ~ Beta(4,3), C ~ Beta(5,4)
    assert(math.abs(out("A") - exactBest(3, 5, 4, 3, 5, 4)) < 1e-5, out.toString)
    assert(math.abs(out("B") - exactBest(4, 3, 3, 5, 5, 4)) < 1e-5)
    assert(math.abs(out("C") - exactBest(5, 4, 3, 5, 4, 3)) < 1e-5)
    assert(math.abs(out.values.sum - 1d) < 1e-6)
  }

  test("bayesBest: q382 fixture adequacy — B's lower threshold genuinely wins") {
    val pu = graft.queries.CoreQueries.abPerUserKForSpec(
      spark, "/root/testdata/sf0.01")
    val cells = graft.quality.AbDashboard.abCells(
      pu, "arm", "peek", "y", "x", "hit")
    val out = BayesAb.bayesBestKArmFromCells(cells, Seq("A", "B", "C", "D"))
      .filter(col("peek") === 5L).collect()
    val byArm = out.map(r => r.getAs[String]("arm") -> r).toMap
    assert(math.abs(out.map(_.getAs[Double]("p_best")).sum - 1d) < 1e-6)
    assert(byArm("B").getAs[Double]("p_best") > 0.9,
      s"B converts at >= 200 — it should dominate: ${byArm.mapValues(_.getAs[Double]("p_best"))}")
    assert(byArm("D").getAs[Double]("p_best") < 0.05,
      "D converts at >= 300 — it should be out of the race")
  }

  test("bayesAb: empty-peek spine carries the prior (no NULLs, p_beat 1/2 at the gap)") {
    // arm T silent at peek 0, arrives at peek 1: peek-0 row reads the
    // prior against the control's posterior — live, never NULL
    val out = run(cellsOf(Seq(("C", 0L, 10L, 5L), ("C", 1L, 10L, 5L),
        ("T", 1L, 12L, 9L))), Seq("C", "T"), "C")
      .orderBy("peek").collect()
    assert(out.length === 2)
    val p0 = out(0)
    assert(p0.getAs[Long]("n_arm") === 0L)
    assert(p0.getAs[Double]("post_mean_arm") === 0.5d)
    assert(!p0.isNullAt(p0.fieldIndex("p_beat_ctl")))
    val pb = p0.getAs[Double]("p_beat_ctl")
    val exact = exactPBeat(1, 1, 6, 6)
    assert(math.abs(pb - exact) < 1e-5)
  }
}
