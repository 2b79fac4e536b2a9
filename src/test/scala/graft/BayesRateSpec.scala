package graft

import graft.quality.BayesRate
import org.apache.spark.sql.functions._

/** The Gamma–Poisson rate read, pinned three independent ways: exact
  * rational NB tails (BigInt arithmetic over the closed form — no
  * floats, no shared code), the textbook two-exponentials golden
  * (P(beat) = 1/2, both losses exactly 1/2), and the loss-difference ==
  * posterior-mean-difference identity. Cross-engine determinism of the
  * landed-log series is what the q380/q381 DuckDB gate pins.
  */
class BayesRateSpec extends SparkSpec {
  import spark.implicits._

  private def cellsOf(rows: Seq[(String, Long, Long, Long)]) =
    rows.toDF("arm", "peek", "e", "c")

  private def run(cells: org.apache.spark.sql.DataFrame,
      arms: Seq[String], control: String) =
    BayesRate.bayesRateKArmFromCells(cells, arms, control)

  // exact rational P(X > Y) for X~Gamma(at, bt), Y~Gamma(ac, bc),
  // integer everything: sum_{j<at} C(ac+j-1, j) bt^j bc^ac / (bt+bc)^(ac+j)
  private def exactTail(at: Long, bt: Long, ac: Long, bc: Long): Double = {
    def choose(n: Long, k: Long): BigInt =
      (BigInt(n - k + 1) to BigInt(n)).product /
        (BigInt(1) to BigInt(k)).product
    val s = BigInt(bt + bc)
    var num = BigInt(0); var den = BigInt(1)
    // accumulate with common denominator s^(ac+at-1)
    val maxPow = ac + at - 1
    for (j <- 0L until at) {
      val t = choose(ac + j - 1, j) * BigInt(bt).pow(j.toInt) *
        BigInt(bc).pow(ac.toInt) * s.pow((maxPow - ac - j).toInt)
      num += t
    }
    den = s.pow(maxPow.toInt)
    (BigDecimal(num) / BigDecimal(den)).toDouble
  }

  test("bayesRate: two unit-exponential posteriors — p_beat 1/2, both losses exactly 1/2") {
    // no data + Gamma(1,1) prior on both sides
    val out = run(cellsOf(Seq(("C", 0L, 0L, 0L), ("T", 0L, 0L, 0L))),
      Seq("C", "T"), "C").collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("a_arm") === 1L && r.getAs[Long]("b_arm") === 1L)
    assert(r.getAs[Double]("post_mean_arm") === 1d)
    assert(math.abs(r.getAs[Double]("p_beat_ctl") - 0.5) < 1e-9)
    // E[max(X-Y,0)] = E|X-Y|/2 = 1/2 for iid Exp(1)
    assert(math.abs(r.getAs[Double]("exp_loss_arm") - 0.5) < 1e-8)
    assert(math.abs(r.getAs[Double]("exp_loss_ctl") - 0.5) < 1e-8)
  }

  test("bayesRate: differential fuzz vs exact rational NB tails") {
    val rnd = new scala.util.Random(20260827L)
    for (trial <- 0 until 8) {
      val (et, ct) = (1L + rnd.nextInt(30), rnd.nextInt(20).toLong)
      val (ec, cc) = (1L + rnd.nextInt(30), rnd.nextInt(20).toLong)
      val r = run(cellsOf(Seq(("C", 0L, ec, cc), ("T", 0L, et, ct))),
        Seq("C", "T"), "C").collect()(0)
      val (at, bt) = (1L + ct, 1L + et)
      val (ac, bc) = (1L + cc, 1L + ec)
      val p0 = exactTail(at, bt, ac, bc)
      assert(math.abs(r.getAs[Double]("p_beat_ctl") - p0) < 1e-8,
        s"trial $trial: got ${r.getAs[Double]("p_beat_ctl")} want $p0 " +
          s"(at=$at bt=$bt ac=$ac bc=$bc)")
      // losses via the shifted-shape tails
      val p1 = exactTail(at + 1, bt, ac, bc)
      val p2 = exactTail(at, bt, ac + 1, bc)
      val mt = at.toDouble / bt; val mc = ac.toDouble / bc
      assert(math.abs(r.getAs[Double]("exp_loss_ctl") - (mt * p1 - mc * p2))
        < 1e-7, s"trial $trial loss_ctl")
      assert(math.abs(r.getAs[Double]("exp_loss_arm") -
        (mc * (1 - p2) - mt * (1 - p1))) < 1e-7, s"trial $trial loss_arm")
      // the identity: loss_arm - loss_ctl = mc - mt
      assert(math.abs(
        (r.getAs[Double]("exp_loss_arm") - r.getAs[Double]("exp_loss_ctl")) -
          (mc - mt)) < 1e-8, s"trial $trial identity")
    }
  }

  test("bayesRate: larger counts — the series machinery at realistic scale") {
    // a genuine gap: 80/1000 vs 50/1000; p_beat must be near 1, the
    // identity must hold, and the posterior means are exact divisions
    val r = run(cellsOf(Seq(("C", 0L, 1000L, 50L), ("T", 0L, 1000L, 80L))),
      Seq("C", "T"), "C").collect()(0)
    assert(r.getAs[Double]("post_mean_arm") === 81d / 1001d)
    assert(r.getAs[Double]("p_beat_ctl") > 0.99,
      s"80 vs 50 out of 1000 must be near-certain: $r")
    val mt = 81d / 1001d; val mc = 51d / 1001d
    assert(math.abs(
      (r.getAs[Double]("exp_loss_arm") - r.getAs[Double]("exp_loss_ctl")) -
        (mc - mt)) < 1e-8)
    // cumulative peeks: evidence accumulates, p_beat rises
    val two = run(cellsOf(Seq(("C", 0L, 500L, 25L), ("C", 1L, 500L, 25L),
      ("T", 0L, 500L, 40L), ("T", 1L, 500L, 40L))), Seq("C", "T"), "C")
      .orderBy("peek").collect()
    assert(two.length === 2)
    assert(two(1).getAs[Double]("p_beat_ctl") >
      two(0).getAs[Double]("p_beat_ctl"))
  }

  test("bayesRate: silent-arm spine peek reads the prior (proper, never NULL)") {
    val out = run(cellsOf(Seq(("C", 0L, 100L, 10L), ("C", 1L, 100L, 10L),
      ("T", 1L, 120L, 30L))), Seq("C", "T"), "C").orderBy("peek").collect()
    assert(out.length === 2)
    val p0 = out(0)
    assert(p0.getAs[Long]("e_arm") === 0L)
    assert(p0.getAs[Long]("a_arm") === 1L && p0.getAs[Long]("b_arm") === 1L)
    assert(!p0.isNullAt(p0.fieldIndex("p_beat_ctl")))
    // prior mean 1.0 vastly exceeds the control's ~0.1 rate: the honest
    // prior read says "probably higher" until data arrives
    assert(p0.getAs[Double]("post_mean_arm") === 1d)
  }

  test("bayesRate: q380 fixture adequacy — opposite-signed rate shifts, null C") {
    val inc = graft.queries.CoreQueries.ratePerArmKForSpec(
      spark, "/root/testdata/sf0.01")
    val out = run(inc, Seq("A", "B", "C", "D"), "A")
      .filter(col("peek") === 5L).collect()
    val byArm = out.map(r => r.getAs[String]("arm") -> r).toMap
    assert(byArm.keySet === Set("B", "C", "D"))
    assert(byArm("B").getAs[Double]("p_beat_ctl") < 0.05,
      s"B's 170 threshold must read lower: ${byArm("B")}")
    assert(byArm("D").getAs[Double]("p_beat_ctl") > 0.95,
      s"D's 130 threshold must read higher: ${byArm("D")}")
    val pc = byArm("C").getAs[Double]("p_beat_ctl")
    assert(pc > 0.01 && pc < 0.99, s"C should be null-ish: ${byArm("C")}")
  }

  test("bayesRate: fold == rebuild over additive increments") {
    val q380 = graft.queries.CoreQueries.q380BayesRate(
      spark, "/root/testdata/sf0.001").collect()
    val q381 = graft.queries.CoreQueries.q381BayesRateFromStore(
      spark, "/root/testdata/sf0.001").collect()
    assert(q380.length === q381.length && q380.length > 0)
    q380.zip(q381).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }
}
