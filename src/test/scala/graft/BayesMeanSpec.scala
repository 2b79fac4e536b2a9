package graft

import graft.quality.{BayesMean, GroupSequential}
import org.apache.spark.sql.functions._

/** The Bayesian MEAN-metric read, pinned three ways: hand goldens with
  * exact moment arithmetic ({1,2,3} vs {2,3,4} — every intermediate a
  * closed form), structural identities (loss_ship − loss_keep = −Δ
  * exactly; d = 0 ⇒ p_beat = 1/2 and both losses = se/√(2π)), and
  * differential fuzz vs an independent driver-side computation through
  * [[GroupSequential.phi]]. The cross-engine determinism of the Φ/φ
  * dags is what the q367/q368 DuckDB gate pins.
  */
class BayesMeanSpec extends SparkSpec {
  import spark.implicits._

  /** cells rows as (arm, peek, values): builds the abCells moment shape
    * (sx/sxx/sxy ride along zeroed — the read ignores them).
    */
  private def cellsOf(rows: Seq[(String, Long, Seq[Long])]) = {
    val dec = "decimal(38,0)"
    rows.flatMap { case (a, p, vs) => vs.map(v => (a, p, v)) }
      .toDF("arm", "peek", "y")
      .groupBy("arm", "peek")
      .agg(count(lit(1)).as("n"), sum(lit(0L)).as("s_hit"),
        sum(lit(0L).cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(lit(0L).cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(lit(0L).cast(dec)).as("sxy"))
  }

  /** Empty-arm cells (n = 0 never appears as a cell row — the spine
    * completes it), so "arm absent at a peek" is just its row missing.
    */
  private def run(cells: org.apache.spark.sql.DataFrame,
      arms: Seq[String], control: String) =
    BayesMean.bayesMeanKArmFromCells(cells, arms, control)

  test("bayesMean: {1,2,3} vs {2,3,4} hand golden — exact moments through the closed forms") {
    val out = run(cellsOf(Seq(("C", 0L, Seq(1L, 2L, 3L)),
      ("T", 0L, Seq(2L, 3L, 4L)))), Seq("C", "T"), "C").collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Double]("mean_ctl") === 2d)
    assert(r.getAs[Double]("mean_arm") === 3d)
    // v = n*syy - sy^2 = 3*14 - 36 = 6 (ctl), 3*29 - 81 = 6 (arm);
    // se^2 = 6/(9*2) = 1/3 each
    val se = math.sqrt(6d / (3d * 3d * 2d))
    assert(math.abs(r.getAs[Double]("se_arm") - se) < 1e-15)
    assert(math.abs(r.getAs[Double]("se_ctl") - se) < 1e-15)
    assert(r.getAs[Double]("delta") === 1d)
    val sed = math.sqrt(2d / 3d)
    assert(math.abs(r.getAs[Double]("se_delta") - sed) < 1e-15)
    val d = 1d / sed
    assert(math.abs(r.getAs[Double]("p_beat_ctl") - GroupSequential.phi(d))
      < 1e-12)
    val pdf = math.exp(-0.5 * d * d) / 2.5066282746310002
    assert(math.abs(r.getAs[Double]("exp_loss_arm") -
      (sed * pdf - 1d * GroupSequential.phi(-d))) < 1e-12)
    assert(math.abs(r.getAs[Double]("exp_loss_ctl") -
      (sed * pdf + 1d * GroupSequential.phi(d))) < 1e-12)
    // credible interval: mean +- 1.959964 * se
    assert(math.abs(r.getAs[Double]("cred_lo_arm") - (3d - 1.959964 * se))
      < 1e-15)
    assert(r.getAs[Boolean]("ok"))
  }

  test("bayesMean: identical arms — d = 0, p_beat 1/2, both losses se/sqrt(2pi)") {
    val out = run(cellsOf(Seq(("C", 0L, Seq(1L, 5L, 9L)),
      ("T", 0L, Seq(1L, 5L, 9L)))), Seq("C", "T"), "C").collect()(0)
    assert(out.getAs[Double]("delta") === 0d)
    // the Chebyshev-erfc approximation carries ~1.5e-8 at 0 (documented
    // |eps| <= 1.2e-7 envelope) — the identity is exact only in the limit
    assert(math.abs(out.getAs[Double]("p_beat_ctl") - 0.5d) < 1e-7)
    val sed = out.getAs[Double]("se_delta")
    val want = sed / 2.5066282746310002
    assert(math.abs(out.getAs[Double]("exp_loss_arm") - want) < 1e-15)
    assert(math.abs(out.getAs[Double]("exp_loss_ctl") - want) < 1e-15)
  }

  test("bayesMean: loss difference == -delta (the normal-loss identity), every fuzz row") {
    val rnd = new scala.util.Random(20260817L)
    val rows = (0 until 6).flatMap { p =>
      Seq(("C", p.toLong, Seq.fill(3 + rnd.nextInt(8))(rnd.nextInt(50).toLong)),
        ("T", p.toLong, Seq.fill(3 + rnd.nextInt(8))(rnd.nextInt(50).toLong)))
    }
    val out = run(cellsOf(rows), Seq("C", "T"), "C").collect()
    assert(out.length === 6)
    out.filter(_.getAs[Boolean]("ok")).foreach { r =>
      val lhs = r.getAs[Double]("exp_loss_arm") - r.getAs[Double]("exp_loss_ctl")
      assert(math.abs(lhs - (-r.getAs[Double]("delta"))) < 1e-12,
        s"identity at peek ${r.getAs[Long]("peek")}: $lhs vs ${-r.getAs[Double]("delta")}")
    }
  }

  test("bayesMean: differential fuzz vs an independent driver-side chain (cumulative)") {
    val rnd = new scala.util.Random(20260818L)
    val rows = (0 until 8).flatMap { p =>
      Seq(("C", p.toLong, Seq.fill(2 + rnd.nextInt(6))(rnd.nextInt(100).toLong)),
        ("T", p.toLong, Seq.fill(2 + rnd.nextInt(6))(rnd.nextInt(100).toLong)))
    }
    // driver side: cumulative moments per arm, then the closed forms
    def cum(arm: String): Seq[(Long, Long, Long, Long)] = {
      var n = 0L; var s = 0L; var q = 0L
      rows.filter(_._1 == arm).sortBy(_._2).map { case (_, p, vs) =>
        n += vs.size; s += vs.sum; q += vs.map(v => v * v).sum
        (p, n, s, q)
      }
    }
    val cT = cum("T"); val cC = cum("C")
    val out = run(cellsOf(rows), Seq("C", "T"), "C").orderBy("peek").collect()
    out.zip(cT.zip(cC)).foreach { case (r, ((p, nt, st, qt), (_, nc, sc, qc))) =>
      assert(r.getAs[Long]("peek") === p)
      val mt = st.toDouble / nt; val mc = sc.toDouble / nc
      val se2t = (nt * qt - st * st).toDouble / (nt.toDouble * nt * (nt - 1d))
      val se2c = (nc * qc - sc * sc).toDouble / (nc.toDouble * nc * (nc - 1d))
      val delta = (BigInt(st) * nc - BigInt(sc) * nt).toDouble / (nt.toDouble * nc)
      val sed = math.sqrt(se2t + se2c)
      assert(math.abs(r.getAs[Double]("mean_arm") - mt) < 1e-12)
      assert(math.abs(r.getAs[Double]("mean_ctl") - mc) < 1e-12)
      assert(math.abs(r.getAs[Double]("delta") - delta) < 1e-12)
      if (sed > 0) {
        val d = delta / sed
        assert(math.abs(r.getAs[Double]("p_beat_ctl") -
          GroupSequential.phi(d)) < 1e-12, s"p_beat at peek $p")
        val pdf = math.exp(-0.5 * d * d) / 2.5066282746310002
        assert(math.abs(r.getAs[Double]("exp_loss_arm") -
          (sed * pdf - delta * GroupSequential.phi(-d))) < 1e-12)
      }
    }
  }

  test("bayesMean: guards — n < 2, zero-variance-both, and the silent-arm spine row") {
    // n = 1 on the arm: mean lives, se/comparison reads NULL
    val o1 = run(cellsOf(Seq(("C", 0L, Seq(1L, 2L, 3L)),
      ("T", 0L, Seq(7L)))), Seq("C", "T"), "C").collect()(0)
    assert(o1.getAs[Double]("mean_arm") === 7d)
    assert(o1.isNullAt(o1.fieldIndex("se_arm")))
    assert(o1.isNullAt(o1.fieldIndex("p_beat_ctl")))
    assert(!o1.getAs[Boolean]("ok"))
    // both arms constant: sed = 0 -> no well-defined P(beat)
    val o2 = run(cellsOf(Seq(("C", 0L, Seq(4L, 4L)),
      ("T", 0L, Seq(9L, 9L)))), Seq("C", "T"), "C").collect()(0)
    assert(o2.getAs[Double]("delta") === 5d)
    assert(o2.getAs[Double]("se_arm") === 0d)
    assert(o2.isNullAt(o2.fieldIndex("p_beat_ctl")))
    assert(!o2.getAs[Boolean]("ok"))
    // one constant arm against a live one: still ok
    val o3 = run(cellsOf(Seq(("C", 0L, Seq(1L, 3L)),
      ("T", 0L, Seq(9L, 9L)))), Seq("C", "T"), "C").collect()(0)
    assert(o3.getAs[Boolean]("ok"))
    assert(o3.getAs[Double]("p_beat_ctl") > 0.99)
    // arm silent at peek 0, arrives at peek 1: the spine keeps the row,
    // NULL reads (no proper flat-prior fallback for an unbounded mean)
    val o4 = run(cellsOf(Seq(("C", 0L, Seq(1L, 2L)), ("C", 1L, Seq(3L)),
      ("T", 1L, Seq(5L, 6L)))), Seq("C", "T"), "C").orderBy("peek").collect()
    assert(o4.length === 2)
    assert(o4(0).getAs[Long]("n_arm") === 0L)
    assert(o4(0).isNullAt(o4(0).fieldIndex("mean_arm")))
    assert(o4(0).isNullAt(o4(0).fieldIndex("p_beat_ctl")))
    assert(o4(1).getAs[Boolean]("ok"))
  }

  test("bayesMean: q367 fixture adequacy — real opposite-signed mean shifts, null C") {
    // AT sf0.01, the SF the driver's oracle gate actually reads (sf0.001
    // has arms with 0-1 users — far too thin to pin anything)
    val pu = graft.queries.CoreQueries.abPerUserMeanKForSpec(
      spark, "/root/testdata/sf0.01")
    val cells = graft.quality.AbDashboard.abCells(
      pu, "arm", "peek", "y", "x", "hit")
    val out = run(cells, Seq("A", "B", "C", "D"), "A")
      .filter(col("peek") === 5L).orderBy("arm").collect()
    assert(out.length === 3)
    val byArm = out.map(r => r.getAs[String]("arm") -> r).toMap
    assert(byArm.keySet === Set("B", "C", "D"))
    out.foreach(r => assert(r.getAs[Boolean]("ok")))
    // B caps at 150 -> genuinely below control; D caps at 500 -> above
    assert(byArm("B").getAs[Double]("p_beat_ctl") < 0.05,
      s"B should underperform: ${byArm("B")}")
    assert(byArm("D").getAs[Double]("p_beat_ctl") > 0.95,
      s"D should win: ${byArm("D")}")
    assert(byArm("C").getAs[Double]("p_beat_ctl") > 0.05 &&
      byArm("C").getAs[Double]("p_beat_ctl") < 0.95,
      s"C should be null: ${byArm("C")}")
  }

  test("bayesMean: fold == rebuild over mergeAbCells") {
    val q367 = graft.queries.CoreQueries.q367BayesMean(
      spark, "/root/testdata/sf0.001").collect()
    val q368 = graft.queries.CoreQueries.q368BayesMeanFromStore(
      spark, "/root/testdata/sf0.001").collect()
    assert(q367.length === q368.length && q367.length > 0)
    q367.zip(q368).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }
}
