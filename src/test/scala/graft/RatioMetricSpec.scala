package graft

import graft.quality.{GroupSequential, RatioMetric}
import org.apache.spark.sql.functions._

/** The delta-method ratio read, pinned four ways: exact-moment hand
  * goldens, the X ≡ 1 collapse identity (the delta method DEGRADES to
  * the welch mean variance exactly when the denominator is constant 1),
  * the zero-variance clamp guard, and differential fuzz vs an
  * independent driver-side chain. Cross-engine determinism is what the
  * q369/q370 DuckDB gate pins.
  */
class RatioMetricSpec extends SparkSpec {
  import spark.implicits._

  private def cellsOf(rows: Seq[(String, Long, Seq[(Long, Long)])]) = {
    val dec = "decimal(38,0)"
    rows.flatMap { case (a, p, vs) => vs.map { case (y, x) => (a, p, y, x) } }
      .toDF("arm", "peek", "y", "x")
      .groupBy("arm", "peek")
      .agg(count(lit(1)).as("n"), sum(lit(0L)).as("s_hit"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
  }

  private def run(cells: org.apache.spark.sql.DataFrame,
      arms: Seq[String], control: String) =
    RatioMetric.ratioDeltaKArmFromCells(cells, arms, control)

  test("ratioDelta: hand golden — constant denominator, exact variance 1/12 each side") {
    // C: (1,2),(2,2),(3,2) -> r=1, vyy=6, vxx=vxy=0, var=6/(2*36)=1/12
    // T: (2,2),(4,2),(3,2) -> r=1.5, vyy=6, var=1/12; delta=1/2 exact
    val out = run(cellsOf(Seq(
      ("C", 0L, Seq((1L, 2L), (2L, 2L), (3L, 2L))),
      ("T", 0L, Seq((2L, 2L), (4L, 2L), (3L, 2L))))), Seq("C", "T"), "C")
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Double]("ratio_ctl") === 1d)
    assert(r.getAs[Double]("ratio_arm") === 1.5d)
    assert(math.abs(r.getAs[Double]("se_ctl") - math.sqrt(1d / 12d)) < 1e-15)
    assert(math.abs(r.getAs[Double]("se_arm") - math.sqrt(1d / 12d)) < 1e-15)
    assert(r.getAs[Double]("delta") === 0.5d)
    val sed = math.sqrt(1d / 12d + 1d / 12d)
    assert(math.abs(r.getAs[Double]("se_delta") - sed) < 1e-15)
    val z = 0.5d / sed
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-15)
    assert(math.abs(r.getAs[Double]("p_value") -
      2d * (1d - GroupSequential.phi(z))) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_lo") - (0.5d - 1.959964 * sed)) < 1e-15)
    assert(r.getAs[Boolean]("ok"))
  }

  test("ratioDelta: perfectly proportional users — variance clamps to exact 0, ok false") {
    // y = x/2 exactly on every unit, both arms: the quadratic form is a
    // true zero that can round to -1e-16 — the clamp keeps sqrt alive
    val out = run(cellsOf(Seq(
      ("C", 0L, Seq((1L, 2L), (2L, 4L), (3L, 6L))),
      ("T", 0L, Seq((2L, 4L), (5L, 10L))))), Seq("C", "T"), "C").collect()(0)
    assert(out.getAs[Double]("se_ctl") === 0d)
    assert(out.getAs[Double]("se_arm") === 0d)
    assert(out.getAs[Double]("delta") === 0d)
    assert(out.isNullAt(out.fieldIndex("p_value")))
    assert(!out.getAs[Boolean]("ok"))
  }

  test("ratioDelta: X == 1 collapses to the mean read — welch variance exactly") {
    val ys = Seq(3L, 7L, 4L, 9L, 1L)
    val out = run(cellsOf(Seq(
      ("C", 0L, ys.map(y => (y, 1L))),
      ("T", 0L, Seq((5L, 1L), (8L, 1L), (2L, 1L))))), Seq("C", "T"), "C")
      .collect()(0)
    val n = ys.size.toDouble
    val mean = ys.sum.toDouble / n
    val vyy = (n * ys.map(y => y * y).sum - ys.sum.toDouble * ys.sum).toDouble
    // ratio == mean; var == vyy/((n-1)*n^2) == the welch mean variance
    assert(out.getAs[Double]("ratio_ctl") === mean)
    assert(math.abs(out.getAs[Double]("se_ctl") -
      math.sqrt(vyy / ((n - 1d) * (n * n)))) < 1e-15)
  }

  test("ratioDelta: differential fuzz vs an independent driver-side chain (cumulative)") {
    val rnd = new scala.util.Random(20260819L)
    val rows = (0 until 6).flatMap { p =>
      Seq(("C", p.toLong, Seq.fill(3 + rnd.nextInt(6))(
        (rnd.nextInt(20).toLong, 1L + rnd.nextInt(30).toLong))),
        ("T", p.toLong, Seq.fill(3 + rnd.nextInt(6))(
          (rnd.nextInt(20).toLong, 1L + rnd.nextInt(30).toLong))))
    }
    def cum(arm: String) = {
      var n = 0L; var sy = 0L; var sx = 0L
      var syy = 0L; var sxx = 0L; var sxy = 0L
      rows.filter(_._1 == arm).sortBy(_._2).map { case (_, p, vs) =>
        n += vs.size; sy += vs.map(_._1).sum; sx += vs.map(_._2).sum
        syy += vs.map(v => v._1 * v._1).sum
        sxx += vs.map(v => v._2 * v._2).sum
        sxy += vs.map(v => v._2 * v._1).sum
        (p, n, sy, sx, syy, sxx, sxy)
      }
    }
    def varOf(n: Long, sy: Long, sx: Long, syy: Long, sxx: Long,
        sxy: Long): Double = {
      val r = sy.toDouble / sx
      val vyy = (BigInt(n) * syy - BigInt(sy) * sy).toDouble
      val vxx = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
      val vxy = (BigInt(n) * sxy - BigInt(sy) * sx).toDouble
      math.max((vyy - 2d * r * vxy + r * r * vxx) /
        ((n - 1d) * (BigInt(sx) * sx).toDouble), 0d)
    }
    val cT = cum("T"); val cC = cum("C")
    val out = run(cellsOf(rows), Seq("C", "T"), "C").orderBy("peek").collect()
    out.zip(cT.zip(cC)).foreach {
      case (r, ((p, nt, syt, sxt, syyt, sxxt, sxyt),
          (_, nc, syc, sxc, syyc, sxxc, sxyc))) =>
        assert(r.getAs[Long]("peek") === p)
        assert(math.abs(r.getAs[Double]("ratio_arm") - syt.toDouble / sxt)
          < 1e-12)
        val vt = varOf(nt, syt, sxt, syyt, sxxt, sxyt)
        val vc = varOf(nc, syc, sxc, syyc, sxxc, sxyc)
        val delta = (BigInt(syt) * sxc - BigInt(syc) * sxt).toDouble /
          (sxt.toDouble * sxc)
        val sed = math.sqrt(vt + vc)
        assert(math.abs(r.getAs[Double]("delta") - delta) < 1e-12)
        assert(math.abs(r.getAs[Double]("se_delta") - sed) < 1e-12,
          s"sed at peek $p")
        assert(math.abs(r.getAs[Double]("p_value") -
          2d * (1d - GroupSequential.phi(math.abs(delta / sed)))) < 1e-10)
    }
  }

  test("ratioDelta: guards — zero denominator and the silent-arm spine row") {
    // arm T has sx = 0 at peek 0: no ratio, ok false, row visible
    val out = run(cellsOf(Seq(
      ("C", 0L, Seq((1L, 2L), (2L, 3L))),
      ("T", 0L, Seq((3L, 0L), (4L, 0L))),
      ("C", 1L, Seq((2L, 2L))),
      ("T", 1L, Seq((5L, 4L), (1L, 3L))))), Seq("C", "T"), "C")
      .orderBy("peek").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(out(0).fieldIndex("ratio_arm")))
    assert(out(0).isNullAt(out(0).fieldIndex("p_value")))
    assert(!out(0).getAs[Boolean]("ok"))
    assert(out(1).getAs[Boolean]("ok")) // cumulative sx > 0 by peek 1
  }

  test("ratioDelta: q369 fixture adequacy — real opposite-signed CTR shifts, null C") {
    // AT sf0.01, the SF the driver's oracle gate actually reads
    val pu = graft.queries.CoreQueries.abPerUserRatioKForSpec(
      spark, "/root/testdata/sf0.01")
    val cells = graft.quality.AbDashboard.abCells(
      pu, "arm", "peek", "y", "x", "hit")
    val out = run(cells, Seq("A", "B", "C", "D"), "A")
      .filter(col("peek") === 5L).collect()
    val byArm = out.map(r => r.getAs[String]("arm") -> r).toMap
    assert(byArm.keySet === Set("B", "C", "D"))
    out.foreach(r => assert(r.getAs[Boolean]("ok")))
    assert(byArm("B").getAs[Double]("delta") < 0 &&
      byArm("B").getAs[Double]("p_value") < 0.01,
      s"B should lose clicks: ${byArm("B")}")
    assert(byArm("D").getAs[Double]("delta") > 0 &&
      byArm("D").getAs[Double]("p_value") < 0.01,
      s"D should gain: ${byArm("D")}")
    assert(byArm("C").getAs[Double]("p_value") > 0.05,
      s"C should be null: ${byArm("C")}")
  }

  // --- ratio CUPED ------------------------------------------------------

  private def rcCells(rows: Seq[(String, Long, Long, Long, Long)]) = {
    import graft.quality.RatioMetric
    RatioMetric.ratioCupedCells(
      rows.toDF("grp", "y", "x", "p", "q"), Nil, "grp", "y", "x", "p", "q")
  }

  /** independent driver-side ratio-CUPED over raw units. */
  private def rcRef(rows: Seq[(String, Long, Long, Long, Long)])
      : (Double, Double, Double, Double, Double) = {
    val grps = rows.map(_._1).distinct.sorted
    def pieces(gr: String): (Double, Double, Double, Double, Double) = {
      val u = rows.filter(_._1 == gr)
      val n = u.size.toDouble
      val sy = u.map(_._2).sum.toDouble; val sx = u.map(_._3).sum.toDouble
      val sp = u.map(_._4).sum.toDouble; val sq = u.map(_._5).sum.toDouble
      val r = sy / sx; val rp = sp / sq
      def vab(f: ((String, Long, Long, Long, Long)) => Double,
          g2: ((String, Long, Long, Long, Long)) => Double,
          sa: Double, sb: Double): Double =
        n * u.map(z => f(z) * g2(z)).sum - sa * sb
      val vyy = vab(_._2.toDouble, _._2.toDouble, sy, sy)
      val vxx = vab(_._3.toDouble, _._3.toDouble, sx, sx)
      val vxy = vab(_._2.toDouble, _._3.toDouble, sy, sx)
      val vpp = vab(_._4.toDouble, _._4.toDouble, sp, sp)
      val vqq = vab(_._5.toDouble, _._5.toDouble, sq, sq)
      val vqp = vab(_._4.toDouble, _._5.toDouble, sp, sq)
      val vyp = vab(_._2.toDouble, _._4.toDouble, sy, sp)
      val vyq = vab(_._2.toDouble, _._5.toDouble, sy, sq)
      val vxp = vab(_._3.toDouble, _._4.toDouble, sx, sp)
      val vxq = vab(_._3.toDouble, _._5.toDouble, sx, sq)
      val v = math.max((vyy - 2 * r * vxy + r * r * vxx) /
        ((n - 1) * sx * sx), 0d)
      val vp = math.max((vpp - 2 * rp * vqp + rp * rp * vqq) /
        ((n - 1) * sq * sq), 0d)
      val cv = (vyp - rp * vyq - r * vxp + r * rp * vxq) /
        ((n - 1) * sx * sq)
      (r, rp, v, vp, cv)
    }
    val (r1, rp1, v1, vp1, cv1) = pieces(grps(0))
    val (r2, rp2, v2, vp2, cv2) = pieces(grps(1))
    val theta = (cv1 + cv2) / (vp1 + vp2)
    val draw = r1 - r2; val dpre = rp1 - rp2
    val varc = math.max((v1 + v2) - (cv1 + cv2) * theta, 0d)
    (theta, draw, draw - theta * dpre, math.sqrt(v1 + v2), math.sqrt(varc))
  }

  test("ratioCuped: differential fuzz vs the driver reference; never wider than raw") {
    import graft.quality.RatioMetric
    val rnd = new scala.util.Random(20260825L)
    for (trial <- 0 until 5) {
      // pre-period correlated with current by construction (shared base)
      val rows = (0 until 30 + rnd.nextInt(30)).map { i =>
        val base = 1 + rnd.nextInt(10)
        val g = if (i % 2 == 0) "A" else "B"
        (g, (base + rnd.nextInt(4)).toLong, (2 * base + rnd.nextInt(5)).toLong,
          (base + rnd.nextInt(4)).toLong, (2 * base + rnd.nextInt(5)).toLong)
      }
      val got = RatioMetric.ratioCupedFromCells(rcCells(rows), Nil).collect()(0)
      val (theta, draw, dc, seR, seC) = rcRef(rows)
      assert(math.abs(got.getAs[Double]("theta") - theta) < 1e-10,
        s"trial $trial theta")
      assert(math.abs(got.getAs[Double]("delta_raw") - draw) < 1e-12)
      assert(math.abs(got.getAs[Double]("delta_cuped") - dc) < 1e-10,
        s"trial $trial cuped")
      assert(math.abs(got.getAs[Double]("se_raw") - seR) < 1e-12)
      assert(math.abs(got.getAs[Double]("se_cuped") - seC) < 1e-10)
      // the optimal-theta algebra: adjusted never wider than raw
      assert(got.getAs[Double]("se_cuped") <= got.getAs[Double]("se_raw") + 1e-12)
    }
  }

  test("ratioCuped: identical periods give theta = 1, zero adjusted effect AND variance") {
    import graft.quality.RatioMetric
    val rnd = new scala.util.Random(20260826L)
    val rows = (0 until 40).map { i =>
      val y = 1L + rnd.nextInt(6); val x = 2L + rnd.nextInt(8)
      (if (i % 2 == 0) "A" else "B", y, x, y, x)
    }
    val r = RatioMetric.ratioCupedFromCells(rcCells(rows), Nil).collect()(0)
    assert(math.abs(r.getAs[Double]("theta") - 1d) < 1e-9)
    assert(math.abs(r.getAs[Double]("delta_cuped")) < 1e-12)
    assert(r.getAs[Double]("se_cuped") < 1e-9)
    assert(math.abs(r.getAs[Double]("rho2") - 1d) < 1e-9)
  }

  test("ratioCuped: constant pre-period flags NULL (theta undefined), raw read survives") {
    import graft.quality.RatioMetric
    val rows = Seq(("A", 3L, 5L, 1L, 2L), ("A", 2L, 4L, 1L, 2L),
      ("B", 4L, 5L, 1L, 2L), ("B", 1L, 3L, 1L, 2L))
    val r = RatioMetric.ratioCupedFromCells(rcCells(rows), Nil).collect()(0)
    assert(r.isNullAt(r.fieldIndex("theta")))
    assert(r.isNullAt(r.fieldIndex("delta_cuped")))
    assert(!r.isNullAt(r.fieldIndex("delta_raw")))
    assert(!r.isNullAt(r.fieldIndex("se_raw")))
  }

  test("ratioCuped: q378 fixture adequacy — real variance reduction, opposite-signed effects") {
    val out = graft.queries.CoreQueries.q378RatioCuped(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.length === 2)
    val byCmp = out.map(r => r.getAs[String]("cmp") -> r).toMap
    byCmp.values.foreach { r =>
      assert(r.getAs[Double]("rho2") > 0.05,
        s"pre-period must genuinely predict: $r")
      assert(r.getAs[Double]("se_cuped") < r.getAs[Double]("se_raw"))
    }
    assert(byCmp("AB").getAs[Double]("delta_cuped") > 0,
      s"A beats B (B's numerator is cut): ${byCmp("AB")}")
    assert(byCmp("AD").getAs[Double]("delta_cuped") < 0,
      s"D beats A: ${byCmp("AD")}")
    // fold == rebuild
    val q379 = graft.queries.CoreQueries.q379RatioCupedFromStore(
      spark, "/root/testdata/sf0.01").collect()
    out.zip(q379).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("ratioDelta: fold == rebuild over mergeAbCells") {
    val q369 = graft.queries.CoreQueries.q369RatioDelta(
      spark, "/root/testdata/sf0.001").collect()
    val q370 = graft.queries.CoreQueries.q370RatioDeltaFromStore(
      spark, "/root/testdata/sf0.001").collect()
    assert(q369.length === q370.length && q369.length > 0)
    q369.zip(q370).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }
}
