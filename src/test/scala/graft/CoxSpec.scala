package graft

import graft.operators.Survival
import org.apache.spark.sql.functions._

/** Cox proportional hazards, pinned by ANALYTIC Breslow partial-
  * likelihood maxima (tiny fixtures where U(β) = 0 solves in closed
  * form — verifiable by hand from the PL definition, no shared code
  * with the operator), the score-test == log-rank identity on tie-free
  * data, the PL's structural invariances (covariate shift, binary
  * flip), censoring's risk-set contribution, and the honest
  * non-convergence read on a monotone likelihood.
  */
class CoxSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, Long, Long)], iters: Int = 8) =
    Survival.coxPh(rows.toDF("duration", "event", "z"), Nil,
      "duration", "event", "z", iters).collect()(0)

  test("coxPh: analytic golden, no ties — beta = -ln(2)/2, closed-form se") {
    // subjects (t=1,e,z=1), (t=2,e,z=0), (t=3,e,z=1):
    // U(b)=0  <=>  2u^2 = 1, u = e^b  =>  b = -ln(2)/2
    val r = fit(Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 1L)))
    val b = -math.log(2d) / 2d
    assert(r.getAs[Boolean]("converged"))
    assert(math.abs(r.getAs[Double]("beta") - b) < 1e-9, r.toString)
    // I(b) = 2u/(2u+1)^2 + u/(u+1)^2 at u = 1/sqrt(2)
    val u = 1d / math.sqrt(2d)
    val i = 2 * u / math.pow(2 * u + 1, 2) + u / math.pow(u + 1, 2)
    assert(math.abs(r.getAs[Double]("se_beta") - 1d / math.sqrt(i)) < 1e-7)
    assert(math.abs(r.getAs[Double]("hr") - math.exp(b)) < 1e-9)
    assert(r.getAs[Long]("n") === 3L && r.getAs[Long]("n_events") === 3L)
  }

  test("coxPh: analytic golden with Breslow ties — beta = -ln(2)") {
    // (1,e,1),(1,e,0),(2,e,1): the tied time contributes
    // d=2 -> -2 ln(2u+1); U(b)=0 <=> u = 1/2
    val r = fit(Seq((1L, 1L, 1L), (1L, 1L, 0L), (2L, 1L, 1L)))
    assert(r.getAs[Boolean]("converged"))
    assert(math.abs(r.getAs[Double]("beta") + math.log(2d)) < 1e-9)
  }

  test("coxPh: censored subject stays in earlier risk sets — beta = 0 golden") {
    // (1,e,0),(2,censor,1),(3,e,1),(4,e,0): U(b)=0 <=> u = 1 <=> b = 0;
    // I = 1/2 at u=1 so se = sqrt(2). Dropping the censored subject
    // would move the root to ln(sqrt(2)) — this pins its presence.
    val r = fit(Seq((1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 1L), (4L, 1L, 0L)))
    assert(r.getAs[Boolean]("converged"))
    assert(math.abs(r.getAs[Double]("beta")) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_beta") - math.sqrt(2d)) < 1e-9)
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("n_events") === 3L)
  }

  test("coxPh: score test at beta=0 equals log-rank on tie-free data") {
    // distinct event/censor times, binary z: with every d_t = 1 the
    // hypergeometric (n-d)/(n-1) factor is 1 and Breslow's I0 IS the
    // log-rank variance, so z_score^2 == chi2 exactly (up to the two
    // sides' documented nano landings)
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 24).map { i =>
      (i.toLong, if (rnd.nextInt(4) == 0) 0L else 1L, (i % 2).toLong)
    }
    val df = rows.toDF("duration", "event", "z")
    val cox = Survival.coxPh(df, Nil, "duration", "event", "z").collect()(0)
    val lr = Survival.logRank(
      df.withColumn("grp", col("z").cast("string")), Nil,
      "grp", "duration", "event").collect()(0)
    val zs = cox.getAs[Double]("z_score")
    assert(math.abs(zs * zs - lr.getAs[Double]("chi2")) < 1e-6,
      s"score ${zs * zs} vs logrank ${lr.getAs[Double]("chi2")}")
    // same numerator, opposite orientation: U0 counts the z = 1 events,
    // o_lo the min-label (z = 0) side, so U0 = -(O_lo - E_lo) exactly
    val u0 = BigInt(cox.getAs[String]("u0_9"))
    val oMinusE = lr.getAs[Long]("o_lo") * BigInt(1000000000) -
      BigInt(lr.getAs[String]("e_lo_9"))
    assert((u0 + oMinusE).abs <= 24L, s"U0 $u0 vs O-E $oMinusE")
  }

  test("coxPh: shift invariance and binary flip antisymmetry") {
    val rnd = new scala.util.Random(11L)
    val rows = (1 to 30).map { i =>
      (rnd.nextInt(10) + 1L, if (rnd.nextInt(5) == 0) 0L else 1L,
        rnd.nextInt(2).toLong)
    }
    val base = fit(rows)
    val shifted = fit(rows.map { case (t, e, z) => (t, e, z + 5L) })
    assert(math.abs(base.getAs[Double]("beta") -
      shifted.getAs[Double]("beta")) < 1e-9)
    assert(math.abs(base.getAs[Double]("se_beta") -
      shifted.getAs[Double]("se_beta")) < 1e-9)
    assert(shifted.getAs[Long]("cov_min") === 5L)
    val flipped = fit(rows.map { case (t, e, z) => (t, e, 1L - z) })
    assert(math.abs(base.getAs[Double]("beta") +
      flipped.getAs[Double]("beta")) < 1e-7)
    assert(math.abs(base.getAs[Double]("se_beta") -
      flipped.getAs[Double]("se_beta")) < 1e-7)
  }

  test("coxPh: monotone likelihood reports converged = false, never a silent clamp") {
    // z perfectly orders the two events: the PL increases in beta
    // forever; 8 rounds keep stepping and the read says so
    val r = fit(Seq((1L, 1L, 1L), (2L, 1L, 0L)))
    assert(!r.getAs[Boolean]("converged"))
    // degenerate no-event input: NULL fit, no crash
    val r0 = fit(Seq((1L, 0L, 1L), (2L, 0L, 0L)))
    assert(r0.isNullAt(r0.fieldIndex("beta")))
    assert(!r0.getAs[Boolean]("converged"))
    // no covariate variation: I = 0 -> NULL fit
    val r1 = fit(Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 1L, 2L)))
    assert(r1.isNullAt(r1.fieldIndex("beta")))
    assert(!r1.getAs[Boolean]("converged"))
  }

  test("coxPh: differential fuzz vs an independent driver-side Breslow Newton") {
    // a from-scratch implementation over raw subject lists — no cells,
    // no shifts, no quantization — converged fits must agree to ~1e-6
    def reference(rows: Seq[(Long, Long, Long)]): (Double, Double) = {
      val times = rows.filter(_._2 == 1L).map(_._1).distinct.sorted
      def scoreInfo(b: Double): (Double, Double) = {
        var u = 0d; var i = 0d
        for (t <- times) {
          val risk = rows.filter(_._1 >= t)
          val ev = rows.filter(r => r._1 == t && r._2 == 1L)
          val d = ev.size.toDouble
          val s0 = risk.map(r => math.exp(b * r._3)).sum
          val s1 = risk.map(r => r._3 * math.exp(b * r._3)).sum
          val s2 = risk.map(r => r._3.toDouble * r._3 * math.exp(b * r._3)).sum
          u += ev.map(_._3).sum - d * s1 / s0
          i += d * (s2 / s0 - (s1 / s0) * (s1 / s0))
        }
        (u, i)
      }
      var b = 0d
      for (_ <- 1 to 40) { val (u, i) = scoreInfo(b); b += u / i }
      val (_, iF) = scoreInfo(b)
      (b, 1d / math.sqrt(iF))
    }
    val rnd = new scala.util.Random(29L)
    var checked = 0
    for (trial <- 0 until 6) {
      val rows = (1 to 30 + rnd.nextInt(20)).map { _ =>
        (rnd.nextInt(9) + 1L, if (rnd.nextInt(4) == 0) 0L else 1L,
          rnd.nextInt(3).toLong)
      }
      val got = fit(rows)
      if (got.getAs[Boolean]("converged")) {
        val (b, se) = reference(rows)
        assert(math.abs(got.getAs[Double]("beta") - b) < 1e-6,
          s"trial $trial beta ${got.getAs[Double]("beta")} vs $b")
        assert(math.abs(got.getAs[Double]("se_beta") - se) < 1e-6,
          s"trial $trial se")
        checked += 1
      }
    }
    assert(checked >= 4, s"only $checked converged trials")
  }

  test("coxPh: from-cells fold == rebuild; multi-level covariate runs the z^2 terms") {
    val rnd = new scala.util.Random(13L)
    val rows = (1 to 40).map { i =>
      (rnd.nextInt(8) + 1L, if (rnd.nextInt(4) == 0) 0L else 1L,
        rnd.nextInt(4).toLong)
    }
    val df = rows.toDF("duration", "event", "z")
    val direct = Survival.coxPh(df, Nil, "duration", "event", "z").collect()(0)
    val cells = (0 until 3).map(i =>
      Survival.lifetimeCells(df.filter(abs(hash(col("duration"),
        col("event"), col("z"), lit(0))) % 3 === i), Seq("z"), "duration", "event"))
    // note: hash-split isn't per-subject stable on duplicate rows, so
    // fold over a simple row split instead
    val parts = rows.zipWithIndex.groupBy(_._2 % 3).values.toSeq
      .map(p => Survival.lifetimeCells(
        p.map(_._1).toDF("duration", "event", "z"), Seq("z"), "duration", "event"))
    val folded = parts.reduce(Survival.mergeLifetimeCells(_, _, Seq("z")))
    val fromCells = Survival.coxPhFromCells(folded, Nil, "z").collect()(0)
    assert(direct.toSeq === fromCells.toSeq)
    assert(direct.getAs[Boolean]("converged"))
  }

  // --- two-covariate fits -----------------------------------------------

  private def fit2(rows: Seq[(Long, Long, Long, Long)], iters: Int = 8) =
    Survival.coxPh2(rows.toDF("duration", "event", "za", "zb"), Nil,
      "duration", "event", "za", "zb", iters).collect()(0)

  test("coxPh2: differential fuzz vs an independent driver-side 2D Breslow Newton") {
    // from-scratch 2-covariate reference over raw subject lists — plain
    // doubles, explicit 2x2 solve, no cells/shifts/quantization
    def reference(rows: Seq[(Long, Long, Long, Long)])
        : (Double, Double, Double, Double, Double) = {
      val times = rows.filter(_._2 == 1L).map(_._1).distinct.sorted
      def si(ba: Double, bb: Double) = {
        var ua = 0d; var ub = 0d; var iaa = 0d; var iab = 0d; var ibb = 0d
        for (t <- times) {
          val risk = rows.filter(_._1 >= t)
          val ev = rows.filter(r => r._1 == t && r._2 == 1L)
          val d = ev.size.toDouble
          def k(r: (Long, Long, Long, Long)) = math.exp(ba * r._3 + bb * r._4)
          val s0 = risk.map(k).sum
          val s1a = risk.map(r => r._3 * k(r)).sum
          val s1b = risk.map(r => r._4 * k(r)).sum
          val s2aa = risk.map(r => r._3.toDouble * r._3 * k(r)).sum
          val s2ab = risk.map(r => r._3.toDouble * r._4 * k(r)).sum
          val s2bb = risk.map(r => r._4.toDouble * r._4 * k(r)).sum
          ua += ev.map(_._3).sum - d * s1a / s0
          ub += ev.map(_._4).sum - d * s1b / s0
          iaa += d * (s2aa / s0 - (s1a / s0) * (s1a / s0))
          iab += d * (s2ab / s0 - (s1a / s0) * (s1b / s0))
          ibb += d * (s2bb / s0 - (s1b / s0) * (s1b / s0))
        }
        (ua, ub, iaa, iab, ibb)
      }
      var ba = 0d; var bb = 0d
      for (_ <- 1 to 40) {
        val (ua, ub, iaa, iab, ibb) = si(ba, bb)
        val det = iaa * ibb - iab * iab
        ba += (ibb * ua - iab * ub) / det
        bb += (iaa * ub - iab * ua) / det
      }
      val (_, _, iaa, iab, ibb) = si(ba, bb)
      val det = iaa * ibb - iab * iab
      (ba, bb, math.sqrt(ibb / det), math.sqrt(iaa / det), det)
    }
    val rnd = new scala.util.Random(31L)
    var checked = 0
    for (trial <- 0 until 6) {
      val rows = (1 to 35 + rnd.nextInt(20)).map { _ =>
        (rnd.nextInt(9) + 1L, if (rnd.nextInt(4) == 0) 0L else 1L,
          rnd.nextInt(3).toLong, rnd.nextInt(2).toLong)
      }
      val got = fit2(rows)
      if (got.getAs[Boolean]("converged")) {
        val (ba, bb, sea, seb, _) = reference(rows)
        assert(math.abs(got.getAs[Double]("beta1") - ba) < 1e-6,
          s"trial $trial beta1 ${got.getAs[Double]("beta1")} vs $ba")
        assert(math.abs(got.getAs[Double]("beta2") - bb) < 1e-6,
          s"trial $trial beta2")
        assert(math.abs(got.getAs[Double]("se_beta1") - sea) < 1e-6)
        assert(math.abs(got.getAs[Double]("se_beta2") - seb) < 1e-6)
        // the 2-df score chi2 at beta = 0, same reference machinery
        val (ua, ub, iaa, iab, ibb) = {
          // the beta = 0 pieces explicitly (kernels all 1)
          val times = rows.filter(_._2 == 1L).map(_._1).distinct.sorted
          var uaa = 0d; var ubb = 0d; var jaa = 0d; var jab = 0d; var jbb = 0d
          for (t <- times) {
            val risk = rows.filter(_._1 >= t)
            val ev = rows.filter(q => q._1 == t && q._2 == 1L)
            val d = ev.size.toDouble; val n = risk.size.toDouble
            val s1a = risk.map(_._3).sum.toDouble
            val s1b = risk.map(_._4).sum.toDouble
            val s2aa = risk.map(q => q._3 * q._3).sum.toDouble
            val s2ab = risk.map(q => q._3 * q._4).sum.toDouble
            val s2bb = risk.map(q => q._4 * q._4).sum.toDouble
            uaa += ev.map(_._3).sum - d * s1a / n
            ubb += ev.map(_._4).sum - d * s1b / n
            jaa += d * (s2aa / n - (s1a / n) * (s1a / n))
            jab += d * (s2ab / n - (s1a / n) * (s1b / n))
            jbb += d * (s2bb / n - (s1b / n) * (s1b / n))
          }
          (uaa, ubb, jaa, jab, jbb)
        }
        val det0 = iaa * ibb - iab * iab
        val chi0 = (ua * (ibb * ua - iab * ub) + ub * (iaa * ub - iab * ua)) / det0
        assert(math.abs(got.getAs[Double]("score_chi2") - chi0) < 1e-5,
          s"trial $trial score ${got.getAs[Double]("score_chi2")} vs $chi0")
        checked += 1
      }
    }
    assert(checked >= 4, s"only $checked converged trials")
  }

  test("coxPh2: collinear covariates give det0 = 0 EXACTLY — fit NULLs, never noise") {
    val rnd = new scala.util.Random(37L)
    val rows = (1 to 30).map { _ =>
      val z = rnd.nextInt(3).toLong
      (rnd.nextInt(8) + 1L, if (rnd.nextInt(4) == 0) 0L else 1L, z, z)
    }
    val r = fit2(rows)
    assert(BigInt(r.getAs[String]("det0_9")) === BigInt(0))
    assert(r.isNullAt(r.fieldIndex("beta1")))
    assert(r.isNullAt(r.fieldIndex("score_chi2")))
    assert(!r.getAs[Boolean]("converged"))
  }

  test("coxPh2: covariate-order symmetry and shift invariance") {
    val rnd = new scala.util.Random(41L)
    val rows = (1 to 40).map { _ =>
      (rnd.nextInt(9) + 1L, if (rnd.nextInt(4) == 0) 0L else 1L,
        rnd.nextInt(3).toLong, rnd.nextInt(2).toLong)
    }
    val ab = fit2(rows)
    val ba = Survival.coxPh2(rows.toDF("duration", "event", "za", "zb"),
      Nil, "duration", "event", "zb", "za").collect()(0)
    assert(ab.getAs[Double]("beta1") === ba.getAs[Double]("beta2"))
    assert(ab.getAs[Double]("se_beta1") === ba.getAs[Double]("se_beta2"))
    assert(ab.getAs[String]("u0a_9") === ba.getAs[String]("u0b_9"))
    assert(ab.getAs[String]("det0_9") === ba.getAs[String]("det0_9"))
    assert(ab.getAs[Double]("score_chi2") === ba.getAs[Double]("score_chi2"))
    // PL shift invariance: za + 7, zb + 3 changes nothing but the mins
    val sh = Survival.coxPh2(
      rows.map(r => (r._1, r._2, r._3 + 7L, r._4 + 3L))
        .toDF("duration", "event", "za", "zb"),
      Nil, "duration", "event", "za", "zb").collect()(0)
    assert(sh.getAs[Long]("cov1_min") === ab.getAs[Long]("cov1_min") + 7L)
    assert(sh.getAs[Double]("beta1") === ab.getAs[Double]("beta1"))
    assert(sh.getAs[Double]("beta2") === ab.getAs[Double]("beta2"))
    assert(sh.getAs[String]("u0a_9") === ab.getAs[String]("u0a_9"))
  }

  test("coxPh2: from-cells fold == rebuild on the (za, zb)-keyed store") {
    val rnd = new scala.util.Random(43L)
    val rows = (1 to 45).map { _ =>
      (rnd.nextInt(8) + 1L, if (rnd.nextInt(4) == 0) 0L else 1L,
        rnd.nextInt(3).toLong, rnd.nextInt(2).toLong)
    }
    val df = rows.toDF("duration", "event", "za", "zb")
    val direct = Survival.coxPh2(df, Nil, "duration", "event", "za", "zb")
      .collect()(0)
    val parts = rows.zipWithIndex.groupBy(_._2 % 3).values.toSeq
      .map(p => Survival.lifetimeCells(
        p.map(_._1).toDF("duration", "event", "za", "zb"),
        Seq("za", "zb"), "duration", "event"))
    val folded = parts.reduce(Survival.mergeLifetimeCells(_, _, Seq("za", "zb")))
    val fromCells = Survival.coxPh2FromCells(folded, Nil, "za", "zb")
      .collect()(0)
    assert(direct.toSeq === fromCells.toSeq)
    assert(direct.getAs[Boolean]("converged"))
  }

  test("coxPh2: q371 fixture adequacy — identifiable, converged, real click gradient") {
    val subj = graft.queries.CoreQueries.coxSubjects2ForSpec(
      spark, "/root/testdata/sf0.01")
    val r = Survival.coxPh2(subj, Nil, "duration", "event", "z", "z2")
      .collect()(0)
    assert(BigInt(r.getAs[String]("det0_9")) > 0, "covariates must not be collinear")
    assert(r.getAs[Boolean]("converged"), r.toString)
    // the synthetic stream's real gradient: click volume associates with
    // LATER purchase (beta1 ≈ −0.17 at sf0.01) — the pin is a genuine
    // nonzero adjusted effect with a live 2-df score, not its sign
    assert(r.getAs[Double]("beta1") < 0d, r.toString)
    assert(r.getAs[Double]("score_chi2") > 1d, r.toString)
    assert(r.getAs[Double]("se_beta1") > 0d && r.getAs[Double]("se_beta2") > 0d)
  }
}
