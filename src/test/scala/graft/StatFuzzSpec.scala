package graft

import graft.quality.{Association, Profiler}
import graft.operators.{Quantiles, RankEval, TimeSeries}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Differential fuzz harness for the statistics layer — the class of
  * check the round-11 Kruskal–Wallis ×4 bug proved necessary: the
  * DuckDB oracle replays the operator's OWN dag, so a formula-level
  * error survives the gate and dies only to an INDEPENDENT formulation.
  * Every test here generates seeded random datasets (small n, heavy
  * ties — the regime where rank/tie corrections go wrong) and compares
  * the graft operator against a from-the-textbook naive Scala
  * implementation written directly from the published formula, sharing
  * no code and no dag with the operator. Tolerance 1e-6 absorbs the
  * operators' documented nano(1e9) term rounding.
  */
class StatFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Trials = 6
  private val Tol = 1e-6

  private def rng(stat: String, trial: Int) = new Random(stat.hashCode * 1000 + trial)

  /** 1-based midranks (average rank over ties). */
  private def midranks(vs: Seq[Long]): Map[Long, Double] = {
    val byValue = vs.sorted.zipWithIndex.groupBy(_._1)
    byValue.map { case (v, ps) => v -> ps.map(_._2 + 1).sum.toDouble / ps.size }
  }

  private def tieSum3(vs: Seq[Long]): Double =
    vs.groupBy(identity).values.map { t =>
      val s = t.size.toDouble; s * s * s - s
    }.sum

  private def approx(a: Double, b: Double, label: String): Unit =
    assert(math.abs(a - b) < Tol, s"$label: graft=$a naive=$b")

  private def approxOpt(a: Option[Double], b: Option[Double], label: String): Unit =
    (a, b) match {
      case (Some(x), Some(y)) => approx(x, y, label)
      case (None, None)       => ()
      case _ => fail(s"$label: null mismatch graft=$a naive=$b")
    }

  private def optDouble(r: org.apache.spark.sql.Row, c: String): Option[Double] = {
    val i = r.fieldIndex(c)
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  }

  // --- Kruskal–Wallis ---------------------------------------------------------------

  test("fuzz: Kruskal-Wallis H and tie-corrected H vs the rank-ANOVA formula") {
    for (t <- 1 to Trials) {
      val r = rng("kw", t)
      val k = 2 + r.nextInt(4)
      val span = 2 + r.nextInt(12) // tiny spans force heavy ties
      val data = (0 until 20 + r.nextInt(60)).map { _ =>
        ("g" + r.nextInt(k), r.nextInt(span).toLong)
      }
      val groups = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val all = data.map(_._2)
      val n = all.size
      val ranks = midranks(all)
      val hNaive = 12.0 / (n * (n + 1.0)) * groups.values.map { g =>
        val rg = g.map(ranks).sum
        rg * rg / g.size
      }.sum - 3.0 * (n + 1)
      val denom = 1.0 - tieSum3(all) / (n.toDouble * n * n - n)
      val hTieNaive = if (n > 1 && denom > 0) Some(hNaive / denom) else None
      val row = Association.kruskalWallis(data.toDF("g", "v"), Nil, "g", "v")
        .collect()(0)
      approx(row.getAs[Double]("h"), hNaive, s"kw h trial $t")
      approxOpt(optDouble(row, "h_tie"), hTieNaive, s"kw h_tie trial $t")
    }
  }

  // --- Mann–Whitney -----------------------------------------------------------------

  test("fuzz: Mann-Whitney 2U and z vs the rank-sum formula") {
    for (t <- 1 to Trials) {
      val r = rng("mw", t)
      val span = 2 + r.nextInt(10)
      val lo = (0 until 8 + r.nextInt(30)).map(_ => r.nextInt(span).toLong)
      val hi = (0 until 8 + r.nextInt(30)).map(_ => (r.nextInt(span) + r.nextInt(3)).toLong)
      val all = lo ++ hi
      val n = all.size
      val ranks = midranks(all)
      val r1 = lo.map(ranks).sum
      val twoU1 = 2.0 * r1 - lo.size.toDouble * (lo.size + 1)
      val varU = lo.size.toDouble * hi.size / 12.0 *
        ((n + 1) - tieSum3(all) / (n.toDouble * (n - 1)))
      val zNaive =
        if (varU > 0) Some((twoU1 / 2.0 - lo.size.toDouble * hi.size / 2.0) / math.sqrt(varU))
        else None
      val df = (lo.map(("A", _)) ++ hi.map(("B", _))).toDF("g", "v")
      val row = Association.mannWhitney(df, Nil, "g", "v").collect()(0)
      assert(row.getAs[String]("u2_lo").toDouble === twoU1, s"mw 2U trial $t")
      approxOpt(optDouble(row, "z"), zNaive, s"mw z trial $t")
      // Cliff's delta vs the direct dominance count (ties contribute 0)
      val dom = (for (a <- lo; b <- hi) yield java.lang.Long.compare(a, b).sign).sum
      approx(row.getAs[Double]("cliffs_delta"),
        dom.toDouble / (lo.size.toDouble * hi.size), s"mw delta trial $t")
    }
  }

  // --- Kendall tau-b ----------------------------------------------------------------

  test("fuzz: Kendall tau-b vs the O(n^2) concordance loop") {
    for (t <- 1 to Trials) {
      val r = rng("kendall", t)
      val span = 2 + r.nextInt(8)
      val pts = (0 until 15 + r.nextInt(50)).map { _ =>
        val x = r.nextInt(span).toLong
        (x, (x + r.nextInt(span) - span / 2).toLong)
      }
      var c, d, tx, ty = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.size) {
        val ((xi, yi), (xj, yj)) = (pts(i), pts(j))
        val sx = java.lang.Long.compare(xi, xj)
        val sy = java.lang.Long.compare(yi, yj)
        if (sx == 0 && sy != 0) tx += 1
        else if (sx != 0 && sy == 0) ty += 1
        else if (sx * sy > 0) c += 1
        else if (sx * sy < 0) d += 1
      }
      val tauNaive =
        if (c + d + tx > 0 && c + d + ty > 0)
          Some((c - d).toDouble / (math.sqrt((c + d + tx).toDouble) * math.sqrt((c + d + ty).toDouble)))
        else None
      val row = Association.kendall(pts.toDF("x", "y"), Nil, "x", "y").collect()(0)
      assert(row.getDecimal(row.fieldIndex("c_pairs")).longValueExact() === c, s"kendall C trial $t")
      assert(row.getDecimal(row.fieldIndex("d_pairs")).longValueExact() === d, s"kendall D trial $t")
      approxOpt(optDouble(row, "tau_b"), tauNaive, s"kendall tau trial $t")
    }
  }

  // --- Spearman rho -----------------------------------------------------------------

  test("fuzz: Spearman rho vs Pearson over midranks") {
    for (t <- 1 to Trials) {
      val r = rng("spearman", t)
      val span = 2 + r.nextInt(9)
      val pts = (0 until 12 + r.nextInt(50)).map { _ =>
        val x = r.nextInt(span).toLong
        (x, (x * (if (r.nextBoolean()) 1 else -1) + r.nextInt(span)).toLong)
      }
      val rx = midranks(pts.map(_._1)); val ry = midranks(pts.map(_._2))
      val xs = pts.map(p => rx(p._1)); val ys = pts.map(p => ry(p._2))
      val n = pts.size.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = xs.map(a => (a - mx) * (a - mx)).sum
      val vy = ys.map(b => (b - my) * (b - my)).sum
      val rhoNaive =
        if (vx > 0 && vy > 0) Some(cov / math.sqrt(vx * vy)) else None
      val row = Profiler.spearman(pts.toDF("x", "y"), Nil, "x", "y").collect()(0)
      approxOpt(optDouble(row, "rho"), rhoNaive, s"spearman trial $t")
    }
  }

  // --- Krippendorff alpha -----------------------------------------------------------

  test("fuzz: Krippendorff nominal alpha vs the disagreement formula") {
    for (t <- 1 to Trials) {
      val r = rng("kripp", t)
      val labels = 2 + r.nextInt(3)
      val ratings = (0 until 12 + r.nextInt(25)).flatMap { u =>
        (0 until 1 + r.nextInt(4)).map(_ => (u.toLong, "c" + r.nextInt(labels)))
      }
      val byUnit = ratings.groupBy(_._1).filter(_._2.size >= 2)
      val bigN = byUnit.values.map(_.size).sum
      val dObsNaive = byUnit.values.map { rs =>
        val m = rs.size.toDouble
        val sq = rs.groupBy(_._2).values.map(g => g.size.toDouble * g.size).sum
        (m * m - sq) / (m - 1)
      }.sum / bigN
      val sqv = byUnit.values.flatten.groupBy(_._2).values
        .map(g => g.size.toDouble * g.size).sum
      val deNum = bigN.toDouble * bigN - sqv
      val alphaNaive =
        if (deNum > 0 && bigN > 1)
          Some(1.0 - dObsNaive / (deNum / (bigN.toDouble * (bigN - 1))))
        else None
      val row = RankEval.krippendorffAlpha(ratings.toDF("u", "label"), "u", "label")
        .collect()(0)
      assert(row.getAs[Long]("n_pairable") === bigN.toLong, s"kripp N trial $t")
      approxOpt(optDouble(row, "alpha"), alphaNaive, s"kripp alpha trial $t")
    }
  }

  // --- Cochran–Mantel–Haenszel ------------------------------------------------------

  test("fuzz: CMH statistic and MH odds ratio vs the per-stratum 2x2 formula") {
    for (t <- 1 to Trials) {
      val r = rng("cmh", t)
      val strata = (0 until 2 + r.nextInt(5)).map { s =>
        // counts (a, b, c, d); occasionally degenerate margins
        ("s" + s, r.nextInt(12).toLong, r.nextInt(12).toLong,
          r.nextInt(12).toLong, r.nextInt(12).toLong)
      }
      var sumA, sumE, sumV, orN, orD = 0.0
      strata.foreach { case (_, a, b, c, d) =>
        val n = (a + b + c + d).toDouble
        val usable = a + b + c + d >= 2 && a + b > 0 && c + d > 0 && a + c > 0 && b + d > 0
        if (usable) {
          sumA += a
          sumE += (a + b) * (a + c) / n
          sumV += (a + b).toDouble * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
          orN += a.toDouble * d / n
          orD += b.toDouble * c / n
        }
      }
      val cmhNaive = if (sumV > 0) Some((sumA - sumE) * (sumA - sumE) / sumV) else None
      val orNaive = if (orD > 0) Some(orN / orD) else None
      val rows = strata.flatMap { case (s, a, b, c, d) =>
        Seq.fill(a.toInt)((s, "A", 1L)) ++ Seq.fill(b.toInt)((s, "A", 0L)) ++
          Seq.fill(c.toInt)((s, "B", 1L)) ++ Seq.fill(d.toInt)((s, "B", 0L))
      }
      val row = Association.cmh(rows.toDF("s", "g", "hit"), "s", "g", "hit").collect()(0)
      approxOpt(optDouble(row, "cmh"), cmhNaive, s"cmh trial $t")
      approxOpt(optDouble(row, "or_mh"), orNaive, s"cmh OR trial $t")
    }
  }

  // --- Wasserstein-1 ----------------------------------------------------------------

  test("fuzz: Wasserstein-1 vs the CDF-gap sum, including negative supports") {
    for (t <- 1 to Trials) {
      val r = rng("w1", t)
      val base = (0 until 20 + r.nextInt(60)).map(_ => (r.nextInt(20) - 6).toLong)
      val cur = (0 until 20 + r.nextInt(60)).map(_ => (r.nextInt(20) - 2).toLong)
      val support = (base ++ cur).distinct.sorted
      val fa = support.map(v => base.count(_ <= v).toDouble / base.size)
      val fb = support.map(v => cur.count(_ <= v).toDouble / cur.size)
      val w1Naive = support.indices.dropRight(1).map { i =>
        math.abs(fa(i) - fb(i)) * (support(i + 1) - support(i))
      }.sum
      val row = Profiler.wassersteinDrift(
        base.map(Tuple1(_)).toDF("v"), cur.map(Tuple1(_)).toDF("v"), "v").collect()(0)
      approx(row.getAs[Double]("w1"), w1Naive, s"w1 trial $t")
    }
  }

  // --- Mann–Kendall -----------------------------------------------------------------

  test("fuzz: Mann-Kendall S, tie-corrected variance and z vs the sign-pair loop") {
    for (t <- 1 to Trials) {
      val r = rng("mk", t)
      val drift = r.nextInt(5) - 2
      val ys = (0 until 10 + r.nextInt(40)).map(i => (r.nextInt(6) + i * drift / 4).toLong)
      var s = 0L
      for (i <- ys.indices; j <- (i + 1) until ys.size)
        s += java.lang.Long.compare(ys(j), ys(i)).sign
      val n = ys.size.toDouble
      val var18 = n * (n - 1) * (2 * n + 5) -
        ys.groupBy(identity).values.map { g =>
          val tt = g.size.toDouble; tt * (tt - 1) * (2 * tt + 5)
        }.sum
      val zNaive =
        if (var18 <= 0) None
        else if (s > 0) Some((s - 1) / math.sqrt(var18 / 18))
        else if (s < 0) Some((s + 1) / math.sqrt(var18 / 18))
        else Some(0.0)
      val df = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }.toDF("ts", "y")
      val row = TimeSeries.mannKendall(df, Nil, "ts", "y").collect()(0)
      assert(row.getAs[String]("s").toLong === s, s"mk S trial $t")
      assert(row.getAs[String]("var18").toDouble === var18, s"mk var trial $t")
      approxOpt(optDouble(row, "z"), zNaive, s"mk z trial $t")
    }
  }

  // --- Theil–Sen (both arms) --------------------------------------------------------

  test("fuzz: Theil-Sen slope and intercept vs the sorted pairwise-median loop, both arms") {
    for (t <- 1 to Trials) {
      val r = rng("ts", t)
      val n = 8 + r.nextInt(25)
      val pts = (0 until n).map(i => (i.toLong, (i * (r.nextInt(7) - 3) / 2 + r.nextInt(9)).toLong))
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.size
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1)).sorted
      val m = slopes.size
      val slopeNaive = slopes((m + 1) / 2 - 1)
      val residuals = pts.map { case (tt, y) => (y - slopeNaive * tt, tt) }.sorted
      val interceptNaive = residuals((n + 1) / 2 - 1)._1
      val df = pts.toDF("ts", "y")
      for ((arm, out) <- Seq(
          "windowed" -> TimeSeries.theilSen(df, Nil, "ts", "y"),
          "bucketed" -> TimeSeries.theilSenBucketed(df, Nil, "ts", "y"))) {
        val row = out.collect()(0)
        approx(row.getAs[Double]("slope"), slopeNaive, s"ts slope $arm trial $t")
        approx(row.getAs[Double]("intercept"), interceptNaive, s"ts intercept $arm trial $t")
      }
    }
  }

  // --- Brown–Forsythe ---------------------------------------------------------------

  test("fuzz: Brown-Forsythe W vs the median-centered ANOVA formula") {
    for (t <- 1 to Trials) {
      val r = rng("bf", t)
      val k = 2 + r.nextInt(4)
      val data = (0 until 20 + r.nextInt(60)).map { _ =>
        val gi = r.nextInt(k)
        ("g" + gi, (r.nextInt(8 + gi * 6) - gi).toLong) // scales differ by group
      }
      val groups = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      def lowerMedian(vs: Seq[Long]): Long = vs.sorted.apply((vs.size + 1) / 2 - 1)
      val zs = groups.map { case (gname, vs) =>
        val med = lowerMedian(vs)
        gname -> vs.map(v => math.abs(v - med).toDouble)
      }
      val n = data.size
      val zAll = zs.values.flatten
      val zBar = zAll.sum / n
      val ssb = zs.values.map { z =>
        val m = z.sum / z.size
        z.size * (m - zBar) * (m - zBar)
      }.sum
      val ssw = zs.values.map { z =>
        val m = z.sum / z.size
        z.map(v => (v - m) * (v - m)).sum
      }.sum
      val wNaive =
        if (groups.size >= 2 && n > groups.size && ssw > 0)
          Some((n - groups.size).toDouble / (groups.size - 1) * ssb / ssw)
        else None
      val row = Association.brownForsythe(data.toDF("g", "v"), Nil, "g", "v")
        .collect()(0)
      approxOpt(optDouble(row, "w"), wNaive, s"bf trial $t")
    }
  }

  // --- McNemar ----------------------------------------------------------------------

  test("fuzz: McNemar statistic vs the discordant-pair formula") {
    for (t <- 1 to Trials) {
      val r = rng("mcnemar", t)
      val pairs = (0 until 15 + r.nextInt(60)).map(_ => (r.nextBoolean(), r.nextBoolean()))
      val b = pairs.count(p => p._1 && !p._2)
      val c = pairs.count(p => !p._1 && p._2)
      val statNaive =
        if (b + c > 0) Some((b - c).toDouble * (b - c) / (b + c)) else None
      val row = Association.mcnemar(pairs.toDF("a", "b"), Nil, "a", "b").collect()(0)
      approxOpt(optDouble(row, "mcnemar"), statNaive, s"mcnemar trial $t")
      if (b + c > 0)
        assert(row.getAs[Boolean]("significant") ===
          ((b - c).toLong * (b - c) * 1000000L > (b + c).toLong * 3841459L),
          s"mcnemar verdict trial $t")
    }
  }

  // --- Runs test --------------------------------------------------------------------

  test("fuzz: Wald-Wolfowitz runs z vs the run-count formula") {
    for (t <- 1 to Trials) {
      val r = rng("runs", t)
      val xs = (0 until 10 + r.nextInt(60)).map(_ => r.nextInt(2).toLong)
      val runs = 1 + xs.sliding(2).count(w => w.size == 2 && w(0) != w(1))
      val n1 = xs.count(_ == 1L); val n0 = xs.size - n1
      val bigN = xs.size.toDouble
      val mu = 2.0 * n0 * n1 / bigN + 1
      val v = 2.0 * n0 * n1 * (2.0 * n0 * n1 - bigN) / (bigN * bigN * (bigN - 1))
      val zNaive = if (n0 > 0 && n1 > 0 && v > 0) Some((runs - mu) / math.sqrt(v)) else None
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x")
      val row = TimeSeries.runsTest(df, Nil, "t", "x").collect()(0)
      assert(row.getAs[Long]("r") === runs.toLong, s"runs R trial $t")
      approxOpt(optDouble(row, "z"), zNaive, s"runs z trial $t")
    }
  }

  // --- Benjamini–Hochberg -----------------------------------------------------------

  test("fuzz: BH rejections vs the naive sorted step-up scan") {
    import graft.quality.MultipleTesting
    for (t <- 1 to Trials) {
      val r = rng("bh", t)
      val m = 5 + r.nextInt(40)
      val ps = (0 until m).map(i => (s"t$i", r.nextInt(1000000000).toLong))
      val sorted = ps.sortBy(p => (p._2, p._1))
      val cut = (1 to m).filter(i =>
        BigInt(sorted(i - 1)._2) * m * 100 <= BigInt(i) * 5 * 1000000000L)
        .lastOption.getOrElse(0)
      val rejectedNaive = sorted.take(cut).map(_._1).toSet
      val out = MultipleTesting.benjaminiHochberg(ps.toDF("id", "p9"), Nil, Seq("id"), "p9")
        .collect()
      val rejected = out.filter(_.getAs[Boolean]("rejected"))
        .map(_.getAs[String]("id")).toSet
      assert(rejected === rejectedNaive, s"bh trial $t")
    }
  }

  // --- Friedman / Kendall's W -------------------------------------------------------

  test("fuzz: Friedman chi2 and Kendall's W vs the per-block midrank formula") {
    for (t <- 1 to Trials) {
      val r = rng("friedman", t)
      val k = 2 + r.nextInt(4)
      val b = 5 + r.nextInt(20)
      val span = 2 + r.nextInt(6) // heavy within-block ties
      val data = for (bi <- 0 until b; ti <- 0 until k)
        yield (s"b$bi", s"t$ti", r.nextInt(span).toLong)
      val blocks = data.groupBy(_._1).values.toSeq
      val rsum = Array.fill(k)(0.0)
      var tieSum = 0.0
      blocks.foreach { rows =>
        val ranks = midranks(rows.map(_._3))
        rows.foreach { case (_, tn, v) => rsum(tn.drop(1).toInt) += ranks(v) }
        tieSum += tieSum3(rows.map(_._3))
      }
      val chi = 12.0 / (b * k * (k + 1)) * rsum.map(x => x * x).sum - 3.0 * b * (k + 1)
      val c = 1.0 - tieSum / (b.toDouble * (k.toDouble * k * k - k))
      val chiTie = if (c > 0) Some(chi / c) else None
      val wNaive = chiTie.map(_ / (b.toDouble * (k - 1)))
      val row = Association.friedman(data.toDF("blk", "j", "v"), "blk", "j", "v")
        .collect()(0)
      approx(row.getAs[Double]("chi2"), chi, s"friedman chi trial $t")
      approxOpt(optDouble(row, "chi2_tie"), chiTie, s"friedman tie trial $t")
      approxOpt(optDouble(row, "w"), wNaive, s"friedman W trial $t")
    }
  }

  // --- Cronbach / Cohen's d ---------------------------------------------------------

  test("fuzz: Cronbach alpha vs the variance-ratio formula") {
    import graft.operators.RankEval
    for (t <- 1 to Trials) {
      val r = rng("cronbach", t)
      val k = 2 + r.nextInt(4)
      val n = 5 + r.nextInt(25)
      val base = (0 until n).map(_ => r.nextInt(10))
      val data = for (u <- 0 until n; j <- 0 until k)
        yield (u.toLong, s"j$j", (base(u) * (j % 2 + 1) + r.nextInt(5)).toLong)
      def varN(xs: Seq[Long]): Double = {
        val m = xs.sum.toDouble / xs.size
        xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
      }
      val byJ = data.groupBy(_._2).values.map(rows => varN(rows.sortBy(_._1).map(_._3)))
      val totals = data.groupBy(_._1).values.map(_.map(_._3).sum).toSeq
      val vT = varN(totals)
      val alphaNaive =
        if (vT > 0) Some(k.toDouble / (k - 1) * (1 - byJ.sum / vT)) else None
      val row = RankEval.cronbachAlpha(data.toDF("u", "j", "v"), "u", "j", "v")
        .collect()(0)
      approxOpt(optDouble(row, "alpha"), alphaNaive, s"cronbach trial $t")
    }
  }

  test("fuzz: Cohen's d and Hedges g vs the pooled-variance formula") {
    for (t <- 1 to Trials) {
      val r = rng("cohend", t)
      val lo = (0 until 5 + r.nextInt(30)).map(_ => r.nextInt(20).toLong)
      val hi = (0 until 5 + r.nextInt(30)).map(_ => (r.nextInt(20) + r.nextInt(8)).toLong)
      def varN(xs: Seq[Long]): Double = {
        val m = xs.sum.toDouble / xs.size
        xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
      }
      val n1 = lo.size; val n2 = hi.size
      val sp2 = ((n1 - 1) * varN(lo) + (n2 - 1) * varN(hi)) / (n1 + n2 - 2)
      val dNaive =
        if (sp2 > 0)
          Some((lo.sum.toDouble / n1 - hi.sum.toDouble / n2) / math.sqrt(sp2))
        else None
      val gNaive = dNaive.map(_ * (1 - 3.0 / (4.0 * (n1 + n2) - 9)))
      val df = (lo.map(("A", _)) ++ hi.map(("B", _))).toDF("g", "v")
      val row = Association.cohensD(df, Nil, "g", "v").collect()(0)
      approxOpt(optDouble(row, "d"), dNaive, s"cohend trial $t")
      approxOpt(optDouble(row, "g_hedges"), gNaive, s"hedges trial $t")
    }
  }

  // --- Weighted median --------------------------------------------------------------

  test("fuzz: weighted median vs the naive cumulative-weight scan") {
    import graft.operators.Quantiles
    for (t <- 1 to Trials) {
      val r = rng("wmed", t)
      val rows = (0 until 10 + r.nextInt(50)).map(_ =>
        ((r.nextInt(12) - 3).toLong, (r.nextInt(9) + 1).toLong))
      val byV = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val w = byV.map(_._2).sum
      val target = (w + 1) / 2
      var cum = 0L
      val medNaive = byV.find { case (_, wv) => cum += wv; cum >= target }.get._1
      val row = Quantiles.weightedMedian(rows.toDF("v", "w"), Nil, "v", "w").collect()(0)
      assert(row.getAs[Long]("total_w") === w, s"wmed W trial $t")
      assert(row.getAs[Long]("median") === medNaive, s"wmed trial $t")
    }
  }

  // --- Drift family (r13: these verified only against oracles that replay
  // the same dag until now — each gets an independent textbook formula) ---------------

  test("fuzz: binned two-sample KS D vs the max-CDF-gap loop") {
    for (t <- 1 to Trials) {
      val r = rng("ks", t)
      val nb = 4 + r.nextInt(8)
      def hist() = (0 until nb).flatMap { b =>
        val c = r.nextInt(9).toLong // 0 -> bucket absent from the frame
        if (c > 0) Some((b.toLong, c)) else None
      } match { case h if h.nonEmpty => h; case _ => Seq((0L, 1L)) }
      val hb = hist(); val hc = hist()
      val tb = hb.map(_._2).sum.toDouble; val tc = hc.map(_._2).sum.toDouble
      val mb = hb.toMap; val mc = hc.toMap
      val buckets = (hb.map(_._1) ++ hc.map(_._1)).distinct.sorted
      var cb = 0L; var cc = 0L
      val dNaive = buckets.map { b =>
        cb += mb.getOrElse(b, 0L); cc += mc.getOrElse(b, 0L)
        math.abs(cb / tb - cc / tc)
      }.max
      val dGraft = Profiler.ksStat(Profiler.ksDriftFromHistograms(
        hb.toDF("bucket", "cnt"), hc.toDF("bucket", "cnt")))
      approx(dGraft, dNaive, s"ks D trial $t")
    }
  }

  test("fuzz: chi-square drift vs the textbook (O-E)^2/E homogeneity sum") {
    for (t <- 1 to Trials) {
      val r = rng("chi2drift", t)
      val cats = 2 + r.nextInt(6)
      def sample() = (0 until 20 + r.nextInt(60)).map(_ =>
        if (r.nextInt(12) == 0) Option.empty[String] else Some("c" + r.nextInt(cats)))
      val base = sample(); val cur = sample()
      def counts(s: Seq[Option[String]]) =
        s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (bm, cm) = (counts(base), counts(cur))
      val bTot = base.size.toDouble; val cTot = cur.size.toDouble
      val n = bTot + cTot
      val chiNaive = (bm.keySet ++ cm.keySet).toSeq.map { v =>
        val b = bm.getOrElse(v, 0L).toDouble; val c = cm.getOrElse(v, 0L).toDouble
        val eb = bTot * (b + c) / n; val ec = cTot * (b + c) / n
        (b - eb) * (b - eb) / eb + (c - ec) * (c - ec) / ec
      }.sum
      val (chiGraft, dfGraft) = Profiler.chiSquareStat(Profiler.chiSquareDrift(
        base.toDF("v"), cur.toDF("v"), "v"))
      approx(chiGraft, chiNaive, s"chi2 drift trial $t")
      assert(dfGraft === (bm.keySet ++ cm.keySet).size.toLong - 1L, s"chi2 df trial $t")
    }
  }

  test("fuzz: PSI and histogram chi-square vs the smoothed-share formulas") {
    for (t <- 1 to Trials) {
      val r = rng("psi", t)
      val nb = 4 + r.nextInt(6)
      val eps = 0.5
      def hist() = (0 until nb).flatMap { b =>
        val c = r.nextInt(15).toLong
        if (c > 0) Some((b.toLong, c)) else None
      } match { case h if h.nonEmpty => h; case _ => Seq((0L, 2L)) }
      val hb = hist(); val hc = hist()
      val mb = hb.toMap; val mc = hc.toMap
      val smooth = eps * (nb + 2)
      val tb = hb.map(_._2).sum + smooth; val tc = hc.map(_._2).sum + smooth
      val (chiNaive, psiNaive) = (mb.keySet ++ mc.keySet).toSeq.map { b =>
        val pb = (mb.getOrElse(b, 0L) + eps) / tb
        val pc = (mc.getOrElse(b, 0L) + eps) / tc
        ((pc - pb) * (pc - pb) / pb, (pc - pb) * math.log(pc / pb))
      }.foldLeft((0d, 0d)) { case ((a, b), (x, y)) => (a + x, b + y) }
      val (chiGraft, psiGraft) = Profiler.driftStats(Profiler.driftFromHistograms(
        hb.toDF("bucket", "cnt"), hc.toDF("bucket", "cnt"), nb, eps))
      approx(chiGraft, chiNaive, s"hist chi2 trial $t")
      approx(psiGraft, psiNaive, s"psi trial $t")
    }
  }

  test("fuzz: Jensen-Shannon divergence vs the half-KL-to-midpoint sum") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("js", t)
      val cats = 2 + r.nextInt(6)
      def sample() = (0 until 15 + r.nextInt(60)).map(_ =>
        if (r.nextInt(10) == 0) Option.empty[String] else Some("c" + r.nextInt(cats)))
      val base = sample(); val cur = sample()
      def counts(s: Seq[Option[String]]) =
        s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (bm, cm) = (counts(base), counts(cur))
      val tb = base.size.toDouble; val tc = cur.size.toDouble
      val jsNaive = (bm.keySet ++ cm.keySet).toSeq.map { v =>
        val p = bm.getOrElse(v, 0L) / tb; val q = cm.getOrElse(v, 0L) / tc
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) / 2 else 0d) +
          (if (q > 0) q * math.log(q / m) / 2 else 0d)
      }.sum
      val jsGraft = Association.jsStat(Association.jsDivergence(
        base.toDF("v"), cur.toDF("v"), "v"))
      approx(jsGraft, jsNaive, s"js trial $t")
    }
  }

  test("fuzz: Hellinger distance vs the Bhattacharyya-complement formula") {
    for (t <- 1 to Trials) {
      val r = rng("hellinger", t)
      val cats = 2 + r.nextInt(6)
      def sample() = (0 until 15 + r.nextInt(60)).map(_ =>
        if (r.nextInt(10) == 0) Option.empty[String] else Some("c" + r.nextInt(cats)))
      val base = sample(); val cur = sample()
      def counts(s: Seq[Option[String]]) =
        s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (bm, cm) = (counts(base), counts(cur))
      val tb = base.size.toDouble; val tc = cur.size.toDouble
      val bc = (bm.keySet ++ cm.keySet).toSeq.map { v =>
        math.sqrt((bm.getOrElse(v, 0L) / tb) * (cm.getOrElse(v, 0L) / tc))
      }.sum
      val hNaive = math.sqrt(math.max(1d - bc, 0d))
      val row = Profiler.hellingerDrift(base.toDF("v"), cur.toDF("v"), "v").collect()(0)
      approx(row.getAs[Double]("hellinger"), hNaive, s"hellinger trial $t")
    }
  }

  test("fuzz: CUSUM chart vs the classical max(0, S + x - target) recursion") {
    for (t <- 1 to Trials) {
      val r = rng("cusum", t)
      val target = 10L
      val n = 20 + r.nextInt(60)
      val shiftAt = n / 2 + r.nextInt(n / 3)
      val vs = (0 until n).map { i =>
        val drift = if (i >= shiftAt) r.nextInt(4).toLong else 0L
        (i.toLong, 8L + r.nextInt(5) + drift)
      }
      val threshold = 5L + r.nextInt(10)
      var hi = 0L; var lo = 0L
      val naive = vs.map { case (i, x) =>
        hi = math.max(0L, hi + (x - target))
        lo = math.max(0L, lo - (x - target))
        (i, hi, lo, hi > threshold, lo > threshold)
      }
      val got = TimeSeries.cusum(vs.toDF("t", "v"), Nil, Seq("t"), "v", target, threshold)
        .orderBy("t").collect()
        .map(rr => (rr.getAs[Long]("t"), rr.getAs[Long]("cusum_hi"),
          rr.getAs[Long]("cusum_lo"), rr.getAs[Boolean]("breach_hi"),
          rr.getAs[Boolean]("breach_lo"))).toSeq
      assert(got === naive, s"cusum trial $t")
    }
  }

  test("fuzz: changepoint argmax/stat/verdict vs the exact BigInt prefix-deviation loop") {
    for (t <- 1 to Trials) {
      val r = rng("changepoint", t)
      val n = 12 + r.nextInt(40)
      val shiftAt = 3 + r.nextInt(n - 6)
      val vs = (0 until n).map { i =>
        (i.toLong, (r.nextInt(7) + (if (i >= shiftAt) r.nextInt(3) * 4 else 0)).toLong)
      }
      val xs = vs.map(_._2)
      val bN = BigInt(n); val sN = BigInt(xs.sum)
      val q = xs.map(x => BigInt(x) * BigInt(x)).sum
      val varN = bN * q - sN * sN
      var st = BigInt(0)
      val cands = (1 until n).map { tt => // interior prefixes only
        st += xs(tt - 1)
        (tt.toLong, bN * st - BigInt(tt) * sN)
      }
      val (cpT, dBest) = cands.maxBy { case (tt, d) => (d.abs, -tt) }
      val statNaive =
        if (varN > 0)
          Some(dBest.abs.toDouble / (math.sqrt(varN.toDouble) * math.sqrt(n.toDouble)))
        else None
      val changedNaive =
        if (varN > 0) Some(dBest * dBest * 1000000 > varN * bN * 1844164) else None
      val row = TimeSeries.changepoint(vs.toDF("t", "v"), Nil, "t", "v").collect()(0)
      assert(row.getAs[Long]("cp_t") === cpT, s"cp argmax trial $t")
      assert(BigInt(row.getAs[String]("d")) === dBest, s"cp d trial $t")
      approxOpt(optDouble(row, "stat"), statNaive, s"cp stat trial $t")
      val gotChanged = if (row.isNullAt(row.fieldIndex("changed"))) None
        else Some(row.getAs[Boolean]("changed"))
      assert(gotChanged === changedNaive, s"cp verdict trial $t")
    }
  }

  test("fuzz: Holm rejections vs the naive step-down walk; Holm subset of BH") {
    import graft.quality.MultipleTesting
    for (t <- 1 to Trials) {
      val r = rng("holm", t)
      val m = 5 + r.nextInt(25)
      val ps = (0 until m).map(i => (s"t$i", r.nextInt(1000000000).toLong))
      val sorted = ps.map(_._2).sorted
      // naive walk: reject while p_(i) <= alpha/(m-i+1), stop at first failure
      var stop = m
      var i = 0
      while (i < m && stop == m) {
        if (!(BigInt(sorted(i)) * (m - i) * 100 <= BigInt(5) * 1000000000L)) stop = i
        i += 1
      }
      val naiveRejected = sorted.take(stop).toSet
      val out = MultipleTesting.holmBonferroni(ps.toDF("id", "p9"), Nil, Seq("id"), "p9")
        .collect().map(row => row.getAs[Long]("p9") -> row.getAs[Boolean]("rejected"))
      for ((p, rej) <- out)
        assert(rej === naiveRejected.contains(p), s"holm p=$p trial $t")
      // Holm (FWER) never rejects what BH (FDR) retains
      val bh = MultipleTesting.benjaminiHochberg(ps.toDF("id", "p9"), Nil, Seq("id"), "p9")
        .collect().map(row => row.getAs[Long]("p9") -> row.getAs[Boolean]("rejected")).toMap
      for ((p, rej) <- out if rej)
        assert(bh(p), s"holm rejected $p that BH retained, trial $t")
    }
  }

  test("fuzz: G statistic vs the 2*sum O ln(O/E) loop, chi2 agreement on mild drift") {
    for (t <- 1 to Trials) {
      val r = rng("gtest", t)
      val cats = 2 + r.nextInt(5)
      def sample() = (0 until 30 + r.nextInt(60)).map(_ => "c" + r.nextInt(cats))
      val base = sample(); val cur = sample()
      def counts(s: Seq[String]) = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (bm, cm) = (counts(base), counts(cur))
      val (bt, ct) = (base.size.toDouble, cur.size.toDouble)
      val n = bt + ct
      val gNaive = 2d * (bm.keySet ++ cm.keySet).toSeq.map { v =>
        val b = bm.getOrElse(v, 0L).toDouble; val c = cm.getOrElse(v, 0L).toDouble
        val tv = b + c
        (if (b > 0) b * math.log(b / (bt * tv / n)) else 0d) +
          (if (c > 0) c * math.log(c / (ct * tv / n)) else 0d)
      }.sum
      val (g, df) = Profiler.gStat(Profiler.gTestDrift(
        base.toDF("v"), cur.toDF("v"), "v"))
      approx(g, gNaive, s"gtest trial $t")
      assert(df === (bm.keySet ++ cm.keySet).size.toLong - 1L, s"gtest df trial $t")
      // sanity: G and Pearson chi2 agree to first order on same-universe drift
      val (chi, _) = Profiler.chiSquareStat(Profiler.chiSquareDrift(
        base.toDF("v"), cur.toDF("v"), "v"))
      assert(g >= 0d && math.abs(g - chi) < math.max(4d, 0.8 * chi + 4d),
        s"gtest vs chi2 sanity trial $t: g=$g chi=$chi")
    }
  }

  test("fuzz: proportion effect sizes vs the direct 2x2 formulas") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("propeff", t)
      val lo = (0 until 10 + r.nextInt(50)).map(_ => (r.nextInt(3) == 0))
      val hi = (0 until 10 + r.nextInt(50)).map(_ => (r.nextInt(2) == 0))
      val df = (lo.map(("A", _)) ++ hi.map(("B", _)))
        .map { case (grp, s) => (grp, if (s) 1L else 0L) }.toDF("g", "s")
      val (m1, s1) = (lo.size.toDouble, lo.count(identity).toDouble)
      val (m2, s2) = (hi.size.toDouble, hi.count(identity).toDouble)
      val (a, b, c, d) = (s1, m1 - s1, s2, m2 - s2)
      val row = Association.proportionEffects(df, Nil, "g", "s").collect()(0)
      approx(row.getAs[Double]("risk_diff"), s1 / m1 - s2 / m2, s"rd trial $t")
      approxOpt(optDouble(row, "risk_ratio"),
        if (c > 0) Some((s1 / m1) / (s2 / m2)) else None, s"rr trial $t")
      val zc = Seq(a, b, c, d).count(_ == 0d)
      assert(row.getAs[Long]("n_zero_cells") === zc.toLong, s"zc trial $t")
      approxOpt(optDouble(row, "odds_ratio"),
        if (zc == 0) Some(a * d / (b * c)) else None, s"or trial $t")
      if (zc == 0) {
        val se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        approx(row.getAs[Double]("or_ci_lo"),
          math.exp(math.log(a * d / (b * c)) - 1.959964 * se), s"ci trial $t")
      }
      approx(row.getAs[Double]("cohens_h"),
        2 * math.asin(math.sqrt(s1 / m1)) - 2 * math.asin(math.sqrt(s2 / m2)),
        s"h trial $t")
    }
  }

  test("fuzz: Page trend L and z vs the ordered midrank-sum formula") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("page", t)
      val k = 3 + r.nextInt(3)
      val b = 4 + r.nextInt(12)
      val span = 3 + r.nextInt(10)
      val data = for (blk <- 0 until b; tr <- 0 until k)
        yield (blk.toLong, tr.toLong, (r.nextInt(span) + tr).toLong)
      val byBlock = data.groupBy(_._1)
      val rSums = Array.fill(k)(0.0)
      for ((_, rows) <- byBlock) {
        val ranks = midranks(rows.map(_._3))
        for ((_, tr, v) <- rows) rSums(tr.toInt) += ranks(v)
      }
      val lNaive = (1 to k).map(j => j * rSums(j - 1)).sum
      val e = b.toDouble * k * (k + 1) * (k + 1) / 4d
      val v = b.toDouble * (k.toDouble * k * k - k) * (k.toDouble * k * k - k) /
        (144d * (k - 1))
      val zNaive = (lNaive - e) / math.sqrt(v)
      val row = Association.pageTrend(data.toDF("blk", "t", "v"), "blk", "t", "v")
        .collect()(0)
      assert(BigInt(row.getAs[String]("l2")) === BigInt((2 * lNaive).round),
        s"page L2 trial $t")
      approx(row.getAs[Double]("z"), zNaive, s"page z trial $t")
    }
  }

  // --- One-way ANOVA ----------------------------------------------------------------

  test("fuzz: one-way ANOVA F vs the SSB/SSW decomposition") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("anova", t)
      val k = 2 + r.nextInt(4)
      val data = (0 until 20 + r.nextInt(60)).map(_ =>
        ("g" + r.nextInt(k), (r.nextInt(25) - 5).toLong))
      val groups = data.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
      val n = data.size
      val grand = data.map(_._2).sum.toDouble / n
      val ssb = groups.values.map { g =>
        val m = g.sum / g.size; g.size * (m - grand) * (m - grand)
      }.sum
      val ssw = groups.values.map { g =>
        val m = g.sum / g.size; g.map(x => (x - m) * (x - m)).sum
      }.sum
      val fNaive =
        if (groups.size >= 2 && n > groups.size && ssw > 0)
          Some((ssb / (groups.size - 1)) / (ssw / (n - groups.size)))
        else None
      val row = Association.oneWayAnova(data.toDF("g", "v"), Nil, "g", "v")
        .collect()(0)
      approxOpt(optDouble(row, "f"), fNaive, s"anova F trial $t")
    }
  }

  // --- Welch's t --------------------------------------------------------------------

  test("fuzz: Yuen trimmed-means t vs a naive sort-trim-winsorize implementation") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("yuen", t)
      val trim = Seq(10, 20, 25)(r.nextInt(3))
      val rows = (0 until 24 + r.nextInt(60)).map { i =>
        val arm = if (r.nextBoolean()) "A" else "B"
        // heavy-ish tail: occasional large values
        val v = (if (r.nextInt(10) == 0) 200 + r.nextInt(500)
          else r.nextInt(30)).toLong + (if (arm == "A") 3L else 0L)
        (arm, v, i.toLong)
      }
      def naive(a: String): Option[(Double, Double, Int, Int)] = {
        val vs = rows.filter(_._1 == a).sortBy(p => (p._2, p._3)).map(_._2)
        val n = vs.size
        if (n == 0) return None
        val g = trim * n / 100
        val h = n - 2 * g
        val mid = vs.slice(g, n - g)
        val xt = mid.map(_.toDouble).sum / h
        val wins = Seq.fill(g)(vs(g)) ++ mid ++ Seq.fill(g)(vs(n - g - 1))
        val wm = wins.map(_.toDouble).sum / n
        val s2w = wins.map(v => (v - wm) * (v - wm)).sum / (n - 1)
        Some((xt, s2w * (n - 1) / (h.toDouble * (h - 1)), n, h))
      }
      (naive("A"), naive("B")) match {
        case (Some((xt1, se1, _, h1)), Some((xt2, se2, _, h2)))
            if h1 >= 2 && h2 >= 2 && se1 + se2 > 0 =>
          val se = se1 + se2
          val tN = (xt1 - xt2) / math.sqrt(se)
          val dfN = se * se / (se1 * se1 / (h1 - 1) + se2 * se2 / (h2 - 1))
          val row = Association.yuenT(rows.toDF("arm", "v", "tb"),
            Nil, "arm", "v", "tb", trimPct = trim).collect()(0)
          approx(row.getAs[Double]("mean_trim_lo"), xt1, s"yuen xt1 trial $t")
          approx(row.getAs[Double]("t"), tN, s"yuen t trial $t")
          approx(row.getAs[Double]("df"), dfN, s"yuen df trial $t")
        case _ => ()
      }
    }
  }

  test("fuzz: Wilcoxon signed-rank vs a naive average-rank loop; paired t vs the direct formula") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("wilcoxon", t)
      val pairs = (0 until 20 + r.nextInt(60)).map { _ =>
        val x = r.nextInt(15).toLong
        (x + r.nextInt(7).toLong - 2L, x)
      }
      val ds = pairs.map(p => p._1 - p._2).filter(_ != 0L)
      if (ds.nonEmpty) {
        // naive average ranks of |d|
        val sorted = ds.map(math.abs).sorted
        def avgRank(a: Long): Double = {
          val lo = sorted.indexOf(a); val hi = sorted.lastIndexOf(a)
          (lo + hi + 2) / 2.0
        }
        val wPlus = ds.filter(_ > 0).map(d => avgRank(math.abs(d))).sum
        val n = ds.size
        val ties = sorted.groupBy(identity).values
          .map(g => g.size.toDouble).map(c => c * c * c - c).sum
        val varW = n.toDouble * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
        val row = Association.wilcoxonSignedRank(
          pairs.toDF("x", "y"), Nil, "x", "y").collect()(0)
        assert(row.getAs[Long]("n") === n.toLong)
        if (varW > 0) {
          val zN = (wPlus - n.toDouble * (n + 1) / 4.0) / math.sqrt(varW)
          approx(row.getAs[Double]("z"), zN, s"wilcoxon z trial $t")
        }
        // paired t vs the direct per-diff formula (all pairs, zeros kept)
        val all = pairs.map(p => (p._1 - p._2).toDouble)
        val m = all.sum / all.size
        val s2 = all.map(d => (d - m) * (d - m)).sum / (all.size - 1)
        if (s2 > 0) {
          val tN = m / math.sqrt(s2 / all.size)
          val rp = Association.pairedT(pairs.toDF("x", "y"), Nil, "x", "y")
            .collect()(0)
          approx(rp.getAs[Double]("t"), tN, s"paired t trial $t")
        }
      }
    }
  }

  test("fuzz: Hodges-Lehmann vs the naive Walsh-average median") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("hl", t)
      val pairs = (0 until 10 + r.nextInt(40)).map { i =>
        (i.toLong, r.nextInt(12).toLong, r.nextInt(12).toLong)
      }
      val ds = pairs.map(p => p._2 - p._3)
      val walsh = (for (i <- ds.indices; j <- i until ds.size)
        yield ds(i) + ds(j)).sorted // doubled averages
      val lower2 = walsh((walsh.size + 1) / 2 - 1) // lower median, doubled
      val row = Association.hodgesLehmann(
        pairs.toDF("u", "x", "y"), Nil, "x", "y").collect()(0)
      assert(row.getAs[String]("hl2") === lower2.toString, s"hl trial $t")
      assert(row.getAs[Double]("hl") === lower2 / 2.0, s"hl/2 trial $t")
    }
  }

  test("fuzz: Welch t and Welch-Satterthwaite df vs the unequal-variance formulas") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("welch", t)
      val lo = (0 until 5 + r.nextInt(40)).map(_ => r.nextInt(30).toLong)
      val hi = (0 until 5 + r.nextInt(40)).map(_ => (r.nextInt(50) - 5).toLong)
      def varS(xs: Seq[Long]): Double = {
        val m = xs.sum.toDouble / xs.size
        xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
      }
      val (se1, se2) = (varS(lo) / lo.size, varS(hi) / hi.size)
      val se = se1 + se2
      val (tNaive, dfNaive) =
        if (se > 0)
          (Some((lo.sum.toDouble / lo.size - hi.sum.toDouble / hi.size) / math.sqrt(se)),
            Some(se * se / (se1 * se1 / (lo.size - 1) + se2 * se2 / (hi.size - 1))))
        else (None, None)
      val df = (lo.map(("A", _)) ++ hi.map(("B", _))).toDF("g", "v")
      val row = Association.welchT(df, Nil, "g", "v").collect()(0)
      approxOpt(optDouble(row, "t"), tNaive, s"welch t trial $t")
      approxOpt(optDouble(row, "df"), dfNaive, s"welch df trial $t")
    }
  }

  // --- Fleiss' kappa ----------------------------------------------------------------

  test("fuzz: Fleiss kappa vs the per-unit P_i mean formula") {
    for (t <- 1 to Trials) {
      val r = rng("fleiss", t)
      val m = 2 + r.nextInt(4)
      val cats = 2 + r.nextInt(3)
      val n = 8 + r.nextInt(30)
      val ratings = (0 until n).flatMap(u =>
        (0 until m).map(_ => (u.toLong, "c" + r.nextInt(cats))))
      val byUnit = ratings.groupBy(_._1).values.toSeq
        .map(_.groupBy(_._2).view.mapValues(_.size).toMap)
      val pBar = byUnit.map(cnt =>
        (cnt.values.map(x => x * x).sum - m).toDouble / (m * (m - 1))).sum / n
      val margins = ratings.groupBy(_._2).view.mapValues(_.size.toDouble / (n * m))
      val pe = margins.values.map(p => p * p).sum
      val kNaive = if (pe < 1d) Some((pBar - pe) / (1d - pe)) else None
      val row = RankEval.fleissKappa(ratings.toDF("u", "l"), "u", "l", m)
        .collect()(0)
      assert(row.getAs[Long]("n_units") === n.toLong, s"fleiss n trial $t")
      approxOpt(optDouble(row, "kappa"), kNaive, s"fleiss kappa trial $t")
    }
  }

  // --- Cramér–von Mises -------------------------------------------------------------

  test("fuzz: binned CvM T vs the mass-weighted squared-CDF-gap loop") {
    for (t <- 1 to Trials) {
      val r = rng("cvm", t)
      val nb = 4 + r.nextInt(8)
      def hist() = (0 until nb).flatMap { b =>
        val c = r.nextInt(9).toLong
        if (c > 0) Some((b.toLong, c)) else None
      } match { case h if h.nonEmpty => h; case _ => Seq((0L, 1L)) }
      val hb = hist(); val hc = hist()
      val tb = hb.map(_._2).sum.toDouble; val tc = hc.map(_._2).sum.toDouble
      val nTot = tb + tc
      val mb = hb.toMap; val mc = hc.toMap
      val buckets = (hb.map(_._1) ++ hc.map(_._1)).distinct.sorted
      var cb = 0L; var cc = 0L
      val tNaive = buckets.map { b =>
        val (nbk, nck) = (mb.getOrElse(b, 0L), mc.getOrElse(b, 0L))
        cb += nbk; cc += nck
        val gap = cb / tb - cc / tc
        (nbk + nck) * gap * gap
      }.sum * tb * tc / (nTot * nTot)
      val tGraft = Profiler.cvmStat(Profiler.cvmFromHistograms(
        hb.toDF("bucket", "cnt"), hc.toDF("bucket", "cnt")))
      approx(tGraft, tNaive, s"cvm T trial $t")
    }
  }

  // --- Kaplan–Meier -----------------------------------------------------------------

  test("fuzz: Kaplan-Meier survival and Greenwood SE vs the product-limit loop") {
    import graft.operators.Survival
    for (t <- 1 to Trials) {
      val r = rng("km", t)
      val subjects = (0 until 15 + r.nextInt(60)).map(_ =>
        ((1 + r.nextInt(12)).toLong, r.nextInt(3).min(1).toLong)) // ~2/3 events
      val byT = subjects.groupBy(_._1).view
        .mapValues(s => (s.count(_._2 == 1L).toLong, s.count(_._2 == 0L).toLong))
        .toMap
      val times = byT.keys.toSeq.sorted
      var atRisk = subjects.size.toLong
      var sNaive = 1.0
      var gwNaive = 0.0
      var dead = false
      val expected = times.map { tt =>
        val (d, c) = byT(tt)
        val n = atRisk
        if (d > 0 && d < n) {
          sNaive *= (n - d).toDouble / n // Tol absorbs the operator's nano-ln rounding
          gwNaive += d.toDouble / (n.toDouble * (n - d))
        }
        if (d == n) dead = true
        atRisk -= (d + c)
        (tt, n, d, c, if (dead) 0.0 else sNaive, dead)
      }
      val got = Survival.kaplanMeier(subjects.toDF("dur", "ev"), Nil, "dur", "ev")
        .orderBy("t").collect()
      for (((tt, n, d, c, sv, isDead), row) <- expected.zip(got)) {
        assert(row.getAs[Long]("t") === tt && row.getAs[Long]("n_risk") === n,
          s"km risk trial $t")
        assert(row.getAs[Long]("n_event") === d && row.getAs[Long]("n_censored") === c,
          s"km counts trial $t")
        approx(row.getAs[Double]("survival"), sv, s"km S(t=$tt) trial $t")
        if (!isDead && sv > 0)
          approx(row.getAs[Double]("se_greenwood"), sv * math.sqrt(gwAt(subjects, tt)),
            s"km se(t=$tt) trial $t")
      }
    }
  }

  test("fuzz: log-rank z and chi2 vs the hypergeometric O-E loop") {
    import graft.operators.Survival
    for (t <- 1 to Trials) {
      val r = rng("logrank", t)
      val subjects = (0 until 20 + r.nextInt(60)).map { i =>
        val grp = if (r.nextBoolean()) "A" else "B"
        val dur = (1 + r.nextInt(10) + (if (grp == "A") r.nextInt(3) else 0)).toLong
        (grp, dur, r.nextInt(3).min(1).toLong)
      }
      val times = subjects.map(_._2).distinct.sorted
      var o1 = 0L; var e1 = 0.0; var v = 0.0
      for (tt <- times) {
        val n1 = subjects.count(s => s._1 == "A" && s._2 >= tt).toDouble
        val n2 = subjects.count(s => s._1 == "B" && s._2 >= tt).toDouble
        val d1 = subjects.count(s => s._1 == "A" && s._2 == tt && s._3 == 1L)
        val d2 = subjects.count(s => s._1 == "B" && s._2 == tt && s._3 == 1L)
        val n = n1 + n2; val d = (d1 + d2).toDouble
        o1 += d1
        // canonical Mantel: E at EVERY event time (defined at n = 1 —
        // netting O−E to 0 when the last at-risk subject dies); only
        // V's n−1 divisor needs the n > 1 guard
        if (d > 0) {
          e1 += d * n1 / n
          if (n > 1) v += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
        }
      }
      val zNaive = if (v > 0) Some((o1 - e1) / math.sqrt(v)) else None
      val row = Survival.logRank(subjects.toDF("g", "dur", "ev"),
        Nil, "g", "dur", "ev").collect()(0)
      assert(row.getAs[Long]("o_lo") === o1, s"logrank O trial $t")
      approxOpt(optDouble(row, "z"), zNaive, s"logrank z trial $t")
    }
  }

  test("fuzz: weighted kappa vs the double-loop contingency formula, both weightings") {
    for (t <- 1 to Trials) {
      val r = rng("wkappa", t)
      val levels = 3 + r.nextInt(3)
      val pairs = (0 until 20 + r.nextInt(60)).map { _ =>
        val a = r.nextInt(levels)
        val b = math.max(0, math.min(levels - 1, a + r.nextInt(5) - 2)) // correlated
        (a.toLong, b.toLong)
      }
      val n = pairs.size.toDouble
      for (quad <- Seq(true, false)) {
        def w(i: Long, j: Long): Double = {
          val d = math.abs(i - j).toDouble; if (quad) d * d else d
        }
        val wObs = pairs.map { case (a, b) => w(a, b) }.sum
        val ra = pairs.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
        val cb = pairs.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
        // keys.toSeq: a for over two key SETS would dedupe equal terms
        val wExp = (for (i <- ra.keys.toSeq; j <- cb.keys.toSeq)
          yield w(i, j) * ra(i) * cb(j) / n).sum
        val kNaive = if (wExp > 0) Some(1d - wObs / wExp) else None
        val row = RankEval.weightedKappa(pairs.toDF("a", "b"), "a", "b", quad)
          .collect()(0)
        approxOpt(optDouble(row, "kappa_w"), kNaive, s"wkappa quad=$quad trial $t")
      }
    }
  }

  test("fuzz: Yule's K vs the frequency-spectrum formula; RMST vs the step-area loop") {
    import graft.text.CorpusLaws
    import graft.operators.Survival
    for (t <- 1 to Trials) {
      val r = rng("yule", t)
      val tokens = (0 until 30 + r.nextInt(80)).map(_ => "w" + r.nextInt(12))
      val cnts = tokens.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val n = tokens.size.toDouble
      // the classic spectrum form: 1e4 * (sum_m m^2 V_m - N) / N^2
      val spectrum = cnts.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
      val kNaive = 1e4 * (spectrum.map { case (m, vm) => m.toDouble * m * vm }.sum - n) / (n * n)
      val row = CorpusLaws.yuleK(
        cnts.map { case (tok, c) => ("g", tok, c) }.toDF("k", "token", "cnt"),
        Seq("k")).collect()(0)
      approx(row.getAs[Double]("yule_k"), kNaive, s"yule trial $t")
      // RMST: random censored cohort, naive step-area walk over the km rows
      val subjects = (0 until 10 + r.nextInt(40)).map(_ =>
        ((1 + r.nextInt(9)).toLong, r.nextInt(3).min(1).toLong))
      val tau = (3 + r.nextInt(8)).toLong
      val km = Survival.kaplanMeier(subjects.toDF("dur", "ev"), Nil, "dur", "ev")
      val steps = km.select("t", "survival").collect()
        .map(rr => (rr.getLong(0), rr.getDouble(1))).sortBy(_._1)
        .filter(_._1 <= tau)
      var prevT = 0L; var prevS = 1.0; var area = 0.0
      for ((tt, s) <- steps) { area += prevS * (tt - prevT); prevT = tt; prevS = s }
      area += prevS * (tau - prevT)
      val got = Survival.rmst(km, Nil, tau).collect()(0).getAs[Double]("rmst")
      approx(got, area, s"rmst trial $t")
    }
  }

  /** Greenwood inner sum up to and including time tt, from scratch. */
  private def gwAt(subjects: Seq[(Long, Long)], tt: Long): Double = {
    val byT = subjects.groupBy(_._1).view
      .mapValues(s => (s.count(_._2 == 1L).toLong, s.count(_._2 == 0L).toLong)).toMap
    var atRisk = subjects.size.toLong
    var acc = 0.0
    for (time <- byT.keys.toSeq.sorted if time <= tt) {
      val (d, c) = byT(time)
      if (d > 0 && d < atRisk) acc += d.toDouble / (atRisk.toDouble * (atRisk - d))
      atRisk -= (d + c)
    }
    acc
  }

  // --- Trimmed mean -----------------------------------------------------------------

  test("fuzz: trimmed mean vs the sort-drop-average loop") {
    for (t <- 1 to Trials) {
      val r = rng("trim", t)
      val vs = (0 until 10 + r.nextInt(50)).map(i => (i.toLong, r.nextInt(40).toLong - 8))
      val pct = Seq(5, 10, 20, 25)(r.nextInt(4))
      val d = vs.size * pct / 100
      val kept = vs.map(_._2).sorted.slice(d, vs.size - d)
      val meanNaive = if (kept.nonEmpty) Some(kept.sum.toDouble / kept.size) else None
      val row = Quantiles.trimmedMean(
        vs.toDF("id", "v"), Nil, "v", "id", trimPct = pct).collect()(0)
      assert(row.getAs[Long]("n_kept") === kept.size.toLong, s"trim n trial $t")
      approxOpt(optDouble(row, "trimmed_mean"), meanNaive, s"trim mean trial $t")
    }
  }

  // --- stratified log-rank ----------------------------------------------------------

  test("fuzz: stratified log-rank vs the per-stratum hypergeometric pooling loop") {
    import graft.operators.Survival
    for (t <- 1 to Trials) {
      val r = rng("strlogrank", t)
      val nStrata = 2 + r.nextInt(3)
      val subjects = (0 until 30 + r.nextInt(60)).map { _ =>
        val st = "s" + r.nextInt(nStrata)
        val grp = if (r.nextBoolean()) "A" else "B"
        val dur = (1 + r.nextInt(8) + (if (grp == "A") r.nextInt(3) else 0)).toLong
        (st, grp, dur, r.nextInt(3).min(1).toLong)
      }
      var o1 = 0L; var e1 = 0.0; var v = 0.0
      for (st <- subjects.map(_._1).distinct) {
        val ss = subjects.filter(_._1 == st)
        for (tt <- ss.map(_._3).distinct.sorted) {
          val n1 = ss.count(s => s._2 == "A" && s._3 >= tt).toDouble
          val n2 = ss.count(s => s._2 == "B" && s._3 >= tt).toDouble
          val d1 = ss.count(s => s._2 == "A" && s._3 == tt && s._4 == 1L)
          val d2 = ss.count(s => s._2 == "B" && s._3 == tt && s._4 == 1L)
          val n = n1 + n2; val d = (d1 + d2).toDouble
          o1 += d1
          if (d > 0) {
            e1 += d * n1 / n
            if (n > 1) v += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
          }
        }
      }
      val zNaive = if (v > 0) Some((o1 - e1) / math.sqrt(v)) else None
      val row = Survival.logRankStratified(subjects.toDF("st", "g", "dur", "ev"),
        Nil, "st", "g", "dur", "ev").collect()(0)
      assert(row.getAs[Long]("o_lo") === o1, s"strat logrank O trial $t")
      approxOpt(optDouble(row, "z"), zNaive, s"strat logrank z trial $t")
    }
  }

  // --- Aalen–Johansen ---------------------------------------------------------------

  test("fuzz: Aalen-Johansen CIF vs the textbook S(t-)*d_k/n walk") {
    import graft.operators.Survival
    for (t <- 1 to Trials) {
      val r = rng("aj", t)
      val nTypes = 1 + r.nextInt(3)
      val subjects = (0 until 25 + r.nextInt(50)).map { _ =>
        val dur = (1 + r.nextInt(8)).toLong
        val cause = if (r.nextInt(4) == 0) 0L else (1 + r.nextInt(nTypes)).toLong
        (dur, cause)
      }
      val times = subjects.map(_._1).distinct.sorted
      var s = 1.0
      var cif = Map.empty[Long, Double].withDefaultValue(0.0)
      val expect = scala.collection.mutable.Map.empty[(Long, Long), (Double, Double)]
      for (tt <- times) {
        val n = subjects.count(_._1 >= tt).toDouble
        val d = subjects.count(x => x._1 == tt && x._2 != 0L).toDouble
        for (k <- 1L to nTypes.toLong) {
          val dk = subjects.count(x => x._1 == tt && x._2 == k).toDouble
          cif += k -> (cif(k) + s * dk / n)
        }
        s = if (d >= n) 0.0 else s * (1 - d / n)
        for (k <- 1L to nTypes.toLong) expect((tt, k)) = (s, cif(k))
      }
      val got = Survival.aalenJohansen(subjects.toDF("dur", "cv"), Nil, "dur", "cv")
        .collect()
      assert(got.nonEmpty, s"aj empty trial $t")
      for (row <- got) {
        val key = (row.getAs[Long]("t"), row.getAs[Long]("ev_type"))
        approx(row.getAs[Double]("survival"), expect(key)._1, s"aj S$key trial $t")
        approx(row.getAs[Double]("cif"), expect(key)._2, s"aj CIF$key trial $t")
      }
      if (nTypes == 1) got.foreach { row =>
        approx(row.getAs[Double]("cif"), 1d - row.getAs[Double]("survival"),
          s"aj KM-reduction trial $t")
      }
    }
  }

  // --- CUPED ------------------------------------------------------------------------

  test("fuzz: CUPED theta, adjusted effect, se and rho2 vs the direct covariance formulas") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("cuped", t)
      val rows = (0 until 30 + r.nextInt(60)).map { _ =>
        val x = r.nextInt(20).toLong
        val arm = if (r.nextBoolean()) "A" else "B"
        val y = x + r.nextInt(10).toLong + (if (arm == "A") 2L else 0L)
        (arm, y, x)
      }
      val n = rows.size.toDouble
      val xbar = rows.map(_._3).sum.toDouble / n
      val ybar = rows.map(_._2).sum.toDouble / n
      val cov = rows.map(p => (p._3 - xbar) * (p._2 - ybar)).sum / n
      val varx = rows.map(p => (p._3 - xbar) * (p._3 - xbar)).sum / n
      val vary = rows.map(p => (p._2 - ybar) * (p._2 - ybar)).sum / n
      val theta = cov / varx
      def arm(a: String) = rows.filter(_._1 == a)
      def meanZ(a: String) = arm(a).map(p => p._2 - theta * p._3).sum / arm(a).size
      def varZ(a: String) = {
        val zs = arm(a).map(p => p._2 - theta * p._3)
        val m = zs.sum / zs.size
        zs.map(z => (z - m) * (z - m)).sum / (zs.size - 1)
      }
      val adjNaive = meanZ("A") - meanZ("B")
      val seNaive = math.sqrt(varZ("A") / arm("A").size + varZ("B") / arm("B").size)
      val row = Association.cuped(rows.toDF("arm", "y", "x"), Nil, "arm", "y", "x")
        .collect()(0)
      approx(row.getAs[Double]("theta"), theta, s"cuped theta trial $t")
      approx(row.getAs[Double]("effect_cuped"), adjNaive, s"cuped effect trial $t")
      approx(row.getAs[Double]("se_cuped"), seNaive, s"cuped se trial $t")
      approx(row.getAs[Double]("rho2"), cov * cov / (varx * vary), s"cuped rho2 trial $t")
    }
  }

  test("fuzz: cupedMulti theta vector, adjusted effect, se and R2 vs a naive normal-equations solve") {
    import graft.quality.Association
    for (t <- 1 to Trials) {
      val r = rng("cupedmulti", t)
      val rows = (0 until 40 + r.nextInt(60)).map { _ =>
        val x1 = r.nextInt(20).toLong
        val x2 = r.nextInt(12).toLong
        val arm = if (r.nextBoolean()) "A" else "B"
        val y = x1 + 2L * x2 + r.nextInt(10).toLong + (if (arm == "A") 3L else 0L)
        (arm, y, x1, x2)
      }
      val n = rows.size.toDouble
      def mean(f: ((String, Long, Long, Long)) => Long) = rows.map(f).sum / n
      val (my, m1, m2) = (mean(_._2), mean(_._3), mean(_._4))
      // pooled central moments → naive 2×2 solve
      val a11 = rows.map(p => (p._3 - m1) * (p._3 - m1)).sum
      val a22 = rows.map(p => (p._4 - m2) * (p._4 - m2)).sum
      val a12 = rows.map(p => (p._3 - m1) * (p._4 - m2)).sum
      val b1 = rows.map(p => (p._3 - m1) * (p._2 - my)).sum
      val b2 = rows.map(p => (p._4 - m2) * (p._2 - my)).sum
      val det = a11 * a22 - a12 * a12
      val th1 = (a22 * b1 - a12 * b2) / det
      val th2 = (a11 * b2 - a12 * b1) / det
      def arm(a: String) = rows.filter(_._1 == a)
      def z(p: (String, Long, Long, Long)) = p._2 - th1 * p._3 - th2 * p._4
      def meanZ(a: String) = arm(a).map(z).sum / arm(a).size
      def varZ(a: String) = {
        val zs = arm(a).map(z); val m = zs.sum / zs.size
        zs.map(v => (v - m) * (v - m)).sum / (zs.size - 1)
      }
      val adjNaive = meanZ("A") - meanZ("B")
      val seNaive = math.sqrt(varZ("A") / arm("A").size + varZ("B") / arm("B").size)
      val syy = rows.map(p => (p._2 - my) * (p._2 - my)).sum
      val row = Association.cupedMulti(rows.toDF("arm", "y", "x1", "x2"),
        Nil, "arm", "y", Seq("x1", "x2")).collect()(0)
      approx(row.getAs[Double]("theta1"), th1, s"cupedMulti theta1 trial $t")
      approx(row.getAs[Double]("theta2"), th2, s"cupedMulti theta2 trial $t")
      approx(row.getAs[Double]("effect_cuped"), adjNaive, s"cupedMulti effect trial $t")
      approx(row.getAs[Double]("se_cuped"), seNaive, s"cupedMulti se trial $t")
      approx(row.getAs[Double]("rho2"), (th1 * b1 + th2 * b2) / syy,
        s"cupedMulti rho2 trial $t")
    }
  }

  // --- mSPRT ------------------------------------------------------------------------

  test("fuzz: mSPRT lnLR / always-valid p vs the direct mixture-likelihood computation") {
    import graft.quality.SequentialTests
    val tau2 = 0.01
    for (t <- 1 to Trials) {
      val r = rng("msprt", t)
      val peeks = 5 + r.nextInt(8)
      val incr = (0 until peeks).map { p =>
        val n1 = 5 + r.nextInt(30); val n2 = 5 + r.nextInt(30)
        (p.toLong, n1.toLong, r.nextInt(n1 + 1).toLong, n2.toLong, r.nextInt(n2 + 1).toLong)
      }
      var cn1 = 0L; var cs1 = 0L; var cn2 = 0L; var cs2 = 0L
      var best = Option.empty[Double]
      val expect = incr.map { case (p, n1, s1, n2, s2) =>
        cn1 += n1; cs1 += s1; cn2 += n2; cs2 += s2
        val pp = (cs1 + cs2).toDouble / (cn1 + cn2)
        val usable = cn1 > 0 && cn2 > 0 && (cs1 + cs2) > 0 && (cs1 + cs2) < (cn1 + cn2)
        val ln = if (!usable) None else {
          val delta = cs1.toDouble / cn1 - cs2.toDouble / cn2
          val v = pp * (1 - pp) * (1.0 / cn1 + 1.0 / cn2)
          Some(0.5 * math.log(v / (v + tau2)) + delta * delta * tau2 / (2 * v * (v + tau2)))
        }
        best = (best.toSeq ++ ln.toSeq).reduceOption((a: Double, b: Double) => math.max(a, b))
        val pav = best match {
          case Some(b) if b > 0 => math.exp(-b)
          case _ => 1.0
        }
        (p, ln, pav)
      }
      val got = SequentialTests.msprtTwoProportion(
        incr.toDF("pk", "n1", "s1", "n2", "s2"), Nil, "pk",
        "n1", "s1", "n2", "s2", tau2, alpha = 0.05).orderBy("peek").collect()
      for (((p, ln, pav), row) <- expect.zip(got)) {
        assert(row.getAs[Long]("peek") === p)
        val gotLn = if (row.isNullAt(row.fieldIndex("ln_lr9"))) None
          else Some(row.getAs[Long]("ln_lr9").toDouble / 1e9)
        approxOpt(gotLn, ln, s"msprt lnLR peek $p trial $t")
        approx(row.getAs[Double]("p_always_valid"), pav, s"msprt p peek $p trial $t")
      }
    }
  }

  // --- Anderson–Darling ---------------------------------------------------

  test("fuzz: Anderson-Darling vs the per-sample Scholz-Stephens loop") {
    // the operator rides the shared gap identity (both samples' terms
    // collapse onto gap_num); the naive here runs the PUBLISHED per-sample
    // double loop — a genuinely different formulation
    for (t <- 1 to Trials) {
      val r = rng("ad", t)
      val span = 2 + r.nextInt(10)
      val base = Seq.fill(10 + r.nextInt(50))(r.nextInt(span).toLong)
      val cur = Seq.fill(10 + r.nextInt(50))(r.nextInt(span).toLong)
      val bN = base.size.toDouble; val cN = cur.size.toDouble
      val n = bN + cN
      val zs = (base ++ cur).distinct.sorted
      var acc = 0.0
      for (z <- zs) {
        val lj = (base ++ cur).count(_ == z).toDouble
        val bj = (base ++ cur).count(_ <= z).toDouble
        if (bj < n) {
          val mB = base.count(_ <= z).toDouble
          val mC = cur.count(_ <= z).toDouble
          acc += lj / n * (n * mB - bN * bj) * (n * mB - bN * bj) / (bj * (n - bj)) / bN
          acc += lj / n * (n * mC - cN * bj) * (n * mC - cN * bj) / (bj * (n - bj)) / cN
        }
      }
      val got = Profiler.andersonDarling(Profiler.cvmFromHistograms(
        base.groupBy(identity).toSeq.map { case (v, xs) => (v, xs.size.toLong) }
          .toDF("bucket", "cnt"),
        cur.groupBy(identity).toSeq.map { case (v, xs) => (v, xs.size.toLong) }
          .toDF("bucket", "cnt"))).collect()(0)
      approx(got.getAs[Double]("a2"), acc, s"ad trial $t")
    }
  }

  // --- Sequential SRM (one-sample mSPRT) -------------------------------------

  test("fuzz: one-sample mSPRT vs the naive cumulative-recursion loop") {
    import graft.quality.SequentialTests
    val t2 = 0.0625
    for (t <- 1 to Trials) {
      val r = rng("srm1", t)
      val p0 = Seq(0.3, 0.5, 0.7)(r.nextInt(3))
      val peeks = 2 + r.nextInt(8)
      val incr = (1 to peeks).map { p =>
        val n = 5L + r.nextInt(200)
        (p.toLong, n, r.nextInt(n.toInt + 1).toLong)
      }
      var cn = 0L; var cs = 0L; var best = Long.MinValue
      val expect = incr.map { case (_, dn, ds) =>
        cn += dn; cs += ds
        val d = cs.toDouble / cn - p0
        val v = p0 * (1 - p0) / cn
        val ln = math.round((0.5 * math.log(v / (v + t2)) +
          d * d * t2 / (2 * v * (v + t2))) * 1e9)
        best = math.max(best, ln)
        val pav = if (best <= 0) 1.0 else math.exp(-best.toDouble / 1e9)
        (ln, pav, best >= math.round(math.log(20.0) * 1e9))
      }
      val got = SequentialTests.msprtOneProportion(
        incr.toDF("peek", "n", "s"), Nil, "peek", "n", "s", p0, t2)
        .orderBy("peek").collect()
      for (((ln, pav, rej), row) <- expect.zip(got)) {
        assert(row.getAs[Long]("ln_lr9") === ln, s"srm1 ln trial $t")
        approx(row.getAs[Double]("p_always_valid"), pav, s"srm1 p trial $t")
        assert(row.getAs[Boolean]("reject") === rej, s"srm1 rej trial $t")
      }
    }
  }

  // --- Rate ratio + DiD --------------------------------------------------------

  test("fuzz: rateRatio and diffInDiff vs the naive closed forms") {
    for (t <- 1 to Trials) {
      val r = rng("rrdid", t)
      val (c1, t1) = (1L + r.nextInt(500), 1L + r.nextInt(1000))
      val (c2, t2) = (1L + r.nextInt(500), 1L + r.nextInt(1000))
      val got = Association.rateRatioFromCounts(
        Seq(("A", c1, t1), ("B", c2, t2)).toDF("grp", "events", "exposure"),
        Nil).collect()(0)
      val rr = (c1.toDouble / t1) / (c2.toDouble / t2)
      val se = math.sqrt(1.0 / c1 + 1.0 / c2)
      approx(got.getAs[Double]("rate_ratio"), rr, s"rr trial $t")
      approx(got.getAs[Double]("ci_lo"),
        math.exp(math.log(rr) - 1.959964 * se), s"rr ci trial $t")
      // DiD: 4 random cells, ≥2 values each
      def cellVals() = Seq.fill(2 + r.nextInt(20))(r.nextInt(40).toLong)
      val cp = cellVals(); val cq = cellVals(); val tp = cellVals(); val tq = cellVals()
      val rows = cp.map(("c", "a_pre", _)) ++ cq.map(("c", "b_post", _)) ++
        tp.map(("t", "a_pre", _)) ++ tq.map(("t", "b_post", _))
      val gd = Association.diffInDiff(rows.toDF("g0", "p0", "y"),
        Nil, "g0", "p0", "y").collect()(0)
      def m(v: Seq[Long]) = v.sum.toDouble / v.size
      def vn(v: Seq[Long]) = {
        val n = v.size.toDouble
        (n * v.map(x => x.toDouble * x).sum -
          math.pow(v.map(_.toDouble).sum, 2)) / (n * n * (n - 1))
      }
      approx(gd.getAs[Double]("did"), (m(tq) - m(tp)) - (m(cq) - m(cp)), s"did trial $t")
      approx(gd.getAs[Double]("se_did"),
        math.sqrt(vn(tq) + vn(tp) + vn(cq) + vn(cp)), s"did se trial $t")
    }
  }

  // --- Empirical-Bayes shrinkage -----------------------------------------------

  test("fuzz: ebShrinkRates vs the naive method-of-moments loop") {
    for (t <- 1 to Trials) {
      val r = rng("eb", t)
      val k = 3 + r.nextInt(10)
      val segs = (0 until k).map { i =>
        val n = 2L + r.nextInt(300)
        (f"s$i%02d", n, r.nextInt(n.toInt + 1).toLong)
      }
      val got = Association.ebShrinkRatesFromCounts(
        segs.toDF("grp", "n", "n_pass"), Nil).orderBy("grp").collect()
      val ps = segs.map { case (_, n, s) => s.toDouble / n }
      val m1 = ps.sum / k
      val v = ps.map(x => x * x).sum / k - m1 * m1
      if (v > 0 && m1 * (1 - m1) > v) {
        val ab = (m1 * (1 - m1) - v) / v
        val alpha = m1 * ab
        for ((row, (_, n, s)) <- got.zip(segs)) {
          approx(row.getAs[Double]("alpha"), alpha, s"eb alpha trial $t")
          approx(row.getAs[Double]("p_shrunk"),
            (s + alpha) / (n + ab), s"eb shrunk trial $t")
        }
      } else got.foreach(row =>
        assert(row.isNullAt(row.fieldIndex("p_shrunk")), s"eb null trial $t"))
    }
  }

  // --- Meta-analysis panel ----------------------------------------------------

  test("fuzz: metaAnalysis vs the naive inverse-variance loop") {
    for (t <- 1 to Trials) {
      val r = rng("meta", t)
      val k = 2 + r.nextInt(8)
      val strata = (0 until k).map { i =>
        (f"s$i%02d", r.nextDouble() * 4 - 2, 0.05 + r.nextDouble() * 2)
      }
      val got = Association.metaAnalysis(
        strata.toDF("st", "e", "se"), Nil, "st", "e", "se").collect()(0)
      val ws = strata.map { case (_, _, se) => 1.0 / (se * se) }
      val sw = ws.sum
      val swe = strata.zip(ws).map { case ((_, e, _), w) => w * e }.sum
      val swe2 = strata.zip(ws).map { case ((_, e, _), w) => w * e * e }.sum
      val sww = ws.map(w => w * w).sum
      val q = swe2 - swe * swe / sw
      val dfq = k - 1.0
      val i2 = if (q > dfq) (q - dfq) / q else 0.0
      val tau2 = if (q > dfq && sw - sww / sw > 0) (q - dfq) / (sw - sww / sw) else 0.0
      val wr = strata.map { case (_, _, se) => 1.0 / (se * se + tau2) }
      val effR = strata.zip(wr).map { case ((_, e, _), w) => w * e }.sum / wr.sum
      approx(got.getAs[Double]("effect_fixed"), swe / sw, s"meta ef trial $t")
      approx(got.getAs[Double]("q"), q, s"meta q trial $t")
      approx(got.getAs[Double]("i2"), i2, s"meta i2 trial $t")
      approx(got.getAs[Double]("tau2_dl"), tau2, s"meta tau2 trial $t")
      approx(got.getAs[Double]("effect_random"), effR, s"meta er trial $t")
      approx(got.getAs[Double]("se_random"), math.sqrt(1.0 / wr.sum), s"meta ser trial $t")
    }
  }

  // --- Power / MDE panel ----------------------------------------------------

  test("fuzz: power/MDE panels vs the naive closed-form arithmetic") {
    val zA = 1.959964; val zB = 0.841621
    for (t <- 1 to Trials) {
      val r = rng("pw", t)
      val n1 = 2L + r.nextInt(500); val n2 = 2L + r.nextInt(500)
      val s1 = 1L + r.nextInt(n1.toInt); val s2 = r.nextInt(n2.toInt).toLong
      val tgt = 0.01 + r.nextDouble() * 0.3
      val got = Association.powerTwoProportionFromCounts(
        Seq(("A", n1, math.min(s1, n1 - 1)), ("B", n2, s2))
          .toDF("grp", "n", "n_pass"), Nil, targetMde = tgt).collect()(0)
      val pp = (math.min(s1, n1 - 1) + s2).toDouble / (n1 + n2)
      if (pp > 0d && pp < 1d) {
        val mde = (zA + zB) * math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
        approx(got.getAs[Double]("mde_abs"), mde, s"pw mde trial $t")
        assert(got.getAs[Long]("n_required_per_arm") ===
          math.ceil(2 * (pp * (1 - pp)) * ((zA + zB) * (zA + zB)) / (tgt * tgt)).toLong,
          s"pw nreq trial $t")
      } else assert(got.isNullAt(got.fieldIndex("mde_abs")), s"pw null trial $t")
      // mean panel on random integer outcomes
      val ys1 = Seq.fill(2 + r.nextInt(40))(r.nextInt(30).toLong)
      val ys2 = Seq.fill(2 + r.nextInt(40))(r.nextInt(30).toLong)
      val rows = (ys1.map("A" -> _) ++ ys2.map("B" -> _)).toDF("arm", "v")
      val gm = Association.powerMean(rows, Nil, "arm", "v", targetMde = tgt)
        .collect()(0)
      def vOf(ys: Seq[Long]) = {
        val n = ys.size.toDouble
        (n * ys.map(y => y.toDouble * y).sum - math.pow(ys.map(_.toDouble).sum, 2)) / n
      }
      val sig2 = (vOf(ys1) + vOf(ys2)) / (ys1.size + ys2.size - 2).toDouble
      if (sig2 > 0d) {
        val mde = (zA + zB) * math.sqrt(sig2 * (1.0 / ys1.size + 1.0 / ys2.size))
        approx(gm.getAs[Double]("mde_abs"), mde, s"pw mean mde trial $t")
        assert(gm.getAs[Long]("n_required_per_arm") ===
          math.ceil(2 * sig2 * ((zA + zB) * (zA + zB)) / (tgt * tgt)).toLong,
          s"pw mean nreq trial $t")
      } else assert(gm.isNullAt(gm.fieldIndex("mde_abs")), s"pw mean null trial $t")
    }
  }

  // --- delta-method ratio ---------------------------------------------------

  test("fuzz: deltaRatio vs two-pass centered moments") {
    for (t <- 1 to Trials) {
      val r = rng("dratio", t)
      val mk = () => Seq.fill(5 + r.nextInt(40))(
        (r.nextInt(20).toLong, 1L + r.nextInt(30).toLong))
      val a = mk(); val b = mk()
      def armStats(u: Seq[(Long, Long)]): (Double, Double) = {
        val nn = u.size.toDouble
        val sx = u.map(_._1).sum.toDouble; val sy = u.map(_._2).sum.toDouble
        val ratio = sx / sy
        val mx = sx / nn; val my = sy / nn
        val vx = u.map(p => (p._1 - mx) * (p._1 - mx)).sum / (nn - 1)
        val vy = u.map(p => (p._2 - my) * (p._2 - my)).sum / (nn - 1)
        val cxy = u.map(p => (p._1 - mx) * (p._2 - my)).sum / (nn - 1)
        val v = (vx - 2 * ratio * cxy + ratio * ratio * vy) / (nn * my * my)
        (ratio, v)
      }
      val (r1, v1) = armStats(a); val (r2, v2) = armStats(b)
      val df = (a.map(p => ("a", p._1, p._2)) ++ b.map(p => ("b", p._1, p._2)))
        .toDF("arm", "x", "y")
      val row = Association.deltaRatio(df, Nil, "arm", "x", "y").collect()(0)
      approx(row.getAs[Double]("ratio_lo"), r1, s"dratio r1 trial $t")
      approx(row.getAs[Double]("ratio_hi"), r2, s"dratio r2 trial $t")
      approx(row.getAs[Double]("effect"), r1 - r2, s"dratio eff trial $t")
      approx(row.getAs[Double]("se"), math.sqrt(v1 + v2), s"dratio se trial $t")
    }
  }

  // --- SRM --------------------------------------------------------------------

  test("fuzz: srmCheck vs the direct goodness-of-fit sum on skewed splits") {
    for (t <- 1 to Trials) {
      val r = rng("srm", t)
      val k = 2 + r.nextInt(4)
      val w = Seq.tabulate(k)(i => s"a$i" -> (1.0 + r.nextInt(5)))
      val wTot = w.map(_._2).sum
      val counts = Seq.tabulate(k)(i => r.nextInt(200))
      val nTot = counts.sum.toDouble
      val naive = w.zip(counts).map { case ((_, wi), ni) =>
        val e = nTot * (wi / wTot)
        math.round((ni - e) * (ni - e) / e * 1e9).toDouble / 1e9
      }.sum
      val rows = w.zip(counts).flatMap { case ((arm, _), ni) => Seq.fill(ni)(arm) }
      val row = Association.srmCheck(rows.toDF("arm"), Nil, "arm", w).collect()(0)
      assert(row.getAs[Long]("n_total") === nTot.toLong)
      approx(row.getAs[Double]("chi2"), naive, s"srm trial $t")
    }
  }

  // --- Cochran's Q ---------------------------------------------------------

  test("fuzz: cochranQ vs the published row/column-total formula") {
    for (t <- 1 to Trials) {
      val r = rng("cochran", t)
      val k = 2 + r.nextInt(4)
      val units = Seq.tabulate(8 + r.nextInt(40))(u =>
        s"u$u" -> Seq.fill(k)(r.nextInt(2)))
      val cj = Seq.tabulate(k)(j => units.map(_._2(j)).sum.toDouble)
      val ri = units.map(_._2.sum.toDouble)
      val tT = ri.sum
      val qd = k * tT - ri.map(x => x * x).sum
      val naive = if (qd > 0)
        Some((k - 1) * (k * cj.map(x => x * x).sum - tT * tT) / qd) else None
      val df = units.flatMap { case (u, ys) =>
        ys.zipWithIndex.map { case (y, j) => (u, s"t$j", y) }
      }.toDF("u", "t", "y")
      val out = Association.cochranQ(df, "u", "t", "y").collect()
      assert(out.length === k)
      approxOpt(optDouble(out(0), "q"), naive, s"cochran trial $t")
    }
  }

  // --- Jonckheere–Terpstra -----------------------------------------------------

  test("fuzz: Jonckheere-Terpstra vs the naive ordered-pair loop") {
    for (t <- 1 to Trials) {
      val r = rng("jt", t)
      val k = 2 + r.nextInt(4)
      val span = 2 + r.nextInt(10) // heavy ties
      val data = (0 until 15 + r.nextInt(60)).map { _ =>
        ("g" + r.nextInt(k), r.nextInt(span).toLong)
      }
      val groups = data.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
      var j = 0.0
      for (i <- groups.indices; l <- (i + 1) until groups.size;
           x <- groups(i); y <- groups(l)) {
        if (x < y) j += 1.0 else if (x == y) j += 0.5
      }
      val ns = groups.map(_.size.toDouble)
      val nT = ns.sum
      val ej = (nT * nT - ns.map(x => x * x).sum) / 4.0
      val ties = data.map(_._2).groupBy(identity).values.map(_.size.toDouble)
      def p125(x: Double) = x * (x - 1) * (2 * x + 5)
      val v1 = (p125(nT) - ns.map(p125).sum - ties.map(p125).sum) / 72.0
      val v2 = ns.map(x => x * (x - 1) * (x - 2)).sum *
        ties.map(x => x * (x - 1) * (x - 2)).sum /
        (36.0 * nT * (nT - 1) * (nT - 2))
      val v3 = ns.map(x => x * (x - 1)).sum * ties.map(x => x * (x - 1)).sum /
        (8.0 * nT * (nT - 1))
      val varJ = v1 + v2 + v3
      val naive = if (varJ > 0) Some((j - ej) / math.sqrt(varJ)) else None
      val row = Association.jonckheereTerpstra(
        data.toDF("g", "v"), Nil, "g", "v").collect()(0)
      assert(row.getAs[String]("j2").toDouble === 2 * j, s"jt J trial $t")
      approxOpt(optDouble(row, "z"), naive, s"jt z trial $t")
    }
  }

  // --- calibration -------------------------------------------------------

  test("fuzz: ECE/Brier decomposition/HL vs the naive binned loop + the Murphy identity") {
    import graft.operators.RankEval
    for (t <- 1 to Trials) {
      val r = rng("calib", t)
      val nB = 4 + r.nextInt(8)
      val rows = Seq.fill(30 + r.nextInt(100))(
        (r.nextDouble(), r.nextInt(2) == 1))
      // naive: replicate the binning, then the published formulas
      val binned = rows.groupBy { case (s, _) =>
        if (s < 0) -1L else if (s >= 1) nB.toLong else math.floor(s * nB).toLong
      }
      val n = rows.size.toDouble
      val p = rows.count(_._2).toDouble
      val cells = binned.map { case (_, xs) =>
        val nb = xs.size.toDouble
        val np = xs.count(_._2).toDouble
        // the operator nano-lands each score before summing
        val s9 = xs.map(x => math.round(x._1 * 1e9)).sum.toDouble
        (nb, np, s9 / 1e9)
      }.toSeq
      val ece = cells.map { case (nb, np, s) => math.abs(np - s) }.sum / n
      val mce = cells.map { case (nb, np, s) => math.abs(np - s) / nb }.max
      val rel = cells.map { case (nb, np, s) =>
        (np - s) * (np - s) / nb }.sum / n
      val res = cells.map { case (nb, np, _) =>
        nb * (np / nb - p / n) * (np / nb - p / n) }.sum / n
      val unc = p / n * (1 - p / n)
      // HL on the same cells
      val usable = cells.filter { case (nb, _, s) => s > 0 && s < nb }
      val hl = if (usable.size >= 3)
        Some(usable.map { case (nb, np, s) =>
          (np - s) * (np - s) * nb / (s * (nb - s)) }.sum) else None
      val preds = rows.zipWithIndex.map { case ((s, _), i) => (i.toLong, s) }
        .toDF("id", "score")
      val labels = rows.zipWithIndex.map { case ((_, y), i) => (i.toLong, y) }
        .toDF("id", "label")
      val cellsDf = RankEval.calibrationCells(preds, labels, "id", "score",
        "label", nB)
      val e = RankEval.expectedCalibrationError(cellsDf).collect()(0)
      approx(e.getAs[Double]("ece"), ece, s"calib ece trial $t")
      approx(e.getAs[Double]("mce"), mce, s"calib mce trial $t")
      approx(e.getAs[Double]("brier_rel"), rel, s"calib rel trial $t")
      approx(e.getAs[Double]("brier_res"), res, s"calib res trial $t")
      approx(e.getAs[Double]("brier_unc"), unc, s"calib unc trial $t")
      // the Murphy identity: REL − RES + UNC == the Brier score of
      // predicting each bucket's mean confidence — an independent route
      val brierDirect = cells.map { case (nb, np, s) =>
        val conf = s / nb
        np * (conf - 1) * (conf - 1) + (nb - np) * conf * conf
      }.sum / n
      approx(e.getAs[Double]("brier_binned"), brierDirect, s"calib murphy trial $t")
      val h = RankEval.hosmerLemeshow(cellsDf).collect()(0)
      approxOpt(optDouble(h, "chi2"), hl, s"calib hl trial $t")
    }
  }

  // --- Harrell's C ---------------------------------------------------------

  test("fuzz: Harrell's C vs the naive pair loop, plus the score-flip symmetry") {
    import graft.operators.Survival
    for (t <- 1 to Trials) {
      val r = rng("cindex", t)
      val subs = Seq.fill(15 + r.nextInt(60))(
        (r.nextInt(8).toLong, 1L + r.nextInt(12).toLong, r.nextInt(2).toLong))
      var conc = 0L; var disc = 0L; var tied = 0L
      for ((si, ti, ei) <- subs if ei == 1L; (sj, tj, ej) <- subs) {
        val outlives = tj > ti || (tj == ti && ej == 0L)
        if (outlives) {
          if (si > sj) conc += 1 else if (si == sj) tied += 1 else disc += 1
        }
      }
      val cNaive = if (conc + disc + tied > 0)
        Some((2.0 * conc + tied) / (2.0 * (conc + disc + tied))) else None
      val df = subs.toDF("risk", "dur", "ev")
      val row = Survival.concordance(df, Nil, "risk", "dur", "ev").collect()(0)
      assert(row.getAs[String]("concordant").toLong === conc, s"cidx conc trial $t")
      assert(row.getAs[String]("discordant").toLong === disc, s"cidx disc trial $t")
      assert(row.getAs[String]("tied_score").toLong === tied, s"cidx tied trial $t")
      approxOpt(optDouble(row, "c_index"), cNaive, s"cidx C trial $t")
      // flipping the score's sign swaps conc/disc: C' = 1 − C exactly
      val flipped = Survival.concordance(
        df.withColumn("risk", -col("risk")), Nil, "risk", "dur", "ev").collect()(0)
      (optDouble(row, "c_index"), optDouble(flipped, "c_index")) match {
        case (Some(a), Some(b)) => approx(b, 1.0 - a, s"cidx flip trial $t")
        case (None, None)       => ()
        case other => fail(s"cidx flip null mismatch: $other trial $t")
      }
    }
  }

  // --- always-valid CI ------------------------------------------------------

  test("fuzz: always-valid CI duality — 0 outside CI exactly when the peek's mSPRT lnLR clears the boundary") {
    import graft.quality.SequentialTests
    val tau2 = 0.5
    val bound = math.log(1 / 0.05)
    for (t <- 1 to Trials) {
      val r = rng("avci", t)
      val incr = (0 until 6).map { p =>
        val mk = () => Seq.fill(3 + r.nextInt(12))(r.nextInt(10).toLong)
        val a = mk(); val b = mk()
        (p.toLong, a.size.toLong, a.sum, a.map(x => x * x).sum,
          b.size.toLong, b.sum, b.map(x => x * x).sum)
      }
      val df = incr.toDF("peek", "n1", "s1", "q1", "n2", "s2", "q2")
      val ci = SequentialTests.alwaysValidCiMean(df, Nil, "peek",
        "n1", "s1", "q1", "n2", "s2", "q2", tau2, alpha = 0.05)
        .orderBy("peek").collect()
      val ms = SequentialTests.msprtMean(df, Nil, "peek",
        "n1", "s1", "q1", "n2", "s2", "q2", tau2, alpha = 0.05)
        .orderBy("peek").collect()
      for ((c, m) <- ci.zip(ms)) {
        (optDouble(c, "ci_lo"), optDouble(c, "ci_hi")) match {
          case (Some(lo), Some(hi)) =>
            val lnLr = m.getAs[Long]("ln_lr9").toDouble / 1e9
            val excludes0 = lo > 0 || hi < 0
            // skip the knife-edge (nano rounding owns the boundary)
            if (math.abs(lnLr - bound) > 1e-6)
              assert(excludes0 === (lnLr > bound),
                s"avci duality peek ${c.getAs[Long]("peek")} trial $t: " +
                  s"lnLr=$lnLr bound=$bound ci=[$lo,$hi]")
          case _ => ()
        }
      }
    }
  }

  // --- Cochran–Armitage -----------------------------------------------------

  test("fuzz: Cochran-Armitage vs the direct trend formula") {
    for (t <- 1 to Trials) {
      val r = rng("ca", t)
      val k = 2 + r.nextInt(4)
      val data = (0 until 20 + r.nextInt(80)).map { _ =>
        ("g" + r.nextInt(k), r.nextInt(2) == 1)
      }
      val byG = data.groupBy(_._1).toSeq.sortBy(_._1)
      val n = byG.map(_._2.size.toDouble)
      val rr = byG.map(_._2.count(_._2).toDouble)
      val w = byG.indices.map(i => (i + 1).toDouble)
      val nT = n.sum; val rT = rr.sum
      val wn = w.zip(n).map { case (a, b) => a * b }.sum
      val wr = w.zip(rr).map { case (a, b) => a * b }.sum
      val wwn = w.zip(n).map { case (a, b) => a * a * b }.sum
      val num = nT * wr - rT * wn
      val varNum = rT * (nT - rT) * (nT * wwn - wn * wn)
      val naive = if (rT > 0 && rT < nT && varNum > 0)
        Some(num / math.sqrt(varNum / nT)) else None
      val row = Association.cochranArmitage(data.toDF("g", "hit"), Nil, "g", "hit")
        .collect()(0)
      assert(row.getAs[String]("trend_num").toDouble === num, s"ca num trial $t")
      approxOpt(optDouble(row, "z"), naive, s"ca z trial $t")
    }
  }

  // --- Fleming–Harrington ------------------------------------------------------

  test("fuzz: Fleming-Harrington G(rho,gamma) vs the naive pooled-KM weighted loop") {
    import graft.operators.Survival
    for (t <- 1 to Trials) {
      val r = rng("fh", t)
      val rho = r.nextInt(2); val gamma = r.nextInt(2)
      val subs = Seq.fill(25 + r.nextInt(60))(
        (if (r.nextInt(2) == 0) "a" else "b",
          1L + r.nextInt(8).toLong, r.nextInt(2).toLong))
      // naive: sorted pooled times, KM left limit, hypergeometric terms
      val times = subs.map(_._2).distinct.sorted
      var s = 1.0
      var num = 0.0; var vv = 0.0
      for (tt <- times) {
        val at = subs.filter(_._2 >= tt)
        val n1 = at.count(x => x._1 == "a" && true).toDouble
        val n2 = at.count(_._1 == "b").toDouble
        val nn = n1 + n2
        val d1 = subs.count(x => x._1 == "a" && x._2 == tt && x._3 == 1L).toDouble
        val d2 = subs.count(x => x._1 == "b" && x._2 == tt && x._3 == 1L).toDouble
        val d = d1 + d2
        val wgt = math.pow(s, rho) * math.pow(1 - s, gamma)
        if (d > 0) {
          num += wgt * (d1 - d * n1 / nn)
          if (nn > 1)
            vv += wgt * wgt * (d * (n1 / nn) * (n2 / nn) * (nn - d) / (nn - 1))
          if (d < nn) s *= (nn - d) / nn else s = 0.0
        }
      }
      val naive = if (vv > 0) Some(num / math.sqrt(vv)) else None
      val row = Survival.logRankWeighted(
        subs.toDF("cohort", "dur", "ev"), Nil, "cohort", "dur", "ev", rho, gamma)
        .collect()(0)
      approxOpt(optDouble(row, "z"), naive, s"fh z trial $t (rho=$rho gamma=$gamma)")
    }
  }

  // --- Brunner–Munzel / Mood -----------------------------------------------

  test("fuzz: Brunner-Munzel vs the per-observation midrank formula") {
    for (t <- 1 to Trials) {
      val r = rng("bm", t)
      val span = 2 + r.nextInt(10)
      val mk = () => Seq.fill(8 + r.nextInt(40))(r.nextInt(span).toLong)
      val a = mk(); val b = mk()
      val all = a ++ b
      val pooled = midranks(all)
      val inA = midranks(a); val inB = midranks(b)
      val n1 = a.size.toDouble; val n2 = b.size.toDouble
      val rb1 = a.map(pooled).sum / n1
      val rb2 = b.map(pooled).sum / n2
      def s2(vs: Seq[Long], own: Map[Long, Double], rb: Double, n: Double) =
        vs.map(v => math.pow(pooled(v) - own(v) - rb + (n + 1) / 2, 2)).sum / (n - 1)
      val sa = s2(a, inA, rb1, n1); val sb = s2(b, inB, rb2, n2)
      val pooledVar = n1 * sa + n2 * sb
      val naive =
        if (pooledVar > 0)
          Some((rb2 - rb1) * n1 * n2 / ((n1 + n2) * math.sqrt(pooledVar)))
        else None
      val dfNaive =
        if (pooledVar > 0)
          Some(pooledVar * pooledVar /
            (math.pow(n1 * sa, 2) / (n1 - 1) + math.pow(n2 * sb, 2) / (n2 - 1)))
        else None
      val pNaive = (rb2 - (n2 + 1) / 2) / n1
      val row = Association.brunnerMunzel(
        (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v"), Nil, "g", "v")
        .collect()(0)
      approx(row.getAs[Double]("p_hat"), pNaive, s"bm p_hat trial $t")
      approxOpt(optDouble(row, "bm"), naive, s"bm stat trial $t")
      approxOpt(optDouble(row, "df"), dfNaive, s"bm df trial $t")
    }
  }

  test("fuzz: Mood's median vs the naive dichotomize-and-chi2 loop") {
    for (t <- 1 to Trials) {
      val r = rng("mood", t)
      val k = 2 + r.nextInt(4)
      val span = 3 + r.nextInt(10)
      val data = (0 until 20 + r.nextInt(60)).map { _ =>
        ("g" + r.nextInt(k), r.nextInt(span).toLong)
      }
      val sortedVals = data.map(_._2).sorted
      val n = sortedVals.size
      // lower median: smallest v with 2·cum >= N
      val median = sortedVals.zipWithIndex
        .collectFirst { case (v, i) if 2 * (i + 1) >= n => v }.get
      val byG = data.groupBy(_._1)
      val aT = data.count(_._2 > median).toDouble
      val naive = if (aT > 0 && aT < n) Some(byG.values.map { vs =>
        val ng = vs.size.toDouble
        val above = vs.count(_._2 > median).toDouble
        val e1 = ng * aT / n; val e0 = ng * (n - aT) / n
        math.pow(above - e1, 2) / e1 + math.pow(ng - above - e0, 2) / e0
      }.sum) else None
      val out = Association.moodMedian(data.toDF("g", "v"), Nil, "g", "v").collect()
      assert(out.forall(_.getAs[Long]("median") === median), s"mood median trial $t")
      approxOpt(optDouble(out(0), "chi2"), naive, s"mood chi2 trial $t")
    }
  }

  // --- log-rank trend --------------------------------------------------------

  test("fuzz: log-rank trend vs the naive per-time score-moment loop") {
    import graft.operators.Survival
    for (t <- 1 to Trials) {
      val r = rng("lrt", t)
      val k = 2 + r.nextInt(3)
      val subs = Seq.fill(30 + r.nextInt(60))(
        ("g" + r.nextInt(k), 1L + r.nextInt(8).toLong, r.nextInt(2).toLong))
      val labels = subs.map(_._1).distinct.sorted
      val score = labels.zipWithIndex.map { case (l, i) => l -> (i + 1).toDouble }.toMap
      var dev = 0.0; var vv = 0.0
      for (tt <- subs.map(_._2).distinct.sorted) {
        val dT = subs.count(x => x._2 == tt && x._3 == 1L).toDouble
        if (dT > 0) {
          val at = subs.filter(_._2 >= tt)
          val nT = at.size.toDouble
          val cd = labels.map(l =>
            score(l) * subs.count(x => x._1 == l && x._2 == tt && x._3 == 1L)).sum
          val cn = labels.map(l => score(l) * at.count(_._1 == l)).sum
          val ccn = labels.map(l => score(l) * score(l) * at.count(_._1 == l)).sum
          dev += cd - dT * cn / nT
          if (nT > 1)
            vv += dT * (nT - dT) / (nT - 1) * (ccn / nT - (cn / nT) * (cn / nT))
        }
      }
      val naive = if (vv > 0) Some(dev / math.sqrt(vv)) else None
      val row = Survival.logRankTrend(
        subs.toDF("cohort", "dur", "ev"), Nil, "cohort", "dur", "ev").collect()(0)
      approxOpt(optDouble(row, "z"), naive, s"lrt z trial $t")
    }
  }

  // --- two-prop always-valid CI -----------------------------------------------

  test("fuzz: two-prop always-valid CI duality with msprtTwoProportion per peek") {
    import graft.quality.SequentialTests
    val tau2 = 0.000244140625
    val bound = math.log(1 / 0.05)
    for (t <- 1 to Trials) {
      val r = rng("avci2", t)
      val incr = (0 until 6).map { p =>
        val n1 = 5L + r.nextInt(40); val n2 = 5L + r.nextInt(40)
        (p.toLong, n1, r.nextInt(n1.toInt + 1).toLong,
          n2, r.nextInt(n2.toInt + 1).toLong)
      }
      val df = incr.toDF("peek", "n1", "s1", "n2", "s2")
      val ci = SequentialTests.alwaysValidCiTwoProportion(df, Nil, "peek",
        "n1", "s1", "n2", "s2", tau2, 0.05).orderBy("peek").collect()
      val ms = SequentialTests.msprtTwoProportion(df, Nil, "peek",
        "n1", "s1", "n2", "s2", tau2, 0.05).orderBy("peek").collect()
      for ((c, m) <- ci.zip(ms)) {
        (optDouble(c, "ci_lo"), optDouble(c, "ci_hi")) match {
          case (Some(lo), Some(hi)) =>
            val lnLr = m.getAs[Long]("ln_lr9").toDouble / 1e9
            if (math.abs(lnLr - bound) > 1e-6)
              assert((lo > 0 || hi < 0) === (lnLr > bound),
                s"avci2 duality peek ${c.getAs[Long]("peek")} trial $t")
          case _ => ()
        }
      }
    }
  }

  // --- Wilson / ICC ------------------------------------------------------------

  test("fuzz: Wilson interval vs the direct closed form") {
    val z = 1.959964; val z2 = z * z
    for (t <- 1 to Trials) {
      val r = rng("wilson", t)
      val n = 1 + r.nextInt(200)
      val s = r.nextInt(n + 1)
      val rows = Seq.fill(s)(("g", true)) ++ Seq.fill(n - s)(("g", false))
      val p = s.toDouble / n
      val dn = 1 + z2 / n
      val center = (p + z2 / (2.0 * n)) / dn
      val half = z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)) / dn
      val row = Association.wilsonInterval(rows.toDF("g", "hit"), Nil, "g", "hit")
        .collect()(0)
      approx(row.getAs[Double]("ci_lo"), center - half, s"wilson lo trial $t")
      approx(row.getAs[Double]("ci_hi"), center + half, s"wilson hi trial $t")
    }
  }

  test("fuzz: ICC/deff vs the naive one-way ANOVA loop") {
    for (t <- 1 to Trials) {
      val r = rng("icc", t)
      val k = 2 + r.nextInt(10)
      val data = (0 until k).flatMap { c =>
        Seq.fill(2 + r.nextInt(8))((s"c$c", r.nextInt(20).toLong))
      }
      val byC = data.groupBy(_._1).values.map(_.map(_._2.toDouble)).toSeq
      val nT = data.size.toDouble
      val grand = data.map(_._2).sum / nT
      val ssb = byC.map(c => c.size * math.pow(c.sum / c.size - grand, 2)).sum
      val ssw = byC.map(c => { val m = c.sum / c.size; c.map(x => (x - m) * (x - m)).sum }).sum
      val msb = ssb / (k - 1)
      val msw = ssw / (nT - k)
      val n0 = (nT - byC.map(c => c.size.toDouble * c.size).sum / nT) / (k - 1)
      val den = msb + (n0 - 1) * msw
      val naive = if (den > 0) Some((msb - msw) / den) else None
      val deffN = naive.map(i => 1 + (nT / k - 1) * i)
      val row = Association.iccDesignEffect(data.toDF("cl", "v"), Nil, "cl", "v")
        .collect()(0)
      approxOpt(optDouble(row, "icc"), naive, s"icc trial $t")
      approxOpt(optDouble(row, "deff"), deffN, s"deff trial $t")
    }
  }

  test("fuzz: Jonckheere-Terpstra at k=2 collapses onto Mann-Whitney's |z|") {
    // J = U and the Kendall-form variance reduces to MW's tie-corrected
    // variance — a formula-level identity neither implementation shares
    for (t <- 1 to Trials) {
      val r = rng("jtmw", t)
      val span = 2 + r.nextInt(8)
      val data = (0 until 12 + r.nextInt(50)).map { _ =>
        ("g" + r.nextInt(2), r.nextInt(span).toLong)
      }
      if (data.map(_._1).distinct.size == 2) {
        val df = data.toDF("g", "v")
        val jt = Association.jonckheereTerpstra(df, Nil, "g", "v").collect()(0)
        val mw = Association.mannWhitney(df, Nil, "g", "v").collect()(0)
        (optDouble(jt, "z"), optDouble(mw, "z")) match {
          case (Some(a), Some(b)) =>
            approx(math.abs(a), math.abs(b), s"jt-mw |z| trial $t")
          case (None, None) => ()
          case other => fail(s"jt-mw null mismatch: $other trial $t")
        }
      }
    }
  }
}
