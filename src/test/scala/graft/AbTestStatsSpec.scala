package graft

import graft.quality.{Association, Profiler}
import org.apache.spark.sql.functions._

/** Goldens + closure invariants for the round-14 A/B-guardrail family:
  * Anderson–Darling (hand-computed 59/36 golden on the shared cvm gap
  * frame — Scholz–Stephens 1987 eq. 6 at k = 2 applied term-by-term,
  * the derivation every reader can replay; zero-drift and empty-side
  * boundaries, fold == rebuild),
  * delta-method ratio CI (a perfectly-proportional arm has EXACTLY zero
  * variance — the property a moments bug breaks first), SRM (exact 4.0
  * golden, zero-traffic designed arm, off-design traffic flag),
  * Cochran's Q (hand 4-unit golden, incomplete-unit drop, the
  * no-discordance NULL boundary), and Jonckheere–Terpstra (hand 2J/E/var
  * golden with ties, the J = 0 boundary, and the k = 2 reduction onto
  * Mann–Whitney's |z|).
  */
class AbTestStatsSpec extends SparkSpec {
  import spark.implicits._

  // --- Anderson–Darling -------------------------------------------------

  private def adOf(base: Seq[(Long, Long)], cur: Seq[(Long, Long)]) =
    Profiler.andersonDarling(Profiler.cvmFromHistograms(
      base.toDF("bucket", "cnt"), cur.toDF("bucket", "cnt"))).collect()(0)

  test("andersonDarling: hand golden {1,1,2} vs {2,3} gives A2 = 59/36") {
    // Scholz–Stephens eq. 6, k = 2: A² = Σ_i (1/n_i) Σ_{j:Bj<N}
    // (l_j/N)·(N·M_ij − n_i·B_j)²/(B_j(N−B_j)); B=3, C=2, N=5.
    //   j=1 (z=1): l=2, Bj=2, M_b=2 M_c=0 → per-sample gaps ±4
    //     term = (2/5)·16/(2·3)·(1/3 + 1/2) = (2/5)·(16/6)·(5/6) = 8/9
    //   j=2 (z=2): l=2, Bj=4, gaps ±3
    //     term = (2/5)·9/(4·1)·(5/6) = 3/4
    //   j=3 (z=3): Bj = N → dropped
    // A² = 8/9 + 3/4 = 59/36 (scipy anderson_ksamp midrank=False agrees)
    val r = adOf(Seq(1L -> 2L, 2L -> 1L), Seq(2L -> 1L, 3L -> 1L))
    assert(r.getAs[Long]("n_base") === 3L)
    assert(r.getAs[Long]("n_cur") === 2L)
    assert(r.getAs[Long]("n_bins") === 3L)
    assert(math.abs(r.getAs[Double]("a2") - 59.0 / 36.0) < 1e-8)
  }

  test("edfDriftCard: one read equals the standalone EDF statistics; verdicts fire correctly") {
    val base = Seq(1L -> 30L, 2L -> 10L, 3L -> 5L)
    val cur = Seq(1L -> 5L, 2L -> 10L, 3L -> 30L) // strong shift
    val cvm = Profiler.cvmFromHistograms(
      base.toDF("bucket", "cnt"), cur.toDF("bucket", "cnt"))
    val card = Profiler.edfDriftCard(cvm).collect()(0)
    // AD column IS the andersonDarling read
    val ad = Profiler.andersonDarling(cvm).collect()(0)
    assert(card.getAs[Double]("a2") === ad.getAs[Double]("a2"))
    // KS = max |gap| / (B·C) from the same frame
    val maxGap = cvm.agg(max(abs(col("gap_num")))).collect()(0)
      .getDecimal(0).doubleValue()
    assert(card.getAs[Double]("ks") === maxGap / (45.0 * 45.0))
    // CvM agrees with the driver-side ordered fold within the nano grain
    val t = Profiler.cvmStat(cvm)
    assert(math.abs(card.getAs[Double]("cvm_t") - t) < 1e-6)
    // a shift this strong trips all three verdicts
    assert(card.getAs[Boolean]("ks_reject"))
    assert(card.getAs[Boolean]("cvm_reject"))
    assert(card.getAs[Boolean]("ad_reject"))
    // identical histograms: all three zero, nothing rejects
    val same = Profiler.edfDriftCard(Profiler.cvmFromHistograms(
      base.toDF("bucket", "cnt"), base.toDF("bucket", "cnt"))).collect()(0)
    assert(same.getAs[Double]("ks") === 0.0d)
    assert(same.getAs[Double]("cvm_t") === 0.0d)
    assert(same.getAs[Double]("a2") === 0.0d)
    assert(!same.getAs[Boolean]("ks_reject") && !same.getAs[Boolean]("cvm_reject") &&
      !same.getAs[Boolean]("ad_reject"))
    // an empty side NULLs every statistic, never crashes
    val empty = Profiler.edfDriftCard(Profiler.cvmFromHistograms(
      base.toDF("bucket", "cnt"), Seq.empty[(Long, Long)].toDF("bucket", "cnt")))
      .collect()(0)
    for (cName <- Seq("ks", "cvm_t", "a2"))
      assert(empty.isNullAt(empty.fieldIndex(cName)), cName)
  }

  test("andersonDarling: identical histograms -> A2 exactly 0") {
    val h = Seq(1L -> 3L, 2L -> 5L, 5L -> 2L)
    val r = adOf(h, h)
    assert(r.getAs[Double]("a2") === 0.0)
  }

  test("andersonDarling: empty side -> NULL A2 (flag, not crash)") {
    val r = adOf(Seq(1L -> 3L), Seq.empty[(Long, Long)])
    assert(r.getAs[Long]("n_base") === 3L)
    assert(r.getAs[Long]("n_cur") === 0L)
    assert(r.isNullAt(r.fieldIndex("a2")))
  }

  test("andersonDarling: fold == rebuild over the mergeable histogram state") {
    val b1 = Seq(1L -> 2L, 2L -> 1L); val b2 = Seq(1L -> 1L, 3L -> 4L)
    val c1 = Seq(2L -> 3L); val c2 = Seq(1L -> 1L, 3L -> 1L)
    val folded = Profiler.andersonDarling(Profiler.cvmFromHistograms(
      Profiler.mergeBucketCounts(b1.toDF("bucket", "cnt"), b2.toDF("bucket", "cnt")),
      Profiler.mergeBucketCounts(c1.toDF("bucket", "cnt"), c2.toDF("bucket", "cnt"))))
      .collect()(0)
    val rebuilt = adOf(Seq(1L -> 3L, 2L -> 1L, 3L -> 4L), Seq(1L -> 1L, 2L -> 3L, 3L -> 1L))
    assert(folded.getAs[Double]("a2") === rebuilt.getAs[Double]("a2"))
    assert(folded.getAs[Long]("n_bins") === rebuilt.getAs[Long]("n_bins"))
  }

  // --- delta-method ratio -----------------------------------------------

  test("deltaRatio: hand golden — proportional arm has zero variance, se = 2/9") {
    // arm a: (1,2),(2,4),(3,6) -> R = 0.5, x = 0.5y exactly => var 0
    // arm b: (1,1),(3,2) -> R = 4/3, var = (2 - 8/3 + 8/9)/(2·2.25) = 4/81
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 1L, 1L), ("b", 3L, 2L)).toDF("arm", "x", "y")
    val r = Association.deltaRatio(df, Nil, "arm", "x", "y").collect()(0)
    assert(r.getAs[String]("grp_lo") === "a" && r.getAs[String]("grp_hi") === "b")
    assert(r.getAs[Long]("n_lo") === 3L && r.getAs[Long]("n_hi") === 2L)
    assert(math.abs(r.getAs[Double]("ratio_lo") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("ratio_hi") - 4.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("effect") + 5.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("se") - 2.0 / 9.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_lo") - (-5.0 / 6.0 - 1.959964 * 2.0 / 9.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_hi") - (-5.0 / 6.0 + 1.959964 * 2.0 / 9.0)) < 1e-9)
  }

  test("deltaRatio: zero-denominator arm -> NULL ratio/se; one group -> NULL stats") {
    val r = Association.deltaRatio(
      Seq(("a", 1L, 0L), ("a", 2L, 0L), ("b", 1L, 2L), ("b", 1L, 3L))
        .toDF("arm", "x", "y"), Nil, "arm", "x", "y").collect()(0)
    assert(r.getAs[Long]("n_groups") === 2L)
    assert(r.isNullAt(r.fieldIndex("ratio_lo")))
    assert(!r.isNullAt(r.fieldIndex("ratio_hi")))
    assert(r.isNullAt(r.fieldIndex("effect")) && r.isNullAt(r.fieldIndex("se")))
    val one = Association.deltaRatio(
      Seq(("a", 1L, 2L), ("a", 2L, 3L)).toDF("arm", "x", "y"),
      Nil, "arm", "x", "y").collect()(0)
    assert(one.getAs[Long]("n_groups") === 1L)
    assert(one.isNullAt(one.fieldIndex("ratio_lo")) &&
      one.isNullAt(one.fieldIndex("effect")))
  }

  // --- SRM ---------------------------------------------------------------

  test("srmCheck: 60/40 on a 50/50 design gives chi2 exactly 4.0; off-design traffic flagged") {
    val rows = Seq.fill(60)("A") ++ Seq.fill(40)("B") ++ Seq.fill(7)("Z")
    val r = Association.srmCheck(rows.toDF("arm"), Nil, "arm",
      Seq("A" -> 1.0, "B" -> 1.0)).collect()(0)
    assert(r.getAs[Long]("n_total") === 100L) // designed arms only
    assert(r.getAs[Long]("n_arms") === 2L && r.getAs[Long]("df") === 1L)
    assert(r.getAs[Long]("n_unexpected") === 7L)
    assert(math.abs(r.getAs[Double]("chi2") - 4.0) < 1e-9)
  }

  test("srmCheck: a designed arm with ZERO traffic still pays its expected count") {
    // A=2, B=2, C=0 on equal thirds: chi2 = 2·(2/3)²/(4/3) + (4/3)²/(4/3) = 2
    val r = Association.srmCheck(Seq("A", "A", "B", "B").toDF("arm"), Nil, "arm",
      Seq("A" -> 1.0, "B" -> 1.0, "C" -> 1.0)).collect()(0)
    assert(r.getAs[Long]("n_arms") === 3L && r.getAs[Long]("df") === 2L)
    assert(r.getAs[Long]("n_total") === 4L)
    // 1e-8: the thirds land each nano term on a .33/.67 rounding edge
    assert(math.abs(r.getAs[Double]("chi2") - 2.0) < 1e-8)
  }

  test("srmCheck: perfect split -> chi2 0; empty input -> NULL chi2") {
    val ok = Association.srmCheck(Seq("A", "B").toDF("arm"), Nil, "arm",
      Seq("A" -> 0.5, "B" -> 0.5)).collect()(0)
    assert(ok.getAs[Double]("chi2") === 0.0)
    val empty = Association.srmCheck(Seq.empty[String].toDF("arm"), Nil, "arm",
      Seq("A" -> 0.5, "B" -> 0.5)).collect()(0)
    assert(empty.getAs[Long]("n_total") === 0L)
    assert(empty.isNullAt(empty.fieldIndex("chi2")))
  }

  // --- Cochran's Q --------------------------------------------------------

  private def longForm(rows: Seq[(String, Seq[Int])]) =
    rows.flatMap { case (u, ys) =>
      ys.zipWithIndex.map { case (y, i) => (u, s"t$i", y) }
    }.toDF("u", "t", "y")

  test("cochranQ: hand golden 4 units × 3 treatments gives Q = 3.0") {
    // C=(3,2,1) T=6 R=(2,1,3,0): Q = 2·(3·14−36)/(3·6−14) = 12/4 = 3
    val df = longForm(Seq(
      "u1" -> Seq(1, 1, 0), "u2" -> Seq(1, 0, 0),
      "u3" -> Seq(1, 1, 1), "u4" -> Seq(0, 0, 0)))
    val out = Association.cochranQ(df, "u", "t", "y").orderBy("treatment").collect()
    assert(out.map(_.getAs[String]("treatment")).toSeq === Seq("t0", "t1", "t2"))
    assert(out.map(_.getAs[Long]("flagged_n")).toSeq === Seq(3L, 2L, 1L))
    assert(out.forall(_.getAs[Long]("n_units") === 4L))
    assert(out.forall(_.getAs[Long]("k") === 3L))
    assert(out.forall(_.getAs[Long]("df") === 2L))
    assert(out.forall(r => math.abs(r.getAs[Double]("q") - 3.0) < 1e-9))
  }

  test("cochranQ: incomplete units drop and are counted; Q unchanged") {
    val complete = longForm(Seq(
      "u1" -> Seq(1, 1, 0), "u2" -> Seq(1, 0, 0),
      "u3" -> Seq(1, 1, 1), "u4" -> Seq(0, 0, 0)))
    val withPartial = complete.unionByName(
      Seq(("u5", "t0", 1), ("u5", "t1", 0)).toDF("u", "t", "y"))
    val out = Association.cochranQ(withPartial, "u", "t", "y")
      .orderBy("treatment").collect()
    assert(out.forall(_.getAs[Long]("n_incomplete") === 1L))
    assert(out.forall(_.getAs[Long]("n_units") === 4L))
    assert(out.forall(r => math.abs(r.getAs[Double]("q") - 3.0) < 1e-9))
  }

  test("cochranQ: no discordance (all units all-1) -> NULL Q (the b+c=0 boundary)") {
    val df = longForm(Seq("u1" -> Seq(1, 1), "u2" -> Seq(1, 1)))
    val out = Association.cochranQ(df, "u", "t", "y").collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("q"))))
    assert(out.forall(_.getAs[Long]("df") === 1L))
  }

  // --- Jonckheere–Terpstra -------------------------------------------------

  test("jonckheereTerpstra: hand golden with ties — 2J=15, 4E=16, var=52/15") {
    // g1={1,2} g2={2,3} g3={4}: U12=3.5 U13=2 U23=2 -> J=7.5 E=4
    // v1=(300−36−18)/72, v2=0, v3=4·2/160 -> var=52/15
    val df = Seq(("g1", 1L), ("g1", 2L), ("g2", 2L), ("g2", 3L), ("g3", 4L))
      .toDF("grp0", "v")
    val r = Association.jonckheereTerpstra(df, Nil, "grp0", "v").collect()(0)
    assert(r.getAs[Long]("n_groups") === 3L && r.getAs[Long]("n_total") === 5L)
    assert(r.getAs[String]("j2") === "15")
    assert(r.getAs[String]("ej4") === "16")
    assert(math.abs(r.getAs[Double]("z") - 3.5 / math.sqrt(52.0 / 15.0)) < 1e-9)
  }

  test("jonckheereTerpstra: J = 0 when every lo value exceeds every hi value") {
    val df = Seq(("a", 9L), ("a", 8L), ("b", 1L), ("b", 2L)).toDF("grp0", "v")
    val r = Association.jonckheereTerpstra(df, Nil, "grp0", "v").collect()(0)
    assert(r.getAs[String]("j2") === "0")
    assert(r.getAs[Double]("z") < 0d)
  }

  test("jonckheereTerpstra: one group or all-tied values -> NULL z") {
    val one = Association.jonckheereTerpstra(
      Seq(("a", 1L), ("a", 2L)).toDF("grp0", "v"), Nil, "grp0", "v").collect()(0)
    assert(one.getAs[Long]("n_groups") === 1L)
    assert(one.isNullAt(one.fieldIndex("z")))
    val tied = Association.jonckheereTerpstra(
      Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("grp0", "v"),
      Nil, "grp0", "v").collect()(0)
    assert(tied.getAs[String]("j2") === "2") // 2·(½·#ties)=2·1
    assert(tied.isNullAt(tied.fieldIndex("z")))
  }

  // --- calibration (ECE / Brier decomposition / Hosmer–Lemeshow) ----------

  import graft.operators.RankEval

  test("calibration: hand golden — ECE 0.25, REL = RES = 0.0625, UNC 0.1875") {
    // bucket 0: scores .25/.25, one positive; bucket 1: .75/.75, two
    val preds = Seq((1L, 0.25), (2L, 0.25), (3L, 0.75), (4L, 0.75))
      .toDF("id", "score")
    val labels = Seq((1L, true), (2L, false), (3L, true), (4L, true))
      .toDF("id", "label")
    val cells = RankEval.calibrationCells(preds, labels, "id", "score", "label",
      nBuckets = 2)
    val r = RankEval.expectedCalibrationError(cells).collect()(0)
    assert(r.getAs[Long]("n_total") === 4L && r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_bins") === 2L)
    assert(math.abs(r.getAs[Double]("ece") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("mce") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("brier_rel") - 0.0625) < 1e-9)
    assert(math.abs(r.getAs[Double]("brier_res") - 0.0625) < 1e-9)
    assert(math.abs(r.getAs[Double]("brier_unc") - 0.1875) < 1e-9)
    assert(math.abs(r.getAs[Double]("brier_binned") - 0.1875) < 1e-9)
  }

  test("calibration: perfectly calibrated cells -> ECE/MCE/REL exactly-ish 0") {
    // each bucket's mean score equals its positive rate exactly
    val preds = Seq((1L, 0.5), (2L, 0.5), (3L, 1.0), (4L, 1.0)).toDF("id", "score")
    val labels = Seq((1L, true), (2L, false), (3L, true), (4L, true))
      .toDF("id", "label")
    val r = RankEval.expectedCalibrationError(
      RankEval.calibrationCells(preds, labels, "id", "score", "label", 2))
      .collect()(0)
    assert(r.getAs[Double]("ece") === 0.0)
    assert(r.getAs[Double]("mce") === 0.0)
    assert(r.getAs[Double]("brier_rel") === 0.0)
  }

  test("calibration: fold == rebuild over the mergeable cell state; empty -> NULL") {
    val preds = Seq((1L, 0.1), (2L, 0.3), (3L, 0.6), (4L, 0.9), (5L, 0.25))
      .toDF("id", "score")
    val labels = Seq((1L, false), (2L, true), (3L, true), (4L, true), (5L, false))
      .toDF("id", "label")
    def cellsOf(p: org.apache.spark.sql.DataFrame) =
      RankEval.calibrationCells(p, labels, "id", "score", "label", 4)
    val folded = RankEval.mergeCalibrationCells(
      cellsOf(preds.filter($"id" % 2 === 0)), cellsOf(preds.filter($"id" % 2 === 1)))
    val a = RankEval.expectedCalibrationError(folded).collect()(0)
    val b = RankEval.expectedCalibrationError(cellsOf(preds)).collect()(0)
    assert(a.getAs[Double]("ece") === b.getAs[Double]("ece"))
    assert(a.getAs[Double]("brier_binned") === b.getAs[Double]("brier_binned"))
    val empty = RankEval.expectedCalibrationError(
      cellsOf(preds.filter($"id" > 100))).collect()(0)
    assert(empty.isNullAt(empty.fieldIndex("ece")))
  }

  test("hosmerLemeshow: hand golden chi2 = 4/3; degenerate buckets counted not absorbed") {
    val cells = Seq(
      (0L, 2L, 1L, BigDecimal(500000000L)),
      (1L, 2L, 2L, BigDecimal(1500000000L)),
      (2L, 4L, 1L, BigDecimal(1000000000L)),
      (3L, 2L, 0L, BigDecimal(0L))) // E = 0: degenerate
      .toDF("bucket", "n", "n_pos", "s9")
      .withColumn("s9", col("s9").cast("decimal(38,0)"))
    val r = RankEval.hosmerLemeshow(cells).collect()(0)
    assert(r.getAs[Long]("n_total") === 10L)
    assert(r.getAs[Long]("n_bins_used") === 3L)
    assert(r.getAs[Long]("n_degenerate") === 1L)
    assert(r.getAs[Long]("df") === 1L)
    assert(math.abs(r.getAs[Double]("chi2") - 4.0 / 3.0) < 1e-8)
  }

  test("hosmerLemeshow: fewer than 3 usable buckets -> NULL chi2 (df <= 0)") {
    val cells = Seq((0L, 2L, 1L, BigDecimal(500000000L)),
      (1L, 2L, 2L, BigDecimal(1500000000L)))
      .toDF("bucket", "n", "n_pos", "s9")
      .withColumn("s9", col("s9").cast("decimal(38,0)"))
    val r = RankEval.hosmerLemeshow(cells).collect()(0)
    assert(r.getAs[Long]("n_bins_used") === 2L)
    assert(r.isNullAt(r.fieldIndex("chi2")) && r.isNullAt(r.fieldIndex("df")))
  }

  // --- Harrell's C -----------------------------------------------------

  import graft.operators.Survival

  test("concordance: hand golden — conc 2, tied 1, C = 5/6") {
    // A(s3,t2,ev) outlived by B(s1,t4,ev) conc, C(s2,t3,cens) conc,
    // D(s3,t2,cens-at-event-time) tied; B's event at t4 has no outliver
    val subj = Seq((3L, 2L, 1L), (1L, 4L, 1L), (2L, 3L, 0L), (3L, 2L, 0L))
      .toDF("risk", "dur", "ev")
    val r = Survival.concordance(subj, Nil, "risk", "dur", "ev").collect()(0)
    assert(r.getAs[String]("concordant") === "2")
    assert(r.getAs[String]("discordant") === "0")
    assert(r.getAs[String]("tied_score") === "1")
    assert(r.getAs[String]("n_comparable") === "3")
    assert(math.abs(r.getAs[Double]("c_index") - 5.0 / 6.0) < 1e-12)
  }

  test("concordance: all censored -> no comparable pair, NULL C") {
    val subj = Seq((1L, 2L, 0L), (2L, 3L, 0L)).toDF("risk", "dur", "ev")
    val r = Survival.concordance(subj, Nil, "risk", "dur", "ev").collect()(0)
    assert(r.getAs[String]("n_comparable") === "0")
    assert(r.isNullAt(r.fieldIndex("c_index")))
  }

  test("concordance: tied event times are NOT comparable (the Harrell rule)") {
    val subj = Seq((1L, 5L, 1L), (9L, 5L, 1L)).toDF("risk", "dur", "ev")
    val r = Survival.concordance(subj, Nil, "risk", "dur", "ev").collect()(0)
    assert(r.getAs[String]("n_comparable") === "0")
  }

  // --- always-valid CI / Chapman ------------------------------------------

  test("alwaysValidCiMean: radius matches the closed form on a hand fixture") {
    import graft.quality.SequentialTests
    // one peek: arm1 = {1,3} (n=2, s=4, q=10), arm2 = {2,6} (n=2, s=8, q=40)
    val incr = Seq((1L, 2L, 4L, 10L, 2L, 8L, 40L))
      .toDF("peek", "n1", "s1", "q1", "n2", "s2", "q2")
    val r = SequentialTests.alwaysValidCiMean(incr, Nil, "peek",
      "n1", "s1", "q1", "n2", "s2", "q2", tau2 = 1.0, alpha = 0.05).collect()(0)
    // delta = 2 − 4 = −2; v = s1²/.. : var1 = (2·10−16)/(2·1)=2 → /2 = 1
    // var2 = (2·40−64)/2 = 8 → /2 = 4; v = 1 + 4 = 5
    val v = 5.0
    val radius = math.sqrt(v * (v + 1) / 1.0 * math.log((v + 1) / (0.05 * 0.05 * v)))
    assert(math.abs(r.getAs[Double]("delta") + 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("radius") - radius) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_lo") - (-2.0 - radius)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_hi") - (-2.0 + radius)) < 1e-9)
  }

  test("alwaysValidCiMean: unusable peeks (n < 2 or zero variance) carry NULL CI") {
    import graft.quality.SequentialTests
    val incr = Seq((1L, 1L, 4L, 16L, 2L, 8L, 40L), // arm1 n=1
      (2L, 1L, 4L, 16L, 0L, 0L, 0L)) // cumulative: arm1 {4,4} zero var? no: arm2 var
      .toDF("peek", "n1", "s1", "q1", "n2", "s2", "q2")
    val out = SequentialTests.alwaysValidCiMean(incr, Nil, "peek",
      "n1", "s1", "q1", "n2", "s2", "q2", tau2 = 1.0, alpha = 0.05)
      .orderBy("peek").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("ci_lo")))
    // peek 2 cumulative: arm1 = {4,4} n=2 var 0, arm2 = {2,6} var 8 -> usable
    assert(!out(1).isNullAt(out(1).fieldIndex("ci_lo")))
  }

  test("chapmanEstimate: textbook golden 10/15/5 -> N=85/3, se=sqrt(8800/252)") {
    import graft.quality.Profiler
    val rows = Seq.fill(5)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(3)((false, false))
    val r = Profiler.chapmanEstimate(rows.toDF("fa", "fb"), Nil, "fa", "fb")
      .collect()(0)
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("n_b") === 15L)
    assert(r.getAs[Long]("n_both") === 5L && r.getAs[Long]("n_either") === 20L)
    assert(math.abs(r.getAs[Double]("n_hat") - (11.0 * 16 / 6 - 1)) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_hat") - math.sqrt(8800.0 / 252)) < 1e-9)
    assert(math.abs(r.getAs[Double]("missed_hat") - (11.0 * 16 / 6 - 1 - 20)) < 1e-9)
  }

  test("chapmanEstimate: zero overlap and empty input stay finite (the +1 corrections)") {
    import graft.quality.Profiler
    val noOverlap = Seq((true, false), (false, true)).toDF("fa", "fb")
    val r = Profiler.chapmanEstimate(noOverlap, Nil, "fa", "fb").collect()(0)
    assert(math.abs(r.getAs[Double]("n_hat") - 3.0) < 1e-12) // 2·2/1 − 1
    val empty = Profiler.chapmanEstimate(
      Seq.empty[(Boolean, Boolean)].toDF("fa", "fb"), Nil, "fa", "fb").collect()(0)
    assert(r != null && empty.getAs[Double]("n_hat") === 0.0)
  }

  // --- Benjamini–Yekutieli / post-stratification ---------------------------

  test("benjaminiYekutieli: hand battery — harmonic shrink drops BH's second rejection") {
    import graft.quality.MultipleTesting
    // c(4) = 25/12; BY boundary i·0.05/(4·c): rank1 0.006, rank2 0.012
    val battery = Seq(("a", 4000000L), ("b", 20000000L), ("c", 500000000L),
      ("d", 900000000L)).toDF("id", "p9")
    val by = MultipleTesting.benjaminiYekutieli(battery, Nil, Seq("id"), "p9")
      .orderBy("rank").collect()
    assert(by.map(_.getAs[Boolean]("rejected")).toSeq ===
      Seq(true, false, false, false))
    val bh = MultipleTesting.benjaminiHochberg(battery, Nil, Seq("id"), "p9")
      .orderBy("rank").collect()
    assert(bh.map(_.getAs[Boolean]("rejected")).toSeq ===
      Seq(true, true, false, false))
    // c18 = 1e18 + 5e17 + double(1e18/3) + 25e16 — the /3 term is the
    // correctly-rounded IEEE double 333333333333333312 (values past 2^53
    // are quantized; deterministic cross-engine, ~1e-16 off the true
    // harmonic — far below the p9 grid)
    assert(by.head.getAs[String]("c18") === "2083333333333333312")
  }

  test("benjaminiYekutieli: rejection set is always a subset of BH's (fuzz)") {
    import graft.quality.MultipleTesting
    val r = new scala.util.Random(4414)
    for (t <- 1 to 4) {
      val battery = Seq.tabulate(20 + r.nextInt(60))(i =>
        (s"t$i", r.nextLong(1000000000L))).toDF("id", "p9")
      val by = MultipleTesting.benjaminiYekutieli(battery, Nil, Seq("id"), "p9")
        .filter(col("rejected")).select("id").collect().map(_.getString(0)).toSet
      val bh = MultipleTesting.benjaminiHochberg(battery, Nil, Seq("id"), "p9")
        .filter(col("rejected")).select("id").collect().map(_.getString(0)).toSet
      assert(by.subsetOf(bh), s"BY ⊄ BH trial $t: ${by -- bh}")
    }
  }

  test("postStratified: hand golden — reweighted mean 4.5, se = sqrt(0.8125)") {
    import graft.operators.Sampling
    val df = Seq(("A", 1L), ("A", 3L), ("B", 10L), ("B", 14L)).toDF("st", "y")
    val r = Sampling.postStratified(df, Nil, "st", "y",
      Seq("A" -> 0.75, "B" -> 0.25)).collect()(0)
    assert(r.getAs[Long]("n_total") === 4L && r.getAs[Long]("n_strata") === 2L)
    assert(r.getAs[Long]("n_empty_strata") === 0L)
    assert(r.getAs[Long]("n_off_design") === 0L)
    assert(math.abs(r.getAs[Double]("mean_raw") - 7.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_post") - 4.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_post") - math.sqrt(0.8125)) < 1e-6)
  }

  test("postStratified: empty designed stratum -> NULL estimate; off-design counted; n=1 stratum -> NULL se only") {
    import graft.operators.Sampling
    val base = Seq(("A", 1L), ("A", 3L), ("Z", 9L)).toDF("st", "y")
    val emptyB = Sampling.postStratified(base, Nil, "st", "y",
      Seq("A" -> 0.5, "B" -> 0.5)).collect()(0)
    assert(emptyB.getAs[Long]("n_empty_strata") === 1L)
    assert(emptyB.getAs[Long]("n_off_design") === 1L)
    assert(emptyB.isNullAt(emptyB.fieldIndex("mean_post")))
    val single = Sampling.postStratified(
      Seq(("A", 1L), ("A", 3L), ("B", 10L)).toDF("st", "y"), Nil, "st", "y",
      Seq("A" -> 0.5, "B" -> 0.5)).collect()(0)
    assert(!single.isNullAt(single.fieldIndex("mean_post")))
    assert(single.isNullAt(single.fieldIndex("se_post")))
  }

  // --- Cochran–Armitage / Fleming–Harrington --------------------------------

  test("cochranArmitage: hand golden — 2/10, 5/10, 8/10 gives z = 180/sqrt(4500)") {
    val rows = Seq.fill(2)(("a", true)) ++ Seq.fill(8)(("a", false)) ++
      Seq.fill(5)(("b", true)) ++ Seq.fill(5)(("b", false)) ++
      Seq.fill(8)(("c", true)) ++ Seq.fill(2)(("c", false))
    val r = Association.cochranArmitage(rows.toDF("g", "hit"), Nil, "g", "hit")
      .collect()(0)
    assert(r.getAs[Long]("n_total") === 30L && r.getAs[Long]("n_pass") === 15L)
    assert(r.getAs[String]("trend_num") === "180")
    assert(math.abs(r.getAs[Double]("z") - 180.0 / math.sqrt(4500.0)) < 1e-9)
  }

  test("cochranArmitage: reversing the label order flips z exactly; degenerate -> NULL") {
    val rows = Seq.fill(2)(("a", true)) ++ Seq.fill(8)(("a", false)) ++
      Seq.fill(8)(("c", true)) ++ Seq.fill(2)(("c", false))
    val fwd = Association.cochranArmitage(rows.toDF("g", "hit"), Nil, "g", "hit")
      .collect()(0).getAs[Double]("z")
    val rev = Association.cochranArmitage(
      rows.map { case (g, h) => (if (g == "a") "c" else "a", h) }.toDF("g", "hit"),
      Nil, "g", "hit").collect()(0).getAs[Double]("z")
    assert(math.abs(fwd + rev) < 1e-12)
    val allPass = Association.cochranArmitage(
      Seq(("a", true), ("b", true)).toDF("g", "hit"), Nil, "g", "hit").collect()(0)
    assert(allPass.isNullAt(allPass.fieldIndex("z")))
    val oneGroup = Association.cochranArmitage(
      Seq(("a", true), ("a", false)).toDF("g", "hit"), Nil, "g", "hit").collect()(0)
    assert(oneGroup.isNullAt(oneGroup.fieldIndex("z")))
  }

  test("logRankWeighted: rho = gamma = 0 reduces to the plain log-rank z") {
    val r = new scala.util.Random(1919)
    val subj = Seq.fill(80)(
      ((r.nextInt(2) == 0).toString, 1L + r.nextInt(10).toLong, r.nextInt(2).toLong))
      .toDF("cohort", "dur", "ev")
    val w = Survival.logRankWeighted(subj, Nil, "cohort", "dur", "ev", 0, 0)
      .collect()(0)
    val plain = Survival.logRank(subj, Nil, "cohort", "dur", "ev").collect()(0)
    assert(math.abs(w.getAs[Double]("z") - plain.getAs[Double]("z")) < 1e-7)
  }

  test("logRankWeighted: G(0,1) zero-weights the first event time (S(t-) = 1)") {
    // the only between-group difference is AT the first event time:
    // G(0,1) must see (near) nothing while plain log-rank sees plenty
    val subj = (Seq.fill(10)(("a", 1L, 1L)) ++ Seq.fill(10)(("b", 5L, 0L)))
      .toDF("cohort", "dur", "ev")
    val late = Survival.logRankWeighted(subj, Nil, "cohort", "dur", "ev", 0, 1)
      .collect()(0)
    // every event sits at t = 1 where w = 1 − S(0) = 0 → no evidence
    assert(late.getAs[String]("wdev_9") === "0")
    assert(late.isNullAt(late.fieldIndex("z")))
  }

  // --- Brunner–Munzel / Mood's median ---------------------------------------

  test("brunnerMunzel: the Hollander-Wolfe pain-relief golden (lawstat: 3.1375, df 17.68, p-hat 0.789)") {
    val x = Seq(1L, 2L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 2L, 4L, 1L, 1L)
    val y = Seq(3L, 3L, 4L, 3L, 1L, 2L, 3L, 1L, 1L, 5L, 4L)
    val df = (x.map(("a", _)) ++ y.map(("b", _))).toDF("g", "v")
    val r = Association.brunnerMunzel(df, Nil, "g", "v").collect()(0)
    assert(r.getAs[Long]("n_lo") === 14L && r.getAs[Long]("n_hi") === 11L)
    assert(math.abs(r.getAs[Double]("p_hat") - 0.788961) < 1e-5)
    assert(math.abs(r.getAs[Double]("bm") - 3.1375) < 5e-4)
    assert(math.abs(r.getAs[Double]("df") - 17.683) < 5e-3)
  }

  test("brunnerMunzel: label swap flips bm and reflects p-hat; all-tied -> NULL") {
    val rws = Seq(("a", 1L), ("a", 3L), ("a", 5L), ("b", 2L), ("b", 4L), ("b", 4L))
    val fwd = Association.brunnerMunzel(rws.toDF("g", "v"), Nil, "g", "v").collect()(0)
    val swp = Association.brunnerMunzel(
      rws.map { case (g, v) => (if (g == "a") "z" else "b", v) }.toDF("g", "v"),
      Nil, "g", "v").collect()(0)
    assert(math.abs(fwd.getAs[Double]("bm") + swp.getAs[Double]("bm")) < 1e-9)
    assert(math.abs(fwd.getAs[Double]("p_hat") + swp.getAs[Double]("p_hat") - 1.0) < 1e-9)
    val tied = Association.brunnerMunzel(
      Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L)).toDF("g", "v"),
      Nil, "g", "v").collect()(0)
    assert(math.abs(tied.getAs[Double]("p_hat") - 0.5) < 1e-12)
    assert(tied.isNullAt(tied.fieldIndex("bm")))
  }

  test("moodMedian: hand golden — disjoint {1,2,3} vs {4,5,6} gives chi2 = 6") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L), ("b", 6L))
      .toDF("g", "v")
    val out = Association.moodMedian(df, Nil, "g", "v").orderBy("grp").collect()
    assert(out.forall(_.getAs[Long]("median") === 3L))
    assert(out.map(_.getAs[Long]("n_above")).toSeq === Seq(0L, 3L))
    assert(out.forall(r => math.abs(r.getAs[Double]("chi2") - 6.0) < 1e-8))
    assert(out.forall(_.getAs[Long]("df") === 1L))
  }

  test("moodMedian: every value equal -> NULL chi2 (empty above-margin)") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "v")
    val out = Association.moodMedian(df, Nil, "g", "v").collect()
    assert(out.forall(_.getAs[Long]("median") === 5L))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("chi2"))))
  }

  // --- log-rank trend / two-prop always-valid CI ----------------------------

  test("logRankTrend: k = 2 collapses onto the plain log-rank |z|") {
    val r = new scala.util.Random(2222)
    val subj = Seq.fill(70)(
      ((r.nextInt(2) == 0).toString, 1L + r.nextInt(9).toLong, r.nextInt(2).toLong))
      .toDF("cohort", "dur", "ev")
    val tr = Survival.logRankTrend(subj, Nil, "cohort", "dur", "ev").collect()(0)
    val plain = Survival.logRank(subj, Nil, "cohort", "dur", "ev").collect()(0)
    assert(math.abs(math.abs(tr.getAs[Double]("z")) -
      math.abs(plain.getAs[Double]("z"))) < 1e-7)
  }

  test("logRankTrend: one cohort or all-censored -> NULL z") {
    val one = Survival.logRankTrend(
      Seq(("a", 1L, 1L), ("a", 2L, 0L)).toDF("c", "d", "e"), Nil, "c", "d", "e")
      .collect()(0)
    assert(one.getAs[Long]("n_groups") === 1L && one.isNullAt(one.fieldIndex("z")))
    val cens = Survival.logRankTrend(
      Seq(("a", 1L, 0L), ("b", 2L, 0L), ("c", 3L, 0L)).toDF("c", "d", "e"),
      Nil, "c", "d", "e").collect()(0)
    assert(cens.getAs[String]("tvar_9") === "0")
    assert(cens.isNullAt(cens.fieldIndex("z")))
  }

  test("alwaysValidCiTwoProportion: radius matches the closed form; degenerate peeks NULL") {
    import graft.quality.SequentialTests
    // one peek: arm1 40/100 hits, arm2 60/100
    val incr = Seq((1L, 100L, 40L, 100L, 60L))
      .toDF("peek", "n1", "s1", "n2", "s2")
    val r = SequentialTests.alwaysValidCiTwoProportion(incr, Nil, "peek",
      "n1", "s1", "n2", "s2", tau2 = 0.25, alpha = 0.05).collect()(0)
    val v = 0.5 * 0.5 * (1.0 / 100 + 1.0 / 100)
    val radius = math.sqrt(v * (v + 0.25) / 0.25 * math.log((v + 0.25) / (0.05 * 0.05 * v)))
    assert(math.abs(r.getAs[Double]("delta") + 0.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("radius") - radius) < 1e-9)
    val degen = SequentialTests.alwaysValidCiTwoProportion(
      Seq((1L, 50L, 0L, 50L, 0L)).toDF("peek", "n1", "s1", "n2", "s2"),
      Nil, "peek", "n1", "s1", "n2", "s2", tau2 = 0.25, alpha = 0.05).collect()(0)
    assert(degen.isNullAt(degen.fieldIndex("ci_lo")))
  }

  // --- Wilson / ICC ----------------------------------------------------------

  test("wilsonInterval: zero successes give the textbook [0, z2/(n+z2)] — never Wald's [0,0]") {
    val z2 = 1.959964 * 1.959964
    val df = (Seq.fill(10)(("a", false)) ++ Seq.fill(4)(("b", true))).toDF("g", "hit")
    val out = Association.wilsonInterval(df, Nil, "g", "hit").orderBy("grp").collect()
    val a = out(0)
    assert(a.getAs[Double]("p_hat") === 0.0)
    assert(math.abs(a.getAs[Double]("ci_lo")) < 1e-12)
    assert(math.abs(a.getAs[Double]("ci_hi") - z2 / (10 + z2)) < 1e-9)
    val b = out(1) // all passes: hi pins to 1, lo to n/(n+z2)
    assert(b.getAs[Double]("p_hat") === 1.0)
    assert(math.abs(b.getAs[Double]("ci_hi") - 1.0) < 1e-12)
    assert(math.abs(b.getAs[Double]("ci_lo") - 4.0 / (4 + z2)) < 1e-9)
    assert(out.forall(r => r.getAs[Double]("ci_lo") >= -1e-12 &&
      r.getAs[Double]("ci_hi") <= 1 + 1e-12))
  }

  test("iccDesignEffect: perfect clustering gives ICC 1 / deff = cluster size; anti-clustering hits the -1/(n0-1) floor with NULL n_effective") {
    val perfect = Seq(("c1", 0L), ("c1", 0L), ("c2", 1L), ("c2", 1L))
      .toDF("cl", "v")
    val p = Association.iccDesignEffect(perfect, Nil, "cl", "v").collect()(0)
    assert(math.abs(p.getAs[Double]("icc") - 1.0) < 1e-9)
    assert(math.abs(p.getAs[Double]("deff") - 2.0) < 1e-9)
    assert(math.abs(p.getAs[Double]("n_effective") - 2.0) < 1e-9)
    val anti = Seq(("c1", 0L), ("c1", 1L), ("c2", 0L), ("c2", 1L)).toDF("cl", "v")
    val a = Association.iccDesignEffect(anti, Nil, "cl", "v").collect()(0)
    assert(math.abs(a.getAs[Double]("icc") + 1.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("deff")) < 1e-9)
    assert(a.isNullAt(a.fieldIndex("n_effective"))) // deff = 0: no finite n_eff
  }

  test("iccDesignEffect: one cluster or no replication -> NULL (never a crash)") {
    val one = Association.iccDesignEffect(
      Seq(("c1", 1L), ("c1", 2L)).toDF("cl", "v"), Nil, "cl", "v").collect()(0)
    assert(one.getAs[Long]("n_clusters") === 1L && one.isNullAt(one.fieldIndex("icc")))
    val singletons = Association.iccDesignEffect(
      Seq(("c1", 1L), ("c2", 2L)).toDF("cl", "v"), Nil, "cl", "v").collect()(0)
    assert(singletons.isNullAt(singletons.fieldIndex("icc"))) // N = k: MSW undefined
  }

  // --- Power / MDE panel --------------------------------------------------

  private val zSum = 1.959964 + 0.841621 // α = 0.05 two-sided, power 0.8

  test("powerTwoProportion: the published n-per-arm anchor (p̄ = 0.5, MDE 0.1 -> 393)") {
    // the classic sizing-table figure: n = 2·p̄(1−p̄)(z_{α/2}+z_β)²/δ²
    // = 2·0.25·(1.959964+0.841621)²/0.01 = 392.44 → ⌈·⌉ = 393 (Fleiss,
    // Levin & Paik 2003 ch. 4 pooled form; published tables quote ≈393)
    val counts = Seq(("A", 1000L, 600L), ("B", 1000L, 400L))
      .toDF("grp", "n", "n_pass")
    val r = Association.powerTwoProportionFromCounts(
      counts, Nil, targetMde = 0.1d).collect()(0)
    assert(r.getAs[Double]("p_pool") === 0.5d)
    assert(r.getAs[Long]("n_required_per_arm") === 393L)
    val mde = zSum * math.sqrt(0.25 * (1.0 / 1000 + 1.0 / 1000))
    assert(math.abs(r.getAs[Double]("mde_abs") - mde) < 1e-12)
    assert(math.abs(r.getAs[Double]("mde_rel") - mde / 0.5) < 1e-12)
  }

  test("powerTwoProportion: power = 0.5 reduces the MDE to the Wald radius (fixed-test closure)") {
    val counts = Seq(("A", 400L, 120L), ("B", 600L, 150L))
      .toDF("grp", "n", "n_pass")
    val m50 = Association.powerTwoProportionFromCounts(
      counts, Nil, targetMde = 0.1d, power = 0.5d).collect()(0)
    val m80 = Association.powerTwoProportionFromCounts(
      counts, Nil, targetMde = 0.1d, power = 0.8d).collect()(0)
    val pq = 0.27 * 0.73 // p̄ = 270/1000
    val wald = 1.959964 * math.sqrt(pq * (1.0 / 400 + 1.0 / 600))
    assert(math.abs(m50.getAs[Double]("mde_abs") - wald) < 1e-12)
    // and the two powers differ by exactly the z-sum ratio
    assert(math.abs(m80.getAs[Double]("mde_abs") / m50.getAs[Double]("mde_abs") -
      zSum / 1.959964) < 1e-12)
  }

  test("powerTwoProportion: degenerate p̄ ∈ {0,1}, an empty arm, or one group -> NULL") {
    def oneRow(c: Seq[(String, Long, Long)]) =
      Association.powerTwoProportionFromCounts(
        c.toDF("grp", "n", "n_pass"), Nil, targetMde = 0.1d).collect()(0)
    val allHit = oneRow(Seq(("A", 10L, 10L), ("B", 10L, 10L)))
    assert(allHit.isNullAt(allHit.fieldIndex("mde_abs")))
    assert(allHit.getAs[Double]("p_pool") === 1.0d)
    val empty = oneRow(Seq(("A", 10L, 3L), ("B", 0L, 0L)))
    assert(empty.isNullAt(empty.fieldIndex("mde_abs")))
    assert(empty.isNullAt(empty.fieldIndex("p_pool")))
    val one = oneRow(Seq(("A", 10L, 3L)))
    assert(one.getAs[Long]("n_groups") === 1L)
    assert(one.isNullAt(one.fieldIndex("n_lo")))
  }

  test("powerTwoProportion: row wrapper equals the from-counts read") {
    val rows = (0 until 200).map(i =>
      (if (i % 2 == 0) "A" else "B", i % 7 == 0)).toDF("arm", "hit")
    val a = Association.powerTwoProportion(
      rows, Nil, "arm", "hit", targetMde = 0.05d).collect()(0)
    val counts = rows.groupBy(col("arm").as("grp")).agg(
      count(lit(1)).as("n"),
      sum(when(col("hit"), 1L).otherwise(0L)).as("n_pass"))
    val b = Association.powerTwoProportionFromCounts(
      counts, Nil, targetMde = 0.05d).collect()(0)
    assert(a.toSeq === b.toSeq)
  }

  test("powerRate: hand golden (λ̄ = 0.02, MDE 0.005 -> 12562 exposure per arm); Wald closure") {
    // E = ⌈2·0.02·(1.959964+0.841621)²/0.005²⌉: 2·0.02·7.84888… /
    // 0.000025 = 12558.2… → 12559-ish — computed below, not assumed
    val counts = Seq(("A", 5000L, 100L), ("B", 5000L, 100L))
      .toDF("grp", "e", "c")
    val r = Association.powerRateFromCounts(
      counts, Nil, targetMde = 0.005d).collect()(0)
    assert(r.getAs[Double]("lambda_pool") === 0.02d)
    val mde = zSum * math.sqrt(0.02 * (1.0 / 5000 + 1.0 / 5000))
    assert(math.abs(r.getAs[Double]("mde_abs") - mde) < 1e-12)
    assert(math.abs(r.getAs[Double]("mde_rel") - mde / 0.02) < 1e-12)
    val eReq = math.ceil(2d * 0.02 * zSum * zSum / (0.005 * 0.005)).toLong
    assert(r.getAs[Long]("e_required_per_arm") === eReq)
    // at the required exposure the MDE sits at/under the target
    val at = Association.powerRateFromCounts(
      Seq(("A", eReq, eReq / 50), ("B", eReq, eReq / 50)).toDF("grp", "e", "c"),
      Nil, targetMde = 0.005d).collect()(0)
    assert(at.getAs[Double]("mde_abs") <= 0.005d + 1e-9)
    // power = 0.5 -> the Wald radius exactly
    val m50 = Association.powerRateFromCounts(
      counts, Nil, targetMde = 0.005d, power = 0.5d).collect()(0)
    val wald = 1.959964 * math.sqrt(0.02 * (1.0 / 5000 + 1.0 / 5000))
    assert(math.abs(m50.getAs[Double]("mde_abs") - wald) < 1e-12)
    // guards: zero counts and an empty-exposure arm flag NULL
    val z = Association.powerRateFromCounts(
      Seq(("A", 100L, 0L), ("B", 100L, 0L)).toDF("grp", "e", "c"),
      Nil, targetMde = 0.005d).collect()(0)
    assert(z.isNullAt(z.fieldIndex("mde_abs")))
    val e0 = Association.powerRateFromCounts(
      Seq(("A", 100L, 5L), ("B", 0L, 0L)).toDF("grp", "e", "c"),
      Nil, targetMde = 0.005d).collect()(0)
    assert(e0.isNullAt(e0.fieldIndex("lambda_pool")))
  }

  test("powerMean: hand moments golden (σ² = 2, MDE 1 -> 32 per arm)") {
    // A = {0,2}, B = {1,3}: V₁ = 2·4−4 = 4, V₂ = 2·10−16 = 4,
    // σ̂² = (4/2 + 4/2)/2 = 2; n = ⌈2·2·(z-sum)²⌉ = ⌈31.3955⌉ = 32 —
    // the textbook 2σ²(z_{α/2}+z_β)²/δ² per-arm figure
    val rows = Seq(("A", 0L), ("A", 2L), ("B", 1L), ("B", 3L)).toDF("arm", "v")
    val r = Association.powerMean(rows, Nil, "arm", "v", targetMde = 1.0d)
      .collect()(0)
    assert(r.getAs[Double]("sigma2_pool") === 2.0d)
    assert(r.getAs[Long]("n_required_per_arm") === 32L)
    val mde = zSum * math.sqrt(2.0 * (0.5 + 0.5))
    assert(math.abs(r.getAs[Double]("mde_abs") - mde) < 1e-12)
  }

  test("powerMean: zero variance or n < 2 -> NULL; unsupported alpha/power throw") {
    val flat = Association.powerMean(
      Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L)).toDF("arm", "v"),
      Nil, "arm", "v", targetMde = 1.0d).collect()(0)
    assert(flat.isNullAt(flat.fieldIndex("mde_abs")))
    val tiny = Association.powerMean(
      Seq(("A", 1L), ("B", 2L), ("B", 4L)).toDF("arm", "v"),
      Nil, "arm", "v", targetMde = 1.0d).collect()(0)
    assert(tiny.isNullAt(tiny.fieldIndex("mde_abs")))
    intercept[IllegalArgumentException] {
      Association.powerMean(Seq(("A", 1L)).toDF("arm", "v"),
        Nil, "arm", "v", targetMde = 1.0d, alpha = 0.03d)
    }
    intercept[IllegalArgumentException] {
      Association.powerMean(Seq(("A", 1L)).toDF("arm", "v"),
        Nil, "arm", "v", targetMde = 1.0d, power = 0.85d)
    }
  }

  // --- Sequential SRM (one-sample mSPRT) -----------------------------------

  test("msprtOneProportion: exactly-on-design traffic accumulates no evidence") {
    import graft.quality.SequentialTests
    val incr = Seq((1L, 100L, 50L), (2L, 60L, 30L), (3L, 200L, 100L))
      .toDF("peek", "n", "s")
    val r = SequentialTests.msprtOneProportion(incr, Nil, "peek", "n", "s",
      p0 = 0.5d, tau2 = 0.25d).orderBy("peek").collect()
    for (row <- r) {
      assert(row.getAs[Double]("delta") === 0.0d)
      assert(row.getAs[Long]("ln_lr9") < 0L) // pure mixture penalty
      assert(row.getAs[Double]("p_always_valid") === 1.0d)
      assert(!row.getAs[Boolean]("reject"))
    }
  }

  test("msprtOneProportion: a real split drift rejects; p is non-increasing; H0 variance") {
    import graft.quality.SequentialTests
    // 60/40 split, 400 designed units per peek → evidence accumulates
    val incr = (1L to 8L).map(p => (p, 400L, 240L)).toDF("peek", "n", "s")
    val r = SequentialTests.msprtOneProportion(incr, Nil, "peek", "n", "s",
      p0 = 0.5d, tau2 = 0.000244140625d).orderBy("peek").collect()
    assert(r.last.getAs[Boolean]("reject"))
    val ps = r.map(_.getAs[Double]("p_always_valid"))
    for (Array(a, b) <- ps.sliding(2)) assert(b <= a + 1e-12)
    // the first peek's lnΛ replays the closed form with V = p0(1−p0)/N
    val d = 240.0 / 400 - 0.5
    val v = 0.25 / 400
    val t2 = 0.000244140625
    val ln = 0.5 * math.log(v / (v + t2)) + d * d * t2 / (2 * v * (v + t2))
    assert(r.head.getAs[Long]("ln_lr9") === math.round(ln * 1e9))
  }

  // --- Meta-analysis panel --------------------------------------------------

  test("metaAnalysis: hand golden e=(1,2,4), se=1 — every statistic a replayable rational") {
    // w = 1 each: θ̂_F = 7/3, se_F = 1/√3, Q = 21 − 49/3 = 14/3, df = 2,
    // I² = (14/3−2)/(14/3) = 4/7, C = 3 − 3/3 = 2, τ² = (8/3)/2 = 4/3,
    // w* = 3/7 each → θ̂_R = 7/3 (equal weights), se_R = √(7/9)
    val eff = Seq(("a", 1.0, 1.0), ("b", 2.0, 1.0), ("c", 4.0, 1.0))
      .toDF("st", "e", "se")
    val r = Association.metaAnalysis(eff, Nil, "st", "e", "se").collect()(0)
    assert(math.abs(r.getAs[Double]("effect_fixed") - 7.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_fixed") - 1.0 / math.sqrt(3)) < 1e-12)
    assert(math.abs(r.getAs[Double]("q") - 14.0 / 3) < 1e-12)
    assert(r.getAs[Long]("df") === 2L)
    assert(math.abs(r.getAs[Double]("i2") - 4.0 / 7) < 1e-12)
    assert(math.abs(r.getAs[Double]("tau2_dl") - 4.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("effect_random") - 7.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_random") - math.sqrt(7.0 / 9)) < 1e-12)
  }

  test("metaAnalysis: homogeneous strata — Q = 0, I² = 0, τ² = 0, pools coincide") {
    val eff = Seq(("a", 0.3, 0.5), ("b", 0.3, 0.2), ("c", 0.3, 1.1))
      .toDF("st", "e", "se")
    val r = Association.metaAnalysis(eff, Nil, "st", "e", "se").collect()(0)
    assert(math.abs(r.getAs[Double]("q")) < 1e-12)
    assert(r.getAs[Double]("i2") === 0.0d)
    assert(r.getAs[Double]("tau2_dl") === 0.0d)
    assert(math.abs(r.getAs[Double]("effect_fixed") - 0.3) < 1e-12)
    assert(r.getAs[Double]("effect_random") === r.getAs[Double]("effect_fixed"))
    assert(r.getAs[Double]("se_random") === r.getAs[Double]("se_fixed"))
  }

  test("metaAnalysis: k = 1 NULLs heterogeneity; invalid strata drop into n_dropped") {
    val rows = Seq[(String, Option[Double], Option[Double])](
      ("a", Some(0.7), Some(0.25)), ("b", Some(0.1), Some(0.0)),
      ("c", Some(0.1), Some(-1.0)), ("d", None, Some(1.0)))
    val r = Association.metaAnalysis(
      rows.toDF("st", "e", "se"), Nil, "st", "e", "se").collect()(0)
    assert(r.getAs[Long]("n_strata") === 1L)
    assert(r.getAs[Long]("n_dropped") === 3L)
    assert(r.isNullAt(r.fieldIndex("q")) && r.isNullAt(r.fieldIndex("i2")))
    assert(math.abs(r.getAs[Double]("effect_fixed") - 0.7) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_fixed") - 0.25) < 1e-12)
    assert(r.getAs[Double]("effect_random") === r.getAs[Double]("effect_fixed"))
  }

  // --- Rate ratio -----------------------------------------------------------

  test("rateRatio: hand golden 50/100 vs 25/100 — RR = 2 with the Poisson CI") {
    val counts = Seq(("A", 50L, 100L), ("B", 25L, 100L))
      .toDF("grp", "events", "exposure")
    val r = Association.rateRatioFromCounts(counts, Nil).collect()(0)
    assert(r.getAs[Double]("rate_lo") === 0.5d)
    assert(r.getAs[Double]("rate_hi") === 0.25d)
    assert(r.getAs[Double]("rate_ratio") === 2.0d)
    val se = math.sqrt(1.0 / 50 + 1.0 / 25)
    assert(math.abs(r.getAs[Double]("se_ln_rr") - se) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_lo") -
      math.exp(math.log(2.0) - 1.959964 * se)) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_hi") -
      math.exp(math.log(2.0) + 1.959964 * se)) < 1e-12)
  }

  test("rateRatio: zero events or zero exposure NULL per their boundaries") {
    val zeroEv = Association.rateRatioFromCounts(
      Seq(("A", 0L, 100L), ("B", 25L, 100L)).toDF("grp", "events", "exposure"),
      Nil).collect()(0)
    assert(zeroEv.getAs[Double]("rate_lo") === 0.0d)
    assert(zeroEv.getAs[Double]("rate_ratio") === 0.0d)
    assert(zeroEv.isNullAt(zeroEv.fieldIndex("se_ln_rr"))) // infinite information gap
    val zeroExp = Association.rateRatioFromCounts(
      Seq(("A", 5L, 0L), ("B", 25L, 100L)).toDF("grp", "events", "exposure"),
      Nil).collect()(0)
    assert(zeroExp.isNullAt(zeroExp.fieldIndex("rate_lo")))
    assert(zeroExp.isNullAt(zeroExp.fieldIndex("rate_ratio")))
    val one = Association.rateRatioFromCounts(
      Seq(("A", 5L, 10L)).toDF("grp", "events", "exposure"), Nil).collect()(0)
    assert(one.getAs[Long]("n_groups") === 1L)
    assert(one.isNullAt(one.fieldIndex("rate_lo")))
  }

  test("TOST: hand golden both directions, the |delta| >= margin impossibility, degenerate NULLs") {
    import graft.quality.{Association, GroupSequential}
    // (n, s) = (100, 50) vs (100, 52): delta = −0.02,
    // se = √(0.25/100 + 0.2496/100); margin 0.2 → equivalent,
    // margin 0.05 → not
    val counts = Seq(("A", 100L, 50L), ("B", 100L, 52L))
      .toDF("grp", "n", "n_pass")
    val se = math.sqrt(0.25 / 100 + 0.2496 / 100)
    val eq = Association.tostTwoProportionFromCounts(counts, Nil, margin = 0.2)
      .collect()(0)
    assert(math.abs(eq.getAs[Double]("delta") - (-0.02)) < 1e-12)
    assert(math.abs(eq.getAs[Double]("se") - se) < 1e-12)
    assert(math.abs(eq.getAs[Double]("z_lower") - 0.18 / se) < 1e-9)
    assert(math.abs(eq.getAs[Double]("z_upper") - 0.22 / se) < 1e-9)
    assert(eq.getAs[Boolean]("equivalent"))
    // p_tost is the larger one-sided p — the SAME Φ the driver solver
    // evaluates (phiCol ≡ phi, pinned in GroupSequentialSpec)
    assert(math.abs(eq.getAs[Double]("p_tost") -
      (1d - GroupSequential.phi(0.18 / se))) < 1e-12)
    val ne = Association.tostTwoProportionFromCounts(counts, Nil, margin = 0.05)
      .collect()(0)
    assert(!ne.getAs[Boolean]("equivalent"))
    // |delta| >= margin can NEVER declare equivalence (min z <= 0)
    val far = Seq(("A", 100L, 80L), ("B", 100L, 20L)).toDF("grp", "n", "n_pass")
    val rf = Association.tostTwoProportionFromCounts(far, Nil, margin = 0.5)
      .collect()(0)
    assert(!rf.getAs[Boolean]("equivalent"))
    assert(rf.getAs[Double]("z_lower") <= 0d || rf.getAs[Double]("z_upper") <= 0d)
    // degenerate: both arms all-convert → se = 0 → NULL, never a crash
    val degen = Seq(("A", 50L, 50L), ("B", 60L, 60L)).toDF("grp", "n", "n_pass")
    val rd = Association.tostTwoProportionFromCounts(degen, Nil, margin = 0.1)
      .collect()(0)
    assert(rd.isNullAt(rd.fieldIndex("z_lower")))
    assert(rd.isNullAt(rd.fieldIndex("equivalent")))
    // one group flags; wrapper == from-counts
    val one = Association.tostTwoProportionFromCounts(
      Seq(("A", 50L, 25L)).toDF("grp", "n", "n_pass"), Nil, margin = 0.1)
      .collect()(0)
    assert(one.getAs[Long]("n_groups") === 1L && one.isNullAt(one.fieldIndex("p_tost")))
    val rows = Seq(("A", true), ("A", false), ("B", true), ("B", true))
      .toDF("arm", "hit")
    assert(Association.tostTwoProportion(rows, Nil, "arm", "hit", 0.3).collect().toSeq ===
      Association.tostTwoProportionFromCounts(
        Seq(("A", 2L, 1L), ("B", 2L, 2L)).toDF("grp", "n", "n_pass"),
        Nil, 0.3).collect().toSeq)
    intercept[IllegalArgumentException] {
      Association.tostTwoProportionFromCounts(counts, Nil, margin = -0.1)
    }
    intercept[IllegalArgumentException] {
      Association.tostTwoProportionFromCounts(counts, Nil, margin = 0.1, alpha = 0.07)
    }
  }

  test("tostMean: hand golden both directions, zero-variance NULL, wrapper == from-moments") {
    import graft.quality.{Association, GroupSequential}
    // A {1,2,3} vs B {2,3,4}: delta = −1, se = √(2/3); margin 3 →
    // z_L = 2/√(2/3) = √6, z_U = 4/√(2/3) → equivalent; margin 2 → not
    val rows = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 2L), ("B", 3L), ("B", 4L)).toDF("arm", "v")
    val se = math.sqrt(2d / 3d)
    val eq = Association.tostMean(rows, Nil, "arm", "v", margin = 3d).collect()(0)
    assert(math.abs(eq.getAs[Double]("delta") - (-1d)) < 1e-12)
    assert(math.abs(eq.getAs[Double]("se") - se) < 1e-12)
    assert(math.abs(eq.getAs[Double]("z_lower") - 2d / se) < 1e-9)
    assert(eq.getAs[Boolean]("equivalent"))
    assert(math.abs(eq.getAs[Double]("p_tost") -
      (1d - GroupSequential.phi(2d / se))) < 1e-12)
    val ne = Association.tostMean(rows, Nil, "arm", "v", margin = 2d).collect()(0)
    assert(!ne.getAs[Boolean]("equivalent"))
    // constant values both arms: zero variance → NULL verdict
    val flat = Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L)).toDF("arm", "v")
    val rf = Association.tostMean(flat, Nil, "arm", "v", margin = 1d).collect()(0)
    assert(rf.isNullAt(rf.fieldIndex("equivalent")))
    // wrapper == from-moments on the welch moment shape
    val moments = Seq(("A", 3L, 6L, 14L), ("B", 3L, 9L, 29L))
      .toDF("grp", "__n", "__s", "__q")
      .withColumn("__s", col("__s").cast("decimal(38,0)"))
      .withColumn("__q", col("__q").cast("decimal(38,0)"))
    assert(Association.tostMeanFromMoments(moments, Nil, margin = 3d)
      .collect().toSeq ===
      Association.tostMean(rows, Nil, "arm", "v", margin = 3d).collect().toSeq)
  }

  test("mhRateRatio: one stratum reduces exactly to the crude rate ratio; hand pooled golden") {
    // single stratum: RR_MH = (c1·t2/T)/(c2·t1/T) = crude RR
    val one = Association.mhRateRatioFromCounts(
      Seq(("s0", "A", 50L, 100L), ("s0", "B", 25L, 100L))
        .toDF("stratum", "grp", "events", "exposure"), Nil).collect()(0)
    val crude = Association.rateRatioFromCounts(
      Seq(("A", 50L, 100L), ("B", 25L, 100L)).toDF("grp", "events", "exposure"),
      Nil).collect()(0)
    assert(math.abs(one.getAs[Double]("rate_ratio_mh") -
      crude.getAs[Double]("rate_ratio")) < 1e-9)
    // two strata, hand numbers: s1 (10, 100 | 10, 100): n = 10·100/200 = 5,
    // d = 5; s2 (40, 100 | 10, 300): n = 40·300/400 = 30, d = 10·100/400 = 2.5
    // → RR_MH = 35/7.5 = 14/3
    val r = Association.mhRateRatioFromCounts(
      Seq(("s1", "A", 10L, 100L), ("s1", "B", 10L, 100L),
        ("s2", "A", 40L, 100L), ("s2", "B", 10L, 300L))
        .toDF("stratum", "grp", "events", "exposure"), Nil).collect()(0)
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(math.abs(r.getAs[Double]("rate_ratio_mh") - 14.0 / 3) < 1e-8)
    // Greenland–Robins: var = (20·100·100/200² + 50·100·300/400²)/(35·7.5)
    val varLn = (20.0 * 100 * 100 / (200.0 * 200) +
      50.0 * 100 * 300 / (400.0 * 400)) / (35.0 * 7.5)
    assert(math.abs(r.getAs[Double]("se_ln_rr") - math.sqrt(varLn)) < 1e-8)
  }

  test("mhRateRatio: an all-zero side NULLs RR; one group flags") {
    val zero = Association.mhRateRatioFromCounts(
      Seq(("s0", "A", 0L, 100L), ("s0", "B", 25L, 100L))
        .toDF("stratum", "grp", "events", "exposure"), Nil).collect()(0)
    assert(zero.isNullAt(zero.fieldIndex("rate_ratio_mh"))) // pooled num = 0
    val one = Association.mhRateRatioFromCounts(
      Seq(("s0", "A", 5L, 10L)).toDF("stratum", "grp", "events", "exposure"),
      Nil).collect()(0)
    assert(one.getAs[Long]("n_groups") === 1L)
    assert(one.isNullAt(one.fieldIndex("rate_ratio_mh")))
  }

  test("mhRateRatio: a malformed stratum (events with zero exposure) drops flagged, never biases") {
    // s1 is clean; s2 has arm A reporting 7 events on 0 exposure — its
    // c1·t2/T term would land ONLY in the numerator (one-sided bias)
    val clean = Association.mhRateRatioFromCounts(
      Seq(("s1", "A", 50L, 100L), ("s1", "B", 25L, 100L))
        .toDF("stratum", "grp", "events", "exposure"), Nil).collect()(0)
    val withBad = Association.mhRateRatioFromCounts(
      Seq(("s1", "A", 50L, 100L), ("s1", "B", 25L, 100L),
        ("s2", "A", 7L, 0L), ("s2", "B", 3L, 200L))
        .toDF("stratum", "grp", "events", "exposure"), Nil).collect()(0)
    assert(withBad.getAs[Long]("n_strata") === 1L)
    assert(withBad.getAs[Long]("n_strata_dropped") === 1L)
    assert(clean.getAs[Long]("n_strata_dropped") === 0L)
    // pooled RR, se, and count totals all match the clean-only read
    for (c <- Seq("rate_ratio_mh", "se_ln_rr", "ci_lo", "ci_hi"))
      assert(withBad.getAs[Double](c) === clean.getAs[Double](c), c)
    for (c <- Seq("events_lo", "exposure_lo", "events_hi", "exposure_hi"))
      assert(withBad.getAs[Long](c) === clean.getAs[Long](c), c)
    // an absent arm (0 events, 0 exposure) is NOT malformed: it
    // self-cancels but stays counted
    val absent = Association.mhRateRatioFromCounts(
      Seq(("s1", "A", 50L, 100L), ("s1", "B", 25L, 100L),
        ("s2", "B", 3L, 200L))
        .toDF("stratum", "grp", "events", "exposure"), Nil).collect()(0)
    assert(absent.getAs[Long]("n_strata") === 2L)
    assert(absent.getAs[Long]("n_strata_dropped") === 0L)
    assert(math.abs(absent.getAs[Double]("rate_ratio_mh") -
      clean.getAs[Double]("rate_ratio_mh")) < 1e-9)
  }

  // --- Difference-in-differences ---------------------------------------------

  test("diffInDiff: hand 2x2 golden — DiD = 3, se = sqrt(7)") {
    // ctrl pre {0,2} post {1,3}; treat pre {0,2} post {3,7}:
    // means 1, 2, 1, 5 → DiD = (5−1) − (2−1) = 3; per-cell s²/n = 1,1,1,4
    val rows = Seq(
      ("c", "pre", 0L), ("c", "pre", 2L), ("c", "zpost", 1L), ("c", "zpost", 3L),
      ("t", "pre", 0L), ("t", "pre", 2L), ("t", "zpost", 3L), ("t", "zpost", 7L))
      .toDF("grp0", "per0", "y")
    val r = Association.diffInDiff(rows, Nil, "grp0", "per0", "y").collect()(0)
    assert(r.getAs[String]("grp_lo") === "c" && r.getAs[String]("grp_hi") === "t")
    assert(r.getAs[String]("per_lo") === "pre" && r.getAs[String]("per_hi") === "zpost")
    assert(r.getAs[Double]("mean_ctrl_pre") === 1.0d)
    assert(r.getAs[Double]("mean_ctrl_post") === 2.0d)
    assert(r.getAs[Double]("mean_treat_pre") === 1.0d)
    assert(r.getAs[Double]("mean_treat_post") === 5.0d)
    assert(r.getAs[Double]("did") === 3.0d)
    assert(math.abs(r.getAs[Double]("se_did") - math.sqrt(7.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_lo") - (3.0 - 1.959964 * math.sqrt(7.0))) < 1e-12)
  }

  test("diffInDiff: a missing cell or a single period flags, never lies") {
    val threeCells = Association.diffInDiff(
      Seq(("c", "pre", 1L), ("c", "post", 2L), ("t", "post", 3L))
        .toDF("grp0", "per0", "y"), Nil, "grp0", "per0", "y").collect()(0)
    assert(threeCells.getAs[Long]("n_groups") === 2L)
    assert(threeCells.getAs[Long]("n_periods") === 2L)
    assert(threeCells.isNullAt(threeCells.fieldIndex("did"))) // treat-pre absent
    val onePeriod = Association.diffInDiff(
      Seq(("c", "pre", 1L), ("t", "pre", 2L)).toDF("grp0", "per0", "y"),
      Nil, "grp0", "per0", "y").collect()(0)
    assert(onePeriod.getAs[Long]("n_periods") === 1L)
    assert(onePeriod.isNullAt(onePeriod.fieldIndex("did")))
    // singleton cells: DiD defined, se NULL (n < 2 somewhere); note the
    // per_hi = max-label = post convention needs post-sorting labels
    val singleton = Association.diffInDiff(
      Seq(("c", "pre", 1L), ("c", "zpost", 2L), ("t", "pre", 1L), ("t", "zpost", 4L))
        .toDF("grp0", "per0", "y"), Nil, "grp0", "per0", "y").collect()(0)
    assert(singleton.getAs[Double]("did") === 2.0d)
    assert(singleton.isNullAt(singleton.fieldIndex("se_did")))
  }

  // --- Empirical-Bayes shrinkage ---------------------------------------------

  test("ebShrinkRates: hand golden rates {0.2, 0.5, 0.8} — α = β = 19/12, the 43/158 posterior") {
    // m₁ = 0.5, v = 0.31 − 0.25 = 0.06, α+β = (0.25−0.06)/0.06 = 19/6,
    // α = β = 19/12; segment (n=10, s=2): p̃ = (2+19/12)/(10+19/6) = 43/158
    val counts = Seq(("a", 10L, 2L), ("b", 10L, 5L), ("c", 10L, 8L))
      .toDF("grp", "n", "n_pass")
    val rows = Association.ebShrinkRatesFromCounts(counts, Nil)
      .orderBy("grp").collect()
    val a = rows(0)
    assert(math.abs(a.getAs[Double]("alpha") - 19.0 / 12) < 1e-12)
    assert(math.abs(a.getAs[Double]("beta") - 19.0 / 12) < 1e-12)
    assert(math.abs(a.getAs[Double]("p_shrunk") - 43.0 / 158) < 1e-12)
    // every off-mean segment moves strictly toward the grand mean
    for (r <- rows; pr = r.getAs[Double]("p_raw"); ps = r.getAs[Double]("p_shrunk")
        if pr != 0.5)
      assert(math.abs(ps - 0.5) < math.abs(pr - 0.5), r.getAs[String]("grp"))
    // the on-mean segment stays put
    assert(rows(1).getAs[Double]("p_shrunk") === 0.5d)
  }

  test("ebShrinkRates: small-n segments shrink more; degenerate fits flag NULL") {
    val counts = Seq(("big", 500L, 400L), ("small", 5L, 4L), ("lo", 100L, 20L))
      .toDF("grp", "n", "n_pass")
    val byGrp = Association.ebShrinkRatesFromCounts(counts, Nil)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val m1 = (0.8 + 0.8 + 0.2) / 3
    def pull(g: String) = {
      val r = byGrp(g)
      math.abs(r.getAs[Double]("p_raw") - r.getAs[Double]("p_shrunk"))
    }
    assert(pull("small") > pull("big")) // same rate, less evidence → more shrinkage
    assert(math.abs(byGrp("small").getAs[Double]("p_raw") - 0.8) < 1e-12 && m1 < 0.8)
    // identical rates: v = 0, nothing to shrink toward → NULL fit, raw kept
    val flat = Association.ebShrinkRatesFromCounts(
      Seq(("a", 10L, 3L), ("b", 20L, 6L)).toDF("grp", "n", "n_pass"), Nil)
      .collect()(0)
    assert(flat.isNullAt(flat.fieldIndex("alpha")))
    assert(flat.isNullAt(flat.fieldIndex("p_shrunk")))
    assert(flat.getAs[Double]("p_raw") === 0.3d)
    // maximal dispersion {0, 1}: v = m₁(1−m₁), a Beta cannot carry it → NULL
    val wide = Association.ebShrinkRatesFromCounts(
      Seq(("a", 5L, 0L), ("b", 5L, 5L)).toDF("grp", "n", "n_pass"), Nil)
      .collect()(0)
    assert(wide.isNullAt(wide.fieldIndex("alpha")))
  }

  test("quantileThresholdMonitor: the rank reduction equals the direct quantile read at the boundary") {
    import graft.operators.Quantiles
    import graft.quality.SequentialTests
    val rnd = new scala.util.Random(20260817L)
    // fuzz the exact identity Q_p > T <=> s > n - r on the house
    // lower-rank rule, against the direct cell rank selection
    for (trial <- 0 until 8) {
      val p = Seq(50, 90, 95, 99)(trial % 4)
      val vals = Seq.fill(20 + rnd.nextInt(200))(rnd.nextInt(50).toLong)
      val t = rnd.nextInt(50).toLong
      val cells = vals.map(v => (0L, v)).toDF("peek", "v")
      val vc = Quantiles.valueCells(cells, Seq("peek"), "v")
      val mon = SequentialTests.quantileThresholdMonitor(vc, Nil, "peek",
        t, p, tau2 = 0.0625d).collect()(0)
      // the direct read: the value at the clamped lower rank
      val sorted = vals.sorted
      val r = math.max(1L, math.min(vals.size.toLong,
        (p.toLong * (vals.size + 1)) / 100L))
      val qp = sorted((r - 1).toInt)
      assert(mon.getAs[Boolean]("q_above_threshold") === (qp > t),
        s"trial $trial p=$p t=$t qp=$qp")
      assert(mon.getAs[Long]("p_rank") === r)
      assert(mon.getAs[Long]("s") === vals.count(_ > t).toLong)
    }
  }

  test("quantileThresholdMonitor: fires on a real exceedance shift, stays quiet at the null") {
    import graft.operators.Quantiles
    import graft.quality.SequentialTests
    // 5 peeks x 400 values in 0..99: true p95 = 95-ish
    val rows = for (peek <- 0L until 5L; i <- 0 until 400)
      yield (peek, ((peek * 977 + i * 31) % 100).toLong)
    val vc = Quantiles.valueCells(rows.toDF("peek", "v"), Seq("peek"), "v")
    // threshold far below p95: exceedance ~20% >> 5% -> monitor fires
    val hot = SequentialTests.quantileThresholdMonitor(vc, Nil, "peek",
      threshold = 79L, p = 95, tau2 = 0.0625d).orderBy("peek").collect()
    assert(hot.last.getAs[Boolean]("reject"))
    assert(hot.last.getAs[Boolean]("q_above_threshold"))
    assert(hot.last.getAs[Double]("p_always_valid") < 0.05d)
    // threshold at the true p95 boundary: exceedance == 5% exactly ->
    // no evidence ever accumulates
    val cold = SequentialTests.quantileThresholdMonitor(vc, Nil, "peek",
      threshold = 94L, p = 95, tau2 = 0.0625d).orderBy("peek").collect()
    assert(cold.forall(!_.getAs[Boolean]("reject")))
    // fold == rebuild: merged per-batch cells answer the same monitor
    val parts = rows.zipWithIndex.groupBy(_._2 % 3).values.toSeq.map(b =>
      Quantiles.valueCells(b.map(_._1).toDF("peek", "v"), Seq("peek"), "v"))
    val folded = parts.reduce(Quantiles.mergeValueCells(_, _, Seq("peek")))
    assert(SequentialTests.quantileThresholdMonitor(folded, Nil, "peek",
        79L, 95, 0.0625d).orderBy("peek").collect().toSeq ===
      hot.toSeq)
  }

  test("jonckheereTerpstra: keyed variant computes per-key independently") {
    val df = Seq(("k1", "a", 1L), ("k1", "b", 2L), ("k1", "a", 2L), ("k1", "b", 3L),
      ("k2", "a", 5L), ("k2", "b", 5L)).toDF("key", "grp0", "v")
    val out = Association.jonckheereTerpstra(df, Seq("key"), "grp0", "v")
      .orderBy("key").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_total") === 4L)
    assert(out(1).getAs[String]("j2") === "1")
    assert(out(1).isNullAt(out(1).fieldIndex("z")))
  }

  // --- Cliff's delta card -----------------------------------------------

  test("cliffsDelta: hand golden {1,2,3} vs {2,3,4} — delta = -5/9, var = 23/162") {
    import graft.quality.Association
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(2L, 3L, 4L).map(("b", _)))
      .toDF("grp", "v")
    val r = Association.cliffsDelta(df, Nil, "grp", "v").collect()(0)
    assert(r.getAs[String]("num_d") === "-5")
    assert(r.getAs[String]("n_tied_pairs") === "2")
    assert(math.abs(r.getAs[Double]("cliffs_delta") + 5d / 9d) < 1e-12)
    assert(math.abs(r.getAs[Double]("cles") - (1d - 5d / 9d) / 2d) < 1e-12)
    // n2^2*S1 + n1^2*S2 - S3 = 42/9 + 42/9 - 38/9 = 46/9; /36 = 23/162
    assert(math.abs(r.getAs[Double]("var_delta") - 23d / 162d) < 1e-9)
    // the asymmetric CI respects the bounds
    assert(r.getAs[Double]("ci_lo") >= -1d && r.getAs[Double]("ci_hi") <= 1d)
    assert(r.getAs[Double]("ci_lo") < -5d / 9d &&
      r.getAs[Double]("ci_hi") > -5d / 9d)
  }

  test("cliffsDelta: point estimate equals mannWhitney's cliffs_delta exactly; separation edge") {
    import graft.quality.Association
    val rnd = new scala.util.Random(20260820L)
    val df = (0 until 120).map { _ =>
      (if (rnd.nextBoolean()) "x" else "y", rnd.nextInt(12).toLong)
    }.toDF("grp", "v")
    val card = Association.cliffsDelta(df, Nil, "grp", "v").collect()(0)
    val mw = Association.mannWhitney(df, Nil, "grp", "v").collect()(0)
    assert(card.getAs[Double]("cliffs_delta") ===
      mw.getAs[Double]("cliffs_delta"))
    // complete separation: delta = -1 (lo all smaller), var 0, point CI
    val sep = (Seq(1L, 2L).map(("a", _)) ++ Seq(5L, 6L).map(("b", _)))
      .toDF("grp", "v")
    val rs = Association.cliffsDelta(sep, Nil, "grp", "v").collect()(0)
    assert(rs.getAs[Double]("cliffs_delta") === -1d)
    assert(rs.getAs[Double]("var_delta") === 0d)
    assert(rs.getAs[Double]("ci_lo") === -1d && rs.getAs[Double]("ci_hi") === -1d)
  }

  test("cliffsDelta: differential fuzz vs the brute-force dominance matrix") {
    import graft.quality.Association
    val rnd = new scala.util.Random(20260821L)
    for (trial <- 0 until 5) {
      val lo = Seq.fill(4 + rnd.nextInt(10))(rnd.nextInt(8).toLong)
      val hi = Seq.fill(4 + rnd.nextInt(10))(rnd.nextInt(8).toLong)
      val df = (lo.map(("a", _)) ++ hi.map(("b", _))).toDF("grp", "v")
      val r = Association.cliffsDelta(df, Nil, "grp", "v").collect()(0)
      val n1 = lo.size; val n2 = hi.size
      val dij = for (x <- lo; y <- hi)
        yield if (x > y) 1d else if (x < y) -1d else 0d
      val delta = dij.sum / (n1 * n2)
      val di = lo.map(x => hi.map(y =>
        if (x > y) 1d else if (x < y) -1d else 0d).sum / n2)
      val dj = hi.map(y => lo.map(x =>
        if (x > y) 1d else if (x < y) -1d else 0d).sum / n1)
      val s1 = di.map(d => (d - delta) * (d - delta)).sum
      val s2 = dj.map(d => (d - delta) * (d - delta)).sum
      val s3 = dij.map(d => (d - delta) * (d - delta)).sum
      val v = math.max((n2.toDouble * n2 * s1 + n1.toDouble * n1 * s2 - s3) /
        (n1.toDouble * n2 * (n1 - 1d) * (n2 - 1d)), 0d)
      assert(math.abs(r.getAs[Double]("cliffs_delta") - delta) < 1e-12,
        s"trial $trial delta")
      assert(math.abs(r.getAs[Double]("var_delta") - v) < 1e-8,
        s"trial $trial var ${r.getAs[Double]("var_delta")} vs $v")
    }
  }

  test("cliffsDelta: guards — one group and n = 1 sides flag NULL; fold == rebuild") {
    import graft.quality.Association
    val one = Seq(("a", 1L), ("a", 2L)).toDF("grp", "v")
    val r1 = Association.cliffsDelta(one, Nil, "grp", "v").collect()(0)
    assert(r1.getAs[Long]("n_groups") === 1L)
    assert(r1.isNullAt(r1.fieldIndex("cliffs_delta")))
    val thin = Seq(("a", 1L), ("b", 2L), ("b", 3L)).toDF("grp", "v")
    val r2 = Association.cliffsDelta(thin, Nil, "grp", "v").collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("var_delta"))) // n_lo = 1
    // fold == rebuild on the shared rank-cell state
    val rnd = new scala.util.Random(20260822L)
    val rows = (0 until 90).map { i =>
      (if (i % 2 == 0) "x" else "y", rnd.nextInt(10).toLong, i)
    }
    val df = rows.toDF("grp", "v", "i")
    val direct = Association.cliffsDelta(df, Nil, "grp", "v").collect()(0)
    val parts = (0 until 3).map(k =>
      Association.rankCells(df.filter(col("i") % 3 === k), Nil, "grp", "v"))
    val folded = parts.reduce(Association.mergeRankCells(_, _, Nil))
    val fromCells = Association.cliffsDeltaFromCells(folded, Nil).collect()(0)
    assert(direct.toSeq === fromCells.toSeq)
  }
}
