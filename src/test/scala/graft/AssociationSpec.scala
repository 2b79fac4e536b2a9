package graft

import graft.quality.Association
import graft.text.CorpusLaws
import graft.operators.TimeSeries
import graft.dedup.Linkage
import org.apache.spark.sql.functions._

/** Goldens + fold laws for the round-10 statistics family: categorical
  * association (MI / chi-square / Cramér's V), Shannon entropy, JS
  * divergence, Kendall τ-b cells, Zipf/Heaps corpus laws, the EWMA
  * truncated-kernel chart, and Fellegi–Sunter linkage. Each golden is
  * computed independently in the test (replaying the nano-scaling where
  * the operator defines its surface through it), so a formula edit on
  * either side breaks the pair.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private def nano(x: Double): Long = math.round(x * 1e9)

  // --- mutual information ---------------------------------------------

  test("MI: perfectly dependent 2x2 is ln 2; independent is 0") {
    val dep = (Seq.fill(5)(("a", "1")) ++ Seq.fill(5)(("b", "2"))).toDF("x0", "y0")
    val cells = Association.associationCells(
      Association.contingencyCounts(dep, Nil, "x0", "y0"), Nil)
    val mi = Association.mutualInformation(cells, Nil).collect()(0)
    // each cell: (1/2)*ln( (5*10)/(5*5) ) = 0.5*ln 2, nano-rounded, x2
    val expected = 2 * nano(0.5 * math.log(2.0))
    assert(mi.getAs[Double]("mi") === expected.toDouble / 1e9)
    assert(math.abs(mi.getAs[Double]("mi") - math.log(2.0)) < 1e-8)
    assert(math.abs(mi.getAs[Double]("mi_norm") - 1.0) < 1e-8)

    val ind = (for { x <- Seq("a", "b"); y <- Seq("1", "2"); _ <- 1 to 3 }
      yield (x, y)).toDF("x0", "y0")
    val mi0 = Association.mutualInformation(
      Association.associationCells(
        Association.contingencyCounts(ind, Nil, "x0", "y0"), Nil), Nil).collect()(0)
    assert(mi0.getAs[Double]("mi") === 0.0) // every term ln(1) = 0 exactly
  }

  test("associationStat: chi-square counts structural zero cells (2x2 perfect = N, V = 1)") {
    val dep = (Seq.fill(5)(("a", "1")) ++ Seq.fill(5)(("b", "2"))).toDF("x0", "y0")
    val cells = Association.associationCells(
      Association.contingencyCounts(dep, Nil, "x0", "y0"), Nil)
    val (chi, v, df) = Association.associationStat(cells)
    // only 2 observed cells, but the (a,2)/(b,1) zeros contribute E=2.5
    // each: chi^2 of a perfect 2x2 is N = 10, NOT 5
    assert(math.abs(chi - 10.0) < 1e-9)
    assert(math.abs(v - 1.0) < 1e-9)
    assert(df === 1L)
  }

  test("associationSummary: perfect table gives V=1 and Theil U=1; independence gives 0; constant column NULLs") {
    val dep = (Seq.fill(5)(("a", "1")) ++ Seq.fill(5)(("b", "2"))).toDF("x0", "y0")
    val s = Association.associationSummary(
      Association.associationCells(
        Association.contingencyCounts(dep, Nil, "x0", "y0"), Nil), Nil).collect()(0)
    // chi9 = 2*round(1e9*10*25/25) -> chi2 = 20 - 10 = 10 exactly
    assert(s.getAs[Double]("chi2") === 10.0)
    assert(math.abs(s.getAs[Double]("cramers_v") - 1.0) < 1e-12)
    // mi9 and hx9 are the SAME nano sum (2*nano(0.5*ln 2)) -> U exactly 1
    assert(s.getAs[Double]("theil_u_x") === 1.0)
    assert(s.getAs[Double]("theil_u_y") === 1.0)

    val ind = (for { x <- Seq("a", "b"); y <- Seq("1", "2"); _ <- 1 to 3 }
      yield (x, y)).toDF("x0", "y0")
    val si = Association.associationSummary(
      Association.associationCells(
        Association.contingencyCounts(ind, Nil, "x0", "y0"), Nil), Nil).collect()(0)
    assert(si.getAs[Double]("chi2") === 0.0) // each ratio term exactly 0.25
    assert(si.getAs[Double]("cramers_v") === 0.0)
    assert(si.getAs[Double]("theil_u_x") === 0.0)

    val const = (Seq(("a", "z"), ("b", "z"), ("c", "z"))).toDF("x0", "y0")
    val sc = Association.associationSummary(
      Association.associationCells(
        Association.contingencyCounts(const, Nil, "x0", "y0"), Nil), Nil).collect()(0)
    assert(sc.isNullAt(sc.fieldIndex("cramers_v"))) // min dim 1
    assert(sc.getAs[Double]("h_y") === 0.0)
    assert(sc.isNullAt(sc.fieldIndex("theil_u_y"))) // nothing to explain
  }

  test("associationMatrix: every pair row equals the pairwise summary; labels ordered") {
    val d = (1 to 60).map(i => (s"a${i % 3}", s"b${i % 4}", s"c${i % 2}"))
      .toDF("ca", "cb", "cc")
    val mat = Association.associationMatrix(d, Nil, Seq("ca", "cb", "cc"))
      .orderBy("pair").collect()
    assert(mat.map(_.getAs[String]("pair")).toSeq ===
      Seq("ca|cb", "ca|cc", "cb|cc"))
    for ((a, b) <- Seq(("ca", "cb"), ("ca", "cc"), ("cb", "cc"))) {
      val single = Association.associationSummary(
        Association.associationCells(
          Association.contingencyCounts(d, Nil, a, b), Nil), Nil).collect()(0)
      val row = mat.find(_.getAs[String]("pair") == s"$a|$b").get
      for (c <- Seq("n_x", "n_y", "n"))
        assert(row.getAs[Long](c) === single.getAs[Long](c), s"$a|$b $c")
      for (c <- Seq("chi2", "mi", "h_x", "h_y"))
        assert(row.getAs[Double](c) === single.getAs[Double](c), s"$a|$b $c")
    }
  }

  test("cmh: single stratum equals z^2 of twoProportion; paradox strata pool correctly") {
    // one stratum: CMH == (n-1)/n * z^2 — the hypergeometric variance
    // carries the finite-population (n-1), the pooled z^2 does not
    val ab = ((1 to 8).map(_ => ("s1", "A", 1L)) ++ (1 to 2).map(_ => ("s1", "A", 0L)) ++
      (1 to 2).map(_ => ("s1", "B", 1L)) ++ (1 to 8).map(_ => ("s1", "B", 0L)))
      .toDF("st", "v", "hi")
    val c1 = Association.cmh(ab, "st", "v", "hi").collect()(0)
    val z = Association.twoProportion(ab.drop("st"), Nil, "v", "hi")
      .collect()(0).getAs[Double]("z")
    assert(math.abs(c1.getAs[Double]("cmh") - z * z * 19d / 20d) < 1e-6)
    assert(c1.getAs[Long]("sum_a") === 8L)

    // two perfectly balanced strata with NO within-stratum effect:
    // CMH ~ 0 even though the pooled table shows an effect (Simpson)
    val s1 = (1 to 8).map(_ => ("x", "A", 1L)) ++ (1 to 2).map(_ => ("x", "A", 0L)) ++
      (1 to 4).map(_ => ("x", "B", 1L)) ++ (1 to 1).map(_ => ("x", "B", 0L))
    val s2 = (1 to 2).map(_ => ("y", "A", 1L)) ++ (1 to 8).map(_ => ("y", "A", 0L)) ++
      (1 to 1).map(_ => ("y", "B", 1L)) ++ (1 to 4).map(_ => ("y", "B", 0L))
    val bal = (s1 ++ s2).toDF("st", "v", "hi")
    val cb = Association.cmh(bal, "st", "v", "hi").collect()(0)
    assert(cb.getAs[Long]("n_strata") === 2L)
    assert(math.abs(cb.getAs[Double]("cmh")) < 1e-6) // identical rates within strata

    // a degenerate one-group stratum contributes nothing
    val withDegen = bal.unionAll(Seq(("z", "A", 1L), ("z", "A", 0L)).toDF("st", "v", "hi"))
    val cd = Association.cmh(withDegen, "st", "v", "hi").collect()(0)
    assert(cd.getAs[String]("var_sum9") === cb.getAs[String]("var_sum9"))
    assert(cd.getAs[Long]("n_used") === 2L && cd.getAs[Long]("n_strata") === 3L)
    assert(cd.getAs[Long]("sum_a") === cb.getAs[Long]("sum_a")) // z's a excluded whole
    assert(cd.getAs[Double]("cmh") === cb.getAs[Double]("cmh"))

    // MH common odds ratio: identical within-stratum rates -> OR = 1
    // exactly (each stratum's a*d/n == b*c/n): s1 8*1/15 vs 2*4/15
    assert(math.abs(cb.getAs[Double]("or_mh") - 1.0) < 1e-9)
    // and the separated single stratum has OR = (8*8)/(2*2) = 16
    assert(math.abs(c1.getAs[Double]("or_mh") - 16.0) < 1e-6)

    // a >2-group stratum is a contract violation: dropped WHOLE (never
    // lumped into a fake hi arm) and flagged in n_multi
    val withMulti = bal.unionAll(
      Seq(("m", "A", 1L), ("m", "B", 0L), ("m", "C", 1L), ("m", "C", 0L))
        .toDF("st", "v", "hi"))
    val cm = Association.cmh(withMulti, "st", "v", "hi").collect()(0)
    assert(cm.getAs[Long]("n_strata") === 3L)
    assert(cm.getAs[Long]("n_used") === 2L)
    assert(cm.getAs[Long]("n_multi") === 1L)
    assert(cm.getAs[String]("var_sum9") === cb.getAs[String]("var_sum9"))
    assert(cm.getAs[Long]("sum_a") === cb.getAs[Long]("sum_a"))
    assert(cm.getAs[Double]("cmh") === cb.getAs[Double]("cmh"))
    assert(cb.getAs[Long]("n_multi") === 0L)
  }

  test("cmhFromCounts over a folded contingency store equals cmh over all trials") {
    val s1 = (1 to 8).map(_ => ("x", "A", 1L)) ++ (1 to 2).map(_ => ("x", "A", 0L)) ++
      (1 to 4).map(_ => ("x", "B", 1L)) ++ (1 to 1).map(_ => ("x", "B", 0L))
    val s2 = (1 to 2).map(_ => ("y", "A", 1L)) ++ (1 to 8).map(_ => ("y", "A", 0L)) ++
      (1 to 1).map(_ => ("y", "B", 1L)) ++ (1 to 4).map(_ => ("y", "B", 0L))
    val all = (s1 ++ s2).toDF("st", "v", "hi")
    // three disjoint batches folded through the contingency merge — the
    // contingencyStream state IS the CMH streaming state
    val batches = (s1 ++ s2).zipWithIndex
    def batch(i: Int) = batches.collect { case (r, j) if j % 3 == i => r }
      .toDF("st", "v", "hi")
    val folded = (1 to 2).foldLeft(
        Association.contingencyCounts(batch(0), Seq("st"), "v", "hi")) { (acc, i) =>
      Association.mergeContingencyCounts(
        acc, Association.contingencyCounts(batch(i), Seq("st"), "v", "hi"), Seq("st"))
    }
    val fromStore = Association.cmhFromCounts(folded, "st", "x", "y", "n").collect()(0)
    val direct = Association.cmh(all, "st", "v", "hi").collect()(0)
    for (c <- Seq("n_strata", "n_used", "n_multi", "sum_a"))
      assert(fromStore.getAs[Long](c) === direct.getAs[Long](c), c)
    for (c <- Seq("e_sum9", "var_sum9"))
      assert(fromStore.getAs[String](c) === direct.getAs[String](c), c)
    assert(fromStore.getAs[Double]("cmh") === direct.getAs[Double]("cmh"))
    assert(fromStore.getAs[Double]("or_mh") === direct.getAs[Double]("or_mh"))
  }

  test("cmhFromCounts: EVERY no-quadrant trial flags — uncastable, non-0/1, NULL success") {
    // 0/1 contract violations: "x" (neither cast), "2" (casts fine but
    // is not a Bernoulli outcome), NULL (a fold that lost the outcome)
    // — 3 + 5 + 7 trials, all flagged, none silently dropped
    val counts = Seq(
      ("s", "A", "1", 4L), ("s", "A", "0", 2L),
      ("s", "B", "1", 1L), ("s", "B", "0", 3L),
      ("s", "A", "x", 3L), ("s", "B", "2", 5L), ("s", "A", null, 7L))
      .toDF("st", "g", "hi", "n")
    val r = Association.cmhFromCounts(counts, "st", "g", "hi", "n").collect()(0)
    assert(r.getAs[Long]("n_bad_success") === 15L)
    // the clean quadrants are untouched by the flagged trials
    assert(r.getAs[Long]("sum_a") === 4L)
  }

  test("mannWhitney: textbook separation, tie-heavy null, degenerate, 3-group contract") {
    // A=[1,2,3] B=[4,5,6]: 2U1 = 12-12 = 0, z = -4.5/sqrt(5.25)
    val sep = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 4L), ("B", 5L), ("B", 6L))
      .toDF("g0", "v")
    val r = Association.mannWhitney(sep, Nil, "g0", "v").collect()(0)
    assert(r.getAs[String]("u2_lo") === "0")
    assert(r.getAs[String]("u2_hi") === "18")
    assert(r.getAs[String]("var_num") === "1890") // 9*(7*6*5 - 0)
    assert(math.abs(r.getAs[Double]("z") - (-4.5 / math.sqrt(5.25))) < 1e-12)
    // complete separation downward: Cliff's delta = -1 exactly
    assert(r.getAs[Double]("cliffs_delta") === -1.0)

    // identical distributions: z exactly 0 (2U1 == n1*n2)
    val eq = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)).toDF("g0", "v")
    val re = Association.mannWhitney(eq, Nil, "g0", "v").collect()(0)
    assert(re.getAs[String]("u2_lo") === "4")
    assert(re.getAs[Double]("z") === 0.0)

    // every value tied: variance 0 -> z NULL
    val const = Seq(("A", 5L), ("A", 5L), ("B", 5L)).toDF("g0", "v")
    val rc = Association.mannWhitney(const, Nil, "g0", "v").collect()(0)
    assert(rc.getAs[String]("var_num") === "0")
    assert(rc.isNullAt(rc.fieldIndex("z")))

    // three groups: contract violation flagged, statistics NULL
    val three = Seq(("A", 1L), ("B", 2L), ("C", 3L)).toDF("g0", "v")
    val r3 = Association.mannWhitney(three, Nil, "g0", "v").collect()(0)
    assert(r3.getAs[Long]("n_groups") === 3L)
    assert(r3.isNullAt(r3.fieldIndex("z")))
    assert(r3.isNullAt(r3.fieldIndex("u2_lo")))
  }

  test("contingency counts fold: merged disjoint snapshots == rebuild") {
    val d = (1 to 40).map(i => (s"x${i % 3}", s"y${i % 4}", i)).toDF("x0", "y0", "i")
    val full = Association.contingencyCounts(d, Nil, "x0", "y0")
    val merged = Association.mergeContingencyCounts(
      Association.contingencyCounts(d.filter($"i" % 2 === 0), Nil, "x0", "y0"),
      Association.contingencyCounts(d.filter($"i" % 2 === 1), Nil, "x0", "y0"), Nil)
    assert(merged.orderBy("x", "y").collect().toSeq ===
      full.orderBy("x", "y").collect().toSeq)
  }

  // --- entropy ---------------------------------------------------------

  test("entropy: uniform 4 categories = ln 4 (nano-exact); single category = 0, norm NULL") {
    val u = (for { c <- Seq("a", "b", "c", "d"); _ <- 1 to 25 } yield c).toDF("cat")
    val h = Association.entropy(u, Nil, "cat").collect()(0)
    val expected = 4 * nano(-(0.25 * math.log(0.25)))
    assert(h.getAs[Double]("entropy") === expected.toDouble / 1e9)
    assert(math.abs(h.getAs[Double]("entropy") - math.log(4.0)) < 1e-8)

    val one = Seq.fill(10)("only").toDF("cat")
    val h1 = Association.entropy(one, Nil, "cat").collect()(0)
    assert(h1.getAs[Double]("entropy") === 0.0)
    assert(h1.isNullAt(h1.fieldIndex("entropy_norm")))
  }

  // --- Jensen-Shannon --------------------------------------------------

  test("JS divergence: identical = 0, disjoint = ln 2, symmetric") {
    val a = Seq("t1", "t1", "t2").toDF("v")
    val b = Seq("t3", "t4", "t4").toDF("v")
    assert(Association.jsStat(Association.jsDivergence(a, a, "v")) === 0.0)
    val dis = Association.jsStat(Association.jsDivergence(a, b, "v"))
    assert(math.abs(dis - math.log(2.0)) < 1e-8)
    val ba = Association.jsStat(Association.jsDivergence(b, a, "v"))
    assert(dis === ba) // symmetric term-for-term
  }

  // --- Kendall tau-b ---------------------------------------------------

  private def tau(rows: Seq[(Long, Long)]): org.apache.spark.sql.Row =
    Association.kendall(rows.toDF("x0", "y0"), Nil, "x0", "y0").collect()(0)

  test("Kendall: perfect concordance +1, reversal -1, balanced ties 0") {
    val up = tau(Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
    assert(up.getAs[java.math.BigDecimal]("c_pairs").longValueExact() === 6L)
    assert(math.abs(up.getAs[Double]("tau_b") - 1.0) < 1e-12)
    val down = tau(Seq((1L, 4L), (2L, 3L), (3L, 2L), (4L, 1L)))
    assert(down.getAs[java.math.BigDecimal]("d_pairs").longValueExact() === 6L)
    assert(math.abs(down.getAs[Double]("tau_b") + 1.0) < 1e-12)
    // x=(1,1,2,2), y=(1,2,1,2): C=1, D=1, Tx=2, Ty=2, Txy=0 -> tau 0
    val t = tau(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    assert(t.getAs[java.math.BigDecimal]("c_pairs").longValueExact() === 1L)
    assert(t.getAs[java.math.BigDecimal]("d_pairs").longValueExact() === 1L)
    assert(t.getAs[java.math.BigDecimal]("t_x").longValueExact() === 2L)
    assert(t.getAs[java.math.BigDecimal]("t_y").longValueExact() === 2L)
    assert(t.getAs[Double]("tau_b") === 0.0)
  }

  test("Kendall: tau-b undefined (NULL) when one column is constant; multiplicity via cells") {
    val const = tau(Seq((1L, 7L), (2L, 7L), (3L, 7L)))
    assert(const.isNullAt(const.fieldIndex("tau_b"))) // dy = 0
    // duplicated rows ride cell counts: 2 copies of a concordant pair
    val dup = tau(Seq((1L, 1L), (1L, 1L), (2L, 2L), (2L, 2L)))
    assert(dup.getAs[java.math.BigDecimal]("c_pairs").longValueExact() === 4L)
    assert(dup.getAs[java.math.BigDecimal]("t_xy").longValueExact() === 2L)
    assert(math.abs(dup.getAs[Double]("tau_b") - 1.0) < 1e-12)
  }

  test("Kendall cells fold: merged disjoint halves == rebuild (bit-identical)") {
    val rows = (1 to 60).map(i => ((i % 7).toLong, (i % 5).toLong, i))
    val d = rows.toDF("x0", "y0", "i")
    val full = Association.kendall(d, Nil, "x0", "y0").collect()(0)
    val mergedCells = Association.kendallCells(d.filter($"i" % 2 === 0), Nil, "x0", "y0")
      .unionByName(Association.kendallCells(d.filter($"i" % 2 === 1), Nil, "x0", "y0"))
      .groupBy("x", "y").agg(sum("n").as("n"))
    val folded = Association.kendallFromCells(mergedCells, Nil).collect()(0)
    assert(folded.toSeq === full.toSeq)
  }

  // --- corpus laws -----------------------------------------------------

  test("Zipf slope: nano-int OLS replayed over known counts") {
    // corpus with token counts w1:8 w2:4 w3:2 w4:1
    val docs = (Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++ Seq.fill(2)("w3") ++ Seq("w4"))
      .map(t => Tuple1(t)).toDF("text")
    val got = CorpusLaws.zipfSlope(docs, "text", topN = 10).collect()(0)
    assert(got.getAs[Long]("n_points") === 4L)
    // replay: rank i+1 with counts desc
    val cnts = Seq(8L, 4L, 2L, 1L)
    val lr = cnts.indices.map(i => BigInt(nano(math.log(i + 1.0))))
    val lc = cnts.map(c => BigInt(nano(math.log(c.toDouble))))
    val n = BigInt(4)
    val sx = lr.sum; val sy = lc.sum
    val sxy = lr.zip(lc).map { case (a, b) => a * b }.sum
    val sxx = lr.map(a => a * a).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    assert(got.getAs[String]("ols_num") === num.toString)
    assert(got.getAs[String]("ols_den") === den.toString)
    val slope = num.toDouble / den.toDouble
    assert(math.abs(got.getAs[Double]("slope") - slope) < 1e-12)
    // counts 8,4,2,1 over ranks 1..4 are NOT a perfect power law in
    // rank (2^-k in k, not in ln rank) -- just sanity the direction
    assert(slope < -0.5)
  }

  test("Heaps checkpoints: exact prefix totals on a hand corpus") {
    val docs = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "a b c"), (4L, "d"), (5L, "a e f")
    ).toDF("doc_id", "text")
    val got = CorpusLaws.heapsCheckpoints(docs, "doc_id", "text", minCheckpoint = 1L)
      .orderBy("ck").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ck=1: doc1 -> 2 tokens, vocab {a,b}; ck=2: +doc2 -> 4 tokens,
    // vocab {a,b,c}; ck=4: +docs3,4 -> 8 tokens, vocab {a,b,c,d}
    assert(got.toSeq === Seq((1L, 1L, 2L, 2L), (2L, 2L, 4L, 3L), (4L, 4L, 8L, 4L)))
    val beta = CorpusLaws.heapsBeta(
      CorpusLaws.heapsCheckpoints(docs, "doc_id", "text", minCheckpoint = 1L)).collect()(0)
    assert(beta.getAs[Long]("n_points") === 3L)
    val b = beta.getAs[Double]("beta")
    assert(b > 0.0 && b < 1.0) // sub-linear vocabulary growth
  }

  test("collocations: adjacency over the FILTERED token sequence; PMI/LLR replayed") {
    import graft.text.Collocations
    // "a  b" (double space) must still pair (a,b): empties filtered first
    val docs = (Seq.fill(6)("a  b") ++ Seq.fill(5)("c d") ++ Seq.fill(3)("a d"))
      .map(Tuple1(_)).toDF("text")
    val got = Collocations.collocations(docs, "text", minCount = 5L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // bigrams: (a,b) x6, (c,d) x5, (a,d) x3 -> minCount 5 keeps two
    assert(got.toSeq === Seq(("a", "b", 6L), ("c", "d", 5L)))
    val full = Collocations.collocations(docs, "text", minCount = 5L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8))).head
    // replay PMI for (a,b): B=14 bigrams, N=28 tokens, c_a=9, c_b=6
    val (_, cxy, cx, cy, b, n, pmi, llr) = full
    assert((cxy, cx, cy, b, n) === ((6L, 9L, 6L, 14L, 28L)))
    val wantPmi = math.log((6.0 / 14) / ((9.0 / 28) * (6.0 / 28)))
    assert(math.abs(pmi - wantPmi) < 1e-12)
    // replay LLR probability-form nano terms
    val (k11, k12, k21, k22) = (6L, 3L, 0L, 5L)
    val (r1, r2, c1, c2) = (9L, 5L, 6L, 8L)
    def t(k: Long, r: Long, c: Long): Long =
      if (k == 0) 0L
      else nano((k.toDouble / 14) * math.log((k.toDouble / 14) / ((r.toDouble / 14) * (c.toDouble / 14))))
    val s9 = t(k11, r1, c1) + t(k12, r1, c2) + t(k21, r2, c1) + t(k22, r2, c2)
    assert(llr === 2.0 * 14.0 * (s9.toDouble / 1e9))
    assert(llr > 0.0)
  }

  test("cooccurrence: windowed unordered pairs, short-doc guard, window=1 = unordered bigrams") {
    import graft.text.Collocations
    // "a b c d": d=1 pairs ab,bc,cd; d=2 ac,bd; d=3 ad; "x" alone: none
    val docs = (Seq.fill(6)("a b c d") :+ "x").map(Tuple1(_)).toDF("text")
    val got = Collocations.cooccurrence(docs, "text", window = 3, minCount = 5L, k = 20)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // each of the 6 distance-pairs appears once per doc = 6 times
    assert(got.toSeq === Seq(("a", "b", 6L), ("a", "c", 6L), ("a", "d", 6L),
      ("b", "c", 6L), ("b", "d", 6L), ("c", "d", 6L)))
    // PMI replay for (a,b): P=36 pairs, N=25 tokens, c_a=c_b=6
    val full = Collocations.cooccurrence(docs, "text", window = 3, minCount = 5L, k = 20)
      .collect().head
    assert(full.getAs[Long]("p_tot") === 36L)
    assert(full.getAs[Long]("n_tot") === 25L)
    val wantPmi = math.log((6.0 / 36) / ((6.0 / 25) * (6.0 / 25)))
    assert(math.abs(full.getAs[Double]("pmi") - wantPmi) < 1e-12)
    // unordered canonicalization: "b a" counts into (a, b)
    val sym = (Seq.fill(3)("a b") ++ Seq.fill(3)("b a")).map(Tuple1(_)).toDF("text")
    val gs = Collocations.cooccurrence(sym, "text", window = 2, minCount = 5L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(gs.toSeq === Seq(("a", "b", 6L)))
    // window=1 over the filtered stream == unordered adjacency counts
    val adj = Collocations.cooccurrence(docs, "text", window = 1, minCount = 5L, k = 20)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(adj.toSeq === Seq(("a", "b", 6L), ("b", "c", 6L), ("c", "d", 6L)))
  }

  test("rolling correlation: perfect linear windows are ±1, constant x is NULL, last full window equals the global r") {
    import graft.quality.Profiler
    val lin = (1 to 30).map(i => (i, i.toLong, 2L * i)).toDF("t", "x0", "y0")
    val got = Profiler.rollingCorrelation(lin, Nil, Seq("t"), "x0", "y0", window = 8)
      .orderBy("t").collect()
    assert(got.head.getLong(got.head.fieldIndex("w_n")) === 1L) // head emits
    // single-point window: dx = 0 -> NULL r
    assert(got.head.isNullAt(got.head.fieldIndex("r")))
    // sqrt(dx)*sqrt(dy) may land 1 ulp BELOW 1 for a perfect relation
    // (the clamp only caps the high side) -- tolerance, not exactness
    assert(got.drop(1).forall(r => math.abs(r.getAs[Double]("r") - 1.0) < 1e-12))
    val anti = (1 to 30).map(i => (i, i.toLong, -3L * i)).toDF("t", "x0", "y0")
    val gotA = Profiler.rollingCorrelation(anti, Nil, Seq("t"), "x0", "y0", window = 8)
      .orderBy("t").collect()
    assert(gotA.drop(1).forall(r => math.abs(r.getAs[Double]("r") + 1.0) < 1e-12))
    val const = (1 to 10).map(i => (i, 5L, i.toLong)).toDF("t", "x0", "y0")
    val gotC = Profiler.rollingCorrelation(const, Nil, Seq("t"), "x0", "y0", window = 4)
      .orderBy("t").collect()
    assert(gotC.forall(_.isNullAt(gotC.head.fieldIndex("r"))))
    // law: window >= series length makes the LAST row's r the global r
    val rows = (1 to 12).map(i => (i, (i * i % 7).toLong, (3 * i % 5).toLong))
    val d = rows.toDF("t", "x0", "y0")
    val lastR = Profiler.rollingCorrelation(d, Nil, Seq("t"), "x0", "y0", window = 12)
      .orderBy("t").collect().last.getAs[Double]("r")
    val globalR = Profiler.correlation(d, Nil, "x0", "y0").collect()(0).getAs[Double]("r")
    assert(lastR === globalR)
  }

  // --- EWMA ------------------------------------------------------------

  test("EWMA: constant series reproduces the value exactly at every row incl. the head") {
    val d = (1 to 50).map(i => ("k", i, 7L)).toDF("k", "t", "v")
    val got = TimeSeries.ewmaChart(d, Seq("k"), Seq("t"), "v", target = 7L, band = 1L)
      .orderBy("t").collect()
    assert(got.length === 50)
    // num/den = 7*W/W -- including the first row (den = w_0 only);
    // both sides cast DECIMAL(~1e19) -> double before the divide, so
    // allow the cast ulp (q198 finding), not exact 7.0
    assert(got.forall(r => math.abs(r.getAs[Double]("ewma") - 7.0) < 1e-9))
    assert(got.forall(r => !r.getAs[Boolean]("breach_hi") && !r.getAs[Boolean]("breach_lo")))
  }

  test("EWMA: kernel replay on a step change, breach flags are exact integer compares") {
    // 40 zeros then 10 tens; lambda=1/4 -> after the step the chart
    // climbs toward 10 at rate 1-(3/4)^j
    val vals = Seq.fill(40)(0L) ++ Seq.fill(10)(10L)
    val d = vals.zipWithIndex.map { case (v, i) => ("k", i, v) }.toDF("k", "t", "v")
    val got = TimeSeries.ewmaChart(d, Seq("k"), Seq("t"), "v", target = 0L, band = 5L)
      .orderBy("t").collect()
    val weights = (0 until 32).map(k => BigInt(math.pow(3.0, k).toLong) * (BigInt(1) << (2 * (31 - k))))
    def expected(i: Int): Double = {
      val lags = (0 until 32).filter(k => i - k >= 0)
      val num = lags.map(k => weights(k) * BigInt(vals(i - k))).sum
      val den = lags.map(weights(_)).sum
      num.toDouble / den.toDouble
    }
    for (i <- Seq(0, 5, 39, 40, 41, 45, 49))
      assert(math.abs(got(i).getAs[Double]("ewma") - expected(i)) < 1e-9, s"row $i")
    // breach_hi fires when num > (0+5)*den, i.e. ewma crosses 5:
    // 1-(3/4)^j > 0.5 first at j=3 (row 42)
    assert(!got(41).getAs[Boolean]("breach_hi"))
    assert(got(42).getAs[Boolean]("breach_hi"))
  }

  // --- Fellegi-Sunter --------------------------------------------------

  test("Fellegi-Sunter: weights replayed from exact collision u; all-agree pair scores sum of agreement weights") {
    // 6 records, two identical pairs on every field
    val d = Seq(
      (1L, "aa:x", "en", 1L, "s1"), (2L, "aa:x", "en", 1L, "s1"),
      (3L, "bb:y", "de", 2L, "s2"), (4L, "bb:y", "de", 2L, "s2"),
      (5L, "cc:z", "fr", 3L, "s3"), (6L, "dd:w", "zh", 4L, "s4")
    ).toDF("id", "k", "lang", "len_b", "source")
    val got = Linkage.fellegiSunter(d, "id", "k", Seq("lang", "len_b", "source"),
      window = 2, prefixLen = 2, m = 0.95,
      upperN9 = 2_000_000_000L, lowerN9 = -2_000_000_000L)
      .orderBy("id_a", "id_b").collect()
    // u per field: lang counts (2,2,1,1): raw = 2+2 = 4, den = 30
    def w(raw: Long, den: Long, agree: Boolean): Long = {
      val num = math.max(1L, math.min(raw, den - 1))
      if (agree) nano(math.log(0.95 * den.toDouble / num.toDouble))
      else nano(math.log((1.0 - 0.95) * den.toDouble / (den - num).toDouble))
    }
    val allAgree = (w(4, 30, agree = true) * 3).toDouble / 1e9
    val pair12 = got.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(pair12.getAs[Boolean]("agree_lang"))
    assert(pair12.getAs[Double]("score") === allAgree)
    assert(pair12.getAs[String]("decision") === "link")
    // every emitted decision is consistent with its score vs thresholds
    got.foreach { r =>
      val s9 = math.round(r.getAs[Double]("score") * 1e9)
      val want = if (s9 >= 2_000_000_000L) "link"
        else if (s9 <= -2_000_000_000L) "non_link" else "possible"
      assert(r.getAs[String]("decision") === want)
    }
  }
}
