package graft

import graft.operators.RankEval
import org.apache.spark.sql.functions.lit

/** Retrieval-metric invariants (q143 gates the cross-engine replay over
  * real retrievers; these gate the metric algebra on hand-built lists).
  */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def lists(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "neighbor_id", "rank")

  test("perfect, partial, disjoint, and silently-empty retrievers") {
    val truth = lists(
      (1L, 101L, 1), (1L, 102L, 2),
      (2L, 201L, 1), (2L, 202L, 2),
      (3L, 301L, 1),
      (4L, 401L, 1))
    val results = lists(
      (1L, 101L, 1), (1L, 102L, 2),   // perfect
      (2L, 999L, 1), (2L, 202L, 2),   // partial: first hit at rank 2
      (3L, 888L, 1))                   // disjoint; query 4 missing entirely
    val got = RankEval.perQuery(results, truth, k = 5)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 2L, 1),
      (2L, 2L, 2L, 1L, 2),
      (3L, 1L, 1L, 0L, -1),
      (4L, 0L, 1L, 0L, -1))) // empty retriever keeps its row
    val sum = RankEval.summary(results, truth, k = 5).head()
    assert(sum.getLong(0) == 4L && sum.getLong(1) == 3L && sum.getLong(2) == 6L)
    assert(sum.getDouble(3) == 0.5)
    // MRR: reciprocal ranks 1/1 (q1) + 1/2 (q2), misses contribute 0,
    // divided by ALL 4 queries
    assert(sum.getDouble(4) == 1.5 / 4)
  }

  test("results-only queries keep a row (n_truth = 0), symmetric with truth-only") {
    val truth = lists((1L, 101L, 1))
    val results = lists((1L, 101L, 1), (7L, 700L, 1)) // query 7 has no ground truth
    val got = RankEval.perQuery(results, truth, k = 5)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 1L, 1L, 1L), (7L, 1L, 0L, 0L)))
  }

  test("confusion counts: quadrants exact, unlabeled predictions dropped") {
    val preds = Seq((1L, true), (2L, true), (3L, false), (4L, false), (9L, true))
      .toDF("id", "predicted")
    val labels = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("id", "label")
    val c = RankEval.confusion(preds, labels, "id").head()
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3)) ==
      ((1L, 1L, 1L, 1L))) // id 9 has no label -> not counted anywhere
    assert(c.getLong(4) == 4L) // n_rows: tp+fp+fn+tn == n_rows invariant
  }

  test("confusion: NULL prediction/label rows are excluded, not silently zeroed") {
    val preds = Seq((1L, Some(true)), (2L, None), (3L, Some(false)))
      .toDF("id", "predicted")
    val labels = Seq((1L, Some(true)), (2L, Some(true)), (3L, None))
      .toDF("id", "label")
    val c = RankEval.confusion(preds, labels, "id").head()
    // only id 1 is fully labeled; ids 2/3 are excluded AND visible via n_rows
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4)) ==
      ((1L, 0L, 0L, 0L, 1L)))
  }

  test("ndcg: pinned discounts, hand-computed golden, perfect == 1.0, tie-break invariance") {
    // the discount table is DATA — pin the head so a drift in its
    // generation breaks loudly (floor(1e9 / log2(i+1)))
    assert(RankEval.ndcgDiscounts.take(5).toSeq ==
      Seq(1000000000L, 630929753L, 500000000L, 430676558L, 386852807L))
    val truth = Seq((1L, 11L, 3L), (1L, 12L, 2L), (1L, 13L, 1L))
      .toDF("query_id", "neighbor_id", "rel")
    val results = lists((1L, 12L, 1), (1L, 11L, 2), (1L, 99L, 3)) // unjudged at rank 3
    val d = RankEval.ndcgDiscounts
    val row = RankEval.ndcg(results, truth, k = 5).head()
    val expDcg = 2 * d(0) + 3 * d(1) // rel(12)=2 at rank 1, rel(11)=3 at rank 2
    val expIdcg = 3 * d(0) + 2 * d(1) + 1 * d(2)
    assert(row.getLong(1) == expDcg && row.getLong(2) == expIdcg)
    assert(row.getDouble(3) == expDcg.toDouble / expIdcg.toDouble)
    // ideal ordering retrieved exactly -> ndcg == 1.0 bit-for-bit
    val perfect = lists((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3))
    assert(RankEval.ndcg(perfect, truth, k = 5).head().getDouble(3) == 1.0)
    // equal-rel tie-break permutes adjacent discounts only: idcg invariant
    val truthTied = Seq((1L, 11L, 2L), (1L, 12L, 2L), (1L, 13L, 1L))
      .toDF("query_id", "neighbor_id", "rel")
    val truthTiedRev = Seq((1L, 12L, 2L), (1L, 11L, 2L), (1L, 13L, 1L))
      .toDF("query_id", "neighbor_id", "rel")
    assert(RankEval.ndcg(perfect, truthTied, 5).head().getLong(2) ==
      RankEval.ndcg(perfect, truthTiedRev, 5).head().getLong(2))
    // a query with truth but no results keeps its row with dcg 0, ndcg 0
    val twoQ = truth.union(Seq((2L, 21L, 1L)).toDF("query_id", "neighbor_id", "rel"))
    val q2 = RankEval.ndcg(results, twoQ, 5).filter($"query_id" === 2L).head()
    assert(q2.getLong(1) == 0L && q2.getDouble(3) == 0.0)
    // a query with results but NO truth keeps its row too (full outer —
    // the perQuery symmetry): idcg absent -> NULL, ndcg NULL, dcg 0
    // (every retrieved neighbor is unjudged)
    val extra = results.union(lists((9L, 901L, 1)))
    val q9 = RankEval.ndcg(extra, truth, 5).filter($"query_id" === 9L).head()
    assert(q9.getLong(1) == 0L && q9.isNullAt(2) && q9.isNullAt(3))
  }

  test("auc: hand-computed Mann–Whitney pair counts, ties half, degenerate classes NULL") {
    val preds = Seq((1L, 10L), (2L, 8L), (3L, 8L), (4L, 5L), (5L, 3L), (6L, 1L))
      .toDF("id", "score")
    val labels = Seq((1L, true), (2L, false), (3L, true), (4L, true),
      (5L, false), (6L, false)).toDF("id", "label")
    // 3×3 pairs: concordant 7 (pos outscores), tied 1 (both at 8),
    // discordant 1 (5 < 8) -> AUC = (2·7 + 1) / (2·9) = 15/18
    val r = RankEval.auc(preds, labels, "id", "score").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 3L, 7L, 1L, 1L)))
    assert(r.getDouble(5) == 15.0 / 18.0)
    // all scores equal: every pair tied, AUC exactly 0.5
    val flat = RankEval.auc(preds.withColumn("score", lit(7L)), labels, "id", "score").head()
    assert(flat.getLong(3) == 9L && flat.getDouble(5) == 0.5)
    // perfect separation: AUC exactly 1.0
    val sep = Seq((1L, 9L), (3L, 8L), (4L, 7L), (2L, 2L), (5L, 1L), (6L, 0L))
      .toDF("id", "score")
    assert(RankEval.auc(sep, labels, "id", "score").head().getDouble(5) == 1.0)
    // one class empty -> counts exact, auc NULL (no 0/0 NaN)
    val onePos = RankEval.auc(preds, labels.withColumn("label", lit(true)),
      "id", "score").head()
    assert(onePos.getLong(0) == 6L && onePos.getLong(1) == 0L && onePos.isNullAt(5))
    // NULL score/label rows excluded before counting, unlabeled ids dropped
    val withNull = preds.union(Seq((7L, Option.empty[Long])).toDF("id", "score"))
      .union(Seq((99L, 50L)).toDF("id", "score"))
    val labNull = labels.union(Seq((7L, Option.empty[Boolean])).toDF("id", "label"))
    val rn = RankEval.auc(withNull, labNull, "id", "score").head()
    assert((rn.getLong(0), rn.getLong(1)) == ((3L, 3L)) && rn.getDouble(5) == 15.0 / 18.0)
  }

  test("auc histogram folds: merge over disjoint batches equals the rebuild exactly") {
    val labels = Seq((1L, true), (2L, false), (3L, true), (4L, true),
      (5L, false), (6L, false)).toDF("id", "label")
    val all = Seq((1L, 10L), (2L, 8L), (3L, 8L), (4L, 5L), (5L, 3L), (6L, 1L))
      .toDF("id", "score")
    val batch1 = all.filter($"id" <= 3)
    val batch2 = all.filter($"id" > 3)
    val folded = RankEval.mergeAucHistogram(
      RankEval.aucHistogram(batch1, labels, "id", "score"),
      RankEval.aucHistogram(batch2, labels, "id", "score"))
    val rebuilt = RankEval.aucHistogram(all, labels, "id", "score")
    def h(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    assert(h(folded) == h(rebuilt))
    // shared score 8 split across batches must SUM, not duplicate
    assert(h(folded).count(_._1 == 8L) == 1)
    // the AUC from the folded state is the full-corpus AUC bit-for-bit
    val a = RankEval.aucFromHistogram(folded).head()
    val b = RankEval.auc(all, labels, "id", "score").head()
    assert(a.toSeq == b.toSeq && a.getDouble(5) == 15.0 / 18.0)
  }

  test("cohen kappa: hand-computed golden, never-agreed category still in pe, constant judge NULL") {
    import graft.operators.RankEval
    // classic 2x2: a=(x,x):20 (x,y):5 (y,x):10 (y,y):15, N=50
    // po = 35/50; R_x=25 C_x=30, R_y=25 C_y=20 -> pe_num = 750+500 = 1250
    // kappa = (50*35 - 1250)/(2500 - 1250) = 500/1250 = 0.4
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    val r = RankEval.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getDecimal(2).longValueExact(), r.getLong(3)) ==
      ((50L, 35L, 1250L, 700000L)))
    assert(r.getDouble(4) == 0.4)
    // a category BOTH judges use but NEVER agree on must still reach pe:
    // (x,z):1 and (z,x):1 -- no (z,z) cell, yet R_z*C_z = 1 contributes
    val sk = Seq(("x", "z"), ("z", "x"), ("x", "x")).toDF("a", "b")
    val r2 = RankEval.cohenKappa(sk, "a", "b").head()
    // N=3, agree=1; R_x=2 C_x=2, R_z=1 C_z=1 -> pe_num = 5
    assert((r2.getLong(0), r2.getLong(1), r2.getDecimal(2).longValueExact()) ==
      ((3L, 1L, 5L)))
    assert(math.abs(r2.getDouble(4) - (3.0 * 1 - 5) / (9.0 - 5)) < 1e-15)
    // both judges constant and identical: pe_num == N^2, kappa NULL
    val const = Seq.fill(4)(("k", "k")).toDF("a", "b")
    val r3 = RankEval.cohenKappa(const, "a", "b").head()
    assert(r3.getLong(1) == 4L && r3.isNullAt(4))
    // NULL-labeled rows are excluded
    val withNull = rows.toDF("a", "b")
      .unionByName(Seq((null.asInstanceOf[String], "x")).toDF("a", "b"))
    assert(RankEval.cohenKappa(withNull, "a", "b").head().getLong(0) == 50L)
  }

  test("calibration: explicit integer bucket edges, exact counts, NULLs excluded") {
    // 10 rows, 5 buckets -> 2 rows each; scores already sorted by
    // (score, id); positives concentrate in the top buckets
    val preds = (1 to 10).map(i => (i.toLong, i.toLong * 10)).toDF("id", "score")
    val labels = (1 to 10).map(i => (i.toLong, i > 6)).toDF("id", "label")
    val got = RankEval.calibration(preds, labels, "id", "score", "label", nBuckets = 5)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, 10L, 20L), (2L, 2L, 0L, 30L, 40L), (3L, 2L, 0L, 50L, 60L),
      (4L, 2L, 2L, 70L, 80L), (5L, 2L, 2L, 90L, 100L)))
    // non-divisible n: buckets differ by at most one row and cover all rows
    val p7 = (1 to 7).map(i => (i.toLong, i.toLong)).toDF("id", "score")
    val l7 = (1 to 7).map(i => (i.toLong, true)).toDF("id", "label")
    val sizes = RankEval.calibration(p7, l7, "id", "score", nBuckets = 3)
      .collect().map(r => r.getLong(1))
    assert(sizes.sum == 7L && sizes.max - sizes.min <= 1)
    // a NULL label row is excluded entirely, not zero-counted
    val ln = Seq((1L, Some(true)), (2L, None: Option[Boolean])).toDF("id", "label")
    val pn = Seq((1L, 5L), (2L, 6L)).toDF("id", "score")
    assert(RankEval.calibration(pn, ln, "id", "score", nBuckets = 2)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).head().getLong(0) == 1L)
  }

  test("k truncates both sides") {
    val truth = lists((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3))
    val results = lists((1L, 13L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val at2 = RankEval.perQuery(results, truth, k = 2).head()
    // truth@2 = {11,12}; results@2 = {13,11} -> one hit, first at rank 2
    assert(at2.getLong(3) == 1L && at2.getInt(4) == 2)
  }

  test("rbo: identical lists ~1, disjoint exactly 0, hand-computed k=2, top-weighting") {
    import spark.implicits._
    def ranked(ids: Seq[String]) =
      ids.zipWithIndex.map { case (id, i) => (id, i + 1) }.toDF("id", "rank")
    val s5 = ranked(Seq("a", "b", "c", "d", "e"))
    val same = RankEval.rbo(s5, s5, "id", "rank", k = 5).head()
    assert(same.getLong(1) == 5L, "overlap@5 = 5")
    assert(math.abs(same.getDouble(3) - 1.0) < 1e-12, s"identical ext ${same.getDouble(3)}")
    val disj = RankEval.rbo(s5, ranked(Seq("v", "w", "x", "y", "z")), "id", "rank", 5).head()
    assert(disj.getLong(1) == 0L && disj.getDouble(2) == 0.0 && disj.getDouble(3) == 0.0)
    // hand case k=2: S=[a,b], T=[a,c]: X1=1, X2=1 ->
    // base = 0.1*(1*1 + 0.9*0.5) = 0.145; ext = base + 0.81*0.5 = 0.55
    val h = RankEval.rbo(ranked(Seq("a", "b")), ranked(Seq("a", "c")), "id", "rank", 2).head()
    assert(math.abs(h.getDouble(2) - 0.145) < 1e-12 && math.abs(h.getDouble(3) - 0.55) < 1e-12)
    // top-weighting: agreeing at the TOP scores higher than agreeing at
    // the BOTTOM for the same overlap count
    val top = RankEval.rbo(ranked(Seq("a", "x", "y")), ranked(Seq("a", "u", "v")), "id", "rank", 3).head()
    val bot = RankEval.rbo(ranked(Seq("x", "y", "a")), ranked(Seq("u", "v", "a")), "id", "rank", 3).head()
    assert(top.getDouble(3) > bot.getDouble(3))
  }

  test("krippendorffAlpha: hand golden 4/9, perfect = 1, single-rating units drop, one-label NULL") {
    import spark.implicits._
    // units {a,a}, {a,b}, {b,b}: D_o = 2/6, D_e = 18/30, alpha = 4/9
    val r = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (3L, "b"))
      .toDF("u", "l")
    val out = RankEval.krippendorffAlpha(r, "u", "l").collect()(0)
    assert(out.getAs[Long]("n_units") === 3L)
    assert(out.getAs[Long]("n_pairable") === 6L)
    assert(out.getAs[String]("obs9") === "2000000000")
    assert(out.getAs[String]("de_num") === "18")
    assert(math.abs(out.getAs[Double]("alpha") - 4d / 9d) < 1e-9)

    // a unit rated once has no pairable values: identical alpha
    val withSingle = r.unionAll(Seq((4L, "a")).toDF("u", "l"))
    val o2 = RankEval.krippendorffAlpha(withSingle, "u", "l").collect()(0)
    assert(o2.getAs[Long]("n_units") === 3L)
    assert(math.abs(o2.getAs[Double]("alpha") - 4d / 9d) < 1e-9)

    // perfect agreement across 3 annotators: alpha = 1 exactly
    val perfect = (1 to 5).flatMap(u => Seq.fill(3)((u.toLong, s"lab${u % 2}")))
      .toDF("u", "l")
    val op = RankEval.krippendorffAlpha(perfect, "u", "l").collect()(0)
    assert(op.getAs[String]("obs9") === "0")
    assert(op.getAs[Double]("alpha") === 1.0)

    // one label in the whole panel: D_e = 0, alpha NULL
    val mono = (1 to 3).flatMap(u => Seq.fill(2)((u.toLong, "x"))).toDF("u", "l")
    val om = RankEval.krippendorffAlpha(mono, "u", "l").collect()(0)
    assert(om.isNullAt(om.fieldIndex("alpha")))
  }

  test("fleissKappa: hand golden 1/3, perfect = 1, incomplete units drop, one-label NULL") {
    // u1 {a,a}, u2 {a,b}, u3 {b,b} at m=2: A = 10-6 = 4, P = 2/3;
    // margins 3/3 -> B = 18, Pe = 1/2; kappa = (2/3 - 1/2)/(1/2) = 1/3
    val d = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (3L, "b"))
      .toDF("u", "l")
    val r = RankEval.fleissKappa(d, "u", "l", m = 2).collect()(0)
    assert(r.getAs[Long]("n_units") == 3L && r.getAs[Long]("m") == 2L)
    assert(r.getAs[String]("p_num") == "4" && r.getAs[String]("pe_num") == "18")
    assert(math.abs(r.getAs[Double]("kappa") - 1d / 3d) < 1e-12)
    // incomplete units (1 and 3 ratings) drop whole and are flagged;
    // the kept statistic is unchanged
    val ragged = d.unionAll(Seq((4L, "a"), (5L, "a"), (5L, "b"), (5L, "b"))
      .toDF("u", "l"))
    val rr = RankEval.fleissKappa(ragged, "u", "l", m = 2).collect()(0)
    assert(rr.getAs[Long]("n_units") == 3L && rr.getAs[Long]("n_incomplete") == 2L)
    assert(math.abs(rr.getAs[Double]("kappa") - 1d / 3d) < 1e-12)
    // perfect agreement = exactly 1
    val perf = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")).toDF("u", "l")
    assert(RankEval.fleissKappa(perf, "u", "l", m = 2)
      .collect()(0).getAs[Double]("kappa") == 1d)
    // one label total: no chance correction -> NULL
    val one = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")).toDF("u", "l")
    val or = RankEval.fleissKappa(one, "u", "l", m = 2).collect()(0)
    assert(or.isNullAt(or.fieldIndex("kappa")))
  }

  // --- isotonic calibration ---------------------------------------------

  private def isoCells(rows: Seq[(Long, Long, Long)]) = {
    import org.apache.spark.sql.functions.col
    rows.toDF("bucket", "n", "n_pos")
      .withColumn("s9", (col("bucket") * col("n") * 100000000L)
        .cast("decimal(38,0)"))
  }

  test("isotonic: hand golden — the classic 0/1/0.5 pooling") {
    val out = RankEval.isotonicCalibration(isoCells(Seq(
      (0L, 2L, 0L), (1L, 2L, 2L), (2L, 2L, 1L)))).orderBy("bucket").collect()
    assert(out.map(_.getAs[Double]("rate_iso")).toSeq === Seq(0d, 0.75d, 0.75d))
    assert(out.map(_.getAs[Boolean]("pooled")).toSeq ===
      Seq(false, true, true))
    assert(out.map(_.getAs[Double]("rate_raw")).toSeq === Seq(0d, 1d, 0.5d))
  }

  test("isotonic: already-monotone rates are fixed points; fit is always monotone; mean preserved") {
    val mono = RankEval.isotonicCalibration(isoCells(Seq(
      (0L, 4L, 0L), (1L, 4L, 1L), (2L, 4L, 2L), (3L, 4L, 4L))))
      .orderBy("bucket").collect()
    mono.foreach { r =>
      assert(math.abs(r.getAs[Double]("rate_iso") -
        r.getAs[Double]("rate_raw")) < 1e-12)
      assert(!r.getAs[Boolean]("pooled"))
    }
    val rnd = new scala.util.Random(20260823L)
    for (trial <- 0 until 5) {
      val rows = (0 until 6 + rnd.nextInt(6)).map { b =>
        val n = 1L + rnd.nextInt(9)
        (b.toLong, n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val out = RankEval.isotonicCalibration(isoCells(rows))
        .orderBy("bucket").collect()
      val fit = out.map(_.getAs[Double]("rate_iso"))
      fit.zip(fit.tail).foreach { case (a, b) =>
        assert(b >= a - 1e-12, s"trial $trial not monotone: ${fit.toSeq}") }
      // the isotonic projection preserves the weighted total
      val tot = out.map(r => r.getAs[Long]("n") * r.getAs[Double]("rate_iso")).sum
      assert(math.abs(tot - rows.map(_._3).sum) < 1e-6,
        s"trial $trial mean not preserved: $tot vs ${rows.map(_._3).sum}")
    }
  }

  test("isotonic: minimax equals the sequential PAVA sweep (differential fuzz)") {
    // independent driver-side pool-adjacent-violators over (n, sum)
    def pava(rows: Seq[(Long, Long)]): Seq[Double] = {
      case class Block(n: Long, s: Long)
      val st = scala.collection.mutable.ArrayBuffer.empty[(Block, Int)]
      for ((n, s) <- rows) {
        var blk = Block(n, s); var cnt = 1
        while (st.nonEmpty &&
          st.last._1.s.toDouble / st.last._1.n >= blk.s.toDouble / blk.n) {
          val (p, c) = st.remove(st.size - 1)
          blk = Block(p.n + blk.n, p.s + blk.s); cnt += c
        }
        st.append((blk, cnt))
      }
      st.toSeq.flatMap { case (b, c) =>
        Seq.fill(c)(b.s.toDouble / b.n) }
    }
    val rnd = new scala.util.Random(20260824L)
    for (trial <- 0 until 6) {
      val rows = (0 until 5 + rnd.nextInt(8)).map { b =>
        val n = 1L + rnd.nextInt(12)
        (b.toLong, n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val out = RankEval.isotonicCalibration(isoCells(rows))
        .orderBy("bucket").collect()
      val want = pava(rows.map(r => (r._2, r._3)))
      out.map(_.getAs[Double]("rate_iso")).zip(want).zipWithIndex.foreach {
        case ((got, w), i) =>
          assert(math.abs(got - w) < 1e-12, s"trial $trial bucket $i: $got vs $w")
      }
    }
  }

  test("isotonic: the bucket-cardinality bound is enforced") {
    val big = isoCells((0 until 200).map(b => (b.toLong, 2L, 1L)))
    intercept[IllegalArgumentException] {
      RankEval.isotonicCalibration(big)
    }
  }

  test("isotonic: q376 fixture adequacy — a real violation pools at sf0.01") {
    val out = graft.queries.CoreQueries.q376IsotonicFit(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.length >= 5)
    val fit = out.map(_.getAs[Double]("rate_iso"))
    fit.zip(fit.tail).foreach { case (a, b) => assert(b >= a - 1e-12) }
    assert(out.exists(_.getAs[Boolean]("pooled")),
      "the near-flat label rate must force real pooling")
  }
}
