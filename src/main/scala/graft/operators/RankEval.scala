package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the measurement half every ANN/BM25
  * deployment needs next to the retrievers themselves: approximate
  * results scored against exact ground truth as recall@k and
  * first-relevant-rank (the integer core of MRR). Standard IR
  * methodology (TREC's recall/MRR family, public since forever), kept
  * ENGINE-EXACT: every per-query metric is an integer (hit counts,
  * ranks), so the q143 gate compares them hash-exactly; float
  * aggregates (mean recall, MRR) are one-division summaries a caller
  * derives from the integer columns.
  *
  * Scale shape: both inputs are (query_id, neighbor_id, rank) top-k
  * lists — k rows per query, never corpus-sized; the join is
  * query-keyed and the roll-up is one aggregation.
  */
object RankEval {

  /** Per-query metrics of `results` against `truth` (both
    * (query_id, neighbor_id, rank), ranks 1-based): hits_at_k =
    * |results@k ∩ truth@k|, first_hit_rank = smallest result rank whose
    * neighbor is in truth@k (NULL if none), n_results, n_truth.
    * Queries present on only ONE side keep a row: truth-only queries
    * score 0 hits (a silently-empty retriever must not vanish from its
    * own evaluation), and results-only queries keep n_truth = 0 (a
    * retriever answering a query with no ground truth is visible too —
    * full outer join, symmetric by construction).
    */
  def perQuery(results: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val r = results.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val t = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val joined = r.join(t.withColumn("__hit", lit(1)),
      Seq("query_id", "neighbor_id"), "left")
    val perQ = joined.groupBy("query_id")
      .agg(
        count(lit(1)).as("n_results"),
        sum(coalesce(col("__hit"), lit(0)).cast("long")).as("hits_at_k"),
        min(when(col("__hit").isNotNull, col("rank"))).as("first_hit_rank"))
    val truthCounts = t.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
    truthCounts.join(perQ, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        coalesce(col("n_results"), lit(0L)).as("n_results"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        col("first_hit_rank"))
  }

  /** One-row summary: total hits / total truth as recall@k (single
    * division), plus MRR over the queries with a hit (sum of exact
    * reciprocals — a float mean, fine for dashboards, NOT gate-safe;
    * gate on [[perQuery]]'s integers).
    */
  def summary(results: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val pq = perQuery(results, truth, k)
    pq.agg(
      count(lit(1)).as("n_queries"),
      sum(col("hits_at_k")).as("total_hits"),
      sum(col("n_truth")).as("total_truth"),
      sum(when(col("first_hit_rank").isNotNull,
        lit(1.0) / col("first_hit_rank"))).as("__rr_sum"))
      .select(col("n_queries"), col("total_hits"), col("total_truth"),
        (col("total_hits").cast("double") / col("total_truth").cast("double"))
          .as("recall_at_k"),
        (coalesce(col("__rr_sum"), lit(0.0)) / col("n_queries")).as("mrr"))
  }

  /** Graded-relevance evaluation (nDCG@k) with PINNED integer discounts.
    * The log2 discount is the classic ln-rule problem (no cross-engine
    * ulp contract), so the discounts are not computed by either engine:
    * [[ndcgDiscounts]] is a fixed table d_i = floor(10^9 / log2(i+1))
    * evaluated ONCE with StrictMath (bit-exact by Java spec) and treated
    * as DATA — the q149 oracle receives these exact integers as spliced
    * literals. DCG/IDCG are then exact 64-bit sums (rel ≤ 2^10, k ≤ 64,
    * d ≤ 10^9 keeps every sum far under 2^53), and ndcg is ONE division
    * of two exact longs — bit-identical on any IEEE engine.
    */
  val NdcgScale: Long = 1000000000L
  val MaxNdcgRank: Int = 64
  lazy val ndcgDiscounts: Array[Long] =
    (1 to MaxNdcgRank).map(i =>
      (NdcgScale / (StrictMath.log(i + 1.0) / StrictMath.log(2.0))).toLong).toArray

  /** Per-query nDCG@k of `results` (query_id, neighbor_id, rank) against
    * graded `truth` (query_id, neighbor_id, relCol ≥ 0). DCG sums
    * rel·d_rank over the result list (unjudged neighbors score 0); IDCG
    * re-ranks the truth by (rel desc, neighbor_id) — the tie-break only
    * permutes equal-rel rows across adjacent discounts, so the SUM is
    * tie-break-invariant. Queries present on only ONE side keep a row
    * (full outer join — the perQuery symmetry): truth-only queries get
    * dcg 0, and results-only queries surface with idcg NULL; ndcg is
    * NULL when idcg is absent or 0 (no positive relevance to normalize
    * by — emitting NaN/inf would be engine-divergent).
    */
  def ndcg(
      results: DataFrame,
      truth: DataFrame,
      k: Int,
      relCol: String = "rel"
  ): DataFrame = {
    require(k > 0 && k <= MaxNdcgRank, s"k must be in [1, $MaxNdcgRank]: $k")
    val dArr = array(ndcgDiscounts.take(k).map(lit): _*)
    val r = results.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val t = truth.select(col("query_id"), col("neighbor_id"),
      col(relCol).cast("long").as("__rel"))
    val dcg = r.join(t, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"),
        (coalesce(col("__rel"), lit(0L)) *
          element_at(dArr, col("rank").cast("int"))).as("__g"))
      .groupBy("query_id").agg(sum(col("__g")).as("dcg_scaled"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__rel").desc, col("neighbor_id"))
    val idcg = t.withColumn("__ir", row_number().over(w))
      .filter(col("__ir") <= k)
      .select(col("query_id"),
        (col("__rel") * element_at(dArr, col("__ir"))).as("__g"))
      .groupBy("query_id").agg(sum(col("__g")).as("idcg_scaled"))
    idcg.join(dcg, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        coalesce(col("dcg_scaled"), lit(0L)).as("dcg_scaled"),
        col("idcg_scaled"),
        when(col("idcg_scaled") > 0,
          coalesce(col("dcg_scaled"), lit(0L)).cast("double") /
            col("idcg_scaled").cast("double")).as("ndcg"))
  }

  /** Score-calibration buckets — the honesty report behind any
    * threshold choice: rows ranked by (score, id), cut into `nBuckets`
    * EXPLICIT integer-arithmetic buckets (bucket = (rank−1)·B div n + 1
    * — not ntile, whose remainder-distribution rule is an engine
    * implementation detail), each reporting exact row/positive counts
    * and the actual min/max score. A well-calibrated scorer shows
    * positives monotone in bucket; a cliff says the margin is a vote,
    * not a probability. All integers and data values — fully
    * hash-gateable when scores are integers (the NBSVM margins are).
    *
    * The global rank runs in ONE partition by construction — fine for a
    * labeled EVAL set (bounded by labeling budget), not for corpus-wide
    * scores; sample first if you must calibrate at corpus scale.
    */
  def calibration(
      predictions: DataFrame,
      labels: DataFrame,
      idCol: String,
      scoreCol: String,
      labelCol: String = "label",
      nBuckets: Int = 10
  ): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(scoreCol), col(idCol))
    // the total rides the SAME sorted window as the rank (unbounded
    // frame) — a separate partitionBy(lit(1)) window would plan a
    // second exchange + sort over the same rows
    val all = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    predictions.select(col(idCol), col(scoreCol))
      .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("bucket",
        expr(s"(CAST(__rn AS BIGINT) - 1) * $nBuckets div __n + 1"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        min(col(scoreCol)).as("min_score"),
        max(col(scoreCol)).as("max_score"))
  }

  /** Binary-classifier confusion counts — the classifier-side twin of
    * [[perQuery]]: predictions joined to labels on `idCol`, one row of
    * exact-integer tp/fp/fn/tn (precision/recall/F1 are single
    * divisions a caller derives; the INTEGERS are what a hash gate can
    * certify). Ids present on only one side are dropped (inner join —
    * an unlabeled prediction is not a mistake, it is missing truth).
    * Rows with a NULL prediction or NULL label are excluded BEFORE the
    * counts (a NULL would otherwise fall out of every when() quadrant
    * and silently undercount); the `n_rows` column counts the rows that
    * were scored, so tp+fp+fn+tn == n_rows is a checkable invariant.
    */
  /** Exact ROC-AUC by Mann–Whitney pair counting — the threshold-free
    * ranking metric next to [[confusion]] (one threshold's quadrants)
    * and [[calibration]] (bucketed honesty): over all positive×negative
    * pairs, concordant = pairs the positive outscores, tied = equal
    * scores, discordant = the rest — ALL EXACT LONGS, counted via
    * per-distinct-score cumulative sums (never pair enumeration), and
    * AUC = (2·concordant + tied) / (2·n_pos·n_neg) is ONE division of
    * two exact integers (ties count half, the Mann–Whitney convention)
    * — bit-identical on any IEEE engine, so the q168 gate hashes it.
    * AUC is NULL when either class is empty (0/0 would be
    * engine-divergent NaN).
    *
    * Rows joined on `idCol` (inner — unlabeled predictions are missing
    * truth, the confusion contract); NULL score/label rows are excluded
    * before counting. The cumulative window is global-ordered but runs
    * over the per-DISTINCT-SCORE frame, bounded by score cardinality
    * (integer classifier margins), not rows — the calibration scale
    * caveat applies only when scores are near-unique at corpus scale.
    */
  def auc(
      predictions: DataFrame,
      labels: DataFrame,
      idCol: String,
      scoreCol: String,
      labelCol: String = "label"
  ): DataFrame =
    aucFromHistogram(aucHistogram(predictions, labels, idCol, scoreCol, labelCol))

  /** The MERGEABLE state behind [[auc]]: per-distinct-score positive /
    * negative counts `(score, np, nn)` — plain sums, so two histograms
    * over DISJOINT row sets fold by [[mergeAucHistogram]] into exactly
    * the rebuild's histogram (spec-asserted), the incremental contract
    * every count-shaped metric here honors. Persist it (score-cardinality
    * rows) and a new eval batch folds forward without re-scoring history;
    * like the CMS/bottom-k folds, the sum-merge is NON-idempotent — crash
    * replays recompute the batch, never re-merge it.
    */
  def aucHistogram(
      predictions: DataFrame,
      labels: DataFrame,
      idCol: String,
      scoreCol: String,
      labelCol: String = "label"
  ): DataFrame =
    predictions.select(col(idCol), col(scoreCol))
      .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("score"))
      .agg(
        sum(col(labelCol).cast("long")).as("np"),
        sum((!col(labelCol)).cast("long")).as("nn"))

  /** Fold two [[aucHistogram]] frames over disjoint row sets. */
  def mergeAucHistogram(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("score")
      .agg(sum("np").as("np"), sum("nn").as("nn"))

  /** The [[auc]] tail from a (merged) histogram — cumulative-sum pair
    * counting over the score-cardinality frame only. */
  def aucFromHistogram(hist: DataFrame): DataFrame = {
    val below = org.apache.spark.sql.expressions.Window.orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    hist.select(col("score"), col("np").as("__np"), col("nn").as("__nn"))
      .withColumn("__negBelow", coalesce(sum(col("__nn")).over(below), lit(0L)))
      .agg(
        sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__np") * col("__negBelow")).as("concordant"),
        sum(col("__np") * col("__nn")).as("tied"))
      .select(
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("tied"), lit(0L)).as("tied"))
      .withColumn("discordant",
        col("n_pos") * col("n_neg") - col("concordant") - col("tied"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (lit(2L) * col("concordant") + col("tied")).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
  }

  /** The MERGEABLE state behind probability calibration — the missing
    * eval twin of [[aucHistogram]]: AUC certifies RANKING (does the
    * scorer order positives above negatives), calibration certifies
    * MEANING (does "0.8" happen 80% of the time) — a scorer can ace one
    * and fail the other, and every threshold/budget decision downstream
    * of an LLM-judge score leans on the second. Scores bucketed on
    * FIXED [lo, hi) equi-width bins (the Profiler.histogram convention:
    * < lo → −1, ≥ hi → nBuckets — probability 1.0 lands in the
    * overflow bucket, deliberately visible), each cell carrying exact
    * n / n_pos and the nano-landed score sum s9 = Σ round(score·10⁹)
    * (an exact DECIMAL integer — the state stays hash-exact and
    * additive). [[mergeCalibrationCells]] folds disjoint eval batches;
    * bucket cardinality is the store bound. NON-idempotent sum-merge
    * (the [[aucHistogram]] crash-replay contract).
    */
  def calibrationCells(
      predictions: DataFrame,
      labels: DataFrame,
      idCol: String,
      scoreCol: String,
      labelCol: String = "label",
      nBuckets: Int = 10,
      lo: Double = 0.0,
      hi: Double = 1.0
  ): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    require(lo < hi, s"need lo < hi: [$lo, $hi)")
    val dec = "decimal(38,0)"
    val w = (hi - lo) / nBuckets
    val s = col(scoreCol)
    predictions.select(col(idCol), col(scoreCol))
      .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
      .filter(s.isNotNull && col(labelCol).isNotNull)
      .withColumn("bucket",
        when(s < lo, lit(-1L))
          .when(s >= hi, lit(nBuckets.toLong))
          .otherwise(floor((s - lo) / w).cast("long")))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(round(s * 1e9d).cast("long").cast(dec)).as("s9"))
  }

  /** Fold two [[calibrationCells]] frames over disjoint eval batches. */
  def mergeCalibrationCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket")
      .agg(sum("n").as("n"), sum("n_pos").as("n_pos"), sum("s9").as("s9"))

  /** Expected calibration error + the Murphy (1973) Brier decomposition
    * from a (folded) [[calibrationCells]] frame — the one-row honesty
    * panel:
    *
    *   ECE = Σ_b (n_b/N)·|acc_b − conf_b|,  MCE = max_b |acc_b − conf_b|
    *   REL = Σ (n_b/N)(conf_b − acc_b)²   (reliability — calibration)
    *   RES = Σ (n_b/N)(acc_b − base)²     (resolution — discrimination)
    *   UNC = base(1 − base),  binned Brier = REL − RES + UNC
    *
    * Exactness: per bucket n_b·(acc_b − conf_b) = n_pos_b·10⁹ − s9_b in
    * nano units — an EXACT DECIMAL integer — so ECE's numerator
    * Σ|gap9_b| is exact and ECE is ONE division. MCE and the REL/RES
    * terms are fixed per-bucket dags nano-landed and summed order-free
    * (the house rule); UNC is one division of exact counts. NULL panel
    * when N = 0. SCALE: everything runs on the ≤ nBuckets+2-row frame.
    */
  def expectedCalibrationError(cells: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val gap9 = col("n_pos").cast(dec) * lit(1000000000L).cast(dec) - col("s9")
    val all = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val withTot = cells
      .withColumn("__N", sum("n").over(all))
      .withColumn("__P", sum("n_pos").over(all))
    val nD = col("__N").cast("double"); val pD = col("__P").cast("double")
    val nbD = col("n").cast("double")
    val gD = gap9.cast("double") / 1e9d
    // rel_b = (gap/1e9)²/n_b ≤ n_b; res_b = n_b·(acc_b − base)²
    val rel9 = round(gD * gD / nbD * 1e9d).cast("long")
    val accMinusBase = (col("n_pos").cast(dec) * col("__N").cast(dec) -
      col("n").cast(dec) * col("__P").cast(dec)).cast("double") / (nbD * nD)
    val res9 = round(nbD * accMinusBase * accMinusBase * 1e9d).cast("long")
    val mceB = abs(gap9.cast("double")) / (nbD * 1e9d)
    withTot
      .withColumn("__absGap9", abs(gap9))
      .withColumn("__rel9", rel9)
      .withColumn("__res9", res9)
      .withColumn("__mceB", mceB)
      .agg(
        max("__N").as("n_total"),
        max("__P").as("n_pos"),
        count(lit(1)).as("n_bins"),
        sum(col("__absGap9")).as("__eceNum"),
        max("__mceB").as("__mce"),
        sum(col("__rel9").cast(dec)).as("__rel"),
        sum(col("__res9").cast(dec)).as("__res"))
      .withColumn("__ok", col("n_total").isNotNull && col("n_total") > 0L)
      .withColumn("ece",
        when(col("__ok"), col("__eceNum").cast("double") /
          (col("n_total").cast("double") * 1e9d)))
      .withColumn("mce", when(col("__ok"), col("__mce")))
      .withColumn("brier_rel",
        when(col("__ok"), col("__rel").cast("double") / 1e9d /
          col("n_total").cast("double")))
      .withColumn("brier_res",
        when(col("__ok"), col("__res").cast("double") / 1e9d /
          col("n_total").cast("double")))
      .withColumn("brier_unc",
        when(col("__ok"),
          col("n_pos").cast("double") *
            (col("n_total") - col("n_pos")).cast("double") /
            (col("n_total").cast("double") * col("n_total").cast("double"))))
      .withColumn("brier_binned",
        when(col("__ok"), col("brier_rel") - col("brier_res") + col("brier_unc")))
      .select(col("n_total"), col("n_pos"), col("n_bins"), col("ece"),
        col("mce"), col("brier_rel"), col("brier_res"), col("brier_unc"),
        col("brier_binned"))
  }

  /** Hosmer–Lemeshow goodness-of-fit (Hosmer & Lemeshow 1980, the
    * fixed-bin H statistic) from the same [[calibrationCells]] state —
    * the TEST beside [[expectedCalibrationError]]'s effect size:
    *
    *   χ² = Σ_b (O_b − E_b)² · n_b / (E_b · (n_b − E_b)),  E_b = Σ scores
    *
    * ~ χ²_{B−2} under "the probabilities are honest". Degenerate
    * buckets (E_b ≤ 0 or E_b ≥ n_b — expected counts of 0) carry no
    * finite term: skipped and COUNTED in n_degenerate, never silently
    * absorbed. Per-bucket terms are fixed dags over the exact cell
    * integers, nano-landed, summed order-free; χ² gates at 9dp, NULL
    * when fewer than 3 usable buckets (df ≤ 0).
    */
  def hosmerLemeshow(cells: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    // E in nano units is s9 exactly; O − E in nano is gap9
    val gap9 = col("n_pos").cast(dec) * lit(1000000000L).cast(dec) - col("s9")
    val usable = col("s9") > 0L && col("s9") < col("n").cast(dec) * lit(1000000000L).cast(dec)
    val gD = gap9.cast("double") / 1e9d
    val eD = col("s9").cast("double") / 1e9d
    val t9 = when(usable,
      round(gD * gD * col("n").cast("double") /
        (eD * (col("n").cast("double") - eD)) * 1e9d).cast("long"))
      .otherwise(0L)
    cells
      .withColumn("__t9", t9)
      .withColumn("__usable", when(usable, 1L).otherwise(0L))
      .agg(
        coalesce(sum("n"), lit(0L)).as("n_total"),
        coalesce(sum("__usable"), lit(0L)).as("n_bins_used"),
        coalesce(sum(lit(1L) - col("__usable")), lit(0L)).as("n_degenerate"),
        sum(col("__t9").cast(dec)).as("__chi9"))
      .withColumn("df",
        when(col("n_bins_used") >= 3L, col("n_bins_used") - 2L))
      .withColumn("chi2",
        when(col("n_bins_used") >= 3L, col("__chi9").cast("double") / 1e9d))
      .select(col("n_total"), col("n_bins_used"), col("n_degenerate"),
        col("df"), col("chi2"))
  }

  /** Isotonic (monotone) calibration fit from the SAME
    * [[calibrationCells]] state — the RECALIBRATION MAP the
    * [[expectedCalibrationError]] card says you need: the
    * least-squares monotone-nondecreasing fit of the per-bucket
    * positive rate against score order (Ayer et al. 1955's pool
    * adjacent violators; Zadrozny & Elkan 2002 for classifier
    * calibration).
    *
    * NOT the sequential PAVA sweep: the fit evaluates the CLOSED-FORM
    * MINIMAX characterization
    *
    *   fit_i = max_{j ≤ i} min_{k ≥ i} (P_k − P_{j−1}) / (N_k − N_{j−1})
    *
    * (cumulative positives P / counts N — Robertson, Wright & Dykstra
    * 1988 §1.2), which is a pure max/min fold over (j, i, k) bucket
    * triples — B³/6 rows on a BOUNDED bucket frame, no iteration, no
    * order-dependent pooling state, and both engines replay it as two
    * bounded joins + two extrema. Every candidate average is the same
    * double division of the same exact integers in both engines, so
    * the extrema pick identical values (ties in value are ties — only
    * the value is read, never an argmin). Weighted-mean preservation
    * (Σ n·fit = Σ n_pos — isotonic projection preserves the total) and
    * minimax == sequential-PAVA are spec-pinned.
    *
    * Emits one row per OCCUPIED bucket in score order: bucket, n,
    * n_pos, conf (mean score), rate_raw, rate_iso, pooled (did the fit
    * move this bucket — a monotonicity violation lived here). The
    * underflow/overflow buckets (−1 / nBuckets) participate in order —
    * they ARE scores, just clipped ones.
    *
    * SCALE: the cell frame is bucket-bounded (≤ [[IsotonicMaxBuckets]],
    * enforced) and localizes once ([[graft.quality.AbDashboard
    * .materialize]] — the eager-execution contract); the triple frame
    * is ≤ B³ local rows. The one row-scale pass is the upstream
    * [[calibrationCells]] aggregation.
    */
  def isotonicCalibration(cells: DataFrame): DataFrame = {
    val local = graft.quality.AbDashboard.materialize(
      cells.filter(col("n") > 0L))
    val b = local.count()
    require(b <= IsotonicMaxBuckets,
      s"isotonicCalibration is bounded at $IsotonicMaxBuckets buckets, got $b")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = local.select(col("bucket"), col("n"), col("n_pos"), col("s9"))
      .withColumn("__cn", sum("n").over(w))
      .withColumn("__cp", sum("n_pos").over(w))
    val iFrame = cum.select(col("bucket").as("__i"), col("n"), col("n_pos"),
      col("s9"))
    val jFrame = cum.select(col("bucket").as("__j"),
      (col("__cn") - col("n")).as("__nj"), (col("__cp") - col("n_pos")).as("__pj"))
    val kFrame = cum.select(col("bucket").as("__k"),
      col("__cn").as("__nk"), col("__cp").as("__pk"))
    // (j <= i <= k) triples over the bounded local frame; every avg the
    // same double division of the same exact longs in both engines
    val triples = iFrame
      .join(jFrame, col("__j") <= col("__i"))
      .join(kFrame, col("__k") >= col("__i"))
      .withColumn("__avg",
        (col("__pk") - col("__pj")).cast("double") /
          (col("__nk") - col("__nj")).cast("double"))
    val innerMin = triples
      .groupBy(col("__i"), col("n"), col("n_pos"), col("s9"), col("__j"))
      .agg(min("__avg").as("__mj"))
    val fit = innerMin
      .groupBy(col("__i"), col("n"), col("n_pos"), col("s9"))
      .agg(max("__mj").as("rate_iso"))
    val nF = col("n").cast("double")
    fit
      .withColumn("conf", col("s9").cast("double") / 1e9d / nF)
      .withColumn("rate_raw", col("n_pos").cast("double") / nF)
      .withColumn("pooled",
        round(col("rate_iso") * 1e9d).cast("long") =!=
          round(col("rate_raw") * 1e9d).cast("long"))
      .select(col("__i").as("bucket"), col("n"), col("n_pos"), col("conf"),
        col("rate_raw"), col("rate_iso"), col("pooled"))
  }

  /** The [[isotonicCalibration]] bucket-cardinality bound: B³ local
    * rows must stay trivially small.
    */
  val IsotonicMaxBuckets: Long = 128L

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between two
    * CATEGORICAL judges over the same items: with contingency counts
    * n_ab, marginals R_a / C_b and N items,
    * κ = (N·Σ n_aa − Σ_a R_a·C_a) / (N² − Σ_a R_a·C_a) — the
    * (po − pe)/(1 − pe) definition cross-multiplied into ONE division of
    * exact integers (products in DECIMAL(38,0): marginal products at
    * 100 TB counts overflow a long). The pipeline use: do the heuristic
    * filter and the learned classifier agree beyond what their base
    * rates force — raw agreement flatters judges that both say "keep"
    * 95% of the time.
    *
    * Rows with a NULL label on either side are excluded. Output:
    * n_items, n_agree, agree_ppm (exact floor), pe_num = Σ R_a·C_a, and
    * κ (NULL when N² == pe_num — a constant judge has no chance
    * correction, 0/0 would be engine-divergent). Landis–Koch reading:
    * < 0.2 slight, 0.2–0.4 fair, 0.4–0.6 moderate, 0.6–0.8 substantial.
    * Scale shape: one grouped count on (a, b) — category²-sized after
    * the map-side combine; everything downstream is marginal-frame
    * arithmetic.
    */
  def cohenKappa(
      ratings: DataFrame,
      labelACol: String,
      labelBCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val cnt = ratings
      .filter(col(labelACol).isNotNull && col(labelBCol).isNotNull)
      .groupBy(col(labelACol).cast("string").as("__a"),
        col(labelBCol).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rowTot = cnt.groupBy("__a").agg(sum("__n").as("__ra"))
    val colTot = cnt.groupBy("__b").agg(sum("__n").as("__cb"))
    // pe carries ONE R_a·C_a term per category BOTH judges use — joined
    // on the marginals, NOT summed over diagonal cells: a category the
    // judges never agree on has no (a, a) cell yet still contributes
    val pe = rowTot.join(colTot, col("__a") === col("__b"))
      .agg(sum(col("__ra").cast(dec) * col("__cb").cast(dec)).as("pe_num"))
    val tot = cnt.agg(
      sum(col("__n")).as("n_items"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L)).as("n_agree"))
    tot.crossJoin(broadcast(pe))
      .select(
        coalesce(col("n_items"), lit(0L)).as("n_items"),
        coalesce(col("n_agree"), lit(0L)).as("n_agree"),
        coalesce(col("pe_num"), lit(0).cast(dec)).as("pe_num"))
      .withColumn("agree_ppm",
        when(col("n_items") > 0, expr("(n_agree * 1000000L) div n_items")))
      .withColumn("kappa", {
        val n = col("n_items").cast(dec)
        val num = n * col("n_agree").cast(dec) - col("pe_num")
        val den = n * n - col("pe_num")
        when(den =!= lit(0).cast(dec), num.cast("double") / den.cast("double"))
      })
  }

  /** Krippendorff's alpha, nominal data (Krippendorff 1970/2004) — the
    * agreement coefficient [[cohenKappa]] can't be: ANY number of
    * annotators, MISSING ratings tolerated (a unit rated once simply
    * has no pairable values and drops), one number for the whole panel.
    * Input is LONG form: one row per (unit, rating); annotator identity
    * is irrelevant under nominal α (only the per-unit label multiset
    * matters).
    *
    *   D_o = Σ_u (m_u² − Σ_v n_uv²)/(m_u − 1) / N    (N = Σ m_u, m_u ≥ 2)
    *   D_e = (N² − Σ_v n_v²) / (N(N−1))
    *   α   = 1 − D_o/D_e
    *
    * Determinism: each unit's disagreement term has its OWN (m_u − 1)
    * denominator, so the per-unit term is nano-scaled to a long
    * (round(1e9·(m²−Σn²)/(m−1)) — a fixed dag per unit) and summed
    * order-free in DECIMAL (a long sum could clip past ~10⁹ units);
    * margins and D_e stay exact integers; α is a fixed dag over the
    * pieces, gated at 9 decimals. NULL α when D_e = 0 (one label total
    * — nothing to disagree about). Label margins count KEPT units only
    * (the m_u ≥ 2 filter precedes them — Krippendorff's own rule).
    *
    * SCALE: (unit, label) counts are map-side combined; everything
    * after is unit- or label-cardinality bookkeeping; no window, no
    * join beyond two 1-row crosses.
    */
  /** Cronbach's α (Cronbach 1951): internal CONSISTENCY of k numeric
    * scorers over the same units — "do these k quality signals measure
    * one underlying thing", the scale-reliability read beside
    * [[krippendorffAlpha]]'s categorical agreement and
    * [[graft.quality.Association.friedman]]'s systematic-difference
    * test (three different questions over the same judge panel):
    *
    *   α = k/(k−1) · (1 − ΣV_j / V_T)
    *
    * with V_j = n·Σx_j² − (Σx_j)² each judge's exact DECIMAL variance
    * numerator and V_T the same for the per-unit TOTAL score — both
    * share the n(n−1) denominator, so the ratio is exact integer over
    * integer, α one fixed dag at 9dp. COMPLETE units only (every judge
    * exactly once — the [[graft.quality.Association.friedman]] rule);
    * incomplete units drop whole into `n_incomplete`. NULL when k < 2,
    * n < 2, or V_T = 0. Values cast long (integer-units contract).
    * SCALE: one unit-total aggregation + one per-judge moments
    * aggregation; the judge universe and the completeness flag are
    * broadcast 1-row frames inside the dag (r12 ran them as two
    * separate driver count jobs; folded r13). One row out.
    */
  def cronbachAlpha(
      ratings: DataFrame,
      unitCol: String,
      judgeCol: String,
      valueCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val obs = ratings
      .filter(col(unitCol).isNotNull && col(judgeCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(unitCol).cast("string").as("__u"),
        col(judgeCol).cast("string").as("__j"),
        col(valueCol).cast("long").as("__v"))
    // the judge universe as a broadcast 1-row frame — part of the dag,
    // not a driver count job
    val kUni = obs.agg(countDistinct("__j").as("__k"))
    val unitProfile = obs.groupBy("__u")
      .agg(countDistinct("__j").as("__kd"), count(lit(1)).as("__cnt"))
      .crossJoin(broadcast(kUni))
      .withColumn("__complete",
        col("__kd") === col("__k") && col("__cnt") === col("__k"))
    val meta = unitProfile.agg(
      coalesce(max("__k"), lit(0L)).as("__k"),
      coalesce(sum(when(col("__complete"), 0L).otherwise(1L)), lit(0L))
        .as("__ninc"))
    val kept = obs.join(
      unitProfile.filter(col("__complete")).select("__u"), Seq("__u"), "left_semi")
    val vD = col("__v").cast(dec)
    val perJudge = kept.groupBy("__j")
      .agg(count(lit(1)).as("__n"), sum(vD).as("__s"), sum(vD * vD).as("__q"))
      .withColumn("__vj", col("__n").cast(dec) * col("__q") - col("__s") * col("__s"))
      .agg(max("__n").as("n_units"),
        sum("__vj").as("__sumvj"))
    val totals = kept.groupBy("__u").agg(sum("__v").as("__t"))
      .agg(count(lit(1)).as("__nt"),
        sum(col("__t").cast(dec)).as("__st"),
        sum(col("__t").cast(dec) * col("__t").cast(dec)).as("__qt"))
      .withColumn("__vt", col("__nt").cast(dec) * col("__qt") - col("__st") * col("__st"))
      .select("__vt")
    val kDbl = col("__k").cast("double")
    perJudge.crossJoin(broadcast(totals)).crossJoin(broadcast(meta))
      .withColumn("k", col("__k"))
      .withColumn("n_incomplete", col("__ninc"))
      .withColumn("sum_var_num", col("__sumvj").cast("string"))
      .withColumn("total_var_num", col("__vt").cast("string"))
      .withColumn("alpha",
        when(col("__k") >= 2L && col("n_units") >= 2L && col("__vt") > 0L,
          kDbl / (kDbl - 1d) *
            (lit(1d) - col("__sumvj").cast("double") / col("__vt").cast("double"))))
      .select("k", "n_units", "n_incomplete", "sum_var_num", "total_var_num", "alpha")
  }

  def krippendorffAlpha(
      ratings: DataFrame,
      unitCol: String,
      labelCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = ratings
      .filter(col(unitCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(unitCol).as("__u"), col(labelCol).cast("string").as("__v"))
      .agg(count(lit(1)).as("__n"))
    val units = cells.groupBy("__u")
      .agg(sum("__n").as("__m"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__sq"))
      .filter(col("__m") >= 2L)
    val mD = col("__m").cast(dec)
    val term9 = round(
      (mD * mD - col("__sq")).cast("double") /
        (col("__m").cast("double") - 1d) * 1e9d).cast("long")
    val obs = units.agg(
      count(lit(1)).as("n_units"),
      sum("__m").as("n_pairable"),
      sum(term9.cast(dec)).as("__obs9"))
    val margins = cells
      .join(units.select("__u"), Seq("__u"), "left_semi")
      .groupBy("__v").agg(sum("__n").as("__nv"))
      .agg(sum(col("__nv").cast(dec) * col("__nv").cast(dec)).as("__sqv"))
    val nD = col("n_pairable").cast(dec)
    obs.crossJoin(broadcast(margins))
      .withColumn("obs9", col("__obs9").cast("string"))
      .withColumn("de_num", (nD * nD - col("__sqv")).cast("string"))
      .withColumn("d_obs",
        col("__obs9").cast("double") / 1e9d / col("n_pairable").cast("double"))
      .withColumn("d_exp",
        (nD * nD - col("__sqv")).cast("double") /
          (nD * (nD - 1)).cast("double"))
      .withColumn("alpha",
        when((nD * nD - col("__sqv")) > 0L && col("n_pairable") > 1L,
          lit(1d) - col("d_obs") / col("d_exp")))
      .select("n_units", "n_pairable", "obs9", "de_num", "d_obs", "d_exp", "alpha")
  }

  /** Weighted Cohen's kappa (Cohen 1968): chance-corrected agreement of
    * two ORDINAL judges where near-misses count — plain κ
    * ([[cohenKappa]]) scores "4 vs 5" and "1 vs 5" as equally wrong,
    * which is the wrong read for graded quality labels; κ_w weights
    * each disagreement cell by w_ij = (i−j)² (quadratic, the default —
    * equivalent to an ICC) or |i−j| (linear):
    *
    *   κ_w = 1 − Σ w_ij·O_ij / Σ w_ij·E_ij
    *       = 1 − N·Σ w_ij·O_ij / Σ w_ij·R_i·C_j    (one division)
    *
    * with O the observed contingency counts, R/C the marginals — every
    * numerator an exact DECIMAL integer (weights are integer by
    * construction; marginal products at 100 TB counts overflow a long),
    * so κ_w is integer-over-integer, hash-gateable. Labels must cast to
    * long (ordinal levels — the integer-units contract); rows where
    * either side's cast fails or is NULL are excluded. NULL κ_w when
    * the expected weighted disagreement is 0 (both judges constant on
    * the same level). Scale shape: one (a, b) count aggregation
    * (category²-sized after map-side combine) + marginal-frame
    * arithmetic, the [[cohenKappa]] shape.
    */
  def weightedKappa(
      ratings: DataFrame,
      labelACol: String,
      labelBCol: String,
      quadratic: Boolean = true
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val a = expr(s"try_cast(`$labelACol` AS BIGINT)")
    val b = expr(s"try_cast(`$labelBCol` AS BIGINT)")
    val cnt = ratings
      .filter(a.isNotNull && b.isNotNull)
      .groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1)).as("__n"))
    def w(i: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) = {
      val d = abs(i - j).cast(dec)
      if (quadratic) d * d else d
    }
    val rowTot = cnt.groupBy("__a").agg(sum("__n").as("__ra"))
    val colTot = cnt.groupBy("__b").agg(sum("__n").as("__cb"))
    // expected weighted disagreement: the categories² marginal grid
    // (bounded by contract), never a data-sized join
    val we = rowTot.crossJoin(colTot)
      .agg(coalesce(sum(w(col("__a"), col("__b")) *
        col("__ra").cast(dec) * col("__cb").cast(dec)), lit(0L).cast(dec))
        .as("we_num"))
    val wo = cnt.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n_items"),
      coalesce(sum(w(col("__a"), col("__b")) * col("__n").cast(dec)),
        lit(0L).cast(dec)).as("__wo"))
    wo.crossJoin(broadcast(we))
      .withColumn("kappa_w",
        when(col("we_num") > 0L,
          lit(1d) - (col("__wo") * col("n_items").cast(dec)).cast("double") /
            col("we_num").cast("double")))
      .withColumn("wo_num", (col("__wo") * col("n_items").cast(dec)).cast("string"))
      .withColumn("we_num", col("we_num").cast("string"))
      .select("n_items", "wo_num", "we_num", "kappa_w")
  }

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement of a FIXED
    * panel of m raters over n units with categorical labels — the
    * missing member between [[cohenKappa]] (exactly two raters) and
    * [[krippendorffAlpha]] (any raggedness): the "did our m judges
    * agree beyond base rates" read when every unit is rated exactly m
    * times. Rater identity is irrelevant (only each unit's label
    * multiset enters — the α rule). With per-(unit, label) counts
    * n_uv, category margins c_v = Σ_u n_uv and N = n·m:
    *
    *   P̄  = (Σ_u Σ_v n_uv² − N) / (n·m(m−1))      (observed agreement)
    *   P̄e = Σ_v c_v² / N²                          (chance agreement)
    *   κ  = (P̄ − P̄e)/(1 − P̄e)
    *      = (A·N² − B·D₁) / (D₁·(N² − B))          (one division)
    *
    * with A = Σn_uv² − N and B = Σc_v² EXACT DECIMAL integers and
    * D₁ = n·m(m−1) — κ is integer-over-integer, bit-identical on any
    * engine, gated by hash. Units rated ≠ m times drop WHOLE into
    * `n_incomplete` (flag, never guess — the Friedman/Cronbach
    * completeness rule; Fleiss' own fixed-m requirement); margins count
    * kept units only. NULL κ when N² = B (all mass on one category — no
    * chance correction) or no units survive. SCALE: (unit, label)
    * counts map-side combine; everything after is unit- or
    * label-cardinality bookkeeping + broadcast 1-row crosses (the
    * in-dag probe discipline — no driver count jobs). One row out:
    * n_units, m, n_incomplete, p_num/pe_num digit strings, p_obs,
    * p_exp, kappa.
    */
  def fleissKappa(
      ratings: DataFrame,
      unitCol: String,
      labelCol: String,
      m: Int
  ): DataFrame = {
    require(m >= 2, s"fleissKappa needs m >= 2 raters per unit: $m")
    val dec = "decimal(38,0)"
    val cells = ratings
      .filter(col(unitCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(unitCol).as("__u"), col(labelCol).cast("string").as("__v"))
      .agg(count(lit(1)).as("__n"))
    val units = cells.groupBy("__u")
      .agg(sum("__n").as("__mu"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__sq"))
    val meta = units.agg(
      coalesce(sum(when(col("__mu") === m.toLong, 0L).otherwise(1L)), lit(0L))
        .as("__ninc"))
    val keptUnits = units.filter(col("__mu") === m.toLong)
    val obs = keptUnits.agg(
      count(lit(1)).as("n_units"),
      coalesce(sum("__sq"), lit(0L).cast(dec)).as("__sumsq"))
    val margins = cells
      .join(keptUnits.select("__u"), Seq("__u"), "left_semi")
      .groupBy("__v").agg(sum("__n").as("__cv"))
      .agg(coalesce(sum(col("__cv").cast(dec) * col("__cv").cast(dec)),
        lit(0L).cast(dec)).as("__b"))
    val nU = col("n_units").cast(dec)
    val bigN = nU * m.toLong // N = n·m
    val a = col("__sumsq") - bigN
    val d1 = nU * (m.toLong * (m.toLong - 1L))
    val n2 = bigN * bigN
    obs.crossJoin(broadcast(margins)).crossJoin(broadcast(meta))
      .withColumn("m", lit(m.toLong))
      .withColumn("n_incomplete", col("__ninc"))
      .withColumn("p_num", a.cast("string"))
      .withColumn("pe_num", col("__b").cast("string"))
      .withColumn("p_obs",
        when(col("n_units") > 0L, a.cast("double") / d1.cast("double")))
      .withColumn("p_exp",
        when(col("n_units") > 0L, col("__b").cast("double") / n2.cast("double")))
      .withColumn("kappa",
        when(col("n_units") > 0L && n2 =!= col("__b"),
          (a * n2 - col("__b") * d1).cast("double") /
            (d1 * (n2 - col("__b"))).cast("double")))
      .select("n_units", "m", "n_incomplete", "p_num", "pe_num",
        "p_obs", "p_exp", "kappa")
  }

  def confusion(
      predictions: DataFrame,
      labels: DataFrame,
      idCol: String,
      predCol: String = "predicted",
      labelCol: String = "label"
  ): DataFrame =
    predictions.select(col(idCol), col(predCol))
      .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
      .filter(col(predCol).isNotNull && col(labelCol).isNotNull)
      .agg(
        sum(when(col(predCol) && col(labelCol), 1L).otherwise(0L)).as("tp"),
        sum(when(col(predCol) && !col(labelCol), 1L).otherwise(0L)).as("fp"),
        sum(when(!col(predCol) && col(labelCol), 1L).otherwise(0L)).as("fn"),
        sum(when(!col(predCol) && !col(labelCol), 1L).otherwise(0L)).as("tn"),
        count(lit(1)).as("n_rows"))

  /** 0.9^d for d = 0..20, by repeated double multiplication — PINNED
    * literals (the BenfordPpm rule: constants are data), shared verbatim
    * with the q199 oracle so the [[rbo]] weight table is bit-identical
    * cross-engine.
    */
  val RboP: Double = 0.9
  val RboPPow: Seq[Double] = Seq(
    1.0, 0.9, 0.81, 0.7290000000000001, 0.6561000000000001,
    0.5904900000000002, 0.5314410000000002, 0.47829690000000014,
    0.43046721000000016, 0.38742048900000015, 0.34867844010000015,
    0.31381059609000017, 0.28242953648100017, 0.25418658283290013,
    0.22876792454961012, 0.2058911320946491, 0.1853020188851842,
    0.16677181699666577, 0.1500946352969992, 0.13508517176729928,
    0.12157665459056936)

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    * top-k rankings — "how similar are these two retrievers' ANSWER
    * LISTS", top-weighted (disagreement at rank 1 costs more than at
    * rank 20): RBO = (1−p)·Σ_d p^(d−1)·A_d with agreement
    * A_d = |S∩T within depth d| / d, persistence p = 0.9 pinned. The
    * index-migration diagnostic recall@k can't give (recall needs
    * truth; RBO compares two systems directly — did the new index
    * change what users actually see).
    *
    * Engine-exact by construction: X_d (the depth-d overlap) is an
    * integer; each term is w_d · (X_d / d) with w_d from the PINNED
    * [[RboPPow]] table; the depth sum is a FIXED-ORDER left fold over
    * the d-sorted term array (IEEE addition is order-sensitive — an
    * unordered SQL sum would be engine-divergent; the oracle replays
    * the same prepend-0 fold), rbo_base = 0.1 · sum one multiply, and
    * rbo_ext adds the standard p^k·A_k extrapolation. The gate hashes
    * both.
    *
    * Inputs: (idCol, rankCol) frames, ranks 1-based; rows past k are
    * ignored. Both frames are top-k-list-sized — everything here is
    * bounded by k, never the corpus.
    */
  def rbo(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      rankCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1 && k < RboPPow.length, s"k must be in [1, ${RboPPow.length - 1}]: $k")
    val spark = a.sparkSession
    import spark.implicits._
    val sa = a.select(col(idCol).as("__id"), col(rankCol).as("__ra"))
      .filter(col("__ra") <= k)
    val sb = b.select(col(idCol).as("__id"), col(rankCol).as("__rb"))
      .filter(col("__rb") <= k)
    val matched = sa.join(sb, "__id")
      .select(greatest(col("__ra"), col("__rb")).as("m"))
    val weights = (1 to k).map(d => (d, RboPPow(d - 1))).toDF("d", "w")
    val terms = broadcast(weights)
      .join(matched, col("m") <= col("d"), "left")
      .groupBy("d", "w")
      .agg(count(col("m")).as("xd"))
      .select(col("d"), col("xd"),
        (col("w") * (col("xd").cast("double") / col("d").cast("double"))).as("term"))
    terms.agg(
        aggregate(
          sort_array(collect_list(struct(col("d"), col("term")))),
          lit(0.0), (acc, s) => acc + s.getField("term")).as("__sum"),
        max(when(col("d") === k, col("xd"))).as("overlap_k"))
      .select(
        lit(k).as("k"), col("overlap_k"),
        (lit(0.1) * col("__sum")).as("rbo_base"),
        (lit(0.1) * col("__sum") +
          lit(RboPPow(k)) * (col("overlap_k").cast("double") / lit(k.toDouble)))
          .as("rbo_ext"))
  }
}
