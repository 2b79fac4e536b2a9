package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiple-testing control for the monitoring battery. A pipeline that
  * runs the drift/association family across hundreds of (table, column,
  * slice) cells every night fires false alarms at the per-test α rate —
  * the standing dashboard needs the battery-level correction, not
  * another per-test statistic.
  */
object MultipleTesting {

  private val dec = "decimal(38,0)"

  /** Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg
    * 1995): order the battery's p-values ascending, find the largest
    * rank i with p_(i) ≤ i·α/m, reject tests 1..i. Controls the
    * expected false-discovery RATE at α — the right guarantee for "of
    * the alarms we page on tonight, what fraction are noise", where
    * Bonferroni's familywise bound silences everything at scale.
    *
    * EXACT: p-values arrive nano-scaled (`p9`, a long count of 1e-9 —
    * the house transcendental surface), α = alphaNum/alphaDen is a
    * rational, and the step condition is the integer cross-product
    * p9·m·alphaDen ≤ rank·alphaNum·1e9 in DECIMAL — no float boundary
    * decides a rejection. Rank ties break by `idCols` (total order, so
    * both engines rank identically). Per (keys) battery: one rank
    * window + one cutoff window over the battery-sized frame (a battery
    * is test-cardinality-sized by contract — thousands, not rows).
    *
    * Emits per test: keys, idCols, p9, rank, m, n_null, is_candidate
    * (its own step inequality) and rejected (rank ≤ the largest
    * candidate rank — the step-UP closure that can reject a
    * non-candidate below a later candidate).
    *
    * NULL p-values cannot be ranked, so those tests DROP from the
    * output and from m — the correction runs over the battery that
    * actually produced a p-value. The drop is flagged, never silent:
    * every surviving row carries `n_null`, the count of dropped tests
    * in its battery, so a shrunken (hence more lenient) battery is
    * visible to the caller (the flag-don't-guess convention).
    */
  def benjaminiHochberg(
      df: DataFrame,
      keyCols: Seq[String],
      idCols: Seq[String],
      p9Col: String,
      alphaNum: Int = 5,
      alphaDen: Int = 100
  ): DataFrame = {
    require(alphaNum > 0 && alphaDen > 0 && alphaNum < alphaDen,
      s"need 0 < alpha < 1: $alphaNum/$alphaDen")
    val g = keyCols.map(col)
    val wRank = Window.partitionBy(g: _*)
      .orderBy(col(p9Col).asc +: idCols.map(col(_).asc): _*)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // n_null rides a window over the UNFILTERED battery frame (same
    // battery-sized partition), so the dropped-test count costs no
    // extra scan and survives onto every ranked row
    val ranked = df
      .withColumn("n_null",
        sum(when(col(p9Col).isNull, 1L).otherwise(0L)).over(wKey))
      .filter(col(p9Col).isNotNull)
      .withColumn("rank", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wKey))
    val candidate =
      col(p9Col).cast(dec) * col("m").cast(dec) * lit(alphaDen.toLong).cast(dec) <=
        col("rank").cast(dec) * lit(alphaNum.toLong).cast(dec) * lit(1000000000L).cast(dec)
    ranked
      .withColumn("is_candidate", candidate)
      .withColumn("__cut",
        max(when(candidate, col("rank")).otherwise(0L)).over(wKey))
      .withColumn("rejected", col("rank") <= col("__cut"))
      .drop("__cut")
  }

  /** Benjamini–Yekutieli step-up FDR control (Benjamini & Yekutieli
    * 2001) — [[benjaminiHochberg]] under ARBITRARY dependence: BH's
    * guarantee assumes independent (or PRDS) p-values, and a drift
    * battery over overlapping slices of the same table is neither; BY
    * buys validity under any dependence by shrinking the boundary to
    * i·α/(m·c(m)), c(m) = Σ_{i=1}^m 1/i — the honest (if conservative)
    * nightly pager when slices share rows.
    *
    * Exactness: the harmonic constant is landed ONCE per battery as
    * c18 = Σ_i round(10¹⁸/i) — each term the correctly-rounded IEEE
    * double of 10¹⁸/i (quantized past 2⁵³ but bit-identical on every
    * engine), summed as exact integers over the ranked battery frame;
    * c18 deviates from the true c(m)·10¹⁸ by ≲ m·10⁻¹⁶ relative —
    * astronomically below the p9 grid's 10⁻⁹ resolution, so it can
    * never decide a rejection the true constant wouldn't — and
    * the step condition is the DECIMAL cross-product
    * p9·m·alphaDen·c18 ≤ rank·alphaNum·10⁹·10¹⁸. Same NULL/tie/window
    * contract as [[benjaminiHochberg]]; emits its columns plus `c18`
    * (digit string). A BY rejection set is always a subset of BH's at
    * the same α (c(m) ≥ 1) — spec-asserted.
    */
  def benjaminiYekutieli(
      df: DataFrame,
      keyCols: Seq[String],
      idCols: Seq[String],
      p9Col: String,
      alphaNum: Int = 5,
      alphaDen: Int = 100
  ): DataFrame = {
    require(alphaNum > 0 && alphaDen > 0 && alphaNum < alphaDen,
      s"need 0 < alpha < 1: $alphaNum/$alphaDen")
    val g = keyCols.map(col)
    val wRank = Window.partitionBy(g: _*)
      .orderBy(col(p9Col).asc +: idCols.map(col(_).asc): _*)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = df
      .withColumn("n_null",
        sum(when(col(p9Col).isNull, 1L).otherwise(0L)).over(wKey))
      .filter(col(p9Col).isNotNull)
      .withColumn("rank", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wKey))
      // the harmonic constant: Σ 1/i over the battery, each term an
      // exact 10⁻¹⁸-landed integer (1e18/rank rounds identically on
      // both engines — integer-input fixed dag)
      .withColumn("c18",
        sum(round(lit(1e18d) / col("rank").cast("double")).cast("long")
          .cast(dec)).over(wKey))
    val candidate =
      col(p9Col).cast(dec) * col("m").cast(dec) *
        lit(alphaDen.toLong).cast(dec) * col("c18") <=
        col("rank").cast(dec) * lit(alphaNum.toLong).cast(dec) *
          lit(1000000000L).cast(dec) * lit(1000000000000000000L).cast(dec)
    ranked
      .withColumn("is_candidate", candidate)
      .withColumn("__cut",
        max(when(candidate, col("rank")).otherwise(0L)).over(wKey))
      .withColumn("rejected", col("rank") <= col("__cut"))
      .withColumn("c18", col("c18").cast("string"))
      .drop("__cut")
  }

  /** Holm–Bonferroni step-DOWN FWER control (Holm 1979) — the
    * FAMILYWISE guarantee beside [[benjaminiHochberg]]'s FDR: "with
    * probability ≥ 1−α, ZERO of tonight's pages are false" (the right
    * bar when a single false alarm triggers an expensive rollback),
    * uniformly more powerful than plain Bonferroni at the same
    * guarantee. Order p ascending; reject down the list while
    * p_(i) ≤ α/(m−i+1) and STOP at the first failure (everything at
    * and after it survives, candidates or not — the step-down dual of
    * BH's step-up closure).
    *
    * Same exactness/NULL contract as BH: the step condition is the
    * integer cross-product p9·(m−rank+1)·alphaDen ≤ alphaNum·1e9 in
    * DECIMAL (no float boundary decides), rank ties break by `idCols`,
    * NULL-p tests drop flagged via `n_null`, and the battery frame is
    * test-cardinality bookkeeping: one rank window + one stop-rank
    * window. Emits keys, idCols, p9, rank, m, n_null, is_candidate
    * (its own inequality) and rejected (rank < the first
    * non-candidate's rank).
    */
  def holmBonferroni(
      df: DataFrame,
      keyCols: Seq[String],
      idCols: Seq[String],
      p9Col: String,
      alphaNum: Int = 5,
      alphaDen: Int = 100
  ): DataFrame = {
    require(alphaNum > 0 && alphaDen > 0 && alphaNum < alphaDen,
      s"need 0 < alpha < 1: $alphaNum/$alphaDen")
    val g = keyCols.map(col)
    val wRank = Window.partitionBy(g: _*)
      .orderBy(col(p9Col).asc +: idCols.map(col(_).asc): _*)
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = df
      .withColumn("n_null",
        sum(when(col(p9Col).isNull, 1L).otherwise(0L)).over(wKey))
      .filter(col(p9Col).isNotNull)
      .withColumn("rank", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wKey))
    val candidate =
      col(p9Col).cast(dec) * (col("m") - col("rank") + 1L).cast(dec) *
        lit(alphaDen.toLong).cast(dec) <=
        lit(alphaNum.toLong).cast(dec) * lit(1000000000L).cast(dec)
    ranked
      .withColumn("is_candidate", candidate)
      // the step-down stop: the smallest non-candidate rank caps every
      // rejection below it; an all-candidate battery rejects everything
      .withColumn("__stop",
        min(when(!candidate, col("rank"))).over(wKey))
      .withColumn("rejected",
        col("rank") < coalesce(col("__stop"), col("m") + 1L))
      .drop("__stop")
  }
}
