package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Bayesian read for RATE metrics (count per exposure) — the third
  * member completing the Bayesian decision trio beside [[BayesAb]]
  * (Beta–Binomial conversion) and [[BayesMean]] (normal mean): per
  * (treatment arm, peek) the Gamma–Poisson conjugate posterior over
  * integer exposure/count state,
  *
  *   λ ~ Gamma(a₀ + C, b₀ + E)   (integer shape AND rate — the prior
  *                                is a₀ pseudo-events in b₀ pseudo-
  *                                exposure units),
  *
  * with P(arm beats control) = P(λ_t > λ_c) and both decisions'
  * expected losses EXACTLY (up to the documented log landing), via the
  * closed-form negative-binomial tail: for integer shapes,
  *
  *   P(X > Y) = Σ_{j=0}^{a_t−1} C(a_c+j−1, j) · p^j · (1−p)^{a_c},
  *   p = b_t/(b_t + b_c)   (an EXACT rational of longs),
  *
  * and the losses reduce to the SAME sums at shifted shapes:
  * E[λ_t·1(X>Y)] = (a_t/b_t)·P(X⁺>Y) (shape a_t+1),
  * E[λ_c·1(X>Y)] = (a_c/b_c)·P(X>Y⁺) (shape a_c+1) — so THREE tail
  * sums from TWO term series share one generated j-frame. The
  * loss-difference identity loss_ship − loss_keep = a_c/b_c − a_t/b_t
  * (posterior-mean difference) is spec-pinned.
  *
  * NUMERIC DESIGN (the [[BayesAb]] landing discipline): the term
  * recurrence ln t_j = ln t_{j−1} + ln((a_c+j−1)/j) + ln p runs as an
  * ORDERED integer cumulative sum of 1e-12-landed logs (each factor's
  * engine ln lands as round(ln(·)·10¹²) — a 1-ulp ln() disagreement
  * moves one landed log by ±1, which the 1e-15 term quantization makes
  * 9dp-invisible); each term quantizes to round(e^{L}·10¹⁵) and the
  * three tails are order-free integer sums (terms are probabilities
  * ≤ 1 — no max-shift needed; series whose every term lands at 0 are
  * genuinely negligible at 1e-12 total). Posterior means/sds are exact
  * integer divisions; the per-arm credible interval is the NORMAL
  * APPROXIMATION on the Gamma (mean ± z·√a/b — labeled and documented:
  * at the count sizes where the exact-sum read is practical, a ≥ 30
  * makes it tight; the decision columns never use it).
  *
  * ENVELOPE: series length = a_t + 1 terms per comparison cell —
  * practical to ~10⁵ counts per cell (beyond that coarsen peeks or use
  * [[BayesMean]]'s normal machinery, which is exact in that regime
  * anyway). The j-frame is generated per (arm, peek) by sequence();
  * everything is (arms × peeks × series)-bounded after the one
  * row-scale pass that built the increments.
  *
  * Emits one row per (designed arm ≠ control, peek), cumulative to the
  * peek: exposures/counts, posterior a/b per side, posterior means,
  * approx credible intervals, p_beat_ctl, exp_loss_arm (ship the arm,
  * lose if control's rate was higher), exp_loss_ctl (keep control).
  * "Beats" = HIGHER rate (state the metric so that up is good, or read
  * the columns mirrored).
  */
object BayesRate {

  private val dec = "decimal(38,0)"
  private val z975 = 1.959964d

  /** The k-arm Gamma–Poisson read from per-(arm, peek) increment state
    * (columns `arm, peek, e, c` — integer exposure and count, the
    * additive fold shape).
    */
  def bayesRateKArmFromCells(
      cells: DataFrame,
      arms: Seq[String],
      control: String,
      a0: Long = 1L,
      b0: Long = 1L
  ): DataFrame = {
    require(arms.distinct.size == arms.size && arms.size >= 2,
      s"need >= 2 distinct designed arms: $arms")
    require(arms.contains(control), s"control '$control' must be in $arms")
    require(a0 >= 1L && b0 >= 1L, s"integer prior must be proper: a0=$a0 b0=$b0")
    val spark = cells.sparkSession
    import spark.implicits._
    val local = AbDashboard.materialize(
      cells.filter(col("arm").isin(arms: _*)))
    val peeks = local.select(col("peek")).distinct()
    val armsDf = broadcast(arms.toDF("arm"))
    val full = peeks.crossJoin(armsDf)
      .join(local.select(col("arm"), col("peek"), col("e"), col("c")),
        Seq("arm", "peek"), "left")
      .select(col("arm"), col("peek"),
        coalesce(col("e"), lit(0L)).as("e"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wCum = Window.partitionBy(col("arm")).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full.select(col("arm"), col("peek"),
      sum("e").over(wCum).as("e"), sum("c").over(wCum).as("c"))
      .withColumn("a_post", lit(a0) + col("c"))
      .withColumn("b_post", lit(b0) + col("e"))
    val t = cum.filter(col("arm") =!= control).select(col("arm"), col("peek"),
      col("e").as("e_arm"), col("c").as("c_arm"),
      col("a_post").as("at"), col("b_post").as("bt"))
    val c = cum.filter(col("arm") === control).select(col("peek"),
      col("e").as("e_ctl"), col("c").as("c_ctl"),
      col("a_post").as("ac"), col("b_post").as("bc"))
    val pair = t.join(c, Seq("peek"))
    // p and its landed log are shared by every term; ln p computed ONCE
    // per pair (p = bt/(bt+bc), an exact double division of longs)
    val pD = col("bt").cast("double") / (col("bt") + col("bc")).cast("double")
    val qD = col("bc").cast("double") / (col("bt") + col("bc")).cast("double")
    val base = pair
      .withColumn("__lnp12", round(log(pD) * 1e12d).cast("long"))
      .withColumn("__lnq12", round(log(qD) * 1e12d).cast("long"))
    // the j-frame: j = 0 .. at (one past at−1 — the extra term extends
    // S0 into S1); series A (alpha = ac) and B (alpha = ac+1) ride the
    // same rows
    val jf = base.withColumn("__j",
      explode(sequence(lit(0L), col("at"))))
    // ln of the j-th ratio factor (j = 0 contributes nothing): landed
    // engine logs, per series
    val jD = col("__j").cast("double")
    val lrA12 = when(col("__j") === 0L, lit(0L)).otherwise(
      round(log((col("ac").cast("double") + jD - lit(1d)) / jD) * 1e12d)
        .cast("long"))
    val lrB12 = when(col("__j") === 0L, lit(0L)).otherwise(
      round(log((col("ac").cast("double") + jD) / jD) * 1e12d).cast("long"))
    val wJ = Window.partitionBy(col("arm"), col("peek")).orderBy(col("__j"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withL = jf
      .withColumn("__la12",
        sum(lrA12 + col("__lnp12")).over(wJ) - col("__lnp12") +
          col("ac") * col("__lnq12"))
      .withColumn("__lb12",
        sum(lrB12 + col("__lnp12")).over(wJ) - col("__lnp12") +
          (col("ac") + 1L) * col("__lnq12"))
    // NOTE the −lnp12 correction: the cumulative includes j = 0's +lnp,
    // which the j = 0 term (p^0) must not carry
    val t15 = (l: org.apache.spark.sql.Column) =>
      when(l < -80000000000000L, lit(0L)).otherwise(
        round(exp(l.cast("double") / 1e12d) * 1e15d).cast("long"))
    val terms = withL
      .withColumn("__ta15", t15(col("__la12")))
      .withColumn("__tb15", t15(col("__lb12")))
    val agg = terms.groupBy(col("arm"), col("peek"), col("e_arm"),
        col("c_arm"), col("at"), col("bt"), col("e_ctl"), col("c_ctl"),
        col("ac"), col("bc"))
      .agg(
        sum(when(col("__j") < col("at"), col("__ta15")).otherwise(0L)
          .cast(dec)).as("__s0"),
        sum(col("__ta15").cast(dec)).as("__s1"),
        sum(when(col("__j") < col("at"), col("__tb15")).otherwise(0L)
          .cast(dec)).as("__s2"))
    val p0 = col("__s0").cast("double") / 1e15d
    val p1 = col("__s1").cast("double") / 1e15d
    val p2 = col("__s2").cast("double") / 1e15d
    val mT = col("at").cast("double") / col("bt").cast("double")
    val mC = col("ac").cast("double") / col("bc").cast("double")
    val sdT = sqrt(col("at").cast("double")) / col("bt").cast("double")
    val sdC = sqrt(col("ac").cast("double")) / col("bc").cast("double")
    agg
      .withColumn("post_mean_arm", mT)
      .withColumn("post_mean_ctl", mC)
      .withColumn("post_sd_arm", sdT)
      .withColumn("post_sd_ctl", sdC)
      .withColumn("cred_lo_arm", mT - lit(z975) * sdT)
      .withColumn("cred_hi_arm", mT + lit(z975) * sdT)
      .withColumn("cred_lo_ctl", mC - lit(z975) * sdC)
      .withColumn("cred_hi_ctl", mC + lit(z975) * sdC)
      .withColumn("p_beat_ctl", p0)
      // keep control: you forgo the arm's edge when the arm was better
      .withColumn("exp_loss_ctl", mT * p1 - mC * p2)
      // ship the arm: you lose the control's edge when control was
      // better — E[max(λc−λt,0)] = mC(1−P2) − mT(1−P1)
      .withColumn("exp_loss_arm",
        mC * (lit(1d) - p2) - mT * (lit(1d) - p1))
      .select(col("peek"), col("arm"),
        col("e_arm"), col("c_arm"), col("at").as("a_arm"),
        col("bt").as("b_arm"), col("post_mean_arm"), col("post_sd_arm"),
        col("cred_lo_arm"), col("cred_hi_arm"),
        col("e_ctl"), col("c_ctl"), col("ac").as("a_ctl"),
        col("bc").as("b_ctl"), col("post_mean_ctl"), col("post_sd_ctl"),
        col("cred_lo_ctl"), col("cred_hi_ctl"),
        col("p_beat_ctl"), col("exp_loss_arm"), col("exp_loss_ctl"))
  }
}
