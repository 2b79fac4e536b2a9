package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ALWAYS-VALID sequential tests (mixture SPRT — Robbins 1970; Johari,
  * Koomen, Pekelis & Walker 2017/2022 "Peeking at A/B tests"): the
  * standing drift/A/B stores are re-read at every fold version, and a
  * fixed-α test repeated at 100 TB monitoring cadence is GUARANTEED to
  * false-alarm (each peek resamples the same α). The mSPRT's mixture
  * likelihood ratio against H₀: Δ = 0 under a N(0, τ²) prior on the
  * effect,
  *
  *   Λ_n = √(V_n/(V_n + τ²)) · exp( Δ̂_n² · τ² / (2·V_n·(V_n + τ²)) )
  *
  * (V_n the variance of the running estimate Δ̂_n), is a nonnegative
  * martingale with E Λ = 1 under H₀, so by Ville's inequality
  * P(∃n: Λ_n ≥ 1/α) ≤ α — the always-valid p-value
  * p_n = min(1, min_{m ≤ n} 1/Λ_m) is valid at EVERY peek
  * simultaneously, at any stopping rule. Reference scope: none (the
  * reference has no statistics); this is the inference layer the
  * versioned-store folds ([[graft.streaming.StreamingOps]]) were
  * missing.
  *
  * Determinism (the house nano rule): cumulative counts/moment sums are
  * exact (longs / DECIMAL); each peek's ln Λ is ONE fixed dag over them
  * landed to a nano long; the running-best evidence is an integer max
  * over the peek-ordered window; the reject verdict is the integer
  * comparison max ln Λ₉ ≥ round(ln(1/α)·10⁹) (the mannKendall
  * never-a-float-boundary rule); p is one exp dag, gated at 9dp.
  *
  * SCALE: input is one row per (keys, peek) of per-batch INCREMENTS —
  * exactly what a versioned store fold emits per version — cumulated by
  * peek-ordered windows over the peek-cardinality frame. Never rescans
  * trials.
  */
object SequentialTests {

  private val dec = "decimal(38,0)"

  private def lnLr9(deltaHat: Column, v: Column, tau2: Double): Column = {
    val t2 = lit(tau2)
    round((lit(0.5d) * log(v / (v + t2)) +
      deltaHat * deltaHat * t2 / (lit(2d) * v * (v + t2))) * 1e9d).cast("long")
  }

  private def finish(
      cum: DataFrame,
      g: Seq[Column],
      peek: Column,
      lnCol: Column,
      usable: Column,
      alpha: Double
  ): DataFrame = {
    require(alpha > 0d && alpha < 1d, s"alpha must be in (0,1): $alpha")
    val wCum = Window.partitionBy(g: _*).orderBy(peek)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ln(1/α) as a nano-long constant: the reject boundary is an exact
    // integer comparison, never a float equality at the threshold
    val bound9 = math.round(math.log(1d / alpha) * 1e9d)
    cum
      .withColumn("ln_lr9", when(usable, lnCol))
      // max over the window skips NULL (unusable) peeks: evidence only
      // ever accumulates from peeks where Λ is defined
      .withColumn("__best9", max(col("ln_lr9")).over(wCum))
      .withColumn("p_always_valid",
        when(col("__best9").isNull || col("__best9") <= 0L, 1d)
          .otherwise(exp(-col("__best9").cast("double") / 1e9d)))
      .withColumn("reject",
        coalesce(col("__best9") >= bound9, lit(false)))
      .drop("__best9")
  }

  /** mSPRT for a ONE-SAMPLE proportion against a KNOWN null p₀ — the
    * SEQUENTIAL SRM monitor: the design says arm A should carry weight
    * p₀ of the designed traffic, and the always-valid p on
    * Δ̂ = p̂ − p₀ makes CONTINUOUS traffic monitoring sound (the fixed
    * χ² SRM read at every fold version is exactly the peeking problem).
    * V = p₀(1−p₀)/N — exact under H₀, no estimate, so the monitor's
    * variance never depends on the drifted data. Same mixture ln Λ,
    * running-best evidence, and ln(1/α) integer boundary as
    * [[msprtTwoProportion]]. Peeks with N = 0 carry NULL ln_lr9.
    * Input: one row per (keys, peek) with that batch's designed-unit
    * count and arm-A count — the [[graft.quality.AbDashboard.abCells]]
    * fold shape rolled to increments.
    */
  def msprtOneProportion(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      nCol: String, sCol: String,
      p0: Double,
      tau2: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(p0 > 0d && p0 < 1d, s"p0 must be in (0,1): $p0")
    require(tau2 > 0d, s"tau2 must be positive: $tau2")
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(nCol).cast("long").as("__dn") :+ col(sCol).cast("long").as("__ds"): _*)
      .withColumn("n", sum("__dn").over(wCum))
      .withColumn("s", sum("__ds").over(wCum))
    val nD = col("n").cast("double")
    val delta = col("s").cast("double") / nD - lit(p0)
    val v = lit(p0 * (1d - p0)) / nD
    val usable = col("n") > 0L
    finish(cum, g, col("peek"), lnLr9(delta, v, tau2), usable, alpha)
      .withColumn("delta", when(usable, delta))
      .select(g :+ col("peek") :+ col("n") :+ col("s") :+ col("delta") :+
        col("ln_lr9") :+ col("p_always_valid") :+ col("reject"): _*)
  }

  /** mSPRT for a TWO-PROPORTION drift/A/B from incremental count state:
    * one row per (keys, peek) with that batch's trials and successes
    * per arm — the [[graft.quality.Association.contingencyCounts]] /
    * valueCounts fold shape. Δ̂ = p̂₁ − p̂₂ on the CUMULATIVE counts,
    * V = p̂(1−p̂)(1/N₁ + 1/N₂) with p̂ pooled. Peeks where Λ is
    * undefined (an empty arm, or a degenerate pooled p̂ ∈ {0,1} — where
    * necessarily Δ̂ = 0) carry NULL ln_lr9 and contribute no evidence.
    * Emits per (keys, peek): cumulative n/s per arm, delta, ln_lr9,
    * p_always_valid (≤ α at ANY peek ⇒ reject is valid), reject.
    */
  def msprtTwoProportion(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      n1Col: String, s1Col: String,
      n2Col: String, s2Col: String,
      tau2: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(tau2 > 0d, s"tau2 must be positive: $tau2")
    val g = keyCols.map(col)
    // the select below renames peekCol to "peek" — the window must
    // order by the POST-select name
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(n1Col).cast("long").as("__dn1") :+ col(s1Col).cast("long").as("__ds1") :+
        col(n2Col).cast("long").as("__dn2") :+ col(s2Col).cast("long").as("__ds2"): _*)
      .withColumn("n_lo", sum("__dn1").over(wCum))
      .withColumn("s_lo", sum("__ds1").over(wCum))
      .withColumn("n_hi", sum("__dn2").over(wCum))
      .withColumn("s_hi", sum("__ds2").over(wCum))
    val n1 = col("n_lo").cast("double"); val n2 = col("n_hi").cast("double")
    val s1 = col("s_lo").cast("double"); val s2 = col("s_hi").cast("double")
    // exact cross product for the difference (no float mean subtraction)
    val delta = (col("s_lo").cast(dec) * col("n_hi").cast(dec) -
      col("s_hi").cast(dec) * col("n_lo").cast(dec)).cast("double") / (n1 * n2)
    val pPool = (s1 + s2) / (n1 + n2)
    val v = pPool * (lit(1d) - pPool) * (lit(1d) / n1 + lit(1d) / n2)
    val usable = col("n_lo") > 0L && col("n_hi") > 0L &&
      (col("s_lo") + col("s_hi")) > 0L &&
      (col("s_lo") + col("s_hi")) < (col("n_lo") + col("n_hi"))
    finish(cum, g, col("peek"), lnLr9(delta, v, tau2), usable, alpha)
      .withColumn("delta", when(usable, delta))
      .select(g :+ col("peek") :+ col("n_lo") :+ col("s_lo") :+ col("n_hi") :+
        col("s_hi") :+ col("delta") :+ col("ln_lr9") :+
        col("p_always_valid") :+ col("reject"): _*)
  }

  /** mSPRT for a TWO-SAMPLE RATE (count-per-exposure — error rates,
    * incidents per request-hour, crashes per session-minute): the
    * count-metric member beside [[msprtTwoProportion]] (binary) and
    * [[msprtMean]] (continuous), for the monitor a reliability
    * dashboard actually runs. Incremental state per (keys, peek):
    * that batch's integer EXPOSURE and event COUNT per arm (both
    * additive — the exposure is whatever integer unit the pipeline
    * meters: requests, hours, sessions). On the cumulative totals:
    *
    *   Δ̂ = C₁/E₁ − C₂/E₂ (exact cross product), and the POISSON
    *   plug-in variance under pooling V = λ̂·(1/E₁ + 1/E₂),
    *   λ̂ = (C₁+C₂)/(E₁+E₂) — the rate analogue of the pooled-p̂
    *   variance (var of a Poisson rate estimate is λ/E)
    *
    * through the same mixture LR and running-best fold — p_always_valid
    * is ≤ α at ANY peek under continuous peeking. Peeks with an empty
    * exposure side or zero total counts carry NULL ln_lr9 (no
    * evidence, never a guess). Determinism: exact long cumulative
    * sums, the one fixed nano dag, exact-integer boundary comparison.
    */
  def msprtTwoRate(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      e1Col: String, c1Col: String,
      e2Col: String, c2Col: String,
      tau2: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(tau2 > 0d, s"tau2 must be positive: $tau2")
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(e1Col).cast("long").as("__de1") :+ col(c1Col).cast("long").as("__dc1") :+
        col(e2Col).cast("long").as("__de2") :+ col(c2Col).cast("long").as("__dc2"): _*)
      .withColumn("e_lo", sum("__de1").over(wCum))
      .withColumn("c_lo", sum("__dc1").over(wCum))
      .withColumn("e_hi", sum("__de2").over(wCum))
      .withColumn("c_hi", sum("__dc2").over(wCum))
    val e1 = col("e_lo").cast("double"); val e2 = col("e_hi").cast("double")
    val c1 = col("c_lo").cast("double"); val c2 = col("c_hi").cast("double")
    val delta = (col("c_lo").cast(dec) * col("e_hi").cast(dec) -
      col("c_hi").cast(dec) * col("e_lo").cast(dec)).cast("double") / (e1 * e2)
    val lamPool = (c1 + c2) / (e1 + e2)
    val v = lamPool * (lit(1d) / e1 + lit(1d) / e2)
    val usable = col("e_lo") > 0L && col("e_hi") > 0L &&
      (col("c_lo") + col("c_hi")) > 0L
    finish(cum, g, col("peek"), lnLr9(delta, v, tau2), usable, alpha)
      .withColumn("delta", when(usable, delta))
      .select(g :+ col("peek") :+ col("e_lo") :+ col("c_lo") :+ col("e_hi") :+
        col("c_hi") :+ col("delta") :+ col("ln_lr9") :+
        col("p_always_valid") :+ col("reject"): _*)
  }

  /** The always-valid confidence sequence dual of [[msprtTwoRate]] —
    * the [[alwaysValidCiMean]] inversion on the pooled-λ̂ Poisson
    * plug-in variance. Simultaneous coverage at any stopping rule; 0
    * leaves the CI exactly when the peek's own ln Λ clears ln(1/α)
    * (the duality, spec-asserted against [[msprtTwoRate]]).
    */
  def alwaysValidCiTwoRate(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      e1Col: String, c1Col: String,
      e2Col: String, c2Col: String,
      tau2: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(tau2 > 0d, s"tau2 must be positive: $tau2")
    require(alpha > 0d && alpha < 1d, s"alpha must be in (0,1): $alpha")
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(e1Col).cast("long").as("__de1") :+ col(c1Col).cast("long").as("__dc1") :+
        col(e2Col).cast("long").as("__de2") :+ col(c2Col).cast("long").as("__dc2"): _*)
      .withColumn("e_lo", sum("__de1").over(wCum))
      .withColumn("c_lo", sum("__dc1").over(wCum))
      .withColumn("e_hi", sum("__de2").over(wCum))
      .withColumn("c_hi", sum("__dc2").over(wCum))
    val e1 = col("e_lo").cast("double"); val e2 = col("e_hi").cast("double")
    val c1 = col("c_lo").cast("double"); val c2 = col("c_hi").cast("double")
    val delta = (col("c_lo").cast(dec) * col("e_hi").cast(dec) -
      col("c_hi").cast(dec) * col("e_lo").cast(dec)).cast("double") / (e1 * e2)
    val lamPool = (c1 + c2) / (e1 + e2)
    val v = lamPool * (lit(1d) / e1 + lit(1d) / e2)
    val t2 = lit(tau2)
    val radius = sqrt(v * (v + t2) / t2 *
      log((v + t2) / (lit(alpha) * lit(alpha) * v)))
    val usable = col("e_lo") > 0L && col("e_hi") > 0L &&
      (col("c_lo") + col("c_hi")) > 0L
    cum
      .withColumn("delta", when(usable, delta))
      .withColumn("radius", when(usable, radius))
      .withColumn("ci_lo", when(usable, delta - radius))
      .withColumn("ci_hi", when(usable, delta + radius))
      .select(g :+ col("peek") :+ col("e_lo") :+ col("c_lo") :+ col("e_hi") :+
        col("c_hi") :+ col("delta") :+ col("radius") :+ col("ci_lo") :+
        col("ci_hi"): _*)
  }

  /** The ALWAYS-VALID CONFIDENCE SEQUENCE dual of [[msprtMean]] (Johari
    * et al.'s CI inversion): the set of effects δ₀ the mixture test
    * does NOT reject at peek n,
    *
    *   CI_n = Δ̂_n ± √( V(V+τ²)/τ² · ln((V+τ²)/(α²·V)) )
    *
    * (from Λ_n(δ₀) ≥ 1/α solved for |Δ̂ − δ₀|; the 2·ln(1/α) and the
    * mixture's ½·ln((V+τ²)/V) fold into one log). Coverage is
    * SIMULTANEOUS: P(∃n: δ ∉ CI_n) ≤ α at any stopping rule — the CI a
    * dashboard can show at every fold version without peeking penalty.
    * By construction 0 ∉ CI_n exactly when the peek's own ln Λ clears
    * the ln(1/α) boundary — the reject/CI duality is spec-asserted
    * against [[msprtMean]] per peek. Emits per (keys, peek): cumulative
    * n per arm, delta, radius, ci_lo/ci_hi (NULL on unusable peeks —
    * the [[msprtMean]] rule). Determinism: same exact cumulative
    * moments; radius is one fixed dag over them, gated at 9dp.
    */
  def alwaysValidCiMean(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      n1Col: String, s1Col: String, q1Col: String,
      n2Col: String, s2Col: String, q2Col: String,
      tau2: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(tau2 > 0d, s"tau2 must be positive: $tau2")
    require(alpha > 0d && alpha < 1d, s"alpha must be in (0,1): $alpha")
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(n1Col).cast("long").as("__dn1") :+
        col(s1Col).cast(dec).as("__ds1") :+ col(q1Col).cast(dec).as("__dq1") :+
        col(n2Col).cast("long").as("__dn2") :+
        col(s2Col).cast(dec).as("__ds2") :+ col(q2Col).cast(dec).as("__dq2"): _*)
      .withColumn("n_lo", sum("__dn1").over(wCum))
      .withColumn("__s1", sum("__ds1").over(wCum))
      .withColumn("__q1", sum("__dq1").over(wCum))
      .withColumn("n_hi", sum("__dn2").over(wCum))
      .withColumn("__s2", sum("__ds2").over(wCum))
      .withColumn("__q2", sum("__dq2").over(wCum))
    val n1D = col("n_lo").cast(dec); val n2D = col("n_hi").cast(dec)
    val n1 = col("n_lo").cast("double"); val n2 = col("n_hi").cast("double")
    val v1 = n1D * col("__q1") - col("__s1") * col("__s1")
    val v2 = n2D * col("__q2") - col("__s2") * col("__s2")
    val delta = (col("__s1") * n2D - col("__s2") * n1D).cast("double") / (n1 * n2)
    val v = v1.cast("double") / (n1 * n1 * (n1 - 1d)) +
      v2.cast("double") / (n2 * n2 * (n2 - 1d))
    val t2 = lit(tau2)
    val radius = sqrt(v * (v + t2) / t2 *
      log((v + t2) / (lit(alpha) * lit(alpha) * v)))
    val usable = col("n_lo") >= 2L && col("n_hi") >= 2L && (v1 + v2) > 0L
    cum
      .withColumn("delta", when(usable, delta))
      .withColumn("radius", when(usable, radius))
      .withColumn("ci_lo", when(usable, delta - radius))
      .withColumn("ci_hi", when(usable, delta + radius))
      .select(g :+ col("peek") :+ col("n_lo") :+ col("n_hi") :+ col("delta") :+
        col("radius") :+ col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** The always-valid confidence sequence dual of [[msprtTwoProportion]]
    * — the [[alwaysValidCiMean]] inversion on the pooled-p plug-in
    * variance: CI_n = Δ̂ ± √(V(V+τ²)/τ²·ln((V+τ²)/(α²V))) with
    * Δ̂ = p̂₁ − p̂₂ (exact cross-product) and V = p̂(1−p̂)(1/N₁+1/N₂).
    * Simultaneous coverage at any stopping rule; 0 leaves the CI
    * exactly when the peek's own ln Λ clears ln(1/α) (the duality,
    * spec-asserted against [[msprtTwoProportion]]). Unusable peeks
    * (empty arm, degenerate pooled p̂) carry NULL.
    */
  def alwaysValidCiTwoProportion(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      n1Col: String, s1Col: String,
      n2Col: String, s2Col: String,
      tau2: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(tau2 > 0d, s"tau2 must be positive: $tau2")
    require(alpha > 0d && alpha < 1d, s"alpha must be in (0,1): $alpha")
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(n1Col).cast("long").as("__dn1") :+ col(s1Col).cast("long").as("__ds1") :+
        col(n2Col).cast("long").as("__dn2") :+ col(s2Col).cast("long").as("__ds2"): _*)
      .withColumn("n_lo", sum("__dn1").over(wCum))
      .withColumn("s_lo", sum("__ds1").over(wCum))
      .withColumn("n_hi", sum("__dn2").over(wCum))
      .withColumn("s_hi", sum("__ds2").over(wCum))
    val n1 = col("n_lo").cast("double"); val n2 = col("n_hi").cast("double")
    val s1 = col("s_lo").cast("double"); val s2 = col("s_hi").cast("double")
    val delta = (col("s_lo").cast(dec) * col("n_hi").cast(dec) -
      col("s_hi").cast(dec) * col("n_lo").cast(dec)).cast("double") / (n1 * n2)
    val pPool = (s1 + s2) / (n1 + n2)
    val v = pPool * (lit(1d) - pPool) * (lit(1d) / n1 + lit(1d) / n2)
    val t2 = lit(tau2)
    val radius = sqrt(v * (v + t2) / t2 *
      log((v + t2) / (lit(alpha) * lit(alpha) * v)))
    val usable = col("n_lo") > 0L && col("n_hi") > 0L &&
      (col("s_lo") + col("s_hi")) > 0L &&
      (col("s_lo") + col("s_hi")) < (col("n_lo") + col("n_hi"))
    cum
      .withColumn("delta", when(usable, delta))
      .withColumn("radius", when(usable, radius))
      .withColumn("ci_lo", when(usable, delta - radius))
      .withColumn("ci_hi", when(usable, delta + radius))
      .select(g :+ col("peek") :+ col("n_lo") :+ col("s_lo") :+ col("n_hi") :+
        col("s_hi") :+ col("delta") :+ col("radius") :+ col("ci_lo") :+
        col("ci_hi"): _*)
  }

  /** mSPRT for a MEAN drift/A/B from incremental moment state: one row
    * per (keys, peek) with that batch's count / Σy / Σy² per arm (exact
    * — y long by the [[graft.quality.Association.welchT]] contract).
    * Δ̂ = ȳ₁ − ȳ₂ on cumulative sums via the exact cross product;
    * V = s²₁/N₁ + s²₂/N₂ from the exact variance numerators (the Welch
    * plug-in). Peeks with either arm under 2 observations or zero
    * variance carry NULL ln_lr9 — no evidence, never a guess.
    */
  def msprtMean(
      df: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      n1Col: String, s1Col: String, q1Col: String,
      n2Col: String, s2Col: String, q2Col: String,
      tau2: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(tau2 > 0d, s"tau2 must be positive: $tau2")
    val g = keyCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.select(g :+ col(peekCol).as("peek") :+
        col(n1Col).cast("long").as("__dn1") :+
        col(s1Col).cast(dec).as("__ds1") :+ col(q1Col).cast(dec).as("__dq1") :+
        col(n2Col).cast("long").as("__dn2") :+
        col(s2Col).cast(dec).as("__ds2") :+ col(q2Col).cast(dec).as("__dq2"): _*)
      .withColumn("n_lo", sum("__dn1").over(wCum))
      .withColumn("__s1", sum("__ds1").over(wCum))
      .withColumn("__q1", sum("__dq1").over(wCum))
      .withColumn("n_hi", sum("__dn2").over(wCum))
      .withColumn("__s2", sum("__ds2").over(wCum))
      .withColumn("__q2", sum("__dq2").over(wCum))
    val n1D = col("n_lo").cast(dec); val n2D = col("n_hi").cast(dec)
    val n1 = col("n_lo").cast("double"); val n2 = col("n_hi").cast("double")
    // exact variance numerators V_i = n·Σy² − (Σy)² (the welchT pieces)
    val v1 = n1D * col("__q1") - col("__s1") * col("__s1")
    val v2 = n2D * col("__q2") - col("__s2") * col("__s2")
    val delta = (col("__s1") * n2D - col("__s2") * n1D).cast("double") / (n1 * n2)
    val v = v1.cast("double") / (n1 * n1 * (n1 - 1d)) +
      v2.cast("double") / (n2 * n2 * (n2 - 1d))
    val usable = col("n_lo") >= 2L && col("n_hi") >= 2L && (v1 + v2) > 0L
    finish(cum, g, col("peek"), lnLr9(delta, v, tau2), usable, alpha)
      .withColumn("delta", when(usable, delta))
      .withColumn("sum_lo", col("__s1").cast("string"))
      .withColumn("sum_hi", col("__s2").cast("string"))
      .select(g :+ col("peek") :+ col("n_lo") :+ col("sum_lo") :+ col("n_hi") :+
        col("sum_hi") :+ col("delta") :+ col("ln_lr9") :+
        col("p_always_valid") :+ col("reject"): _*)
  }

  /** The ALWAYS-VALID QUANTILE monitor — "is p95 latency above T",
    * sound under continuous peeking: the quantile claim REDUCES to a
    * proportion by exact rank algebra on the house lower-rank rule
    * r = clamp(1, n, (p·(n+1)) div 100):
    *
    *   Q_p(cumulative) > T  ⟺  #{x > T} > n − r     (exact integers)
    *
    * so threshold-crossing counts from the EXISTING per-peek
    * [[graft.operators.Quantiles.valueCells]] store feed
    * [[msprtOneProportion]] against p₀ = (100−p)/100 UNCHANGED — the
    * always-valid p on the exceedance rate IS the peeking-sound
    * monitor for the quantile claim, and the reduction identity is
    * spec-pinned against the direct
    * [[graft.operators.Quantiles.quantileShiftFromCells]] rank read.
    *
    * Input: per-(keys, peek) value cells `(v, w)` — that peek's batch
    * increment (integer values by the q210 bucket-first contract).
    * Emits per (keys, peek): cumulative n / s (exceedances), delta
    * (p̂ − p₀), ln_lr9, p_always_valid, reject (the monitor columns),
    * plus `threshold`, `p_rank` (the exact rank at the cumulative n)
    * and `q_above_threshold` — the FIXED-HORIZON exact-rank read beside
    * the monitor (the labeled-read convention the dashboard family
    * uses). Determinism: exact integer counts; the mSPRT dag is the
    * q333 nano chain. SCALE: one bounded aggregation over the
    * value-cardinality cell frame + the peek-cardinality monitor
    * windows; the row-scale pass is the upstream valueCells fold.
    */
  def quantileThresholdMonitor(
      cells: DataFrame,
      keyCols: Seq[String],
      peekCol: String,
      threshold: Long,
      p: Int,
      tau2: Double,
      alpha: Double = 0.05d
  ): DataFrame = {
    require(p >= 1 && p <= 99, s"percentile must be in [1, 99]: $p")
    val g = keyCols.map(col)
    val incr = cells
      .groupBy(g :+ col(peekCol).as("peek"): _*)
      .agg(sum(col("w").cast("long")).as("__bn"),
        sum(when(col("v").cast("long") > threshold,
          col("w").cast("long")).otherwise(0L)).as("__bs"))
    val p0 = (100 - p) / 100.0d
    val mon = msprtOneProportion(incr, keyCols, "peek", "__bn", "__bs",
      p0, tau2, alpha)
    val r = greatest(lit(1L), least(col("n"), expr(s"($p * (n + 1)) div 100")))
    mon
      .withColumn("threshold", lit(threshold))
      .withColumn("p_rank", when(col("n") > 0L, r))
      .withColumn("q_above_threshold",
        when(col("n") > 0L, col("s") > col("n") - r))
      .select(g :+ col("peek") :+ col("n") :+ col("s") :+ col("delta") :+
        col("ln_lr9") :+ col("p_always_valid") :+ col("reject") :+
        col("threshold") :+ col("p_rank") :+ col("q_above_threshold"): _*)
  }
}
