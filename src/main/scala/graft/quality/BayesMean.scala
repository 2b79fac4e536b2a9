package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Bayesian read for MEAN metrics (revenue per user, session
  * minutes, tokens per request) — the continuous-metric twin of
  * [[BayesAb]]'s Beta–Binomial conversion read, and the other half of
  * the "chance B is better / what do we risk" dashboard column: per
  * (treatment arm, peek), the large-sample normal posterior over the
  * SAME [[AbDashboard.abCells]] outcome moments the frequentist
  * dashboard reads,
  *
  *   μ_arm ~ N(ȳ, s²/n)   (flat prior; Gelman et al., BDA3 §3.2 — the
  *                          posterior of a normal mean with weak prior
  *                          information is the sampling distribution)
  *
  * giving in CLOSED FORM (no grid — the normal difference is itself
  * normal, so where [[BayesAb]] must integrate, here Φ/φ identities
  * finish the job):
  *
  *   - per-arm posterior mean ȳ and central credible interval
  *     ȳ ± z_{α/2}·s/√n
  *   - P(arm beats control) = Φ(Δ/se_Δ), Δ = ȳ_t − ȳ_c,
  *     se_Δ = √(s_t²/n_t + s_c²/n_c)
  *   - expected loss of EITHER decision (Stucchio 2015's rule applied
  *     to means): ship the arm → E[max(μ_c − μ_t, 0)] =
  *     se_Δ·φ(d) − Δ·Φ(−d); keep control → E[max(μ_t − μ_c, 0)] =
  *     se_Δ·φ(d) + Δ·Φ(d), with d = Δ/se_Δ — the standard normal-loss
  *     integrals (the identity loss_ship − loss_keep = −Δ is
  *     spec-pinned; φ(d) = e^{−d²/2}/√(2π))
  *
  * DETERMINISM (the [[Association.welchT]] / [[GroupSequential.phiCol]]
  * discipline): cumulative n/Σy/Σy² are EXACT integer/DECIMAL sums over
  * the (arm × peek) cell spine; the variance numerator v = n·Σy² −
  * (Σy)² is exact DECIMAL; se² = v/(n²(n−1)) and Δ's exact cross
  * product are the welchT fixed dags; Φ is the in-engine Chebyshev-erfc
  * Column dag and φ one engine exp — every float op in a pinned order
  * with a character-identical DuckDB rendering, so the oracle replays
  * the read bit-for-bit. Outputs gate at 9dp.
  *
  * GUARDS (NULL-with-flag, the house rule): per-arm se needs n ≥ 2;
  * the comparison reads need both arms at n ≥ 2 AND se_Δ > 0 (two
  * degenerate point-mass posteriors have no well-defined P(beat));
  * `ok` carries the verdict. Spine-completed empty peeks stay visible
  * with NULL statistics — unlike the Beta–Binomial read there is no
  * proper-prior fallback (the flat prior over an unbounded mean is
  * improper), so "no data" honestly reads NULL, not 0.5.
  *
  * SCALE: the one row-scale pass is the upstream [[AbDashboard.abCells]]
  * aggregation; the cells localize once ([[AbDashboard.materialize]] —
  * the eager-execution contract documented there) and everything here
  * runs on the (arms × peeks)-bounded frame: one cumulative window, one
  * bounded self-join, two staged projections. At 100× data only the
  * upstream pass grows.
  */
object BayesMean {

  private val dec = "decimal(38,0)"

  /** z_{α/2} at α = 0.05, the house pinned double. */
  private val z975 = 1.959964d

  /** 1/√(2π) divisor rendered as the correctly-rounded double of
    * √(2π) — keep [[bayesMeanKArmFromCells]] and the oracle fragment
    * in lockstep.
    */
  private val sqrt2Pi = 2.5066282746310002d

  /** The k-arm Bayesian mean read from a (possibly folded)
    * [[AbDashboard.abCells]] frame (columns `arm, peek, n, sy, syy`
    * consumed; the conversion/covariate columns ride along unused).
    * One row per (designed arm ≠ control, peek), cumulative to that
    * peek.
    */
  def bayesMeanKArmFromCells(
      cells: DataFrame,
      arms: Seq[String],
      control: String
  ): DataFrame = {
    require(arms.distinct.size == arms.size && arms.size >= 2,
      s"need >= 2 distinct designed arms: $arms")
    require(arms.contains(control), s"control '$control' must be in $arms")
    val spark = cells.sparkSession
    import spark.implicits._
    val local = AbDashboard.materialize(
      cells.filter(col("arm").isin(arms: _*)))
    val peeks = local.select(col("peek")).distinct()
    val armsDf = broadcast(arms.toDF("arm"))
    val full = peeks.crossJoin(armsDf)
      .join(local.select(col("arm"), col("peek"), col("n"), col("sy"),
        col("syy")), Seq("arm", "peek"), "left")
      .select(col("arm"), col("peek"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sy"), lit(0L).cast(dec)).as("sy"),
        coalesce(col("syy"), lit(0L).cast(dec)).as("syy"))
    val wCum = Window.partitionBy(col("arm")).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full.select(col("arm"), col("peek"),
      sum("n").over(wCum).as("n"),
      sum("sy").over(wCum).as("sy"),
      sum("syy").over(wCum).as("syy"))
    // per-(arm, peek) posterior: staged projections (the cupedMulti2
    // Janino discipline), every division inside its own ANSI guard
    val nD = col("n").cast(dec)
    val nF = col("n").cast("double")
    val st = cum
      .select(col("*"),
        when(col("n") > 0L,
          col("sy").cast("double") / nF).as("__m"),
        (nD * col("syy") - col("sy") * col("sy")).as("__v"))
      .select(col("*"),
        when(col("n") >= 2L,
          col("__v").cast("double") / (nF * nF * (nF - 1d))).as("__se2"))
      .select(col("arm"), col("peek"), col("n"), col("sy"), col("__v"),
        col("__m"), col("__se2"), sqrt(col("__se2")).as("__se"))
    val t = st.filter(col("arm") =!= control).select(
      col("arm"), col("peek"), col("n").as("n_arm"), col("sy").as("__syt"),
      col("__v").as("__vt"), col("__m").as("mean_arm"),
      col("__se2").as("__se2t"), col("__se").as("se_arm"))
    val c = st.filter(col("arm") === control).select(
      col("peek"), col("n").as("n_ctl"), col("sy").as("__syc"),
      col("__v").as("__vc"), col("__m").as("mean_ctl"),
      col("__se2").as("__se2c"), col("__se").as("se_ctl"))
    val ntD = col("n_arm").cast(dec); val ncD = col("n_ctl").cast(dec)
    val ntF = col("n_arm").cast("double"); val ncF = col("n_ctl").cast("double")
    val joined = t.join(c, Seq("peek"))
      .select(col("*"),
        when(col("n_arm") > 0L && col("n_ctl") > 0L,
          (col("__syt") * ncD - col("__syc") * ntD).cast("double") /
            (ntF * ncF)).as("__delta"),
        when(col("n_arm") >= 2L && col("n_ctl") >= 2L,
          sqrt(col("__se2t") + col("__se2c"))).as("__sed"))
      .select(col("*"),
        when(col("__sed") > 0d, col("__delta") / col("__sed")).as("__d"))
      .select(col("*"),
        (exp(lit(-0.5d) * col("__d") * col("__d")) / lit(sqrt2Pi))
          .as("__pdf"))
    val ok = col("n_arm") >= 2L && col("n_ctl") >= 2L && col("__sed") > 0d
    joined
      .withColumn("cred_lo_arm",
        col("mean_arm") - lit(z975) * col("se_arm"))
      .withColumn("cred_hi_arm",
        col("mean_arm") + lit(z975) * col("se_arm"))
      .withColumn("cred_lo_ctl",
        col("mean_ctl") - lit(z975) * col("se_ctl"))
      .withColumn("cred_hi_ctl",
        col("mean_ctl") + lit(z975) * col("se_ctl"))
      .withColumn("delta", col("__delta"))
      .withColumn("se_delta", when(ok, col("__sed")))
      .withColumn("p_beat_ctl",
        when(ok, GroupSequential.phiCol(col("__d"))))
      .withColumn("exp_loss_arm", when(ok,
        col("__sed") * col("__pdf") -
          col("__delta") * GroupSequential.phiCol(lit(-1d) * col("__d"))))
      .withColumn("exp_loss_ctl", when(ok,
        col("__sed") * col("__pdf") +
          col("__delta") * GroupSequential.phiCol(col("__d"))))
      .withColumn("ok", ok)
      .select(col("peek"), col("arm"),
        col("n_arm"), col("mean_arm"), col("se_arm"),
        col("cred_lo_arm"), col("cred_hi_arm"),
        col("n_ctl"), col("mean_ctl"), col("se_ctl"),
        col("cred_lo_ctl"), col("cred_hi_ctl"),
        col("delta"), col("se_delta"), col("p_beat_ctl"),
        col("exp_loss_arm"), col("exp_loss_ctl"), col("ok"))
  }
}
