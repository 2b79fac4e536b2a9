package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ratio-metric A/B read (Deng, Knoblich & Lu 2018, "Applying the
  * Delta Method in Metric Analytics"): the read every experimentation
  * platform needs for metrics that are a RATIO of per-unit sums —
  * clicks/views (CTR), revenue/sessions, errors/requests — where the
  * randomization unit (user) is coarser than the analysis unit (event),
  * so the naive event-level proportion test is wrong (events within a
  * user are correlated). The estimator is r̂ = ΣY/ΣX over users; its
  * variance comes from the delta method on the user-level (Y, X)
  * moments:
  *
  *   var(r̂) ≈ (S_YY − 2·r̂·S_YX + r̂²·S_XX) / ((n−1)·(ΣX)²) · n(n−1)/n(n−1)
  *          = (v_YY − 2·r̂·v_YX + r̂²·v_XX) / ((n−1)·(ΣX)²)
  *
  * with v_AB = n·ΣAB − ΣA·ΣB the EXACT DECIMAL (co)variance numerators
  * — the quadratic form [1, −r̂]·Σ·[1, −r̂]ᵀ, nonnegative up to the two
  * float products in r̂. Per comparison arm-vs-control: Δr̂ by the exact
  * cross product (ΣY_t·ΣX_c − ΣY_c·ΣX_t)/(ΣX_t·ΣX_c), se_Δ =
  * √(var_t + var_c), the z read, the two-sided p through the in-engine
  * Φ, and the z_{α/2} CI — every float op in a pinned order with a
  * character-identical DuckDB rendering (the [[GroupSequential.phiCol]]
  * discipline), so the oracle replays the read bit-for-bit.
  *
  * The state is the UNCHANGED [[AbDashboard.abCells]] frame — y as the
  * numerator, x as the denominator: n/sy/sx/syy/sxx/sxy are exactly the
  * delta-method moment set, additively mergeable, so the incremental
  * store and its stream fold carry this read for free.
  *
  * GUARDS (NULL-with-flag): a ratio needs ΣX ≠ 0; variances need n ≥ 2;
  * the comparison needs both arms live AND se_Δ > 0. `ok` carries the
  * verdict; spine-completed silent-arm peeks stay visible with NULLs.
  *
  * SPECIAL CASE (spec-pinned): X ≡ 1 per unit collapses r̂ to the plain
  * mean and var(r̂) to the welchT mean variance — the delta method
  * degrades to the t read exactly, not approximately.
  *
  * SCALE: the one row-scale pass is the upstream cell aggregation; the
  * cells localize once ([[AbDashboard.materialize]] — the
  * eager-execution contract documented there) and everything here runs
  * on the (arms × peeks)-bounded frame. At 100× data only the upstream
  * pass grows.
  */
object RatioMetric {

  private val dec = "decimal(38,0)"

  /** z_{α/2} at α = 0.05, the house pinned double. */
  private val z975 = 1.959964d

  /** The k-arm delta-method ratio read from a (possibly folded)
    * [[AbDashboard.abCells]] frame (y = numerator, x = denominator).
    * One row per (designed arm ≠ control, peek), cumulative to that
    * peek.
    */
  def ratioDeltaKArmFromCells(
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
    val zero = lit(0L).cast(dec)
    val full = peeks.crossJoin(armsDf)
      .join(local.select(col("arm"), col("peek"), col("n"), col("sx"),
        col("sy"), col("sxx"), col("syy"), col("sxy")),
        Seq("arm", "peek"), "left")
      .select(col("arm"), col("peek"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sx"), zero).as("sx"),
        coalesce(col("sy"), zero).as("sy"),
        coalesce(col("sxx"), zero).as("sxx"),
        coalesce(col("syy"), zero).as("syy"),
        coalesce(col("sxy"), zero).as("sxy"))
    val wCum = Window.partitionBy(col("arm")).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full.select(col("arm"), col("peek"),
      sum("n").over(wCum).as("n"),
      sum("sx").over(wCum).as("sx"),
      sum("sy").over(wCum).as("sy"),
      sum("sxx").over(wCum).as("sxx"),
      sum("syy").over(wCum).as("syy"),
      sum("sxy").over(wCum).as("sxy"))
    // per-(arm, peek) ratio + delta-method variance: staged projections,
    // every division inside its own ANSI guard
    val nD = col("n").cast(dec)
    val nF = col("n").cast("double")
    val st = cum
      .select(col("*"),
        when(col("sx") =!= zero,
          col("sy").cast("double") / col("sx").cast("double")).as("__r"),
        (nD * col("syy") - col("sy") * col("sy")).as("__vyy"),
        (nD * col("sxx") - col("sx") * col("sx")).as("__vxx"),
        (nD * col("sxy") - col("sy") * col("sx")).as("__vxy"))
      .select(col("*"),
        // the quadratic form is PSD exactly but carries two float
        // products in r̂ — at TRUE zero variance it can round to −1e-16,
        // and DuckDB's sqrt ERRORS on negatives where Spark returns
        // NaN, so clamp at 0 inside the guard (identical both engines)
        when(col("n") >= 2L && col("sx") =!= zero,
          greatest((col("__vyy").cast("double") -
            lit(2d) * col("__r") * col("__vxy").cast("double") +
            col("__r") * col("__r") * col("__vxx").cast("double")) /
            ((nF - 1d) * (col("sx") * col("sx")).cast("double")),
            lit(0d)))
          .as("__var"))
    val t = st.filter(col("arm") =!= control).select(
      col("arm"), col("peek"), col("n").as("n_arm"),
      col("sy").as("__syt"), col("sx").as("__sxt"),
      col("__r").as("ratio_arm"), col("__var").as("__vart"))
    val c = st.filter(col("arm") === control).select(
      col("peek"), col("n").as("n_ctl"),
      col("sy").as("__syc"), col("sx").as("__sxc"),
      col("__r").as("ratio_ctl"), col("__var").as("__varc"))
    val joined = t.join(c, Seq("peek"))
      .select(col("*"),
        when(col("__sxt") =!= zero && col("__sxc") =!= zero,
          (col("__syt") * col("__sxc") - col("__syc") * col("__sxt"))
            .cast("double") /
            (col("__sxt").cast("double") * col("__sxc").cast("double")))
          .as("__delta"),
        when(col("__vart").isNotNull && col("__varc").isNotNull,
          sqrt(col("__vart") + col("__varc"))).as("__sed"))
      .select(col("*"),
        when(col("__sed") > 0d, col("__delta") / col("__sed")).as("__z"))
    val ok = col("n_arm") >= 2L && col("n_ctl") >= 2L && col("__sed") > 0d
    joined
      .withColumn("se_arm", sqrt(col("__vart")))
      .withColumn("se_ctl", sqrt(col("__varc")))
      .withColumn("delta", col("__delta"))
      .withColumn("se_delta", when(ok, col("__sed")))
      .withColumn("z", when(ok, col("__z")))
      .withColumn("p_value", when(ok,
        lit(2d) * (lit(1d) - GroupSequential.phiCol(abs(col("__z"))))))
      .withColumn("ci_lo",
        when(ok, col("__delta") - lit(z975) * col("__sed")))
      .withColumn("ci_hi",
        when(ok, col("__delta") + lit(z975) * col("__sed")))
      .withColumn("ok", coalesce(ok, lit(false)))
      .select(col("peek"), col("arm"),
        col("n_arm"), col("ratio_arm"), col("se_arm"),
        col("n_ctl"), col("ratio_ctl"), col("se_ctl"),
        col("delta"), col("se_delta"), col("z"), col("p_value"),
        col("ci_lo"), col("ci_hi"), col("ok"))
  }
}
