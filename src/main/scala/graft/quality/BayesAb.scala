package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Bayesian A/B read — the dashboard column stakeholders actually ask
  * for ("what's the chance B is better, and what do we risk by shipping
  * it?"): per (treatment arm, peek), Beta–Binomial posteriors over the
  * SAME [[AbDashboard.abCells]] conversion counts the frequentist
  * dashboard reads, with
  *
  *   - the posterior mean (a₀+s)/(a₀+b₀+n) — exact, one division
  *   - a central credible interval (grid-resolution quantiles)
  *   - P(arm beats control) = P(p_t > p_c)
  *   - expected loss of EITHER decision:
  *     ship the arm → E[max(p_c − p_t, 0)], keep control →
  *     E[max(p_t − p_c, 0)] (Stucchio 2015's decision rule: ship when
  *     the ship-loss clears the care threshold)
  *
  * by DETERMINISTIC numeric integration on a fixed midpoint grid — the
  * same in-engine, no-UDF discipline as [[GroupSequential.phiCol]]:
  * every transcendental is a FIXED Column dag with a character-identical
  * DuckDB rendering, every sum an exact-integer sum, so the oracle
  * replays the integration bit-for-bit.
  *
  * NUMERIC DESIGN (each step chosen so the two engines cannot diverge):
  *
  *   1. Midpoint grid x_i = (2i+1)/2N, N = [[gridN]] = 2¹³ — power-of-two
  *      denominator, so every x_i and 1−x_i is an EXACT double in both
  *      engines.
  *   2. ln x_i and ln(1−x_i) via [[lnOdd2NCol]] — an atanh-series ln over
  *      the exact odd-numerator range reduction (u = m·2ʲ by integer
  *      CASE, never engine pow/log): pure +,*,/ on exact inputs, the
  *      identical expression tree in Column and SQL ⇒ bitwise-equal
  *      doubles (the phiCol/phiSqlFragment pairing). Each lands on the
  *      1e-12 grid as a long.
  *   3. The log-kernel (a−1)·lnx12 + (b−1)·lnm12 is EXACT DECIMAL integer
  *      arithmetic; the max-shift normalizer is an exact max.
  *   4. The pdf kernel quantizes to q_i = round(e^{rel}·10¹³) — from here
  *      on every cumulative/normalizing/comparison sum is an
  *      order-independent INTEGER sum (a 1-ulp exp() disagreement moves
  *      one q_i by ±1 out of ~10¹³ — 9dp-invisible by construction).
  *   5. P(beat) and both expected losses reduce to O(N) cumulative-sum
  *      identities on the quantized grid (never an N² pair join):
  *      P(t>c) = Σᵢ q_t[i]·(2·cumlt_c[i] + q_c[i]) / (2·W_t·W_c) (grid
  *      ties split half each), E[max(c−t,0)] = Σᵢ q_c[i]·(i·cumlt_t[i] −
  *      cumiq_t[i]) / (N·W_t·W_c) since x_i − x_j = (i−j)/N.
  *   6. Credible-interval endpoints are exact-integer rank selections
  *      (cum·2·alphaDen ≥ W·alphaNum — the house (T+1) div 2 discipline),
  *      emitting grid points (exact doubles).
  *
  * BOUNDS (why N = 2¹³ and the 10¹³ scale): W ≤ N·10¹³ ≈ 8.2e16;
  * the loss accumulator ≤ W·(N·W) ≈ 5.5e37 < 10³⁸ — inside DECIMAL(38,0)
  * and HUGEINT. Grid resolution 1/N supports posteriors wider than ~3
  * grid steps ⇒ trustworthy up to ~1.8M units per (arm, peek) cell;
  * beyond that, shard peeks or aggregate coarser (documented envelope —
  * the quantile read degrades gracefully, the gate never diverges
  * because the oracle replays the same grid).
  *
  * PRIOR: integer a₀, b₀ ≥ 1 (default uniform Beta(1,1)); the proper
  * prior keeps every posterior live, so an EMPTY cell (spine-completed
  * peek) reads P(beat) = 0.5 and the uniform CI rather than NULL — the
  * honest "no data yet" answer.
  *
  * SCALE: the one row-scale pass is the upstream [[AbDashboard.abCells]]
  * aggregation; the cells localize once ([[AbDashboard.materialize]] —
  * the eager-execution contract documented there) and EVERYTHING here
  * runs on the (arms × peeks × N)-bounded grid frame: three cumulative
  * windows per (arm, peek) cell, one (peek, i)-keyed join of two bounded
  * frames, two aggregations. At 100× data only the upstream pass grows.
  */
object BayesAb {

  /** Grid points per posterior: 2¹³ midpoints of [0, 1]. */
  val gridN: Int = 8192

  private val dec = "decimal(38,0)"
  private val ln2 = 0.6931471805599453d // the correctly-rounded double of ln 2

  /** ln(u / 2N) for an ODD integer u in [1, 2N−1] (2N = 2¹⁴), as a fixed
    * Column dag: u = m·2ʲ with j by integer CASE (u odd ⇒ j ≤ 13, and
    * m = u/2ʲ ∈ [1, 2) is an EXACT double), then the atanh series
    * ln m = 2t·(1 + t²/3 + … + t²⁴/25), t = (m−1)/(m+1) ≤ 1/3 (tail
    * < 10⁻¹³ — two decades below the 1e-12 landing grid), and
    * ln(u/2N) = 2t·S + (j − 14)·ln2. [[lnOdd2NSqlFragment]] renders the
    * identical expression for DuckDB; keep the two in lockstep (same
    * coefficients as divisions, same association order).
    */
  def lnOdd2NCol(u: Column): Column = {
    val j = when(u < 2L, 0d).when(u < 4L, 1d).when(u < 8L, 2d)
      .when(u < 16L, 3d).when(u < 32L, 4d).when(u < 64L, 5d)
      .when(u < 128L, 6d).when(u < 256L, 7d).when(u < 512L, 8d)
      .when(u < 1024L, 9d).when(u < 2048L, 10d).when(u < 4096L, 11d)
      .when(u < 8192L, 12d).otherwise(13d)
    val p2 = when(u < 2L, 1d).when(u < 4L, 2d).when(u < 8L, 4d)
      .when(u < 16L, 8d).when(u < 32L, 16d).when(u < 64L, 32d)
      .when(u < 128L, 64d).when(u < 256L, 128d).when(u < 512L, 256d)
      .when(u < 1024L, 512d).when(u < 2048L, 1024d).when(u < 4096L, 2048d)
      .when(u < 8192L, 4096d).otherwise(8192d)
    val m = u.cast("double") / p2
    val t = (m - lit(1d)) / (m + lit(1d))
    val t2 = t * t
    def inv(k: Int): Column = lit(1d) / lit(k.toDouble)
    val s = lit(1d) + t2 * (inv(3) + t2 * (inv(5) + t2 * (inv(7) +
      t2 * (inv(9) + t2 * (inv(11) + t2 * (inv(13) + t2 * (inv(15) +
      t2 * (inv(17) + t2 * (inv(19) + t2 * (inv(21) + t2 * (inv(23) +
      t2 * inv(25))))))))))))
    lit(2d) * t * s + (j - lit(14d)) * lit(ln2)
  }

  /** The DuckDB rendering of [[lnOdd2NCol]] over the SQL integer
    * expression `u` (must be parenthesized or atomic).
    */
  def lnOdd2NSqlFragment(u: String): String = {
    val j = s"(CASE WHEN $u < 2 THEN 0.0 WHEN $u < 4 THEN 1.0 " +
      s"WHEN $u < 8 THEN 2.0 WHEN $u < 16 THEN 3.0 WHEN $u < 32 THEN 4.0 " +
      s"WHEN $u < 64 THEN 5.0 WHEN $u < 128 THEN 6.0 WHEN $u < 256 THEN 7.0 " +
      s"WHEN $u < 512 THEN 8.0 WHEN $u < 1024 THEN 9.0 " +
      s"WHEN $u < 2048 THEN 10.0 WHEN $u < 4096 THEN 11.0 " +
      s"WHEN $u < 8192 THEN 12.0 ELSE 13.0 END)"
    val p2 = s"(CASE WHEN $u < 2 THEN 1.0 WHEN $u < 4 THEN 2.0 " +
      s"WHEN $u < 8 THEN 4.0 WHEN $u < 16 THEN 8.0 WHEN $u < 32 THEN 16.0 " +
      s"WHEN $u < 64 THEN 32.0 WHEN $u < 128 THEN 64.0 " +
      s"WHEN $u < 256 THEN 128.0 WHEN $u < 512 THEN 256.0 " +
      s"WHEN $u < 1024 THEN 512.0 WHEN $u < 2048 THEN 1024.0 " +
      s"WHEN $u < 4096 THEN 2048.0 WHEN $u < 8192 THEN 4096.0 " +
      s"ELSE 8192.0 END)"
    val m = s"(CAST($u AS DOUBLE) / $p2)"
    val t = s"(($m - 1.0) / ($m + 1.0))"
    val t2 = s"($t * $t)"
    val s13 = s"(1.0 + $t2 * ((1.0/3.0) + $t2 * ((1.0/5.0) + $t2 * ((1.0/7.0) + " +
      s"$t2 * ((1.0/9.0) + $t2 * ((1.0/11.0) + $t2 * ((1.0/13.0) + " +
      s"$t2 * ((1.0/15.0) + $t2 * ((1.0/17.0) + $t2 * ((1.0/19.0) + " +
      s"$t2 * ((1.0/21.0) + $t2 * ((1.0/23.0) + $t2 * (1.0/25.0)))))))))))))"
    s"(2.0 * $t * $s13 + ($j - 14.0) * $ln2)"
  }

  /** The quantized posterior grid per (arm, peek): one row per grid
    * index i with the pdf kernel q (10¹³-scaled long), its strict
    * cumulative `cumlt`, the index-weighted strict cumulative `cumiq`
    * (DECIMAL — exceeds long), and the normalizer `w`. Input: one row
    * per (arm, peek) with CUMULATIVE counts `n`, `s_hit` (the spine —
    * every designed arm present at every peek).
    */
  private def posteriorGrid(cum: DataFrame, a0: Long, b0: Long): DataFrame = {
    val twoN = 2L * gridN
    val grid = cum
      .withColumn("i", explode(sequence(lit(0), lit(gridN - 1))))
      .withColumn("__u1", lit(2L) * col("i") + 1L)
      .withColumn("__u2", lit(twoN) - col("__u1"))
      .withColumn("__am1", lit(a0) - 1L + col("s_hit"))
      .withColumn("__bm1", lit(b0) - 1L + col("n") - col("s_hit"))
      .withColumn("__lnx12", round(lnOdd2NCol(col("__u1")) * 1e12d).cast("long"))
      .withColumn("__lnm12", round(lnOdd2NCol(col("__u2")) * 1e12d).cast("long"))
      .withColumn("__lnw",
        col("__am1").cast(dec) * col("__lnx12").cast(dec) +
          col("__bm1").cast(dec) * col("__lnm12").cast(dec))
    val wCell = Window.partitionBy(col("arm"), col("peek"))
    val wLt = Window.partitionBy(col("arm"), col("peek")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rel = col("__lnw") - max(col("__lnw")).over(wCell)
    val withQ = grid
      .withColumn("__rel", rel)
      // below e^-40 the 10^13-scaled kernel rounds to 0 — skip the exp
      // (and keep the double cast inside the exact 2^53 range)
      .withColumn("q", when(col("__rel") < lit(-40000000000000L).cast(dec), 0L)
        .otherwise(round(exp(col("__rel").cast("double") / 1e12d) * 1e13d)
          .cast("long")))
    withQ
      .withColumn("cumlt", coalesce(sum(col("q")).over(wLt), lit(0L)))
      .withColumn("cumiq", coalesce(
        sum((col("i").cast(dec) * col("q").cast(dec))).over(wLt),
        lit(0L).cast(dec)))
      .withColumn("w", sum(col("q")).over(wCell))
      .select(col("arm"), col("peek"), col("n"), col("s_hit"), col("i"),
        col("q"), col("cumlt"), col("cumiq"), col("w"))
  }

  /** P(BEST): the genuinely multi-arm Bayesian column — per (arm,
    * peek), the probability the arm's conversion rate is the HIGHEST
    * of ALL k designed arms (what a k-arm launch review actually asks;
    * pairwise P(beat control) answers a different question once k > 2
    * and does not sum to anything). On the shared quantized grid,
    *
    *   P(best_t) = Σ_i q_t[i] · Π_{a≠t} cdf_a[i]  /  W_t,
    *   cdf_a[i] = (2·cumlt_a[i] + q_a[i]) / (2·W_a)
    *
    * (grid ties split half each — the pairwise convention; for k = 2
    * this IS the [[bayesAbKArmFromCells]] p_beat integral, spec-pinned
    * to 1e-9). Determinism: the cdf products are fixed-order double
    * dags over exact integers (arms order, skipping t, left-assoc —
    * rendered identically in SQL); each grid term ROUNDS TO AN INTEGER
    * before the sum (terms are ≤ q_t[i] ~ 10¹³, so the ±0.5 rounding is
    * ≤ 4·10³ against W-scale 10¹⁶ sums — 9dp-invisible and ORDER-FREE),
    * and P(best) is one division. Σ_t P(best_t) = 1 up to quantization
    * (spec-pinned). Emits ALL designed arms (the best-read has no
    * control side): peek, arm, n, s_hit, post_mean, p_best.
    *
    * SCALE: the same (arms × peeks × 2¹³) grid frame as the pairwise
    * read, one (peek, i)-keyed k-wide pivot, one aggregation. k is
    * bounded small (a design has 2–10 arms).
    */
  def bayesBestKArmFromCells(
      cells: DataFrame,
      arms: Seq[String],
      a0: Long = 1L,
      b0: Long = 1L
  ): DataFrame = {
    require(arms.distinct.size == arms.size && arms.size >= 2,
      s"need >= 2 distinct designed arms: $arms")
    require(a0 >= 1L && b0 >= 1L, s"integer prior must be proper: a0=$a0 b0=$b0")
    val spark = cells.sparkSession
    import spark.implicits._
    val local = AbDashboard.materialize(
      cells.filter(col("arm").isin(arms: _*)))
    val peeks = local.select(col("peek")).distinct()
    val armsDf = broadcast(arms.toDF("arm"))
    val full = peeks.crossJoin(armsDf)
      .join(local.select(col("arm"), col("peek"), col("n"), col("s_hit")),
        Seq("arm", "peek"), "left")
      .select(col("arm"), col("peek"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("s_hit"), lit(0L)).as("s_hit"))
    val wCum = Window.partitionBy(col("arm")).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full.select(col("arm"), col("peek"),
      sum("n").over(wCum).as("n"), sum("s_hit").over(wCum).as("s_hit"))
    val g = posteriorGrid(cum, a0, b0)
    val pivCols = arms.flatMap { a =>
      Seq(max(when(col("arm") === a, col("q"))).as(s"__q_$a"),
        max(when(col("arm") === a, col("cumlt"))).as(s"__c_$a"),
        max(when(col("arm") === a, col("w"))).as(s"__w_$a"))
    }
    val piv = g.groupBy(col("peek"), col("i"))
      .agg(pivCols.head, pivCols.tail: _*)
    def cdf(a: String) =
      (lit(2L) * col(s"__c_$a") + col(s"__q_$a")).cast("double") /
        (lit(2L) * col(s"__w_$a")).cast("double")
    val termCols = arms.map { t =>
      val prod = arms.filter(_ != t).map(cdf).reduce(_ * _)
      sum(round(col(s"__q_$t").cast("double") * prod).cast(dec))
        .as(s"__s_$t")
    }
    val wCols = arms.map(a => max(col(s"__w_$a")).as(s"__wm_$a"))
    val agg = piv.groupBy(col("peek"))
      .agg((termCols ++ wCols).head, (termCols ++ wCols).tail: _*)
    // unpivot to (peek, arm, p_best) — ONE explode over a k-struct
    // array (a union of per-arm selects would re-execute the whole
    // grid chain once per arm)
    val pairs = arms.map { t =>
      struct(lit(t).as("arm"),
        (col(s"__s_$t").cast("double") / col(s"__wm_$t").cast("double"))
          .as("p_best"))
    }
    val perArm = agg
      .select(col("peek"), explode(array(pairs: _*)).as("__kv"))
      .select(col("peek"), col("__kv.arm").as("arm"),
        col("__kv.p_best").as("p_best"))
    cum
      .withColumn("post_mean", (lit(a0) + col("s_hit")).cast("double") /
        (lit(a0 + b0) + col("n")).cast("double"))
      .join(perArm, Seq("peek", "arm"))
      .select(col("peek"), col("arm"), col("n"), col("s_hit"),
        col("post_mean"), col("p_best"))
  }

  /** The k-arm Bayesian dashboard read from a (possibly folded)
    * [[AbDashboard.abCells]] frame: one row per (peek, treatment arm)
    * with both posteriors' summaries and the comparison integrals
    * against `control`, on the CUMULATIVE counts up to the peek (the
    * dashboard convention). `ciAlphaNum/ciAlphaDen` is the central
    * credible mass complement as an exact rational (default 5/100 →
    * 95% interval); endpoints are the smallest grid points whose
    * cumulative mass clears α/2 and 1−α/2 (grid-resolution quantiles).
    * Peek/arm ordering is the caller's (one row per pair).
    */
  def bayesAbKArmFromCells(
      cells: DataFrame,
      arms: Seq[String],
      control: String,
      a0: Long = 1L,
      b0: Long = 1L,
      ciAlphaNum: Int = 5,
      ciAlphaDen: Int = 100
  ): DataFrame = {
    require(arms.distinct.size == arms.size && arms.size >= 2,
      s"need >= 2 distinct designed arms: $arms")
    require(arms.contains(control), s"control '$control' must be in $arms")
    require(a0 >= 1L && b0 >= 1L, s"integer prior must be proper: a0=$a0 b0=$b0")
    require(ciAlphaNum > 0 && ciAlphaNum < ciAlphaDen,
      s"ci alpha must be a rational in (0,1): $ciAlphaNum/$ciAlphaDen")
    val spark = cells.sparkSession
    import spark.implicits._
    val local = AbDashboard.materialize(
      cells.filter(col("arm").isin(arms: _*)))
    // (arm × peek) spine + cumulative counts per arm in peek order
    val peeks = local.select(col("peek")).distinct()
    val armsDf = broadcast(arms.toDF("arm"))
    val full = peeks.crossJoin(armsDf)
      .join(local.select(col("arm"), col("peek"), col("n"), col("s_hit")),
        Seq("arm", "peek"), "left")
      .select(col("arm"), col("peek"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("s_hit"), lit(0L)).as("s_hit"))
    val wCum = Window.partitionBy(col("arm")).orderBy(col("peek"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full.select(col("arm"), col("peek"),
      sum("n").over(wCum).as("n"), sum("s_hit").over(wCum).as("s_hit"))
    val g = posteriorGrid(cum, a0, b0)
    // per-(arm, peek) posterior summary: exact-integer rank selections
    // for the CI, the exact closed-form posterior mean
    val xI = (lit(2L) * col("i") + 1L).cast("double") / lit((2 * gridN).toDouble)
    val den2 = lit(2L * ciAlphaDen).cast(dec)
    val cumLe = (col("cumlt") + col("q")).cast(dec)
    val wD = col("w").cast(dec)
    val hitLo = cumLe * den2 >= wD * lit(ciAlphaNum.toLong).cast(dec)
    val hitHi = cumLe * den2 >= wD * lit(2L * ciAlphaDen - ciAlphaNum).cast(dec)
    val stats = g.groupBy(col("arm"), col("peek")).agg(
      max("n").as("n"), max("s_hit").as("s_hit"),
      min(when(hitLo, xI)).as("ci_lo"),
      min(when(hitHi, xI)).as("ci_hi"))
      .withColumn("a_post", lit(a0) + col("s_hit"))
      .withColumn("b_post", lit(b0) + col("n") - col("s_hit"))
      .withColumn("post_mean", col("a_post").cast("double") /
        (col("a_post") + col("b_post")).cast("double"))
    // comparison integrals: treatment grid beside the control grid at
    // the same (peek, i) — O(N) cumulative-sum identities, exact sums
    val t = g.filter(col("arm") =!= control)
    val c = g.filter(col("arm") === control).select(
      col("peek"), col("i"), col("q").as("__qc"), col("cumlt").as("__cltc"),
      col("cumiq").as("__ciqc"), col("w").as("__wc"))
    val joined = t.join(c, Seq("peek", "i"))
    val qtD = col("q").cast(dec); val qcD = col("__qc").cast(dec)
    val iD = col("i").cast(dec)
    val cmp = joined.groupBy(col("arm"), col("peek")).agg(
      sum(qtD * (lit(2L).cast(dec) * col("__cltc").cast(dec) + qcD)).as("__pb2"),
      sum(qcD * (iD * col("cumlt").cast(dec) - col("cumiq"))).as("__lt2"),
      sum(qtD * (iD * col("__cltc").cast(dec) - col("__ciqc"))).as("__lc2"),
      max(col("w")).as("__wt"), max(col("__wc")).as("__wc2"))
    val wtD = col("__wt").cast("double"); val wcD = col("__wc2").cast("double")
    val read = cmp
      .withColumn("p_beat_ctl",
        col("__pb2").cast("double") / (lit(2d) * wtD * wcD))
      .withColumn("exp_loss_arm",
        col("__lt2").cast("double") / (wtD * wcD * lit(gridN.toDouble)))
      .withColumn("exp_loss_ctl",
        col("__lc2").cast("double") / (wtD * wcD * lit(gridN.toDouble)))
    val armStats = stats.filter(col("arm") =!= control).select(
      col("arm"), col("peek"), col("n").as("n_arm"), col("s_hit").as("s_arm"),
      col("a_post").as("a_arm"), col("b_post").as("b_arm"),
      col("post_mean").as("post_mean_arm"),
      col("ci_lo").as("ci_lo_arm"), col("ci_hi").as("ci_hi_arm"))
    val ctlStats = stats.filter(col("arm") === control).select(
      col("peek"), col("n").as("n_ctl"), col("s_hit").as("s_ctl"),
      col("a_post").as("a_ctl"), col("b_post").as("b_ctl"),
      col("post_mean").as("post_mean_ctl"),
      col("ci_lo").as("ci_lo_ctl"), col("ci_hi").as("ci_hi_ctl"))
    armStats
      .join(ctlStats, Seq("peek"))
      .join(read.select(col("arm"), col("peek"), col("p_beat_ctl"),
        col("exp_loss_arm"), col("exp_loss_ctl")), Seq("arm", "peek"))
      .select(col("peek"), col("arm"),
        col("n_arm"), col("s_arm"), col("a_arm"), col("b_arm"),
        col("post_mean_arm"), col("ci_lo_arm"), col("ci_hi_arm"),
        col("n_ctl"), col("s_ctl"), col("a_ctl"), col("b_ctl"),
        col("post_mean_ctl"), col("ci_lo_ctl"), col("ci_hi_ctl"),
        col("p_beat_ctl"), col("exp_loss_arm"), col("exp_loss_ctl"))
  }
}
