package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis under RIGHT-CENSORING — the read plain retention
  * curves (graft.operators.Funnel.retention) get wrong on a live
  * corpus: a user whose last event is yesterday hasn't churned, they
  * just haven't been observed long enough, and counting them as
  * churned biases every lifetime estimate downward. Reference scope:
  * none (the reference has no statistics); this extends the q136–q141
  * behavioral family the same way the drift/test layers extend
  * profiling.
  */
object Survival {

  /** Kaplan–Meier product-limit estimator (Kaplan & Meier 1958): the
    * survival curve S(t) from one row per subject — `durationCol` (long
    * integer units: hours, days) and `eventCol` (1 = the terminal event
    * was OBSERVED at that duration, 0 = right-censored there: still
    * alive when observation ended):
    *
    *   S(t) = Π_{s ≤ t, d_s > 0} (1 − d_s/n_s)
    *
    * with d_s the events at duration s and n_s the at-risk count
    * (subjects with duration ≥ s — censored-at-s subjects ARE at risk
    * at s and leave after, the standard events-before-censors
    * convention). Greenwood's variance rides the same pass:
    * se(t) = S(t)·√(Σ_{s≤t} d/(n(n−d))).
    *
    * Determinism (the house product-form discipline, the PageRank/JS
    * nano rule): each event time's ln(1 − d/n) and Greenwood increment
    * d/(n(n−d)) are nano-scaled longs — fixed per-row dags — summed in
    * duration order by ONE cumulative window over the
    * duration-cardinality frame; S = exp(Σ/1e9) and se are fixed dags,
    * gated at 9 decimals. When n_t = d_t (everyone at risk dies) S is
    * EXACTLY 0 from t on (flagged through `__dead`, not ln(0)). Counts
    * (n_risk, n_event, n_censored) are exact longs.
    *
    * SCALE: one (keys, duration) counting aggregation (map-side
    * combine) + cumulative windows over the duration-cardinality frame
    * (integer durations by contract — bucket continuous times first,
    * the q210 discipline; NEVER a per-subject sort). Emits one row per
    * (keys, duration): n_risk, n_event, n_censored, survival,
    * se_greenwood (NULL once S = 0).
    */
  def kaplanMeier(
      df: DataFrame,
      keyCols: Seq[String],
      durationCol: String,
      eventCol: String
  ): DataFrame =
    kaplanMeierFromCells(lifetimeCells(df, keyCols, durationCol, eventCol), keyCols)

  /** Per-(keys, duration) event/censor counts — the ADDITIVE, mergeable
    * state the survival family reduces over: [[kaplanMeierFromCells]]
    * (and through it [[medianSurvival]]) reads this one frame, so a
    * versioned fold of it (the rankCells/valueCells discipline) makes
    * the survival curve a STANDING read over all observed cohorts
    * without rescanning subjects. Duration cardinality is the store
    * bound (integer durations by contract — bucket continuous times
    * first, the q210 discipline).
    */
  def lifetimeCells(
      df: DataFrame,
      keyCols: Seq[String],
      durationCol: String,
      eventCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val dur = col(durationCol).cast("long")
    val ev = col(eventCol).cast("long")
    df.filter(dur.isNotNull && ev.isNotNull)
      .groupBy(g :+ dur.as("t"): _*)
      .agg(
        sum(when(ev =!= 0L, 1L).otherwise(0L)).as("n_event"),
        sum(when(ev =!= 0L, 0L).otherwise(1L)).as("n_censored"))
  }

  /** Fold two [[lifetimeCells]] frames over disjoint subject sets. */
  def mergeLifetimeCells(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col) :+ col("t"): _*)
      .agg(sum("n_event").as("n_event"), sum("n_censored").as("n_censored"))

  /** [[kaplanMeier]] from a (possibly folded) [[lifetimeCells]] frame. */
  def kaplanMeierFromCells(cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val wRisk = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = cells
      .withColumn("n_risk", sum(col("n_event") + col("n_censored")).over(wRisk))
    val nD = col("n_risk").cast("double")
    val dD = col("n_event").cast("double")
    // nano terms: a no-event time contributes exactly 0 to both sums
    val ln9 = when(col("n_event") === 0L, 0L)
      .when(col("n_event") < col("n_risk"),
        round(log((nD - dD) / nD) * 1e9d).cast("long"))
    val gw9 = when(col("n_event") === 0L, 0L)
      .when(col("n_event") < col("n_risk"),
        round(dD / (nD * (nD - dD)) * 1e9d).cast("long"))
    withRisk
      .withColumn("__ln9", ln9)
      .withColumn("__gw9", gw9)
      // the exhaustion flag: once some s <= t had d_s = n_s, S is 0
      .withColumn("__dead",
        max(when(col("n_event") === col("n_risk"), 1L).otherwise(0L)).over(wCum) === 1L)
      .withColumn("__lnsum9", sum("__ln9").over(wCum))
      .withColumn("__gwsum9", sum("__gw9").over(wCum))
      .withColumn("survival",
        when(col("__dead"), 0d)
          .otherwise(exp(col("__lnsum9").cast("double") / 1e9d)))
      .withColumn("se_greenwood",
        when(!col("__dead"),
          col("survival") * sqrt(col("__gwsum9").cast("double") / 1e9d)))
      .select(g :+ col("t") :+ col("n_risk") :+ col("n_event") :+
        col("n_censored") :+ col("survival") :+ col("se_greenwood"): _*)
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) from the
    * same [[lifetimeCells]] state as [[kaplanMeierFromCells]] — the
    * HAZARD view of the curve: H(t) = Σ_{s≤t} d_s/n_s accumulates risk
    * additively, so cohort hazards compare by subtraction where
    * survival curves only compare by ratio, and the Fleming–Harrington
    * survival S̃ = e^(−H) is the better-behaved small-sample estimator
    * (never hits exact 0 while anyone is at risk). Aalen's variance
    * Σ d/n² rides the same pass.
    *
    * Determinism: each time's d/n and d/n² are nano longs (fixed
    * per-row dags), ONE duration-ordered cumulative window over the
    * duration-cardinality frame; H, se and S̃ are fixed dags at 9dp.
    * Emits one row per (keys, t): n_risk, n_event, n_censored, hazard,
    * se_hazard, surv_fh.
    */
  def nelsonAalen(
      df: DataFrame,
      keyCols: Seq[String],
      durationCol: String,
      eventCol: String
  ): DataFrame =
    nelsonAalenFromCells(lifetimeCells(df, keyCols, durationCol, eventCol), keyCols)

  /** [[nelsonAalen]] from a (possibly folded) [[lifetimeCells]] frame. */
  def nelsonAalenFromCells(cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val wRisk = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = cells
      .withColumn("n_risk", sum(col("n_event") + col("n_censored")).over(wRisk))
    val nD = col("n_risk").cast("double")
    val dD = col("n_event").cast("double")
    val h9 = when(col("n_event") === 0L, 0L)
      .otherwise(round(dD / nD * 1e9d).cast("long"))
    val v9 = when(col("n_event") === 0L, 0L)
      .otherwise(round(dD / (nD * nD) * 1e9d).cast("long"))
    withRisk
      .withColumn("__h9", h9)
      .withColumn("__v9", v9)
      .withColumn("__hsum9", sum("__h9").over(wCum))
      .withColumn("__vsum9", sum("__v9").over(wCum))
      .withColumn("hazard", col("__hsum9").cast("double") / 1e9d)
      .withColumn("se_hazard", sqrt(col("__vsum9").cast("double") / 1e9d))
      .withColumn("surv_fh", exp(-col("__hsum9").cast("double") / 1e9d))
      .select(g :+ col("t") :+ col("n_risk") :+ col("n_event") :+
        col("n_censored") :+ col("hazard") :+ col("se_hazard") :+
        col("surv_fh"): _*)
  }

  /** Two-group log-rank test (Mantel 1966; Peto & Peto 1972): do two
    * cohorts' SURVIVAL CURVES differ — the inference companion of
    * [[kaplanMeier]] (KM draws the curves, log-rank tests them), and
    * the right A/B for "does the new onboarding change user lifetime"
    * where a means test ignores censoring. At every pooled event time
    * t, group 1's observed events d₁ₜ are compared to the
    * hypergeometric expectation under "same hazard":
    *
    *   E₁ₜ = dₜ·n₁ₜ/nₜ
    *   Vₜ  = dₜ·(n₁ₜ/nₜ)·(n₂ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1)
    *   z   = (O₁ − ΣE₁ₜ)/√ΣVₜ,   χ² = z²  ~ χ²₁
    *
    * Determinism: subject counts are exact longs (O₁ is an exact
    * integer); each time's E and V are nano longs (fixed per-row dags —
    * the KM discipline) summed order-free; z/χ² are fixed dags at 9dp.
    * Conventions shared with [[graft.quality.Association.mannWhitney]]:
    * groups pivot to (grp_lo, grp_hi) = (min, max) label, ≠2 groups
    * flagged via n_groups with NULL statistics; censored-at-t subjects
    * are at risk at t. NULL z when ΣV = 0 (no comparable event time).
    *
    * SCALE: one (group, duration) counting aggregation; everything
    * after runs on the pooled duration-cardinality frame (reverse
    * cumulative at-risk windows + one summary aggregation) — never a
    * per-subject sort. One row out.
    */
  def logRank(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      durationCol: String,
      eventCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val dur = col(durationCol).cast("long")
    val ev = col(eventCol).cast("long")
    val cells = df
      .filter(dur.isNotNull && ev.isNotNull && col(groupCol).isNotNull)
      .groupBy(g :+ col(groupCol).cast("string").as("grp") :+ dur.as("t"): _*)
      .agg(
        sum(when(ev =!= 0L, 1L).otherwise(0L)).as("__d"),
        sum(when(ev =!= 0L, 0L).otherwise(1L)).as("__c"))
    val wKey = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // 2-group pivot onto the POOLED time spine (one row per (keys, t))
    val labeled = cells
      .withColumn("__ngrps", size(collect_set(col("grp")).over(wKey)))
      .withColumn("grp_lo", min("grp").over(wKey))
      .withColumn("grp_hi", max("grp").over(wKey))
    val spine = labeled
      .groupBy(g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps") :+ col("t"): _*)
      .agg(
        sum(when(col("grp") === col("grp_lo"), col("__d")).otherwise(0L)).as("__d1"),
        sum(when(col("grp") === col("grp_lo"), col("__c")).otherwise(0L)).as("__c1"),
        sum(when(col("grp") =!= col("grp_lo"), col("__d")).otherwise(0L)).as("__d2"),
        sum(when(col("grp") =!= col("grp_lo"), col("__c")).otherwise(0L)).as("__c2"))
    val wRisk = Window
      .partitionBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withRisk = spine
      .withColumn("__n1", sum(col("__d1") + col("__c1")).over(wRisk))
      .withColumn("__n2", sum(col("__d2") + col("__c2")).over(wRisk))
    val n1 = col("__n1").cast("double"); val n2 = col("__n2").cast("double")
    val n = n1 + n2
    val d = (col("__d1") + col("__d2")).cast("double")
    val atEvent = (col("__d1") + col("__d2")) > 0L && (col("__n1") + col("__n2")) > 1L
    val e9 = when(atEvent, round(d * n1 / n * 1e9d).cast("long")).otherwise(0L)
    val v9 = when(atEvent,
      round(d * (n1 / n) * (n2 / n) * (n - d) / (n - 1d) * 1e9d).cast("long"))
      .otherwise(0L)
    val sums = withRisk
      .withColumn("__e9", e9)
      .withColumn("__v9", v9)
      .groupBy((g :+ col("grp_lo") :+ col("grp_hi") :+ col("__ngrps")): _*)
      .agg(
        sum("__d1").as("o_lo"),
        sum(col("__d1") + col("__c1")).as("n_lo"),
        sum(col("__d2") + col("__c2")).as("n_hi"),
        sum(col("__e9").cast("decimal(38,0)")).as("__e9s"),
        sum(col("__v9").cast("decimal(38,0)")).as("__v9s"))
    val two = col("__ngrps") === 2
    val zStat = (col("o_lo").cast("double") - col("__e9s").cast("double") / 1e9d) /
      sqrt(col("__v9s").cast("double") / 1e9d)
    val ok = two && col("__v9s") > 0L
    sums
      .withColumn("n_groups", col("__ngrps").cast("long"))
      // the mannWhitney flag rule: with ≠2 cohorts every per-side
      // column is NULL (grp_hi would otherwise silently lump groups)
      .withColumn("n_lo", when(two, col("n_lo")))
      .withColumn("n_hi", when(two, col("n_hi")))
      .withColumn("o_lo", when(two, col("o_lo")))
      .withColumn("e_lo_9", when(two, col("__e9s").cast("string")))
      .withColumn("v_9", when(two, col("__v9s").cast("string")))
      .withColumn("z", when(ok, zStat))
      .withColumn("chi2", when(ok, zStat * zStat))
      .select(g :+ col("grp_lo") :+ col("grp_hi") :+ col("n_groups") :+
        col("n_lo") :+ col("n_hi") :+ col("o_lo") :+ col("e_lo_9") :+
        col("v_9") :+ col("z") :+ col("chi2"): _*)
  }

  /** Restricted mean survival time (Royston & Parmar 2013 popularized;
    * the τ-truncated area under the KM curve): the "average lifetime
    * within the first τ units" summary that stays defined under heavy
    * censoring where the plain mean doesn't and the median may never
    * cross — AND the difference of two cohorts' RMSTs is the
    * honest "extra lifetime bought" effect size the hazard ratio isn't.
    * Read off a [[kaplanMeier]] frame:
    *
    *   RMST(τ) = Σ_i S(t_{i−1})·(t_i − t_{i−1}) + S(t_k)·(τ − t_k)
    *   (t₀ = 0, S(t₀) = 1, over event times t_i ≤ τ)
    *
    * Determinism: each step's survival is nano-landed FIRST
    * (round(1e9·S) — S is already a fixed dag) and multiplied by the
    * exact integer width, so the segment sum is an exact DECIMAL
    * integer summed order-free and RMST is one division — bit-identical
    * cross-engine (a raw double running sum would be order-sensitive).
    * Within 5e-10·τ of the unrounded area (stated). Groups whose curve
    * has no point ≤ τ never dropped below 1: their RMST is exactly τ —
    * emitted via the full key frame, not silently absent. Emits one row
    * per key set: tau, t_last (the last step ≤ τ; 0 when none), rmst.
    */
  def rmst(km: DataFrame, keyCols: Seq[String], tau: Long): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    def grouped(df: DataFrame) =
      if (keyCols.isEmpty) df.groupBy() else df.groupBy(g: _*)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("t"))
    val wLast = Window.partitionBy(g: _*).orderBy(col("t").desc)
    val kept = km.filter(col("t") <= tau)
      .select((g :+ col("t") :+ col("survival")): _*)
      .withColumn("__prevS", lag("survival", 1, 1.0d).over(wOrd))
      .withColumn("__prevT", lag("t", 1, 0L).over(wOrd))
      .withColumn("__isLast", row_number().over(wLast) === 1)
    val seg9 = round(col("__prevS") * 1e9d).cast(dec) *
      (col("t") - col("__prevT")).cast(dec) +
      when(col("__isLast"),
        round(col("survival") * 1e9d).cast(dec) * (lit(tau) - col("t")).cast(dec))
        .otherwise(lit(0L).cast(dec))
    val sums = grouped(kept.withColumn("__seg9", seg9))
      .agg(max(when(col("__isLast"), col("t"))).as("t_last"),
        sum("__seg9").as("__rm9"))
    // groups with no step <= tau (possible when tau undercuts every
    // duration): the curve is still 1 there, RMST = tau exactly
    val universe = grouped(km.select((g :+ col("t")): _*)).agg(count(lit(1)).as("__k"))
    val joined =
      if (keyCols.isEmpty) sums
      else universe.join(sums, keyCols, "left_outer")
    joined
      .withColumn("tau", lit(tau))
      .withColumn("t_last", coalesce(col("t_last"), lit(0L)))
      .withColumn("rmst",
        coalesce(col("__rm9").cast("double") / 1e9d, lit(tau.toDouble)))
      .select((g :+ col("tau") :+ col("t_last") :+ col("rmst")): _*)
  }

  /** Median survival time — the smallest duration with S(t) ≤ 1/2,
    * read off a [[kaplanMeier]] frame: one filtered min per key set
    * (NULL when the curve never crosses — more than half the cohort
    * outlives the observation window, the right answer a naive median
    * of durations gets wrong under censoring).
    */
  def medianSurvival(km: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    if (keyCols.isEmpty)
      km.agg(min(when(col("survival") <= 0.5d, col("t"))).as("median_survival"))
    else
      km.groupBy(g: _*)
        .agg(min(when(col("survival") <= 0.5d, col("t"))).as("median_survival"))
  }
}
