package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events table: ordered-step FUNNEL
  * conversion and weekly COHORT RETENTION — the two workhorse queries
  * of product analytics, and (for a training-data engine) the shape of
  * "did this pipeline stage see, then transform, then emit this
  * record" audit trails.
  *
  * Funnel semantics (the standard greedy/earliest-completion match):
  * a user reaches step i+1 if an event of the step's type occurs AFTER
  * the event that completed step i (in (ts, event_id) order — ties
  * broken by the unique id, so the match is total-order deterministic)
  * and within `spanSec` of the step-1 completion. Greedy earliest is
  * the published default (first qualifying event advances the funnel);
  * spans check at second precision.
  *
  * Scale shape: ONE shuffle — events project to (user, ts_sec,
  * event_id, type), group to a per-user sorted list, and a narrow
  * `aggregate` fold advances the step counter in a single pass; the
  * fold accumulator packs (step_idx, step1_ts) into one long, so the
  * whole match is codegen-resident integer arithmetic. Per-user state
  * is that user's own events (the [[graft.streaming.StreamingOps]]
  * sessionization contract), never the corpus. The q136 oracle uses a
  * DIFFERENT formulation (stepwise packed-code minimums) — the two
  * derivations cross-check each other.
  */
object Funnel {

  private val Pow = 1L << 40 // acc = step_idx * Pow + step1_ts_sec

  /** (userCol, steps_completed ∈ [0, steps.length]) for every user with
    * at least one event of a funnel-step type.
    *
    * Packing contract: `tsCol` must be SECONDS in [0, 2^40) — a negative
    * (pre-1970) or millisecond-scale epoch would corrupt the packed
    * accumulator, so out-of-range values FAIL FAST (raise_error in the
    * projection) rather than silently mis-matching.
    *
    * `maxEventsPerUser`: optional per-user row-width bound (the
    * MinHashLsh `maxBucketSize` discipline). The per-user state here is
    * "that user's own step-typed events", which is the sessionization
    * contract — but a bot emitting millions of step-typed events would
    * become one monster `collect_list` row. With the cap set, only the
    * deterministic EARLIEST cap events per user (by (ts, event_id) —
    * total order) enter the fold, bounding row width before the
    * collect; greedy-earliest semantics are unchanged whenever the cap
    * is ≥ the user's event count. The row_number window hash-partitions
    * on the user, so the following groupBy reuses the exchange — the
    * cap costs a per-user sort, not a second shuffle.
    */
  def stepsCompleted(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      steps: Seq[String],
      spanSec: Long,
      maxEventsPerUser: Option[Int] = None
  ): DataFrame = {
    require(steps.nonEmpty && steps.size < 16, s"1..15 steps, got ${steps.size}")
    require(spanSec > 0, "spanSec must be positive")
    require(maxEventsPerUser.forall(_ > 0), "maxEventsPerUser must be positive")
    val k = steps.size
    val stepArr = array(steps.map(lit): _*)
    val tsSec = col(tsCol).cast("long")
    // coalesce in the message: a NULL ts must fail with the diagnostic,
    // not a message-less NULL-propagated error
    val tsGuarded = when(tsSec >= 0 && tsSec < Pow, tsSec)
      .otherwise(raise_error(concat(
        lit(s"Funnel: $tsCol out of the [0, 2^40) second-precision packing range: "),
        coalesce(tsSec.cast("string"), lit("NULL")))).cast("long"))
    val typed = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(tsGuarded.as("ts"),
          col(idCol).cast("long").as("eid"),
          col(typeCol).as("t")).as("e"))
    val ev = maxEventsPerUser match {
      case None => typed
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(userCol))
          .orderBy(col("e.ts"), col("e.eid"))
        typed.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= cap).drop("__rn")
    }
    val folded = ev.groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col(userCol),
        aggregate(col("es"), lit(0L), (acc, x) => {
          val t1 = pmod(acc, lit(Pow))
          val idx = ((acc - t1) / lit(Pow)).cast("long")
          val need = element_at(stepArr, (idx + 1).cast("int"))
          val spanOk = (idx === 0) || (x.getField("ts") - t1 <= spanSec)
          when(idx < k && x.getField("t") === need && spanOk,
            (idx + 1) * Pow +
              when(idx === 0, x.getField("ts")).otherwise(t1))
            .otherwise(acc)
        }).as("__acc"))
    folded.select(col(userCol),
      ((col("__acc") - pmod(col("__acc"), lit(Pow))) / lit(Pow))
        .cast("long").as("steps_completed"))
  }

  /** Funnel report: for each step, how many users reached at least it.
    * (step_idx 1-based, step_name, n_users) — n_users is monotone
    * non-increasing by construction.
    */
  def report(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      steps: Seq[String],
      spanSec: Long,
      maxEventsPerUser: Option[Int] = None
  ): DataFrame = {
    val sc = stepsCompleted(events, userCol, typeCol, tsCol, idCol, steps,
      spanSec, maxEventsPerUser)
    import events.sparkSession.implicits._
    val stepFrame = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }
      .toDF("step_idx", "step_name")
    // stepsCompleted is one row per user, so count(*), not a distinct;
    // and the report must carry EVERY step — a step nobody reached is a
    // (step, 0) row, not an absent one (left join from the step frame)
    val reached = sc
      .join(broadcast(stepFrame), col("steps_completed") >= col("step_idx"))
      .groupBy("step_idx")
      .agg(count(lit(1)).as("__n"))
    stepFrame.join(reached, Seq("step_idx"), "left")
      .select(col("step_idx"), col("step_name"),
        coalesce(col("__n"), lit(0L)).as("n_users"))
  }

  /** Event-transition matrix (first-order Markov over per-user event
    * sequences): counts of consecutive (from → to) event types in
    * (ts, event_id) order, with the row-normalized transition
    * probability as one exact-long division. One shuffle (the per-user
    * lag window — state bounded by a user's own events), then a
    * types²-sized roll-up.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).cast("long"), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    counts.withColumn("p", col("n") / sum(col("n")).over(w2))
  }

  /** Top event PATHS — [[transitionMatrix]]'s higher-order sibling and
    * the discovery tool funnels are built FROM: count every window of
    * `pathLen` consecutive event types per user (in (ts, event_id)
    * order) and keep the `topK` most frequent paths, ties broken by the
    * path string — "what do users actually do in sequence", before you
    * commit to a steps list.
    *
    * Scale shape: one per-user window shuffle (pathLen−1 lags share its
    * sort), a paths-sized roll-up with map-side combine, and a
    * TakeOrdered top-k — never a global sort.
    */
  def topPaths(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      pathLen: Int,
      topK: Int
  ): DataFrame = {
    require(pathLen >= 2 && pathLen <= 8, s"pathLen must be in [2, 8]: $pathLen")
    require(topK > 0, "topK must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).cast("long"), col(idCol))
    val lagged = (pathLen - 1 to 1 by -1).map(i =>
      lag(col(typeCol), i).over(w)) :+ col(typeCol)
    events
      // NULL-typed events are excluded BEFORE the window: concat_ws
      // silently drops NULL components, so a (a, NULL, c) window would
      // otherwise emit "a>c" — a malformed 2-element string counted as
      // a pathLen-path (and diverging from the oracle's NULL-propagating
      // || concatenation)
      .filter(col(typeCol).isNotNull)
      .select(concat_ws(">", lagged: _*).as("path"),
        lagged.head.isNotNull.as("__full"))
      .filter(col("__full")) // windows that reach back before the user's first event drop
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)
  }

  /** Weekly cohort retention: cohort = ISO week of the user's first
    * event; one row per (cohort_week, week_offset) with the distinct
    * active-user count. Two aggregations on user + one on the
    * (cohort, offset) pairs — the pairs frame is weeks², tiny.
    */
  def weeklyRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String
  ): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cw"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("aw"))
      .distinct()
    active.join(firsts, Seq(userCol))
      .select(col(userCol),
        date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        expr("datediff(aw, cw) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
