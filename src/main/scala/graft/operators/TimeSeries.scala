package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling over event streams: truncate to a fixed step,
  * aggregate, and GAP-FILL so every (key, step) slot between a key's first
  * and last event exists — downstream models and dashboards need dense
  * series, not "no row means zero, unless the pipeline was down".
  *
  * Scale shape: the spine (one row per key × slot) is generated
  * DISTRIBUTED — `sequence()` + `explode` per key, never a driver-side
  * range — and both the spine and the counts shuffle once on
  * (key, slot) for the fill join. Slot cardinality is
  * span/step per key, so the spine is output-sized, not input-sized.
  */
object TimeSeries {

  private def slotted(df: DataFrame, keyCols: Seq[String], tsCol: String, step: String)
      : (DataFrame, DataFrame) = {
    // window(ts, step).start truncates to epoch-aligned slots of ANY
    // duration ("1 hour", "15 minutes", "2 hours", …) — a date_trunc-based
    // form only handled single-unit steps and silently produced NULL slots
    // or spine/count misalignment for everything else
    val ev = df.select(
      (keyCols.map(col) :+ window(col(tsCol), step).getField("start").as("slot")) ++
        df.columns.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    val spine = ev.groupBy(keyCols.map(col): _*)
      .agg(min("slot").as("__lo"), max("slot").as("__hi"))
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), expr(s"interval $step"))).as("slot"): _*)
    (ev, spine)
  }

  /** Dense per-key counts at `step` granularity ("1 hour", "15 minutes",
    * …): missing slots appear with n = 0. Keys contribute slots only
    * within their own [min, max] event range.
    */
  def resampleCounts(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      step: String = "1 hour"
  ): DataFrame = {
    val (ev, spine) = slotted(df, keyCols, tsCol, step)
    val counts = ev.groupBy(keyCols.map(col) :+ col("slot"): _*)
      .agg(count(lit(1)).as("__n"))
    spine.join(counts, keyCols :+ "slot", "left")
      .select(keyCols.map(col) :+ col("slot") :+
        coalesce(col("__n"), lit(0L)).as("n"): _*)
  }

  /** SPARSE per-(keys, slot) event counts — the additive, mergeable
    * state behind [[resampleCounts]] (which densifies immediately):
    * fold batches with [[mergeSlotCounts]], densify the standing store
    * with [[densifyCounts]], and every trend operator (ACF, MK,
    * Theil–Sen, changepoint, seasonal, EWMA) runs over ALL history
    * without re-reading it — the [[graft.streaming.StreamingOps
    * .slotCountsStream]] contract. Store size = keys × active slots
    * (span-bounded), not events.
    */
  def slotCounts(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      step: String = "1 hour"
  ): DataFrame =
    // window(ts, step).start, NOT date_trunc — the [[slotted]] rule:
    // epoch-aligned slots of ANY duration, and bit-agreement with
    // resampleCounts' own truncation
    df.filter(col(tsCol).isNotNull)
      .groupBy(keyCols.map(col) :+
        window(col(tsCol), step).getField("start").as("slot"): _*)
      .agg(count(lit(1)).as("n"))

  /** Fold two [[slotCounts]] frames over disjoint row sets. */
  def mergeSlotCounts(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col) :+ col("slot"): _*)
      .agg(sum("n").as("n"))

  /** Densify a (possibly folded) [[slotCounts]] frame to the gap-filled
    * spine [[resampleCounts]] emits — spec-asserted identical to
    * resampleCounts over the same rows, so the trend family reads a
    * standing store exactly as it reads a batch.
    */
  def densifyCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      step: String = "1 hour"
  ): DataFrame = {
    val g = keyCols.map(col)
    val bounds = counts.groupBy(g: _*)
      .agg(min("slot").as("__lo"), max("slot").as("__hi"))
    val spine = bounds.select(g :+
      explode(expr(s"sequence(__lo, __hi, interval $step)")).as("slot"): _*)
    spine.join(counts, keyCols :+ "slot", "left")
      .select(g :+ col("slot") :+ coalesce(col("n"), lit(0L)).as("n"): _*)
  }

  /** Gap analysis over a dense per-key series: zero-run statistics —
    * how LONG does each key go dark (the ingestion-health read a plain
    * count can't give: 24 scattered empty hours are noise, one 24-hour
    * run is an outage). Classic two-rank run grouping (rownum over the
    * series minus rownum within the zero/nonzero class = a stable run
    * id), then exact integer aggregation: per key the slot count, zero
    * slot count, number of zero runs, the LONGEST run's length and
    * start (ties to the earliest start), and the trailing gap (a run
    * that touches the series end — an outage still in progress). No
    * join; the windows share one key exchange over the span-bounded
    * spine.
    */
  def gapAnalysis(
      df: DataFrame,
      keyCols: Seq[String],
      slotCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col(slotCol))
    val wFlag = org.apache.spark.sql.expressions.Window
      .partitionBy((g :+ col("__z")): _*).orderBy(col(slotCol))
    val runs = df
      .withColumn("__z", col(valueCol) === 0L)
      .withColumn("__rid", row_number().over(wOrd) - row_number().over(wFlag))
      .withColumn("__t", row_number().over(wOrd))
      .withColumn("__nslots", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(g: _*)))
      .groupBy((g :+ col("__z") :+ col("__rid")): _*)
      .agg(
        max("__nslots").as("__nslots"),
        count(lit(1)).as("__len"),
        min(col(slotCol)).as("__start"),
        max("__t").as("__endT"))
    runs
      .groupBy(g: _*)
      .agg(
        max("__nslots").as("n_slots"),
        sum(when(col("__z"), col("__len")).otherwise(0L)).as("zero_slots"),
        sum(when(col("__z"), 1L).otherwise(0L)).as("n_zero_runs"),
        max(when(col("__z"), struct(col("__len"),
          (lit(0L) - unix_timestamp(col("__start"))).as("__negStart")))).as("__best"),
        max(when(col("__z") && col("__endT") === col("__nslots"), col("__len"))
          .otherwise(0L)).as("trailing_gap"))
      .withColumn("longest_zero_run",
        coalesce(col("__best").getField("__len"), lit(0L)))
      .withColumn("longest_run_start",
        when(col("__best").isNotNull,
          (lit(0L) - col("__best").getField("__negStart")).cast("timestamp")))
      .drop("__best")
  }

  /** Forward-filled per-key series: each slot carries the latest observed
    * `max(valueCol)` at-or-before it (last-observation-carried-forward
    * over the gap-filled spine). The per-slot aggregate is max — an
    * order-independent reduction, so the fill is deterministic on any
    * engine or partitioning (avg/sum of doubles would not be). One window
    * over the spine-sized frame, which shares the fill join's (key, slot)
    * partitioning.
    */
  def resampleFill(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      step: String = "1 hour"
  ): DataFrame = {
    val (ev, spine) = slotted(df, keyCols, tsCol, step)
    val slotVals = ev.groupBy(keyCols.map(col) :+ col("slot"): _*)
      .agg(max(col(valueCol)).as("__v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy("slot")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(slotVals, keyCols :+ "slot", "left")
      .withColumn("v", last(col("__v"), ignoreNulls = true).over(w))
      .select(keyCols.map(col) :+ col("slot") :+ col("v"): _*)
  }

  /** Trailing moving average over the gap-filled counts (window of
    * `window` slots ending at the current one). Counts are integers, so
    * the average is exact-sum / count — engine-identical doubles.
    */
  def movingAverage(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      window: Int = 4,
      step: String = "1 hour"
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy("slot")
      .rowsBetween(-(window - 1), 0)
    resampleCounts(df, keyCols, tsCol, step)
      .withColumn("ma", avg(col("n")).over(w))
  }

  /** Anomalous slots: gap-filled counts whose value breaches k standard
    * deviations of the TRAILING window (window excludes the current slot —
    * a spike must not defend itself). The σ-test is evaluated in pure
    * INTEGER arithmetic, never a floating stddev:
    *
    *   (x − s/n)² > k²·var_samp  ⇔  (n−1)·(x·n − s)² > k²·n·(n·q − s²)
    *
    * with s = Σcount, q = Σcount² over the trailing window — so the
    * verdict is bit-identical on any engine (floating stddev differs in
    * last-ulp across implementations and can flip a boundary comparison).
    * Counts are window sums of longs; magnitudes stay far under 2⁶³ for
    * any sane (window, per-slot count) combination.
    *
    * One shuffle on the key columns; the spine join and both window sums
    * share its partitioning. Emits only the breaching slots, with the
    * trailing-window aggregates for context.
    */
  /** Debounce / burst dedup — telemetry's "the button was pressed once,
    * not forty times": within each key, a maximal CHAIN of events whose
    * consecutive gaps are all < `cooldownSec` collapses to its FIRST
    * event (in (ts, id) order — total, deterministic). Gap-based
    * chain semantics, i.e. session-first with `cooldownSec` as the
    * session gap: an event `cooldownSec` after the chain's LAST event
    * starts a new chain — NOT "cooldown from the last KEPT event"
    * (that variant needs a sequential fold; this one is a single lag
    * window, which is why it scales — and it is what sessionization
    * already means in this codebase, see q06).
    *
    * One shuffle (the per-key window); per-key state is the sort, never
    * a collect.
    */
  def debounce(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      cooldownSec: Long
  ): DataFrame = {
    require(cooldownSec > 0, "cooldownSec must be positive")
    val tsec = col(tsCol).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(tsec, col(idCol))
    // NULL-timestamp rows have no position in time: they would sort
    // first and each pass the __prev-null escape as a phantom "chain
    // head" — dropped instead (a burst of 40 NULL-ts duplicates must
    // not emit 40 kept events)
    df.filter(tsec.isNotNull)
      .withColumn("__prev", lag(tsec, 1).over(w))
      .filter(col("__prev").isNull || tsec - col("__prev") >= cooldownSec)
      .drop("__prev")
  }

  def anomalies(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      window: Int = 24,
      k: Int = 3,
      step: String = "1 hour"
  ): DataFrame = {
    require(window >= 2, "need at least 2 trailing slots for a variance")
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy("slot")
      .rowsBetween(-window, -1)
    val counts = resampleCounts(df, keyCols, tsCol, step)
      .withColumn("w_n", count(col("n")).over(w))
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_sumsq", sum(col("n") * col("n")).over(w))
    counts
      .filter(col("w_n") === window) // only slots with a full trailing window
      .filter(
        (col("w_n") - 1) * (col("n") * col("w_n") - col("w_sum"))
          * (col("n") * col("w_n") - col("w_sum"))
          > lit(k.toLong * k) * col("w_n")
            * (col("w_n") * col("w_sumsq") - col("w_sum") * col("w_sum")))
      .select(keyCols.map(col) :+ col("slot") :+ col("n") :+
        col("w_sum") :+ col("w_sumsq"): _*)
  }

  /** Two-sided CUSUM change detection (Page 1954), INTEGER-EXACT: with
    * integer-unit values x and target μ (pre-scale — the q177 cents/ppm
    * discipline), the high-side statistic is
    * S⁺_t = P_t − min(0, min_{j≤t} P_j) and the low side
    * S⁻_t = max(0, max_{j≤t} P_j) − P_t, where P is the prefix sum of
    * (x − μ) and the 0 is the empty prefix P₀ (the chart starts at
    * S₀ = 0 — dropping it silences any shift that begins at row 1) —
    * the classical recursive max(0, S+x−μ) UNROLLED into a cumulative
    * sum plus a running extremum, which windows compute without a
    * sequential fold and any engine reproduces digit-for-digit. This is
    * the DETECTION form (no post-breach reset): S keeps growing past the
    * alarm, so it finds the FIRST sustained mean shift in each
    * direction; a resetting chart is a sequential recurrence — that's
    * the streaming twin's job, not a window's.
    *
    * Emits per row: the exact S⁺/S⁻ and breach flags (S > `threshold`,
    * same integer units·slots). ONE key-partitioned exchange; all three
    * windows (cumsum, running min, running max) share it. Detection
    * reading: threshold h·σ with h ≈ 4–5 catches a 1σ shift in ~h slots.
    */
  def cusum(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      target: Long,
      threshold: Long
  ): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select((keyCols ++ orderCols :+ valueCol).map(col): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__p", sum(col(valueCol) - lit(target)).over(w))
      // the classical chart starts at S_0 = 0, i.e. the EMPTY PREFIX's
      // sum P_0 = 0 belongs to the extremum set — without it a shift
      // beginning at the very first row can never breach (min P over
      // rows alone equals P_1, zeroing S)
      .withColumn("cusum_hi", col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .withColumn("cusum_lo", greatest(lit(0L), max(col("__p")).over(w)) - col("__p"))
      .withColumn("breach_hi", col("cusum_hi") > threshold)
      .withColumn("breach_lo", col("cusum_lo") > threshold)
      .drop("__p")
  }

  /** EWMA control chart (Roberts 1959) over integer-unit observations,
    * in the TRUNCATED-KERNEL form that keeps it exact: the classical
    * recursion s_t = λ·x_t + (1−λ)·s_{t−1} is a sequential float fold
    * no engine reproduces bit-for-bit, so the operator pins λ = 1/4 and
    * defines the statistic as the kernel truncated at `Lags` = 32
    * observations — the dropped tail carries weight (3/4)³² < 1.1e-4 of
    * the total, far below any control limit a chart would use. With
    * λ = a/b rational, every kernel weight is the exact INTEGER
    * w_k = 3^k·4^(31−k) (λ(1−λ)^k scaled by 4³²), so
    *
    *   ewma_t = Σ_k w_k·x_{t−k} / Σ_k w_k    (k over PRESENT lags)
    *
    * is one division of two exact DECIMAL(38,0) sums — the head of a
    * series simply normalizes over the lags that exist (no s₀ bias),
    * and both engines replay numerator and denominator digit-for-digit
    * (each lag is its own column: the sum is a fixed 32-term dag, not
    * an order-dependent aggregation). Breach flags compare EXACT
    * integers: num ≷ (target ± band)·den — no float ever decides an
    * alarm. Gate ewma at 9 decimals (>2^53 decimal→double cast ulp).
    *
    * Same partitioned-window shape as [[cusum]] (ONE key exchange; lag
    * semantics = last 32 OBSERVATIONS, not wall-clock slots — resample
    * first if calendar spacing matters). EWMA vs CUSUM reading: CUSUM
    * finds sustained small shifts fastest; EWMA tracks the current
    * level and catches drifts — a monitoring stack runs both.
    */
  /** Sample autocorrelation function r_1..r_maxLag (the Box–Jenkins
    * identification tool: is this series white noise, AR-ish, seasonal?)
    * plus the Ljung–Box portmanteau statistic Q_k (Ljung & Box 1978) at
    * every lag — EXACT integer state end to end. With S = Σx and n the
    * series length, the mean-centered products clear denominators via
    * (x_t − S/n)(x_{t+k} − S/n)·n² = (n·x_t − S)(n·x_{t+k} − S), so
    *
    *   num_k = n²·Σ_{t≤n−k} x_t·x_{t+k} − n·S·(head_k + tail_k) + (n−k)·S²
    *   den   = n²·Σx² − n·S²          (head/tail = the first/last n−k x's)
    *
    * are exact DECIMAL(38,0) sums (emitted as digit strings) and
    * r_k = num_k/den is ONE pinned division per lag. Q_k is a fixed dag
    * over the r's: each term r_j²/(n−j) is scaled to an integer count of
    * 1e-15 units BEFORE the (order-free) sum — the nano idiom at 1e15,
    * affordable because every term is ≤ 1 — then
    * Q_k = n(n+2)·Σ_{j≤k} term_j/1e15. No sequential float fold anywhere.
    *
    * Plan shape: ONE key-partitioned window exchange (all maxLag lag
    * columns share it) and the groupBy reuses its hashpartitioning —
    * per-key state is the series sort, the output is keys × maxLag rows.
    * r_k is NULL when n ≤ k or the series is constant (den = 0); Q
    * follows r. NULL values are dropped (no position in the recursion);
    * resample first if calendar spacing matters (lags are OBSERVATIONS).
    */
  def acf(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      maxLag: Int
  ): DataFrame = {
    require(maxLag >= 1 && maxLag <= 48, s"maxLag out of range: $maxLag")
    val dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xL = col(valueCol).cast("long")
    val base = df
      .filter(xL.isNotNull)
      .select((keyCols ++ orderCols).map(col) :+ xL.as("__x"): _*)
    val lagged = (1 to maxLag).foldLeft(base) { (d, k) =>
      d.withColumn(s"__l$k", lag(col("__x"), k).over(w))
    }
    val xD = col("__x").cast(dec)
    val zero = lit(0L).cast(dec)
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(
        count(lit(1)).as("__n"),
        sum(xD).as("__s"),
        sum(xD * xD).as("__sxx")) ++
        (1 to maxLag).flatMap { k =>
          val lk = col(s"__l$k")
          val lkD = lk.cast(dec)
          Seq(
            coalesce(sum(when(lk.isNotNull, xD * lkD)), zero).as(s"__sxy$k"),
            coalesce(sum(when(lk.isNotNull, lkD)), zero).as(s"__a$k"),
            coalesce(sum(when(lk.isNotNull, xD)), zero).as(s"__b$k"))
        }
    val agg =
      if (keyCols.isEmpty) lagged.groupBy().agg(aggs.head, aggs.tail: _*)
      else lagged.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val nD = col("__n").cast(dec)
    val withDen = agg.withColumn("__den",
      nD * nD * col("__sxx") - nD * col("__s") * col("__s"))
    // per-lag columns: exact numerator, r, nano-term, cumulative Q
    val withLags = (1 to maxLag).foldLeft(withDen) { (d, k) =>
      d.withColumn(s"__num$k",
          nD * nD * col(s"__sxy$k") -
            nD * col("__s") * (col(s"__a$k") + col(s"__b$k")) +
            (nD - k) * col("__s") * col("__s"))
        .withColumn(s"__r$k",
          when(col("__n") > k && col("__den") > lit(0L).cast(dec),
            col(s"__num$k").cast("double") / col("__den").cast("double")))
        .withColumn(s"__t$k",
          when(col(s"__r$k").isNotNull,
            round(col(s"__r$k") * col(s"__r$k") /
              (col("__n") - k).cast("double") * 1e15d).cast("long"))
            .otherwise(lit(0L)))
    }
    val withQ = (1 to maxLag).foldLeft(withLags) { (d, k) =>
      val cum = (1 to k).map(j => col(s"__t$j")).reduce(_ + _)
      d.withColumn(s"__q$k",
        when(col(s"__r$k").isNotNull,
          (nD * (nD + 2)).cast("double") * (cum.cast("double") / 1e15d)))
    }
    val rows = (1 to maxLag).map { k =>
      struct(
        lit(k).as("lag"),
        col(s"__num$k").cast("string").as("num"),
        col(s"__r$k").as("r"),
        col(s"__q$k").as("lb_q"))
    }
    withQ
      .withColumn("__row", explode(array(rows: _*)))
      .select(keyCols.map(col) :+
        col("__row.lag").as("lag") :+
        col("__n").as("n") :+
        col("__row.num").as("num") :+
        col("__den").cast("string").as("den") :+
        col("__row.r").as("r") :+
        col("__row.lb_q").as("lb_q"): _*)
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall's S with the tie-aware
    * variance, Kendall 1975): is a series monotonically trending, without
    * assuming linearity or a distribution? S = Σ_{i<j} sgn(y_j − y_i)
    * over time order — an exact integer from one bounded self-join — and
    * the null variance stays integer as
    *
    *   var18 = 18·Var(S) = n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5)
    *
    * (t_v = tie multiplicities from the value-count frame), both emitted
    * as DECIMAL digit strings. The z statistic (continuity-corrected:
    * (S∓1)/√(Var S)) is a fixed dag over their casts — gate at 9
    * decimals — and the TREND VERDICT at α = 0.05 never touches a float
    * boundary: z > 1.96 is decided as the exact integer comparison
    * (S−1)²·180000 > 38416·var18 (1.96² = 38416/10⁴, cross-multiplied
    * through the /18), so the call is bit-identical on any engine.
    *
    * Scale: the pair join is O(series²) per key — series here means a
    * RESAMPLED sequence (hourly/daily slots), whose length is bounded by
    * the time span, not the corpus; 100 TB of events resampled to a year
    * of hours is still 8760 rows per key. The tie frame is
    * value-cardinality-sized. NULL values/timestamps are dropped.
    */
  def mannKendall(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val base = df
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull)
      .select(g :+ col(orderCol).as("__t") :+ col(valueCol).cast("long").as("__y"): _*)
    val a = base.select(g :+ col("__t").as("__ta") :+ col("__y").as("__ya"): _*)
    val b = base.select(g :+ col("__t").as("__tb") :+ col("__y").as("__yb"): _*)
    val joined =
      if (keyCols.isEmpty) a.join(b, col("__ta") < col("__tb"))
      else a.join(b, keyCols.map(k => a(k) === b(k)).reduce(_ && _) &&
          col("__ta") < col("__tb"))
        .select(keyCols.map(k => a(k).as(k)) ++ Seq(col("__ya"), col("__yb")): _*)
    val sgn = when(col("__yb") > col("__ya"), 1L)
      .when(col("__yb") < col("__ya"), -1L).otherwise(0L)
    val sAgg =
      if (keyCols.isEmpty) joined.groupBy().agg(sum(sgn.cast(dec)).as("__s"))
      else joined.groupBy(g: _*).agg(sum(sgn.cast(dec)).as("__s"))
    val tD = col("__tv").cast(dec)
    val tieAgg0 = base.groupBy(g :+ col("__y"): _*).agg(count(lit(1)).as("__tv"))
    val tieAgg =
      if (keyCols.isEmpty)
        tieAgg0.groupBy().agg(
          sum("__tv").as("n"),
          sum(tD * (tD - 1) * (tD * 2 + 5)).as("__tsum"))
      else
        tieAgg0.groupBy(g: _*).agg(
          sum("__tv").as("n"),
          sum(tD * (tD - 1) * (tD * 2 + 5)).as("__tsum"))
    val frame =
      if (keyCols.isEmpty) tieAgg.crossJoin(sAgg)
      else tieAgg.join(sAgg, keyCols)
    val nD = col("n").cast(dec)
    val zeroD = lit(0L).cast(dec)
    val withVar = frame
      // a single-row group produces no pairs: S is the empty sum
      .withColumn("__s", coalesce(col("__s"), zeroD))
      .withColumn("__var18", nD * (nD - 1) * (nD * 2 + 5) - col("__tsum"))
    val varD = col("__var18").cast("double") / 18d
    val z = when(col("__s") > zeroD,
        (col("__s").cast("double") - 1d) / sqrt(varD))
      .when(col("__s") < zeroD,
        (col("__s").cast("double") + 1d) / sqrt(varD))
      .otherwise(lit(0d))
    // exact verdict: |S∓1|² · 18 · 10⁴ > 38416 · var18, sign-guarded
    val up = col("__s") > lit(1L).cast(dec) &&
      (col("__s") - 1) * (col("__s") - 1) * 180000 > col("__var18") * 38416
    val down = col("__s") < lit(-1L).cast(dec) &&
      (col("__s") + 1) * (col("__s") + 1) * 180000 > col("__var18") * 38416
    withVar
      .withColumn("s", col("__s").cast("string"))
      .withColumn("var18", col("__var18").cast("string"))
      .withColumn("z", when(col("__var18") > zeroD, z))
      .withColumn("trend",
        when(col("__var18") <= zeroD, lit(null).cast("string"))
          .when(up, "increasing").when(down, "decreasing").otherwise("none"))
      .select(g :+ col("n") :+ col("s") :+ col("var18") :+ col("z") :+ col("trend"): _*)
  }

  /** Wald–Wolfowitz runs test (Wald & Wolfowitz 1940): is a per-key 0/1
    * sequence RANDOM in its ordering — too few runs means clustering
    * (an outage, a burst, autocorrelation), too many means oscillation
    * — the orthogonal read to [[mannKendall]] (monotone trend) and
    * [[graft.quality.Association.brownForsythe]] (scale): a series can
    * be trend-free and variance-stable and still arrive in suspicious
    * clumps. R = number of runs (1 + order-flips via one lag), and
    *
    *   z = (R − μ)/σ,  μ = 2·n0·n1/N + 1,
    *   σ² = 2·n0·n1·(2·n0·n1 − N) / (N²·(N−1))
    *
    * Exact integers throughout (r, n0, n1 and the DECIMAL σ² numerator
    * 2n0n1(2n0n1−N) as a digit string); z is one fixed dag over them,
    * gated at 9 decimals. NULL z when a class is empty or N < 2 (σ = 0
    * — nothing to test). Indicator rows with NULL flag or order are
    * dropped. SCALE: one lag window per key over the series (the
    * resampled span-bounded [[mannKendall]] contract) + one aggregation.
    */
  def runsTest(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      flagCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val base = df
      .filter(col(flagCol).isNotNull && col(orderCol).isNotNull)
      .select(g :+ col(orderCol).as("__o") :+
        col(flagCol).cast("long").as("__x"): _*)
    val wLag = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__o"))
    val flips = base
      .withColumn("__prev", lag(col("__x"), 1).over(wLag))
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__x") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("__x") === 0L, 1L).otherwise(0L)).as("n0"),
        (sum(when(col("__prev").isNotNull && col("__prev") =!= col("__x"), 1L)
          .otherwise(0L)) + 1L).as("r"))
    val twoP = lit(2L).cast(dec) * col("n0").cast(dec) * col("n1").cast(dec)
    val varNum = twoP * (twoP - col("n").cast(dec))
    val nD = col("n").cast("double")
    val mu = twoP.cast("double") / nD + 1d
    val sigma = sqrt(varNum.cast("double") / (nD * nD * (nD - 1d)))
    flips
      .withColumn("var_num", varNum.cast("string"))
      .withColumn("z",
        when(col("n0") > 0L && col("n1") > 0L && col("n") > 1L && varNum > 0L,
          (col("r").cast("double") - mu) / sigma))
      .select(g :+ col("n") :+ col("n0") :+ col("n1") :+ col("r") :+
        col("var_num") :+ col("z"): _*)
  }

  /** Theil–Sen robust trend line (Theil 1950; Sen 1968): slope = the
    * median of all pairwise slopes (y_j − y_i)/(t_j − t_i), intercept =
    * the median residual y − slope·t — breakdown point 29%, the trend
    * estimate outliers can't drag the way OLS's single leverage point
    * can. Selection is EXACT and pinned: pairs order by the IEEE
    * division dy/dx (deterministic on any engine) with ties broken by
    * (dy, dx, t_a, t_b) — two distinct rationals that collide as doubles
    * are ordered by the pin, so both engines select the SAME pair — and
    * the chosen pair's exact (dy, dx) integers are emitted alongside the
    * one-division slope. The intercept median orders residuals (a fixed
    * dag over the selected slope) with the same lower-median rank rule.
    *
    * Scale: O(series²) pairs per key over a RESAMPLED series (the
    * [[mannKendall]] bound — span-sized, not corpus-sized); the median
    * rank windows run per key over those pairs. Equal-time pairs
    * (dx = 0) have no slope and are excluded; keys with no pair emit
    * nothing.
    */
  /** The i<j slope-pair frame both Theil–Sen arms select from: one row
    * per time pair with exact (dy, dx) integers and the IEEE dy/dx sort
    * key. O(series²) rows per key — the CONTRACT is a resampled,
    * span-bounded series (the [[mannKendall]] bound): at n = 8760 (a
    * year of hours) that is 38M pairs per key, which the join fans out
    * fine but which NO single reducer may then sort — use
    * [[theilSenBucketed]] beyond ~2k points per key.
    */
  private def tsPairs(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val base = df
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull)
      .select(g :+ col(orderCol).cast("long").as("__t") :+
        col(valueCol).cast("long").as("__y"): _*)
    val a = base.select(g :+ col("__t").as("__ta") :+ col("__y").as("__ya"): _*)
    val b = base.select(g :+ col("__t").as("__tb") :+ col("__y").as("__yb"): _*)
    (if (keyCols.isEmpty) a.join(b, col("__ta") < col("__tb"))
     else a.join(b, keyCols.map(k => a(k) === b(k)).reduce(_ && _) &&
         col("__ta") < col("__tb"))
       .select(keyCols.map(k => a(k).as(k)) ++
         Seq(col("__ta"), col("__ya"), col("__tb"), col("__yb")): _*))
      .withColumn("__dy", col("__yb") - col("__ya"))
      .withColumn("__dx", col("__tb") - col("__ta"))
      .filter(col("__dx") > 0L)
      .withColumn("__key", col("__dy").cast("double") / col("__dx").cast("double"))
  }

  /** Intercept stage shared by both arms: the lower-median residual
    * under the selected slope — series-sized (n rows per key, never
    * n²), so the windowed form is the right layout in both.
    */
  private def tsIntercept(
      df: DataFrame,
      med: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val base = df
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull)
      .select(g :+ col(orderCol).cast("long").as("__t") :+
        col(valueCol).cast("long").as("__y"): _*)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val resid =
      (if (keyCols.isEmpty) base.crossJoin(med)
       else base.join(med, keyCols))
        .withColumn("__res", col("__y").cast("double") - col("slope") * col("__t").cast("double"))
    val wRes = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__res"), col("__t"))
    resid
      .withColumn("__rk", row_number().over(wRes))
      .withColumn("__nr", count(lit(1)).over(wAll))
      .filter(col("__rk") === floor((col("__nr") + 1L) / 2d).cast("long"))
      .select(g :+ col("m") :+ col("dy") :+ col("dx") :+ col("slope") :+
        col("__res").as("intercept"): _*)
  }

  def theilSen(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String
  ): DataFrame = {
    val g = keyCols.map(col)
    val pairs = tsPairs(df, keyCols, orderCol, valueCol)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*)
      .orderBy(col("__key"), col("__dy"), col("__dx"), col("__ta"), col("__tb"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val med = pairs
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll))
      .filter(col("__rk") === floor((col("m") + 1L) / 2d).cast("long"))
      .withColumn("slope", col("__key"))
      .select(g :+ col("m") :+ col("__dy").cast("string").as("dy") :+
        col("__dx").cast("string").as("dx") :+ col("slope"): _*)
    tsIntercept(df, med, keyCols, orderCol, valueCol)
  }

  /** Skew-safe twin of [[theilSen]] — BIT-IDENTICAL output (rank
    * selection has one right answer regardless of layout; the q217
    * oracle is shared verbatim), but the median-of-pairs selection runs
    * through the [[Quantiles.cellScaffold]] cell layout: slope pairs
    * bucket by their dy/dx value cell, only the ONE cell containing the
    * target rank ⌊(m+1)/2⌋ is sorted (ordered by the arm's exact
    * (key, dy, dx, ta, tb) pin), so the largest sort anywhere is one
    * cell's pair population (~m/cells for spread slopes) — never the
    * O(n²) pair set a year-of-hours series (38M pairs) would push
    * through a single reducer in the windowed arm. The pair JOIN is
    * still O(n²) rows — inherent to the exact estimator — but joins fan
    * out across executors; it is the per-key sort that didn't.
    */
  def theilSenBucketed(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      cells: Int = 256
  ): DataFrame = if (keyCols.isEmpty) {
    // the scaffold's NULL-safe key join needs ≥1 key column — a keyless
    // call runs under a constant key and drops it
    theilSenBucketed(df.withColumn("__g1", lit(1)), Seq("__g1"),
      orderCol, valueCol, cells).drop("__g1")
  } else {
    val g = keyCols.map(col)
    val pairs = tsPairs(df, keyCols, orderCol, valueCol)
    val scaff = Quantiles.cellScaffold(pairs, keyCols, "__key", cells)
      .withColumn("__target", floor((col("__n") + 1L) / 2d).cast("long"))
      // prune to the single cell holding the target rank BEFORE any
      // sort: __off < target <= __off + __cnt
      .filter(col("__off") < col("__target") &&
        col("__target") <= col("__off") + col("__cnt"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy((g :+ col("__c")): _*)
      .orderBy(col("__key"), col("__dy"), col("__dx"), col("__ta"), col("__tb"))
    val med = scaff
      .withColumn("__rk", col("__off") + row_number().over(wCell))
      .filter(col("__rk") === col("__target"))
      .withColumn("slope", col("__key"))
      .select(g :+ col("__n").as("m") :+ col("__dy").cast("string").as("dy") :+
        col("__dx").cast("string").as("dx") :+ col("slope"): _*)
    tsIntercept(df, med, keyCols, orderCol, valueCol)
  }

  /** Single-changepoint detection by the maximum-CUSUM statistic
    * (Page 1955; the Brownian-bridge normalization as in Csörgő &
    * Horváth 1997): over a per-key ordered series, the candidate
    * changepoint is argmax_t |S_t − (t/n)·S_n| — where the cumulative
    * sum strays farthest from the no-change diagonal. EXACT state:
    * D_t = n·S_t − t·S_n in DECIMAL(38,0) (the selected row's D is a
    * digit string; ties break to the EARLIEST t), the normalized
    * statistic |D_t|/(√(nQ−S²)·√n) is a fixed two-√ dag (gate at 9
    * decimals), and the α = 0.05 verdict compares exact integers:
    * 10⁶·D² > 1844164·(nQ−S²)·n (1.358² = 1.844164, the asymptotic
    * Kolmogorov–Smirnov critical value — stated; NULL when the series
    * is constant). Detects ONE level shift; recurse on the halves for
    * more (binary segmentation — the split is deterministic, so the
    * recursion replays).
    *
    * SCALE: two windows share one key exchange over the span-bounded
    * resampled series (the [[mannKendall]] contract); no join, no
    * pairs.
    */
  def changepoint(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__o"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val x = col(valueCol).cast("long")
    val base = df
      .filter(x.isNotNull && col(orderCol).isNotNull)
      .select(g :+ col(orderCol).as("__o") :+ x.as("__x"): _*)
      .withColumn("__t", row_number().over(wOrd).cast("long"))
      .withColumn("__st", sum(col("__x").cast(dec)).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__sn", sum(col("__x").cast(dec)).over(wAll))
      .withColumn("__q", sum((col("__x").cast(dec)) * col("__x").cast(dec)).over(wAll))
    val nD = col("__n").cast(dec)
    val d = nD * col("__st") - col("__t").cast(dec) * col("__sn")
    val scored = base
      .withColumn("__d", d)
      .withColumn("__absd", abs(d))
      // interior candidates only: t = n is the full prefix (D_n = 0 by
      // construction, but exclude it anyway for the n = 1 degenerate)
      .filter(col("__t") < col("__n"))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__absd").desc, col("__t").asc)
    val varN = nD * col("__q") - col("__sn") * col("__sn")
    scored
      .withColumn("__rk", row_number().over(wPick))
      .filter(col("__rk") === 1)
      .withColumn("stat",
        when(varN > 0,
          col("__absd").cast("double") /
            (sqrt(varN.cast("double")) * sqrt(col("__n").cast("double")))))
      .withColumn("changed",
        when(varN > 0,
          col("__d") * col("__d") * 1000000L > varN * nD * 1844164L))
      .select(g :+ col("__o").as("cp_at") :+ col("__t").as("cp_t") :+
        col("__n").as("n") :+ col("__d").cast("string").as("d") :+
        col("stat") :+ col("changed"): _*)
  }

  /** Seasonal-profile anomaly detection: group rows by their cycle
    * PHASE (hour-of-day, day-of-week — the caller computes `phaseCol`,
    * so any period works) and flag values > 3σ from their OWN phase's
    * population — the "is 3am traffic weird FOR 3AM" reading that
    * whole-series control charts ([[ewmaChart]], [[cusum]]) blur: a
    * daily cycle IS signal to them and baseline here.
    *
    * EXACT integer core: per (keys, phase) the count n_p, sum S_p and
    * sum-of-squares Q_p accumulate in DECIMAL(38,0) over ONE
    * (keys, phase)-partitioned window; the per-row deviation is the
    * pinned division (n_p·x − S_p)/n_p, and the 3σ flag is the exact
    * integer comparison (n_p·x − S_p)² > 9·(n_p·Q_p − S_p²) — no float
    * ever decides an alarm (the [[mannKendall]] verdict discipline;
    * note both sides are n_p²-scaled: (x−μ)² vs 9σ² cleared of their
    * common denominator). A constant phase population flags nothing
    * (0 > 0 is false). Gate mean/dev at 9 decimals.
    *
    * SCALE: one hash exchange on (keys, phase) — no ordered window, no
    * join; phase cardinality is fixed (24, 168…), so partitions stay
    * balanced wherever the series is long.
    */
  /** Mergeable per-(keys, phase) moment state for the seasonal family:
    * n, Σx, Σx² as exact DECIMAL counts — additive ([[mergeSeasonalStats]]),
    * so the standing phase profile folds batch-by-batch (the streaming
    * twin [[graft.streaming.StreamingOps.seasonalStatsStream]]) and
    * [[seasonalAnomaliesFromStats]] scores any frame against it.
    */
  def seasonalStats(
      df: DataFrame,
      keyCols: Seq[String],
      phaseCol: String,
      valueCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val x = col(valueCol).cast("long")
    val xD = x.cast(dec)
    df.filter(x.isNotNull && col(phaseCol).isNotNull)
      .groupBy((keyCols :+ phaseCol).map(col): _*)
      .agg(count(lit(1)).as("n_phase"), sum(xD).as("s_phase"),
        sum(xD * xD).as("q_phase"))
  }

  /** Fold two [[seasonalStats]] frames over disjoint row sets. */
  def mergeSeasonalStats(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      phaseCol: String): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols :+ phaseCol).map(col): _*)
      .agg(sum("n_phase").as("n_phase"), sum("s_phase").as("s_phase"),
        sum("q_phase").as("q_phase"))

  /** Score rows against a (possibly folded) [[seasonalStats]] profile —
    * the join form of [[seasonalAnomalies]] (spec-asserted equal when
    * the profile is the frame's own stats): the standing-profile reader
    * a streaming monitor uses, where today's hours are flagged against
    * ALL history's phase populations, not just today's.
    */
  def seasonalAnomaliesFromStats(
      df: DataFrame,
      stats: DataFrame,
      keyCols: Seq[String],
      phaseCol: String,
      valueCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val x = col(valueCol).cast("long")
    val xD = x.cast(dec)
    val nD = col("n_phase").cast(dec)
    val devNum = nD * xD - col("s_phase")
    df.filter(x.isNotNull && col(phaseCol).isNotNull)
      .join(broadcast(stats), keyCols :+ phaseCol)
      .withColumn("phase_mean",
        col("s_phase").cast("double") / col("n_phase").cast("double"))
      .withColumn("dev", devNum.cast("double") / col("n_phase").cast("double"))
      .withColumn("is_anomaly",
        devNum * devNum > (nD * col("q_phase") - col("s_phase") * col("s_phase")) * 9)
      .drop("s_phase", "q_phase")
  }

  def seasonalAnomalies(
      df: DataFrame,
      keyCols: Seq[String],
      phaseCol: String,
      valueCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((keyCols :+ phaseCol).map(col): _*)
    val x = col(valueCol).cast("long")
    val xD = x.cast(dec)
    val base = df.filter(x.isNotNull && col(phaseCol).isNotNull)
      .withColumn("__np", count(lit(1)).over(w))
      .withColumn("__sp", sum(xD).over(w))
      .withColumn("__qp", sum(xD * xD).over(w))
    val nD = col("__np").cast(dec)
    val devNum = nD * xD - col("__sp")
    base
      .withColumn("n_phase", col("__np"))
      .withColumn("phase_mean",
        col("__sp").cast("double") / col("__np").cast("double"))
      .withColumn("dev",
        devNum.cast("double") / col("__np").cast("double"))
      .withColumn("is_anomaly",
        devNum * devNum > (nD * col("__qp") - col("__sp") * col("__sp")) * 9)
      .drop("__np", "__sp", "__qp")
  }

  def ewmaChart(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      target: Long,
      band: Long
  ): DataFrame = {
    require(band > 0, s"band must be positive: $band")
    val Lags = 32
    val dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // w_k = 3^k · 4^(31−k): largest 4^31 = 2^62 — each fits a long,
    // their total 4^32 − 3^32·(…) does not, hence DECIMAL sums.
    // 3^k by iterative Long multiplication: exact by construction
    // (math.pow().toLong would TRUNCATE a 1-ulp-low result to 3^k − 1
    // and silently break the pinned-integer-weight contract shared
    // with the oracle and the streaming twin)
    val pow3: IndexedSeq[Long] = (1 until Lags).scanLeft(1L)((a, _) => a * 3L).toIndexedSeq
    val weights: IndexedSeq[Long] =
      (0 until Lags).map(k => pow3(k) * (1L << (2 * (Lags - 1 - k))))
    val x = col(valueCol)
    def lagged(k: Int) = if (k == 0) x else lag(x, k).over(w)
    val num = (0 until Lags).map { k =>
      when(lagged(k).isNotNull,
        lit(weights(k)).cast(dec) * lagged(k).cast(dec))
        .otherwise(lit(0L).cast(dec))
    }.reduce(_ + _)
    val den = (0 until Lags).map { k =>
      when(lagged(k).isNotNull, lit(weights(k)).cast(dec))
        .otherwise(lit(0L).cast(dec))
    }.reduce(_ + _)
    df.select((keyCols ++ orderCols :+ valueCol).map(col): _*)
      .filter(x.isNotNull)
      .withColumn("__num", num)
      .withColumn("__den", den)
      .withColumn("ewma", col("__num").cast("double") / col("__den").cast("double"))
      .withColumn("breach_hi",
        col("__num") > lit(target + band).cast(dec) * col("__den"))
      .withColumn("breach_lo",
        col("__num") < lit(target - band).cast(dec) * col("__den"))
      .drop("__num", "__den")
  }
}
