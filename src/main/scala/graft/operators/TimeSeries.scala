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
    // their total 4^32 − 3^32·(…) does not, hence DECIMAL sums
    val weights: IndexedSeq[Long] =
      (0 until Lags).map(k => math.pow(3.0, k).toLong * (1L << (2 * (Lags - 1 - k))))
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
