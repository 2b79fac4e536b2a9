package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches — HyperLogLog distinct
  * counting (Flajolet et al. 2007) and Count-Min frequency estimation
  * (Cormode & Muthukrishnan 2005) — built ENGINE-PORTABLY: every hash is
  * an md5-nibble integer and every sketch cell is exact integer
  * arithmetic, so a DuckDB oracle replays register-for-register and
  * counter-for-counter (q128/q129). Library HLL implementations (Spark's
  * own `approx_count_distinct` included) hash with engine-private
  * functions and carry float bias tables — fine for one engine, ungateable
  * across two; determinism is this repo's gate currency, so the hash and
  * the estimator are pinned to public arithmetic.
  *
  * Why sketches at all when exact `count(distinct)` works at gate scale:
  * at 100 TB an exact per-group distinct is a full shuffle of every
  * observed value, while an HLL register table is a CONSTANT 256 rows per
  * group, mergeable by `max` — so daily profiles fold into monthly ones
  * without touching the data again ([[mergeHllRegisters]]), the
  * incremental-store discipline of [[graft.dedup.LineDedup]] applied to
  * profiling. Count-Min likewise: the counter table is `depth × width`
  * cells regardless of corpus size, mergeable by `sum`, and the heavy-end
  * estimates stay within the published `εN` bound of the exact counts
  * that [[graft.text.HeavyHitters]] computes (q129 carries both columns).
  *
  * Scale shape: one explode-free pre-aggregation per pass (map-side
  * combine absorbs hot values), then a scatter into the fixed cell grid —
  * the exchange carries (group, cell, int) rows bounded by the sketch
  * size, never the data. No collect; reports are per-group single rows.
  *
  * Estimate determinism: the HLL harmonic denominator is an exact BIGINT
  * (powers of two summed as integers); the only float op is ONE division
  * of a pinned double literal by that integer — IEEE-754 defines that
  * rounding exactly, so Spark and DuckDB produce bit-identical doubles.
  * The small-range linear-counting correction (`m·ln(m/V)`) needs `ln`,
  * which carries no cross-engine ulp guarantee — it is offered in
  * [[hllLinearCount]] for users but kept OUT of gated columns.
  */
object Sketches {

  /** HLL precision: p=8 → 256 registers, standard error ≈ 1.04/√256 ≈ 6.5%. */
  val HllP: Int = 8
  val HllM: Int = 1 << HllP
  /** Hash width 60 bits (15 md5 nibbles — the [[graft.dedup.SpanDedup]]
    * key discipline); rank lives in the remaining 52 bits, max rank 53.
    */
  val HashBits: Int = 60
  private val WBits = HashBits - HllP // 52
  private val MaxRank = WBits + 1 // 53

  /** alpha_m · m² · 2^52+1 for p=8, emitted as the same shortest-repr
    * double literal the oracle SQL pins (0.7213/(1+1.079/256)·256²·2^53).
    */
  val HllNumerator: Double = 4.2399330249068963e20

  /** 60-bit md5 hash of the value's canonical string form. */
  def hash60(c: Column): Column =
    conv(substring(md5(to_binary(c.cast("string"), lit("utf-8"))), 1, 15), 16, 10)
      .cast("long")

  /** Per-group HLL register table: (groups..., bucket, r) with r =
    * max over values of rank(bucket's hash remainder). At most
    * groups × 256 rows; partial aggregation absorbs repeated values
    * map-side, so a billion-repeat hot value costs its partitions one
    * register update each.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val hv = hash60(col(valueCol))
    val w = shiftright(hv, HllP)
    val rank = when(w === 0L, lit(MaxRank))
      .otherwise(lit(MaxRank) - length(bin(w)))
    df.filter(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+
        hv.bitwiseAND(lit((HllM - 1).toLong)).as("bucket") :+
        rank.as("rank")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rank")).as("r"))
  }

  /** Fold two register tables — the sketch merge: max per (group, bucket).
    * Registers from disjoint data slices merge into exactly the registers
    * of the union (spec-asserted), so stored daily sketches roll up
    * without re-reading data.
    */
  def mergeHllRegisters(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))

  /** Per-group HLL report from a register table: m, zero-register count
    * v0, exact-integer harmonic denominator dhll = Σ 2^(53−r) (absent
    * registers contribute 2^53), and the raw estimate — one pinned
    * division, bit-identical on any IEEE engine.
    */
  def hllReport(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val full = lit(1L << MaxRank)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $MaxRank - r)")).as("dpresent"))
      .select((groupCols.map(col) :+
        lit(HllM.toLong).as("m") :+
        (lit(HllM.toLong) - col("present")).as("v0") :+
        (col("dpresent") + (lit(HllM.toLong) - col("present")) * full).as("dhll")): _*)
      .withColumn("est", lit(HllNumerator) / col("dhll").cast("double"))
  }

  /** One-shot per-group approximate distinct count of `valueCol`. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllReport(hllRegisters(df, groupCols, valueCol), groupCols)

  /** Audience/corpus overlap report by inclusion–exclusion on register
    * tables: |A∩B| ≈ est(A) + est(B) − est(A∪B), where est(A∪B) comes
    * from [[mergeHllRegisters]] — the whole point of mergeable sketches
    * is that the union estimate needs NO second data pass. The
    * association order is pinned as (est_a + est_b) − est_union: every
    * term is a bit-identical pinned division (see [[hllReport]]) and
    * IEEE addition/subtraction of exact doubles is deterministic, so the
    * overlap estimate is gateable cross-engine (q148 replays both sides'
    * registers AND the union's). The estimate inherits HLL error from
    * all three terms (≈ ±1.04/√m each, so the band on the DIFFERENCE is
    * wider — the q148 spec asserts it against the exact intersection);
    * it can go slightly negative for near-disjoint sides, which is
    * reported as-is, not clamped (clamping would hide the error band).
    *
    * Groups are joined INNER: a group absent from one side has no
    * sketch there (unknown), which is different from an observed-empty
    * side; callers wanting absent == empty should union in empty
    * register tables explicitly.
    *
    * Both inputs feed two consumers (their own report + the merge), so
    * they are persisted here — register tables are ≤ groups×256 rows,
    * the cost is nil and it saves re-deriving each sketch from its
    * corpus twice (the multi-branch-lineage lesson of SURVEY §5.8).
    */
  def hllOverlap(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val pa = a.persist()
    val pb = b.persist()
    pa.count(); pb.count() // materialize so the planner sees real sizes
    val gc = groupCols.map(col)
    val ra = hllReport(pa, groupCols).select((gc :+ col("est").as("est_a")): _*)
    val rb = hllReport(pb, groupCols).select((gc :+ col("est").as("est_b")): _*)
    val ru = hllReport(mergeHllRegisters(pa, pb, groupCols), groupCols)
      .select((gc :+ col("est").as("est_union")): _*)
    ra.join(rb, groupCols).join(ru, groupCols)
      .withColumn("est_overlap", (col("est_a") + col("est_b")) - col("est_union"))
  }

  /** Linear-counting small-range correction m·ln(m/v0) — NOT gate-safe
    * (`ln` has no cross-engine ulp contract); convenience for users whose
    * cardinalities sit below 5m/2 where raw HLL biases high.
    */
  def hllLinearCount(report: DataFrame): DataFrame =
    report.withColumn("est_lc",
      when(col("v0") > 0,
        col("m").cast("double") * log(col("m").cast("double") / col("v0").cast("double")))
        .otherwise(col("est")))

  // ------------------------------------------------- bottom-k quantiles

  /** Mergeable QUANTILE sketch — the third leg of the profiling family
    * (HLL: distinct, CMS: frequency, this: distribution): keep the k
    * rows with the SMALLEST md5 row-identity hash per group. Because
    * selection is keyed on row identity (not value), the kept rows are
    * a uniform sample of the group's rows, and because bottom-k by a
    * total order is EXACTLY mergeable — bottom-k(A ∪ B) =
    * bottom-k(bottom-k(A) ∪ bottom-k(B)) for disjoint row sets
    * (spec-asserted) — daily sketches fold into monthly ones without
    * re-reading data, the [[mergeHllRegisters]] contract for
    * distributions. Quantiles over the sample are then LOWER-MEDIAN
    * rank selections ([[graft.operators.Quantiles]] discipline): actual
    * data values, engine-exact, hash-gateable. Standard error of a
    * sample quantile q is √(q(1−q)/k) in rank space — k=1024 puts the
    * median within ±1.6 rank-percent at one sigma.
    *
    * Unlike randomized KLL/t-digest, every choice here is content-keyed
    * and deterministic — the q154 oracle replays the hash order, the
    * cut, and the rank selections bit-for-bit.
    *
    * Scale shape: one window (partition by group, order by hash) with
    * the rank filter pushed — the shuffle carries (group, hash, value)
    * triples; the sketch itself is ≤ groups × k rows forever after.
    */
  def quantileSketch(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      idCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val h = graft.operators.Sampling.keyHash(idCols.map(col))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    df.filter(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ h.as("h") :+ col(valueCol).as("v")): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Fold two quantile sketches built with the same k: union, re-cut to
    * bottom-k per group.
    */
  def mergeQuantileSketch(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    a.unionByName(b)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-group report from a quantile sketch: sample size and
    * rank-selected p50/p90 over the sampled VALUES (hash as the
    * deterministic tie-break).
    */
  def quantileSketchReport(sketch: DataFrame, groupCols: Seq[String]): DataFrame = {
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    sketch
      .withColumn("__rn", row_number().over(part.orderBy(col("v"), col("h"))))
      .withColumn("__n", count(lit(1)).over(part))
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(col("__n")).as("n_sample"),
        max(when(col("__rn") === expr("(__n + 1) div 2"), col("v"))).as("p50"),
        max(when(col("__rn") === expr("(9 * __n + 9) div 10"), col("v"))).as("p90"))
  }

  // -------------------------------------------- bottom-k rank correlation

  /** Mergeable SPEARMAN sketch — the bivariate leg of the bottom-k
    * family: keep the k rows with the smallest md5 ROW-IDENTITY hash per
    * group, carrying BOTH coordinates. Selection is keyed on identity
    * (never the values), so the kept rows are a uniform sample of the
    * group's (x, y) pairs and the [[quantileSketch]] merge law carries
    * over unchanged: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    * bottom-k(B)) for disjoint row sets — daily sketches fold into
    * monthly ones without re-reading data. Rows with a NULL on either
    * side are excluded up front (the pairwise rule
    * [[graft.quality.Profiler.spearman]] applies), so the sample
    * estimates the same population the exact operator measures.
    *
    * This is the honest 100 TB rank-correlation path when exact ranks
    * are unaffordable: the windowed exact form sorts each group on one
    * reducer, the bucketed form ([[graft.quality.Profiler
    * .spearmanBucketed]]) fixes hot KEYS but still collapses on hot
    * VALUES — the sketch's cost is one bounded window regardless, and
    * the estimate's s.e. is ≈ 1/√k under independence (k = 1024 →
    * ±0.03 at one sigma; the spec asserts the band vs exact ρ on the
    * gate corpus — the q154 honesty-chain pattern).
    */
  def spearmanSketch(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      idCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val h = graft.operators.Sampling.keyHash(idCols.map(col))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((groupCols.map(col) :+ h.as("h") :+
        col(xCol).as("x") :+ col(yCol).as("y")): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Fold two Spearman sketches built with the same k: union, re-cut to
    * bottom-k per group (disjoint row sets — the [[mergeQuantileSketch]]
    * contract).
    */
  def mergeSpearmanSketch(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    a.unionByName(b)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-group ρ estimate from a Spearman sketch: the EXACT average-tie
    * Spearman over the sampled pairs ([[graft.quality.Profiler.spearman]]
    * verbatim — content-keyed cut + integer doubled ranks + exact
    * moments, so an oracle replays the estimate bit-for-bit). Returns
    * (groups…, n_sample, rho_est).
    */
  def spearmanSketchReport(sketch: DataFrame, groupCols: Seq[String]): DataFrame =
    graft.quality.Profiler.spearman(sketch, groupCols, "x", "y")
      .withColumnRenamed("n", "n_sample")
      .withColumnRenamed("rho", "rho_est")
      .drop("sum_rx2", "sum_ry2")

  // ---------------------------------------------------------------- CMS

  /** Count-Min geometry: depth 4 independent rows (error probability
    * δ = e^-4... conventionally 1/2^4 here), width 256 buckets
    * (ε = e/256 of the total count). 1024 cells total.
    */
  val CmsDepth: Int = 4
  val CmsWidth: Int = 256

  /** Row-j bucket of a value: first two md5 nibbles of "j:value" —
    * independent salted hashes, replayable nibble-for-nibble in SQL.
    * `j` is a column so the depth scatter computes all rows in one pass.
    */
  def cmsBucket(v: Column, j: Column): Column =
    conv(substring(md5(to_binary(concat(j.cast("string"), lit(":"), v.cast("string")), lit("utf-8"))), 1, 2), 16, 10)
      .cast("long")

  /** Counter table (j, bucket, c) for weighted values: exact
    * pre-aggregation per value first (map-side combine eats hot values),
    * then a depth-row scatter into the fixed grid — the exchange after
    * the pre-agg carries (value, count) once per distinct value, and the
    * scatter output is ≤ depth·width rows.
    */
  def cmsCounters(df: DataFrame, valueCol: String): DataFrame = {
    val perValue = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    perValue
      .select(col("v"), col("c"),
        explode(array((0 until CmsDepth).map(j => lit(j)): _*)).as("j"))
      .withColumn("bucket", cmsBucket(col("v"), col("j")))
      .groupBy("j", "bucket")
      .agg(sum(col("c")).as("c"))
  }

  /** Merge two counter tables: cell-wise sum. */
  def mergeCms(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("j", "bucket").agg(sum(col("c")).as("c"))

  /** Point estimates for the values in `probes(valueCol)`: min over the
    * depth rows of the value's cell — the classic one-sided (≥ true
    * count) CMS estimator. Join is broadcast-sized: the counter table is
    * ≤ depth·width rows.
    */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, valueCol: String): DataFrame = {
    val keyed = probes
      .select(col(valueCol).as("v"))
      .distinct()
      .select(col("v"), explode(array((0 until CmsDepth).map(j => lit(j)): _*)).as("j"))
      .withColumn("bucket", cmsBucket(col("v"), col("j")))
    keyed
      .join(broadcast(counters), Seq("j", "bucket"), "left")
      .groupBy("v")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .withColumnRenamed("v", valueCol)
  }
}
