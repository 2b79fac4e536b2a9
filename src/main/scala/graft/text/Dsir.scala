package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance selection (Data Selection via Importance
  * Resampling, Xie et al. 2023, arXiv:2302.03169 — public): pick raw
  * documents whose hashed n-gram profile looks like a TARGET corpus.
  * The paper scores log p_target(x) − log p_raw(x) under two hashed
  * bag-of-ngrams models; floating log-sums differ across engines in the
  * last ulp and their summation order is not reproducible, so — exactly
  * like [[LmScore]] — this emits the INTEGER evidence the weight is made
  * of: per document, the total attested count mass of its grams under
  * each model. The selection key cross-multiplies with the models' total
  * masses (size-bias cancels without a division) and floor-divides once
  * at fixed scale — every output is bit-identical on any engine.
  *
  * Scale shape: a model IS a (bucket, cnt) DataFrame with at most
  * `numBuckets` rows — broadcast size is CHOSEN, not data-dependent
  * (the paper uses 10^4; the hash absorbs vocabulary growth, so 100 TB
  * corpora cost the same join build side). Scoring explodes grams once;
  * both model joins are broadcast; the per-doc roll-up is an integer
  * sum with map-side combine, so the exchange carries ~one row per
  * document. Products sit in DECIMAL(38,0): counts to ~1e14 (a 100 TB
  * corpus) keep key numerators ≤ ~1e37.
  *
  * The gram hash is a md5-prefix mod — codegen'd on the Spark side and
  * replayable in the DuckDB oracle (the q80 hexdigit-fold trick). An
  * engine-local deployment that never needs cross-engine replay can swap
  * in xxhash64 one line below.
  */
object Dsir {

  private[text] def toks(c: Column) = split(trim(lower(c)), "\\s+")

  /** Unigrams ++ space-joined bigrams, one narrow array expression. */
  private[text] def gramsOf(w: Column): Column = {
    val n1 = greatest(size(w) - 1, lit(0))
    concat(w, zip_with(slice(w, lit(1), n1), slice(w, lit(2), n1),
      (a, b) => concat_ws(" ", a, b)))
  }

  /** Deterministic engine-replayable gram bucket in [0, numBuckets). */
  def bucketOf(gram: Column, numBuckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 15), 16, 10).cast("long"), lit(numBuckets))

  /** Hashed bag-of-ngrams model: (bucket, cnt), at most numBuckets rows. */
  def fitModel(corpus: DataFrame, textCol: String, numBuckets: Int): DataFrame =
    corpus.select(explode(gramsOf(toks(col(textCol)))).as("g"))
      .select(bucketOf(col("g"), numBuckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Fit the target AND raw models in ONE corpus pass for the common
    * curation shape where the target is a per-row predicate over the raw
    * corpus (e.g. "high-quality English half"): each gram is tagged with
    * its document's target membership, and a single aggregation emits
    * both counts. Replaces two fit passes (two gram explosions, two
    * shuffles, two jobs) with one — the explosion dominates fit cost, so
    * at 100 TB this halves model-build work. Returns (target, raw)
    * models materialized from one collect (≤ numBuckets rows).
    */
  def fitModelsSubset(
      corpus: DataFrame,
      textCol: String,
      targetPred: Column,
      numBuckets: Int
  ): (DataFrame, DataFrame) = {
    val both = materializeModel(
      corpus.select(col(textCol), targetPred.as("__t"))
        .select(explode(gramsOf(toks(col(textCol)))).as("g"), col("__t"))
        .select(bucketOf(col("g"), numBuckets).as("bucket"), col("__t"))
        .groupBy("bucket").agg(
          count(lit(1)).as("cnt_raw"),
          sum(when(col("__t"), 1L).otherwise(0L)).as("cnt_t")))
    (both.filter(col("cnt_t") > 0).select(col("bucket"), col("cnt_t").as("cnt")),
      both.select(col("bucket"), col("cnt_raw").as("cnt")))
  }

  /** Fit two models over DISTINCT corpora in one job: union with a tag,
    * one explode pipeline per side but a single shuffle/aggregation
    * (instead of two jobs with two exchanges). Use [[fitModelsSubset]]
    * when the target is a subset of `raw` — that also halves the scan.
    */
  def fitModels(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      numBuckets: Int
  ): (DataFrame, DataFrame) = {
    val u = target.select(col(textCol).as("__text"), lit(true).as("__t"))
      .unionByName(raw.select(col(textCol).as("__text"), lit(false).as("__t")))
    val both = materializeModel(
      u.select(explode(gramsOf(toks(col("__text")))).as("g"), col("__t"))
        .select(bucketOf(col("g"), numBuckets).as("bucket"), col("__t"))
        .groupBy("bucket").agg(
          sum(when(col("__t"), 1L).otherwise(0L)).as("cnt_t"),
          sum(when(col("__t"), 0L).otherwise(1L)).as("cnt_r")))
    (both.filter(col("cnt_t") > 0).select(col("bucket"), col("cnt_t").as("cnt")),
      both.filter(col("cnt_r") > 0).select(col("bucket"), col("cnt_r").as("cnt")))
  }

  /** Per-document integer importance signals: (id, n_grams, target_mass,
    * raw_mass) where *_mass = Σ over the doc's grams of the model's count
    * in that gram's bucket (0 if unattested). High target_mass relative
    * to raw_mass ⇒ in-distribution for the target.
    */
  def importanceSignals(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      raw: DataFrame,
      numBuckets: Int,
      carryCols: Seq[String] = Seq.empty
  ): DataFrame =
    docs.select(col(idCol) +: carryCols.map(col) :+
        explode(gramsOf(toks(col(textCol)))).as("g"): _*)
      .withColumn("bucket", bucketOf(col("g"), numBuckets))
      .join(broadcast(target.select(col("bucket"), col("cnt").as("__t"))),
        Seq("bucket"), "left")
      .join(broadcast(raw.select(col("bucket"), col("cnt").as("__r"))),
        Seq("bucket"), "left")
      .groupBy(col(idCol) +: carryCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__t"), lit(0L))).as("target_mass"),
        sum(coalesce(col("__r"), lit(0L))).as("raw_mass"))

  /** Integer selection key in [0, scale]: the size-debiased target share
    * floor(t·R·scale / (t·R + r·T)) where T, R are the models' total
    * masses — cross-multiplied so differing corpus sizes cancel without
    * a float division; `(p − p mod s)/s` is the repo's exact
    * floor-division idiom (never a rounded decimal divide). Zero-evidence
    * docs (no gram attested in either model) get key −1, below every
    * real key.
    */
  def selectionKey(
      signals: DataFrame,
      targetTotal: Long,
      rawTotal: Long,
      scale: Long = 1000000000L
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val num = col("target_mass").cast(dec) * lit(rawTotal).cast(dec) * lit(scale).cast(dec)
    val den = col("target_mass").cast(dec) * lit(rawTotal).cast(dec) +
      col("raw_mass").cast(dec) * lit(targetTotal).cast(dec)
    signals.withColumn("dsir_key",
      when(den === 0, lit(-1L))
        .otherwise(((num - pmod(num, den)) / den).cast("long")))
  }

  /** Full DSIR pass: fit both models, score, key, keep the top fraction
    * per group by (dsir_key DESC, id ASC). Returns the selected docs'
    * signals + key. Grouped selection (per-language / per-source budgets,
    * the realistic curation shape) keeps the ranking window partitioned;
    * an UNGROUPED global top-fraction funnels the window into one
    * partition — at corpus scale derive a key threshold instead (the
    * integer key makes an exact count-based quantile cheap) and filter.
    */
  def select(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCorpus: DataFrame,
      fraction: Double,
      numBuckets: Int = 1024,
      groupCols: Seq[String] = Seq.empty
  ): DataFrame = {
    // both models from ONE union-fused job (materialized inside
    // fitModels, so the totals() actions and the scoring joins replay a
    // LocalRelation — never the corpus gram pass). Driver
    // materialization, NOT persist: select() returns lazily, so a
    // persist here has no safe unpersist point and would leak a cache
    // entry per call.
    val (target, raw) =
      fitModels(targetCorpus, docs.select(col(textCol)), textCol, numBuckets)
    selectWithModels(docs, idCol, textCol, target, raw, fraction, numBuckets,
      groupCols)
  }

  /** [[select]] where the target corpus is `docs` rows satisfying
    * `targetPred` — the fused fast path: ONE model-fit corpus pass
    * ([[fitModelsSubset]]) instead of two, then scoring. Identical
    * output to `select(docs, …, docs.filter(targetPred), …)`.
    */
  def selectSubset(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      fraction: Double,
      numBuckets: Int = 1024,
      groupCols: Seq[String] = Seq.empty
  ): DataFrame = {
    val (target, raw) =
      fitModelsSubset(docs, textCol, targetPred, numBuckets)
    selectWithModels(docs, idCol, textCol, target, raw, fraction, numBuckets,
      groupCols)
  }

  /** Collect a fitted model (≤ numBuckets rows — bookkeeping, like
    * k-means centroids, not corpus data) and rebuild it as a local
    * frame: the fit's corpus pass runs exactly once, every later action
    * replays a LocalRelation, and nothing outlives the call.
    */
  def materializeModel(m: DataFrame): DataFrame =
    m.sparkSession.createDataFrame(
      java.util.Arrays.asList(m.collect(): _*), m.schema)

  /** Model mass total — a ≤ numBuckets-row aggregate (driver bookkeeping). */
  def modelTotal(m: DataFrame): Long =
    m.agg(coalesce(sum(col("cnt")), lit(0L))).head.getLong(0)

  /** [[select]] against PREBUILT models — the production shape: the two
    * (bucket, cnt) frames are corpus state fit at ingest (persist them
    * like any index), so query-time work is scoring + key + selection
    * only.
    */
  def selectWithModels(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      raw: DataFrame,
      fraction: Double,
      numBuckets: Int = 1024,
      groupCols: Seq[String] = Seq.empty
  ): DataFrame = {
    val keyed = selectionKey(
      importanceSignals(docs, idCol, textCol, target, raw, numBuckets,
        carryCols = groupCols),
      modelTotal(target), modelTotal(raw))
    graft.operators.Sampling.topFractionByScore(
      keyed, groupCols = groupCols, scoreCol = "dsir_key",
      keyCols = Seq(idCol), fraction = fraction)
  }
}
