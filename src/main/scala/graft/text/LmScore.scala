package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model quality signals — the CCNet/KenLM
  * curation idea (score documents by how "in-distribution" they are
  * against a reference corpus) with INTEGER-exact outputs: floating
  * log-probabilities differ in the last ulp between libms, so instead of
  * a perplexity this emits the counts a perplexity is made of — tokens,
  * out-of-vocabulary tokens, bigrams, reference-attested bigrams — which
  * are bit-identical on any engine (and a DuckDB oracle replays them
  * exactly). Downstream gates threshold the RATIOS (oov_fraction,
  * bigram_hit_fraction); any monotone scoring on top is engine-local.
  *
  * Scale shape: the reference model IS two count DataFrames (unigrams,
  * bigrams) — persist them like any index. Scoring explodes the scored
  * docs once per n-gram order and LEFT-joins the reference counts on the
  * token/bigram key: two key-hashed shuffles of (id, token) pairs, no
  * driver-side model object, vocabulary size bounded only by the
  * cluster. minCount prunes the reference tail (hapax n-grams are noise
  * and the bulk of the vocabulary — Zipf), shrinking the join's build
  * side by ~half per unit of minCount.
  */
object LmScore {

  private def toks(c: org.apache.spark.sql.Column) =
    split(trim(lower(c)), "\\s+")

  /** Reference unigram counts (token, cnt) with cnt >= minCount. */
  def unigramCounts(ref: DataFrame, textCol: String, minCount: Long = 1L): DataFrame =
    ref.select(explode(toks(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Reference bigram counts (w1, w2, cnt) with cnt >= minCount. */
  def bigramCounts(ref: DataFrame, textCol: String, minCount: Long = 1L): DataFrame = {
    ref.select(explode(bigramPairs(toks(col(textCol)))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Adjacent (w1, w2) structs via two shifted slices zipped — one
    * narrow pass, no window/self-join.
    */
  private def bigramPairs(w: org.apache.spark.sql.Column) = {
    val n1 = greatest(size(w) - 1, lit(0))
    zip_with(
      slice(w, lit(1), n1),
      slice(w, lit(2), n1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** (w1 = token, w2 = next token or NULL at the last position) — ONE
    * struct per token, so a single explode serves both the unigram and
    * the bigram join ([[score]]'s fusion; the
    * [[Dsir.fitModelsSubset]] discipline applied to scoring).
    */
  private def tokenPairs(w: org.apache.spark.sql.Column) = {
    val n1 = greatest(size(w) - 1, lit(0))
    zip_with(
      w,
      concat(slice(w, lit(2), n1), array(lit(null).cast("string"))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** Per-document signals vs a reference model: (id, n_tokens, n_oov,
    * n_bigrams, n_bigram_hits). A doc with high oov fraction or low
    * bigram hit fraction is out-of-distribution for the reference —
    * the quality gate thresholds those ratios.
    *
    * FUSED plan: one explode emits (token, next-token) structs; the
    * unigram join keys on w1, the bigram join on (w1, w2) — NULL w2 at
    * the last position never matches, exactly the bigram count's
    * semantics — and ONE per-id aggregation folds all four counters.
    * Versus the two-pass form (kept as [[scoreTwoPass]], spec-asserted
    * equal): one gram explosion instead of two, one corpus aggregation
    * instead of two plus an id join.
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      unigrams: DataFrame,
      bigrams: DataFrame
  ): DataFrame =
    docs.select(col(idCol), explode(tokenPairs(toks(col(textCol)))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(unigrams.select(col("token").as("w1"), lit(1L).as("__hit")),
        Seq("w1"), "left")
      .join(bigrams.select(col("w1"), col("w2"), lit(1L).as("__bhit")),
        Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("w2").isNotNull, 1L).otherwise(0L)).as("n_bigrams"),
        sum(when(col("__bhit").isNull, 0L).otherwise(1L)).as("n_bigram_hits"))

  /** The unfused two-pass reference formulation (one explode + agg per
    * n-gram order, id join at the end) — kept for the fused-equality
    * spec; [[score]] is the production path.
    */
  private[graft] def scoreTwoPass(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      unigrams: DataFrame,
      bigrams: DataFrame
  ): DataFrame = {
    val w = toks(col(textCol))
    val uni = docs.select(col(idCol), explode(w).as("token"))
      .join(unigrams.select(col("token"), lit(1L).as("__hit")), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_oov"))
    val bi = docs.select(col(idCol), explode(bigramPairs(w)).as("p"))
      .select(col(idCol), col("p.w1"), col("p.w2"))
      .join(bigrams.select(col("w1"), col("w2"), lit(1L).as("__bhit")),
        Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("__bhit").isNull, 0L).otherwise(1L)).as("n_bigram_hits"))
    uni.join(bi, Seq(idCol), "left")
      .select(
        col(idCol), col("n_tokens"), col("n_oov"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_bigram_hits"), lit(0L)).as("n_bigram_hits"))
  }
}
