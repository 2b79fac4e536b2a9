package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Hashed-ngram linear quality classifier — the fastText architecture
  * (Joulin et al. 2016, arXiv:1607.01759: bag of hashed uni+bigrams →
  * linear scorer) that curation pipelines run between rule-based gates
  * (Gopher) and sampling: train on a "high quality" positive corpus vs
  * a random negative corpus, then keep documents the scorer favors
  * (the GPT-3/CCNet "quality classifier" step).
  *
  * Training is DETERMINISTIC count-ratio weighting (the NBSVM linear
  * model, Wang & Manning 2012) rather than SGD: per hashed bucket the
  * weight is the size-debiased positive share mapped to an INTEGER in
  * [−scale, +scale] — one aggregation pass, no float log-ratios, no
  * iteration order, so the trained model and every margin are
  * bit-identical on any engine (the q125 DuckDB oracle refits the model
  * and replays every margin). SGD would buy a point of accuracy and
  * cost reproducibility; this engine's gates are hash-equality, so
  * determinism wins.
  *
  * Scale shape: the [[Dsir]] discipline throughout — the model IS a
  * (bucket, w) frame with at most `numBuckets` rows (broadcast size is
  * chosen, not data-dependent), grams explode once per pass, scoring
  * joins broadcast, the per-doc margin is an integer sum with map-side
  * combine. Weight products sit in DECIMAL(38,0): counts to ~1e14 keep
  * numerators ≤ ~2e34.
  */
object QualityClassifier {

  val DefaultScale: Long = 1000000L

  private val dec = "decimal(38,0)"

  /** Train on two labeled corpora → (bucket, w) model, w ∈ [−scale,
    * +scale]: w = floor(2·scale·p·N / (p·N + n·P)) − scale where p, n
    * are the bucket's positive/negative gram counts and P, N the
    * corpus totals (cross-multiplied so corpus-size imbalance cancels
    * without a division; the numerator is kept NON-negative so the
    * floor-division idiom replays identically in engines whose `%` is
    * remainder, not pmod). Buckets unseen in training carry no row —
    * scoring treats them as weight 0 (no evidence), not −scale.
    *
    * One union pass fits both sides ([[Dsir.fitModels]] shape); the
    * result is materialized (≤ numBuckets rows — driver bookkeeping,
    * like centroids) so later actions replay a LocalRelation.
    */
  def train(
      pos: DataFrame,
      neg: DataFrame,
      textCol: String,
      numBuckets: Int = 1024,
      scale: Long = DefaultScale
  ): DataFrame = {
    require(numBuckets > 0 && scale > 0, "numBuckets and scale must be positive")
    val u = pos.select(col(textCol).as("__text"), lit(true).as("__p"))
      .unionByName(neg.select(col(textCol).as("__text"), lit(false).as("__p")))
    val counts = Dsir.materializeModel(
      u.select(explode(Dsir.gramsOf(Dsir.toks(col("__text")))).as("g"), col("__p"))
        .select(Dsir.bucketOf(col("g"), numBuckets).as("bucket"), col("__p"))
        .groupBy("bucket").agg(
          sum(when(col("__p"), 1L).otherwise(0L)).as("cnt_p"),
          sum(when(col("__p"), 0L).otherwise(1L)).as("cnt_n")))
    val Row(pT: Long, nT: Long) =
      counts.agg(coalesce(sum("cnt_p"), lit(0L)), coalesce(sum("cnt_n"), lit(0L))).head
    require(pT > 0 && nT > 0,
      s"both corpora must contribute grams (pos total=$pT, neg total=$nT)")
    val num = lit(2L).cast(dec) * lit(scale).cast(dec) *
      col("cnt_p").cast(dec) * lit(nT).cast(dec)
    val den = col("cnt_p").cast(dec) * lit(nT).cast(dec) +
      col("cnt_n").cast(dec) * lit(pT).cast(dec)
    Dsir.materializeModel(counts.select(col("bucket"),
      (((num - pmod(num, den)) / den).cast("long") - scale).as("w")))
  }

  /** Per-document margin vs a trained model: (id, carryCols…, n_grams,
    * margin) where margin = Σ over the doc's grams of the gram's bucket
    * weight (0 when unattested). margin/n_grams ∈ [−scale, scale] is
    * the average per-gram quality signal — threshold THAT, not the raw
    * margin, so long documents aren't favored.
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      numBuckets: Int = 1024,
      carryCols: Seq[String] = Seq.empty
  ): DataFrame =
    docs.select(col(idCol) +: carryCols.map(col) :+
        explode(Dsir.gramsOf(Dsir.toks(col(textCol)))).as("g"): _*)
      .withColumn("bucket", Dsir.bucketOf(col("g"), numBuckets))
      .join(broadcast(model.select(col("bucket"), col("w"))), Seq("bucket"), "left")
      .groupBy(col(idCol) +: carryCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("w"), lit(0L))).as("margin"))

  /** Keep documents whose AVERAGE per-gram margin is ≥ thrNum/thrDen
    * (integer cross-multiply — margin·thrDen ≥ n_grams·thrNum in
    * DECIMAL, no float division). thr = 0/1 keeps docs the model
    * favors at all; positive thresholds tighten the gate.
    */
  def filterByQuality(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      numBuckets: Int = 1024,
      thrNum: Long = 0L,
      thrDen: Long = 1L
  ): DataFrame = {
    require(thrDen > 0, "thrDen must be positive")
    val kept = score(docs, idCol, textCol, model, numBuckets)
      .filter(col("margin").cast(dec) * lit(thrDen).cast(dec) >=
        col("n_grams").cast(dec) * lit(thrNum).cast(dec))
      .select(col(idCol))
    docs.join(kept, Seq(idCol), "left_semi")
  }
}
