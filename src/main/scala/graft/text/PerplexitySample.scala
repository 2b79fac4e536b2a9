package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style perplexity-bucket sampling (Wenzek et al. 2020,
  * arXiv:1911.00359 — public): score every document against a reference
  * language model, split each language into HEAD / MIDDLE / TAIL
  * terciles by model fit, and keep each tercile at its own rate (the
  * paper keeps head+middle and drops most of the tail). This is the
  * standard web-corpus quality triage between dedup and tokenization.
  *
  * Engine-portable by construction, like [[LmScore]] (whose integer
  * evidence this builds on): the model-fit key is the attested-mass
  * share floor((in_vocab + bigram_hits)·scale / (tokens + bigrams)) in
  * DECIMAL(38,0) — no float log-perplexity, so ranks and buckets are
  * bit-identical on any engine; the per-bucket keep rule is the repo's
  * md5 hex-threshold draw ([[graft.operators.Sampling.deterministic]]).
  *
  * Scale shape: scoring is [[LmScore.score]] (two broadcast model joins,
  * id-keyed roll-up); the group-cols join reuses the roll-up's id
  * partitioning. Ranking is SKEW-SAFE, mirroring
  * [[graft.operators.Interleave]]: rows bucket into 258 key-ordered
  * cells per group, per-(group, cell) counts roll into offsets on a
  * tiny frame, and the rank window partitions by (group, cell) — never
  * one reducer per language. The tercile split and the keep rule are
  * narrow integer/string arithmetic. Nothing corpus-sized shuffles more
  * than once.
  */
object PerplexitySample {

  val DefaultScale: Long = 1000000000L

  private val dec = "decimal(38,0)"

  private def floorDiv(num: Column, den: Column): Column =
    ((num - pmod(num, den)) / den).cast("long")

  /** Integer model-fit key in [0, scale] from [[LmScore.score]] signals:
    * the attested-mass share of the document's tokens+bigrams under the
    * reference model; −1 (below every real key) when there is no
    * evidence at all. Higher = better model fit (head-ward).
    */
  def qualityKey(signals: DataFrame, scale: Long = DefaultScale): DataFrame = {
    val num = (col("n_tokens") - col("n_oov") + col("n_bigram_hits")).cast(dec) *
      lit(scale).cast(dec)
    val den = (col("n_tokens") + col("n_bigrams")).cast(dec)
    signals.withColumn("lm_key",
      when(den === 0, lit(-1L)).otherwise(floorDiv(num, den)))
  }

  /** Skew-safe per-group rank by model fit (lm_key DESC, id ASC) and the
    * CCNet tercile: bucket 0 = head (best fit), 1 = middle, 2 = tail.
    * Appends (q_rank, bucket). The cell layout follows Interleave: cell
    * index is monotone in the sort order (high key → low cell), so
    * per-cell rank + cumulative cell offset IS the group rank.
    */
  def tercileBuckets(
      keyed: DataFrame,
      idCol: String,
      groupCols: Seq[String],
      scale: Long = DefaultScale
  ): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val g = groupCols.map(col)
    // 256 key cells, descending: key=scale → 0, key=0 → 255, key=−1 → 256.
    // The cell grid divides by the SAME scale that produced lm_key — a
    // mismatched scale would collapse every key into one cell (one reducer
    // per group, the exact skew this layout exists to avoid).
    val cell = when(col("lm_key") < 0, lit(256L))
      .otherwise(lit(255L) - floorDiv(col("lm_key").cast(dec) * lit(255L).cast(dec),
        lit(scale).cast(dec)))
    val t = keyed.withColumn("__c", cell)
    // ≤ 257·|groups| rows: cumsum window and broadcast are bookkeeping
    val counts = t.groupBy((g :+ col("__c")): _*).count()
    val offsets = counts
      .withColumn("__off",
        sum("count").over(
          Window.partitionBy(g: _*).orderBy("__c")) - col("count"))
      .withColumn("__n", sum("count").over(Window.partitionBy(g: _*)))
      .select((g :+ col("__c") :+ col("__off") :+ col("__n")): _*)
    t.join(broadcast(offsets), groupCols :+ "__c")
      .withColumn("__rc",
        row_number().over(
          Window.partitionBy((g :+ col("__c")): _*)
            .orderBy(col("lm_key").desc, col(idCol))))
      .withColumn("q_rank", (col("__off") + col("__rc")).cast("long"))
      .withColumn("bucket", floorDiv((col("q_rank") - 1).cast(dec) * lit(3L).cast(dec),
        col("__n").cast(dec)))
      .drop("__c", "__off", "__n", "__rc")
  }

  /** The full triage: score `docs` against reference n-gram models,
    * key, rank into per-group terciles, and keep each tercile at its
    * rate (`fractions` = head, middle, tail in [0,1]) via the
    * deterministic md5 draw on the id. Returns kept docs with signals,
    * lm_key, q_rank, bucket.
    */
  def sample(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      unigrams: DataFrame,
      bigrams: DataFrame,
      groupCols: Seq[String],
      fractions: (Double, Double, Double) = (1.0, 0.5, 0.25),
      scale: Long = DefaultScale
  ): DataFrame = {
    val signals = LmScore.score(docs, idCol, textCol, unigrams, bigrams)
      // groupCols ride an id-keyed join that reuses the roll-up's
      // partitioning (Exchange reuse), not a second corpus shuffle
      .join(docs.select((idCol +: groupCols).map(col): _*), Seq(idCol))
    val bucketed = tercileBuckets(qualityKey(signals, scale), idCol, groupCols, scale)
    val thr = when(col("bucket") === 0,
        lit(graft.operators.Sampling.hexThreshold(fractions._1)))
      .when(col("bucket") === 1,
        lit(graft.operators.Sampling.hexThreshold(fractions._2)))
      .otherwise(lit(graft.operators.Sampling.hexThreshold(fractions._3)))
    bucketed.filter(
      substring(graft.operators.Sampling.keyHash(Seq(col(idCol))), 1, 15) < thr)
  }
}
