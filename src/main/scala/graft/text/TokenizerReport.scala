package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unified tokenizer dashboard over a token-stream frame (doc id +
  * token array + grouping columns, e.g. the corpus-trained-BPE fixture
  * behind q104/q112): fertility, packing, and mixture in ONE pass over
  * the stream, so closing a tokenizer-training run doesn't re-scan the
  * token arrays once per report.
  *
  * Scale shape: the per-document metrics are a narrow projection (array
  * folds, no explode); the group roll-up is a single map-side-combinable
  * aggregation whose exchange carries one row per group; the mixture
  * denominator is a window over the ≤|groups|-row aggregate (bookkeeping
  * scale, not corpus scale). Token rows never shuffle.
  *
  * All ratios follow the repo's cross-engine rules: tokens-per-million-
  * chars is the exact DECIMAL(38,0) floor-division idiom; the fractions
  * are single double divisions of exact longs.
  */
object TokenizerReport {

  private val dec = "decimal(38,0)"

  private def floorDiv(num: Column, den: Column): Column =
    ((num - pmod(num, den)) / den).cast("long")

  /** Per-document fertility metrics: n_toks, n_chars, n_single,
    * toks_per_mchar, single_tok_frac. Docs with no tokens or no
    * characters are dropped (no defined fertility). Narrow — no shuffle.
    */
  def perDoc(tokens: DataFrame, toksCol: String): DataFrame = {
    val t = col(toksCol)
    tokens
      .withColumn("n_toks", size(t).cast("long"))
      .withColumn("n_chars",
        aggregate(transform(t, x => length(x).cast("long")), lit(0L), (a, x) => a + x))
      .withColumn("n_single", size(filter(t, x => length(x) === 1)).cast("long"))
      .filter(col("n_toks") > 0 && col("n_chars") > 0)
      .withColumn("toks_per_mchar",
        floorDiv(col("n_toks").cast(dec) * lit(1000000L).cast(dec), col("n_chars").cast(dec)))
      .withColumn("single_tok_frac", col("n_single") / col("n_toks").cast("double"))
      .drop(toksCol)
  }

  /** The one-pass group report: per group (e.g. language) —
    * fertility (n_docs, n_toks, n_chars, n_single, toks_per_mchar,
    * single_tok_frac), packing at `budget` tokens per chunk
    * (n_chunks = ⌈n_toks/budget⌉ under concatenate-then-chunk,
    * fill_frac = n_toks / (n_chunks·budget)), and the group's
    * mixture_frac of the total token stream.
    */
  def report(
      tokens: DataFrame,
      groupCols: Seq[String],
      toksCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val grouped = perDoc(tokens, toksCol)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_toks"),
        sum("n_chars").as("n_chars"),
        sum("n_single").as("n_single"))
    val chunks = floorDiv(
      (col("n_toks") + lit(budget - 1)).cast(dec), lit(budget).cast(dec))
    grouped
      .withColumn("toks_per_mchar",
        floorDiv(col("n_toks").cast(dec) * lit(1000000L).cast(dec), col("n_chars").cast(dec)))
      .withColumn("single_tok_frac", col("n_single") / col("n_toks").cast("double"))
      .withColumn("n_chunks", chunks)
      .withColumn("fill_frac",
        col("n_toks") / (col("n_chunks") * lit(budget)).cast("double"))
      // the denominator window runs over the ≤|groups|-row aggregate —
      // bookkeeping scale, never the token stream
      .withColumn("mixture_frac",
        col("n_toks") / sum("n_toks").over(Window.partitionBy()).cast("double"))
  }
}
