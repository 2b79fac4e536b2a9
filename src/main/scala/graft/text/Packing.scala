package graft.text

import graft.operators.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-token-budget training
  * chunks ("concatenate then chunk", the standard pretraining packing:
  * documents are laid end-to-end in a deterministic order and a chunk
  * boundary falls every `budget` tokens; a document belongs to the chunk
  * its FIRST token lands in).
  *
  * The concatenation order is md5-hash order of the document key (ties →
  * key), the same engine-portable order [[Sampling]] uses — so the packing
  * is reproducible on any engine, partitioning or rerun, and doubles as a
  * shuffle of the corpus (hash order ≈ random order), which is exactly what
  * training wants.
  *
  * Scale shape: one shuffle on the group columns, then a running-total
  * window within each group — no joins, no driver state. Groups are
  * independent packing streams (per-language, per-split…), so skew is
  * bounded by the largest group; pack within (split, shard) groups if a
  * single stream would be too large for one task's sort.
  */
object Packing {

  /** Token-budget truncation — the max-sequence-length prep step that
    * runs before packing: documents longer than `maxTokens` whitespace
    * tokens are cut at the token boundary (single-space rejoin, the
    * same tokenization [[chunkAssignments]] budgets with, so a
    * truncated doc's n_toks is exactly what packing will see). Returns
    * (id, textCol truncated, n_tokens_raw, n_tokens, truncated). One
    * narrow projection — no shuffle, no UDF.
    */
  def truncateToBudget(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int
  ): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val w = split(col(textCol), "\\s+")
    docs.select(
      col(idCol),
      when(size(w) > maxTokens,
        array_join(slice(w, 1, maxTokens), " "))
        .otherwise(col(textCol)).as(textCol),
      size(w).cast("long").as("n_tokens_raw"),
      least(size(w), lit(maxTokens)).cast("long").as("n_tokens"),
      (size(w) > maxTokens).as("truncated"))
  }

  /** Adds `start_offset` (tokens before this doc in its group's stream),
    * `bin` (chunk index = start_offset / budget) and `pack_order` (position
    * in the stream) to each row.
    */
  def chunkAssignments(
      df: DataFrame,
      groupCols: Seq[String],
      keyCols: Seq[String],
      tokensCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    val order = substring(Sampling.keyHash(keyCols.map(col)), 1, 15).asc +: keyCols.map(col(_).asc)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    val cum = sum(col(tokensCol)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("pack_order", row_number().over(w))
      .withColumn("start_offset", (cum - col(tokensCol)).cast("long"))
      // long/long division then floor-cast == integer floor-div for the
      // non-negative offsets here (and matches DuckDB's `//`)
      .withColumn("bin", (col("start_offset") / lit(budget)).cast("long"))
  }

  /** Chunk-level summary: docs and token mass per (group, bin). `tok_sum`
    * may exceed `budget` (a doc straddling a boundary counts where it
    * starts) and bin ids may skip (a doc longer than `budget` swallows the
    * following chunk ids) — both inherent to concatenate-then-chunk.
    */
  def packSummary(
      df: DataFrame,
      groupCols: Seq[String],
      keyCols: Seq[String],
      tokensCol: String,
      budget: Long
  ): DataFrame =
    chunkAssignments(df, groupCols, keyCols, tokensCol, budget)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).cast("long").as("tok_sum"))
}
