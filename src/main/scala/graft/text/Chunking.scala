package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window chunking — the retrieval/embedding-side complement of
  * [[Packing]]'s concatenate-then-chunk: each document is cut into
  * OVERLAPPING `windowTokens`-token windows every `strideTokens` tokens
  * (stride < window ⇒ overlap keeps context at the seams), the unit a
  * RAG index or an embedding-training set actually stores.
  *
  * Chunk geometry is pure integer arithmetic on the token count —
  * n ≤ W ⇒ one chunk; else ceil((n−W)/S)+1, last chunk short — so chunk
  * boundaries are bit-identical on any engine (the DuckDB oracle replays
  * them from the same split).
  *
  * Scale shape: split → sequence → transform → posexplode, one narrow
  * codegen'd pass; chunks land in their parent's partition (no shuffle).
  * Like [[graft.multimodal.Multimodal.sampleFrames]], repartition AFTER
  * chunking when a heavy stage follows, so batch memory follows chunk
  * count, not source-document skew.
  */
object Chunking {

  private def chunkCount(n: Column, window: Int, stride: Int): Column =
    when(n <= window, lit(1))
      .otherwise(floor((n - window + stride - 1) / stride).cast("int") + 1)

  /** (id, chunk_idx, chunk, n_chunk_tokens) — single-space tokenization
    * (normalize upstream, same contract as [[graft.dedup.SpanDedup]]);
    * NULL text yields no chunks.
    */
  def slidingChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      strideTokens: Int
  ): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      "strideTokens must be in [1, windowTokens]")
    val words = split(col(textCol), " ")
    val n = size(words)
    val idxs = sequence(lit(0), chunkCount(n, windowTokens, strideTokens) - 1)
    val chunks = transform(idxs, i =>
      array_join(slice(words, i * strideTokens + 1, lit(windowTokens)), " "))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .withColumn("n_chunk_tokens", size(split(col("chunk"), " ")))
  }

  /** Per-document chunking accounting: chunk count + total chunk tokens
    * (> n_tokens when stride < window — the overlap cost a RAG index
    * pays, worth budgeting before embedding a 100 TB corpus).
    */
  def chunkSummary(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      strideTokens: Int
  ): DataFrame =
    slidingChunks(df, idCol, textCol, windowTokens, strideTokens)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("chunk_tokens"))
}
