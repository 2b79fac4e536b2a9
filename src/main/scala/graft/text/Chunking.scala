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

  /** Rule-based sentence segmentation — the unit SEMANTIC splitters
    * chunk on (sentence-grouped chunks beat fixed token windows for
    * retrieval QA): a sentence ends at a run of `.!?` followed by
    * horizontal whitespace or a line break. Deliberately NAIVE about
    * abbreviations ("Dr. Smith" splits) — the rule is documented,
    * deterministic, and identical on every engine, which a
    * lookbehind/dictionary segmenter cannot be (RE2 has no lookbehind;
    * the pattern here is plain character classes + groups, Java ≡ RE2).
    * Boundary marking writes a unit separator (U+001F) after the
    * punctuation run, then one split — a narrow two-regexp projection,
    * zero shuffles.
    *
    * Returns (idCol, sentences array<string>) with sentences trimmed
    * and empties dropped; NULL text → empty array.
    */
  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val marked = regexp_replace(col(textCol),
      "([.!?]+)[ \\t\\r\\n]+", "$1\u001F")
    val parts = split(marked, "\u001F")
    df.select(col(idCol),
      coalesce(
        filter(transform(parts, s => trim(s)), s => s =!= ""),
        array().cast("array<string>")).as("sentences"))
  }

  /** Per-doc sentence stats: count + char mass + md5 of the joined
    * segmentation (gates the exact boundaries, not just counts).
    */
  def sentenceStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    sentences(df, idCol, textCol).select(
      col(idCol),
      size(col("sentences")).cast("long").as("n_sentences"),
      aggregate(col("sentences"), lit(0L), (a, x) => a + length(x)).as("sentence_chars"),
      md5(to_binary(array_join(col("sentences"), "\u001F"), lit("utf-8"))).as("seg_md5"))
}
