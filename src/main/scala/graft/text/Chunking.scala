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

  /** Sentence-ALIGNED chunking — the RAG unit [[slidingChunks]] cannot
    * produce (a fixed window cuts mid-sentence by construction): pack
    * [[sentences]] into chunks of at most `budgetTokens` single-space
    * tokens, breaking ONLY at sentence boundaries. Greedy first-fit in
    * sentence order: a sentence joins the open chunk while the token sum
    * stays within budget, else opens a new chunk; a single sentence
    * LARGER than the budget falls back to the token window (cut into
    * budget-sized pieces, each its own chunk — the documented degrade
    * path, so every emitted chunk is ≤ budget tokens, an invariant the
    * spec asserts). Deterministic on any engine: the fold is sequential
    * per document and the q146 oracle replays it as a recursive CTE — a
    * DIFFERENT formulation (running-state recursion vs array fold) so
    * the two derivations cross-check.
    *
    * Returns (idCol, chunk_idx (0-based), chunk, n_sentences,
    * n_chunk_tokens); docs with no sentences emit no rows.
    *
    * Scale shape: one narrow projection — segment, fold, posexplode; no
    * shuffle, chunks land in their parent's partition. The fold's
    * accumulator holds the document's own chunk array (append copies it,
    * so cost is O(sentences²) array-element moves per doc — fine at the
    * chunking unit, but truncate pathological multi-MB docs upstream
    * (q122's budget truncation) rather than feeding them through here,
    * the same pre-filter contract as [[graft.operators.Funnel]]'s
    * hot-user cap).
    */
  def sentenceChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Int
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val B = budgetTokens
    val init = struct(
      expr("cast(array() as array<array<string>>)").as("chunks"),
      lit(-1).as("cur"))
    def step(acc: Column, s: Column): Column = {
      val chunks = acc.getField("chunks")
      val cur = acc.getField("cur")
      val words = split(s, " ")
      val t = size(words)
      // ceil(t / B) pieces for the oversized fallback — t < 2^31 so the
      // double division is exact
      val pcount = floor((t.cast("double") + lit(B - 1)) / lit(B)).cast("int")
      val pieces = transform(sequence(lit(0), pcount - 1), j =>
        array_join(slice(words, j * B + 1, lit(B)), " "))
      val oversized = struct(
        concat(chunks, transform(pieces, p => array(p))).as("chunks"),
        lit(-1).as("cur")) // next sentence must open a fresh chunk
      val appendLast = struct(
        concat(slice(chunks, lit(1), size(chunks) - 1),
          array(concat(element_at(chunks, -1), array(s)))).as("chunks"),
        (cur + t).as("cur"))
      val newChunk = struct(
        concat(chunks, array(array(s))).as("chunks"),
        t.as("cur"))
      when(t > B, oversized)
        .when(cur >= 0 && cur + t <= B, appendLast)
        .otherwise(newChunk)
    }
    sentences(df, idCol, textCol)
      .select(col(idCol),
        aggregate(col("sentences"), init, step).getField("chunks").as("__chunks"))
      .select(col(idCol), posexplode(col("__chunks")).as(Seq("chunk_idx", "__sents")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(col("__sents"), " ").as("chunk"),
        size(col("__sents")).cast("long").as("n_sentences"))
      .withColumn("n_chunk_tokens", size(split(col("chunk"), " ")).cast("long"))
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
