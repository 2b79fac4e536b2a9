package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repeated-span (sub-document) dedup — the C4-style curation step: a span
  * of text that recurs ACROSS the corpus (boilerplate, licence headers,
  * navigation chrome) is removed from every document but its first
  * occurrence, while whole-document dedup would miss it entirely.
  *
  * Documents are chopped into NON-overlapping `spanWords`-word spans (the
  * C4 recipe; overlap-free means each word is shuffled once, not k times).
  * Spans travel the exchange as 60-bit md5 prefixes, never the text — at
  * 100 TB the span-frequency shuffle carries 15-byte keys. md5 is also what
  * keeps every verdict engine-portable (DuckDB recomputes identical keys).
  *
  * Plan shape: one narrow codegen'd pass builds the span array
  * (split → slice/array_join under `transform`), one explode, one hash
  * aggregation on the span key (map-side combine collapses within-partition
  * repeats), one join back on the key. No windows over the corpus, no
  * driver state.
  */
object SpanDedup {

  /** (id, span_idx, span) — non-overlapping `spanWords`-word spans in
    * document order; a trailing fragment shorter than `spanWords` is
    * dropped (C4 does the same — partial spans under-match).
    * Tokenization is a plain single-space split so any engine reproduces it;
    * normalize the text first if the corpus has tabs/newlines.
    */
  def spans(df: DataFrame, idCol: String, textCol: String, spanWords: Int): DataFrame = {
    require(spanWords > 0, "spanWords must be positive")
    val words = split(col(textCol), " ")
    val n = floor(size(words) / spanWords).cast("int")
    // sequence(0, -1) would generate a DESCENDING [0,-1] — guard zero-span docs
    val idxs = when(n >= 1, sequence(lit(0), n - 1)).otherwise(array().cast("array<int>"))
    val spanArr = transform(idxs, i => array_join(slice(words, i * spanWords + 1, lit(spanWords)), " "))
    df.select(col(idCol), posexplode(spanArr).as(Seq("span_idx", "span")))
  }

  /** 60-bit engine-portable span key (first 15 md5 hex chars). */
  def spanKey(span: Column): Column = substring(md5(to_binary(span, lit("utf-8"))), 1, 15)

  /** Per-document duplication stats: how many of the doc's spans occur
    * elsewhere in the corpus (frequency > 1 over all docs). `dup_fraction`
    * is an int/int division — exact on any IEEE engine.
    */
  def duplicatedSpanStats(df: DataFrame, idCol: String, textCol: String,
      spanWords: Int): DataFrame = {
    val sp = spans(df, idCol, textCol, spanWords).withColumn("h", spanKey(col("span")))
    val freq = sp.groupBy("h").agg(count(lit(1)).as("freq"))
    sp.join(freq, Seq("h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("freq") > 1, 1L).otherwise(0L)).as("n_dup_spans")
      )
      .withColumn("dup_fraction", col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** Persistable span-frequency store for incremental ingest: one row per
    * distinct span key with its corpus frequency and first owner (min
    * (id, span_idx)). 8 + 15 bytes + ids per DISTINCT span — persist THIS,
    * never raw spans; each nightly batch then pays for its batch only.
    */
  def spanStore(df: DataFrame, idCol: String, textCol: String, spanWords: Int): DataFrame =
    spans(df, idCol, textCol, spanWords)
      .withColumn("h", spanKey(col("span")))
      .groupBy("h")
      .agg(
        count(lit(1)).as("freq"),
        min(struct(col(idCol).as("oid"), col("span_idx").as("oidx"))).as("own"))
      .select(col("h"), col("freq"), col("own.oid").as("oid"), col("own.oidx").as("oidx"))

  /** Fold a new batch into an existing store (same semantics as rebuilding
    * [[spanStore]] over the union, spec-asserted): frequencies add, the
    * first owner is the struct-min of both sides. One aggregation over
    * (store ∪ batch-store) — store rows whose spans the batch never
    * touches still flow through this agg, so this DataFrame-in/out form
    * pays O(store) per fold; the production variant is the
    * [[BucketedSpanStore]] MERGE sink, which rewrites only the hash
    * buckets the batch's keys land in (same semantics, spec-asserted).
    */
  def mergeSpanStore(store: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, spanWords: Int): DataFrame =
    store.unionByName(spanStore(batch, idCol, textCol, spanWords))
      .groupBy("h")
      .agg(
        sum(col("freq")).as("freq"),
        min(struct(col("oid"), col("oidx"))).as("own"))
      .select(col("h"), col("freq"), col("own.oid").as("oid"), col("own.oidx").as("oidx"))

  /** [[duplicatedSpanStats]] for a NEW batch against (batch ∪ store) —
    * each ingest pays for its batch, never the corpus: the store side is
    * semi-join filtered map-side against the (broadcast) batch span keys,
    * so store rows outside batch spans never move.
    *
    * @param broadcastBatch same contract as the other incremental ops:
    *   default assumes a small batch; pass false for an oversized one.
    */
  def incrementalStats(
      batch: DataFrame,
      store: DataFrame,
      idCol: String,
      textCol: String,
      spanWords: Int,
      broadcastBatch: Boolean = true
  ): DataFrame = {
    val sp = spans(batch, idCol, textCol, spanWords).withColumn("h", spanKey(col("span")))
    val batchFreq = sp.groupBy("h").agg(count(lit(1)).as("__bf"))
    val keys = if (broadcastBatch) broadcast(batchFreq.select("h")) else batchFreq.select("h")
    val storeFreq = store.join(keys, Seq("h"), "left_semi").select(col("h"), col("freq").as("__sf"))
    val totals = batchFreq.join(storeFreq, Seq("h"), "left")
      .select(col("h"), (col("__bf") + coalesce(col("__sf"), lit(0L))).as("freq"))
    sp.join(totals, Seq("h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("freq") > 1, 1L).otherwise(0L)).as("n_dup_spans")
      )
      .withColumn("dup_fraction", col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** Rewrite each document with corpus-duplicated spans removed, keeping
    * only the FIRST occurrence (global min (id, span_idx) per span — a
    * deterministic, engine-portable tiebreak). The trailing sub-span
    * fragment is preserved as-is. Returns (id, textCol) with the rewritten
    * text; docs whose spans were all removed keep their fragment (possibly
    * empty string).
    *
    * Scale shape: the first-occurrence argmin is `min(struct(id, idx))` on
    * the span key — an aggregation, not a corpus window; reassembly is a
    * per-document sort_array over ≤ (words/spanWords) kept spans.
    *
    * MEMORY BOUND: reassembly buffers ONE document's kept spans in the
    * aggregation buffer, so peak per-task memory is the largest single
    * document, never the corpus. A pathological multi-GB single document
    * would OOM that buffer — chunk such documents upstream (split on a
    * size threshold) before calling this; typical web/crawl corpora cap
    * documents at single-digit MB, which is far below task memory.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      spanWords: Int): DataFrame = {
    val sp = spans(df, idCol, textCol, spanWords).withColumn("h", spanKey(col("span")))
    val firstOwner = sp.groupBy("h")
      .agg(min(struct(col(idCol).as("oid"), col("span_idx").as("oidx"))).as("own"))
      .select(col("h"), col("own.oid"), col("own.oidx"))
    val kept = sp.join(firstOwner, Seq("h"))
      .filter(col(idCol) === col("oid") && col("span_idx") === col("oidx"))
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("span_idx"), col("span")))),
        s => s.getField("span")), " ").as("__kept"))
    val words = split(col(textCol), " ")
    val nFull = floor(size(words) / spanWords).cast("int") * spanWords
    val tail = array_join(slice(words, nFull + 1, size(words) - nFull), " ")
    df.select(col(idCol), tail.as("__tail"))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        concat_ws(" ",
          when(length(col("__kept")) > 0, col("__kept")),
          when(length(col("__tail")) > 0, col("__tail"))
        ).as(textCol)
      )
  }
}
