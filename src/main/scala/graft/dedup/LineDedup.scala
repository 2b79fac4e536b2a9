package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global exact line-level deduplication with text reconstruction — the
  * C4 pipeline's "discard all but one of any three-sentence span / keep
  * one occurrence of every line" family (Raffel et al. 2020, public):
  * boilerplate (headers, footers, cookie banners) repeats across
  * millions of pages and must be scrubbed CORPUS-globally, keeping only
  * the first occurrence. The reference corpus has no such operator;
  * this is part of the LLM-pipeline extension set (SURVEY §2.3).
  *
  * Skew contract (100 TB): the na(i)ve formulation — a row_number window
  * partitioned by line hash — funnels every occurrence of a universal
  * boilerplate line into ONE reducer. Here first-occurrence is a plain
  * `min` AGGREGATE over an integer (id, pos) encoding: partial
  * aggregation combines map-side, so a line repeated a billion times
  * exchanges one row per upstream partition, not a billion. Reassembly
  * groups by doc — the second (and last) shuffle; `sort_array` on
  * (pos, line) structs restores order without a window.
  *
  * The (id, pos) encoding packs pos into the low [[PosBits]] bits:
  * callers need `pos < 2^PosBits` (a million+ lines in ONE document)
  * and `id < 2^(63-PosBits)`; violations fail fast per-row rather than
  * silently misorder.
  */
object LineDedup {

  val PosBits: Int = 20

  /** Default cap on batch-distinct line keys eligible for the broadcast
    * fast path in [[incrementalScrub]] (~4M 16-byte keys ≈ 64 MB on the
    * driver). Above it the semi-join demotes to a shuffle — slower but
    * never an OOM.
    */
  val MaxBroadcastKeys: Int = 4 << 20

  /** The packed (id, pos) first-occurrence code with the per-row
    * overflow fail-fast the object doc promises — every encode site
    * (scrub, lineStore, incrementalScrub) MUST go through this: a
    * silent wrap would elect a wrong first-occurrence owner.
    */
  private def encodedCode(id: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(pos < lit(1L << PosBits) &&
         id.cast("long") < lit(1L << (63 - PosBits)),
      shiftleft(id.cast("long"), PosBits) + pos)
      .otherwise(raise_error(
        format_string("LineDedup (id,pos) encoding overflow: id=%s pos=%s",
          id, pos)))

  /** Scrub to one global occurrence per distinct line (first by (id,
    * pos)), reassembling each document. Returns (id, text_clean,
    * n_lines, n_kept); a document whose every line is scrubbed keeps
    * its row with empty text.
    *
    * Lines shorter than `minLineChars` are ALWAYS kept (they count in
    * n_lines and n_kept but never scrub): with the default 1 this
    * exempts empty lines, whose global dedup would otherwise collapse
    * every document's blank-line/paragraph structure into whichever doc
    * holds the corpus-first blank line — the reason the C4 family
    * dedups content lines, not structure. Raise it to also exempt
    * short boilerplate-free lines ("*", "-").
    */
  def scrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minLineChars: Int = 1
  ): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(sep)
    val lines = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), sepLit)).as(Seq("pos", "line")))
      .withColumn("k", md5(col("line")))
      .withColumn("code", encodedCode(col("id"), col("pos")))
    val firsts = lines.filter(length(col("line")) >= minLineChars)
      .groupBy("k").agg(min(col("code")).as("first_code"))
    lines.join(firsts, Seq("k"), "left")
      .withColumn("keep",
        length(col("line")) < minLineChars || col("code") === col("first_code"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(when(col("keep"),
              struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          sep).as("text_clean"))
      .select(col("id"), col("text_clean"), col("n_lines"), col("n_kept"))
  }

  /** Persistable line store: one row per distinct content line —
    * (k = md5(line), first_code = min (id,pos) encoding) — the corpus
    * state behind [[incrementalScrub]]. Lines shorter than
    * `minLineChars` never enter the store (they never scrub).
    */
  def lineStore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minLineChars: Int = 1
  ): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(sep)
    docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), sepLit)).as(Seq("pos", "line")))
      .filter(length(col("line")) >= minLineChars)
      .select(md5(col("line")).as("k"),
        encodedCode(col("id"), col("pos")).as("code"))
      .groupBy("k").agg(min("code").as("first_code"))
  }

  /** Fold a new batch's lines into an existing store (min-code union) —
    * the ingest-time maintenance step. Both sides are (k, first_code);
    * the exchange carries 16-byte keys + one long, map-side combined.
    */
  def mergeLineStore(store: DataFrame, batchStore: DataFrame): DataFrame =
    store.unionByName(batchStore)
      .groupBy("k").agg(min("first_code").as("first_code"))

  /** Incremental scrub — [[scrub]]'s online form (the ExactDedup /
    * SpanDedup incremental contract: each ingest pays for its batch,
    * never the corpus): a batch line survives iff its hash is NOT in
    * the store AND it is the batch's own first occurrence. The
    * corpus-sized store is semi-filtered map-side against the
    * BROADCAST batch key set before the anti-join, so fold I/O is
    * O(batch ∩ store), never O(store). Returns the same
    * (id, text_clean, n_lines, n_kept) shape as [[scrub]]; fold the
    * batch into the store afterwards with
    * `mergeLineStore(store, lineStore(batch, …))`.
    *
    * Broadcast guard: the fast path assumes an INGEST-sized batch. The
    * batch's distinct line-key count is probed eagerly (one extra
    * O(batch) job — batch-sized by the incremental contract, never
    * corpus-sized) and compared against `maxBroadcastKeys`
    * ([[MaxBroadcastKeys]] ≈ 4M keys / 64 MB); a larger batch demotes
    * BOTH joins to shuffled form — the store pays one extra shuffle
    * instead of the driver OOMing. Pass `maxBroadcastKeys = 0` to force
    * the shuffle path (the equality spec's hook).
    */
  def incrementalScrub(
      store: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minLineChars: Int = 1,
      maxBroadcastKeys: Int = MaxBroadcastKeys
  ): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(sep)
    val lines = batch
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), sepLit)).as(Seq("pos", "line")))
      .withColumn("k", md5(col("line")))
      .withColumn("code", encodedCode(col("id"), col("pos")))
    // batch-internal first occurrences (the scrub() aggregate shape).
    // PERSISTED: this frame feeds three branches (the broadcast-guard
    // probe, the store semi-filter, and the wide join) — unpersisted,
    // the batch's explode + md5 + aggregate lineage re-runs per branch
    // (the ExactSubstr.incrementalScrub contract; released by the
    // ContextCleaner once the returned plan is collected)
    val batchFirsts = lines.filter(length(col("line")) >= minLineChars)
      .groupBy("k").agg(min(col("code")).as("first_code"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val useBroadcast = maxBroadcastKeys > 0 &&
      batchFirsts.limit(maxBroadcastKeys + 1).count() <= maxBroadcastKeys
    def hinted(df: DataFrame): DataFrame = if (useBroadcast) broadcast(df) else df
    // store hits, bounded by the batch: semi-filter the corpus-sized
    // store against the (guarded-broadcast) batch key set BEFORE any
    // wide join
    val storeHits = store.join(hinted(batchFirsts.select("k")), Seq("k"), "left_semi")
      .select(col("k"), lit(1).as("__in_store"))
    lines
      .join(batchFirsts, Seq("k"), "left")
      .join(hinted(storeHits), Seq("k"), "left")
      .withColumn("keep",
        length(col("line")) < minLineChars ||
          (col("__in_store").isNull && col("code") === col("first_code")))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(when(col("keep"),
              struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          sep).as("text_clean"))
      .select(col("id"), col("text_clean"), col("n_lines"), col("n_kept"))
  }

  /** WITHIN-document repeated-line scrub — the page-local half of the
    * boilerplate problem (nav menus, cookie banners, "Subscribe!" blocks
    * repeated inside ONE page), where [[scrub]] is the corpus-global
    * half. Keeps each document's first occurrence of every content line;
    * lines shorter than `minLineChars` are always kept (the same
    * structure-preserving exemption as [[scrub]] — with the default 1,
    * blank lines survive).
    *
    * Scale shape: a NARROW higher-order-function fold — zero shuffles,
    * zero UDFs; the whole operator runs at scan speed inside codegen.
    * The fold is O(lines²) per document (array_contains over the kept
    * prefix), fine for real pages (thousands of lines). Documents over
    * `cutoverLines` route through a linear exploded formulation instead
    * (per-(doc, line) min-position + ordered re-aggregation — one
    * shuffle carrying ONLY the oversized docs' lines), so an adversarial
    * 10^6-line page cannot stall a task; the two paths are
    * spec-asserted equal and union back together.
    *
    * Returns (id, text_clean, n_lines, n_kept); NULL text stays NULL.
    */
  def scrubWithinDoc(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minLineChars: Int = 1,
      cutoverLines: Int = 4096
  ): DataFrame = {
    // a negative cutover would route the NULL-text row (nLines = -1) to
    // the exploded path, where posexplode silently DROPS it — breaking
    // the "NULL text stays NULL" contract
    require(cutoverLines >= 0, s"cutoverLines must be >= 0: $cutoverLines")
    val sepLit = java.util.regex.Pattern.quote(sep)
    val lines = split(col(textCol), sepLit)
    // NULL text → size() = -1 → routed to the fold path, which maps it
    // to NULL output (posexplode would silently DROP the row).
    // cutoverLines = Int.MaxValue keeps the plan PURE fold (no union, no
    // Exchange anywhere — the original zero-shuffle shape, spec-locked).
    val pureNarrow = cutoverLines == Int.MaxValue
    // coalesce: size(NULL array) is NULL, and a bare comparison would
    // drop the NULL-text row from BOTH branches
    val nLines = coalesce(size(lines), lit(-1))
    val small = if (pureNarrow) docs else docs.filter(nLines <= cutoverLines)
    val big = docs.filter(nLines > cutoverLines)

    val kept = aggregate(
      lines,
      array().cast("array<string>"),
      (acc, x) => when(
        length(x) < minLineChars || !array_contains(acc, x),
        concat(acc, array(x))).otherwise(acc))
    val foldPart = small.select(
      col(idCol).as("id"),
      array_join(kept, sep).as("text_clean"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"))
      // split() never yields NULL elements, but size() is -1 on NULL
      // arrays — normalize the NULL-text row to NULL metrics
      .withColumn("n_lines", when(col("n_lines") < 0, lit(null)).otherwise(col("n_lines")))
      .withColumn("n_kept", when(col("n_kept") < 0, lit(null)).otherwise(col("n_kept")))
    if (pureNarrow) return foldPart

    val ex = big.select(col(idCol).as("id"), posexplode(lines).as(Seq("pos", "line")))
    val keepFlag = col("pos") === min(when(length(col("line")) >= minLineChars, col("pos")))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("id"), col("line")))
    val explodedPart = ex
      .withColumn("keep", length(col("line")) < minLineChars || keepFlag)
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(when(col("keep"),
              struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          sep).as("text_clean"))
      .select(col("id"), col("text_clean"), col("n_lines"), col("n_kept"))
    foldPart.unionByName(explodedPart)
  }
}
