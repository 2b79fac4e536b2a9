package graft.text

import graft.dedup.NgramJaccard
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination check: which held-out documents share word
  * n-grams with the training split. Run before any benchmark number is
  * trusted — a contaminated eval doc inflates scores silently. Pairs with
  * [[graft.operators.Sampling.splitAssign]], whose deterministic md5
  * splits make the check reproducible on any engine.
  *
  * Shape: distinct train grams (one shuffle on gram) semi-joined by eval
  * grams, counted per eval doc. The shuffle carries grams, not documents.
  * At extreme scale [[sharedGramsBloom]] swaps the exact gram join for a
  * broadcast bloom filter over train grams — the eval side never
  * shuffles at all (narrow filter + one id aggregation), and bloom
  * membership has false POSITIVES only, which for a contamination gate
  * is the safe direction (flags a clean doc for review, never clears a
  * contaminated one).
  */
object Contamination {

  /** Per-eval-doc count of distinct word n-grams that also occur anywhere
    * in the training corpus. Docs with zero overlap are absent (the result
    * is the contamination worklist, usually tiny).
    *
    * One pass over BOTH corpora (tagged union → one gram shuffle → one id
    * shuffle) instead of shingling each side separately and joining — the
    * shingling pass is the expensive part, so it runs exactly once.
    * Requires ids unique across the two inputs (true for any split of one
    * corpus). The per-gram test-id list is bounded by documents sharing
    * that exact n-gram; at n ≥ 5 natural language keeps that tiny, and a
    * degenerate corpus (all-identical boilerplate) should be exact-deduped
    * before this check anyway.
    */
  def sharedGrams(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame =
    sharedGramsTagged(
      train.select(col(idCol), lit(true).as("__is_train"), col(textCol).as("__text"))
        .unionByName(test.select(col(idCol), lit(false).as("__is_train"), col(textCol).as("__text"))),
      idCol, "__is_train", "__text", n)

  /** Same check over an already-tagged frame (id, isTrain, text). When the
    * two splits derive from ONE table (the usual case — a split column),
    * this keeps the plan to a single scan; the two-DataFrame form above
    * unavoidably plans one scan per side.
    */
  def sharedGramsTagged(
      tagged: DataFrame,
      idCol: String,
      isTrainCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    import graft.dedup.Shingles
    tagged
      .select(col(idCol), col(isTrainCol).as("__is_train"),
        explode(NgramJaccard.gramSetColumn(Shingles.tokens(col(textCol)), n)).as("gram"))
      .groupBy("gram")
      .agg(
        max(when(col("__is_train"), 1).otherwise(0)).as("in_train"),
        collect_list(when(!col("__is_train"), col(idCol))).as("test_ids")
      )
      .filter(col("in_train") === 1 && size(col("test_ids")) > 0)
      .select(explode(col("test_ids")).as(idCol))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Bloom-filter scale path: the train gram set collapses to a fixed-size
    * broadcast bloom (built distributed via `stat.bloomFilter`'s
    * mergeable sketches); the eval side is then a NARROW membership
    * filter — no gram shuffle, only the tiny per-id count aggregation.
    * `n_shared` may overcount by the false-positive rate (never under):
    * size `expectedGrams`/`fpp` for the train corpus, e.g. 1e9 grams at
    * 1% ≈ 1.2 GB, still broadcastable.
    */
  def sharedGramsBloom(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      expectedGrams: Long = 10000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    import graft.dedup.Shingles
    val trainGrams = train
      .select(explode(NgramJaccard.gramSetColumn(Shingles.tokens(col(textCol)), n)).as("gram"))
    // the broadcast is freed by the ContextCleaner when the returned plan
    // is collected (destroying it here would break the lazy result)
    val bloom = trainGrams.stat.bloomFilter("gram", expectedGrams, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => bc.value.mightContainString(g))
    test
      .select(col(idCol), explode(NgramJaccard.gramSetColumn(Shingles.tokens(col(textCol)), n)).as("gram"))
      .filter(mightContain(col("gram")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Decontamination SCRUB — remove eval-set text from the training
    * corpus instead of just flagging it (detection above + the
    * [[graft.dedup.SpanDedup]] rewrite machinery composed): each train
    * doc's non-overlapping `spanWords`-word spans are DROPPED when the
    * same word span occurs anywhere in the eval set. The eval side is
    * chopped into ALL OVERLAPPING `spanWords`-grams so span alignment
    * cannot hide a match; eval sets are benchmark-sized, so the distinct
    * gram-key set broadcasts and the corpus side stays an anti-join on a
    * 60-bit key — the train corpus shuffles once (per-doc reassembly),
    * never on text.
    *
    * Returns (id, textCol, n_spans, n_scrubbed); reassembly keeps
    * surviving spans in order plus the sub-span tail, exactly the
    * [[graft.dedup.SpanDedup.removeDuplicateSpans]] contract.
    */
  def scrubSpans(
      train: DataFrame,
      idCol: String,
      textCol: String,
      evalSet: DataFrame,
      evalTextCol: String,
      spanWords: Int
  ): DataFrame = {
    import graft.dedup.SpanDedup
    require(spanWords > 0, "spanWords must be positive")
    val ew = split(col(evalTextCol), " ")
    val en = size(ew) - spanWords + 1
    val eIdxs = when(en >= 1, sequence(lit(0), en - 1))
      .otherwise(array().cast("array<int>"))
    val evalKeys = evalSet
      .select(explode(transform(eIdxs,
        i => array_join(slice(ew, i + 1, lit(spanWords)), " "))).as("g"))
      .select(SpanDedup.spanKey(col("g")).as("h")).distinct()
      .withColumn("__hit", lit(1))
    val sp = SpanDedup.spans(train, idCol, textCol, spanWords)
      .withColumn("h", SpanDedup.spanKey(col("span")))
    val tagged = sp.join(broadcast(evalKeys), Seq("h"), "left")
    val perDoc = tagged.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_spans"),
      sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_scrubbed"),
      // collect_list skips nulls: hit spans vanish, survivors sort by idx
      array_join(transform(
        array_sort(collect_list(when(col("__hit").isNull,
          struct(col("span_idx"), col("span"))))),
        s => s.getField("span")), " ").as("__kept"))
    val words = split(col(textCol), " ")
    val nFull = floor(size(words) / spanWords).cast("int") * spanWords
    val tail = array_join(slice(words, nFull + 1, size(words) - nFull), " ")
    train.select(col(idCol), tail.as("__tail"))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        concat_ws(" ",
          when(length(col("__kept")) > 0, col("__kept")),
          when(length(col("__tail")) > 0, col("__tail"))).as(textCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_scrubbed"), lit(0L)).as("n_scrubbed"))
  }
}
