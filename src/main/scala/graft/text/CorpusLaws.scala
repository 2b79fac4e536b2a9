package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics laws: Zipf rank–frequency slope (Zipf 1949) and
  * Heaps/Herdan vocabulary growth (Heaps 1978) — the two numbers a
  * training-data curator reads FIRST when a corpus arrives: a healthy
  * natural-language crawl has a Zipf slope near −1 and a Heaps exponent
  * β ≈ 0.4–0.6; template spam, boilerplate floods, and synthetic
  * word-salad bend both (repetition flattens the Zipf tail; a collapsed
  * vocabulary flattens Heaps). Complements the per-document quality
  * scores (q28/q52) with CORPUS-level shape diagnostics.
  *
  * Determinism: token counts / checkpoint totals are exact integers;
  * every `ln` is nano-scaled to a long BEFORE any sum (the Association
  * discipline), and the OLS normal equations then run in exact
  * DECIMAL(38,0) over those nano-ints — num and den are integers both
  * engines reproduce digit-for-digit, the slope is their one double
  * division (gate at 9 decimals for the >2^53 cast ulp, q198 finding).
  *
  * Tokenization is the house whitespace split (HeavyHitters/q43), so
  * the DuckDB oracle replays it with regexp_split_to_array.
  */
object CorpusLaws {

  private val dec = "decimal(38,0)"

  /** (token, cnt) counts — one explode, map-side partial agg. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))

  /** One-row Zipf OLS fit over the top-`topN` tokens: regress
    * ln(cnt) on ln(rank), rank assigned by (cnt DESC, token ASC) —
    * fully deterministic tie order. Emits n_points, the exact nano-int
    * normal-equation sums (digit strings — the q172 no-silent-overflow
    * rule), and slope / intercept.
    *
    * SCALE: the top-N selection is TakeOrderedAndProject over the
    * map-side-combined count frame (never a global sort of the
    * vocabulary); the rank window then runs on N ≤ topN rows — a
    * bounded frame by construction, same contract as the q43 top-k.
    */
  def zipfSlope(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    require(topN >= 2, s"topN must be >= 2: $topN")
    val top = tokenCounts(df, textCol)
      .orderBy(col("cnt").desc, col("token"))
      .limit(topN)
    // bounded-frame window: ≤ topN rows reach it
    val ranked = top
      .withColumn("rank", row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
      .withColumn("__lr", round(log(col("rank").cast("double")) * 1e9d).cast("long"))
      .withColumn("__lc", round(log(col("cnt").cast("double")) * 1e9d).cast("long"))
    val s = ranked.agg(
      count(lit(1)).as("n_points"),
      sum(col("__lr").cast(dec)).as("__sx"),
      sum(col("__lc").cast(dec)).as("__sy"),
      sum(col("__lr").cast(dec) * col("__lc").cast(dec)).as("__sxy"),
      sum(col("__lr").cast(dec) * col("__lr").cast(dec)).as("__sxx"))
    val n = col("n_points").cast(dec)
    s.withColumn("__num", n * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den", n * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope",
        when(col("__den") > 0, col("__num").cast("double") / col("__den").cast("double")))
      // intercept in ln-count space, back on the NANO scale's /1e9:
      // (Σy − slope·Σx) / n — slope is the one double above, the rest
      // exact casts; 9-decimal gate surface like slope
      .withColumn("intercept",
        (col("__sy").cast("double") - col("slope") * col("__sx").cast("double")) /
          (col("n_points").cast("double") * 1e9d))
      .select(col("n_points"),
        col("__num").cast("string").as("ols_num"),
        col("__den").cast("string").as("ols_den"),
        col("slope"), col("intercept"))
  }

  /** Heaps'-law vocabulary-growth checkpoints: for each doc-id
    * checkpoint ck (powers of two ≥ `minCheckpoint`, up to the max id),
    * the EXACT n_docs / tokens_cum / vocab_cum over the prefix
    * doc_id ≤ ck — all integers, a lossless cross-engine gate. β is the
    * OLS slope of ln(vocab) on ln(tokens) over these rows
    * ([[heapsBeta]]).
    *
    * SCALE — the single-scan form: a token's prefix membership is
    * decided by its FIRST-occurrence doc id (one agg over the exploded
    * tokens), so vocab(ck) = |{tokens: first_doc ≤ ck}| needs no
    * per-prefix rescan; the checkpoint frame (≤ ~40 rows) broadcasts
    * onto the vocabulary- and doc-sized count frames. Nothing
    * corpus-token-sized is joined more than once.
    */
  def heapsCheckpoints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minCheckpoint: Long = 64L
  ): DataFrame = {
    require(minCheckpoint >= 1, s"minCheckpoint must be >= 1: $minCheckpoint")
    val docs = df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .filter(col("doc_id").isNotNull && col("__text").isNotNull)
    val tok = docs.select(col("doc_id"),
        explode(split(lower(col("__text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val firstDoc = tok.groupBy("token").agg(min("doc_id").as("first_doc"))
    val docTok = tok.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    // checkpoint frame: powers of two in [minCheckpoint, maxId] — built
    // from a 1-row max, broadcast everywhere
    val cks = docs.agg(max("doc_id").as("__max"))
      .select(explode(sequence(lit(0), lit(62))).as("__k"), col("__max"))
      .withColumn("ck", expr("shiftleft(CAST(1 AS BIGINT), __k)"))
      .filter(col("ck") >= minCheckpoint && col("ck") <= col("__max"))
      .select("ck")
    val vocab = broadcast(cks).join(firstDoc, col("first_doc") <= col("ck"))
      .groupBy("ck").agg(count(lit(1)).as("vocab_cum"))
    val toks = broadcast(cks).join(docTok, col("doc_id") <= col("ck"))
      .groupBy("ck").agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens_cum"))
    toks.join(vocab, Seq("ck"), "left_outer")
      .na.fill(0L, Seq("vocab_cum"))
      .select("ck", "n_docs", "tokens_cum", "vocab_cum")
  }

  /** One-row Heaps exponent β: OLS slope of ln(vocab_cum) on
    * ln(tokens_cum) over a [[heapsCheckpoints]] frame, same nano-int
    * normal equations as [[zipfSlope]]. */
  def heapsBeta(checkpoints: DataFrame): DataFrame = {
    val pts = checkpoints
      .filter(col("tokens_cum") > 0L && col("vocab_cum") > 0L)
      .withColumn("__lx", round(log(col("tokens_cum").cast("double")) * 1e9d).cast("long"))
      .withColumn("__ly", round(log(col("vocab_cum").cast("double")) * 1e9d).cast("long"))
    val s = pts.agg(
      count(lit(1)).as("n_points"),
      sum(col("__lx").cast(dec)).as("__sx"),
      sum(col("__ly").cast(dec)).as("__sy"),
      sum(col("__lx").cast(dec) * col("__ly").cast(dec)).as("__sxy"),
      sum(col("__lx").cast(dec) * col("__lx").cast(dec)).as("__sxx"))
    val n = col("n_points").cast(dec)
    s.withColumn("__num", n * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den", n * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("beta",
        when(col("__den") > 0, col("__num").cast("double") / col("__den").cast("double")))
      .select(col("n_points"), col("beta"))
  }

  /** Per-group vocabulary PROFILE — the one-row corpus health card the
    * Zipf/Heaps fits read pointwise: token count, type count, hapax
    * legomena count and ratio (the "how much of this vocabulary is
    * noise/typos/URLs" smell — a healthy natural corpus sits near
    * 0.4–0.6, deduped boilerplate collapses it), type-token ratio, and
    * the mass share of the top-`topK` types (head concentration — the
    * boilerplate-template complement of hapax). Exact integer counts;
    * every ratio ONE pinned division.
    *
    * SCALE: per-(group, token) counts are map-side combined; the
    * profile aggregations are vocabulary-keyed and UNORDERED; the top-K
    * head mass is the only ordered step and runs on a
    * WindowGroupLimit-pruned topK-rows-per-group twin (see
    * [[vocabProfileFromCounts]]). Emits one row per group.
    */
  /** Vocabulary CHURN between two (token, cnt) snapshots — the
    * tokenizer-maintenance read [[vocabProfile]] can't give: how much
    * of the current corpus is out-of-vocabulary for a tokenizer fitted
    * on the base (oov_rate, by MASS — the number that prices a refit),
    * how many types appeared/dropped, and how much mass each side puts
    * on the shared vocabulary. One full-outer token join
    * (vocabulary-keyed); exact integer counts/masses; every rate ONE
    * pinned division. One row out.
    */
  def vocabChurn(baseCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val b = baseCounts.select(col("token").as("__tb"), col("cnt").as("__nb"))
    val c = curCounts.select(col("token").as("__tc"), col("cnt").as("__nc"))
    b.join(c, col("__tb") === col("__tc"), "full_outer")
      .select(
        coalesce(col("__nb"), lit(0L)).as("nb"),
        coalesce(col("__nc"), lit(0L)).as("nc"))
      .agg(
        sum(when(col("nb") > 0L, 1L).otherwise(0L)).as("types_base"),
        sum(when(col("nc") > 0L, 1L).otherwise(0L)).as("types_cur"),
        sum(when(col("nb") > 0L && col("nc") > 0L, 1L).otherwise(0L)).as("types_shared"),
        sum(when(col("nb") === 0L, 1L).otherwise(0L)).as("types_new"),
        sum(when(col("nc") === 0L, 1L).otherwise(0L)).as("types_dropped"),
        sum("nb").cast("long").as("mass_base"),
        sum("nc").cast("long").as("mass_cur"),
        sum(when(col("nb") > 0L, col("nc")).otherwise(0L)).cast("long").as("cur_mass_in_base"))
      .withColumn("oov_rate",
        when(col("mass_cur") > 0L,
          (col("mass_cur") - col("cur_mass_in_base")).cast("double") /
            col("mass_cur").cast("double")))
      .withColumn("new_type_rate",
        when(col("types_cur") > 0L,
          col("types_new").cast("double") / col("types_cur").cast("double")))
  }

  def vocabProfile(
      df: DataFrame,
      keyCols: Seq[String],
      textCol: String,
      topK: Int = 100
  ): DataFrame = {
    require(topK >= 1, s"topK must be positive: $topK")
    val g = keyCols.map(col)
    val counts = df
      .filter(col(textCol).isNotNull)
      .select((g :+ explode(expr(
        s"filter(split(lower($textCol), '\\\\s+'), t -> t != '')")).as("token")): _*)
      .groupBy((g :+ col("token")): _*)
      .agg(count(lit(1)).as("cnt"))
    vocabProfileFromCounts(counts, keyCols, topK)
  }

  /** [[vocabProfile]] from a pre-aggregated per-(keys, token) `cnt`
    * frame — the standing-store reader: fold batch token counts with
    * [[mergeTokenCounts]] and the health card reads ALL history without
    * re-tokenizing it.
    *
    * SCALE: token/type/hapax are UNORDERED aggregates (no window at
    * all); the head mass ranks a `row_number <= topK`-FILTERED twin, so
    * Spark's WindowGroupLimit prunes each group to its topK rows
    * map-side BEFORE the rank shuffle sort — no reducer ever sorts a
    * whole language's vocabulary (the q188-q190 re-lay; the old form
    * fed the rank into a conditional sum, which disabled the prune and
    * made this the repo's last group-unbounded sort). The two branches
    * share the count frame's exchange (ReuseExchange); the join-back is
    * group-cardinality-sized.
    */
  def vocabProfileFromCounts(
      counts: DataFrame,
      keyCols: Seq[String],
      topK: Int = 100
  ): DataFrame = {
    require(topK >= 1, s"topK must be positive: $topK")
    val g = keyCols.map(col)
    val prof = counts
      .groupBy(g: _*)
      .agg(
        sum("cnt").cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("hapax"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("cnt").desc, col("token").asc)
    val head = counts
      .withColumn("__rk", row_number().over(wRank))
      .filter(col("__rk") <= topK)
      .groupBy(g: _*)
      .agg(sum("cnt").cast("long").as("top_mass"))
    // inner join: every nonempty group has a rank-1 row, so head covers
    // exactly prof's key set
    prof.join(head, keyCols)
      .withColumn("hapax_ratio",
        col("hapax").cast("double") / col("n_types").cast("double"))
      .withColumn("type_token_ratio",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("top_share",
        col("top_mass").cast("double") / col("n_tokens").cast("double"))
  }

  /** Vocabulary RICHNESS estimators from a (possibly folded) per-(keys,
    * token) count frame — what [[vocabProfileFromCounts]]'s observed
    * counts can't say: how much vocabulary is this corpus slice STILL
    * HIDING. Chao1's abundance estimate (Chao 1984, bias-corrected
    * form — defined even with no doubletons):
    *
    *   chao1 = types + f1·(f1−1) / (2·(f2+1))
    *
    * with f1/f2 the singleton/doubleton TYPE counts, and Good–Turing
    * coverage (Good 1953): the probability mass of UNSEEN types is
    * estimated by the singleton mass share, coverage = 1 − f1/mass —
    * the "is this crawl slice saturated or still discovering" dial that
    * decides whether more of the same source buys new vocabulary.
    * Exact integer counts; chao1 and the coverage pair are pinned
    * divisions. Emits one row per key set; reads the SAME mergeable
    * store as the profile, so the standing card gets richness for free.
    */
  def vocabRichness(counts: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyCols.map(col)
    val agg = counts.groupBy(g: _*)
      .agg(
        count(lit(1)).as("n_types"),
        sum("cnt").cast("long").as("mass"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("cnt") === 2L, 1L).otherwise(0L)).as("f2"))
    agg
      .withColumn("chao1",
        col("n_types").cast("double") +
          (col("f1") * (col("f1") - 1L)).cast("double") /
            (lit(2d) * (col("f2") + 1L).cast("double")))
      .withColumn("gt_unseen_mass",
        when(col("mass") > 0L, col("f1").cast("double") / col("mass").cast("double")))
      .withColumn("coverage", lit(1d) - col("gt_unseen_mass"))
  }

  /** Yule's K lexical concentration (Yule 1944) — the LENGTH-INVARIANT
    * repetitiveness characteristic beside [[vocabRichness]]'s discovery
    * dials: K = 10⁴·(Σ_v cnt_v² − N)/N² rises when a few types carry
    * the mass (templated/boilerplate text) and is famously stable under
    * corpus growth, so cross-slice K values compare directly where raw
    * type/token ratios can't (they fall with length). The classic
    * frequency-spectrum form 10⁴·(Σ_m m²·V_m − N)/N² reduces to Σcnt²
    * over the types — no spectrum pass needed.
    *
    * Exact: Σcnt² in DECIMAL (a hot type's square passes a long at
    * corpus scale), N exact, K ONE division of exact integers at 9dp —
    * hash-gateable. Reads the SAME mergeable token-count store as the
    * profile/richness family (the tokenCountsStream state), so the
    * standing vocabulary answers concentration for free. NULL K at
    * N = 0. One aggregation over the (keys, token) frame.
    */
  def yuleK(counts: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val c = col("cnt").cast("long").cast(dec)
    counts.groupBy(g: _*)
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("cnt").cast("long")).as("mass"),
        sum(c * c).as("__s2"))
      .withColumn("s2", col("__s2").cast("string"))
      .withColumn("yule_k",
        when(col("mass") > 0L,
          lit(1e4d) * (col("__s2") - col("mass").cast(dec)).cast("double") /
            (col("mass").cast("double") * col("mass").cast("double"))))
      .select((g :+ col("n_types") :+ col("mass") :+ col("s2") :+
        col("yule_k")): _*)
  }

  /** Cross-source vocabulary OVERLAP matrix: for every unordered source
    * pair, the shared-type count and the Jaccard / overlap / both
    * containment coefficients — "which sources are lexically the same
    * corpus in different wrappers" (near-1 containment of a small
    * source in a big one = the small one buys nothing), the source-level
    * companion of the per-document dedup family. Construction: the
    * DISTINCT (source, token) membership frame, one token-keyed
    * self-join (a < b — each shared token fans out to the source pairs
    * holding it, bounded by source-cardinality², with sources small by
    * contract), per-source type counts broadcast on, every coefficient
    * ONE pinned division. Pairs sharing nothing emit 0-overlap rows
    * (the full pair grid comes from the source-cardinality² cross of
    * the size frame, never from the data). Exact integers throughout.
    */
  def vocabOverlap(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val toks = groupedTokenCounts(df, Seq(sourceCol), textCol)
      .select(col(sourceCol).cast("string").as("src"), col("token"))
    val sizes = toks.groupBy("src").agg(count(lit(1)).as("n_types"))
    val inter = toks.select(col("src").as("source_a"), col("token"))
      .join(toks.select(col("src").as("source_b"), col("token")), Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
    val grid = broadcast(sizes.select(col("src").as("source_a"), col("n_types").as("types_a")))
      .crossJoin(broadcast(sizes.select(col("src").as("source_b"), col("n_types").as("types_b"))))
      .filter(col("source_a") < col("source_b"))
    grid.join(inter, Seq("source_a", "source_b"), "left_outer")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("types_a") + col("types_b") - col("n_shared")).cast("double"))
      .withColumn("overlap",
        col("n_shared").cast("double") /
          least(col("types_a"), col("types_b")).cast("double"))
      .withColumn("containment_a",
        col("n_shared").cast("double") / col("types_a").cast("double"))
      .withColumn("containment_b",
        col("n_shared").cast("double") / col("types_b").cast("double"))
  }

  /** Pairwise MIXTURE-DISTANCE matrix: Jensen–Shannon divergence
    * between every two sources' unigram token distributions — the
    * distributional companion of [[vocabOverlap]]'s set view (two
    * sources can share every type yet weight them oppositely — same
    * Jaccard, large JS; the mixture designer needs both). Symmetric,
    * ln 2-bounded, comparable across pairs.
    *
    * Construction without materializing per-pair full-outer joins: the
    * SHARED-token terms come from one token-keyed a<b self-join of the
    * per-source count frame (each side's total attached broadcast),
    * each term nano-rounded like
    * [[graft.quality.Association.jsDivergenceFromCounts]]'s cells; the
    * ONE-SIDED remainder needs no token enumeration at all — every
    * one-sided value's term is ½p·ln 2, so it folds to
    * ½·ln 2·((1 − sp_a) + (1 − sp_b)) with sp the EXACT shared-mass
    * fractions (integer masses, two pinned divisions; ln 2 enters once,
    * pinned). Emits one row per source pair a<b: masses, shared type
    * count and masses, js (nats) and js_norm = js/ln 2; zero-overlap
    * pairs read js_norm = 1 exactly.
    *
    * SCALE: vocabulary-keyed join with source-cardinality² bounded
    * fan-out per token; totals broadcast; nothing document-sized after
    * the count aggregation.
    */
  def mixtureDistanceMatrix(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val counts = groupedTokenCounts(df, Seq(sourceCol), textCol)
      .select(col(sourceCol).cast("string").as("src"), col("token"), col("cnt"))
    val totals = counts.groupBy("src")
      .agg(sum("cnt").cast("long").as("mass"), count(lit(1)).as("n_types"))
    val a = counts.select(col("src").as("source_a"), col("token"), col("cnt").as("na"))
      .join(broadcast(totals.select(col("src").as("source_a"), col("mass").as("ma"))),
        Seq("source_a"))
    val b = counts.select(col("src").as("source_b"), col("token"), col("cnt").as("nb"))
      .join(broadcast(totals.select(col("src").as("source_b"), col("mass").as("mb"))),
        Seq("source_b"))
    val p = col("na").cast("double") / col("ma").cast("double")
    val q = col("nb").cast("double") / col("mb").cast("double")
    val m = (p + q) / lit(2d)
    val shared = a.join(b, Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .withColumn("__t9", round((p * log(p / m) / 2d + q * log(q / m) / 2d) * 1e9d)
        .cast("long"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_types"),
        sum("na").cast("long").as("shared_mass_a"),
        sum("nb").cast("long").as("shared_mass_b"),
        sum(col("__t9").cast("decimal(38,0)")).as("__s9"))
    val grid = broadcast(totals.select(col("src").as("source_a"),
        col("mass").as("mass_a"), col("n_types").as("types_a")))
      .crossJoin(broadcast(totals.select(col("src").as("source_b"),
        col("mass").as("mass_b"), col("n_types").as("types_b"))))
      .filter(col("source_a") < col("source_b"))
    val ln2 = lit(0.6931471805599453) // pinned, the RboPPow rule
    grid.join(shared, Seq("source_a", "source_b"), "left_outer")
      .na.fill(0L, Seq("shared_types", "shared_mass_a", "shared_mass_b"))
      .withColumn("__shared9",
        coalesce(col("__s9").cast("double"), lit(0d)) / 1e9d)
      .withColumn("js",
        col("__shared9") + ln2 / 2d *
          ((lit(1d) - col("shared_mass_a").cast("double") / col("mass_a").cast("double")) +
           (lit(1d) - col("shared_mass_b").cast("double") / col("mass_b").cast("double"))))
      .withColumn("js_norm", col("js") / ln2)
      .drop("__s9", "__shared9")
  }

  /** Per-(keys, token) counts — the grouped [[tokenCounts]], emitted in
    * the mergeable-store shape [[vocabProfileFromCounts]] and
    * [[vocabChurn]] read. */
  def groupedTokenCounts(df: DataFrame, keyCols: Seq[String], textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select((keyCols.map(col) :+ explode(expr(
        s"filter(split(lower($textCol), '\\\\s+'), t -> t != '')")).as("token")): _*)
      .groupBy((keyCols.map(col) :+ col("token")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Fold two token-count frames over disjoint row sets — additive, the
    * [[graft.streaming.StreamingOps.contingencyStream]] discipline
    * (non-idempotent: crash replays recompute from the latest
    * strictly-earlier version, never re-merge). */
  def mergeTokenCounts(a: DataFrame, b: DataFrame, keyCols: Seq[String] = Nil): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols.map(col) :+ col("token")): _*)
      .agg(sum("cnt").as("cnt"))
}
