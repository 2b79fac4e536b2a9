package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling.
  *
  * `df.sample()` is seed-stable only for an identical partitioning of an
  * identical plan — rerun after a repartition or on another engine and the
  * sample changes. Training-data pipelines need the OPPOSITE: the same row
  * keys must select the same rows on any engine, any partitioning, any day,
  * so that ablations and holdout splits are reproducible.
  *
  * Mechanism: md5 of the key columns, compare the first 15 hex chars (60
  * bits) lexicographically against a per-fraction threshold. Lowercase
  * fixed-width hex compares lexicographically exactly like the number it
  * encodes, and md5 is identical everywhere — so the predicate is a plain
  * string comparison that any engine (Spark, DuckDB, Trino, …) evaluates
  * identically. The filter is a narrow, codegen'd expression: no shuffle,
  * no state, pushes through joins/unions like any deterministic predicate.
  */
object Sampling {

  /** First 15 hex chars of floor(fraction * 16^15), zero-padded: rows with
    * md5-prefix strictly below this are in the sample.
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val max = BigInt(16).pow(15)
    val t = (BigDecimal(max) * BigDecimal(fraction)).toBigInt.min(max)
    if (t == max) "g" // past every hex digit → selects all rows
    else "%015x".format(t.bigInteger).takeRight(15)
  }

  /** Hash column: md5 over the \u0001-joined key columns (cast to string).
    * Each column is coalesced to [[graft.functions.NullToken]] first:
    * concat_ws silently skips NULLs, so without the sentinel the keys
    * (a, NULL, b), (a, b, NULL) and (a, b) would all hash identically and
    * deterministically land in the same sample/split bucket.
    */
  def keyHash(keyCols: Seq[Column]): Column =
    md5(to_binary(
      concat_ws("\u0001",
        keyCols.map(c => coalesce(c.cast("string"), lit(graft.functions.NullToken))): _*),
      lit("utf-8")))

  /** Uniform deterministic sample: keep ~fraction of rows, selected purely
    * by key content.
    */
  def deterministic(df: DataFrame, keyCols: Seq[String], fraction: Double): DataFrame =
    df.filter(substring(keyHash(keyCols.map(col)), 1, 15) < lit(hexThreshold(fraction)))

  /** Deterministic [0,1) uniform per key: the first 60 bits of the key md5
    * scaled by 2^-60. The 60-bit integer and the power-of-two divisor give
    * IEEE-identical doubles on every engine, so weight comparisons against
    * it are engine-portable (unlike the string-threshold path, which needs
    * the fraction known at plan time).
    */
  def uniform01(keyCols: Seq[Column]): Column =
    conv(substring(keyHash(keyCols), 1, 15), 16, 10).cast("long").cast("double") /
      lit(1152921504606846976.0) // 2^60

  /** Weighted deterministic sample: each row kept with probability
    * `weight` (a per-row Column in [0,1], e.g. a quality score) — the
    * importance-sampling step of data-mixture curation. Same guarantees as
    * [[deterministic]]: pure key-content identity, no state, narrow
    * codegen'd filter, reproducible on any engine or partitioning.
    */
  def weighted(df: DataFrame, keyCols: Seq[String], weight: Column): DataFrame =
    df.filter(uniform01(keyCols.map(col)) < weight)

  /** Temperature resampling of a skewed group mix (languages, crawl
    * sources) toward the rarest group: post-sample sizes ∝ n_g^alpha, the
    * standard multilingual/source rebalancing for pretraining mixtures
    * (alpha = 1/2 is "square-root sampling"). Each group is kept with
    * probability p_g = (n_min / n_g)^(1 − alpha), so the rarest group
    * keeps everything and dominant groups shrink; lower alpha flattens
    * the mix harder.
    *
    * Engine-portability is why alpha is restricted to DYADIC RATIONALS
    * (p/2^k — this overload keeps the historical quarters API; see
    * [[temperatureResampleDyadic]] for the general grid): n_min / n_g is
    * a correctly-rounded double of an exact integer ratio, and the
    * exponent chain is built purely from IEEE sqrt and multiply — both
    * correctly rounded on every engine — so p_g is bit-identical anywhere
    * (an arbitrary-alpha pow() differs in the last ulp between libms):
    * r^(1/4) = sqrt(sqrt(r)), r^(1/2) = sqrt(r),
    * r^(3/4) = sqrt(r)·sqrt(sqrt(r)).
    * Row selection is [[uniform01]] vs p_g — the [[weighted]] guarantees
    * apply (content-keyed, any partitioning, any rerun) — and because the
    * per-row uniform is shared, samples at different alphas NEST: the
    * alpha = 1/4 sample ⊆ alpha = 1/2 ⊆ alpha = 3/4 (ablation-friendly).
    *
    * Scale shape: one grouped count (map-side combined, |groups| rows), a
    * broadcast join of the per-group probability, then a narrow filter —
    * the corpus itself never shuffles.
    */
  def temperatureResample(
      df: DataFrame,
      groupCols: Seq[String],
      keyCols: Seq[String],
      alphaQuarters: Int = 2
  ): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 3,
      s"alphaQuarters must be 1..3 (alpha = 1/4, 1/2, 3/4), got $alphaQuarters")
    temperatureResampleDyadic(df, groupCols, keyCols, alphaQuarters, 4)
  }

  /** Bit-portable r^(num/den) for a power-of-two `den`: write num/den in
    * binary, num/den = Σ_{j: bit_j set} 1/2^j, and multiply the matching
    * nested-sqrt terms sqrt^j(r) in FIXED ascending-j order. Every sqrt
    * and multiply is individually correctly rounded under IEEE 754, and
    * the composition order is pinned, so the result is bit-identical on
    * any engine — the property an arbitrary-exponent pow() lacks. An
    * integer part (num ≥ den) composes exact integer powers the same way.
    */
  private[graft] def dyadicPow(r: Column, num: Int, den: Int): Column = {
    require(den > 0 && (den & (den - 1)) == 0, s"den must be a power of two, got $den")
    require(num > 0, s"num must be positive, got $num")
    val k = java.lang.Integer.numberOfTrailingZeros(den)
    var acc: Column = null
    var intPart = num / den
    var whole = r
    while (intPart > 0) { // integer part: left-to-right repeated multiply
      if ((intPart & 1) == 1) acc = if (acc == null) whole else acc * whole
      intPart >>= 1
      if (intPart > 0) whole = whole * whole
    }
    var cur = r
    var j = 1
    val frac = num % den
    while (j <= k) {
      cur = sqrt(cur) // cur = r^(1/2^j)
      if (((frac >> (k - j)) & 1) == 1) acc = if (acc == null) cur else acc * cur
      j += 1
    }
    acc
  }

  /** [[temperatureResample]] on the full dyadic-rational alpha grid:
    * alpha = alphaNum/alphaDen with a power-of-two denominator (3/8, 5/8,
    * 7/16, …). Same bit-portability contract — the exponent chain
    * r^((alphaDen−alphaNum)/alphaDen) is composed from correctly-rounded
    * IEEE sqrts and multiplies in pinned order ([[dyadicPow]]) — and the
    * same shared per-row uniform, so samples across the WHOLE grid nest:
    * alpha ≤ alpha' ⇒ sample(alpha) ⊆ sample(alpha').
    */
  def temperatureResampleDyadic(
      df: DataFrame,
      groupCols: Seq[String],
      keyCols: Seq[String],
      alphaNum: Int,
      alphaDen: Int
  ): DataFrame = {
    require(groupCols.nonEmpty && keyCols.nonEmpty)
    require(alphaDen > 0 && (alphaDen & (alphaDen - 1)) == 0,
      s"alphaDen must be a power of two, got $alphaDen")
    require(alphaNum >= 1 && alphaNum <= alphaDen,
      s"alpha must be in (0, 1]: got $alphaNum/$alphaDen")
    val counts = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("__ng"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val r = col("__nmin").cast("double") / col("__ng").cast("double")
    // alpha = 1 ⇒ exponent 0 ⇒ keep everything (p = 1)
    val p = if (alphaNum == alphaDen) lit(1.0)
      else dyadicPow(r, alphaDen - alphaNum, alphaDen)
    // a NULL group value is a group like any other: the prob join must be
    // null-safe (<=>) or NULL-group rows silently vanish through the
    // equi-join while still having deflated every other group's n_min
    val probs = counts
      .withColumn("__nmin", min(col("__ng")).over(w))
      .withColumn("__p", p)
      .select(groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__g$i") } :+ col("__p"): _*)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__g$i") }
      .reduce(_ && _)
    df.join(broadcast(probs), cond)
      .filter(uniform01(keyCols.map(col)) < col("__p"))
      .drop("__p")
      .drop(groupCols.indices.map(i => s"__g$i"): _*)
  }

  /** [[temperatureResample]] at alpha = 1/2 — square-root sampling. */
  def sqrtResample(df: DataFrame, groupCols: Seq[String], keyCols: Seq[String]): DataFrame =
    temperatureResample(df, groupCols, keyCols, alphaQuarters = 2)

  /** Mixture EPOCH planning — the data-repetition side of building a
    * pretraining mixture: given a total token `budgetTokens` and integer
    * group `weights` (group → share), each group's token target is
    * floor(budget·w/Σw), met by repeating the group's documents
    * `full_epochs` = floor(target/tokens) whole times plus a partial
    * epoch worth `remainder_tokens` (Muennighoff-style "data-constrained"
    * repetition, planned not guessed).
    *
    * Every output is INTEGER arithmetic (decimal-exact products; the
    * floor division is (p − p mod s)/s, never a rounded decimal divide),
    * so the plan is bit-identical on any engine. One grouped count + one
    * broadcast join of the (tiny) weight table — the corpus never moves.
    *
    * @param weights one row per group: groupCols ++ (weight: integral).
    *                Groups absent from `weights` are excluded (plan only
    *                what you budget).
    */
  def epochPlan(
      df: DataFrame,
      groupCols: Seq[String],
      tokensCol: String,
      weights: DataFrame,
      budgetTokens: Long
  ): DataFrame = {
    require(groupCols.nonEmpty && budgetTokens > 0)
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol).cast("long")).as("tokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val wdf = weights.withColumn("__sumw", sum(col("weight").cast("long")).over(w))
    val dec = "decimal(38,0)"
    val prod = lit(budgetTokens).cast(dec) * col("weight").cast(dec)
    val target = ((prod - pmod(prod, col("__sumw").cast(dec))) / col("__sumw").cast(dec))
      .cast("long")
    // null-safe group join (<=>): a NULL group with a (NULL, weight) row
    // is a group like any other — same convention as
    // temperatureResampleDyadic's prob join
    val wAliased = wdf.select(
      groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__g$i") } ++
        Seq(col("weight"), col("__sumw")): _*)
    val joinCond = groupCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__g$i") }.reduce(_ && _)
    counts.join(broadcast(wAliased), joinCond)
      .drop(groupCols.indices.map(i => s"__g$i"): _*)
      .withColumn("target_tokens", target)
      .withColumn("full_epochs",
        when(col("tokens") > 0,
          ((col("target_tokens").cast(dec) - pmod(col("target_tokens"), col("tokens")).cast(dec)) /
            col("tokens").cast(dec)).cast("long")) // exact: numerator divides evenly (long/long would go through double)
          .otherwise(lit(0L)))
      .withColumn("remainder_tokens",
        when(col("tokens") > 0, pmod(col("target_tokens"), col("tokens"))).otherwise(lit(0L)))
      .select((groupCols.map(col) ++ Seq(col("n_docs"), col("tokens"),
        col("weight").cast("long").as("weight"), col("target_tokens"),
        col("full_epochs"), col("remainder_tokens"))): _*)
  }

  /** Materialize an [[epochPlan]]: every document of a planned group is
    * repeated `full_epochs` times (epoch = 1..full_epochs), and belongs
    * to one final PARTIAL epoch with probability remainder_tokens/tokens
    * — the shared-uniform [[weighted]] selection, so expected partial
    * tokens hit the remainder and the whole expansion is reproducible on
    * any engine/partitioning/rerun. One broadcast plan join + a narrow
    * sequence-explode: rows multiply, but nothing shuffles.
    */
  def epochExpand(
      df: DataFrame,
      groupCols: Seq[String],
      keyCols: Seq[String],
      plan: DataFrame
  ): DataFrame = {
    // the output column must not silently clobber caller data (the input
    // side of the same collision class the aliases below prevent)
    require(!df.columns.contains("epoch"),
      "input already has an 'epoch' column — rename it before expanding")
    // reserved aliases: the input frame may legitimately carry columns
    // named tokens/full_epochs/remainder_tokens (its token column often
    // IS "tokens"), and an unqualified reference after the join would
    // throw AMBIGUOUS_REFERENCE; the join itself is null-safe (<=>) so
    // NULL groups expand like any other
    val p = broadcast(plan.select(
      (groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__eg$i") } :+
        col("tokens").as("__ep_tokens") :+
        col("full_epochs").as("__ep_full") :+
        col("remainder_tokens").as("__ep_rem")): _*))
    val joinCond = groupCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__eg$i") }.reduce(_ && _)
    val inPartial = uniform01(keyCols.map(col)) <
      col("__ep_rem").cast("double") / col("__ep_tokens").cast("double")
    val nEpochs = (col("__ep_full") + when(inPartial, 1L).otherwise(0L)).cast("int")
    df.join(p, joinCond)
      .withColumn("epoch",
        explode(when(nEpochs >= 1, sequence(lit(1), nEpochs))
          .otherwise(array().cast("array<int>"))))
      .drop("__ep_tokens", "__ep_full", "__ep_rem")
      .drop(groupCols.indices.map(i => s"__eg$i"): _*)
  }

  /** Deterministic train/val/test (or any n-way) split assignment: each row
    * gets the label of the md5-range its key falls into. Cumulative
    * thresholds mean the splits are disjoint and exhaustive, and — like
    * [[deterministic]] — stable across engines, partitionings and reruns,
    * which is what makes holdout contamination checks possible at all.
    * Prefer binary-exact fractions (0.75/0.125/0.125) for cross-engine
    * threshold identity.
    */
  def splitAssign(
      df: DataFrame,
      keyCols: Seq[String],
      splits: Seq[(String, Double)],
      labelCol: String = "split"
  ): DataFrame = {
    require(splits.nonEmpty, "splits must not be empty")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val hash = substring(keyHash(keyCols.map(col)), 1, 15)
    // when(h < t1, n1).otherwise(when(h < t2, n2).otherwise(lastLabel)):
    // first matching cumulative range wins
    val firstMatch = splits.init.zip(cum.init).reverse.foldLeft(lit(splits.last._1): Column) {
      case (acc, ((name, _), c)) => when(hash < lit(hexThreshold(c)), lit(name)).otherwise(acc)
    }
    df.withColumn(labelCol, firstMatch)
  }

  /** Near-dup leakage audit of a split: given candidate/confirmed dup
    * PAIRS (any blocking's output — MinHash, SNM, embedding cosine) and
    * a per-id split assignment, count pairs per unordered split
    * combination. The (train, test) and (train, val) rows ARE the
    * leakage — a test document with a training near-twin scores as
    * memorization, not generalization; a random hash split makes such
    * pairs INEVITABLE (dups land in splits independently), which is why
    * this audit follows every split of a deduped-but-not-canonicalized
    * corpus. Two broadcast-or-shuffle id joins + a 9-cell roll-up.
    * Pairs with an id missing from `assign` count under split
    * "(unassigned)" rather than vanishing — an id outside the split
    * universe is itself a finding.
    */
  def splitLeakage(
      pairs: DataFrame,
      assign: DataFrame,
      idCol: String = "id",
      splitCol: String = "split",
      idACol: String = "id_a",
      idBCol: String = "id_b"
  ): DataFrame = {
    val miss = "(unassigned)"
    val sa = assign.select(col(idCol).as(idACol), col(splitCol).as("__sa"))
    val sb = assign.select(col(idCol).as(idBCol), col(splitCol).as("__sb"))
    pairs.select(idACol, idBCol)
      .join(sa, Seq(idACol), "left")
      .join(sb, Seq(idBCol), "left")
      .select(
        least(coalesce(col("__sa"), lit(miss)), coalesce(col("__sb"), lit(miss))).as("split_lo"),
        greatest(coalesce(col("__sa"), lit(miss)), coalesce(col("__sb"), lit(miss))).as("split_hi"))
      .groupBy("split_lo", "split_hi")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Batch-admission leakage check — the INCREMENTAL twin of
    * [[splitLeakage]]: the new leakage created by inserting `batch` into
    * `standing`, i.e. [[graft.dedup.SortedNeighborhood.incrementalPairs]]'s
    * O(touched) pair delta (exactly the union's window pairs with ≥1
    * batch side — spec'd against the rebuild) fed through the same
    * unordered split matrix. The admission question "does this new batch
    * near-dup-pair into a protected split?" costs the batch's touched
    * cells, never a standing-corpus rescan — the store-fold discipline
    * applied to the leakage audit, so it can run on every ingest.
    * Standing–standing leakage was counted when those rows were admitted;
    * admissions over a monotone ingest accumulate a SUPERSET of the
    * final rebuild's pairs (spec-asserted): a candidate stream never
    * retracts, and later insertions can push once-adjacent rows apart —
    * recall is monotone, downstream verification owns precision (the
    * [[graft.dedup.SortedNeighborhood.incrementalPairs]] contract).
    */
  def splitLeakageDelta(
      standing: DataFrame,
      batch: DataFrame,
      assign: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int,
      prefixLen: Int = 2,
      splitCol: String = "split"
  ): DataFrame =
    splitLeakage(
      graft.dedup.SortedNeighborhood.incrementalPairs(
        standing, batch, idCol, keyCol, window, prefixLen),
      assign, idCol = idCol, splitCol = splitCol)

  /** The repair for what [[splitLeakage]] finds: drop from the TRAIN
    * split every id near-dup-paired with a protected (val/test) id —
    * the Lee/Brown decontamination direction (holdouts define the
    * benchmark; train is what bends). Returns `assign` minus the leaky
    * train rows; val/test rows always pass through. One anti-join
    * against the (train-side id of each crossing pair) frame.
    */
  def scrubSplitLeakage(
      assign: DataFrame,
      pairs: DataFrame,
      trainSplit: String = "train",
      idCol: String = "id",
      splitCol: String = "split",
      idACol: String = "id_a",
      idBCol: String = "id_b"
  ): DataFrame = {
    val sa = assign.select(col(idCol).as(idACol), col(splitCol).as("__sa"))
    val sb = assign.select(col(idCol).as(idBCol), col(splitCol).as("__sb"))
    val joined = pairs.select(idACol, idBCol)
      .join(sa, Seq(idACol)).join(sb, Seq(idBCol))
    val leakyTrain = joined
      .filter(col("__sa") === trainSplit && col("__sb") =!= trainSplit)
      .select(col(idACol).as(idCol))
      .unionByName(joined
        .filter(col("__sb") === trainSplit && col("__sa") =!= trainSplit)
        .select(col(idBCol).as(idCol)))
      .distinct()
    assign.join(leakyTrain, Seq(idCol), "left_anti")
  }

  /** Leakage-safe TEMPORAL split with an embargo gap — the time-series
    * counterpart of [[splitAssign]]'s hash split: train is everything
    * STRICTLY BEFORE `cutoff − embargoSec`, test is everything AT or
    * AFTER `cutoff`, and the embargo window in between is DROPPED —
    * the standard guard against look-ahead leakage through
    * autocorrelated features (a model scored on t ≥ cutoff must not
    * have trained on rows whose windows/lags overlap the test period).
    * Pure second-precision integer comparisons on the event time —
    * deterministic, engine-exact, no shuffle (one narrow filter +
    * projection).
    */
  def temporalSplit(
      df: DataFrame,
      tsCol: String,
      cutoffSec: Long,
      embargoSec: Long,
      labelCol: String = "split"
  ): DataFrame = {
    require(embargoSec >= 0, "embargoSec must be >= 0")
    val t = col(tsCol).cast("long")
    df.withColumn(labelCol,
        when(t < cutoffSec - embargoSec, "train")
          .when(t >= cutoffSec, "test"))
      .filter(col(labelCol).isNotNull)
  }

  /** Keep the top `fraction` of rows per group by score — the classifier-
    * threshold curation step ("keep the best-scored 25% of each language").
    * Rank ties break by `keyCols`, so the kept set is deterministic on any
    * engine/partitioning; `ceil` keeps at least one row of every nonempty
    * group for fraction > 0. Prefer binary-exact fractions for cross-engine
    * threshold identity.
    *
    * Scale shape: the rank and the group count share ONE window
    * partitioning — a single shuffle on the group columns, no join-back.
    * (Unlike [[capPerGroup]]'s fixed k, the cutoff depends on the group
    * size, so map-side WindowGroupLimit pruning cannot apply.)
    */
  def topFractionByScore(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      keyCols: Seq[String],
      fraction: Double
  ): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc +: keyCols.map(col): _*)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rn") <= ceil(col("__n") * lit(fraction)))
      .drop("__rn", "__n")
  }

  /** Deterministic per-group cap: keep at most `maxPerGroup` rows per group
    * (domain/source capping — the curation step that stops one crawl host
    * from dominating a training mix). Which rows survive is decided by
    * md5-hash order of the key (ties → key order), NOT arrival order, so
    * the kept set is a stable pseudo-random per-group sample: identical on
    * any engine, partitioning or rerun, and immune to upstream sort changes.
    *
    * Scale shape: one shuffle on the group columns; Spark 4 plans the
    * row_number ≤ k filter as WindowGroupLimit (Partial → Final), pruning
    * each map partition to k rows per group BEFORE the exchange — the
    * shuffle carries at most k·partitions rows per group, not the group.
    */
  def capPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      keyCols: Seq[String],
      maxPerGroup: Int
  ): DataFrame = {
    require(maxPerGroup > 0, "maxPerGroup must be positive")
    val order = substring(keyHash(keyCols.map(col)), 1, 15).asc +: keyCols.map(col(_).asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
  }

  /** Stratified deterministic sample: per-stratum fractions (unlisted strata
    * are dropped). The per-stratum threshold is a small CASE expression —
    * still a narrow scan-level filter, no shuffle, no per-stratum pass.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      keyCols: Seq[String],
      fractions: Map[String, Double]
  ): DataFrame = {
    require(fractions.nonEmpty, "fractions must not be empty")
    val threshold = fractions.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(substring(keyHash(keyCols.map(col)), 1, 15) < threshold)
  }

  /** Deterministic weighted sampling WITHOUT replacement (A-ES,
    * Efraimidis & Spirakis 2006): per group, the k rows with the largest
    * key u^(1/w) — the exponential-race construction under which every
    * row's inclusion probability is proportional to its weight among the
    * survivors, the right primitive for "keep 50 docs per language,
    * length-weighted" mixture curation where [[weighted]]'s independent
    * coin flips can't hit an exact k.
    *
    * Engine-portable determinism: u is the house [[uniform01]] shifted to
    * (0, 2⁶⁰]/2⁶⁰ (so ln is finite), maximizing u^(1/w) ⇔ maximizing
    * ln(u)/w; ln(u) is NANO-PINNED to the integer l9 = round(1e9·ln u)
    * (the idiom every MI/entropy gate already relies on both engines
    * agreeing about), the sort key is the IEEE division l9/w, and ties —
    * including distinct (l9, w) pairs that collide as doubles — break on
    * the id columns, so both engines select the SAME k rows. Zero or
    * negative weights never sample (filtered, documented).
    *
    * Plan shape: one narrow projection + a per-group top-k window that
    * Spark plans as WindowGroupLimit (k rows per partition pre-merge,
    * never a per-group full sort materialized downstream). Emits the
    * sampled rows + l9 + rank.
    */
  def weightedSampleWithoutReplacement(
      df: DataFrame,
      groupCols: Seq[String],
      idCols: Seq[String],
      weightCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val m = conv(substring(keyHash(idCols.map(col)), 1, 15), 16, 10).cast("long")
    val u = (m + 1L).cast("double") / lit(1.152921504606846976e18) // 2^60
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy((col("__key").desc +: idCols.map(col(_).asc)): _*)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0L)
      .withColumn("__l9", round(log(u) * 1e9d).cast("long"))
      .withColumn("__key", col("__l9").cast("double") / col(weightCol).cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumnRenamed("__l9", "l9")
      .drop("__key")
  }

  /** Waterfilling budget allocation: per key, the largest integer cap
    * `c` with Σᵢ min(nᵢ, c) ≤ budget, and each row's allocation
    * min(nᵢ, c) — the standard "cap the heavy sources, keep the small
    * ones whole" mixture solver a token-budget pipeline runs before
    * sampling (the caps/temperature family's missing exact-budget
    * member: temperature reweights proportions, this one hits a hard
    * budget). Integer slack < #rows by construction (equal caps can't
    * land exactly on the budget); the deterministic fix-up is the
    * caller's policy (document: sample the slack from the capped rows).
    *
    * EXACT and deterministic: rows sort ascending by n (tie order
    * provably irrelevant — equal n swap identical cumulative terms);
    * at boundary j the candidate cap is ⌊(budget − cum_{j−1})/(k−j+1)⌋
    * in DECIMAL; the TRUE boundary is the FIRST row whose candidate
    * falls below its own n (earlier rows then can't be fully funded);
    * no such row → everything is affordable and the cap is max n.
    *
    * SCALE: two windows + one aggregation on the allocation-target
    * frame (source-cardinality-sized by contract — this runs on a
    * per-source COUNT frame, never on rows); the cap frame broadcasts
    * back.
    */
  /** Deterministic stratified k-fold assignment: within every stratum,
    * rows rank by their md5 content hash (the [[keyHash]] currency — no
    * seed, no partitioning dependence) and fold = ⌊(rank−1)·k/n⌋, so
    * fold sizes within a stratum differ by AT MOST ONE row (exact
    * balance — a hash-mod fold only balances in expectation) and every
    * stratum contributes proportionally to every fold: the
    * cross-validation / eval-shard splitter whose folds are replayable
    * from id content alone. The fold expression is pure integer
    * arithmetic ((rank−1)·k as DECIMAL, the remainder-verified floor —
    * rank·k at corpus scale clears a long times small k but not the
    * scale-6 division subtlety). Emits rank (within stratum, md5 order,
    * id tie-break) and fold ∈ [0, k).
    *
    * SCALE: one rank window per stratum over the md5 projection (the
    * A-ES shape — for hot strata, rank through [[graft.operators
    * .Quantiles]]' cellScaffold on the hash instead; the fold map is
    * rank-only so any exact-rank layout drops in).
    */
  def kFoldAssign(
      df: DataFrame,
      strataCols: Seq[String],
      idCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy((col("__h").asc +: idCols.map(col(_).asc)): _*)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
    val rkD = (col("rank") - 1L).cast(dec) * k
    val nD = col("__n").cast(dec)
    df.withColumn("__h", keyHash(idCols.map(col)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__q0", floor(rkD / nD).cast(dec))
      .withColumn("__r0", rkD - col("__q0") * nD)
      .withColumn("fold",
        when(col("__r0") < 0L, col("__q0") - 1)
          .when(col("__r0") >= nD, col("__q0") + 1)
          .otherwise(col("__q0")).cast("int"))
      .drop("__h", "__n", "__q0", "__r0")
  }

  /** Effective sample size of a weighted corpus (Kish 1965):
    * ESS = (Σw)²/Σw² per key — how many EQUAL-weight rows the weighted
    * set is statistically worth; ess_ratio = ESS/n is the mixture-audit
    * number (1 = uniform weights, → 1/n = one row carries everything —
    * a temperature/DSIR reweighting that collapses ESS has destroyed
    * its own sample). Exact DECIMAL sums emitted as digit strings; ESS
    * a fixed dag with the square on DOUBLES ((Σw)² clears DECIMAL(38,0)
    * at corpus scale). NULL/negative weights excluded; n = 0 keys emit
    * nothing. ONE aggregation exchange.
    */
  def effectiveSampleSize(
      df: DataFrame,
      keyCols: Seq[String],
      weightCol: String
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val wD = col(weightCol).cast(dec)
    df.filter(col(weightCol).isNotNull && col(weightCol) >= 0L)
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(wD).as("__sw"),
        sum(wD * wD).as("__sww"))
      .withColumn("sw", col("__sw").cast("string"))
      .withColumn("sww", col("__sww").cast("string"))
      .withColumn("ess",
        when(col("__sww") > 0L,
          col("__sw").cast("double") * col("__sw").cast("double") /
            col("__sww").cast("double")))
      .withColumn("ess_ratio", col("ess") / col("n").cast("double"))
      .drop("__sw", "__sww")
  }

  /** Hamilton (largest-remainder) apportionment: split `seats` integer
    * slots across rows PROPORTIONALLY to nᵢ — the exact-integer quota
    * solver for balanced sampling plans ([[waterfillAllocation]] caps
    * heavy rows under a budget; THIS one hands every row its
    * proportional share: per-class eval quotas, per-source epoch
    * plans). base_i = ⌊seats·nᵢ/N⌋ by exact DECIMAL floor division, the
    * L = seats − Σbase leftovers go to the L largest remainders
    * rᵢ = seats·nᵢ − baseᵢ·N (exact integers — N·fractional part, same
    * order), ties to the smaller tie column value. Σseats_i = seats
    * EXACTLY (no float quota ever drifts the total). Rows with n = 0
    * get 0 (they hold remainder 0, ranked last among ties only if L
    * reaches them — it cannot: L < #rows and every positive-n remainder
    * outranks... a zero row CAN draw a leftover only when every
    * remainder is 0, in which case L = 0). NULL/negative n excluded.
    *
    * SCALE: class-cardinality frame (counts, not rows); one rank window
    * + one agg; 1-row totals broadcast.
    */
  def apportion(
      counts: DataFrame,
      keyCols: Seq[String],
      nCol: String,
      tieCol: String,
      seats: Long
  ): DataFrame = if (keyCols.isEmpty) {
    apportion(counts.withColumn("__g1", lit(1)), Seq("__g1"), nCol, tieCol, seats)
      .drop("__g1")
  } else {
    require(seats >= 0, s"seats must be >= 0: $seats")
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val nD = col(nCol).cast(dec)
    val tot = sum(nD).over(wAll)
    val scaled = counts
      .filter(col(nCol).isNotNull && col(nCol) >= 0L)
      .withColumn("__tot", tot)
      .filter(col("__tot") > 0L)
      // exact floor: the DECIMAL division rounds at scale 6, which can
      // cross an integer boundary when N > 10⁶ — verify the candidate's
      // remainder and correct ±1 (rem must land in [0, N))
      .withColumn("__b0", floor((lit(seats).cast(dec) * nD) / col("__tot")).cast(dec))
      .withColumn("__r0", lit(seats).cast(dec) * nD - col("__b0") * col("__tot"))
      .withColumn("__bD",
        when(col("__r0") < 0L, col("__b0") - 1)
          .when(col("__r0") >= col("__tot"), col("__b0") + 1)
          .otherwise(col("__b0")))
      .withColumn("__base", col("__bD").cast("long"))
      .withColumn("__rem",
        lit(seats).cast(dec) * nD - col("__bD") * col("__tot"))
    val wRem = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*)
      .orderBy(col("__rem").desc, col(tieCol).asc)
    scaled
      .withColumn("__leftover", lit(seats) - sum("__base").over(wAll))
      .withColumn("__rk", row_number().over(wRem))
      .withColumn("seats",
        col("__base") + when(col("__rk") <= col("__leftover"), 1L).otherwise(0L))
      .withColumn("remainder", col("__rem").cast("string"))
      .drop("__tot", "__b0", "__r0", "__bD", "__base", "__rem", "__leftover", "__rk")
  }

  def waterfillAllocation(
      counts: DataFrame,
      keyCols: Seq[String],
      nCol: String,
      budget: Long
  ): DataFrame = if (keyCols.isEmpty) {
    waterfillAllocation(counts.withColumn("__g1", lit(1)), Seq("__g1"), nCol, budget)
      .drop("__g1")
  } else {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col(nCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val annotated = counts
      .filter(col(nCol).isNotNull && col(nCol) >= 0L)
      .withColumn("__j", row_number().over(wOrd).cast("long"))
      .withColumn("__cum", coalesce(
        sum(col(nCol).cast(dec)).over(
          wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L).cast(dec)))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__maxn", max(col(nCol)).over(wAll))
    val cand = floor((lit(budget).cast(dec) - col("__cum")) /
      (col("__k") - col("__j") + 1L).cast(dec)).cast("long")
    val caps = annotated
      .withColumn("__cand", cand)
      .filter(col("__cand") >= 0L && col("__cand") < col(nCol))
      .groupBy(g: _*)
      .agg(min(struct(col("__j"), col("__cand"))).as("__pick"))
      .select((g :+ col("__pick").getField("__cand").as("__cap")): _*)
    annotated
      .join(broadcast(caps), keyCols, "left_outer")
      .withColumn("cap", coalesce(col("__cap"), col("__maxn")))
      .withColumn("alloc", least(col(nCol), col("cap")))
      .drop("__j", "__cum", "__k", "__maxn", "__cap", "__cand")
  }

  /** Neyman (optimal) allocation (Neyman 1934): split a sample budget
    * across strata ∝ N_h·σ_h — the variance-MINIMIZING stratified
    * design, vs [[apportion]]'s size-proportional split: a stratum
    * that's big but homogeneous (boilerplate) needs few samples; a
    * small high-variance stratum needs many. The estimator-quality
    * companion of the sampling family.
    *
    * EXACT construction: N_h·σ_h = √(n_h·Σv² − (Σv)²) — the argument
    * is an exact DECIMAL integer (no mean subtraction in floats), the
    * weight is its √ micro-scaled to a long (round(1e6·√A), a fixed
    * dag both engines replay), and the integer seats come from
    * [[apportion]]'s largest-remainder solver (Σseats = budget
    * exactly). Strata with zero variance weigh 0 (they need ONE sample
    * in theory — take it from the apportioned plan's floor, stated);
    * all-zero-variance batteries emit nothing (nothing to allocate
    * by). Values cast long (integer-units contract).
    *
    * SCALE: one moment aggregation + the apportion bookkeeping on the
    * stratum-cardinality frame.
    */
  def neymanAllocation(
      df: DataFrame,
      keyCols: Seq[String],
      strataCol: String,
      valueCol: String,
      budget: Long
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val g = keyCols.map(col)
    val vD = col(valueCol).cast("long").cast(dec)
    val stats = df
      .filter(col(strataCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(strataCol).cast("string").as("stratum"): _*)
      .agg(count(lit(1)).as("n_h"), sum(vD).as("__s"), sum(vD * vD).as("__ss"))
      .withColumn("__a", col("n_h").cast(dec) * col("__ss") - col("__s") * col("__s"))
      .withColumn("w6", round(sqrt(col("__a").cast("double")) * 1e6d).cast("long"))
    apportion(stats, keyCols, "w6", "stratum", budget)
      .select(g :+ col("stratum") :+ col("n_h") :+
        col("__a").cast("string").as("var_num") :+ col("w6") :+
        col("seats"): _*)
  }

  /** Post-stratified mean (classical survey estimation — Cochran 1977
    * §5A): re-weight a metric measured on a NON-representative sample
    * (a labeled eval set, a judged subset) to KNOWN population strata
    * proportions — the read a raw mean gets wrong whenever the eval
    * set over-samples easy strata:
    *
    *   ȳ_post = Σ_s W_s·ȳ_s,   se² = Σ_s W_s²·s²_s/n_s
    *
    * `weights` are the population proportions (normalized internally)
    * and DEFINE the strata universe: observed strata NOT in the design
    * are excluded and counted in n_off_design (the srmCheck rule); a
    * designed stratum with NO observations makes the estimate NULL with
    * n_empty_strata > 0 (an unestimable stratum must not silently
    * reweight onto the others — flag, never guess). se is NULL when any
    * designed stratum has n < 2. Values cast long (the welchT rule);
    * per-stratum Σy/Σy² are exact DECIMAL sums; each stratum's W·ȳ and
    * W²s²/n terms are fixed dags nano-landed and summed order-free;
    * raw mean rides the same aggregation for the side-by-side. SCALE:
    * one moments aggregation (map-side combined) + a broadcast k-row
    * design frame; one row out per key set.
    */
  def postStratified(
      df: DataFrame,
      keyCols: Seq[String],
      strataCol: String,
      valueCol: String,
      weights: Seq[(String, Double)]
  ): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0d),
      s"weights must be non-empty and positive: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate stratum in weights: $weights")
    val dec = "decimal(38,0)"
    val wSum = weights.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val design = broadcast(
      weights.toDF("stratum", "__w").withColumn("__w", col("__w") / wSum))
    val g = keyCols.map(col)
    val yD = col(valueCol).cast("long").cast(dec)
    val perS = df
      .filter(col(strataCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(strataCol).cast("string").as("stratum"): _*)
      .agg(count(lit(1)).as("__n"), sum(yD).as("__sy"), sum(yD * yD).as("__syy"))
    val keyUni =
      if (keyCols.isEmpty) design
      else perS.select(g: _*).distinct().crossJoin(design)
    val joined = keyUni.join(perS, keyCols :+ "stratum", "full_outer")
      .na.fill(0L, Seq("__n"))
    val nD = col("__n").cast("double")
    val yBar = col("__sy").cast("double") / nD
    // s² from the exact numerator n·Σy² − (Σy)² over n(n−1)
    val s2 = (col("__n").cast(dec) * col("__syy") - col("__sy") * col("__sy"))
      .cast("double") / (nD * (nD - 1d))
    val designed = col("__w").isNotNull
    val term9 = when(designed && col("__n") > 0L,
      round(col("__w") * yBar * 1e9d).cast("long"))
    val var9 = when(designed && col("__n") >= 2L,
      round(col("__w") * col("__w") * s2 / nD * 1e9d).cast("long"))
    joined
      .withColumn("__t9", term9)
      .withColumn("__v9", var9)
      .groupBy(g: _*)
      .agg(
        coalesce(sum(when(designed, col("__n")).otherwise(0L)), lit(0L)).as("n_total"),
        coalesce(sum(when(designed, 1L).otherwise(0L)), lit(0L)).as("n_strata"),
        coalesce(sum(when(designed && col("__n") === 0L, 1L).otherwise(0L)),
          lit(0L)).as("n_empty_strata"),
        coalesce(sum(when(!designed, col("__n")).otherwise(0L)), lit(0L))
          .as("n_off_design"),
        sum(when(designed, col("__sy"))).as("__syT"),
        sum(when(designed && col("__n") >= 2L, 1L).otherwise(0L)).as("__nBig"),
        sum(col("__t9").cast(dec)).as("__est9"),
        sum(col("__v9").cast(dec)).as("__var9"))
      .withColumn("mean_raw",
        when(col("n_total") > 0L,
          col("__syT").cast("double") / col("n_total").cast("double")))
      .withColumn("mean_post",
        when(col("n_empty_strata") === 0L && col("n_total") > 0L,
          col("__est9").cast("double") / 1e9d))
      .withColumn("se_post",
        when(col("n_empty_strata") === 0L && col("__nBig") === col("n_strata"),
          sqrt(col("__var9").cast("double") / 1e9d)))
      .select(g :+ col("n_total") :+ col("n_strata") :+ col("n_empty_strata") :+
        col("n_off_design") :+ col("mean_raw") :+ col("mean_post") :+
        col("se_post"): _*)
  }
}
