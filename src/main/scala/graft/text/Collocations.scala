package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation extraction over adjacent-token bigrams: pointwise mutual
  * information (Church & Hanks 1990) and Dunning's log-likelihood ratio
  * (Dunning 1993) — the "which word pairs belong together" primitives a
  * corpus pipeline uses for tokenizer-merge candidates, multi-word
  * entity mining, and boilerplate detection (a template floods exactly
  * its own collocations). PMI over-rewards rare pairs; LLR is the
  * sparse-count-robust companion — ship both, read them together.
  *
  * Construction: tokens are the house whitespace split with empties
  * FILTERED BEFORE pairing (adjacency is over the cleaned sequence —
  * list_filter/filter(HOF) in both engines, so the oracle replays the
  * exact pair stream); bigrams come from a NARROW higher-order
  * projection (zip of the array with its own tail — no self-join, no
  * positional explode), then one count agg each for bigrams and
  * unigrams. p(x) uses the unigram distribution (c_x/N), p(x,y) the
  * bigram one (c_xy/B) — the standard mixed convention, stated.
  *
  * Determinism: all counts exact integers; PMI is one fixed ln dag per
  * bigram, LLR uses the PROBABILITY form G² = 2B·Σ₄ (k/B)·ln(p/(pᵣp꜀))
  * whose four terms are each bounded by ~ln B — nano-scaled to longs
  * before the (order-free) 4-term sum, so G² = 2B·(sum/1e9) is a fixed
  * dag too (the x·ln x form's terms grow like B·ln B and would overflow
  * the nano scale; the probability form is the one that nano-scales).
  * Gate both at 9 decimals.
  *
  * Scale: the bigram/unigram frames are vocabulary²-bounded counts
  * (map-side combined); the two marginal joins shuffle on token keys
  * (vocab-sized, not corpus-sized); the 1-row totals broadcast. Top-k
  * selection is TakeOrderedAndProject.
  */
object Collocations {

  /** Top-`k` bigrams with count ≥ `minCount`, scored by PMI and LLR.
    * Columns: w1, w2, c_xy, c_x, c_y, b_tot, n_tot, pmi, llr.
    */
  def collocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      k: Int = 100
  ): DataFrame = {
    val toks = df
      .filter(col(textCol).isNotNull)
      .select(expr(s"filter(split(lower($textCol), '\\\\s+'), t -> t != '')").as("__t"))
    val bigrams = toks
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))))).as("__bg"))
      .select(col("__bg.0").as("w1"), col("__bg.1").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val unigrams = toks
      .select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = bigrams.agg(sum("c_xy").as("b_tot"))
      .crossJoin(unigrams.agg(sum("c").as("n_tot")))
    // bigram-scale margins, from the bigram frame itself (vocab-sized,
    // map-side combined; the exchange under `bigrams` is reused)
    val leftMargin = bigrams.groupBy("w1").agg(sum("c_xy").as("c_x_b"))
    val rightMargin = bigrams.groupBy("w2").agg(sum("c_xy").as("c_y_b"))
    val joined = bigrams
      .filter(col("c_xy") >= minCount)
      .join(unigrams.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(unigrams.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
      .join(leftMargin, Seq("w1"))
      .join(rightMargin, Seq("w2"))
      .crossJoin(broadcast(totals))
    val bD = col("b_tot").cast("double")
    val nD = col("n_tot").cast("double")
    val pmi = log((col("c_xy").cast("double") / bD) /
      ((col("c_x").cast("double") / nD) * (col("c_y").cast("double") / nD)))
    // Dunning 2x2 over bigram events: k11 = c_xy, k12 = c_x' − c_xy,
    // k21 = c_y' − c_xy, k22 = B − c_x' − c_y' + c_xy, with the
    // marginals taken on the BIGRAM scale FROM THE BIGRAM FRAME ITSELF
    // (c_x' = Σ_w c_{xw}, the left-position margin; c_y' = Σ_w c_{wy})
    // — so the table is consistent by construction: cells are ≥ 0 with
    // no clamp, rows/columns sum to their margins, everything sums to
    // B, and the nano-scaled probability terms normalize exactly as G²
    // requires. (Unigram counts would over- or under-shoot the margin
    // whenever a word starts fewer bigrams than it occurs — sentence-
    // final words — breaking the table identity in unbounded ways.)
    def term(kc: org.apache.spark.sql.Column, rp: org.apache.spark.sql.Column,
        cp: org.apache.spark.sql.Column) = {
      val p = kc.cast("double") / bD
      when(kc > 0L, round(p * log(p / (rp * cp)) * lit(1e9d)).cast("long")).otherwise(0L)
    }
    val k11 = col("c_xy")
    val k12 = col("c_x_b") - col("c_xy")
    val k21 = col("c_y_b") - col("c_xy")
    val k22 = col("b_tot") - col("c_x_b") - col("c_y_b") + col("c_xy")
    val r1 = col("c_x_b"); val r2 = col("b_tot") - col("c_x_b")
    val c1 = col("c_y_b"); val c2 = col("b_tot") - col("c_y_b")
    val llrN9 =
      term(k11, r1.cast("double") / bD, c1.cast("double") / bD) +
        term(k12, r1.cast("double") / bD, c2.cast("double") / bD) +
        term(k21, r2.cast("double") / bD, c1.cast("double") / bD) +
        term(k22, r2.cast("double") / bD, c2.cast("double") / bD)
    joined
      .withColumn("pmi", pmi)
      .withColumn("llr", lit(2d) * bD * (llrN9.cast("double") / lit(1e9d)))
      .select("w1", "w2", "c_xy", "c_x", "c_y", "b_tot", "n_tot", "pmi", "llr")
      .orderBy(col("c_xy").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Windowed (skip-gram) co-occurrence — the word2vec-style context
    * counts adjacency-only [[collocations]] can't give: every UNORDERED
    * token pair at distance 1..`window` counts once (symmetric context,
    * canonicalized least/greatest — "deep learning" and "learning deep"
    * are the same association), scored by PMI on the pair scale
    * p(x,y) = c_xy/P against unigram marginals p(w) = c_w/N. The raw
    * count frame is the training-corpus co-occurrence matrix a
    * downstream embedding fit consumes; the PMI top-k is the audit view.
    *
    * Construction mirrors [[collocations]]: cleaned token arrays, one
    * NARROW projection per distance d (zip the array with its d-shifted
    * self — no positional explode, no self-join; fan-out ≤ window per
    * token), union, count. Determinism: exact counts, PMI one fixed ln
    * dag, top-k by (c_xy desc, w1, w2) — gate at 9 decimals. Scale: the
    * pair frame is min(vocab², corpus·window)-bounded and map-side
    * combined; marginal joins vocab-keyed; totals broadcast;
    * TakeOrdered for the view.
    */
  def cooccurrence(
      df: DataFrame,
      textCol: String,
      window: Int = 3,
      minCount: Long = 5L,
      k: Int = 100
  ): DataFrame = {
    require(window >= 1 && window <= 16, s"window out of range: $window")
    val toks = df
      .filter(col(textCol).isNotNull)
      .select(expr(s"filter(split(lower($textCol), '\\\\s+'), t -> t != '')").as("__t"))
    val pairsByD = (1 to window).map { d =>
      toks.select(explode(arrays_zip(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - d, lit(0))),
        slice(col("__t"), lit(1 + d), greatest(size(col("__t")) - d, lit(0))))).as("__pg"))
        .select(col("__pg.0").as("__a"), col("__pg.1").as("__b"))
    }
    val pairs = pairsByD.reduce(_ unionAll _)
      .select(least(col("__a"), col("__b")).as("w1"),
        greatest(col("__a"), col("__b")).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val unigrams = toks
      .select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = pairs.agg(sum("c_xy").as("p_tot"))
      .crossJoin(unigrams.agg(sum("c").as("n_tot")))
    val pD = col("p_tot").cast("double")
    val nD = col("n_tot").cast("double")
    pairs
      .filter(col("c_xy") >= minCount)
      .join(unigrams.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(unigrams.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", log((col("c_xy").cast("double") / pD) /
        ((col("c_x").cast("double") / nD) * (col("c_y").cast("double") / nD))))
      .select("w1", "w2", "c_xy", "c_x", "c_y", "p_tot", "n_tot", "pmi")
      .orderBy(col("c_xy").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
