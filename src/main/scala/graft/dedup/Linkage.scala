package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969)
  * over sorted-neighborhood candidate pairs — the DECISION layer that
  * completes the repo's merge/purge pipeline: [[SortedNeighborhood]]
  * blocks (q173), [[SortedNeighborhood.editDistancePairs]] verifies
  * typo-shaped keys (q195), and this scores each candidate's field
  * AGREEMENT VECTOR into link / possible / non-link.
  *
  * Model: per field f, the classic log-likelihood weights
  * w_agree = ln(m_f/u_f), w_disagree = ln((1−m_f)/(1−u_f)), where m_f
  * (P(agree | same entity)) is a PINNED prior and u_f
  * (P(agree | random pair)) is ESTIMATED FROM THE DATA as the exact
  * collision probability of the field's value distribution:
  * u_f = Σ_v c_v(c_v−1) / N(N−1) — the Simpson-λ numerator
  * (integer-exact, DECIMAL(38,0) at corpus scale), clamped to
  * [1, den−1] in the numerator so a degenerate field (all-unique or
  * single-valued) yields finite weights instead of ±∞.
  *
  * Determinism: u is a ratio of exact integers; each of the 2·|fields|
  * weights is ONE ln of a double ratio, nano-scaled to a long (the
  * Association discipline), and a pair's score is the sum of |fields|
  * nano-ints — order-free exact. The link/non-link decision compares
  * score_n9 to pinned nano thresholds: INTEGER comparisons, so the
  * decision column is engine-exact, never a float boundary call.
  *
  * Scale: u estimation is one value-count agg per field (map-side
  * combined); the 1-row weight frame broadcasts onto the bounded
  * candidate-pair stream. Nothing here is corpus-pair-sized — the
  * blocking owns that bound (n·(window−1) candidates).
  */
object Linkage {

  private val dec = "decimal(38,0)"

  /** Exact-collision u-probability state for one field: 1-row frame
    * (u_num DECIMAL clamped into [1, u_den−1], u_den DECIMAL), from the
    * field's value distribution. NULL values are a value (two missing
    * fields agree — standard FS practice keeps the mass).
    */
  def uProbability(df: DataFrame, fieldCol: String): DataFrame = {
    val counts = df.groupBy(col(fieldCol).cast("string").as("__v"))
      .agg(count(lit(1)).as("__c"))
    counts.agg(
      sum(col("__c").cast(dec) * (col("__c") - 1L).cast(dec)).as("__raw"),
      sum(col("__c")).as("__n"))
      .select(
        least(
          greatest(col("__raw"), lit(1L).cast(dec)),
          (col("__n").cast(dec) * (col("__n") - 1L).cast(dec)) - 1L)
          .as("u_num"),
        (col("__n").cast(dec) * (col("__n") - 1L).cast(dec)).as("u_den"))
  }

  /** Score sorted-neighborhood candidate pairs by the Fellegi–Sunter
    * agreement-vector weights over `fields` (exact, null-safe equality
    * per field). `m` is the pinned per-field P(agree | match) prior;
    * thresholds are in nano-nats (score_n9 ≥ upperN9 → "link",
    * ≤ lowerN9 → "non_link", else "possible").
    *
    * Emits per candidate pair: id_a, id_b, one boolean agree_<field>
    * per field, score (= score_n9/1e9, exact by construction), and the
    * decision.
    */
  def fellegiSunter(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      fields: Seq[String],
      window: Int = 4,
      prefixLen: Int = 3,
      m: Double = 0.95,
      upperN9: Long = 4_000_000_000L,  //  4.0 nats
      lowerN9: Long = -4_000_000_000L  // −4.0 nats
  ): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(m > 0.0 && m < 1.0, s"m must be in (0,1): $m")
    val pairs = SortedNeighborhood.candidatePairs(df, idCol, keyCol, window, prefixLen)
      .select("id_a", "id_b")
    val sideA = df.select((col(idCol).as("id_a") +:
      fields.map(f => col(f).cast("string").as(s"__a_$f"))): _*)
    val sideB = df.select((col(idCol).as("id_b") +:
      fields.map(f => col(f).cast("string").as(s"__b_$f"))): _*)
    // ONE 1-row frame with every field's nano weights, broadcast onto
    // the pair stream (u ratios stay exact integer casts until the ln)
    val weightFrame = fields.map { f =>
      uProbability(df, f).select(
        (round(log(lit(m) * col("u_den").cast("double") / col("u_num").cast("double")) * 1e9d))
          .cast("long").as(s"__wa_$f"),
        (round(log(lit(1.0 - m) * col("u_den").cast("double") /
          (col("u_den") - col("u_num")).cast("double")) * 1e9d))
          .cast("long").as(s"__wd_$f"))
    }.reduce(_.crossJoin(_))
    val scored = pairs
      .join(sideA, Seq("id_a"))
      .join(sideB, Seq("id_b"))
      .crossJoin(broadcast(weightFrame))
    val agreeCols = fields.map(f => col(s"__a_$f") <=> col(s"__b_$f"))
    val scoreN9 = fields.zip(agreeCols).map { case (f, agrees) =>
      when(agrees, col(s"__wa_$f")).otherwise(col(s"__wd_$f"))
    }.reduce(_ + _)
    scored
      .select((Seq(col("id_a"), col("id_b")) ++
        fields.zip(agreeCols).map { case (f, a) => a.as(s"agree_$f") } :+
        scoreN9.as("__s")): _*)
      .withColumn("score", col("__s").cast("double") / 1e9d)
      .withColumn("decision",
        when(col("__s") >= upperN9, lit("link"))
          .when(col("__s") <= lowerN9, lit("non_link"))
          .otherwise(lit("possible")))
      .drop("__s")
  }
}
