package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (large) side, replicate the
  * other side across the salt domain, join on (keys + salt).
  *
  * AQE's skew-join handles most cases at runtime; explicit salting remains
  * the tool when a single hot key exceeds what split-and-replicate AQE
  * can absorb (e.g. a null-key flood or one giant customer at 100 TB), or
  * when the join is followed by an aggregation that must stay co-partitioned.
  */
object Skew {

  val SaltCol = "__graft_salt"

  /** Deterministic per-row salt in [0, saltFactor): hash of the whole row.
    * (Deterministic rather than rand() so retried tasks produce identical
    * output — a correctness requirement under speculative execution.)
    */
  private def rowSalt(df: DataFrame, saltFactor: Int) =
    pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(saltFactor.toLong)).cast("int")

  /** Inner/left join `skewed` (large, hot-keyed) with `other` (small enough
    * to replicate saltFactor times) on `keys`.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported joinType for salting: $joinType")
    val l = skewed.withColumn(SaltCol, rowSalt(skewed, saltFactor))
    val r = other.withColumn(SaltCol, explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Skewed-key report: keys whose row count exceeds `threshold` — feed of
    * the decision "which keys need salting/isolation".
    */
  def hotKeys(df: DataFrame, keys: Seq[String], threshold: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)

  /** Join-skew DECISION report — the measurement [[hotKeys]]/[[saltedJoin]]
    * act on: the top-`topK` heaviest key values with exact row counts,
    * corpus share in ppm, and the saltFactor that would bound each key's
    * reducer load at `targetPerTask` rows. All integer arithmetic
    * (share = cnt·10⁶ div total; salt = ceil-div), so the q150 oracle
    * replays every number exactly. At 100 TB this is the query you run
    * BEFORE a big join: it tells you whether AQE's split-and-replicate
    * will cope or a key needs explicit salting/isolation.
    *
    * Scale shape: one groupBy over the input (map-side combine absorbs
    * the hot keys themselves), then a TakeOrdered top-k and a 1-row
    * total — the counts frame feeds both, so it persists here (it is
    * distinct-keys-sized; MEMORY_AND_DISK spills gracefully if the key
    * space is huge). CACHE LIFECYCLE: the cached counts back the
    * returned lazy plan, so they cannot be unpersisted here; they live
    * until the session drops them (LRU) or the caller runs
    * `spark.catalog.clearCache()` between unrelated jobs — the Bench
    * A/B discipline. Same contract as [[graft.operators.Sketches
    * .hllOverlap]] and [[graft.graph.Harmonic.sampledHarmonic]].
    */
  def skewProfile(
      df: DataFrame,
      keys: Seq[String],
      targetPerTask: Long,
      topK: Int
  ): DataFrame = {
    require(targetPerTask > 0, "targetPerTask must be positive")
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    counts.count() // materialize once for both consumers
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val top = counts
      .orderBy((col("cnt").desc +: keys.map(col)): _*) // pinned tie-break
      .limit(topK)
    // integer `div` (truncation == floor for non-negative operands) on
    // both engines — a float-division floor could round across the
    // boundary and diverge by one
    top.crossJoin(broadcast(total))
      .select((keys.map(col) :+
        col("cnt") :+
        expr("(cnt * 1000000) div __total").as("share_ppm") :+
        greatest(lit(1L),
          expr(s"(cnt + ${targetPerTask - 1}) div $targetPerTask")).as("recommended_salt")): _*)
  }

  /** Pre-join cardinality + skew forecast — the other number you want
    * BEFORE a 100 TB join: inner-join output size is EXACTLY
    * Σ_k cntA(k)·cntB(k), computable from two per-key count frames
    * whose join is KEYS-sized, not data-sized. Returns one row:
    * n_matching_keys, join_rows (the exact future output size), and
    * max_key_rows (the largest single key's contribution — the reducer
    * that will hurt; feed it to [[skewProfile]]/[[saltedJoin]] if it
    * dwarfs the rest). All exact integers; the q155 oracle recomputes
    * the products AND runs the real join to confirm `join_rows` is a
    * forecast, not an estimate.
    */
  def joinCardinality(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val ca = a.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__ca"))
    val cb = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cb"))
    ca.join(cb, keys)
      .select((col("__ca") * col("__cb")).as("__prod"))
      .agg(
        count(lit(1)).as("n_matching_keys"),
        coalesce(sum(col("__prod")), lit(0L)).as("join_rows"),
        coalesce(max(col("__prod")), lit(0L)).as("max_key_rows"))
  }

  /** Salted two-phase aggregation for hot grouping keys.
    *
    * Spark's map-side partial aggregation already absorbs skew for
    * algebraic aggregates — UNLESS the partial state itself is large
    * (collect_list/set, exact distincts) or the hot key's groups overflow
    * the partial hash map and fall through to the exchange. Salting splits
    * each hot key across `saltFactor` reducers in phase 1, then phase 2
    * merges the per-salt partials on the real key — the second shuffle
    * carries keyCount × saltFactor rows, negligible vs the skewed input.
    *
    * `aggs` maps output column → (phase1 aggregate, phase2 merge
    * aggregate), e.g. "n" -> (count(lit(1)), sum). sum/min/max merge with
    * themselves; count merges with sum.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      aggs: Map[String, (org.apache.spark.sql.Column, org.apache.spark.sql.Column => org.apache.spark.sql.Column)]
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(aggs.nonEmpty, "aggs must not be empty")
    val ordered = aggs.toSeq
    val phase1 = df
      .withColumn(SaltCol, rowSalt(df, saltFactor))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(ordered.head._2._1.as(s"__p_${ordered.head._1}"),
        ordered.tail.map { case (n, (a, _)) => a.as(s"__p_$n") }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(ordered.head._2._2(col(s"__p_${ordered.head._1}")).as(ordered.head._1),
        ordered.tail.map { case (n, (_, m)) => m(col(s"__p_$n")).as(n) }: _*)
  }
}
