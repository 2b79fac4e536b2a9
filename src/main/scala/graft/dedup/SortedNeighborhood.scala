package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation (Hernández & Stolfo 1995,
  * "The merge/purge problem for large databases"): sort every record by a
  * blocking key, slide a window of size `w` down the sorted list, and emit
  * each pair that co-occurs in some window — the classic record-linkage
  * blocking family the LSH / cell / prefix / grid blockings here don't
  * cover: it finds near-misses that HASH differently but SORT adjacently
  * (typos late in the key, trailing-token noise), with candidate count
  * hard-bounded at n·(w−1) regardless of how values cluster.
  *
  * The pair set is a pure function of the TOTAL ORDER (key, id): pairs
  * (a, b) with 0 < rank_b − rank_a < w. Engine-replayable by any SQL
  * window — the q173 oracle is a rank self-join.
  *
  * Scale shape — no global sort, no inequality join:
  *   - global rank via the bucketed-rank layout ([[graft.text
  *     .PerplexitySample]] generalized to strings): cell = `prefixLen`-char
  *     key prefix (MONOTONE in the sort order, unlike a hash), per-cell
  *     counts roll into cumulative offsets on a cell-count-sized broadcast
  *     frame, rank = offset + per-cell row_number — the only sorts are
  *     per-cell. A hot PREFIX concentrates its cell's rank window on one
  *     reducer; deepen `prefixLen` (deeper = finer cells) when a 2-char
  *     prefix is hot at your corpus shape.
  *   - windows via equi-join, not a range join: each row explodes into
  *     w−1 probe ranks (rank+1 … rank+w−1) — 8-byte probes, ×(w−1) of the
  *     ID TRAFFIC only, never the payload — and an equi-join on rank pins
  *     each pair exactly once with rank_a < rank_b.
  *
  * Rows with a NULL key have no sort position and are excluded (pair them
  * through a different blocking — NULL-keyed records are exactly the ones
  * sorting cannot see). Output: (id_a, id_b, key_a, key_b). Pairs feed
  * [[ConnectedComponents]] like every other candidate source.
  */
object SortedNeighborhood {

  def candidatePairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int,
      prefixLen: Int = 2
  ): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    require(prefixLen >= 1, s"prefixLen must be >= 1: $prefixLen")
    val base = df.select(col(idCol).as("id"), col(keyCol).as("k"))
      .filter(col("k").isNotNull)
    val celled = base.withColumn("__c", substring(col("k"), 1, prefixLen))
    val counts = celled.groupBy("__c").agg(count(lit(1)).as("__cnt"))
    val offs = counts
      .withColumn("__off", sum("__cnt").over(Window.orderBy("__c")) - col("__cnt"))
      .select("__c", "__off")
    val ranked = celled.join(broadcast(offs), Seq("__c"))
      .withColumn("rank",
        col("__off") + row_number().over(
          Window.partitionBy("__c").orderBy(col("k"), col("id"))))
      .select(col("id"), col("k"), col("rank"))
    val probes = ranked.select(col("id").as("id_a"), col("k").as("key_a"),
        explode(sequence(col("rank") + 1, col("rank") + (window - 1))).as("rank"))
    probes.join(ranked.select(col("id").as("id_b"), col("k").as("key_b"), col("rank")),
        Seq("rank"))
      .select("id_a", "id_b", "key_a", "key_b")
  }
}
