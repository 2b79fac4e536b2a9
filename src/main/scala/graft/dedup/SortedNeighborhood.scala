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

  /** Driver-side string ordering that matches Spark's UTF8String binary
    * comparison (UTF-8 byte order = code-POINT order). Scala's default
    * String ordering compares UTF-16 code UNITS, which disagrees for
    * strings mixing U+E000–U+FFFF with supplementary-plane chars — the
    * neighbor-cell walk in [[incrementalPairs]] would slice the wrong
    * adjacent cells there and lose/gain boundary pairs vs the rebuild
    * (regression spec: the U+E000-vs-U+10000 trap in DedupSpec).
    */
  private[dedup] val utf8Order: Ordering[String] =
    (a: String, b: String) => java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

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

  /** Merge/purge COMPLETED — blocking + verify in one call (Hernández &
    * Stolfo's pipeline shape: the window proposes, a distance decides):
    * [[candidatePairs]] filtered to pairs within `maxDist` Levenshtein
    * edits, the standard record-linkage verify for exactly the
    * typo-shaped near-misses this blocking is built to surface. The
    * distance is Spark's codegen'd builtin — INTEGER, unit-cost, and
    * definitionally identical in DuckDB, so the q195 gate hashes every
    * surviving pair's distance. Verify cost is per-candidate (bounded by
    * n·(w−1)); `dist` is appended for downstream thresholds/weights.
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int,
      prefixLen: Int = 2,
      maxDist: Int = 2
  ): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    candidatePairs(df, idCol, keyCol, window, prefixLen)
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxDist)
  }

  /** Incremental fold — the NEW candidate pairs created by inserting
    * `batch` into `standing`: exactly the (standing ∪ batch) window pairs
    * with ≥1 batch side (spec-asserted against the full rebuild).
    * Standing–standing pairs were emitted when the standing corpus was
    * processed; pairs are a monotone stream into
    * [[ConnectedComponents.incrementalComponents]], so that is the
    * complete delta. (Insertions can also push old neighbors APART — a
    * candidate stream never retracts; downstream verification owns
    * precision, the blocking owns recall.)
    *
    * Cost is O(touched), never O(standing): a batch row reaches at most
    * w−1 positions past its own PREFIX CELL, so only the batch's cells
    * plus the w−1 sort-adjacent rows on each side of every touched cell
    * (walked across as many neighbor cells as it takes — a tiny cell
    * doesn't truncate the reach) are ranked; each such contiguous
    * segment's local order equals the global order, so distances are
    * exact. The walk runs on the per-cell COUNT list (cell-count-sized,
    * the bounded-collect contract); the standing corpus is semi-joined
    * map-side to the needed cells before any window.
    */
  def incrementalPairs(
      standing: DataFrame,
      batch: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int,
      prefixLen: Int = 2
  ): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    val spark = standing.sparkSession
    import spark.implicits._
    def prep(df: DataFrame, isBatch: Boolean) =
      df.select(col(idCol).as("id"), col(keyCol).as("k"))
        .filter(col("k").isNotNull)
        .withColumn("is_batch", lit(isBatch))
        .withColumn("__c", substring(col("k"), 1, prefixLen))
    val batchPrepped = prep(batch, isBatch = true)
    val all = prep(standing, isBatch = false).unionByName(batchPrepped)
    // sorted (cell, rows) list + the batch's touched set — both bounded
    // by cell cardinality, not data (one prep of the batch feeds both)
    val cellCounts = all.groupBy("__c").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)(utf8Order)
    val touched = batchPrepped.select("__c").distinct()
      .collect().map(_.getString(0)).toSet
    val idx = cellCounts.map(_._1).zipWithIndex.toMap
    // per segment (= touched cell): itself in full, plus tail/head slices
    // of as many preceding/following cells as the w−1 reach needs
    val mapping = touched.toSeq.sorted(utf8Order).flatMap { t =>
      val self = Seq((t, t, "all", 0L))
      def walk(dir: Int, side: String) = {
        var need = (window - 1).toLong
        var i = idx(t) + dir
        val out = Seq.newBuilder[(String, String, String, Long)]
        while (need > 0 && i >= 0 && i < cellCounts.length) {
          val (c, n) = cellCounts(i)
          val take = math.min(need, n)
          out += ((t, c, side, take))
          need -= take
          i += dir
        }
        out.result()
      }
      self ++ walk(-1, "tail") ++ walk(+1, "head")
    }
    val mapDf = broadcast(mapping.toDF("seg", "__c", "side", "take"))
    // rank within each needed cell once (asc + desc), slice to the takes
    val needed = all.join(mapDf.select("__c").distinct(), Seq("__c"), "left_semi")
    val cw = Window.partitionBy("__c").orderBy(col("k"), col("id"))
    val sliced = needed
      .withColumn("__ra", row_number().over(cw))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__c")))
      .join(mapDf, Seq("__c"))
      .filter(col("side") === "all" ||
        (col("side") === "head" && col("__ra") <= col("take")) ||
        (col("side") === "tail" && col("__n") - col("__ra") < col("take")))
    // each segment is globally contiguous: local rank == global order
    val sw = Window.partitionBy("seg").orderBy(col("k"), col("id"))
    val ranked = sliced.withColumn("rank", row_number().over(sw))
      .select(col("seg"), col("id"), col("k"), col("is_batch"), col("rank"))
    val probes = ranked.select(col("seg"), col("id").as("id_a"), col("k").as("key_a"),
        col("is_batch").as("ba"),
        explode(sequence(col("rank") + 1, col("rank") + (window - 1))).as("rank"))
    probes.join(ranked.select(col("seg"), col("id").as("id_b"), col("k").as("key_b"),
          col("is_batch").as("bb"), col("rank")),
        Seq("seg", "rank"))
      .filter(col("ba") || col("bb"))
      .select("id_a", "id_b", "key_a", "key_b")
      .dropDuplicates("id_a", "id_b")
  }
}
