package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit (Sweeney 2002) — the release-side privacy DQ check
  * next to [[graft.text.PiiScan]]'s content-side scan: a row is
  * k-anonymous when at least k−1 other rows share its quasi-identifier
  * combination; groups below k re-identify individuals by linkage even
  * after direct identifiers are scrubbed. Before a corpus (or its
  * metadata) ships, this is the "which attribute combinations are
  * effectively unique" report that decides suppression/generalization.
  *
  * Exact integer counts — one groupBy, replayed exactly by the q156
  * oracle. Scale shape: one aggregation on the quasi-identifier key
  * (map-side combine absorbs common combinations); the violation
  * listing is bounded by the group count, never the data.
  */
object Anonymity {

  /** Quasi-identifier groups with fewer than `k` rows, with their exact
    * sizes — the suppression worklist, smallest (riskiest) first.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k > 1, s"k must be > 1: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") < k)
  }

  /** One-row audit: group count, violating-group count, rows at risk
    * (rows living in sub-k groups), and the smallest group size.
    */
  def kAnonymitySummary(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k > 1, s"k must be > 1: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("cnt") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("cnt")).as("min_group_size"))
  }
}
