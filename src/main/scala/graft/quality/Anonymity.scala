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

  /** l-diversity violations (Machanavajjhala et al. 2007) — k-anonymity's
    * necessary complement: a quasi group can be large (k-anonymous) yet
    * reveal everyone's sensitive value when all its rows SHARE that
    * value (the homogeneity attack). Groups whose sensitive column
    * carries fewer than `l` distinct values, with size and distinct
    * count — exact integers, one aggregation on the quasi key.
    */
  def lDiversityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long
  ): DataFrame = {
    require(l > 1, s"l must be > 1: $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
  }
}
