package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout: the other half of the 100 TB
  * source story next to [[Bucketing]]. Partition columns become directories,
  * so a filter on them prunes whole directories at PLANNING time — a scan of
  * one day touches 1/365th of the files regardless of table size.
  *
  * `writePartitionedByDay` derives a `part_date` column from an event-time
  * timestamp — the near-universal layout for event/fact tables.
  */
object Partitioned {

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: String = "overwrite"
  ): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must not be empty")
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
  }

  /** Partition by the calendar day of `tsCol` (adds `part_date`). */
  def writePartitionedByDay(
      df: DataFrame,
      path: String,
      tsCol: String,
      mode: String = "overwrite"
  ): Unit =
    writePartitioned(
      df.withColumn("part_date", date_format(col(tsCol), "yyyy-MM-dd")),
      path, Seq("part_date"), mode)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** True when `df`'s scan carries partition filters (directory pruning
    * happened) — the plan-level assertion that a partition-column predicate
    * did NOT degrade to a row-level filter over every file.
    */
  def isPartitionPruned(df: DataFrame): Boolean =
    "PartitionFilters: \\[[^\\]]".r
      .findFirstIn(df.queryExecution.executedPlan.toString)
      .isDefined
}
