package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables: pre-shuffle data once at write time so repeated
  * joins/aggregations on the bucket keys run with NO exchange.
  *
  * The 100 TB pattern: land fact tables bucketed (+sorted) by their join
  * key; every downstream join against a table bucketed the same way skips
  * both shuffles (and the sort, when sortBy matches). One write-time
  * shuffle amortized over every subsequent query.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      format: String = "parquet",
      mode: String = "overwrite"
  ): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must not be empty")
    var w = df.write.format(format).mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the check that a bucketed join actually got its shuffle-free plan.
    */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Join two tables previously written with [[writeBucketed]] on the same
    * keys/bucket count; with bucketing enabled Spark plans this without a
    * shuffle on either side.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
