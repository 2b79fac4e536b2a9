package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Latest-record extraction (SCD-style dedup by primary key + ordering).
  * (reference: bdq/dataframe.py:142-182)
  *
  * Scale design: a single window shuffle on the PK; the conflict flag is
  * derived inside the SAME windowed pass (rank vs dense_rank over identical
  * ordering) — the reference does a distinct + window + self-join
  * (bdq/dataframe.py:159), i.e. three shuffles; here `max(rn) over pk` on the
  * top-dense-rank rows detects duplicated top order keys without re-joining.
  */
object LatestRecords {

  def window(pkColumns: Seq[String], orderByColumns: Seq[String]): WindowSpec =
    Window.partitionBy(pkColumns.map(col): _*)
      .orderBy(orderByColumns.map(c => col(c).desc): _*)

  /** Keep the single latest record per PK (row_number == 1). */
  def latest(df: DataFrame, pkColumns: Seq[String], orderByColumns: Seq[String]): DataFrame =
    df.withColumn("__rn", row_number().over(window(pkColumns, orderByColumns)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Latest distinct records per PK plus `__has_pk_conflict`: true when more
    * than one DISTINCT record ties for the top order-by position (all rows of
    * the winning dense-rank group are returned in that case, flagged).
    */
  def latestWithConflictFlag(
      df: DataFrame,
      pkColumns: Seq[String],
      orderByColumns: Seq[String]
  ): DataFrame = {
    val w = window(pkColumns, orderByColumns)
    val pkw = Window.partitionBy(pkColumns.map(col): _*)
    df.distinct()
      .withColumn("__rn", row_number().over(w))
      .withColumn("__dr", dense_rank().over(w))
      .filter(col("__dr") === 1)
      // >1 rows share dense_rank 1 <=> the max row_number among them is >1
      .withColumn("__has_pk_conflict", max(col("__rn")).over(pkw) > 1)
      .drop("__rn", "__dr")
  }
}
