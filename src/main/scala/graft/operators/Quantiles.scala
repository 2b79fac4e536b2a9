package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact rank-selection quantiles per group: lower median and p90 by
  * integer rank arithmetic — no interpolation, so any ANSI engine computes
  * the identical value (interpolating medians differ across engines).
  *
  * One shuffle on the group keys; rank + group count share the window
  * partitioning; the final conditional aggregate reuses the same keys, so
  * AQE plans no extra exchange.
  */
object Quantiles {

  def exactQuantiles(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      tieBreakCol: String
  ): DataFrame = {
    val part = Window.partitionBy(keyCols.map(col): _*)
    val ordered = part.orderBy(col(valueCol), col(tieBreakCol))
    df.select((keyCols :+ valueCol :+ tieBreakCol).map(col): _*)
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(part))
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(col("__n")).as("n"),
        max(when(col("__rn") === expr("(__n + 1) div 2"), col(valueCol))).as("p50"),
        max(when(col("__rn") === expr("(9 * __n + 9) div 10"), col(valueCol))).as("p90")
      )
  }
}
