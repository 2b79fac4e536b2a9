package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact heavy hitters (most frequent items) over tokenized text — corpus
  * vocabulary skew is the first thing a training-data pipeline inspects
  * (boilerplate detection, stopword calibration, contamination tells).
  *
  * Scale design: explode→count is the textbook two-phase aggregation —
  * partial map-side counts absorb the token explosion before the single
  * shuffle, and the global top-k runs as `TakeOrderedAndProject` (per
  * partition top-k, then a driver-side merge of k·partitions rows), never a
  * global sort. Ties break lexicographically so results are deterministic
  * and engine-portable. The grouped variant windows within each group on
  * the same shuffle.
  */
object HeavyHitters {

  /** (token, cnt) rows for the k most frequent whitespace tokens. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Per-group top-k: (group, token, cnt, rank) via one shuffle on
    * (group, token) + a windowed rank that Spark 4 prunes with
    * WindowGroupLimit before the rank's exchange.
    */
  def topTokensByGroup(df: DataFrame, groupCol: String, textCol: String, k: Int): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(groupCol, "token")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCol).orderBy(col("cnt").desc, col("token"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
