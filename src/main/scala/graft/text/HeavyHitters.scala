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

  /** Approximate heavy hitters via a mergeable Misra-Gries summary — the
    * sketch path for vocabularies too large to shuffle exactly. The exact
    * path exchanges every distinct token's partial count; this exchanges
    * ONE ≤ sketchSize map per partition, so the shuffle cost is independent
    * of vocabulary size.
    *
    * Guarantees (classic MG, preserved by the merge): any token with true
    * frequency > N/(sketchSize+1) is present in the summary, and each
    * reported count undercounts its true frequency by at most
    * N/(sketchSize+1), where N = total token occurrences. Pick
    * sketchSize ≫ k (e.g. 100×) so the top-k ordering survives the error.
    *
    * Returns (token, est_cnt) for the k largest summary entries,
    * lexicographic tie-break like [[topTokens]].
    */
  def approxTopTokens(df: DataFrame, textCol: String, k: Int, sketchSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.expressions.Aggregator
    val agg = new Aggregator[Seq[String], Map[String, Long], Map[String, Long]] {
      override def zero: Map[String, Long] = Map.empty
      override def reduce(b: Map[String, Long], toks: Seq[String]): Map[String, Long] =
        if (toks == null) b
        else {
          val m = scala.collection.mutable.Map.empty[String, Long] ++= b
          toks.foreach { t =>
            if (t.nonEmpty) {
              m.get(t) match {
                case Some(c) => m(t) = c + 1
                case None if m.size < sketchSize => m(t) = 1L
                case None => // decrement-all step: shrink every counter by 1
                  m.mapValuesInPlace((_, c) => c - 1)
                  m.filterInPlace((_, c) => c > 0)
              }
            }
          }
          m.toMap
        }
      override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        // sum counts, then (mergeable-MG) subtract the (sketchSize+1)-th
        // largest so at most sketchSize survive — error bounds compose
        val m = scala.collection.mutable.Map.empty[String, Long] ++= a
        b.foreach { case (t, c) => m(t) = m.getOrElse(t, 0L) + c }
        if (m.size <= sketchSize) m.toMap
        else {
          val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(sketchSize)
          m.mapValuesInPlace((_, c) => c - cut)
          m.filterInPlace((_, c) => c > 0)
          m.toMap
        }
      }
      override def finish(b: Map[String, Long]): Map[String, Long] = b
      override def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
      override def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }
    val summary = df
      .select(split(lower(col(textCol)), "\\s+").as("toks"))
      .agg(udaf(agg).apply(col("toks")).as("mg"))
    summary
      .select(explode(col("mg")).as(Seq("token", "est_cnt")))
      .orderBy(col("est_cnt").desc, col("token"))
      .limit(k)
  }

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
