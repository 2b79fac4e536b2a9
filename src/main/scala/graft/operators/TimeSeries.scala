package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling over event streams: truncate to a fixed step,
  * aggregate, and GAP-FILL so every (key, step) slot between a key's first
  * and last event exists — downstream models and dashboards need dense
  * series, not "no row means zero, unless the pipeline was down".
  *
  * Scale shape: the spine (one row per key × slot) is generated
  * DISTRIBUTED — `sequence()` + `explode` per key, never a driver-side
  * range — and both the spine and the counts shuffle once on
  * (key, slot) for the fill join. Slot cardinality is
  * span/step per key, so the spine is output-sized, not input-sized.
  */
object TimeSeries {

  /** Dense per-key counts at `step` granularity ("1 hour", "15 minutes",
    * …): missing slots appear with n = 0. Keys contribute slots only
    * within their own [min, max] event range.
    */
  def resampleCounts(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      step: String = "1 hour"
  ): DataFrame = {
    val unit = step.split("\\s+").last // "1 hour" -> date_trunc unit "hour"
    val slot = date_trunc(unit, col(tsCol))
    val ev = df.select(keyCols.map(col) :+ slot.as("slot"): _*)
    val counts = ev.groupBy(keyCols.map(col) :+ col("slot"): _*)
      .agg(count(lit(1)).as("__n"))
    val spine = ev.groupBy(keyCols.map(col): _*)
      .agg(min("slot").as("__lo"), max("slot").as("__hi"))
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), expr(s"interval $step"))).as("slot"): _*)
    spine.join(counts, keyCols :+ "slot", "left")
      .select(keyCols.map(col) :+ col("slot") :+
        coalesce(col("__n"), lit(0L)).as("n"): _*)
  }
}
