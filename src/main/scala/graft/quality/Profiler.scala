package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler: long-form (column, metric, value) summary of a
  * dataset — the "first look" a data-quality workflow takes before wiring
  * rules (complements `RuleEngine`; the reference's mission is DQ checks,
  * profiling is how those checks get chosen).
  *
  * Scale design: ALL columns and ALL metrics are computed in a single
  * aggregation over one scan. Exact `count(distinct)` over several columns
  * makes Catalyst plan a single Expand + two-phase aggregate (same shape as
  * grouping sets) — still one scan, one shuffle of partially-aggregated
  * state. For a cheaper scan at extreme cardinality, `profileApprox` swaps
  * exact distincts for HyperLogLog++ (`approx_count_distinct`), which keeps
  * the aggregation fully partial-aggregatable (no Expand at all).
  *
  * Values surface as strings so one long-form schema covers every input
  * type; numeric/timestamp callers format upstream if they need
  * engine-portable text (see q40 in SparkEntry).
  */
object Profiler {

  final val Metrics = Seq("non_nulls", "nulls", "distinct", "min", "max")

  private def aggsFor(c: String, distinctAgg: Column => Column): Seq[Column] = Seq(
    count(col(c)).cast("string").as(s"${c}__non_nulls"),
    sum(when(col(c).isNull, 1L).otherwise(0L)).cast("string").as(s"${c}__nulls"),
    distinctAgg(col(c)).cast("string").as(s"${c}__distinct"),
    min(col(c)).cast("string").as(s"${c}__min"),
    max(col(c)).cast("string").as(s"${c}__max")
  )

  private def longForm(wide: DataFrame, cols: Seq[String]): DataFrame = {
    // stack(n, 'col', 'metric', value...) unpivots the single wide row;
    // this runs on one row, so the reshape is free.
    val cells = cols.flatMap { c =>
      Metrics.flatMap(m => Seq(s"'$c'", s"'$m'", s"`${c}__$m`"))
    }
    wide.selectExpr(
      s"stack(${cols.size * Metrics.size}, ${cells.mkString(", ")}) as (column, metric, value)"
    )
  }

  /** Exact profile: one scan, one shuffle (Expand for multi-column exact
    * distinct counts).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must not be empty")
    val aggs = cols.flatMap(c => aggsFor(c, countDistinct(_)))
    longForm(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** HLL++ profile for very wide/high-cardinality tables: no Expand, every
    * aggregate is partial-aggregatable map-side, `rsd` bounds the distinct
    * estimate error.
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "cols must not be empty")
    val aggs = cols.flatMap(c => aggsFor(c, approx_count_distinct(_, rsd)))
    longForm(df.agg(aggs.head, aggs.tail: _*), cols)
  }
}
