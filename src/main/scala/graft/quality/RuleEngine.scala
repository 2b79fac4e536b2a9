package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL-predicate data-quality rule engine — the "checks at scale" core of
  * the reference's mission (bdq validates datasets via SQL checks; this is
  * that idea as a first-class one-pass operator).
  *
  * ALL rules evaluate in a SINGLE aggregation pass over the data: one scan,
  * map-side partial aggregation, no per-rule jobs. A NULL predicate counts
  * as a failure (unknown quality is bad quality).
  */
object RuleEngine {

  final case class Rule(name: String, predicate: String)

  // rule results carry positional internal aliases (__r0, __r1, …): a user
  // rule NAME may contain backticks/dots that col(name) cannot re-parse —
  // the name surfaces only as a literal label, never as an attribute
  private def failCol(r: Rule, i: Int): Column = {
    val p = expr(r.predicate)
    sum(when(p.isNull || !p, 1L).otherwise(0L)).as(s"__r$i")
  }

  /** Long-form results: (rule, n_rows, n_failed, failure_rate) — one row
    * per rule, computed in one scan.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "rules must not be empty")
    require(rules.map(_.name).distinct.length == rules.length, "rule names must be unique")
    val agged = df.agg(count(lit(1)).as("__n"),
      rules.zipWithIndex.map { case (r, i) => failCol(r, i) }: _*)
    agged.select(
      col("__n"),
      explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"__r$i").as("n_failed")) }: _*)).as("e")
    ).select(
      col("e.rule").as("rule"),
      col("__n").as("n_rows"),
      // sum over zero rows is NULL: an empty table has zero failures
      coalesce(col("e.n_failed"), lit(0L)).as("n_failed"),
      when(col("__n") > 0, coalesce(col("e.n_failed"), lit(0L)) / col("__n"))
        .otherwise(lit(0.0)).as("failure_rate")
    )
  }

  /** Close the profile → rules loop: derive candidate DQ rules from a
    * [[Profiler.profile]] snapshot of a KNOWN-GOOD load, to validate the
    * next load with. Suggested per column:
    *  - `NOT NULL` when the baseline had zero nulls;
    *  - `BETWEEN min AND max` (with `relax`-widened bounds) when the
    *    baseline min/max parse as numbers.
    * The profile is a few rows per column, so this is driver-side
    * bookkeeping — the expensive scan already happened when the profile
    * was taken. Review before enforcing: a baseline is evidence, not a
    * contract.
    */
  def suggestRules(profile: DataFrame, relax: Double = 0.0): Seq[Rule] = {
    val byColumn = profile
      .select(col("column"), col("metric"), col("value"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getString(2)).toMap)
    // non-finite bounds ("NaN"/"Infinity" parse as Double) would emit a
    // degenerate BETWEEN rule — treat them as "not numeric"
    def num(s: String): Option[Double] =
      try Option(s).map(_.toDouble).filter(d => !d.isNaN && !d.isInfinite)
      catch { case _: NumberFormatException => None }
    byColumn.toSeq.sortBy(_._1).flatMap { case (c, m) =>
      // Profiler.profile supports hostile column names (backticks/dots/
      // quotes), so the quoting here must too: a backtick inside a name is
      // escaped by doubling it, same as Spark's own quoteIfNeeded
      val q = s"`${c.replace("`", "``")}`"
      val notNull = m.get("nulls").filter(_ == "0")
        .map(_ => Rule(s"${c}_not_null", s"$q IS NOT NULL"))
      val range = for {
        lo <- m.get("min").flatMap(num)
        hi <- m.get("max").flatMap(num)
        pad = (hi - lo).abs * relax
      } yield Rule(s"${c}_range", s"$q BETWEEN ${lo - pad} AND ${hi + pad}")
      notNull.toSeq ++ range.toSeq
    }
  }

  /** [[validate]] per group: one grouped aggregation pass evaluates every
    * rule for every group — the partitioned-DQ shape ("which source/day
    * went bad?"). Still ONE scan with map-side partial aggregation; the
    * long-form explode runs on |groups| rows, not the table.
    */
  def validateByGroup(df: DataFrame, groupCols: Seq[String], rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "rules must not be empty")
    require(rules.map(_.name).distinct.length == rules.length, "rule names must be unique")
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        rules.zipWithIndex.map { case (r, i) => failCol(r, i) }: _*)
    agged.select(
      groupCols.map(col) :+ col("__n") :+
        explode(array(rules.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"), col(s"__r$i").as("n_failed")) }: _*)).as("e"): _*
    ).select(
      groupCols.map(col) ++ Seq(
        col("e.rule").as("rule"),
        col("__n").as("n_rows"),
        col("e.n_failed").as("n_failed"),
        (col("e.n_failed") / col("__n")).as("failure_rate")
      ): _*
    )
  }

  /** Up to `n` failing rows for one rule (triage). */
  def failedSamples(df: DataFrame, rule: Rule, n: Int = 10): DataFrame = {
    val p = expr(rule.predicate)
    df.filter(p.isNull || !p).limit(n)
  }

  /** Functional-dependency check: determinant values for which the
    * dependent column set takes MORE than one distinct value — i.e. the
    * witnesses that `determinants → dependents` does NOT hold ("one
    * customer, two birth dates"). One hash aggregation with a distinct
    * count (Catalyst plans Expand + two-phase agg, one scan); empty
    * result = the dependency holds.
    */
  def fdViolations(
      df: DataFrame,
      determinants: Seq[String],
      dependents: Seq[String]
  ): DataFrame = {
    require(determinants.nonEmpty && dependents.nonEmpty, "column sets must not be empty")
    df.groupBy(determinants.map(col): _*)
      .agg(countDistinct(struct(dependents.map(col): _*)).as("n_dependent_values"))
      .filter(col("n_dependent_values") > 1)
  }

  /** Throw when any rule exceeds its allowed failure rate. */
  def enforce(df: DataFrame, rules: Seq[Rule], maxFailureRate: Double = 0.0): Unit = {
    val bad = validate(df, rules)
      .filter(col("failure_rate") > maxFailureRate)
      .collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r => s"${r.getString(0)}: ${r.getLong(2)}/${r.getLong(1)} failed").mkString("; ")
      throw new IllegalStateException(s"data-quality rules violated: $detail")
    }
  }
}
