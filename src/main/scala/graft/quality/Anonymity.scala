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

  /** t-closeness violations (Li, Li & Venkatasubramanian 2007) — the
    * privacy trio's third leg: a group can be k-anonymous AND l-diverse
    * yet still leak by SKEW — nine A's and one B in a 50/50-A/B world
    * tells an attacker plenty (the skewness attack l-diversity's
    * distinct-count cannot see). A group violates when its sensitive-
    * value distribution sits further than `t` from the corpus-wide
    * distribution; for a categorical sensitive attribute the
    * equal-ground-distance EMD is the total variation distance
    * TVD = ½·Σᵢ|pᵢ − qᵢ|.
    *
    * ENGINE-EXACT by the cross-multiplied-CDF-gap idiom
    * ([[Profiler.ksDrift]], q101): with group size n, corpus size N,
    * group value counts cᵢ and corpus value counts Cᵢ, the scaled gap
    * dist_num = Σᵢ|cᵢ·N − Cᵢ·n| is an exact long (≤ 2·n·N — fine to
    * N ≈ 2·10⁹ rows; beyond that, audit a stratified sample), the
    * threshold compare runs in decimal(38,0) (dist_num·10⁶ vs
    * 2·t_ppm·n·N — never a float rounding at the boundary; `tPpm` is t
    * in exact parts-per-million), and tvd = dist_num / (2·n·N) is ONE
    * division of exact integers. Rows with a NULL sensitive value are
    * excluded from both distributions (the countDistinct convention
    * one operator up).
    *
    * Scale shape: two aggregations on quasi / quasi+value keys
    * (map-side combine), a value-count frame and a 1-row total that
    * both BROADCAST, and the zero-count completion cross joins
    * group-sized × value-sized frames — bounded by quasi-group count ×
    * sensitive cardinality (a categorical audit input by contract),
    * never data-sized.
    */
  def tClosenessViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      tPpm: Long
  ): DataFrame = {
    require(tPpm > 0 && tPpm < 1000000L, s"tPpm must be in (0, 1e6): $tPpm")
    val base = df.select((quasiCols :+ sensitiveCol).map(col): _*)
      .filter(col(sensitiveCol).isNotNull)
    val globalCounts = base.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("__cAll"))
    val total = base.agg(count(lit(1)).as("__N"))
    val groups = base.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val groupValue = base.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    // every (group × sensitive value) cell, zero-filled — a value absent
    // from the group still contributes |0 − Cᵢ·n| to the gap. The
    // groupValue join is NULL-SAFE on the quasi keys: a group keyed by a
    // NULL quasi value (missing zip) is a group like any other — a plain
    // equi-join would never match it to its own counts and misreport a
    // perfectly conforming group at tvd = 0.5
    val gv = groupValue.toDF(
      (quasiCols.map(c => s"__gv_$c") :+ s"__gv_$sensitiveCol" :+ "__c"): _*)
    val joinCond = (quasiCols.map(c => col(c) <=> col(s"__gv_$c")) :+
      (col(sensitiveCol) <=> col(s"__gv_$sensitiveCol"))).reduce(_ && _)
    groups.crossJoin(broadcast(globalCounts))
      .join(gv, joinCond, "left")
      .drop((quasiCols.map(c => s"__gv_$c") :+ s"__gv_$sensitiveCol"): _*)
      .crossJoin(broadcast(total))
      .groupBy((quasiCols.map(col) :+ col("cnt") :+ col("__N")): _*)
      .agg(sum(abs(coalesce(col("__c"), lit(0L)) * col("__N") -
        col("__cAll") * col("cnt"))).as("dist_num"))
      .filter(col("dist_num").cast("decimal(38,0)") * lit(1000000L) >
        lit(2L).cast("decimal(38,0)") * lit(tPpm) * col("cnt") * col("__N"))
      .select((quasiCols.map(col) :+ col("cnt") :+ col("dist_num") :+
        (col("dist_num").cast("double") /
          (lit(2L) * col("cnt") * col("__N")).cast("double")).as("tvd")): _*)
  }

  /** The REPAIR for what [[kAnonymityViolations]] finds — global
    * recoding (Samarati 2001's full-domain generalization): the caller
    * supplies a LADDER of quasi-identifier projections, coarsest last
    * (e.g. full zip → zip3 → zip1 → suppressed); the operator walks the
    * ladder IN ORDER and applies the FIRST level whose smallest group
    * reaches `k` (falling back to the last level — the caller's
    * suppression floor — when none does). Global recoding keeps the
    * released schema uniform (every row generalized the same amount),
    * which is what makes the result auditable by the same
    * `kAnonymityViolations` pass — local recoding trades that for
    * utility and is a different operator.
    *
    * Deterministic and replayable: "first passing level" is a pure
    * function of the data (the q183 oracle re-derives it by computing
    * every level's min group size). Cost: one SMALL aggregation per
    * level until one passes (level count is single digits by
    * construction) + one projection; the per-level check is
    * group-count-sized after its map-side combine. Returns the
    * generalized frame with a `gen_level` literal column.
    */
  def generalizeGlobal(
      df: DataFrame,
      ladder: Seq[Seq[(String, org.apache.spark.sql.Column)]],
      k: Long
  ): DataFrame = {
    require(ladder.nonEmpty, "ladder must not be empty")
    require(k > 1, s"k must be > 1: $k")
    val names = ladder.head.map(_._1)
    require(ladder.forall(_.map(_._1) == names),
      "every ladder level must project the same output column names")
    def level(i: Int): DataFrame =
      df.select(ladder(i).map { case (n, c) => c.as(n) }: _*)
    val chosen = (0 until ladder.length - 1).find { i =>
      val r = level(i).groupBy(names.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .agg(min(col("cnt"))).head()
      r.isNullAt(0) || r.getLong(0) >= k // empty data is vacuously anonymous
    }.getOrElse(ladder.length - 1)
    level(chosen).withColumn("gen_level", lit(chosen))
  }
}
