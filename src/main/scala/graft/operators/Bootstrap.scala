package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap (Chamandy, Muralidharan, Najmi & Naidu 2012, "Estimating
  * uncertainty for massive data streams" — Google's distributed bootstrap):
  * the classical bootstrap resamples n rows WITH replacement, which a
  * distributed engine can't do (a multinomial draw needs global coordination);
  * the Poisson approximation gives each row an INDEPENDENT Poisson(1) weight
  * per replicate — no coordination, one pass, and for large n the replicate
  * distribution converges to the true bootstrap's.
  *
  * DETERMINISTIC by the repo's md5-uniform idiom ([[Sampling.uniform01]]):
  * the weight of (row, replicate) is the Poisson(1) inverse CDF applied to
  * the row-and-replicate-keyed 60-bit uniform — content-keyed, so every
  * engine, partitioning and rerun draws the identical resamples and the q179
  * gate hashes every replicate. The CDF thresholds are PINNED double
  * literals (the q149 pinned-constant rule: constants are data, only runtime
  * transcendentals are banned); the inverse CDF
  * enumerates k = 0..9 and collapses the remaining tail (P < 1.2e-7) to
  * weight 10 — at that probability a draw shifts one row's weight by one
  * unit in one replicate of a trillion-row corpus.
  *
  * Scale shape: the ×B row explosion collapses MAP-SIDE — each partition
  * reduces to B partial (Σw, Σw·x) rows before the only shuffle, so the
  * exchange carries B·partitions tiny rows regardless of corpus size.
  * `valueCol` follows the integer-unit discipline (cents/ppm — q177): sums
  * stay exact in DECIMAL(38,0) and each replicate mean is ONE division.
  */
object Bootstrap {

  /** P[Poisson(1) ≤ k] for k = 0..9, as pinned literals. */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
    0.9999998885745216)

  /** Poisson(1) weight of `u` ∈ [0, 1) by inverse CDF. */
  def poissonInverse(u: Column): Column =
    PoissonCdf.zipWithIndex.reverse.foldLeft(lit(10): Column) {
      case (acc, (c, k)) => when(u < lit(c), lit(k)).otherwise(acc)
    }

  /** Per-replicate exact moments of `valueCol` under Poisson(1) resampling:
    * one row per replicate b ∈ [0, reps) with (n_drawn = Σw,
    * sum_v = Σ w·x in DECIMAL(38,0), mean = sum_v / n_drawn — one IEEE
    * division, NULL for an empty resample). NULL values are excluded
    * before weighting (they can't join a mean).
    */
  def replicateMeans(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      reps: Int
  ): DataFrame = {
    require(reps >= 2 && reps <= 4096, s"reps out of range: $reps")
    val dec = "decimal(38,0)"
    val withB = df.select((keyCols :+ valueCol).map(col): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("b", explode(sequence(lit(0), lit(reps - 1))))
    val u = Sampling.uniform01((keyCols.map(col) :+ col("b")))
    withB
      .withColumn("__w", poissonInverse(u))
      .groupBy("b")
      .agg(
        sum(col("__w").cast("long")).as("n_drawn"),
        sum(col("__w").cast(dec) * col(valueCol).cast(dec)).as("sum_v"))
      .withColumn("mean",
        when(col("n_drawn") > 0,
          col("sum_v").cast("double") / col("n_drawn").cast("double")))
  }

  /** [[replicateMeans]] per GROUP — one (group, replicate) row, same
    * content-keyed draw (a row's weight in replicate b is identical
    * whether it's resampled alone or within its group, so grouped and
    * ungrouped runs are consistent). The A/B building block.
    */
  def replicateMeansBy(
      df: DataFrame,
      groupCols: Seq[String],
      keyCols: Seq[String],
      valueCol: String,
      reps: Int
  ): DataFrame = {
    require(reps >= 2 && reps <= 4096, s"reps out of range: $reps")
    val dec = "decimal(38,0)"
    val withB = df.select((groupCols ++ keyCols :+ valueCol).distinct.map(col): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("b", explode(sequence(lit(0), lit(reps - 1))))
    val u = Sampling.uniform01(keyCols.map(col) :+ col("b"))
    withB
      .withColumn("__w", poissonInverse(u))
      .groupBy((groupCols.map(col) :+ col("b")): _*)
      .agg(
        sum(col("__w").cast("long")).as("n_drawn"),
        sum(col("__w").cast(dec) * col(valueCol).cast(dec)).as("sum_v"))
      .withColumn("mean",
        when(col("n_drawn") > 0,
          col("sum_v").cast("double") / col("n_drawn").cast("double")))
  }

  /** Bootstrap CI of the A−B mean DIFFERENCE — the two-sample question
    * every A/B readout asks ("is the shift real or resampling noise"):
    * per replicate, Δ_b = mean_A,b − mean_B,b (each side's own Poisson
    * resample — independent draws because the (key, b) uniform differs
    * across disjoint id sets), then the exact-rank percentile interval
    * over the B deltas. A CI excluding 0 is the bootstrap's significance
    * verdict. Replicates where either side drew empty are dropped.
    */
  def deltaCi(
      repsA: DataFrame,
      repsB: DataFrame,
      loPct: Int = 5,
      hiPct: Int = 95
  ): DataFrame = {
    val deltas = repsA.select(col("b"), col("mean").as("__ma"))
      .join(repsB.select(col("b"), col("mean").as("__mb")), Seq("b"))
      .filter(col("__ma").isNotNull && col("__mb").isNotNull)
      .select(col("b"), (col("__ma") - col("__mb")).as("mean"))
    meanCi(deltas, loPct, hiPct)
  }

  /** Percentile-bootstrap confidence interval from a [[replicateMeans]]
    * frame: the exact-rank (loPct, hiPct) selections over the B replicate
    * means (the [[Quantiles]] lower-rank rule at rank (p·(B+1)) div 100
    * clamped to [1, B]) plus their average — B-sized work.
    */
  def meanCi(replicates: DataFrame, loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(0 < loPct && loPct < hiPct && hiPct < 100,
      s"need 0 < loPct < hiPct < 100: $loPct, $hiPct")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("mean"), col("b"))
    def rankAt(p: Int) =
      greatest(lit(1L), least(col("__n"), expr(s"($p * (__n + 1)) div 100")))
    replicates.filter(col("mean").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .agg(
        count(lit(1)).as("n_replicates"),
        avg(col("mean")).as("mean_of_means"),
        max(when(col("__rn") === rankAt(loPct), col("mean"))).as("ci_lo"),
        max(when(col("__rn") === rankAt(hiPct), col("mean"))).as("ci_hi"))
  }
}
