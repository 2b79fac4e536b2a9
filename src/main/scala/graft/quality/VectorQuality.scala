package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column data quality — the gate you run BEFORE building an
  * ANN index or training on vectors at 100 TB: a handful of NaN or
  * zero vectors silently poison cosine ranking (NaN propagates through
  * every dot product it touches; zero vectors make cosine undefined),
  * and a single wrong-dimension row fails a whole PQ/IVF build late
  * instead of early.
  *
  * Every count is an exact integer and the norm² extremes are
  * left-fold doubles with a PINNED association order (Spark `aggregate`
  * and DuckDB `list_reduce` both fold left), so the q151 oracle replays
  * the report bit-for-bit — float-origin values widen to double
  * exactly, and x² and + are single correctly-rounded IEEE ops.
  *
  * Scale shape: one narrow projection + one global aggregation; no
  * shuffle beyond the final 1-row combine.
  */
object VectorQuality {

  /** One-row report over `vecCol` (array of float/double):
    * n_rows, n_null_vec, n_bad_dim (non-null with length ≠ expectedDim),
    * n_null_elem (contains a NULL element — poisons dot products exactly
    * like NaN, and under three-valued logic would otherwise slip through
    * EVERY count uncounted), n_nan (contains a NaN element), n_zero
    * (all-zero — cosine undefined), and min/max norm² over the clean
    * (non-null, right-dim, element-complete, NaN-free) rows. Every
    * defect predicate is coalesced to a definite boolean so a defective
    * row is always counted somewhere.
    */
  def report(df: DataFrame, vecCol: String, expectedDim: Int): DataFrame = {
    require(expectedDim > 0, "expectedDim must be positive")
    val v = col(vecCol).cast("array<double>")
    val isNull = v.isNull
    val badDim = coalesce(!isNull && size(v) =!= expectedDim, lit(false))
    val hasNullElem = coalesce(!isNull && exists(v, _.isNull), lit(false))
    val hasNan = coalesce(!isNull && exists(v, x => coalesce(isnan(x), lit(false))),
      lit(false))
    val norm2 = aggregate(v, lit(0.0), (acc, x) => acc + x * x)
    val clean = !isNull && !badDim && !hasNullElem && !hasNan
    val isZero = clean && norm2 === 0.0
    df.select(isNull.as("__null"), badDim.as("__bad"), hasNullElem.as("__nelem"),
        hasNan.as("__nan"), isZero.as("__zero"), clean.as("__clean"), norm2.as("__n2"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__null").cast("long")).as("n_null_vec"),
        sum(col("__bad").cast("long")).as("n_bad_dim"),
        sum(col("__nelem").cast("long")).as("n_null_elem"),
        sum(col("__nan").cast("long")).as("n_nan"),
        sum(col("__zero").cast("long")).as("n_zero"),
        min(when(col("__clean"), col("__n2"))).as("min_norm2"),
        max(when(col("__clean"), col("__n2"))).as("max_norm2"))
  }

  /** Quantization scale for [[centroidDrift]]: a POWER OF TWO, so
    * x·2²⁰ is exact in IEEE for any float x (power-of-two scaling only
    * shifts the exponent) and the subsequent floor is exact — the whole
    * drift report is then integer arithmetic.
    */
  val DriftScale: Long = 1L << 20

  /** Embedding-distribution drift between two corpus slices — the
    * "has my embedding space moved, is the ANN index stale" check run
    * between index builds. Float mean vectors are UNGATEABLE (a global
    * float sum depends on partition order), so each component is first
    * quantized to floor(x · 2²⁰) — exact, see [[DriftScale]] — and
    * summed as BIGINT (associative: any partitioning gives the same
    * sum). Output is one row per dimension: both sides' exact component
    * sums and counts, plus diff_scaled = sum_a·n_b − sum_b·n_a (the
    * cross-multiplied mean difference with denominator n_a·n_b kept
    * implicit — no division, no float, hash-exact). Callers derive
    * dist² = Σ (diff/(n_a·n_b))² or feed the per-dim diffs to a
    * threshold.
    *
    * Scale shape: posexplode → (dim, q) partial-aggregated per
    * partition before the exchange — the shuffle carries dims ×
    * partitions rows, never n × dims.
    */
  def centroidDrift(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    def sums(df: DataFrame, sumName: String, nName: String): DataFrame =
      df.select(col(vecCol).cast("array<double>").as("v"))
        .filter(col("v").isNotNull && !exists(col("v"), isnan(_)))
        .select(posexplode(col("v")).as(Seq("dim", "x")))
        .select(col("dim"), floor(col("x") * lit(DriftScale)).cast("long").as("q"))
        .groupBy("dim")
        .agg(sum(col("q")).as(sumName), count(lit(1)).as(nName))
    sums(a, "sum_a", "n_a").join(sums(b, "sum_b", "n_b"), Seq("dim"))
      .withColumn("diff_scaled", col("sum_a") * col("n_b") - col("sum_b") * col("n_a"))
  }
}
