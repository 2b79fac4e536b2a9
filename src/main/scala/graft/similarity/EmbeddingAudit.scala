package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-store hygiene audit — the pre-flight card every ANN /
  * semantic-dedup job should read before trusting cosine scores: NULL
  * vectors, dimension drift (a mixed-model store where half the
  * vectors are 384-d and half 768-d silently zero-pads or errors
  * downstream), zero vectors (cosine undefined — the retrievers here
  * guard them, external consumers may not), non-finite norms, and the
  * norm distribution (unnormalized stores make dot-product ≠ cosine).
  */
object EmbeddingAudit {

  private val dec = "decimal(38,0)"

  /** One-row audit of an (id, vector) frame. Per row the squared norm
    * is a FIXED left fold over the array (both engines replay the same
    * IEEE addition order); each norm lands as a nano long before the
    * distribution sums (order-free exact aggregation — a double sum
    * across rows would be partition-order-dependent). min/max norms are
    * order-free double aggregates. SCALE: one narrow projection + ONE
    * aggregation; no shuffle of vector payloads beyond the partial agg.
    */
  def audit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val sumsq = expr(
      s"aggregate($vecCol, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    val rows = df.select(col(idCol).as("__id"),
        col(vecCol).isNull.as("__isnull"),
        when(col(vecCol).isNotNull, size(col(vecCol))).as("__dim"),
        when(col(vecCol).isNotNull, sumsq).as("__ss"))
      .withColumn("__finite", col("__ss").isNotNull && !isnan(col("__ss")) &&
        col("__ss") =!= Double.PositiveInfinity)
      .withColumn("__norm", when(col("__finite"), sqrt(col("__ss"))))
      .withColumn("__norm9", round(col("__norm") * 1e9d).cast("long"))
    rows.agg(
        count(lit(1)).as("n_vecs"),
        sum(col("__isnull").cast("long")).as("n_null"),
        min("__dim").as("dim_min"),
        max("__dim").as("dim_max"),
        countDistinct("__dim").as("n_dims"),
        sum(when(!col("__isnull") && !col("__finite"), 1L).otherwise(0L)).as("n_nonfinite"),
        sum(when(col("__finite") && col("__ss") === 0d, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("__finite"), 1L).otherwise(0L)).as("n_normed"),
        sum(col("__norm9").cast(dec)).as("__s9"),
        min("__norm").as("__mn"),
        max("__norm").as("__mx"))
      .withColumn("norm9_sum", col("__s9").cast("string"))
      .withColumn("norm_min", col("__mn"))
      .withColumn("norm_max", col("__mx"))
      .withColumn("norm_mean",
        when(col("n_normed") > 0L,
          col("__s9").cast("double") / 1e9d / col("n_normed").cast("double")))
      .drop("__s9", "__mn", "__mx")
  }
}
