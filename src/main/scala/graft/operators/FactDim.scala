package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fact→dimension referential-integrity checks.
  * (reference: bdq/dataframe.py:114 fact_dim_broken_relationship)
  *
  * Scale design: the fact side is reduced to DISTINCT FK tuples *before*
  * joining (turns a 100 TB fact scan into a small key set — the aggregation
  * is map-side-combinable), then LEFT ANTI joined against distinct dim PKs.
  * The dim side is broadcast when small enough (Spark/AQE decides; the
  * distinct-key sets are far below the fact's raw size). Sampling of broken
  * records shuffles only rows whose FK is broken (inner join against the
  * broken key set, itself usually broadcastable).
  */
object FactDim {

  /** Distinct FK tuples in `fact` with no matching PK tuple in `dim`.
    * Output columns = fkColumns.
    */
  def brokenKeys(
      fact: DataFrame,
      fkColumns: Seq[String],
      dim: DataFrame,
      pkColumns: Seq[String]
  ): DataFrame = {
    require(pkColumns.length == fkColumns.length, "pk_columns count must match fk_columns count")
    val f = fact.select(fkColumns.map(col): _*).distinct().alias("f")
    val d = dim.select(pkColumns.map(col): _*).distinct().alias("d")
    val joinExpr = pkColumns.zip(fkColumns)
      .map { case (pk, fk) => col(s"d.$pk") === col(s"f.$fk") }
      .reduce(_ && _)
    f.join(d, joinExpr, "left_anti").select(col("f.*"))
  }

  /** Broken FK keys plus up to `sampleSize` full fact records per broken key,
    * collected as an array column `sample_records`.
    */
  def brokenRelationship(
      fact: DataFrame,
      fkColumns: Seq[String],
      dim: DataFrame,
      pkColumns: Seq[String],
      sampleSize: Int = 3
  ): DataFrame = {
    val broken = brokenKeys(fact, fkColumns, dim, pkColumns)
    if (sampleSize <= 0) return broken
    val w = Window.partitionBy(fkColumns.map(col): _*).orderBy(lit(1))
    fact.alias("f")
      .join(broadcast(broken.alias("b")), fkColumns.toSeq, "inner")
      .select(col("f.*"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= sampleSize)
      .drop("__rn")
      .groupBy(fkColumns.map(col): _*)
      .agg(collect_list(struct(col("*"))).as("sample_records"))
  }
}
