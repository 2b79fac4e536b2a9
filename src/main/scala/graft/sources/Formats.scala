package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format helpers. Parquet is the primary format (columnar,
  * pushdown, splittable); CSV/JSON exist for ingest/export edges. All
  * reads take an explicit schema at scale — schema inference is a full
  * extra pass over the data.
  */
object Formats {

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  /** CSV read with a required schema (never infer at scale). */
  def readCsv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC: the other columnar interchange format warehouses speak —
    * pushdown and column pruning work like parquet's. Round-trip
    * fidelity is oracle-gated end-to-end by q130 (parquet → ORC → read
    * → aggregate must hash-match the parquet-direct oracle).
    *
    * Avro note: this container's Spark distribution ships avro-core
    * jars but NOT the spark-avro datasource module, so
    * `format("avro")` is environment-blocked here (same status as
    * Kafka); parquet + ORC + CSV/JSONL cover the interchange surface.
    */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
