package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC ingestion/egress — the second columnar interchange format after
  * parquet (Hive/Trino estates are ORC-heavy; a 100 TB migration job
  * reads ORC in and writes parquet out). Spark's ORC datasource is
  * native and vectorized, so predicate pushdown / column pruning /
  * whole-stage codegen behave exactly as on parquet — gated end-to-end
  * by q130: parquet → ORC → read back → aggregate must hash-match the
  * oracle aggregating the parquet directly.
  *
  * Unlike the text formats ([[TextFormats]]), ORC carries its own
  * schema and types — no explicit-DDL or corrupt-row capture contract
  * is needed; fidelity risks are type-system mismatches (timestamp
  * flavors, decimal precision), which is what the round-trip gate
  * exercises.
  *
  * Avro note: the container's Spark distribution ships avro-core jars
  * but NOT the spark-avro datasource module, so `format("avro")` is
  * environment-blocked here (same status as Kafka); ORC + parquet +
  * CSV/JSONL cover the columnar and text interchange surface.
  */
object Columnar {

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
