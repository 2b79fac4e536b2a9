package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  * Kept trivial on purpose: `spark.read.parquet` keeps scans declarative so
  * filter/column pushdown reaches the parquet reader.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** The driver's parquet has carried timestamps three ways across data
    * regenerations: TIMESTAMP(NANOS) (long under nanosAsLong), tz-aware
    * micros (LTZ), and naive micros — which Spark 4 infers as
    * TIMESTAMP_NTZ by default. NTZ breaks watermarks and long casts, so
    * graft's own sessions disable the inference
    * (`spark.sql.parquet.inferTimestampNTZ.enabled=false`); this cast is
    * the safety net for FOREIGN sessions (the driver's smoke check)
    * where that config isn't ours to set. Under a UTC session the cast
    * preserves the wall-clock reading exactly.
    */
  def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    // recurse: an NTZ nested in a struct/array/map must not slip through
    // the safety net (casting a struct to the NTZ-free twin type rewrites
    // the leaf timestamps in place)
    def replace(dt: DataType): DataType = dt match {
      case TimestampNTZType => TimestampType
      case s: StructType => StructType(s.fields.map(f => f.copy(dataType = replace(f.dataType))))
      case ArrayType(e, n) => ArrayType(replace(e), n)
      case MapType(k, v, n) => MapType(replace(k), replace(v), n)
      case other => other
    }
    val changed = df.schema.fields.collect {
      case f if replace(f.dataType) != f.dataType => f.name -> replace(f.dataType)
    }
    changed.foldLeft(df)((d, c) => d.withColumn(c._1, col(c._1).cast(c._2)))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark can't read natively;
    * with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long
    * (ns since epoch) and is normalized here to a microsecond TIMESTAMP,
    * exactly what Spark would hold if parquet carried micros.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
