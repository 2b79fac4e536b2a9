package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Semi-structured (JSON string column) extraction — event `props`, API
  * payloads, crawler metadata. The production contract at scale is: parse
  * ONCE with an explicit schema into typed top-level columns, then let every
  * downstream filter/agg run on native types (a per-use `get_json_object`
  * re-parses the string for every call site).
  *
  * `from_json` is a native Catalyst expression (Jackson under codegen) — a
  * narrow per-row map, no UDF, no shuffle; the flattened columns prune and
  * push down like any other.
  */
object Json {

  /** Parse `jsonCol` with an explicit DDL schema (e.g. `"k BIGINT, tag
    * STRING"`) and promote every top-level field to a typed column named
    * `prefix<field>`. Malformed rows yield NULL fields (PERMISSIVE) — a DQ
    * rule on the flattened columns catches them without killing the job.
    */
  def flatten(df: DataFrame, jsonCol: String, ddl: String, prefix: String = ""): DataFrame = {
    val schema = StructType.fromDDL(ddl)
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schema))
    val promoted = schema.fields.map(f => col(s"__j.${f.name}").as(s"$prefix${f.name}"))
    parsed.select((df.columns.map(col) ++ promoted): _*)
  }

  /** Infer the JSON schema from a deterministic sample of the column.
    *
    * This is a driver-coordinated ACTION (it reads the sample), so it runs
    * once per pipeline build, never per row — infer on a sample, then feed
    * the frozen DDL to [[flatten]] in production. The sample is taken with
    * [[Sampling.deterministic]]-style md5 thresholding so the inferred
    * schema is reproducible run-to-run.
    */
  def inferSchema(spark: SparkSession, df: DataFrame, jsonCol: String,
      sampleFraction: Double = 0.01): DataType = {
    import spark.implicits._
    val sampled: Dataset[String] = df
      .filter(substring(Sampling.keyHash(Seq(col(jsonCol))), 1, 15)
        < lit(Sampling.hexThreshold(sampleFraction)))
      .select(col(jsonCol).cast("string"))
      .as[String]
    spark.read.json(sampled).schema
  }
}
