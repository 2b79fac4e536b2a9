package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV / JSON-lines ingestion with the contract that survives 100 TB:
  * an EXPLICIT schema — `inferSchema` is a whole extra pass over the
  * data before the real one, and a sampled inference can silently widen
  * or narrow types between loads — and PERMISSIVE corrupt-row capture,
  * so one malformed line quarantines into `_corrupt` instead of failing
  * the job (the same per-row-fallback stance as
  * [[graft.multimodal.Multimodal]]'s decoders and
  * [[graft.operators.Json.flatten]]'s PERMISSIVE parse).
  *
  * Writers are thin `DataFrameWriter` wrappers kept here so the
  * round-trip contract (header, delimiter, quote-escaping defaults) has
  * one definition; fidelity is gated end-to-end by q90/q91: parquet →
  * write text format → read back with the explicit schema → aggregate
  * must hash-match the oracle aggregating the parquet directly.
  */
object TextFormats {

  /** The corrupt-capture column name (kept off the data's namespace). */
  val CorruptCol = "_graft_corrupt"

  private def withCorrupt(ddl: String): StructType =
    StructType.fromDDL(ddl).add(CorruptCol, StringType)

  def readCsv(
      spark: SparkSession,
      path: String,
      ddl: String,
      header: Boolean = true,
      delimiter: String = ","
  ): DataFrame =
    spark.read
      .schema(withCorrupt(ddl))
      .option("header", header)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      delimiter: String = ","): Unit =
    df.write.mode("overwrite")
      .option("header", header).option("delimiter", delimiter)
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read
      .schema(withCorrupt(ddl))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
