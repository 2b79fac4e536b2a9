package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only pipeline-state store backed by a catalog table: save appends
  * a row, load returns the latest row by the event timestamp column.
  * (reference: bdq/statestore.py CatalogPersistedStateStore — Delta table on
  * Databricks; here the format is pluggable, parquet by default, and the
  * metrics map is stored as a JSON-encoded string column the same way.)
  *
  * Scale: state rows are tiny (one per pipeline run); the latest-row load is
  * an ORDER BY ... LIMIT 1 that Spark executes as a TakeOrdered, no full
  * sort/shuffle of history.
  */
class StateStore(
    val spark: SparkSession,
    val tableName: String,
    val format: String = "parquet",
    val filterExpr: Option[org.apache.spark.sql.Column] = None
) {

  final case class State(
      pipelineName: String,
      startTs: Timestamp,
      stopTs: Option[Timestamp],
      metrics: Map[String, Double]
  )

  private def ensureTable(): Unit =
    if (!spark.catalog.tableExists(tableName)) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "pipeline_name string, start_ts timestamp, stop_ts timestamp, metrics string")
      ).write.format(format).saveAsTable(tableName)
    }

  def save(state: State): Unit = {
    ensureTable()
    import spark.implicits._
    val row = Seq((state.pipelineName, state.startTs, state.stopTs.orNull, StateStore.toJson(state.metrics)))
      .toDF("pipeline_name", "start_ts", "stop_ts", "metrics")
    // a row this store's own filterExpr would hide is a silent corruption:
    // loadLatest would keep returning the PREVIOUS visible run forever —
    // fail loudly at save time instead (the check runs on one local row)
    filterExpr.foreach { f =>
      require(!row.filter(f).isEmpty,
        s"state row does not match this store's filterExpr ($f) — it would be invisible to loadLatest")
    }
    row.write.format(format).mode("append").saveAsTable(tableName)
  }

  /** Run history scoped to one pipeline, then by the optional construction-
    * time `filterExpr` (reference: bdq/statestore.py:44 — a shared state
    * table serving many pipelines/tenants loads only its own slice; the
    * filter prunes BEFORE the latest-row TakeOrdered).
    */
  def history(pipelineName: String): DataFrame = {
    ensureTable()
    val base = spark.table(tableName).filter(col("pipeline_name") === pipelineName)
    filterExpr.fold(base)(base.filter)
  }

  def loadLatest(pipelineName: String): Option[State] = {
    val row = history(pipelineName).orderBy(col("start_ts").desc).limit(1).collect().headOption
    row.map { r =>
      State(
        r.getString(0),
        r.getTimestamp(1),
        Option(r.getTimestamp(2)),
        StateStore.fromJson(r.getString(3))
      )
    }
  }
}

object StateStore {

  /** Sanitize an arbitrary pipeline name into a legal table name: every
    * non-alphanumeric char becomes '_' (reference: bdq/statestore.py:118
    * CatalogPersistedStateStore.clean).
    */
  def clean(name: String): String =
    name.map(c => if (c.isLetterOrDigit) c else '_')

  /** Minimal JSON codec for a flat string->double map (no external deps). */
  def toJson(m: Map[String, Double]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + escape(k) + "\":" + (if (v.isNaN || v.isInfinite) "null" else v.toString) }
      .mkString("{", ",", "}")

  def fromJson(s: String): Map[String, Double] =
    if (s == null || s.trim == "{}" || s.trim.isEmpty) Map.empty
    else
      s.trim.stripPrefix("{").stripSuffix("}").split(",(?=\")").iterator
        .filter(_.nonEmpty)
        .flatMap { kv =>
          val i = kv.lastIndexOf(':')
          if (i < 0) None
          else {
            val k = unescape(kv.substring(0, i).trim.stripPrefix("\"").stripSuffix("\""))
            val vs = kv.substring(i + 1).trim
            if (vs == "null") None else Some(k -> vs.toDouble)
          }
        }
        .toMap

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}
