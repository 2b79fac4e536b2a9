package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema comparison + column utilities.
  *
  * Capability parity with the reference's schema toolkit
  * (reference: bdq/schema.py:16 compare_schemas, :28 dict_compare,
  * :50 get_schema_from_ddl_string, :85 get_column_names_combinations),
  * re-expressed on Spark's `StructType`/DDL machinery.
  */
object SchemaOps {

  /** Result of comparing two maps of name -> type string. */
  final case class Diff(
      added: Set[String],
      removed: Set[String],
      changed: Map[String, (String, String)], // name -> (before, after)
      notChanged: Set[String]
  )

  /** Compare two schemas by field name and simple type string.
    * `added` = fields present in s1 but not s2 (matches reference semantics:
    * bdq/schema.py:33 computes added = d1 - d2).
    */
  def compareSchemas(s1: StructType, s2: StructType): Diff =
    dictCompare(typeDict(s1), typeDict(s2))

  def typeDict(s: StructType): Map[String, String] =
    s.fields.map(f => f.name -> f.dataType.simpleString).toMap

  def dictCompare(d1: Map[String, String], d2: Map[String, String]): Diff = {
    val k1 = d1.keySet
    val k2 = d2.keySet
    val shared = k1 intersect k2
    Diff(
      added = k1 diff k2,
      removed = k2 diff k1,
      changed = shared.iterator
        .filter(k => d1(k) != d2(k))
        .map(k => k -> (d1(k), d2(k)))
        .toMap,
      notChanged = shared.filter(k => d1(k) == d2(k))
    )
  }

  /** Parse a DDL string ("a int, b string") into a StructType. */
  def fromDdl(ddl: String): StructType = StructType.fromDDL(ddl)

  def columnNames(schema: StructType): Seq[String] = schema.fieldNames.toSeq
  def columnNames(df: DataFrame): Seq[String] = df.columns.toSeq
  def columnNames(ddl: String): Seq[String] = fromDdl(ddl).fieldNames.toSeq

  def columnsInSchema(columns: Seq[String], schema: StructType): Seq[String] = {
    val s = schema.fieldNames.toSet
    columns.filter(s.contains)
  }

  def columnsNotInSchema(columns: Seq[String], schema: StructType): Seq[String] = {
    val s = schema.fieldNames.toSet
    columns.filterNot(s.contains)
  }

  /** Lazily generate column-name combinations: every subset of
    * `dynamicColumns` of size 1..maxLen (minus fixed), each prefixed by
    * `fixedColumns` (which is also yielded alone when non-empty).
    * Mirrors the reference generator's ordering (bdq/schema.py:85):
    * fixed first, then combinations by increasing size, preserving input
    * order within each size.
    */
  def columnCombinations(
      dynamicColumns: Seq[String],
      fixedColumns: Seq[String] = Nil,
      maxLen: Option[Int] = None,
      schema: Option[StructType] = None
  ): Iterator[Seq[String]] = {
    require(
      fixedColumns.toSet.intersect(dynamicColumns.toSet).isEmpty,
      "fixed column names may not contain dynamic column names"
    )
    schema.foreach { s =>
      val bad = columnsNotInSchema(fixedColumns ++ dynamicColumns, s)
      require(bad.isEmpty, s"invalid column names: $bad")
    }
    val budget = maxLen.getOrElse(Int.MaxValue) - fixedColumns.length
    val head = if (fixedColumns.nonEmpty) Iterator(fixedColumns) else Iterator.empty
    val tail = (1 to dynamicColumns.length).iterator
      .takeWhile(_ <= budget)
      .flatMap(n => dynamicColumns.combinations(n).map(c => (fixedColumns ++ c).distinct))
    head ++ tail
  }
}
