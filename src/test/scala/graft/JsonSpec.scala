package graft

import graft.operators.Json
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonSpec extends SparkSpec {
  import spark.implicits._

  test("flatten promotes typed top-level fields with prefix, keeps original columns") {
    val df = Seq(
      (1L, """{"k": 7, "tag": "a"}"""),
      (2L, """{"k": 9, "tag": "b"}""")).toDF("id", "js")
    val out = Json.flatten(df, "js", "k BIGINT, tag STRING", prefix = "x_")
    assert(out.columns.toSeq == Seq("id", "js", "x_k", "x_tag"))
    assert(out.schema("x_k").dataType == LongType)
    val rows = out.orderBy("id").collect().map(r => (r.getLong(2), r.getString(3)))
    assert(rows.toSeq == Seq((7L, "a"), (9L, "b")))
  }

  test("malformed rows yield NULL fields (PERMISSIVE), missing fields yield NULL") {
    val df = Seq(
      (1L, """{"k": 7}"""),        // tag missing
      (2L, """{"k": oops"""),      // malformed
      (3L, null.asInstanceOf[String])).toDF("id", "js")
    val out = Json.flatten(df, "js", "k BIGINT, tag STRING").orderBy("id").collect()
    assert(out(0).getLong(2) == 7L && out(0).isNullAt(3))
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("inferSchema is deterministic run-to-run and types fields from the sample") {
    val df = (1 to 400)
      .map(i => (i.toLong, s"""{"k": $i, "tag": "t$i", "score": ${i / 2.0}}"""))
      .toDF("id", "js")
    val s1 = Json.inferSchema(spark, df, "js", sampleFraction = 0.5)
    val s2 = Json.inferSchema(spark, df, "js", sampleFraction = 0.5)
    assert(s1 == s2)
    val st = s1.asInstanceOf[StructType]
    assert(st.fieldNames.toSet == Set("k", "tag", "score"))
    assert(st("k").dataType == LongType)
    assert(st("score").dataType == DoubleType)
    assert(st("tag").dataType == StringType)
  }

  test("inferSchema feeds flatten: the inferred DDL round-trips values") {
    val df = Seq((1L, """{"a": 1, "b": "x"}"""), (2L, """{"a": 2, "b": "y"}""")).toDF("id", "js")
    val ddl = Json.inferSchema(spark, df, "js", sampleFraction = 1.0)
      .asInstanceOf[StructType].toDDL
    val out = Json.flatten(df, "js", ddl).orderBy("id")
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, "x"), (2L, "y")))
  }
}
