package graft

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin attaches latest at-or-before value per key, null when none") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L), (2L, 7L, 103L))
      .toDF("k", "ts", "event")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 99L, "z"))
      .toDF("k", "ts", "v")
    val out = TemporalJoins.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("event", "v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      100L -> Some("a"),  // ts=10 matches right ts=10 (inclusive)
      101L -> Some("b"),  // ts=20 -> latest right ts=15
      102L -> None,       // ts=5, nothing at-or-before
      103L -> None        // right row is in the future
    ))
  }

  test("asOfJoin forward direction and tolerance (merge_asof semantics)") {
    val left = Seq((1L, 10L, 100L), (1L, 16L, 101L), (1L, 30L, 102L))
      .toDF("k", "ts", "event")
    val right = Seq((1L, 12L, "a"), (1L, 15L, "b"))
      .toDF("k", "ts", "v")
    val fwd = TemporalJoins.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"),
        direction = "forward")
      .select("event", "v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fwd == Map(
      100L -> Some("a"),  // next right at-or-after ts=10 is ts=12
      101L -> None,       // nothing at-or-after ts=16
      102L -> None
    ))
    val tol = TemporalJoins.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"),
        direction = "backward", tolerance = Some(3L))
      .select("event", "v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(tol == Map(
      100L -> None,       // no right at-or-before ts=10 at all
      101L -> Some("b"),  // ts=15 is 1 unit back, within 3
      102L -> None        // ts=15 is 15 units back, past tolerance
    ))
  }

  test("native AsOfJoinExec matches the composed as-of join on real events") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "unix_timestamp(ts) AS ts_sec", "event_type", "value")
    val left = ev.select("event_id", "user_id", "ts_sec")
    val right = ev.filter($"event_type" === "signup")
      .groupBy("user_id", "ts_sec").agg(org.apache.spark.sql.functions.max($"value").as("pv"))
    val composed = TemporalJoins.asOfJoin(left, right, Seq("user_id"), "ts_sec", "ts_sec", Seq("pv"))
    val native = TemporalJoins.asOfJoinNative(left, right, Seq("user_id"), "ts_sec", "ts_sec", Seq("pv"))
    assert(native.count() == left.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    // and the custom physical operator is actually in the plan
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoinExec") ||
      native.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("pointInInterval equals a plain between-join across bucket sizes") {
    val points = Tables.events(spark, sf)
      .selectExpr("event_id", "CAST(floor(value) AS BIGINT) AS v")
    val iv = Tables.nation(spark, sf)
      .selectExpr("n_nationkey", "CAST(n_nationkey * 8 AS BIGINT) AS lo", "CAST(n_nationkey * 8 + 12 AS BIGINT) AS hi")
    val naive = points.join(iv, $"v".between($"lo", $"hi")).select("event_id", "n_nationkey")
    for (bs <- Seq(4L, 16L, 64L)) {
      val bucketed = TemporalJoins.pointInInterval(points, "v", iv, "lo", "hi", bs)
        .select("event_id", "n_nationkey")
      assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty, s"bucketSize=$bs")
    }
  }
}
