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

  test("validTimeAlign intersects two timelines into refinement segments") {
    val a = Seq((1L, "x", 0L, Some(5L)), (1L, "y", 5L, None), (2L, "q", 0L, None))
      .toDF("k", "attr_a", "valid_from", "valid_to")
    val b = Seq((1L, 10L, 0L, Some(3L)), (1L, 20L, 3L, Some(8L)), (1L, 30L, 8L, None))
      .toDF("k", "attr_b", "valid_from", "valid_to")
    val out = TemporalJoins.validTimeAlign(a, b, Seq("k"))
      .select("k", "attr_a", "attr_b", "seg_from", "seg_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set(
      (1L, "x", 10L, 0L, Some(3L)),  // x ∩ band10 = [0,3)
      (1L, "x", 20L, 3L, Some(5L)),  // x ∩ band20 = [3,5)
      (1L, "y", 20L, 5L, Some(8L)),  // y ∩ band20 = [5,8)
      (1L, "y", 30L, 8L, None)       // open ∩ open stays open
    ))                                // k=2 has no b-timeline -> no rows
    // segments partition each key's overlap region: disjoint and ordered
    val segs = TemporalJoins.validTimeAlign(a, b, Seq("k"))
      .filter($"k" === 1L).orderBy("seg_from")
      .select("seg_from", "seg_to").collect()
    segs.sliding(2).foreach {
      case Array(p, n) => assert(p.getLong(1) == n.getLong(0), "gap/overlap between segments")
      case _ =>
    }
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

  test("asOfJoinNearest picks the smaller |delta|, ties backward, tolerance both sides") {
    val left = Seq((1L, 10L, 100L), (1L, 14L, 101L), (1L, 40L, 102L), (2L, 5L, 103L))
      .toDF("k", "ts", "event")
    val right = Seq((1L, 8L, "back"), (1L, 16L, "fwd"), (1L, 12L, "mid"))
      .toDF("k", "ts", "v")
    val near = TemporalJoins.asOfJoinNearest(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("event", "v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(near == Map(
      100L -> Some("back"), // |10-8|=2 beats |10-12|=2? tie -> backward
      101L -> Some("mid"),  // |14-12|=2 beats |14-16|=2: tie -> backward (12)
      102L -> Some("fwd"),  // only backward candidates... 16 is nearest (24 back)
      103L -> None          // key 2 has no rights
    ))
    val tol = TemporalJoins.asOfJoinNearest(left, right, Seq("k"), "ts", "ts", Seq("v"),
        tolerance = Some(5L))
      .select("event", "v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(tol(102L).isEmpty) // nearest is 24 away, beyond tolerance
    assert(tol(100L).contains("back"))
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
