package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** Funnel greedy-match and retention invariants (q136/q137 gate the
  * cross-engine replay; these gate the matching semantics on hand-built
  * sequences).
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "sec", "event_type")
      .select($"user_id", $"event_id", timestamp_seconds($"sec").as("ts"), $"event_type")

  private val steps = Seq("a", "b", "c")

  private def completed(d: org.apache.spark.sql.DataFrame) =
    Funnel.stepsCompleted(d, "user_id", "event_type", "ts", "event_id", steps, spanSec = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ordered steps convert; out-of-order do not") {
    val d = ev(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "c"), // full
      (2L, 4L, 10L, "b"), (2L, 5L, 20L, "a"), (2L, 6L, 30L, "c"), // b before a: a->c only misses b AFTER a? c counts as step... a@20 then c@30 != b -> stuck at 1? No: after a@20 the next needed is b; c does not advance
      (3L, 7L, 10L, "a"), (3L, 8L, 20L, "c")) // no b
    val got = completed(d)
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("span window bounds steps 2+ relative to step 1") {
    val d = ev(
      (1L, 1L, 10L, "a"), (1L, 2L, 50L, "b"), (1L, 3L, 109L, "c"),  // within 100s span
      (2L, 4L, 10L, "a"), (2L, 5L, 50L, "b"), (2L, 6L, 111L, "c"))  // c beyond span
    val got = completed(d)
    assert(got == Map(1L -> 3L, 2L -> 2L))
  }

  test("greedy earliest match: a later qualifying pair cannot rescue the span") {
    // the FIRST 'a' starts the clock even though the second 'a' would
    // have allowed full conversion — greedy semantics, deterministic
    val d = ev((1L, 1L, 0L, "a"), (1L, 2L, 90L, "a"), (1L, 3L, 95L, "b"), (1L, 4L, 150L, "c"))
    assert(completed(d) == Map(1L -> 2L))
  }

  test("same-second events advance in event_id order") {
    val d = ev((1L, 1L, 10L, "a"), (1L, 2L, 10L, "b"), (1L, 3L, 10L, "c"))
    assert(completed(d) == Map(1L -> 3L))
    val rev = ev((1L, 3L, 10L, "a"), (1L, 2L, 10L, "b"), (1L, 1L, 10L, "c"))
    assert(completed(rev) == Map(1L -> 1L)) // ids order c,b,a -> only 'a' matches
  }

  test("report counts are monotone and match stepsCompleted") {
    val d = ev(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "c"),
      (2L, 4L, 10L, "a"), (2L, 5L, 20L, "b"),
      (3L, 6L, 10L, "a"))
    val rep = Funnel.report(d, "user_id", "event_type", "ts", "event_id", steps, 100)
      .orderBy("step_idx").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rep.toSeq == Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
  }

  test("hot-user cap: earliest-k events only, and cap >= events is identity") {
    // synthetic bot: 5000 step-typed events, the funnel-completing pair
    // (b, c) arrives only AFTER the first 100 — a cap of 100 must see
    // the bot stall at step 1, an above-width cap must match uncapped.
    val bot = (1 to 5000).map(i =>
      (9L, i.toLong, 1000L + i, if (i == 4000) "b" else if (i == 4500) "c" else "a"))
    val d = ev(bot :+ ((2L, 9000L, 10L, "a")): _*)
    def capped(cap: Option[Int]) =
      Funnel.stepsCompleted(d, "user_id", "event_type", "ts", "event_id",
          steps, spanSec = 100000, maxEventsPerUser = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uncapped = capped(None)
    assert(uncapped == Map(9L -> 3L, 2L -> 1L))
    // cap below the bot's width: only the earliest 100 events (all 'a')
    // enter the fold — deterministic earliest-k, not an arbitrary sample
    assert(capped(Some(100)) == Map(9L -> 1L, 2L -> 1L))
    // cap at/above the max per-user width: bit-identical to uncapped
    // (the q136 contract: gate hash is cap-invariant for cap >= corpus max)
    assert(capped(Some(5000)) == uncapped)
    assert(capped(Some(100000)) == uncapped)
  }

  test("ts outside [0, 2^40) seconds fails fast, not silently") {
    val neg = ev((1L, 1L, -5L, "a"))
    val errNeg = intercept[Exception] { completed(neg) }
    assert(errNeg.getMessage.contains("packing range")
      || errNeg.getCause != null && errNeg.getCause.getMessage.contains("packing range"))
    // millisecond-scale epochs (>= 2^40) are the other corruption mode
    val ms = ev((1L, 1L, 1700000000000L, "a"))
    val errMs = intercept[Exception] { completed(ms) }
    assert(errMs.getMessage.contains("packing range")
      || errMs.getCause != null && errMs.getCause.getMessage.contains("packing range"))
  }

  test("topPaths: windows per user in (ts, id) order; short histories drop; pinned ties") {
    val d = ev(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "c"), (1L, 4L, 40L, "b"),
      (2L, 5L, 10L, "a"), (2L, 6L, 20L, "b"), (2L, 7L, 30L, "c"),
      (3L, 8L, 10L, "a"), (3L, 9L, 20L, "b")) // only 2 events: no 3-window
    val got = Funnel.topPaths(d, "user_id", "event_type", "ts", "event_id",
        pathLen = 3, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a>b>c appears for users 1 and 2; b>c>b only for user 1; ties break
    // by path string after count
    assert(got == Seq(("a>b>c", 2L), ("b>c>b", 1L)))
    // pathLen 2 degenerates to transition pairs
    val pairs = Funnel.topPaths(d, "user_id", "event_type", "ts", "event_id", 2, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(pairs == Map("a>b" -> 3L, "b>c" -> 2L, "c>b" -> 1L))
    // NULL-typed events are excluded entirely — a (a, NULL, c) window
    // must not emit a malformed "a>c" counted as a 3-path
    val withNull = Seq(
      (7L, 1L, 10L, Some("a")), (7L, 2L, 20L, None), (7L, 3L, 30L, Some("c")),
      (7L, 4L, 40L, Some("d")))
      .toDF("user_id", "event_id", "sec", "event_type")
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.timestamp_seconds($"sec").as("ts"), $"event_type")
    val gotN = Funnel.topPaths(withNull, "user_id", "event_type", "ts", "event_id", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(gotN == Seq(("a>c>d", 1L))) // the NULL event is skipped, not concatenated around
  }

  test("weekly retention: cohorts anchor at the first event's week") {
    val day = 86400L
    val d = ev(
      (1L, 1L, 0L, "a"),                 // cohort week of 1970-01-01 (Thu) -> Mon 1969-12-29
      (1L, 2L, 7L * day, "a"),           // next week -> offset 1
      (1L, 3L, 21L * day, "a"),          // offset 3
      (2L, 4L, 7L * day, "a"))           // cohort one week later, offset 0
    val got = Funnel.weeklyRetention(d, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("1969-12-29", 0L, 1L), ("1969-12-29", 1L, 1L), ("1969-12-29", 3L, 1L),
      ("1970-01-05", 0L, 1L)))
  }
}
