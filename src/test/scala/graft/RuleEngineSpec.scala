package graft

import graft.quality.RuleEngine
import graft.quality.RuleEngine.Rule

class RuleEngineSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 10.0, "A"), (2L, -1.0, "A"), (3L, 5.0, "X"), (4L, 0.0, null.asInstanceOf[String])
  ).toDF("id", "amount", "flag")

  test("validate counts failures per rule in one pass, nulls count as failures") {
    val out = RuleEngine.validate(df, Seq(
      Rule("amount_positive", "amount > 0"),
      Rule("flag_known", "flag IN ('A', 'B')"),
      Rule("id_unique_ish", "id IS NOT NULL")
    )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("amount_positive") == (4L, 2L)) // -1 and 0 fail
    assert(out("flag_known") == (4L, 2L)) // 'X' fails, NULL flag counts as failure
    assert(out("id_unique_ish") == (4L, 0L))
  }

  test("failedSamples returns only failing rows") {
    val rows = RuleEngine.failedSamples(df, Rule("amount_positive", "amount > 0"), 10)
      .select("id").as[Long].collect().toSet
    assert(rows == Set(2L, 4L))
  }

  test("fdViolations witnesses broken determinism, tolerates nulls") {
    import spark.implicits._
    val d = Seq((1, Option("a")), (1, Option("a")), (2, Option("a")), (2, Option("b")), (3, Option.empty[String]))
      .toDF("k", "v")
    val viol = RuleEngine.fdViolations(d, Seq("k"), Seq("v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viol == Map(2 -> 2L)) // k=1 consistent, k=3 single (null) value
    // multi-column dependents: (k) -> (v, w) fails only where the PAIR varies
    val d2 = Seq((1, "a", 1), (1, "a", 2), (2, "a", 1), (2, "a", 1)).toDF("k", "v", "w")
    val viol2 = RuleEngine.fdViolations(d2, Seq("k"), Seq("v", "w"))
      .collect().map(r => r.getInt(0)).toSeq
    assert(viol2 == Seq(1))
  }

  test("enforce throws with rule detail when violated, passes when clean") {
    val ex = intercept[IllegalStateException] {
      RuleEngine.enforce(df, Seq(Rule("amount_positive", "amount > 0")))
    }
    assert(ex.getMessage.contains("amount_positive: 2/4"))
    RuleEngine.enforce(df, Seq(Rule("id_present", "id IS NOT NULL"))) // no throw
    RuleEngine.enforce(df, Seq(Rule("amount_positive", "amount > 0")), maxFailureRate = 0.6)
  }

  test("suggestRules derives not-null and range rules a good load then passes") {
    import graft.quality.Profiler
    import spark.implicits._
    val good = Seq((1L, 10.0, "a"), (2L, 20.0, null.asInstanceOf[String]), (3L, 15.0, "c"))
      .toDF("id", "amount", "note")
    val rules = RuleEngine.suggestRules(
      Profiler.profile(good, Seq("id", "amount", "note")), relax = 0.1)
    val names = rules.map(_.name).toSet
    // id and amount: never null + numeric range; note: nullable, non-numeric
    assert(names.contains("id_not_null") && names.contains("amount_not_null"))
    assert(names.contains("id_range") && names.contains("amount_range"))
    assert(!names.contains("note_not_null") && !names.contains("note_range"))
    // the baseline itself passes every suggested rule
    val res = RuleEngine.validate(good, rules)
      .select("rule", "n_failed").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(res.forall(_._2 == 0L), res.mkString(","))
    // a drifted load trips the range rule
    val bad = Seq((9L, 99.0, "x")).toDF("id", "amount", "note")
    val tripped = RuleEngine.validate(bad, rules)
      .filter($"n_failed" > 0).select("rule").as[String].collect().toSet
    assert(tripped == Set("id_range", "amount_range"))
  }
}
