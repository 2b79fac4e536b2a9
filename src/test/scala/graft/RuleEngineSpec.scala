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

  test("enforce throws with rule detail when violated, passes when clean") {
    val ex = intercept[IllegalStateException] {
      RuleEngine.enforce(df, Seq(Rule("amount_positive", "amount > 0")))
    }
    assert(ex.getMessage.contains("amount_positive: 2/4"))
    RuleEngine.enforce(df, Seq(Rule("id_present", "id IS NOT NULL"))) // no throw
    RuleEngine.enforce(df, Seq(Rule("amount_positive", "amount > 0")), maxFailureRate = 0.6)
  }
}
