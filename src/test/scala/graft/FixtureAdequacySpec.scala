package graft

import graft.queries.CoreQueries
import org.apache.spark.sql.functions._

/** The fixture-adequacy convention (SURVEY §6, from the r13 survival
  * lesson: a 100%-censored fixture kept every KM gate green while the
  * operator's defining case — an actual event — never ran): each
  * fixture-dependent gate family asserts here, AT THE ORACLE SF
  * (sf0.01, what the driver's gate actually reads), that its fixture
  * exercises the defining cases. A regeneration of the testdata that
  * degenerates a fixture fails THIS spec instead of passing the gates
  * vacuously. The A/B-dashboard fixture has its own adequacy test in
  * AbDashboardSpec.
  */
class FixtureAdequacySpec extends SparkSpec {

  private val oracleSf = "/root/testdata/sf0.01"

  test("survival fixture: events AND censors both present, multiple distinct durations") {
    val agg = CoreQueries.survivalSubjectsForSpec(spark, oracleSf)
      .agg(sum(col("event")).as("events"),
        sum(lit(1L) - col("event")).as("censored"),
        countDistinct(col("duration")).as("durations"))
      .collect()(0)
    assert(agg.getAs[Long]("events") > 0L, "no events — the r13 vacuous cohort")
    assert(agg.getAs[Long]("censored") > 0L, "no censoring — KM reduces to an ECDF")
    assert(agg.getAs[Long]("durations") >= 10L, "degenerate duration support")
    // both cohorts of the q286/q294 A/B carry events
    val byCohort = CoreQueries.survivalSubjectsForSpec(spark, oracleSf)
      .groupBy((col("user_id") % 2 === 0).cast("string").as("cohort"))
      .agg(sum(col("event")).as("events")).collect()
    assert(byCohort.length === 2 && byCohort.forall(_.getAs[Long]("events") > 0L))
  }

  test("competing-risks fixture: both causes fire AND censoring present") {
    val byCause = CoreQueries.competingSubjectsForSpec(spark, oracleSf)
      .groupBy("cause").count().collect()
      .map(r => r.getAs[Long]("cause") -> r.getAs[Long]("count")).toMap
    for (c <- Seq(0L, 1L, 2L))
      assert(byCause.getOrElse(c, 0L) > 0L,
        s"cause $c absent — the Aalen–Johansen gate would be vacuous (got $byCause)")
  }
}
