package graft

import graft.operators.Interleave
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private def weightsDf(ws: (String, Long)*) =
    ws.toSeq.toDF("source", "weight")

  test("every prefix of the global order tracks the weight ratio") {
    // 300 docs: 100 per source, weights 3:2:1
    val docs = (0 until 300).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "src")
    val ordered = Interleave.trainingOrder(docs, "id", "src",
        weightsDf("s0" -> 3L, "s1" -> 2L, "s2" -> 1L))
      .withColumn("pos", row_number().over(
        Window.orderBy("order_key", "source", "src_rank")))
    // after any prefix of n·6 docs the mixture must be exactly 3:2:1
    // (stride scheduling's lag bound is < 1 doc per source per period)
    val prefix = ordered.filter(col("pos") <= 60)
      .groupBy("source").count().orderBy("source")
      .as[(String, Long)].collect().toSeq
    assert(prefix == Seq(("s0", 30L), ("s1", 20L), ("s2", 10L)))
    // equal-weight lag bound: count gap ≤ 1 at EVERY prefix for equal weights
    val eq = Interleave.trainingOrder(docs, "id", "src",
        weightsDf("s0" -> 1L, "s1" -> 1L, "s2" -> 1L))
      .withColumn("pos", row_number().over(
        Window.orderBy("order_key", "source", "src_rank")))
      .orderBy("pos").select("source").as[String].collect()
    val counts = collection.mutable.Map("s0" -> 0, "s1" -> 0, "s2" -> 0)
    eq.foreach { s =>
      counts(s) += 1
      assert(counts.values.max - counts.values.min <= 1,
        s"unfair prefix at ${counts.values.sum}: $counts")
    }
  }

  test("trainer-materialized order (distributed range sort) keeps the prefix mixture") {
    // the operator emits an order KEY by design; a trainer materializes
    // the order with a distributed ORDER BY — this closes the loop
    // between the key contract and what a trainer actually consumes
    val docs = spark.range(30000).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(3))).as("src"))
    val ordered = Interleave.trainingOrder(docs, "id", "src",
      weightsDf("s0" -> 3L, "s1" -> 2L, "s2" -> 1L))
    val sorted = ordered.orderBy("order_key", "source", "src_rank")
    sorted.collect()
    // the materialization is a RANGE sort (distributed), never a
    // one-partition window
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    // positions via zipWithIndex over the sorted partitions — the
    // distributed trainer-side idiom (partition order IS sort order)
    val pos = sorted.select("source").rdd.map(_.getString(0)).zipWithIndex()
    // every W-aligned prefix carries the exact designed mixture
    val at6000 = pos.filter(_._2 < 6000).map(_._1).countByValue()
    assert(at6000 == Map("s0" -> 3000L, "s1" -> 2000L, "s2" -> 1000L), at6000)
    val at12000 = pos.filter(_._2 < 12000).map(_._1).countByValue()
    assert(at12000 == Map("s0" -> 6000L, "s1" -> 4000L, "s2" -> 2000L), at12000)
  }

  test("bucketed skew-safe rank equals the naive per-source row_number") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val w = docs.select("source").distinct().withColumn("weight", lit(2L))
    val got = Interleave.trainingOrder(docs, "doc_id", "source", w)
    val naive = docs
      .withColumn("__h", substring(md5(encode(col("doc_id").cast("string"), "UTF-8")), 1, 15))
      .withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy("__h", "doc_id")).cast("long"))
      .select(col("doc_id").as("id"), col("r"))
    val joined = got.join(naive, "id")
    assert(joined.filter(col("src_rank") =!= col("r")).isEmpty)
  }

  test("a source with no weight fails fast") {
    val docs = Seq((1L, "known"), (2L, "unknown")).toDF("id", "src")
    val ex = intercept[Exception] {
      Interleave.trainingOrder(docs, "id", "src", weightsDf("known" -> 1L)).collect()
    }
    assert(ex.getMessage.contains("no weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("no weight")))
  }

  test("fractional and non-positive weights fail fast, not truncate") {
    val docs = Seq((1L, "a")).toDF("id", "src")
    def deepMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
    // 0.9 would silently cast to 0 (division by zero → NULL keys)
    val frac = Seq(("a", 0.9)).toDF("source", "weight")
    val e1 = intercept[Exception](
      Interleave.trainingOrder(docs, "id", "src", frac).collect())
    assert(deepMsg(e1).contains("integer >= 1"))
    // 0 and negatives violate the stride contract
    val zero = Seq(("a", 0L)).toDF("source", "weight")
    val e2 = intercept[Exception](
      Interleave.trainingOrder(docs, "id", "src", zero).collect())
    assert(deepMsg(e2).contains("integer >= 1"))
    // integral doubles are fine (2.0 == 2)
    val ok = Seq(("a", 2.0)).toDF("source", "weight")
    assert(Interleave.trainingOrder(docs, "id", "src", ok).count() == 1)
  }

  test("duplicate sources in weights fail fast, not fan out the join") {
    val docs = Seq((1L, "a"), (2L, "a")).toDF("id", "src")
    def deepMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString(" | ")
    val dup = Seq(("a", 1L), ("a", 2L)).toDF("source", "weight")
    val e = intercept[Exception](
      Interleave.trainingOrder(docs, "id", "src", dup).collect())
    assert(deepMsg(e).contains("must be unique"))
  }

  test("order keys are the exact stride floor, ties break deterministically") {
    val docs = (0 until 10).map(i => (i.toLong, "a")).toDF("id", "src")
    val keys = Interleave.trainingOrder(docs, "id", "src", weightsDf("a" -> 4L), scale = 8L)
      .orderBy("src_rank").select("order_key").as[Long].collect().toSeq
    // floor((2r-1)*8 / 8) for r=1..10 = 1,3,5,7,9,11,13,15,17,19
    assert(keys == Seq(1L, 3L, 5L, 7L, 9L, 11L, 13L, 15L, 17L, 19L))
    // scale=1 forces collisions: floor((2r-1)/8) — order stays total via rank
    val collided = Interleave.trainingOrder(docs, "id", "src", weightsDf("a" -> 4L), scale = 1L)
      .select("order_key").distinct().count()
    assert(collided < 10)
  }
}
