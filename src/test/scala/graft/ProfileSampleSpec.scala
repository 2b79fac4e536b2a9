package graft

import graft.operators.{Sampling, Scd2}
import graft.quality.Profiler
import graft.text.HeavyHitters
import org.apache.spark.sql.functions._

class ProfileSampleSpec extends SparkSpec {

  test("regression: exact line recovered, degenerates NULL, r2 == r*r, fold law") {
    import spark.implicits._
    import graft.quality.Profiler
    val line = (1 to 9).map(i => ("k", i.toLong, 3L * i + 7L)).toDF("g", "x0", "y0")
    val r = Profiler.regression(line, Seq("g"), "x0", "y0").collect()(0)
    assert(r.getAs[Double]("slope") === 3.0)
    assert(r.getAs[Double]("intercept") === 7.0)
    assert(r.getAs[Double]("r2") === 1.0)

    val constX = (1 to 5).map(i => ("k", 4L, i.toLong)).toDF("g", "x0", "y0")
    val rx = Profiler.regression(constX, Seq("g"), "x0", "y0").collect()(0)
    assert(rx.isNullAt(rx.fieldIndex("slope")))
    assert(rx.isNullAt(rx.fieldIndex("intercept")))
    assert(rx.isNullAt(rx.fieldIndex("r2")))

    val constY = (1 to 5).map(i => ("k", i.toLong, 9L)).toDF("g", "x0", "y0")
    val ry = Profiler.regression(constY, Seq("g"), "x0", "y0").collect()(0)
    assert(ry.getAs[Double]("slope") === 0.0)
    assert(ry.getAs[Double]("intercept") === 9.0)
    assert(ry.isNullAt(ry.fieldIndex("r2"))) // nothing to explain

    // cross-operator law: r2 equals correlation's r squared
    val noisy = (1 to 40).map(i => ("k", i.toLong, (i * 7 % 13 + 2 * i).toLong))
      .toDF("g", "x0", "y0")
    val r2 = Profiler.regression(noisy, Seq("g"), "x0", "y0")
      .collect()(0).getAs[Double]("r2")
    val rr = Profiler.correlation(noisy, Seq("g"), "x0", "y0")
      .collect()(0).getAs[Double]("r")
    assert(math.abs(r2 - rr * rr) < 1e-12)

    // fold law: merged disjoint halves regress identically to the rebuild
    val h1 = Profiler.correlationMoments(noisy.filter($"x0" % 2 === 0), Seq("g"), Seq("x0", "y0"))
    val h2 = Profiler.correlationMoments(noisy.filter($"x0" % 2 === 1), Seq("g"), Seq("x0", "y0"))
    val folded = Profiler.regressionFromMoments(
      Profiler.mergeCorrelationMoments(h1, h2, Seq("g")), Seq("g"), "x0", "y0")
      .collect().toSeq
    val rebuilt = Profiler.regression(noisy, Seq("g"), "x0", "y0").collect().toSeq
    assert(folded === rebuilt)
  }

  test("wasserstein drift: zero on identical, unit shift = 1.0, sparse gaps weighted, scale-free") {
    import spark.implicits._
    import graft.quality.Profiler
    val a = (Seq.fill(5)(0L) ++ Seq.fill(5)(1L)).map(Tuple1(_)).toDF("v")
    val same = Profiler.wassersteinDrift(a, a, "v").collect()(0)
    assert(same.getAs[String]("w1_num") === "0")
    assert(same.getAs[Double]("w1") === 0.0)

    // every value shifted up one bucket: W1 exactly 1.0
    val b = (Seq.fill(5)(1L) ++ Seq.fill(5)(2L)).map(Tuple1(_)).toDF("v")
    val shift = Profiler.wassersteinDrift(a, b, "v").collect()(0)
    assert(shift.getAs[String]("w1_num") === "100")
    assert(shift.getAs[Double]("w1") === 1.0)

    // sparse support: mass moved 10 buckets = W1 10.0 (KS/chi2 would
    // read this the same as a 1-bucket move)
    val p = Seq(Tuple1(0L)).toDF("v")
    val q = Seq(Tuple1(10L)).toDF("v")
    assert(Profiler.wassersteinDrift(p, q, "v").collect()(0).getAs[Double]("w1") === 10.0)

    // doubling one side's counts leaves the distribution (and W1) fixed
    val b2 = (Seq.fill(10)(1L) ++ Seq.fill(10)(2L)).map(Tuple1(_)).toDF("v")
    assert(Profiler.wassersteinDrift(a, b2, "v").collect()(0).getAs[Double]("w1") === 1.0)

    // one side empty -> NULL W1 (nothing to compare)
    val e = spark.emptyDataFrame.withColumn("v", org.apache.spark.sql.functions.lit(1L)).limit(0)
    val r0 = Profiler.wassersteinDrift(a, e.select("v"), "v").collect()(0)
    assert(r0.isNullAt(r0.fieldIndex("w1")))
  }

  test("hellinger drift: zero on identical, one on disjoint, half-overlap golden") {
    import spark.implicits._
    import graft.quality.Profiler
    val a = (Seq.fill(5)("x") ++ Seq.fill(5)("y")).map(Tuple1(_)).toDF("v")
    val same = Profiler.hellingerDrift(a, a, "v").collect()(0)
    assert(same.getAs[Double]("h2") === 0.0) // 2 * nano(0.5) sums to exactly 1e9
    assert(same.getAs[Double]("hellinger") === 0.0)

    val b = (Seq.fill(5)("p") ++ Seq.fill(5)("q")).map(Tuple1(_)).toDF("v")
    val disj = Profiler.hellingerDrift(a, b, "v").collect()(0)
    assert(disj.getAs[Long]("bc9") === 0L)
    assert(disj.getAs[Double]("hellinger") === 1.0)

    // A all-x vs B half-x: BC = sqrt(1 * 0.5), H = sqrt(1 - BC)
    val ax = Seq.fill(4)("x").map(Tuple1(_)).toDF("v")
    val bx = (Seq.fill(2)("x") ++ Seq.fill(2)("z")).map(Tuple1(_)).toDF("v")
    val r = Profiler.hellingerDrift(ax, bx, "v").collect()(0)
    val bc = math.round(math.sqrt(0.5) * 1e9).toDouble / 1e9
    assert(math.abs(r.getAs[Double]("h2") - (1.0 - bc)) < 1e-12)
    assert(math.abs(r.getAs[Double]("hellinger") - math.sqrt(1.0 - bc)) < 1e-12)
  }

  test("profiler computes all metrics for all columns in one pass") {
    import spark.implicits._
    val d = Seq(
      (Some(1L), "a"), (Some(2L), "b"), (None, "b"), (Some(2L), null)
    ).toDF("k", "s")
    val p = Profiler.profile(d, Seq("k", "s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(p(("k", "non_nulls")) == "3" && p(("k", "nulls")) == "1")
    assert(p(("k", "distinct")) == "2" && p(("k", "min")) == "1" && p(("k", "max")) == "2")
    assert(p(("s", "non_nulls")) == "3" && p(("s", "nulls")) == "1")
    assert(p(("s", "distinct")) == "2" && p(("s", "min")) == "a" && p(("s", "max")) == "b")
    // approx variant agrees on these tiny cardinalities
    val pa = Profiler.profileApprox(d, Seq("k"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(pa(("k", "distinct")) == "2")
  }

  test("deterministic sampling: stable rows, exact binary thresholds, plausible rate") {
    assert(Sampling.hexThreshold(0.5) == "800000000000000")
    assert(Sampling.hexThreshold(0.25) == "400000000000000")
    assert(Sampling.hexThreshold(0.0) == "000000000000000")
    assert(Sampling.hexThreshold(1.0) == "g")
    val ord = Tables.orders(spark, sf)
    val s1 = Sampling.deterministic(ord, Seq("o_orderkey"), 0.5)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministic(ord.repartition(7), Seq("o_orderkey"), 0.5)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample must be independent of partitioning")
    val n = ord.count().toDouble
    assert(math.abs(s1.size / n - 0.5) < 0.1)
    // nested: the 25% sample is a strict subset of the 50% sample
    val s3 = Sampling.deterministic(ord, Seq("o_orderkey"), 0.25)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(s3.subsetOf(s1))
  }

  test("sharding: deterministic, partitioning-independent, balanced, complete") {
    import graft.operators.Sharding
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
    val k = 8
    val a = Sharding.assignShards(docs, Seq("doc_id"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Sharding.assignShards(docs.repartition(7), Seq("doc_id"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b, "shard assignment must be independent of partitioning")
    assert(a.values.forall(s => s >= 0 && s < k))
    // balance: no shard more than 2x the ideal share on 500 docs
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == k && sizes.max < 2.0 * a.size / k, s"unbalanced: $sizes")
    // summary accounts for every row exactly once
    val summary = Sharding.shardSummary(docs, Seq("doc_id"), k, Some("n_chars"))
      .agg(org.apache.spark.sql.functions.sum("n_rows")).head().getLong(0)
    assert(summary == docs.count())
    // layoutByShard: a shard is never split across task partitions
    val parts = Sharding.layoutByShard(docs, Seq("doc_id"), k)
      .select("shard").rdd.mapPartitions(it => Iterator(it.map(_.getLong(0)).toSet))
      .collect()
    val partitionsPerShard = parts.zipWithIndex
      .flatMap { case (ss, pi) => ss.map(_ -> pi) }
      .groupBy(_._1).map(_._2.map(_._2).distinct.length)
    assert(partitionsPerShard.forall(_ == 1), "a shard spans multiple partitions")
  }

  test("sqrt temperature resampling rebalances toward the rarest group") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = before.values.min
    val kept = Sampling.sqrtResample(docs, Seq("lang"), Seq("doc_id"))
    val after = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rarest group keeps everything (p = 1); others shrink toward sqrt scale
    val rarest = before.minBy(_._2)._1
    assert(after(rarest) == before(rarest))
    before.foreach { case (g, n) =>
      val expected = math.sqrt(nMin.toDouble / n) * n
      assert(math.abs(after(g) - expected) < 0.35 * expected + 5,
        s"$g: kept ${after(g)}, expected ~$expected of $n")
    }
    // deterministic: same selection on a different partitioning
    val k2 = Sampling.sqrtResample(docs.repartition(5), Seq("lang"), Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k2 == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
    // lower alpha flattens harder, and samples at different alphas NEST
    // (shared per-row uniform vs monotone per-group probability)
    def ids(aq: Int) = Sampling.temperatureResample(docs, Seq("lang"), Seq("doc_id"), aq)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val (a1, a2, a3) = (ids(1), ids(2), ids(3))
    assert(a1.subsetOf(a2) && a2.subsetOf(a3))
    val dominant = before.maxBy(_._2)._1
    def nDominant(s: Set[Long]) = docs.filter(col("lang") === dominant)
      .select("doc_id").collect().map(_.getLong(0)).count(s)
    assert(nDominant(a1) < nDominant(a2) && nDominant(a2) < nDominant(a3))
    // the general dyadic grid: same sqrt-chain construction, so eighths
    // that coincide with quarters are bit-identical, and the whole denser
    // grid still nests (shared uniform + monotone exponent)
    def dyadic(n: Int, d: Int) = Sampling.temperatureResampleDyadic(
        docs, Seq("lang"), Seq("doc_id"), n, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dyadic(2, 8) == a1, "alpha 2/8 must equal the quarters 1/4 sample exactly")
    assert(dyadic(4, 8) == a2 && dyadic(6, 8) == a3)
    val grid = (1 to 8).map(n => dyadic(n, 8))
    grid.sliding(2).foreach { w => assert(w(0).subsetOf(w(1)),
      "dyadic alpha grid must nest") }
    assert(grid.last == docs.select("doc_id").collect().map(_.getLong(0)).toSet,
      "alpha = 1 must keep every row")
    // a finer denominator slots strictly between its neighbors
    assert(dyadic(4, 16).subsetOf(dyadic(5, 16)) && dyadic(5, 16).subsetOf(dyadic(6, 16)))
    assert(dyadic(5, 16).size > dyadic(4, 16).size || dyadic(6, 16).size > dyadic(5, 16).size)
    // a NULL group is a group like any other: its rows survive the prob
    // join (null-safe) instead of silently vanishing
    val withNull = docs.unionByName(
      Seq((777001L, null.asInstanceOf[String]), (777002L, null.asInstanceOf[String]))
        .toDF("doc_id", "lang"))
    val keptNull = Sampling.sqrtResample(withNull, Seq("lang"), Seq("doc_id"))
      .filter(col("lang").isNull).count()
    assert(keptNull == 2L, s"NULL-group rows lost: kept $keptNull of 2 (rarest group keeps all)")
  }

  test("epochPlan floor arithmetic goldens; epochExpand materializes full + partial epochs deterministically") {
    import spark.implicits._
    // group a: 2 docs, 100 tokens; group b: 1 doc, 50 tokens
    val docs = Seq((1L, "a", 60L), (2L, "a", 40L), (3L, "b", 50L)).toDF("doc_id", "g", "toks")
    val weights = Seq(("a", 1L), ("b", 3L)).toDF("g", "weight")
    // budget 1000, sumw 4: target_a = 250 -> 2 full epochs + 50 remainder;
    // target_b = 750 -> 15 full epochs + 0 remainder
    val plan = Sampling.epochPlan(docs, Seq("g"), "toks", weights, budgetTokens = 1000L)
    val p = plan.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(p("a") == (2L, 100L, 250L, 2L, 50L), s"got ${p("a")}")
    assert(p("b") == (1L, 50L, 750L, 15L, 0L), s"got ${p("b")}")
    val exp = Sampling.epochExpand(docs, Seq("g"), Seq("doc_id"), plan)
    // group b: exactly 15 copies of its one doc, no partial epoch
    assert(exp.filter(col("g") === "b").count() == 15L)
    assert(exp.filter(col("g") === "b").agg(max("epoch")).head().getInt(0) == 15)
    // group a: 2 full epochs of both docs + each doc in the partial epoch
    // with p = 50/100 — whatever the md5 draw, counts are deterministic
    val aCounts = exp.filter(col("g") === "a").groupBy("epoch").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(aCounts(1) == 2L && aCounts(2) == 2L)
    assert(aCounts.getOrElse(3, 0L) <= 2L)
    // deterministic across partitionings
    val e1 = exp.select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val e2 = Sampling.epochExpand(docs.repartition(5), Seq("g"), Seq("doc_id"), plan)
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(e1 == e2)
    // an input whose token column is literally named "tokens" (colliding
    // with the plan's own column) must still expand — regression for the
    // AMBIGUOUS_REFERENCE the reserved plan aliases prevent
    val collide = docs.withColumnRenamed("toks", "tokens")
    val planC = Sampling.epochPlan(collide, Seq("g"), "tokens", weights, 1000L)
    assert(Sampling.epochExpand(collide, Seq("g"), Seq("doc_id"), planC)
      .filter(col("g") === "b").count() == 15L)
    // a group with zero weight row is excluded; zero-token groups don't divide by zero
    val zt = Seq((9L, "z", 0L)).toDF("doc_id", "g", "toks")
    val pz = Sampling.epochPlan(zt, Seq("g"), "toks", Seq(("z", 1L)).toDF("g", "weight"), 100L)
      .collect().head
    assert(pz.getLong(5) == 0L && pz.getLong(6) == 0L) // full_epochs, remainder
    assert(Sampling.epochPlan(docs, Seq("g"), "toks",
      Seq(("a", 1L)).toDF("g", "weight"), 100L).count() == 1L)
  }

  test("topFractionByScore keeps the best-scored fraction per group, deterministic ties") {
    import spark.implicits._
    val d = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 1.0)
    ).toDF("g", "id", "score")
    // 50% of 4 = 2 rows for group a: the two score-30 rows, tie -> lower id
    // first (both kept here); group b: ceil(1*0.5)=1 keeps its only row
    val kept = Sampling.topFractionByScore(d, Seq("g"), "score", Seq("id"), 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L))
    // 25% of 4 = 1 row: the score-30 tie breaks to the LOWER id
    val kept25 = Sampling.topFractionByScore(d, Seq("g"), "score", Seq("id"), 0.25)
      .filter($"g" === "a").select("id").collect().map(_.getLong(0)).toSet
    assert(kept25 == Set(2L))
    // partitioning-independent
    val k2 = Sampling.topFractionByScore(d.repartition(3), Seq("g"), "score", Seq("id"), 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(k2 == kept)
  }

  test("scd2 collapses unchanged runs and closes intervals") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "B"), (1L, 5L, "A"),
      (2L, 1L, "X")
    ).toDF("id", "seq", "st")
    val h = Scd2.build(log, Seq("id"), Seq("seq"), Seq("st"))
      .select("id", "st", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(h == Set(
      (1L, "A", 1L, 3L, false),
      (1L, "B", 3L, 5L, false),
      (1L, "A", 5L, -1L, true),
      (2L, "X", 1L, -1L, true)
    ))
  }

  test("scd2 merge: incremental fold equals full rebuild; untouched entities pass through") {
    import spark.implicits._
    // A changes at the boundary, B extends its open run (must collapse),
    // C exists only in history, D is batch-new
    val part1 = Seq(
      ("A", 1L, "x"), ("A", 2L, "y"),
      ("B", 1L, "k"), ("B", 3L, "k"),
      ("C", 2L, "c")
    ).toDF("e", "t", "v")
    val part2 = Seq(
      ("A", 5L, "z"),
      ("B", 6L, "k"), ("B", 7L, "m"),
      ("D", 5L, "d")
    ).toDF("e", "t", "v")
    val full = Scd2.build(part1.unionByName(part2), Seq("e"), Seq("t"), Seq("v"))
    val merged = Scd2.merge(Scd2.build(part1, Seq("e"), Seq("t"), Seq("v")), part2,
      Seq("e"), Seq("t"), Seq("v"))
    val cols = Seq("e", "v", "valid_from", "valid_to", "is_current").map(col(_))
    assert(merged.select(cols: _*).exceptAll(full.select(cols: _*)).isEmpty
      && full.select(cols: _*).exceptAll(merged.select(cols: _*)).isEmpty)
    // B's open run collapsed across the boundary: still one version from t=1
    val b = merged.filter($"e" === "B" && $"v" === "k").collect()
    assert(b.length == 1 && b.head.getAs[Long]("valid_from") == 1L
      && b.head.getAs[Long]("valid_to") == 7L)
    // C (untouched) kept its open version
    val c = merged.filter($"e" === "C").collect()
    assert(c.length == 1 && c.head.getAs[Boolean]("is_current"))
  }

  test("pii scan flags and redacts emails/phones/urls/ips") {
    import spark.implicits._
    import graft.text.PiiScan
    val d = Seq(
      ("mail me at bob@example.com please", true, false, false, false),
      ("call +1 (555) 123-4567 now", false, true, false, false),
      ("see https://example.com/x?y=1 for details", false, false, true, false),
      ("server at 10.0.0.1 is down", false, false, false, true),
      ("perfectly clean text", false, false, false, false)
    ).toDF("text", "e", "p", "u", "i")
    val f = PiiScan.flags(d, "text")
    val rows = f.collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pii_email") == r.getAs[Boolean]("e"), r.getString(0))
      assert(r.getAs[Boolean]("pii_phone") == r.getAs[Boolean]("p"), r.getString(0))
      assert(r.getAs[Boolean]("pii_url") == r.getAs[Boolean]("u"), r.getString(0))
      assert(r.getAs[Boolean]("pii_ip") == r.getAs[Boolean]("i"), r.getString(0))
    }
    val red = d.select(PiiScan.redact(col("text")).as("t")).as[String].collect().mkString(" ")
    assert(!red.contains("bob@example.com") && !red.contains("10.0.0.1"))
    assert(red.contains("<EMAIL>") && red.contains("<URL>"))
    // ordered redaction: an email-shaped substring INSIDE a url must be
    // swallowed by the url pass (fixed Seq order), not leave a mangled mix
    val tricky = Seq("read https://example.com/u/bob@example.com/profile today").toDF("text")
      .select(PiiScan.redact(col("text")).as("t")).as[String].head()
    assert(tricky == "read <URL> today", tricky)
  }

  test("k-anonymity: sub-k groups listed exactly, summary counts rows at risk") {
    import spark.implicits._
    import graft.quality.Anonymity
    val d = (Seq.fill(5)(("x", 1)) ++ Seq.fill(2)(("x", 2)) ++ Seq(("y", 1)))
      .toDF("a", "b")
    val v = Anonymity.kAnonymityViolations(d, Seq("a", "b"), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(v == Set(("x", 2, 2L), ("y", 1, 1L)))
    val s = Anonymity.kAnonymitySummary(d, Seq("a", "b"), k = 3).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ==
      ((3L, 2L, 3L, 1L)))
    // k larger than every group: everything violates, all rows at risk
    val all = Anonymity.kAnonymitySummary(d, Seq("a", "b"), k = 100).head()
    assert(all.getLong(1) == 3L && all.getLong(2) == 8L)
  }

  test("l-diversity: homogeneous groups flagged even when k-anonymous") {
    import spark.implicits._
    import graft.quality.Anonymity
    val d = Seq(
      // group x: 5 rows, 3 distinct sensitive values -> diverse at l=3
      ("x", "s1"), ("x", "s1"), ("x", "s2"), ("x", "s3"), ("x", "s2"),
      // group y: 4 rows, ONE sensitive value -> k-anonymous at k=4 but
      // homogeneous: every member's value is revealed
      ("y", "s1"), ("y", "s1"), ("y", "s1"), ("y", "s1"))
      .toDF("q", "s")
    val v = Anonymity.lDiversityViolations(d, Seq("q"), "s", l = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(v == Seq(("y", 4L, 1L)))
    assert(Anonymity.kAnonymityViolations(d, Seq("q"), k = 4).count() == 0)
  }

  test("t-closeness: skewed groups flagged though k-anonymous AND l-diverse; exact strict boundary") {
    import spark.implicits._
    import graft.quality.Anonymity
    // global A/B split 15/15 over N=30; g1 = 9A+1B and g2 = 1A+9B are
    // both size-10 (k-anonymous at k=10) and 2-valued (l-diverse at
    // l=2), yet each sits TVD = 0.4 from the global distribution — the
    // skewness attack only the third leg sees; g3 = 5A+5B matches it
    val d = ((Seq.fill(9)(("g1", "A")) :+ (("g1", "B"))) ++
      ((("g2", "A")) +: Seq.fill(9)(("g2", "B"))) ++
      Seq.fill(5)(("g3", "A")) ++ Seq.fill(5)(("g3", "B"))).toDF("q", "s")
    val v = Anonymity.tClosenessViolations(d, Seq("q"), "s", tPpm = 300000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // dist_num per skewed group: |9·30 − 15·10| + |1·30 − 15·10| = 240;
    // tvd = 240 / (2·10·30) = 0.4 exactly
    assert(v == Set(("g1", 10L, 240L, 0.4), ("g2", 10L, 240L, 0.4)))
    assert(Anonymity.kAnonymityViolations(d, Seq("q"), k = 10).count() == 0)
    assert(Anonymity.lDiversityViolations(d, Seq("q"), "s", l = 2).count() == 0)
    // STRICT boundary, decided in integers: tvd exactly == t passes
    assert(Anonymity.tClosenessViolations(d, Seq("q"), "s", tPpm = 400000L).count() == 0)
    // NULL sensitive rows sit in neither distribution
    val dn = d.union(Seq(("g3", Option.empty[String])).toDF("q", "s"))
    val vn = Anonymity.tClosenessViolations(dn, Seq("q"), "s", tPpm = 300000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(vn == v)
    // a NULL-QUASI group is a group like any other: one whose sensitive
    // distribution matches the corpus must NOT be flagged (the equi-join
    // never matched NULL keys to their own counts -> phantom tvd 0.5)
    val dq = (Seq.fill(5)((Option.empty[String], "A")) ++
      Seq.fill(5)((Option.empty[String], "B")) ++
      Seq.fill(5)((Option("z"), "A")) ++ Seq.fill(5)((Option("z"), "B")))
      .toDF("q", "s")
    assert(Anonymity.tClosenessViolations(dq, Seq("q"), "s", tPpm = 100000L).count() == 0)
  }

  test("temporalSplit: embargo window excluded from BOTH sides") {
    import spark.implicits._
    import graft.operators.Sampling
    val d = Seq(0L, 50L, 99L, 100L, 150L, 199L, 200L, 300L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "sec")
      .select($"id", timestamp_seconds($"sec").as("ts"))
    val got = Sampling.temporalSplit(d, "ts", cutoffSec = 200L, embargoSec = 100L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // train: sec < 100; embargo [100, 200) dropped; test: sec >= 200
    assert(got == Map(0L -> "train", 1L -> "train", 2L -> "train",
      6L -> "test", 7L -> "test"))
    // zero embargo degenerates to a plain cutoff split, nothing dropped
    val z = Sampling.temporalSplit(d, "ts", cutoffSec = 200L, embargoSec = 0L)
    assert(z.count() == 8L)
  }

  test("centroidDrift: exact power-of-two quantization, negative floors, cross-multiplied diff") {
    import spark.implicits._
    import graft.quality.VectorQuality
    val a = Seq((1L, Seq(1.0f, -0.5f)), (2L, Seq(0.5f, 0.25f))).toDF("id", "v")
    val b = Seq((3L, Seq(0.0f, 1.0f))).toDF("id", "v")
    val got = VectorQuality.centroidDrift(a, b, "v")
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val S = VectorQuality.DriftScale // 2^20: scaling is EXACT, incl. negatives
    assert(got.toSeq == Seq(
      (0, (S + S / 2), 2L, 0L, 1L, (S + S / 2) * 1 - 0 * 2),
      (1, (-S / 2 + S / 4), 2L, S, 1L, (-S / 2 + S / 4) * 1 - S * 2)))
    // identical slices -> every diff is exactly zero
    val same = VectorQuality.centroidDrift(a, a, "v")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.abs(col("diff_scaled")))).head().getLong(0)
    assert(same == 0L)
  }

  test("vector quality: each defect counted once, extremes ignore defective rows") {
    import spark.implicits._
    import graft.quality.VectorQuality
    val rows = Seq(
      (1L, Some(Seq(Some(3.0f), Some(4.0f)))),     // norm2 25
      (2L, Some(Seq(Some(1.0f), Some(0.0f)))),     // norm2 1
      (3L, None),                                   // null vector
      (4L, Some(Seq(Some(1.0f)))),                  // wrong dim
      (5L, Some(Seq(Some(Float.NaN), Some(2.0f)))), // NaN carrier (right dim)
      (6L, Some(Seq(Some(0.0f), Some(0.0f)))),      // zero vector
      (7L, Some(Seq(None, Some(1.0f))))             // NULL element — the
        // three-valued-logic blind spot: must count, not slip through
    ).toDF("id", "v")
    val r = VectorQuality.report(rows, "v", expectedDim = 2).head()
    assert(r.getLong(0) == 7L)                    // n_rows
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L && r.getLong(3) == 1L
      && r.getLong(4) == 1L && r.getLong(5) == 1L)
    assert(r.getDouble(6) == 0.0)                 // min over clean rows includes the zero vec
    assert(r.getDouble(7) == 25.0)
    // NaN in a wrong-dim row counts as bad dim AND nan? no: defect flags
    // are independent observations, each row can carry several
    val both = Seq((8L, Some(Seq(Float.NaN)))).toDF("id", "v")
    val b = VectorQuality.report(both, "v", expectedDim = 2).head()
    assert(b.getLong(2) == 1L && b.getLong(4) == 1L)
  }

  test("checksum ids: Luhn/IBAN goldens, separator stripping, false positives survive") {
    import spark.implicits._
    import graft.text.PiiScan
    // column-level validators against published test values
    val v = Seq(
      ("4111111111111111", true),   // classic Visa test number
      ("4111111111111112", false),  // one digit off
      ("4532015112830366", true),
      ("1234567812345678", false),  // 16 digits, NOT Luhn — the false-positive contract
      ("79927398713", true),        // the ISO worked example
      ("", false)
    ).toDF("d", "ok")
    v.select(PiiScan.luhnValid(col("d")).as("got"), col("ok")).collect()
      .foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    val ib = Seq(
      ("GB82WEST12345698765432", true),
      ("DE89370400440532013000", true),
      ("DE89370400440532013001", false), // last digit flipped
      ("", false)
    ).toDF("c", "ok")
    ib.select(PiiScan.ibanValid(col("c")).as("got"), col("ok")).collect()
      .foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    // scan: spaced/dashed forms strip to the same digits; non-Luhn runs
    // and non-mod-97 IBANs survive the scrubber's attention entirely
    val d = Seq(
      (1L, "pay 4111 1111 1111 1111 or 4111-1111-1111-1111 thanks"),
      (2L, "order id 1234567812345678 is not a card"),
      (3L, "wire to GB82WEST12345698765432 or DE89370400440532013001"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = PiiScan.checksumScan(d, "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Seq[String]]("cards_valid"), r.getAs[Seq[String]]("ibans_valid")))).toMap
    assert(got(1L) == ((Seq("4111111111111111", "4111111111111111"), Seq.empty)))
    assert(got(2L) == ((Seq.empty, Seq.empty))) // 16-digit non-Luhn NOT flagged
    assert(got(3L) == ((Seq.empty, Seq("GB82WEST12345698765432"))))
    assert(got(4L) == ((Seq.empty, Seq.empty)))
  }

  test("keyHash distinguishes NULL positions in multi-column keys") {
    import spark.implicits._
    // concat_ws silently drops NULLs: without the sentinel these three
    // keys would collide and always land in the same sample/split bucket
    val d = Seq(
      (Option("a"), Option("b"), 1L),
      (Option("a"), None, 2L),
      (None, Option("b"), 3L),
      (Option("a"), Option("b"), 4L) // true duplicate of row 1's key
    ).toDF("k1", "k2", "id")
    val h = d.select(col("id"), Sampling.keyHash(Seq(col("k1"), col("k2"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(1L) != h(2L) && h(1L) != h(3L) && h(2L) != h(3L))
    assert(h(1L) == h(4L))
  }

  test("profiler handles hostile column names (quotes, backticks, dots)") {
    import spark.implicits._
    import graft.quality.Profiler
    val d = Seq((1, "x"), (2, "y"), (2, null))
      .toDF("weird`col", "it's.dotted")
    val p = Profiler.profile(d, Seq("weird`col", "it's.dotted"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(p(("weird`col", "distinct")) == "2")
    assert(p(("it's.dotted", "nulls")) == "1")
    assert(p(("it's.dotted", "max")) == "y")
  }

  test("splitAssign is disjoint, exhaustive, deterministic and roughly proportional") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val n = docs.count().toDouble
    val s = Sampling.splitAssign(docs, Seq("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n.toLong)                       // exhaustive
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(math.abs(counts("train") / n - 0.75) < 0.1)
    val again = Sampling.splitAssign(docs.repartition(5), Seq("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)                                     // partitioning-independent
  }

  test("type-token ratio detects repetition") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val d = Seq(("a a a a", 1), ("w x y z", 2)).toDF("text", "id")
    val t = TextAnalysis.typeTokenRatio(d, "text")
      .select("id", "n_tokens", "n_distinct", "ttr")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(t(1) == (4L, 1L, 0.25))
    assert(t(2) == (4L, 4L, 1.0))
  }

  test("distribution drift: zero on identical snapshots, fires on a real shift") {
    import spark.implicits._
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    // identical distributions → every term ~0 (exactly 0: same smoothed shares)
    val same = Profiler.distributionDrift(base, base, "v", 0.0, 100.0, 10)
    val (chi0, psi0) = Profiler.driftStats(same)
    assert(math.abs(chi0) < 1e-12 && math.abs(psi0) < 1e-12)
    // shifted: mass moved up by 50 → strong signal on both statistics
    val shifted = base.select(($"v" + 50.0).as("v"))
    val (chi1, psi1) = Profiler.driftStats(
      Profiler.distributionDrift(base, shifted, "v", 0.0, 100.0, 10))
    assert(chi1 > 0.25 && psi1 > 0.25, s"chi2=$chi1 psi=$psi1")
    // empty buckets stay finite through smoothing
    val sparse = Seq(5.0).toDF("v")
    val terms = Profiler.distributionDrift(base, sparse, "v", 0.0, 100.0, 10)
      .select("chi2_term", "psi_term").collect()
    assert(terms.forall(r => !r.getDouble(0).isNaN && !r.getDouble(0).isInfinite
      && !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
  }

  test("KS drift: hand-computed golden, zero on identical snapshots, decimal numerator") {
    import spark.implicits._
    // base = {1,1,2}, cur = {2,3}, 4 unit buckets on [0,4):
    //   bucket 1: cum_b=2 cum_c=0 → |2·2 − 0·3| = 4
    //   bucket 2: cum_b=3 cum_c=1 → |3·2 − 1·3| = 3
    //   bucket 3: cum_b=3 cum_c=2 → |3·2 − 2·3| = 0
    val base = Seq(1.0, 1.0, 2.0).toDF("v")
    val cur = Seq(2.0, 3.0).toDF("v")
    val ks = Profiler.ksDrift(base, cur, "v", 0.0, 4.0, 4)
    val rows = ks.orderBy("bucket").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getDecimal(5).longValueExact()))
      .toMap
    assert(rows == Map(1L -> ((2L, 0L, 4L)), 2L -> ((3L, 1L, 3L)), 3L -> ((3L, 2L, 0L))))
    // D = max ks_num / (tot_b·tot_c) = 4/6
    assert(math.abs(Profiler.ksStat(ks) - 4.0 / 6.0) < 1e-15)
    // identical snapshots → every numerator exactly zero (integers, not ~0)
    val same = Profiler.ksDrift(base, base, "v", 0.0, 4.0, 4)
    assert(same.collect().forall(_.getDecimal(5).signum == 0))
    assert(Profiler.ksStat(same) == 0.0)
    // numerator column is DECIMAL(38,0): 100 TB-count products must not
    // silently wrap a long
    assert(ks.schema("ks_num").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 0))
    // a shift registers: base vs base+2 on the same binning
    val d = Profiler.ksStat(Profiler.ksDrift(base, base.select(($"v" + 2.0).as("v")), "v", 0.0, 4.0, 4))
    assert(d > 0.5)
  }

  test("chi-square drift: hand-computed golden, absent value contributes, zero on identical") {
    import spark.implicits._
    // base = {a,a,b}, cur = {b,b,c}: B=3, C=3, N=6
    //   a: (2·3 − 0·3)² = 36, cell 2;  b: (1·3 − 2·3)² = 9, cell 3
    //   c: (0·3 − 1·3)² = 9, cell 1 — the value ABSENT from base drifts
    val base = Seq("a", "a", "b").toDF("k")
    val cur = Seq("b", "b", "c").toDF("k")
    val d = Profiler.chiSquareDrift(base, cur, "k")
    val rows = d.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact(), r.getLong(4)))).toMap
    assert(rows == Map(
      "a" -> ((2L, 0L, 36L, 2L)),
      "b" -> ((1L, 2L, 9L, 3L)),
      "c" -> ((0L, 1L, 9L, 1L))))
    // χ² = (1/(B·C)) · Σ num/tot = (18 + 3 + 9)/9 = 10/3 — cross-checked
    // against the textbook Σ(O−E)²/E on the same 2×3 table:
    // 2·(1/1) + 2·(0.25/1.5) + 2·(0.25/0.5) = 2 + 1/3 + 1
    val (chi, df) = Profiler.chiSquareStat(d)
    assert(math.abs(chi - 10.0 / 3.0) < 1e-12 && df == 2L)
    // identical snapshots → every numerator exactly zero, χ² = 0
    val same = Profiler.chiSquareDrift(base, base, "k")
    assert(same.collect().forall(_.getDecimal(3).signum == 0))
    assert(Profiler.chiSquareStat(same)._1 == 0.0)
    // decimal(38,0) numerator — 100 TB-count products must not wrap a long
    assert(d.schema("chi_num").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 0))
    // the NULL category matches ITSELF across snapshots: identical
    // distributions containing NULLs must show ZERO drift (a plain
    // equi-join split the NULL row into two one-sided cells)
    val withNull = Seq(Some("a"), None, Some("a"), None).toDF("k")
    val nd = Profiler.chiSquareDrift(withNull, withNull, "k")
    assert(nd.count() == 2 && nd.collect().forall(_.getDecimal(3).signum == 0))
    assert(Profiler.chiSquareStat(nd)._1 == 0.0)
  }

  test("correlation: golden r, perfect/anti/constant shapes, pairwise NULL exclusion") {
    import spark.implicits._
    // golden: x=(1,2,3), y=(2,1,4) -> n=3 sx=6 sy=7 sxy=16 sxx=14 syy=21
    // num=48-42=6, dx=42-36=6, dy=63-49=14 -> r = 6/sqrt(84)
    val g = Seq(("g", 1L, 2L), ("g", 2L, 1L), ("g", 3L, 4L)).toDF("k", "x", "y")
    val r = Profiler.correlation(g, Seq("k"), "x", "y").head()
    assert(r.getLong(1) == 3L && r.getDouble(2) == 6.0 && r.getDouble(3) == 7.0)
    assert(r.getDouble(4) == 6.0 / math.sqrt(6.0 * 14.0))
    // exact linear relation in both directions
    val perfect = (1 to 9).map(i => ("p", i.toLong, 3L * i + 7)).toDF("k", "x", "y")
    assert(Profiler.correlation(perfect, Seq("k"), "x", "y").head().getDouble(4) == 1.0)
    val anti = (1 to 9).map(i => ("a", i.toLong, -2L * i)).toDF("k", "x", "y")
    assert(Profiler.correlation(anti, Seq("k"), "x", "y").head().getDouble(4) == -1.0)
    // constant column: zero variance -> r NULL, moments still exact
    val const = (1 to 5).map(i => ("c", i.toLong, 4L)).toDF("k", "x", "y")
    val rc = Profiler.correlation(const, Seq("k"), "x", "y").head()
    assert(rc.getDouble(3) == 20.0 && rc.isNullAt(4))
    // a NULL on either side drops the PAIR only
    val withNull = g.unionByName(
      Seq(("g", Option.empty[Long], Option(9L)),
        ("g", Option(9L), Option.empty[Long])).toDF("k", "x", "y"))
    assert(Profiler.correlation(withNull, Seq("k"), "x", "y").head().getLong(1) == 3L)
  }

  test("capPerGroup: cap respected, selection content-stable under repartition") {
    import spark.implicits._
    val d = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val capped = Sampling.capPerGroup(d, Seq("g"), Seq("id"), 20)
    val byGroup = capped.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup.values.forall(_ == 20L) && byGroup.size == 3)
    // identical kept set regardless of physical layout or row order
    val reshuffled = Sampling.capPerGroup(d.repartition(7).orderBy($"id".desc), Seq("g"), Seq("id"), 20)
    assert(capped.select("id").collect().map(_.getLong(0)).sorted.sameElements(
      reshuffled.select("id").collect().map(_.getLong(0)).sorted))
    // groups under the cap pass through whole
    val tiny = Seq((1L, "g"), (2L, "g")).toDF("id", "g")
    assert(Sampling.capPerGroup(tiny, Seq("g"), Seq("id"), 20).count() == 2)
    // Spark 4 plans the rank filter as a WindowGroupLimit (pre-shuffle prune)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("packing: concat-then-chunk semantics, deterministic under repartition") {
    import graft.text.Packing
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, "g", 10L + (i % 7))).toDF("id", "g", "toks")
    val a = Packing.chunkAssignments(docs, Seq("g"), Seq("id"), "toks", budget = 64L)
    val rows = a.orderBy("pack_order")
      .select("id", "toks", "start_offset", "bin").collect()
    // concatenation invariant: each start_offset is the previous cum total
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == cum, s"doc ${r.getLong(0)} offset ${r.getLong(2)} != $cum")
      assert(r.getLong(3) == r.getLong(2) / 64L) // bin = chunk of first token
      cum += r.getLong(1)
    }
    // total mass conserved through the summary
    val summary = Packing.packSummary(docs, Seq("g"), Seq("id"), "toks", 64L)
    assert(summary.agg(sum("tok_sum")).head().getLong(0) == cum)
    // deterministic under physical layout changes
    val b = Packing.chunkAssignments(docs.repartition(5).orderBy($"id".desc),
      Seq("g"), Seq("id"), "toks", 64L)
    assert(a.select("id", "bin").exceptAll(b.select("id", "bin")).isEmpty)
    // a doc longer than the budget swallows following chunk ids (gaps allowed)
    val big = Seq((1L, "g", 200L), (2L, "g", 10L), (3L, "g", 10L)).toDF("id", "g", "toks")
    val bins = Packing.packSummary(big, Seq("g"), Seq("id"), "toks", 64L)
      .select("bin").collect().map(_.getLong(0)).sorted
    assert(bins.head == 0L && bins.last >= 3L)
  }

  test("fuzzy match: blocked levenshtein pairs, caps, null safety") {
    import graft.text.FuzzyMatch
    import spark.implicits._
    val d = Seq(
      (1L, "jonathan smith"), (2L, "jonathon smith"),   // dist 1, same block
      (3L, "jane doe"), (4L, "john doe"),               // dist 3, same block
      (5L, "zz top"), (6L, null.asInstanceOf[String])   // lone block; null never pairs
    ).toDF("id", "name")
    val pairs = FuzzyMatch.blockedPairs(d, "id", "name",
      blockKey = expr("substring(name, length(name) - 3, 4)"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1)))
    // bucket cap drops a degenerate block instead of going quadratic
    val hot = (1L to 50L).map(i => (i, s"name$i", "same")).toDF("id", "name", "blk")
    val capped = FuzzyMatch.blockedPairs(hot, "id", "name", col("blk"), maxDist = 100,
      maxBucketSize = 10)
    assert(capped.count() == 0)
    // phonetic blocking: soundex groups sound-alike spellings into one block
    val ph = Seq((1L, "smith"), (2L, "smyth"), (3L, "jones")).toDF("id", "name")
    val phPairs = FuzzyMatch.blockedPairs(ph, "id", "name", soundex(col("name")), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(phPairs.toSeq == Seq((1L, 2L)))
  }

  test("split assignment on a group key keeps every group's rows in one split") {
    import spark.implicits._
    // split by SOURCE, not by row: the leakage-safe holdout (all docs of a
    // crawl host land in the same split, so near-dups can't straddle)
    val docs = (1L to 300L).map(i => (i, s"src${i % 30}")).toDF("id", "source")
    val assigned = Sampling.splitAssign(docs, Seq("source"),
      Seq(("train", 0.75), ("val", 0.125), ("test", 0.125)))
    val perGroup = assigned.groupBy("source")
      .agg(countDistinct("split").as("n_splits"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 1L), "a source straddled splits")
    assert(assigned.select("split").distinct().count() >= 2)
  }

  test("heavy hitters: exact counts, deterministic tie-break, grouped top-k") {
    import spark.implicits._
    val docs = Seq("b a a", "B c", "a c").toDF("text")
    val top = HeavyHitters.topTokens(docs, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a", 3L), ("b", 2L)))
    val grouped = Seq(("g1", "x x y"), ("g2", "z")).toDF("g", "text")
    val g = HeavyHitters.topTokensByGroup(grouped, "g", "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(g == Set(("g1", "x", 2L), ("g2", "z", 1L)))
  }

  test("Misra-Gries sketch recovers the exact top-k on skewed vocabulary") {
    import spark.implicits._
    // Zipf-ish: token t_i appears ~600/i times, plus a long unique tail;
    // rows shuffled across partitions so partial summaries really merge
    val toks = (1 to 30).flatMap(i => Seq.fill(600 / i)(s"t$i")) ++
      (1 to 3000).map(i => s"tail$i")
    val docs = scala.util.Random.shuffle(toks).grouped(25)
      .map(_.mkString(" ")).toSeq.toDF("text").repartition(8)
    val exact = HeavyHitters.topTokens(docs, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val approx = HeavyHitters.approxTopTokens(docs, "text", 10, sketchSize = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(approx.map(_._1).sameElements(exact.map(_._1)),
      s"order differs: exact=${exact.mkString(",")} approx=${approx.mkString(",")}")
    // MG bound: est undercounts by at most N/(sketchSize+1)
    val n = toks.size.toLong
    val bound = n / 513 + 1
    val exactMap = exact.toMap
    approx.foreach { case (t, est) =>
      val tru = exactMap(t)
      assert(est <= tru && tru - est <= bound, s"$t: est=$est true=$tru bound=$bound")
    }
  }

  test("split leakage: matrix exact, unassigned surfaces, scrub drops only leaky train rows") {
    import spark.implicits._
    val assign = Seq(
      (1L, "train"), (2L, "train"), (3L, "train"),
      (4L, "val"), (5L, "test")).toDF("id", "split")
    // pairs: train-train (1,2), train-val (2,4), train-test (3,5),
    // val-test (4,5), and a pair to an id with no assignment (1,99)
    val pairs = Seq((1L, 2L), (2L, 4L), (3L, 5L), (4L, 5L), (1L, 99L))
      .toDF("id_a", "id_b")
    val m = Sampling.splitLeakage(pairs, assign)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(
      ("train", "train") -> 1L, ("train", "val") -> 1L,
      ("test", "train") -> 1L, ("test", "val") -> 1L,
      ("(unassigned)", "train") -> 1L))
    // scrub: 2 (paired to val) and 3 (paired to test) leave train;
    // 1 stays (its cross pair is unassigned-side; its other pair is
    // train-train); val/test rows untouched
    val kept = Sampling.scrubSplitLeakage(assign, pairs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept == Map(1L -> "train", 4L -> "val", 5L -> "test"))
  }

  test("splitLeakageDelta: admission == rebuild-restricted-to-batch; monotone ingest accumulates a superset of the rebuild's pairs") {
    import spark.implicits._
    import graft.dedup.SortedNeighborhood
    // keys engineered so sort-adjacency crosses the batch boundary
    val rows = (0 until 60).map(i => (i.toLong, f"k${i * 7 % 40}%03d-$i"))
      .toDF("id", "k")
    val initial = rows.filter($"id" % 3 === 0)
    val batch1 = rows.filter($"id" % 3 === 1)
    val batch2 = rows.filter($"id" % 3 === 2)
    val assign = Sampling.splitAssign(rows.select("id"), Seq("id"),
      Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
    def mat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // admission matrix == the corpus-at-that-time rebuild restricted to
    // >=1 batch side, through the same split matrix
    val d1 = mat(Sampling.splitLeakageDelta(initial, batch1, assign,
      "id", "k", window = 3))
    val c1 = initial.unionByName(batch1)
    val batchIds = batch1.select($"id").collect().map(_.getLong(0)).toSet
    val restricted = SortedNeighborhood.candidatePairs(c1, "id", "k", window = 3)
      .filter($"id_a".isin(batchIds.toSeq: _*) || $"id_b".isin(batchIds.toSeq: _*))
    assert(d1 == mat(Sampling.splitLeakage(restricted, assign, idCol = "id")))
    // monotone ingest: admission PAIRS accumulate a superset of the final
    // rebuild's pairs (a candidate stream never retracts; later inserts
    // can push once-adjacent rows apart, so equality is NOT the contract)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed =
      pairSet(SortedNeighborhood.candidatePairs(initial, "id", "k", window = 3)) ++
      pairSet(SortedNeighborhood.incrementalPairs(initial, batch1, "id", "k", window = 3)) ++
      pairSet(SortedNeighborhood.incrementalPairs(c1, batch2, "id", "k", window = 3))
    val rebuild = pairSet(SortedNeighborhood.candidatePairs(rows, "id", "k", window = 3))
    assert(rebuild.subsetOf(streamed),
      s"missing from stream: ${rebuild.diff(streamed).take(5)}")
    // and the delta matrices count only batch-touching pairs: cell sums
    // over the stream are >= the rebuild's cells (monotone recall)
    val d2 = mat(Sampling.splitLeakageDelta(c1, batch2, assign, "id", "k", window = 3))
    val internal = mat(Sampling.splitLeakage(
      SortedNeighborhood.candidatePairs(initial, "id", "k", window = 3),
      assign, idCol = "id"))
    val full = mat(Sampling.splitLeakage(
      SortedNeighborhood.candidatePairs(rows, "id", "k", window = 3),
      assign, idCol = "id"))
    full.foreach { case (cell, n) =>
      val s = d1.getOrElse(cell, 0L) + d2.getOrElse(cell, 0L) + internal.getOrElse(cell, 0L)
      assert(s >= n, s"cell $cell: streamed $s < rebuild $n")
    }
  }

  test("correlationMatrixDrift: identical snapshots zero, structure flip surfaces, constant/one-sided rows kept") {
    import spark.implicits._
    val a = (1 to 30).map(i => ("g", i.toLong, i.toLong * 2, 5L)).toDF("k", "x", "y", "z")
    // same marginals for y (a permutation), flipped relationship
    val b = (1 to 30).map(i => ("g", i.toLong, (31 - i).toLong * 2, 5L)).toDF("k", "x", "y", "z")
    val cols = Seq("x", "y", "z")
    def mom(d: org.apache.spark.sql.DataFrame) =
      Profiler.correlationMoments(d, Seq("k"), cols)
    val self = Profiler.correlationMatrixDrift(mom(a), mom(a), Seq("k"), cols)
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        (Option(r.get(5)), Option(r.get(7)))).toMap
    // identical snapshots: identical moments -> identical r -> drift
    // EXACTLY 0 (same-double subtraction, no tolerance needed)
    assert(self(("x", "y"))._1.exists(_.asInstanceOf[Double] > 0.999999))
    assert(self(("x", "y"))._2 == Some(0.0))
    assert(self(("x", "z")) == ((None, None)), "constant column keeps its row, NULL drift")
    val flip = Profiler.correlationMatrixDrift(mom(a), mom(b), Seq("k"), cols)
      .collect().map(r => (r.getString(1), r.getString(2)) -> Option(r.get(7))).toMap
    // perfect flip: drift = -1 - (+1) = -2 up to the sqrt ulp
    assert(flip(("x", "y")).exists(d => math.abs(d.asInstanceOf[Double] + 2.0) < 1e-12),
      s"flip drift ${flip(("x", "y"))}")
    // a group present only in the current snapshot survives the full outer
    val b2 = (1 to 10).map(i => ("h", i.toLong, i.toLong, i.toLong * 3)).toDF("k", "x", "y", "z")
    val oneSided = Profiler.correlationMatrixDrift(mom(a), mom(b2), Seq("k"), cols)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(oneSided.contains(("h", "x", "y")) && oneSided.contains(("g", "x", "y")))
  }

  test("spearman drift via rank moments: identical snapshots zero, flip surfaces, sides equal pairwise spearman") {
    import spark.implicits._
    val a = (1 to 40).map { i =>
      val x = (i % 11).toLong; ("g", x, x * x, (i % 7).toLong)
    }.toDF("k", "x", "y", "z")
    val b = a.select($"k", $"x", (-$"y").as("y"), $"z") // monotone flip of y
    val cols = Seq("x", "y", "z")
    def mom(d: org.apache.spark.sql.DataFrame) = Profiler.spearmanMoments(d, Seq("k"), cols)
    val self = Profiler.correlationMatrixDrift(mom(a), mom(a), Seq("k"), cols)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getDouble(7)).toMap
    assert(self.values.forall(_ == 0.0), s"identical snapshots must drift 0: $self")
    val flip = Profiler.correlationMatrixDrift(mom(a), mom(b), Seq("k"), cols)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getDouble(7)).toMap
    // rho(x, x^2) = 1 (aligned ranks); flipped -> -1; drift -2 up to
    // the sqrt ulp (the clamp only caps magnitudes ABOVE 1)
    assert(math.abs(flip(("x", "y")) + 2.0) < 1e-12, s"flip drift ${flip(("x", "y"))}")
    // each side's rho equals the pairwise exact spearman
    val base = Profiler.correlationMatrixDrift(mom(a), mom(b), Seq("k"), cols)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getDouble(5)).toMap
    for ((cx, cy) <- Seq(("x", "y"), ("x", "z"), ("y", "z"))) {
      val exact = Profiler.spearman(a, Seq("k"), cx, cy).head().getDouble(4)
      assert(base((cx, cy)) == exact, s"($cx,$cy): ${base((cx, cy))} vs $exact")
    }
  }

  test("spearmanMatrix: every pair equals the pairwise exact spearman; labels ordered") {
    import spark.implicits._
    val d = (1 to 80).map { i =>
      val x = (i * 13 % 23).toLong
      ("g" + (i % 2), x, x * x, (100 - i % 17).toLong)
    }.toDF("k", "x", "y", "z")
    val cols = Seq("x", "y", "z")
    val m = Profiler.spearmanMatrix(d, Seq("k"), cols).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(m.size == 6, s"2 groups x 3 pairs: $m")
    for (g <- Seq("g0", "g1"); (cx, cy) <- Seq(("x", "y"), ("x", "z"), ("y", "z"))) {
      val exact = Profiler.spearman(d.filter($"k" === g), Seq("k"), cx, cy)
        .head()
      assert(m((g, cx, cy)) == ((exact.getLong(1), exact.getDouble(4))),
        s"$g ($cx,$cy): matrix ${m((g, cx, cy))} vs pairwise ${exact}")
    }
    // y = x^2 over non-negative x is a monotone function of x's ranks:
    // the matrix must report EXACTLY 1 there (ties aligned)
    assert(m(("g0", "x", "y"))._2 == 1.0)
  }

  test("simpsonDiversity: golden lambda, monoculture zero, singleton NULL, NULL category counts") {
    import spark.implicits._
    // counts [2, 2]: N=4, num = 2*1 + 2*1 = 4, lambda = 4/12 = 1/3
    val d = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "b"),
      ("m", "x"), ("m", "x"), ("m", "x"), // monoculture: lambda 1, div 0
      ("s", "only"), // singleton group: no unordered pair -> NULL
      ("n", "a"), ("n", null), ("n", null)) // NULL category is a category
      .toDF("k", "cat")
    val got = Profiler.simpsonDiversity(d, Seq("k"), "cat").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(got("g") == ((2L, 4L, 4.0, Some(4.0 / 12.0), Some(1.0 - 4.0 / 12.0))))
    assert(got("m") == ((1L, 3L, 6.0, Some(1.0), Some(0.0))))
    assert(got("s")._4.isEmpty && got("s")._5.isEmpty)
    // n: counts [1, 2] -> num = 0 + 2 = 2, lambda = 2/6
    assert(got("n") == ((2L, 3L, 2.0, Some(2.0 / 6.0), Some(1.0 - 2.0 / 6.0))))
    // mergeable form: per-(group, category) counts over disjoint slices
    // fold by plain sum into exactly the rebuild's diversity
    val half1 = d.limit(5)
    val half2 = d.exceptAll(half1)
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"k", $"cat".cast("string").as("__cat"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("__n"))
    val folded = counts(half1).unionByName(counts(half2))
      .groupBy("k", "__cat")
      .agg(org.apache.spark.sql.functions.sum("__n").as("__n"))
    val viaFold = Profiler.simpsonDiversityFromCounts(folded, Seq("k"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1).map(Option(_))).toMap
    val direct = Profiler.simpsonDiversity(d, Seq("k"), "cat")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1).map(Option(_))).toMap
    assert(viaFold == direct)
  }

  test("poisson bootstrap: deterministic draws, plausible weights, exact sums, CI rank selection") {
    import spark.implicits._
    import graft.operators.Bootstrap
    val d = (1 to 400).map(i => (i.toLong, (100 + i % 50).toLong)).toDF("id", "v")
    val r1 = Bootstrap.replicateMeans(d, Seq("id"), "v", reps = 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDecimal(2).longValueExact()))
      .toMap
    assert(r1.size == 16)
    // content-keyed: identical replicates under any partitioning
    val r2 = Bootstrap.replicateMeans(d.repartition(7).orderBy($"id".desc),
        Seq("id"), "v", reps = 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDecimal(2).longValueExact()))
      .toMap
    assert(r2 == r1)
    // Poisson(1): each replicate draws ~n rows (mean 1 per row); across 16
    // replicates of 400 rows a 4-sigma band is +-80
    r1.values.foreach { case (n, _) => assert(n > 320 && n < 480, s"n_drawn=$n") }
    // replicate means sit near the population mean (~124.6)
    val means = Bootstrap.replicateMeans(d, Seq("id"), "v", 16)
      .collect().map(_.getDouble(3))
    assert(means.forall(m => m > 115 && m < 135))
    // CI: exact rank selection over the replicate means, lo <= hi, both
    // actual replicate values
    val ci = Bootstrap.meanCi(Bootstrap.replicateMeans(d, Seq("id"), "v", 16)).head()
    assert(ci.getLong(0) == 16L)
    val (lo, hi) = (ci.getDouble(2), ci.getDouble(3))
    assert(lo <= hi && means.contains(lo) && means.contains(hi))
    // inverse CDF golden: thresholds map u to the right weight
    val probe = Seq(0.1, 0.5, 0.8, 0.99999, 0.9999998, 0.99999995).toDF("u")
      .select(Bootstrap.poissonInverse(col("u")).as("w"))
      .collect().map(_.getInt(0)).toSeq
    assert(probe == Seq(0, 1, 2, 8, 9, 10), s"got $probe")
  }

  test("benford: golden counts, missing digit keeps a row, zeros/negatives/NULLs handled") {
    import spark.implicits._
    // values whose first digits are 1,1,2,9; 0 and NULL excluded; sign stripped
    val d = Seq(Some(123L), Some(-1500L), Some(25L), Some(900L), Some(0L), None)
      .toDF("v")
    val got = Profiler.benford(d, "v").orderBy("digit").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(got.size == 9, "all nine digits must have a row")
    // N=4: digit 1 n=2 ppm=500000 dev=|2e6-4*301029|=795884
    assert(got(1) == (2L, 500000L, 795884L))
    assert(got(2) == (1L, 250000L, 295636L))
    assert(got(9) == (1L, 250000L, 816972L))
    // digit 5 unused: n=0, dev = 4*79181
    assert(got(5) == (0L, 0L, 316724L))
    // expected ppm column carries the pinned constants
    val exp = Profiler.benford(d, "v").orderBy("digit").collect().map(_.getLong(3)).toSeq
    assert(exp == Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L, 45757L))
  }

  test("grouped bootstrap: draws consistent with ungrouped, delta CI brackets a planted shift") {
    import spark.implicits._
    import graft.operators.Bootstrap
    val a = (1 to 300).map(i => ("A", i.toLong, (200 + i % 20).toLong))
    val bg = (1 to 300).map(i => ("B", (1000 + i).toLong, (100 + i % 20).toLong))
    val d = (a ++ bg).toDF("g", "id", "v")
    val grouped = Bootstrap.replicateMeansBy(d, Seq("g"), Seq("id"), "v", reps = 16)
    // the group roll-up of A equals running A alone: the (id, b) draw is
    // content-keyed, not group-dependent
    val aAlone = Bootstrap.replicateMeans(d.filter($"g" === "A").select("id", "v"),
        Seq("id"), "v", reps = 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDecimal(2).longValueExact())).toMap
    val aGrouped = grouped.filter($"g" === "A")
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDecimal(3).longValueExact())).toMap
    assert(aGrouped == aAlone)
    // A sits ~100 above B: the delta CI must bracket the true shift and
    // exclude zero decisively
    val ci = Bootstrap.deltaCi(
      grouped.filter($"g" === "A").select("b", "mean"),
      grouped.filter($"g" === "B").select("b", "mean")).head()
    val (lo, hi) = (ci.getDouble(2), ci.getDouble(3))
    assert(lo <= hi && lo > 90 && hi < 110, s"delta CI [$lo, $hi]")
  }

  test("generalizeGlobal: first passing rung applied uniformly, suppression floor, empty vacuous") {
    import spark.implicits._
    import graft.quality.Anonymity
    import org.apache.spark.sql.functions.{col, floor, lit}
    // zips 10000..10003 x 1 row each, 10010 x 4: full zip fails k=5,
    // zip3 (div 10) gives groups {1000x:4+... } -- div 10: 1000->{0..3}=4+{10}=... let's
    // use values where div 10 yields exactly two groups of sizes 4 and 4 (fails),
    // div 100 one group of 8 (passes)
    val d = (Seq(10L, 11L, 12L, 13L) ++ Seq(20L, 21L, 22L, 23L)).toDF("z")
    val ladder = Seq(
      Seq("z" -> col("z")),                                  // 8 singleton groups
      Seq("z" -> floor(col("z") / 10).cast("long")),         // two groups of 4
      Seq("z" -> floor(col("z") / 100).cast("long")),        // one group of 8
      Seq("z" -> lit(null).cast("long")))                    // floor
    val g5 = Anonymity.generalizeGlobal(d, ladder, k = 5L)
    assert(g5.select("gen_level").distinct().head().getInt(0) == 2)
    assert(g5.select("z").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
    // k=4 stops one rung earlier
    val g4 = Anonymity.generalizeGlobal(d, ladder, k = 4L)
    assert(g4.select("gen_level").distinct().head().getInt(0) == 1)
    // the repaired output passes its own audit
    assert(Anonymity.kAnonymityViolations(g4.drop("gen_level"), Seq("z"), 4L).count() == 0)
    // div100 collapses the sparse rows into one group of 3 -> rung 2
    val sparse = Seq(10L, 20L, 30L).toDF("z")
    assert(Anonymity.generalizeGlobal(sparse, ladder, k = 2L)
      .select("gen_level").distinct().head().getInt(0) == 2)
    // NO rung can reach k=5 with 3 rows: fall to the suppression floor
    assert(Anonymity.generalizeGlobal(sparse, ladder, k = 5L)
      .select("gen_level").distinct().head().getInt(0) == 3)
    // empty input is vacuously anonymous at the first rung
    assert(Anonymity.generalizeGlobal(d.filter(col("z") < 0), ladder, k = 5L)
      .select("gen_level").schema.nonEmpty)
    assert(Anonymity.generalizeGlobal(d.filter(col("z") < 0), ladder, k = 5L).count() == 0)
  }

  test("correlation moments: matrix agrees with the pair operator, fold equals rebuild") {
    import spark.implicits._
    val d = (1 to 60).map(i =>
      ("g" + (i % 2), i.toLong, (3L * i + i % 7), (100L - i))).toDF("k", "x", "y", "z")
    val cols = Seq("x", "y", "z")
    val m = Profiler.correlationMoments(d, Seq("k"), cols)
    val matrix = Profiler.correlationFromMoments(m, Seq("k"), cols)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(matrix.size == 6) // 2 groups x 3 pairs
    // each pair bit-identical to the dedicated two-column operator
    for (Seq(a, b) <- cols.combinations(2)) {
      val solo = Profiler.correlation(d, Seq("k"), a, b)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(4)))).toMap
      for (g <- Seq("g0", "g1"))
        assert(matrix((g, a, b)) == solo(g), s"$g $a $b")
    }
    // fold over disjoint halves == rebuild, moment for moment
    val folded = Profiler.mergeCorrelationMoments(
      Profiler.correlationMoments(d.filter($"x" <= 30), Seq("k"), cols),
      Profiler.correlationMoments(d.filter($"x" > 30), Seq("k"), cols), Seq("k"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(_.toSeq).toSeq
    assert(rows(folded) == rows(m))
    // and the matrix from folded state is bit-identical
    assert(rows(Profiler.correlationFromMoments(folded, Seq("k"), cols).orderBy("k", "col_x", "col_y"))
      == rows(matrix2df(matrix)))
  }

  private def matrix2df(m: Map[(String, String, String), (Long, Double)]) = {
    import spark.implicits._
    m.toSeq.map { case ((k, a, b), (n, r)) => (k, a, b, n, r) }
      .sortBy(t => (t._1, t._2, t._3))
      .toDF("k", "col_x", "col_y", "n", "r")
  }

  test("spearman: monotone nonlinear = 1, ties use average ranks, reversal = -1") {
    import spark.implicits._
    // y = x^3 is monotone nonlinear: Pearson < 1 but Spearman EXACTLY 1
    val cube = (1 to 20).map(i => ("m", i.toLong, (i.toLong * i * i))).toDF("k", "x", "y")
    assert(Profiler.spearman(cube, Seq("k"), "x", "y").head().getDouble(4) == 1.0)
    assert(Profiler.correlation(cube, Seq("k"), "x", "y").head().getDouble(4) < 1.0)
    // strict reversal: exactly -1
    val rev = (1 to 15).map(i => ("r", i.toLong, (100L - i))).toDF("k", "x", "y")
    assert(Profiler.spearman(rev, Seq("k"), "x", "y").head().getDouble(4) == -1.0)
    // tie handling golden: x = (1,1,2), y = (10,20,30).
    // avg ranks x: (1.5, 1.5, 3) -> rx2 = (3,3,6); y ranks (1,2,3) -> ry2 = (2,4,6)
    // Pearson((3,3,6),(2,4,6)): n=3 sx=12 sy=12 sxy=3*2+3*4+6*6=54
    // sxx=9+9+36=54 syy=4+16+36=56; num=162-144=18, dx=162-144=18, dy=168-144=24
    // rho = 18/sqrt(18*24)
    val t = Seq(("t", 1L, 10L), ("t", 1L, 20L), ("t", 2L, 30L)).toDF("k", "x", "y")
    val rho = Profiler.spearman(t, Seq("k"), "x", "y").head().getDouble(4)
    assert(rho == 18.0 / (math.sqrt(18.0) * math.sqrt(24.0)), s"rho $rho")
    // constant column: no rank variance -> NULL
    val const = (1 to 5).map(i => ("c", i.toLong, 7L)).toDF("k", "x", "y")
    assert(Profiler.spearman(const, Seq("k"), "x", "y").head().isNullAt(4))
  }

  test("chi-square value counts fold: merged snapshots drift exactly like the rebuild") {
    import spark.implicits._
    val base = Seq("a", "a", "b").toDF("k")
    val cur1 = Seq("b", "b").toDF("k")
    val cur2 = Seq("c", "b").toDF("k")
    val folded = Profiler.mergeValueCounts(
      Profiler.valueCounts(cur1, "k"), Profiler.valueCounts(cur2, "k"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("value").collect().map(_.toSeq).toSeq
    // folded histogram == rebuild (shared value b must SUM)
    assert(rows(folded) == rows(Profiler.valueCounts(cur1.unionByName(cur2), "k")))
    // drift from the folded state is bit-identical to the direct path
    assert(rows(Profiler.chiSquareDriftFromCounts(Profiler.valueCounts(base, "k"), folded))
      == rows(Profiler.chiSquareDrift(base, cur1.unionByName(cur2), "k")))
  }
}
