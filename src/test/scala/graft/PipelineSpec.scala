package graft

import graft.dag.DAG
import graft.pipeline.{SparkPipeline, SparkUILogger, StateStore}

/** Mirrors reference tests/spark_pipeline_test.py: temp-view steps,
  * dependencies by step and by output name, success bookkeeping; plus
  * table steps with observed metrics and the persisted state store.
  */
class PipelineSpec extends SparkSpec {

  test("end-to-end curation pipeline: gate -> dedup -> split -> weighted sample") {
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    import graft.dedup.ExactDedup
    import graft.operators.Sampling
    // the full LLM-data curation flow wired through SparkPipeline — each
    // stage is one of the engine's operators, chained by temp views
    val p = new SparkPipeline("curation", spark)
    val gate = p.stepSparkTempView("quality_gate") { _ =>
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      Seq(docs.join(
        TextAnalysis.gopherFilters(docs, "doc_id", "text", minWords = 10)
          .filter(col("passes")).select("doc_id"),
        Seq("doc_id"), "left_semi"))
    }
    val dedup = p.stepSparkTempView("dedup", dependsOn = Seq(gate)) { _ =>
      Seq(ExactDedup.dedup(spark.table("quality_gate"), "doc_id", "text"))
    }
    val split = p.stepSparkTempView("split", dependsOn = Seq(dedup)) { _ =>
      Seq(Sampling.splitAssign(spark.table("dedup"), Seq("doc_id"),
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)))
    }
    val sampled = p.stepSparkTempView("train_sample", dependsOn = Seq(split)) { _ =>
      Seq(Sampling.weighted(
        spark.table("split").filter(col("split") === "train"),
        Seq("doc_id"), least(lit(1.0), length(col("text")) / lit(400.0))))
    }
    p.run(2)
    assert(p.isSuccess)
    val nDocs = Tables.documents(spark, sf).count()
    val nGate = spark.table("quality_gate").count()
    val nDedup = spark.table("dedup").count()
    val nTrain = spark.table("split").filter(col("split") === "train").count()
    val nSample = spark.table("train_sample").count()
    assert(nGate > 0 && nGate <= nDocs)
    assert(nDedup > 0 && nDedup <= nGate)
    assert(nTrain > 0 && nTrain <= nDedup)
    assert(nSample > 0 && nSample <= nTrain)
    // splits are disjoint + exhaustive over the deduped gate output
    assert(spark.table("split").groupBy("split").count().count() <= 3)
    assert(spark.table("split").count() == nDedup)
  }

  test("temp view pipeline runs steps in dependency order (reference scenario)") {
    val p = new SparkPipeline("sample", spark)
    val raw = p.stepSparkTempView("raw_data_single_source") { _ => Seq(spark.range(1, 10).toDF()) }
    val nice = p.stepSparkTempView("raw_data_custom", outputs = Seq("raw_nice_name")) { _ =>
      Seq(spark.range(100, 110).toDF())
    }
    p.stepSparkTempView("raw_data_multi", outputs = Seq("raw_data1", "raw_data2")) { _ =>
      Seq(spark.range(1000, 2000).toDF(), spark.range(2000, 3000).toDF())
    }
    val combine = p.stepSparkTempView("combine_data",
      dependsOn = Seq(raw, nice, "raw_data1", "raw_data2")) { _ =>
      Seq(spark.table("raw_data_single_source")
        .union(spark.table("raw_nice_name"))
        .union(spark.table("raw_data1"))
        .union(spark.table("raw_data2")))
    }
    p.stepSparkTempView("split_data", outputs = Seq("odd", "even"), dependsOn = Seq(combine)) { _ =>
      Seq(spark.table("combine_data").filter("id % 2 == 1"),
        spark.table("combine_data").filter("id % 2 == 0"))
    }
    val ok = p.run(maxConcurrentSteps = 10)
    assert(p.skippedSteps.isEmpty && p.errorSteps.isEmpty)
    assert(ok.keySet == Set("raw_data_single_source", "raw_data_custom", "raw_data_multi", "combine_data", "split_data"))
    assert(spark.table("odd").count() + spark.table("even").count() == 9 + 10 + 1000 + 1000)
  }

  test("failing step marks pipeline failed and skips dependents") {
    val p = new SparkPipeline("failing", spark)
    val a = p.step("a") { _ => Seq(1) }
    val boom = p.step("boom", dependsOn = Seq(a)) { _ => throw new RuntimeException("bad") }
    p.step("after", dependsOn = Seq(boom)) { _ => Seq(2) }
    val err = intercept[IllegalStateException](p.run(4))
    assert(err.getMessage.contains("boom"))
    assert(p.errorSteps.keySet == Set("boom"))
    assert(p.skippedSteps.keySet == Set("after"))
    assert(p.successSteps.keySet == Set("a"))
  }

  test("duplicate output registration is rejected") {
    val p = new SparkPipeline("dup", spark)
    p.step("s1", outputs = Seq("o")) { _ => Seq(1) }
    val ex = intercept[IllegalArgumentException] {
      p.step("s2", outputs = Seq("o")) { _ => Seq(2) }
    }
    assert(ex.getMessage.contains("already created"))
  }

  test("table step writes managed table and records observed metrics") {
    val p = new SparkPipeline("tbl", spark)
    val step = p.stepSparkTable("write_orders", outputs = Seq("graft_test_orders"),
      metricExprs = Map("row_cnt" -> "count(1)", "max_price" -> "max(o_totalprice)")) { _ =>
      Seq(Tables.orders(spark, sf))
    }
    p.run(4)
    assert(spark.table("graft_test_orders").count() == Tables.orders(spark, sf).count())
    assert(step.metrics("row_cnt") == Tables.orders(spark, sf).count().toDouble)
    assert(step.metrics("max_price") > 0)
    assert(p.metrics.keySet == Set("write_orders.row_cnt", "write_orders.max_price"))
  }

  test("state store round-trips metrics and pipeline picks up last run") {
    val ss = new StateStore(spark, "graft_test_state")
    val p1 = new SparkPipeline("stateful", spark, Some(ss))
    p1.step("s") { _ => Seq(1) }
    p1.run(2)
    val loaded = ss.loadLatest("stateful")
    assert(loaded.exists(_.pipelineName == "stateful"))
    val p2 = new SparkPipeline("stateful", spark, Some(ss))
    assert(p2.lastRunMetrics == loaded.get.metrics)
  }

  test("progressive metrics carry over from last run when current run lacks them") {
    val ss = new StateStore(spark, "graft_test_progressive")
    val p1 = new SparkPipeline("prog", spark, Some(ss))
    p1.stepSparkTable("load", outputs = Seq("graft_prog_t1"),
      metricExprs = Map("progressive_rows" -> "count(1)", "batch_rows" -> "count(1)")) { _ =>
      Seq(spark.range(7).toDF())
    }
    p1.run(2)
    assert(ss.loadLatest("prog").get.metrics("load.progressive_rows") == 7.0)
    // second run: no metrics produced at all
    val p2 = new SparkPipeline("prog", spark, Some(ss))
    p2.step("load") { _ => Seq(1) } // same step name, no metric registration
    p2.run(2)
    val m2 = ss.loadLatest("prog").get.metrics
    assert(m2("load.progressive_rows") == 7.0) // carried
    assert(!m2.contains("load.batch_rows")) // non-progressive not carried
  }

  test("progressiveMetricExprs declares progressive metrics first-class") {
    val ss = new StateStore(spark, "graft_test_progressive2")
    val p1 = new SparkPipeline("prog2", spark, Some(ss))
    p1.stepSparkTable("load", outputs = Seq("graft_prog2_t1"),
      metricExprs = Map("batch_rows" -> "count(1)"),
      progressiveMetricExprs = Map("total_rows" -> "count(1)")) { _ =>
      Seq(spark.range(5).toDF())
    }
    p1.run(2)
    val m1 = ss.loadLatest("prog2").get.metrics
    assert(m1("load.progressive_total_rows") == 5.0 && m1("load.batch_rows") == 5.0)
    // a run that produces no metrics keeps the progressive one only
    val p2 = new SparkPipeline("prog2", spark, Some(ss))
    p2.step("load") { _ => Seq(1) }
    p2.run(2)
    val m2 = ss.loadLatest("prog2").get.metrics
    assert(m2("load.progressive_total_rows") == 5.0)
    assert(!m2.contains("load.batch_rows"))
  }

  test("a step NAME containing a progressive_ segment does not leak carry semantics onto its metrics") {
    val ss = new StateStore(spark, "graft_test_progressive3")
    val p1 = new SparkPipeline("prog3", spark, Some(ss))
    p1.stepSparkTable("x.progressive_y", outputs = Seq("graft_prog3_t1"),
      metricExprs = Map("m" -> "count(1)")) { _ => Seq(spark.range(3).toDF()) }
    p1.run(2)
    assert(ss.loadLatest("prog3").get.metrics("x.progressive_y.m") == 3.0)
    // next run produces nothing: the plain metric of the oddly-named step
    // must NOT carry (only the final segment / registered keys qualify)
    val p2 = new SparkPipeline("prog3", spark, Some(ss))
    p2.step("x.progressive_y") { _ => Seq(1) }
    p2.run(2)
    assert(!ss.loadLatest("prog3").get.metrics.contains("x.progressive_y.m"))
  }

  test("registered step implementation instantiates on any pipeline; bad names and doubles rejected") {
    SparkPipeline.registerStepImplementation("stepDoubled") { (p, spec) =>
      p.step(spec.name, outputs = Option(spec.outputs).getOrElse(Seq(spec.name)),
        dependsOn = spec.dependsOn) { s =>
        spec.body(s).map { case i: Int => i * 2; case x => x }
      }
    }
    try {
      val p = new SparkPipeline("plugin", spark)
      val a = p.step("a") { _ => Seq(21) }
      val d = p.stepImpl("stepDoubled", SparkPipeline.StepSpec(
        "dbl", dependsOn = Seq(a), body = _ => Seq(21)))
      p.run(2)
      assert(d.result == Seq(42))
      // double registration is an error (same contract as the reference)
      val ex = intercept[IllegalArgumentException] {
        SparkPipeline.registerStepImplementation("stepDoubled")((p, s) => p.step(s.name)(_ => Nil))
      }
      assert(ex.getMessage.contains("already registered"))
      // names must start with "step"
      intercept[IllegalArgumentException] {
        SparkPipeline.registerStepImplementation("notAStep")((p, s) => p.step(s.name)(_ => Nil))
      }
      // unknown implementation
      intercept[IllegalArgumentException] {
        new SparkPipeline("x", spark).stepImpl("stepMissing", SparkPipeline.StepSpec("m"))
      }
    } finally SparkPipeline.unregisterStepImplementation("stepDoubled")
  }

  test("state store filterExpr scopes loads; clean sanitizes table names") {
    import org.apache.spark.sql.functions._
    assert(StateStore.clean("my pipeline/v2.1") == "my_pipeline_v2_1")
    // two stores share one table; each loads only its own tenant's rows
    val tbl = "graft_test_state_shared"
    val sA = new StateStore(spark, tbl, filterExpr = Some(expr("metrics LIKE '%tenantA%'")))
    val sB = new StateStore(spark, tbl, filterExpr = Some(expr("metrics LIKE '%tenantB%'")))
    val now = new java.sql.Timestamp(1000L)
    val later = new java.sql.Timestamp(2000L)
    sA.save(sA.State("p", now, None, Map("tenantA.rows" -> 1.0)))
    sB.save(sB.State("p", later, None, Map("tenantB.rows" -> 2.0)))
    // unfiltered latest is tenantB's row; the filtered store still sees its own
    assert(new StateStore(spark, tbl).loadLatest("p").get.metrics == Map("tenantB.rows" -> 2.0))
    assert(sA.loadLatest("p").get.metrics == Map("tenantA.rows" -> 1.0))
    assert(sB.loadLatest("p").get.metrics == Map("tenantB.rows" -> 2.0))
    // saving a row the store's own filter would hide fails loudly instead
    // of silently corrupting loadLatest
    val ex = intercept[IllegalArgumentException] {
      sA.save(sA.State("p", later, None, Map("tenantB.rows" -> 9.0)))
    }
    assert(ex.getMessage.contains("filterExpr"))
  }

  test("state store JSON codec round-trips") {
    val m = Map("a.b" -> 1.5, "weird\"key" -> -2.0, "n" -> 0.0)
    assert(StateStore.fromJson(StateStore.toJson(m)) == m)
    assert(StateStore.fromJson("{}") == Map.empty[String, Double])
  }

  test("SparkUILogger nests and restores job descriptions") {
    SparkUILogger.tagged("outer", spark) {
      assert(SparkUILogger.currentDescription.contains("outer"))
      SparkUILogger.tagged("inner", spark) {
        assert(SparkUILogger.currentDescription.contains("outer.inner"))
      }
      assert(SparkUILogger.currentDescription.contains("outer"))
    }
    assert(SparkUILogger.currentDescription.isEmpty)
  }
}
