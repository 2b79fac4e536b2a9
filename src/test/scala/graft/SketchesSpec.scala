package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** HLL / Count-Min sketch invariants: merge == rebuild (the mergeable-
  * store contract), estimator bounds, and determinism of the pinned
  * division (q128/q129 gate the cross-engine replay; these specs gate
  * the algebra).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def values(n: Int, mod: Int) =
    (0 until n).map(i => ("g" + (i % 2), (i % mod).toLong)).toDF("g", "v")

  test("hll merge of disjoint slices == registers of the union") {
    val all = values(4000, 700)
    val a = all.filter($"v" % 2 === 0)
    val b = all.filter($"v" % 2 =!= 0)
    val merged = Sketches.mergeHllRegisters(
      Sketches.hllRegisters(a, Seq("g"), "v"),
      Sketches.hllRegisters(b, Seq("g"), "v"), Seq("g"))
    val direct = Sketches.hllRegisters(all, Seq("g"), "v")
    assert(merged.orderBy("g", "bucket").collect().toSeq ==
      direct.orderBy("g", "bucket").collect().toSeq)
  }

  test("hll estimate lands within the published error band") {
    // p=8 -> ~6.5% standard error; allow 4 sigma on a single draw
    val df = values(20000, 5000) // 2500 distinct per group
    val rep = Sketches.approxDistinct(df, Seq("g"), "v")
      .select($"g", $"est").collect()
    assert(rep.length == 2)
    rep.foreach { r =>
      val est = r.getDouble(1)
      assert(math.abs(est - 2500.0) / 2500.0 < 0.26, s"est=$est")
    }
  }

  test("hll overlap: inclusion-exclusion identity and error band vs exact intersection") {
    // A = [0, 1000), B = [600, 1600) as strings-of-longs -> exact overlap 400
    val a = (0 until 1000).map(i => ("g", i.toLong)).toDF("g", "v")
    val b = (600 until 1600).map(i => ("g", i.toLong)).toDF("g", "v")
    val ra = Sketches.hllRegisters(a, Seq("g"), "v")
    val rb = Sketches.hllRegisters(b, Seq("g"), "v")
    val row = Sketches.hllOverlap(ra, rb, Seq("g")).head()
    val (estA, estB, estU, estO) =
      (row.getAs[Double]("est_a"), row.getAs[Double]("est_b"),
        row.getAs[Double]("est_union"), row.getAs[Double]("est_overlap"))
    // the estimate IS the pinned-order identity, bit-for-bit
    assert(estO == (estA + estB) - estU)
    // error band: three ~6.5%-sigma terms on ~1000-scale cardinalities;
    // allow a combined 3-sigma-ish absolute band on the difference
    assert(math.abs(estO - 400.0) < 300.0, s"est_overlap $estO vs exact 400")
    // each side's own estimate stays in its single-sketch band
    assert(math.abs(estA - 1000.0) < 1000 * 0.065 * 4)
    assert(math.abs(estB - 1000.0) < 1000 * 0.065 * 4)
    // near-disjoint sides: overlap estimate may be small/negative but the
    // union estimate must not exceed est_a + est_b
    val c = (5000 until 6000).map(i => ("g", i.toLong)).toDF("g", "v")
    val rowD = Sketches.hllOverlap(ra,
      Sketches.hllRegisters(c, Seq("g"), "v"), Seq("g")).head()
    assert(rowD.getAs[Double]("est_union") <=
      rowD.getAs[Double]("est_a") + rowD.getAs[Double]("est_b"))
    assert(math.abs(rowD.getAs[Double]("est_overlap")) < 300.0)
  }

  test("hll registers are idempotent under duplicate ingestion") {
    val once = values(1000, 100)
    val thrice = once.unionByName(once).unionByName(once)
    assert(Sketches.hllRegisters(once, Seq("g"), "v")
      .orderBy("g", "bucket").collect().toSeq ==
      Sketches.hllRegisters(thrice, Seq("g"), "v")
        .orderBy("g", "bucket").collect().toSeq)
  }

  test("quantile sketch: exact bottom-k mergeability, k-cut, full-sample == exact quantiles") {
    val all = (0 until 2000).map(i => ("g" + (i % 2), (i * 7 % 100).toLong, i.toLong))
      .toDF("g", "v", "id")
    val a = all.filter($"id" % 2 === 0)
    val b = all.filter($"id" % 2 =!= 0)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("g", "h").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // bottom-k(A ∪ B) == merge(bottom-k(A), bottom-k(B)) — exact, not approximate
    val direct = Sketches.quantileSketch(all, Seq("g"), "v", Seq("id"), k = 64)
    val merged = Sketches.mergeQuantileSketch(
      Sketches.quantileSketch(a, Seq("g"), "v", Seq("id"), k = 64),
      Sketches.quantileSketch(b, Seq("g"), "v", Seq("id"), k = 64), Seq("g"), k = 64)
    assert(canon(direct) == canon(merged))
    assert(direct.groupBy("g").count().collect().forall(_.getLong(1) == 64L))
    // k >= group size: the sketch IS the group, so sample quantiles equal
    // the exact rank selections
    val big = Sketches.quantileSketchReport(
      Sketches.quantileSketch(all, Seq("g"), "v", Seq("id"), k = 5000), Seq("g"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    import graft.operators.Quantiles
    val exact = Quantiles.exactQuantiles(
      all.withColumn("tb", $"id".cast("string")), Seq("g"), "v", "tb")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(big == exact)
    // k below group size: sample quantiles land near the true ones
    val approx = Sketches.quantileSketchReport(direct, Seq("g")).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    approx.foreach { case (g, (p50, p90)) =>
      assert(math.abs(p50 - exact(g)._2) <= 15, s"$g p50 $p50 vs ${exact(g)._2}")
      assert(math.abs(p90 - exact(g)._3) <= 15, s"$g p90 $p90 vs ${exact(g)._3}")
    }
  }

  test("spearman sketch: exact mergeability, full-sample == exact rho, error band at k<<n") {
    import graft.quality.Profiler
    // monotone-with-noise pairs + a NULL sprinkle (pairwise-excluded)
    val all = (0 until 3000).map { i =>
      val x = (i * 13 % 500).toLong
      ("g" + (i % 2), i.toLong, x, x * 3 + (i * 7 % 97) - 48,
        if (i % 31 == 0) None else Some(1L))
    }.toDF("g", "id", "x0", "y0", "keep")
      .select($"g", $"id",
        when($"keep".isNotNull, $"x0").as("x"), $"y0".as("y"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("g", "h").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val a = all.filter($"id" % 2 === 0)
    val b = all.filter($"id" % 2 =!= 0)
    // bottom-k(A ∪ B) == merge(bottom-k(A), bottom-k(B)) — exact
    val direct = Sketches.spearmanSketch(all, Seq("g"), "x", "y", Seq("id"), k = 64)
    val merged = Sketches.mergeSpearmanSketch(
      Sketches.spearmanSketch(a, Seq("g"), "x", "y", Seq("id"), k = 64),
      Sketches.spearmanSketch(b, Seq("g"), "x", "y", Seq("id"), k = 64), Seq("g"), k = 64)
    assert(canon(direct) == canon(merged))
    // k >= population: the sample IS the group — rho_est equals exact rho
    val exact = Profiler.spearman(all, Seq("g"), "x", "y").collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val full = Sketches.spearmanSketchReport(
      Sketches.spearmanSketch(all, Seq("g"), "x", "y", Seq("id"), k = 5000), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(full == exact)
    // k = 64 << n: the estimate lands within the documented ~1/sqrt(k)
    // band of the truth (3 sigma)
    val est = Sketches.spearmanSketchReport(direct, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    est.foreach { case (g, rho) =>
      assert(math.abs(rho - exact(g)) <= 3.0 / math.sqrt(64.0),
        s"$g est $rho vs exact ${exact(g)}")
    }
  }

  test("cms merge of slices == counters of the union; est >= exact") {
    val all = (0 until 3000).map(i => "t" + (i % 37)).toDF("token")
    val a = all.limit(1500)
    val b = all.exceptAll(a) // multiset complement slice
    val merged = Sketches.mergeCms(
      Sketches.cmsCounters(a, "token"), Sketches.cmsCounters(b, "token"))
    val direct = Sketches.cmsCounters(all, "token")
    assert(merged.orderBy("j", "bucket").collect().toSeq ==
      direct.orderBy("j", "bucket").collect().toSeq)

    val exact = all.groupBy("token").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(direct, exact, "token")
    val joined = est.join(exact, "token").select($"token", $"est", $"exact").collect()
    assert(joined.length == 37)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"CMS under-estimated ${r.getString(0)}")
    }
  }

  test("cms total count is preserved per depth row") {
    val all = (0 until 2000).map(i => "w" + (i % 97)).toDF("token")
    val counters = Sketches.cmsCounters(all, "token")
    val perRow = counters.groupBy("j").agg(sum("c").as("t")).select("t")
      .collect().map(_.getLong(0)).toSeq
    assert(perRow == Seq.fill(Sketches.CmsDepth)(2000L))
  }
}
