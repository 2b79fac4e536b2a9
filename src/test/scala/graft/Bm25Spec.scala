package graft

import graft.operators.RankFusion
import graft.text.Bm25
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // Hand-computed golden: 3 docs, terms "cat" (df=2) and "dog" (df=1),
  // k1 = 1.2, b = 0.75.
  //   d1 = "cat cat dog"  (dl=3)   d2 = "cat fish" (dl=2)   d3 = "fish fish fish fish" (dl=4)
  // N = 3, avgdl = 3.
  private val golden = Seq(
    (1L, "cat cat dog"),
    (2L, "cat fish"),
    (3L, "fish fish fish fish"))

  private def bm25(tf: Int, dl: Int, df: Int, n: Int, avgdl: Double): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))

  test("scoreScan matches a hand-computed BM25 on a tiny corpus") {
    val got = Bm25.scoreScan(golden.toDF("id", "text"), "id", "text", Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = Map(
      1L -> (bm25(2, 3, 2, 3, 3.0) + bm25(1, 3, 1, 3, 3.0)),
      2L -> (bm25(1, 2, 2, 3, 3.0) + 0.0),
      3L -> 0.0)
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) => assert(approxEq(got(id), e), s"doc $id") }
    // absent terms contribute exactly zero, not approximately
    assert(got(3L) == 0.0)
  }

  test("prebuilt inverted-index path equals the scan path bit-for-bit") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val terms = Seq("spark", "window", "merge")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    Bm25.buildIndex(docs, "doc_id", "text").write.parquet(s"$tmp/postings")
    Bm25.corpusStats(docs, "doc_id", "text").write.parquet(s"$tmp/stats")
    val pre = Bm25.topKPrebuilt(
        spark.read.parquet(s"$tmp/postings"), spark.read.parquet(s"$tmp/stats"), terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scan = Bm25.scoreScan(docs, "doc_id", "text", terms)
      .filter(col("score") > 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pre.nonEmpty && pre == scan) // exact double equality, no tolerance
  }

  test("prebuilt probe reads postings through a pushed term filter, never a full scan") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25p").toString
    Bm25.buildIndex(docs, "doc_id", "text").write.parquet(s"$tmp/postings")
    Bm25.corpusStats(docs, "doc_id", "text").write.parquet(s"$tmp/stats")
    val plan = Bm25.topKPrebuilt(
        spark.read.parquet(s"$tmp/postings"), spark.read.parquet(s"$tmp/stats"),
        Seq("spark", "merge"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term, [merge,spark])]") ||
      plan.contains("PushedFilters: [In(term, [spark,merge])]"), plan.take(3000))
  }

  test("scoreScan keeps zero-match docs; empty term list is refused; dup terms refused") {
    val docs = golden.toDF("id", "text")
    assert(Bm25.scoreScan(docs, "id", "text", Seq("absentword")).count() == 3)
    intercept[IllegalArgumentException](Bm25.scoreScan(docs, "id", "text", Nil))
    intercept[IllegalArgumentException](
      Bm25.scoreScan(docs, "id", "text", Seq("cat", "cat")))
    intercept[IllegalArgumentException](
      Bm25.topKPrebuilt(docs.limit(0).toDF("id", "text"), docs, Seq("dl")))
  }

  test("rrfFuse: golden fusion incl. a doc present in only one list") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2)).toDF("id", "rank")
    val got = RankFusion.rrfFuse(Seq(a, b), "id", "rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(10L) == 1.0 / 61 + 1.0 / 62)
    assert(got(20L) == 1.0 / 62 + 1.0 / 61)
    assert(got(30L) == 1.0 / 63) // absent from list b: contributes 0, row kept
    assert(got.size == 3)
    intercept[IllegalArgumentException](RankFusion.rrfFuse(Nil, "id", "rank"))
  }

  test("rrfFuse join shape stays rank-list-sized (no corpus-side shuffle inputs)") {
    // single-list fuse degenerates to the identity scoring — sanity of the fold
    val one = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val got = RankFusion.rrfFuse(Seq(one), "id", "rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0 / 61, 2L -> 1.0 / 62))
  }

  private def approxEq(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-12
}
