package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class IntraDocRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(text: String) =
    TextAnalysis.intraDocRepetition(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_lines", "dup_line_frac", "dup_line_char_frac",
        "n_paras", "dup_para_frac", "dup_para_char_frac", "passes_repetition")
      .as[(Long, Double, Double, Long, Double, Double, Boolean)]
      .head()

  test("golden: duplicated lines counted by occurrence and char mass") {
    // 4 non-empty lines: "dup" x2 (3 chars each), "unique-one" (10), "xx" (2)
    val m = metrics("dup\ndup\nunique-one\nxx")
    assert(m._1 == 4L)
    assert(m._2 == 2.0 / 4.0)            // 2 of 4 lines are in a dup group
    assert(m._3 == 6.0 / (6 + 10 + 2))   // 6 of 18 chars
    // one paragraph (no blank lines), all unique at para level
    assert(m._4 == 1L && m._5 == 0.0 && m._6 == 0.0)
  }

  test("golden: duplicated paragraphs; lines inside them count too") {
    val m = metrics("quote me\n\nquote me\n\nfresh text")
    assert(m._4 == 3L && m._5 == 2.0 / 3.0)
    assert(m._2 == 2.0 / 3.0) // the quoted line also duplicates at line level
  }

  test("clean document passes; looping boilerplate fails") {
    val clean = metrics("alpha\nbeta\n\ngamma delta")
    assert(clean._7)
    val loop = metrics("nav bar\ncontent a\nnav bar\ncontent b\nnav bar")
    assert(!loop._7 && loop._2 == 3.0 / 5.0)
  }

  test("empty lines and blank-run paragraphs are not units; empty docs drop") {
    val m = metrics("a\n\n\nb") // lines: a, b; paras: a, b
    assert(m._1 == 2L && m._4 == 2L)
    val out = TextAnalysis.intraDocRepetition(
      Seq((1L, ""), (2L, "\n\n"), (3L, "x")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("null text drops from the report (documented)") {
    val out = TextAnalysis.intraDocRepetition(
      Seq((1L, null.asInstanceOf[String]), (2L, "ok")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("gopher repetition table: coverage goldens, bounded self-overlap, verdict") {
    val d = Seq(
      (1L, "a b a b a b"),                         // top-2 covers everything
      (2L, (1 to 30).map("u" + _).mkString(" ")),  // all unique → clean
      (3L, "c1 c2 c3 c4 c5 q c1 c2 c3 c4 c5")      // duplicated 5-gram block
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetitionTable(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    // "a b" occurs 3×, its occurrences cover all 6 positions → 1.0 (bounded, not 3·2/6·…)
    assert(r1.getAs[Double]("top_2gram_char_frac") == 1.0)
    assert(r1.getAs[Double]("dup_5gram_char_frac") == 0.0) // both 5-grams unique
    assert(!r1.getAs[Boolean]("passes_repetition"))
    val r2 = out(2L)
    // no duplicated grams at all; top-gram coverage is one occurrence's
    // n tokens over 30 — small on a doc of real length
    assert((5 to 10).forall(n => r2.getAs[Double](s"dup_${n}gram_char_frac") == 0.0))
    assert((2 to 4).forall(n => r2.getAs[Double](s"top_${n}gram_char_frac") < 0.16))
    assert(r2.getAs[Boolean]("passes_repetition"))
    val r3 = out(3L)
    // the c1..c5 block repeats: dup-5 covers 10 of 11 positions, 20 of 21 chars
    assert(math.abs(r3.getAs[Double]("dup_5gram_char_frac") - 20.0 / 21.0) < 1e-12)
    // tie at count 2 among c-grams → lexicographically first "c1 c2" wins:
    // occurrences at 0 and 6 cover 4 positions, 8 chars
    assert(math.abs(r3.getAs[Double]("top_2gram_char_frac") - 8.0 / 21.0) < 1e-12)
    assert(r3.getAs[Double]("dup_6gram_char_frac") == 0.0) // block is only 5 long
    assert(!r3.getAs[Boolean]("passes_repetition"))
  }
}
