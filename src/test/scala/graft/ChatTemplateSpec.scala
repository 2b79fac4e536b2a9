package graft

import org.apache.spark.sql.functions._
import graft.text.ChatTemplate

/** ChatML rendering + loss-mask span invariants (q134 gates the
  * cross-engine replay; these gate the template bytes and that spans
  * actually address assistant content in the rendered string).
  */
class ChatTemplateSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq((1L, Seq(
    ("system", "be brief"),
    ("user", "hi there"),
    ("assistant", "hello!"),
    ("user", "bye"),
    ("assistant", "goodbye"))))
    .toDF("id", "turns")
    .select($"id", $"turns".cast(
      "array<struct<role:string,content:string>>").as("turns"))

  test("golden render") {
    val got = turns.select(ChatTemplate.renderColumn($"turns").as("t"))
      .head().getString(0)
    assert(got ==
      "<|im_start|>system\nbe brief<|im_end|>\n" +
      "<|im_start|>user\nhi there<|im_end|>\n" +
      "<|im_start|>assistant\nhello!<|im_end|>\n" +
      "<|im_start|>user\nbye<|im_end|>\n" +
      "<|im_start|>assistant\ngoodbye<|im_end|>\n")
    val gen = turns.select(ChatTemplate.renderColumn($"turns",
      addGenerationPrompt = true).as("t")).head().getString(0)
    assert(gen.endsWith("<|im_start|>assistant\n"))
  }

  test("spans address exactly the assistant content in the rendered text") {
    val row = ChatTemplate.renderWithSpans(turns, "id", "turns").head()
    val text = row.getString(1)
    val spans = row.getSeq[org.apache.spark.sql.Row](2)
    assert(spans.length == 2)
    val cut = spans.map(s =>
      text.substring(s.getLong(0).toInt, s.getLong(1).toInt))
    assert(cut == Seq("hello!", "goodbye"))
  }

  test("no assistant turns -> empty spans; empty turns -> empty text") {
    val d = Seq((1L, Seq(("user", "hi"))), (2L, Seq.empty[(String, String)]))
      .toDF("id", "turns")
      .select($"id", $"turns".cast(
        "array<struct<role:string,content:string>>").as("turns"))
    val out = ChatTemplate.renderWithSpans(d, "id", "turns")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getSeq[Any](2).length))).toMap
    assert(out(1L)._1 == "<|im_start|>user\nhi<|im_end|>\n" && out(1L)._2 == 0)
    assert(out(2L) == (("", 0)))
  }
}
