package graft

import graft.text.{HtmlStrip, Normalize}
import org.apache.spark.sql.functions._

class HtmlStripSpec extends SparkSpec {
  import spark.implicits._

  private def strip(h: String): String =
    Seq(h).toDF("h").select(HtmlStrip.textOf(col("h")).as("t")).as[String].head()

  test("script/style/noscript vanish WITH their content; comments vanish") {
    assert(strip("a<script>var x = 1 < 2;</script>b") == "ab")
    assert(strip("a<style>p { color: red }</style>b") == "ab")
    assert(strip("a<!-- hidden <b>bold</b> -->b") == "ab")
    assert(strip("a<SCRIPT TYPE=\"x\">multi\nline</SCRIPT>b") == "ab")
  }

  test("block tags become newlines; inline tags become spaces, words never fuse") {
    assert(strip("<p>one</p><p>two</p>") == " one\n two\n")
    assert(strip("alpha<b>beta</b>gamma") == "alpha beta gamma")
    assert(strip("<ul><li>a</li><li>b</li></ul>") == "  a\n b\n\n")
  }

  test("named entities decode; &amp; decodes last; numeric entities pass through") {
    assert(strip("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; y") ==
      "x <tag> \"q\" 's' & y")
    assert(strip("&amp;lt;") == "&lt;") // double-encoded stays literal
    assert(strip("&#169;") == "&#169;") // numeric: documented out of scope
  }

  test("textOfFull: numeric entities decode; malformed pass through; equals textOf on named-only input") {
    def full(h: String): String =
      Seq(h).toDF("h").select(HtmlStrip.textOfFull(col("h")).as("t")).as[String].head()
    assert(full("&#169; &#xA9; &#x1F600;") == "© © 😀")
    assert(full("x &lt;y&gt; &amp; &#39;z&#39; &nbsp;w") == "x <y> & 'z'  w")
    // malformed / out-of-range pass through verbatim, never dropped
    assert(full("&#xD800; &#; &#999999999; &copy; &notentity") ==
      "&#xD800; &#; &#999999999; &copy; &notentity")
    assert(full("&amp;lt;") == "&lt;") // left-to-right single pass == decode-amp-last
    // named-only inputs: kernel path ≡ regex-chain path
    val inputs = Seq("<p>a &amp; b</p>", "x &quot;q&quot; &#39;s&#39;", "plain")
    val a = inputs.toDF("h").select(HtmlStrip.textOf(col("h")).as("t")).as[String].collect().toSeq
    val b = inputs.toDF("h").select(HtmlStrip.textOfFull(col("h")).as("t")).as[String].collect().toSeq
    assert(a == b)
    // stays codegen'd — no ScalaUDF in the plan
    val plan = Tables.documents(spark, sf)
      .select(HtmlStrip.textOfFull(col("text")).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("Exchange"), plan)
  }

  test("composes with Normalize for final whitespace policy") {
    val cleaned = Seq("<p>a</p> <div>b  c</div>").toDF("h")
      .select(Normalize.cleanColumn(HtmlStrip.textOf(col("h"))).as("t"))
      .as[String].head()
    assert(cleaned == "a\nb c")
  }

  test("extract report: golden counts") {
    val d = Seq((1L, "<p>hi &amp; bye</p><!-- c -->")).toDF("id", "html")
    val r = HtmlStrip.extract(d, "id", "html").head()
    assert(r.getAs[String]("text") == " hi & bye\n")
    assert(r.getAs[Long]("n_tags") == 3L) // <p>, </p>, and the comment's <!-- c --> angle run
    assert(r.getAs[Long]("n_chars_html") == 29L)
    assert(r.getAs[Long]("n_chars_text") == 10L)
  }

  test("extract is shuffle-free on a parquet scan") {
    val d = Tables.documents(spark, sf).select(col("doc_id"),
      concat(lit("<p>"), col("text"), lit("</p>")).as("html"))
    val out = HtmlStrip.extract(d, "doc_id", "html")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(out.count() == d.count())
  }
}
