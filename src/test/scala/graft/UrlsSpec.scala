package graft

import graft.text.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Urls.canonicalize(col("u")).as("c")).as[String].head()

  private def dom(h: String): String =
    Seq(h).toDF("h").select(Urls.registeredDomain(col("h")).as("d")).as[String].head()

  test("scheme and host lowercase; default ports drop, explicit ports keep") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path") == "https://www.example.com/Path")
    assert(canon("http://Example.com:80/") == "http://example.com/")
    assert(canon("http://example.com:443/x") == "http://example.com:443/x") // 443 is NOT http's default
    assert(canon("https://example.com:8080/x") == "https://example.com:8080/x")
  }

  test("fragment drops; empty path becomes /") {
    assert(canon("https://ex.com#top") == "https://ex.com/")
    assert(canon("https://ex.com/a/b#sec?notquery") == "https://ex.com/a/b")
  }

  test("tracking params strip in first/middle/last position; others survive") {
    assert(canon("https://ex.com/p?utm_source=a&id=1&utm_campaign=b") == "https://ex.com/p?id=1")
    assert(canon("https://ex.com/p?id=1&fbclid=xyz") == "https://ex.com/p?id=1")
    assert(canon("https://ex.com/p?utm_a=1&utm_b=2") == "https://ex.com/p")
    assert(canon("https://ex.com/p?ref=hn&a=2&gclid=g") == "https://ex.com/p?a=2")
    // param VALUES containing 'utm_' survive; only names match at a boundary
    assert(canon("https://ex.com/p?q=utm_source") == "https://ex.com/p?q=utm_source")
  }

  test("path case and param order are preserved (identity, not rewriting)") {
    assert(canon("https://ex.com/CaseSensitive/Path?b=2&a=1") ==
      "https://ex.com/CaseSensitive/Path?b=2&a=1")
  }

  test("registered domain: two labels, public-suffix ccTLD forms, passthrough") {
    assert(dom("www.example.com") == "example.com")
    assert(dom("a.b.deep.example.org") == "example.org")
    assert(dom("www.example.co.uk") == "example.co.uk")
    assert(dom("news.bbc.ac.jp") == "bbc.ac.jp")
    assert(dom("localhost") == "localhost")     // single label: passthrough
    assert(dom("127.0.0.1") == "0.1")           // numeric hosts are out of scope (documented)
  }

  test("canonicalReport is shuffle-free on a parquet scan") {
    val d = Tables.documents(spark, sf).select(col("doc_id"),
      concat(lit("https://Ex.COM/p/"), col("doc_id")).as("url"))
    val out = Urls.canonicalReport(d, "doc_id", "url")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(out.count() == Tables.documents(spark, sf).count())
  }
}
