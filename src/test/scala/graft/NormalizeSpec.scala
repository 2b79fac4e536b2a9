package graft

import graft.text.Normalize
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOne(s: String): String =
    Seq(s).toDF("t").select(Normalize.cleanColumn(col("t")).as("c")).as[String].head()

  test("NFC composes decomposed sequences; ASCII is untouched") {
    assert(cleanOne("cafe\u0301") == "caf\u00E9")
    assert(cleanOne("plain ascii text") == "plain ascii text")
    // already-NFC non-ASCII passes through
    assert(cleanOne("caf\u00E9 na\u00EFve") == "caf\u00E9 na\u00EFve")
  }

  test("invisibles (ZWSP/ZWJ/WJ/BOM/soft hyphen) are stripped") {
    assert(cleanOne("a\u200Bb\u200Cc\u200Dd\u2060e\uFEFFf\u00ADg") == "abcdefg")
  }

  test("line endings normalize: CRLF and lone CR become LF") {
    assert(cleanOne("a\r\nb\rc\nd") == "a\nb\nc\nd")
  }

  test("C0 controls are stripped; tab/space runs collapse; line edges trim") {
    assert(cleanOne("a\u0001\u0002b") == "ab")
    assert(cleanOne("a\t \tb   c") == "a b c")
    assert(cleanOne("  a  \n   b  ") == "a\nb")
  }

  test("blank-line runs collapse to one blank line; ends trim blank lines") {
    assert(cleanOne("a\n\n\n\n\nb") == "a\n\nb")
    assert(cleanOne("\n\na\n\n") == "a")
  }

  test("output is NFC even when stripping an invisible exposes a combining mark") {
    // soft hyphen between base char and combining acute: after the strip
    // the pair is newly adjacent and decomposed -- the second NFC pass
    // must compose it (byte-keyed dedup downstream relies on this)
    assert(cleanOne("cafe\u00AD\u0301") == "caf\u00E9")
    assert(cleanOne("e\u200B\u0301x") == "\u00E9x")
  }

  test("null text stays null; empty stays empty") {
    val r = Seq[(Integer, String)]((1, null), (2, ""), (3, " \n "))
      .toDF("id", "t").select(Normalize.cleanColumn(col("t")).as("c"))
      .as[String].collect()
    assert(r(0) == null && r(1) == "" && r(2) == "")
  }

  test("clean() changed flag catches a same-length rewrite (lone CR)") {
    val df = Seq((1L, "a\rb"), (2L, "a\nb")).toDF("id", "text")
    val out = Normalize.clean(df, "id", "text").orderBy("id")
      .select("changed", "n_chars_raw", "n_chars_norm")
      .as[(Boolean, Long, Long)].collect()
    assert(out(0) == ((true, 3L, 3L)))  // content changed, length identical
    assert(out(1) == ((false, 3L, 3L)))
  }

  test("NFKC folds compatibility forms; lossy by design; ASCII identity; idempotent") {
    def nfkcOne(s: String): String =
      Seq(s).toDF("t").select(Normalize.nfkc(col("t")).as("n")).as[String].head()
    // the pinned mappings the q158 oracle hard-codes
    assert(nfkcOne("ﬁle") == "file")       // ﬁ ligature
    assert(nfkcOne("②nd") == "2nd")        // ② enclosed digit
    assert(nfkcOne("5㎞") == "5km")         // ㎞ unit square
    assert(nfkcOne("Ｈi") == "Hi")          // Ｈ fullwidth
    assert(nfkcOne("½") == "1⁄2")     // ½ -> 1⁄2 (fraction slash)
    // NFC leaves all of these alone — the two forms are NOT interchangeable
    assert(cleanOne("ﬁle") == "ﬁle")
    // ASCII identity and idempotence
    assert(nfkcOne("plain ascii") == "plain ascii")
    assert(nfkcOne(nfkcOne("ﬁ②㎞")) == nfkcOne("ﬁ②㎞"))
    // SQL registration
    val sql = spark.sql("SELECT graft_nfkc('ﬁle') AS n").as[String].head()
    assert(sql == "file")
  }

  test("graft_nfc SQL function matches the Column API and survives codegen") {
    val df = Seq("cafe\u0301", "abc", "A\u030Angstro\u0308m").toDF("t")
    df.createOrReplaceTempView("nfc_t")
    val api = df.select(Normalize.nfc(col("t")).as("n"))
    val sql = spark.sql("SELECT graft_nfc(t) AS n FROM nfc_t")
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
    assert(sql.orderBy("n").as[String].collect().toSeq ==
      Seq("caf\u00E9", "abc", "\u00C5ngstr\u00F6m").sorted)
    // the normalization projection stays inside WholeStageCodegen (a
    // parquet-backed scan — the local Seq relation above constant-folds)
    val onScan = Tables.documents(spark, sf)
      .select(Normalize.nfc(col("text")).as("n"))
    // "*(n) " marks a WholeStageCodegen span in the compact plan string
    val plan = onScan.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("graft_nfc") && l.contains("*(")), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
