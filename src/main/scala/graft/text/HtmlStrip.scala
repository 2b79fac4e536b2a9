package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction, the step BEFORE every web-corpus scrub
  * (the C4/CCNet family strips markup before any quality or dedup
  * pass). Not a browser-grade parser — a deterministic, documented
  * regexp chain (comments/script/style removal, block-tag → newline,
  * tag strip, the five named entities + numeric decimal/hex decode is
  * OUT of scope and documented) that two engines replay byte-for-byte:
  * every pattern uses inline flags `(?is)`, character classes,
  * non-greedy quantifiers and fixed alternatives only — identical
  * semantics in Java regex and RE2 (the DuckDB oracle).
  *
  * Compose with [[Normalize.cleanColumn]] for whitespace/unicode
  * cleanup — extraction deliberately leaves spacing artifacts so the
  * one whitespace policy lives in one operator.
  *
  * Scale shape: a narrow projection of chained `regexp_replace` — no
  * shuffle, no UDF; scan speed at 100 TB.
  */
object HtmlStrip {

  /** Comments; script/style/noscript blocks WITH their content (the
    * text inside them is code, not prose). `(?is)`: case-insensitive,
    * dot-matches-newline — same inline-flag semantics in Java and RE2.
    */
  val CommentPattern = "(?s)<!--.*?-->"
  val ScriptStylePattern = "(?is)<(?:script|style|noscript)[^>]*>.*?</(?:script|style|noscript)\\s*>"

  /** Block-level boundaries become newlines so "<p>a</p><p>b</p>"
    * reads as two lines, not "ab".
    */
  val BlockBreakPattern = "(?i)<(?:br|hr|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table|/blockquote|/pre|/section|/article|/header|/footer)[^>]*>"

  /** Any remaining tag (replaced by a SPACE: "a<b>c" must not fuse to
    * "ac"; the downstream whitespace collapse owns the cleanup).
    */
  val TagPattern = "<[^>]*>"

  /** Extracted text column: markup removed, the five named entities
    * decoded (`&amp;` LAST, so "&amp;lt;" correctly yields the literal
    * "&lt;"), `&nbsp;` becoming a plain space. Numeric entities
    * (`&#NNN;`) are left as-is — decoding them needs a codepoint
    * kernel, not a replace chain; [[Normalize]] runs after this anyway.
    */
  def textOf(html: Column): Column = {
    val t0 = regexp_replace(html, CommentPattern, "")
    val t1 = regexp_replace(t0, ScriptStylePattern, "")
    val t2 = regexp_replace(t1, BlockBreakPattern, "\n")
    val t3 = regexp_replace(t2, TagPattern, " ")
    val e1 = regexp_replace(t3, "&nbsp;", " ")
    val e2 = regexp_replace(e1, "&lt;", "<")
    val e3 = regexp_replace(e2, "&gt;", ">")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    val e5 = regexp_replace(e4, "&#39;", "'")
    regexp_replace(e5, "&amp;", "&")
  }

  /** [[textOf]] with FULL entity decoding via the native
    * [[graft.functions.HtmlEntityDecode]] kernel: numeric character
    * references (`&#169;`, `&#x1F600;`) decode too — a computed code
    * point, inexpressible as a replace chain. The production path for
    * corpora that carry numeric references; [[textOf]] stays the
    * oracle-gated cross-engine form (the kernel is spec-gated with
    * goldens — DuckDB has no codepoint-construction SQL, the same
    * status as the BPE merge kernel). Single-pass, codegen'd,
    * zero-allocation on entity-free text.
    */
  def textOfFull(html: Column): Column = {
    val t0 = regexp_replace(html, CommentPattern, "")
    val t1 = regexp_replace(t0, ScriptStylePattern, "")
    val t2 = regexp_replace(t1, BlockBreakPattern, "\n")
    val t3 = regexp_replace(t2, TagPattern, " ")
    org.apache.spark.sql.graftbridge.column(
      graft.functions.HtmlEntityDecode(
        org.apache.spark.sql.graftbridge.expression(t3)))
  }

  /** Per-document extraction report: (id, text, n_tags, n_chars_html,
    * n_chars_text). `n_tags` counts `<...>` constructs in the RAW html
    * (comment delimiters count as their angle-bracket runs — it is a
    * markup-density diagnostic, not a DOM node count). One narrow pass;
    * the 10-regex [[textOf]] chain is projected ONCE (Catalyst does not
    * reliably CSE a repeated expression tree across a Project) and
    * n_chars_text derives from the materialized column.
    */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    df.select(
      col(idCol),
      textOf(h).as("text"),
      size(expr(s"regexp_extract_all($htmlCol, '$TagPattern', 0)"))
        .cast("long").as("n_tags"),
      length(h).cast("long").as("n_chars_html"))
      .select(col("*"), length(col("text")).cast("long").as("n_chars_text"))
  }
}
