package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode / whitespace text normalization — the deterministic cleanup
  * every web-scraped pretraining corpus runs before any hashing,
  * dedup, or tokenization (the ftfy / C4 scrub family, Raffel et al.
  * 2020, public). Normalizing FIRST matters because every downstream
  * operator keys on text bytes: "café" composed and decomposed are
  * different md5s, different minhash shingles, different BPE
  * pre-tokens — un-normalized corpora silently under-dedup.
  *
  * The reference corpus has no such operator; this is part of the
  * LLM-pipeline extension set (SURVEY §2.3). Every step is a
  * regexp_replace with identical RE2/Java-regex semantics (character
  * classes and fixed alternatives only — no group references, no
  * lookaround), plus the native [[graft.functions.NfcNormalize]]
  * kernel, so a DuckDB oracle replays the whole chain with
  * `nfc_normalize` + the same patterns.
  *
  * Scale shape: one narrow projection — no shuffle, no UDF boxing
  * (the NFC kernel is a codegen'd Catalyst expression with an ASCII
  * zero-allocation fast path). At 100 TB this runs at scan speed.
  */
object Normalize {

  /** Unicode NFC normalization as a column (native expression). */
  def nfc(c: Column): Column =
    org.apache.spark.sql.graftbridge.column(
      graft.functions.NfcNormalize(org.apache.spark.sql.graftbridge.expression(c)))

  /** Unicode NFKC (compatibility) normalization — the DEDUP-KEY form:
    * ligatures, fullwidth forms, compat digits and unit squares fold to
    * their plain equivalents so visually-identical variants hash
    * identically. Lossy by design — normalize the key, keep the
    * original column for display.
    */
  def nfkc(c: Column): Column =
    org.apache.spark.sql.graftbridge.column(
      graft.functions.NfkcNormalize(org.apache.spark.sql.graftbridge.expression(c)))

  /** Zero-width and invisible format characters removed outright:
    * ZWSP/ZWNJ/ZWJ (200B-200D), word joiner (2060), BOM/ZWNBSP (FEFF),
    * soft hyphen (00AD). Escaped `\x{...}` syntax — identical in Java
    * regex and RE2.
    */
  val InvisiblesPattern = "[\\x{200B}-\\x{200D}\\x{2060}\\x{FEFF}\\x{00AD}]"

  /** C0 control characters except tab/LF/CR (those are handled as
    * whitespace), plus DEL. CR is excluded here because the line-ending
    * step rewrites it first.
    */
  val ControlsPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** The full scrub: NFC → strip invisibles → CRLF/CR→LF → strip
    * controls → collapse space/tab runs → trim around newlines →
    * collapse 3+ blank lines to one blank line → trim ends.
    * Returns the input frame with `outCol` appended.
    */
  def cleanColumn(text: Column): Column = {
    val t0 = nfc(text)
    // second NFC after the invisibles strip: removing a ZWJ/soft hyphen
    // can leave a base char newly adjacent to a combining mark in
    // decomposed form, and downstream byte-keyed dedup needs composed
    // output (the reason this operator exists). The kernel's
    // isNormalized fast path makes the re-check ~free on clean text.
    val t1 = nfc(regexp_replace(t0, InvisiblesPattern, ""))
    val t2 = regexp_replace(t1, "\\r\\n?", "\n")
    val t3 = regexp_replace(t2, ControlsPattern, "")
    val t4 = regexp_replace(t3, "[ \\t]+", " ")
    val t5 = regexp_replace(t4, " ?\\n ?", "\n")
    val t6 = regexp_replace(t5, "\\n{3,}", "\n\n")
    trim(t6, " \n") // strip leading/trailing blank space AND blank lines
  }

  /** Per-document scrub report: (id, text_norm, n_chars_raw,
    * n_chars_norm, changed). `changed` compares strings, not lengths —
    * a lone CR→LF rewrite changes content at identical length. One
    * narrow pass, no shuffle.
    */
  def clean(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).as("__raw"),
      cleanColumn(col(textCol)).as("text_norm"))
      .select(
        col(idCol),
        col("text_norm"),
        length(col("__raw")).cast("long").as("n_chars_raw"),
        length(col("text_norm")).cast("long").as("n_chars_norm"),
        (col("text_norm") =!= col("__raw")).as("changed"))
}
