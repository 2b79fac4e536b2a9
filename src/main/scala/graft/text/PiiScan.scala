package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection / redaction over a text column — a training-data pipeline
  * must be able to flag and scrub emails, phone numbers, URLs and IPs
  * before a corpus ships.
  *
  * Patterns stay within the regex subset Java and RE2 share (no lookahead,
  * no backrefs) so the same scan is reproducible on any engine. All flags
  * compute in one narrow codegen'd pass (rlike), no UDFs, no shuffle;
  * redaction is a regexp_replace chain in the same pass.
  */
object PiiScan {

  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Phone = "\\+?[0-9][0-9 ()-]{7,}[0-9]"
  val Url = "https?://[^ ]+"
  val Ipv4 = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Ordered: patterns overlap (an email inside a URL, an IP inside a URL),
    * so redaction applies url first, then email, then the rest — a fixed
    * order, not Map iteration order, keeps output stable.
    */
  val Patterns: Seq[(String, String)] =
    Seq("url" -> Url, "email" -> Email, "phone" -> Phone, "ip" -> Ipv4)

  /** Adds one boolean `pii_<kind>` column per pattern. */
  def flags(df: DataFrame, textCol: String): DataFrame =
    Patterns.foldLeft(df) { case (d, (kind, pat)) =>
      d.withColumn(s"pii_$kind", col(textCol).rlike(pat))
    }

  /** Replaces every PII match with `<KIND>` tokens, most-enclosing pattern
    * (url) first.
    */
  def redact(textCol: Column): Column =
    Patterns.foldLeft(textCol) { case (c, (kind, pat)) =>
      regexp_replace(c, pat, s"<${kind.toUpperCase}>")
    }

  // ------------------------------------------------- checksum-validated ids

  /** 13–19 digits with optional space/dash group separators — the shape a
    * card number is written in. A regex alone over-fires on invoice/order
    * numbers; [[luhnValid]] on the stripped digits is what separates a
    * card from a coincidence (the false-positive spec pins this).
    */
  val CardCandidate = "\\b[0-9][0-9 -]{11,21}[0-9]\\b"

  /** IBAN surface shape: country alpha-2 + 2 check digits + 8–30
    * alphanumerics (no separators; normalize upstream). [[ibanValid]]'s
    * mod-97 test is the validator.
    */
  val IbanCandidate = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{8,30}\\b"

  /** Luhn mod-10 validity of a PURE digit string (ISO/IEC 7812-1): from
    * the rightmost digit, double every second digit, subtract 9 when the
    * double exceeds 9, and require the total ≡ 0 (mod 10). Exact integer
    * column arithmetic — no UDF, replayable digit-for-digit in any
    * engine, which is what lets the q147 oracle recompute every checksum.
    * Empty/null → false.
    */
  def luhnValid(digits: Column): Column = {
    val total = aggregate(
      transform(split(reverse(digits), ""), (c, i) => {
        val d = c.cast("int")
        when(i % 2 === 0, d)
          .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
      }),
      lit(0), (acc, x) => acc + x)
    coalesce(length(digits) > 0 && total % 10 === 0, lit(false))
  }

  /** IBAN mod-97 validity (ISO 13616 / ISO 7064): rotate the first four
    * chars to the end, expand letters to two-digit values (A=10 … Z=35),
    * and fold the digit string through acc = (acc·10 + d) mod 97 — the
    * standard streaming form of the big-integer test, so no value ever
    * exceeds 10·97 and the arithmetic is exact 64-bit on every engine.
    * Valid iff the fold ends at 1. Input must be separator-free
    * uppercase (the [[IbanCandidate]] shape).
    */
  def ibanValid(iban: Column): Column = {
    val rotated = concat(substring(iban, 5, 1 << 30), substring(iban, 1, 4))
    val expanded = array_join(
      transform(split(rotated, ""), c =>
        when(c.between("0", "9"), c)
          .otherwise((ascii(c) - 55).cast("string"))), "")
    val rem = aggregate(
      transform(split(expanded, ""), c => c.cast("long")),
      lit(0L), (acc, d) => (acc * 10 + d) % 97)
    coalesce(length(iban) >= 12 && rem === 1, lit(false))
  }

  /** Checksum-validated id scan: adds `cards_valid` / `ibans_valid`
    * (the VALIDATED matches, separator-stripped for cards, in match
    * order) and their counts. One narrow codegen'd pass — extract,
    * strip, checksum-filter — no UDF, no shuffle; per-row cost is the
    * row's own match count.
    */
  def checksumScan(df: DataFrame, textCol: String): DataFrame = {
    val cards = filter(
      transform(regexp_extract_all(col(textCol), lit(CardCandidate), lit(0)),
        c => regexp_replace(c, "[ -]", "")),
      d => length(d).between(13, 19) && luhnValid(d))
    val ibans = filter(regexp_extract_all(col(textCol), lit(IbanCandidate), lit(0)),
      ibanValid(_))
    val empty = expr("cast(array() as array<string>)")
    df.withColumn("cards_valid", coalesce(cards, empty)) // NULL text → no ids
      .withColumn("ibans_valid", coalesce(ibans, empty))
      .withColumn("n_cards_valid", size(col("cards_valid")).cast("long"))
      .withColumn("n_ibans_valid", size(col("ibans_valid")).cast("long"))
  }
}
