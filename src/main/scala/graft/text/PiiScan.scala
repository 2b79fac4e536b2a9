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
}
