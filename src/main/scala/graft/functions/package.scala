package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks. All pure `Column` expressions
  * (whole-stage-codegen friendly, no UDFs) unless noted.
  */
package object functions {

  /** Null replacement token used inside surrogate key strings so that
    * NULL and the literal empty string hash differently.
    * (reference: bdq/functions.py:9 null_str_repr)
    */
  val NullToken = "@~<null>~@"

  /** Normalized string form of a composite key: optional upper/trim per
    * column, nulls replaced by [[NullToken]], multi-column keys rendered
    * through an array cast to string. (reference: bdq/functions.py:9)
    */
  def surrogateKeyString(
      keyColumns: Seq[String],
      rtrim: Boolean = false,
      ltrim: Boolean = false,
      upper: Boolean = true,
      nullToken: String = NullToken
  ): Column = {
    val cols = keyColumns.map { n =>
      var c: Column = col(n)
      if (upper) c = org.apache.spark.sql.functions.upper(c)
      if (rtrim) c = org.apache.spark.sql.functions.rtrim(c)
      if (ltrim) c = org.apache.spark.sql.functions.ltrim(c)
      coalesce(c, lit(nullToken)).cast("string")
    }
    if (cols.length == 1) cols.head else array(cols: _*).cast("string")
  }

  /** 160-bit surrogate key: first 160 bits of sha2 over
    * [[surrogateKeyString]], as binary. (reference: bdq/functions.py:28)
    *
    * `shaBits` selects the sha2 family member; 224 is the reference's
    * choice (and the default). 256 yields the same 160-bit-truncated
    * contract from a hash that more engines expose (e.g. DuckDB has
    * sha256 but not sha224), which is what cross-engine pipelines should
    * pick when the key must be recomputable outside Spark.
    */
  def surrogateKeyHash(
      keyColumns: Seq[String],
      rtrim: Boolean = false,
      ltrim: Boolean = false,
      shaBits: Int = 224
  ): Column = {
    val keyBits = 160
    val hexLen = 2 * keyBits / 8
    unhex(sha2(surrogateKeyString(keyColumns, rtrim = rtrim, ltrim = ltrim), shaBits).substr(1, hexLen))
  }

  /** Cast a double column carrying an exact 2-decimal value to DECIMAL for
    * cross-engine-exact aggregation.
    */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Native codegen'd Jaro–Winkler similarity (see [[JaroWinkler]]). */
  def jaroWinklerSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.column(JaroWinklerSimilarity(
      org.apache.spark.sql.graftbridge.expression(a),
      org.apache.spark.sql.graftbridge.expression(b)))

  /** Native codegen'd un-boosted Jaro similarity. */
  def jaroSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.column(JaroSimilarity(
      org.apache.spark.sql.graftbridge.expression(a),
      org.apache.spark.sql.graftbridge.expression(b)))
}
