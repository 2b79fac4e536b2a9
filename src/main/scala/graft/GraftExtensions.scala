package graft

import graft.functions.{ArrayCosineSimilarity, NullToken}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Session extensions registering graft's native Catalyst functions so SQL
  * users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * spark.sql("SELECT graft_sk_hash(c_custkey, c_name) ...")
  * }}}
  *
  * (or via `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Catalyst twin of functions.surrogateKeyString (defaults: upper=true,
    * no trims) — built from raw expressions; the analyzer inserts the same
    * implicit casts the Column API gets.
    */
  private def skString(children: Seq[Expression]): Expression = {
    require(children.nonEmpty, "graft_sk_string takes at least 1 argument")
    val parts = children.map(c =>
      Cast(Coalesce(Seq(Upper(c), Literal(NullToken))), StringType))
    if (parts.length == 1) parts.head else Cast(CreateArray(parts), StringType)
  }

  private def skHash(children: Seq[Expression]): Expression =
    Unhex(Substring(Sha2(skString(children), Literal(224)), Literal(1), Literal(40)))

  /** Catalyst twin of Sampling.uniform01: first 60 bits of the key md5
    * scaled by 2^-60 — the deterministic engine-portable uniform draw
    * behind weighted sampling and split assignment.
    */
  private def uniform01(children: Seq[Expression]): Expression = {
    require(children.nonEmpty, "graft_uniform01 takes at least 1 argument")
    val joined = ConcatWs(
      Literal("\u0001") +: children.map(c =>
        Coalesce(Seq(Cast(c, StringType), Literal(NullToken)))))
    val hex15 = Substring(Md5(Encode(joined, Literal("UTF-8"))), Literal(1), Literal(15))
    Divide(
      Cast(Cast(Conv(hex15, Literal(16), Literal(10)), LongType), DoubleType),
      Literal(1152921504606846976.0)) // 2^60
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[ArrayCosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine takes exactly 2 arguments")
        ArrayCosineSimilarity(children.head, children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_sk_string"),
      new ExpressionInfo(getClass.getName, "graft_sk_string"),
      (children: Seq[Expression]) => skString(children)
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_sk_hash"),
      new ExpressionInfo(getClass.getName, "graft_sk_hash"),
      (children: Seq[Expression]) => skHash(children)
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_uniform01"),
      new ExpressionInfo(getClass.getName, "graft_uniform01"),
      (children: Seq[Expression]) => uniform01(children)
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(getClass.getName, "graft_hamming"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_hamming takes exactly 2 arguments")
        BitwiseCount(BitwiseXor(children.head, children(1)))
      }
    ))
    // graft_minhash(tokens, k, numHashes, seed) — the native minhash
    // signature kernel; trailing args must be foldable literals
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_minhash takes (tokens, k, numHashes, seed)")
        def lit(e: Expression, name: String): Long = e match {
          case Literal(v: Int, _) => v.toLong
          case Literal(v: Long, _) => v
          case _ => throw new IllegalArgumentException(s"graft_minhash $name must be a literal")
        }
        graft.functions.MinHashSignature(children.head,
          lit(children(1), "k").toInt, lit(children(2), "numHashes").toInt,
          lit(children(3), "seed"))
      }
    ))
    // graft_nfc(text) — Unicode NFC normalization (DuckDB: nfc_normalize)
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfc takes exactly 1 argument")
        graft.functions.NfcNormalize(Cast(children.head, StringType))
      }
    ))
    // graft_nfkc(text) — Unicode NFKC normalization (the dedup-key form;
    // no SQL engine in the gate stack ships NFKC, so its gate replays
    // pinned expansions — see NfkcNormalize scaladoc)
    ext.injectFunction((
      new FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[graft.functions.NfkcNormalize].getName, "graft_nfkc"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfkc takes exactly 1 argument")
        graft.functions.NfkcNormalize(Cast(children.head, StringType))
      }
    ))
    // graft_registered_domain(host) — PSL registered domain (row 65)
    ext.injectFunction((
      new FunctionIdentifier("graft_registered_domain"),
      new ExpressionInfo(classOf[graft.functions.RegisteredDomain].getName, "graft_registered_domain"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_registered_domain takes exactly 1 argument")
        graft.functions.RegisteredDomain(Cast(children.head, StringType))
      }
    ))
    // graft_html_entity_decode(text) — named + numeric entity decode
    ext.injectFunction((
      new FunctionIdentifier("graft_html_entity_decode"),
      new ExpressionInfo(classOf[graft.functions.HtmlEntityDecode].getName, "graft_html_entity_decode"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_html_entity_decode takes exactly 1 argument")
        graft.functions.HtmlEntityDecode(Cast(children.head, StringType))
      }
    ))
    // graft_simhash(tokens, portable) — the native simhash kernel
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.functions.SimHashFingerprint].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_simhash takes (tokens, portable)")
        val portable = children(1) match {
          case Literal(v: Boolean, _) => v
          case _ => throw new IllegalArgumentException("graft_simhash portable must be a boolean literal")
        }
        graft.functions.SimHashFingerprint(children.head, portable)
      }
    ))
  }
}
