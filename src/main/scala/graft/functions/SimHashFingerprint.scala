package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit simhash of a token array — the
  * per-token vote loop of [[graft.dedup.SimHash]] without the ScalaUDF
  * ArrayData→Seq[String] conversion (and, in portable mode, without a
  * String per memo hit: the token→hash memo is keyed by UTF8String, so
  * only a MISS pays the byte-array copy + md5).
  *
  * `portable = false`: token hash is XXH64 over the UTF8String bytes read
  * in place (same values as the `xxhash64()` expression, seed 42) — zero
  * allocation per token.
  * `portable = true`: token hash is the lower 60 bits of md5 (same value
  * as `conv(substring(md5(t),18,15),16,10)`), which is what lets the
  * DuckDB oracle recompute whole fingerprints from scratch; md5 results
  * are memoized per task (Zipf token repetition makes hits dominant),
  * capped so a pathological vocabulary cannot exhaust task memory.
  */
case class SimHashFingerprint(child: Expression, portable: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  // per-deserialized-instance (= per task) state; @transient so a
  // driver-side evaluation cannot poison task serialization
  @transient private lazy val cache = new java.util.HashMap[UTF8String, java.lang.Long]()
  @transient private var cacheBytes = 0L
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  private def portableTokenHash(s: UTF8String): Long = {
    var boxed = cache.get(s)
    if (boxed == null) {
      // lower 60 bits of md5 = hex chars 18..32 = low nibble of byte 8
      // then bytes 9..15
      val d = md5.digest(s.getBytes)
      var h = (d(8) & 0x0f).toLong
      var b = 9
      while (b < 16) { h = (h << 8) | (d(b) & 0xff).toLong; b += 1 }
      boxed = java.lang.Long.valueOf(h)
      // the key must be a defensive copy: the looked-up UTF8String may
      // point into a reused row buffer. Admission is bounded by a BYTE
      // budget (key bytes, ~16 MB/task), not an entry count — a corpus of
      // many long distinct tokens would otherwise hold hundreds of MB per
      // task before an entry cap engaged — and long tokens are skipped
      // outright: under Zipf they are the least likely to repeat, so they
      // pay the md5 each time instead of occupying the memo.
      // charge the ~per-entry JVM overhead (HashMap.Node + UTF8String +
      // byte[] + boxed Long ≈ 100 B), not just key bytes — a memo full
      // of 2-byte tokens would otherwise hold ~100× the stated budget
      val entryCost = s.numBytes + SimHashFingerprint.EntryOverheadBytes
      if (s.numBytes <= SimHashFingerprint.MaxMemoTokenBytes &&
          cacheBytes + entryCost <= SimHashFingerprint.MaxMemoBytes) {
        cache.put(s.clone(), boxed)
        cacheBytes += entryCost
      }
    }
    boxed.longValue
  }

  /** Compiled kernel shared by eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      val s = arr.getUTF8String(t)
      val h =
        if (portable) portableTokenHash(s)
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashFingerprint].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFingerprint {
  /** Per-task md5-memo budget (~16 MB) charged as key bytes PLUS the
    * per-entry JVM overhead — bounding real heap, so neither long-token
    * corpora (many key bytes) nor short-token corpora (many entries)
    * can hold hundreds of MB per task × concurrent tasks.
    */
  val MaxMemoBytes: Long = 16L << 20

  /** Approximate heap cost of one memo entry beyond its key bytes:
    * HashMap.Node + cloned UTF8String header + its byte[] header + the
    * boxed Long value.
    */
  val EntryOverheadBytes: Int = 100

  /** Tokens longer than this skip the memo entirely: under a Zipf token
    * distribution long tokens repeat the least, so caching them spends
    * budget on the entries least likely to hit.
    */
  val MaxMemoTokenBytes: Int = 64
}
