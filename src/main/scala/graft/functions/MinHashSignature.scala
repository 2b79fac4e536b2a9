package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: minhash signature (array<bigint> of length
  * `numHashes`) of a token array — the hot per-row kernel of the near-dup
  * pipeline as a codegen'd expression instead of a Scala UDF.
  *
  * What the UDF boundary cost: ScalaUDF converts the Catalyst ArrayData to
  * a Seq[String] per row (one Seq plus one String allocation per token)
  * before the compiled loop even starts. Here the loop reads UTF8String
  * bytes in place — token hashes are murmur3 over the raw UTF-8 bytes
  * (org.apache.spark.unsafe.hash.Murmur3_x86_32), no String, no Seq — and
  * the expression stays inside the enclosing whole-stage-codegen'd
  * projection via `doGenCode` (the generated code calls [[compute]]
  * directly: the loop is JVM-compiled either way, so generating its source
  * would add compile cost for no gain; what matters is staying off the
  * ScalaUDF conversion path).
  *
  * Semantics (shared with the former UDF form): word k-grams mix the k
  * token hashes order-dependently (scala MurmurHash3.mix/finalizeHash),
  * the 32-bit gram hash widens to [0, 2^32), and numHashes affine mod-p
  * "permutations" (a·h + b mod p, p > 2^32 — see
  * [[graft.dedup.MinHashLsh]]'s monotone-permutation note) take per-gram
  * minima. Documents with fewer than k tokens yield NULL.
  */
case class MinHashSignature(child: Expression, k: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(k > 0 && numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  private val MinHashPrime = 4294967311L // > 2^32

  // same constants contract as MinHashLsh.perms: 30-bit a (odd) / b so
  // a*h32 + b stays under 2^62 (ANSI-safe), deterministic from the seed
  @transient private lazy val perms: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = (rnd.nextInt(1 << 30).toLong << 1) | 1L
      b(i) = rnd.nextInt(1 << 30).toLong
      i += 1
    }
    (a, b)
  }

  /** Compiled kernel, shared by eval and generated code. Public: the
    * codegen references this instance and calls it per row.
    */
  def compute(arr: ArrayData): ArrayData = {
    val nTok = arr.numElements()
    if (nTok < k) return null
    val (a, b) = perms
    val n = numHashes
    val tokHash = new Array[Int](nTok)
    var i = 0
    while (i < nTok) {
      val s = arr.getUTF8String(i)
      tokHash(i) = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
      i += 1
    }
    val sig = Array.fill(n)(Long.MaxValue)
    i = 0
    while (i <= nTok - k) {
      var gh = 0x9747b28c
      var t = 0
      while (t < k) { gh = scala.util.hashing.MurmurHash3.mix(gh, tokHash(i + t)); t += 1 }
      val h = scala.util.hashing.MurmurHash3.finalizeHash(gh, k).toLong & 0xffffffffL
      var j = 0
      while (j < n) {
        val v = (a(j) * h + b(j)) % MinHashPrime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
