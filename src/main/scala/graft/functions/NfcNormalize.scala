package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) of a string — the first step of every web-text cleanup
  * pipeline (ftfy / C4-style scrubbing), and a kernel Spark SQL does not
  * ship (DuckDB has `nfc_normalize`, which is what lets the oracle
  * replay it).
  *
  * Cost model for 100 TB of mostly-ASCII web text: an ASCII byte scan
  * decides the fast path with zero allocation (NFC is the identity on
  * ASCII); non-ASCII rows pay `Normalizer.isNormalized` (no allocation
  * for already-NFC text, the overwhelmingly common case) and only truly
  * decomposed rows pay the normalize + re-encode. Unicode's
  * normalization stability policy makes NFC output identical across
  * implementations for assigned code points, so cross-engine gating is
  * sound.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  // analysis-time type check: a non-string child fails in the analyzer
  // with a clear error, not per-row with a ClassCastException in a task.
  // (ExpectsInputTypes/AbstractDataType are private[sql], so the check is
  // hand-rolled — same constraint as ArrayCosineSimilarity.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_nfc"

  /** Compiled kernel shared by eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) {
        // non-ASCII byte: fall through to the Normalizer path
        val str = s.toString
        return if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
        else UTF8String.fromString(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s // pure ASCII: NFC is the identity
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
