package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFKC normalization (compatibility
  * composition) — [[NfcNormalize]]'s aggressive sibling and the form
  * dedup keys actually want: ligatures (ﬁ→fi), fullwidth forms (Ｈ→H),
  * enclosed/compat digits (②→2), and unit squares (㎞→km) all fold to
  * their plain equivalents, so visually-identical spam variants hash
  * identically. NOT for display text (NFKC is lossy by design — ½
  * becomes 1⁄2); normalize the KEY, keep the original column.
  *
  * Same cost model as NFC: ASCII fast path is the identity with zero
  * allocation (ASCII has no compatibility decompositions);
  * `isNormalized` spares already-normalized non-ASCII. Unicode's
  * stability policy pins NFKC output for assigned code points, but no
  * SQL engine in the gate stack ships NFKC — the q158 oracle therefore
  * replays it over INJECTED compatibility characters whose expansions
  * are pinned literals (the q149 pinned-data rule), which exercises the
  * kernel without asking DuckDB to normalize.
  */
case class NfkcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfkc requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_nfkc"

  /** Compiled kernel shared by eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) {
        val str = s.toString
        return if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
        else UTF8String.fromString(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
      }
      i += 1
    }
    s // pure ASCII: NFKC is the identity
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfkc", this, classOf[NfkcNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
