package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: full HTML entity decode — the five named
  * entities PLUS numeric character references (`&#169;`, `&#x1F600;`),
  * which a regexp-replace chain cannot express (the replacement is a
  * computed code point, not a fixed string). Completes
  * [[graft.text.HtmlStrip]]: the regexp chain stays the oracle-gated
  * cross-engine path; this kernel is the production path when corpora
  * carry numeric references. Spec-gated with goldens (DuckDB has no
  * codepoint-construction SQL to replay it — documented, same status as
  * the BPE merge kernel).
  *
  * Decode rules (HTML5-lenient subset): `&#DDD;` / `&#xHHH;` with 1–7
  * digits and a valid Unicode scalar value decode; malformed or
  * out-of-range references pass through verbatim; named entities
  * amp/lt/gt/quot/apos decode, all others (`&copy;` etc.) pass through
  * — passthrough-not-drop means no information is ever destroyed.
  * A fast scan for '&' makes entity-free text (the overwhelming case)
  * zero-allocation.
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_html_entity_decode requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_html_entity_decode"

  /** Kernel shared by eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = str.indexOf(';', i + 1)
        // entities are short; a far-away ';' means this '&' is literal
        if (semi < 0 || semi - i > 9) { out.append(c); i += 1 }
        else {
          val body = str.substring(i + 1, semi)
          val decoded: String = body match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            // plain space, matching HtmlStrip's regexp chain (layout
            // entity → layout character; NBSP would dodge the
            // whitespace collapse downstream)
            case "nbsp" => " "
            case _ if body.length >= 2 && body.charAt(0) == '#' =>
              val (digits, radix) =
                if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
                  (body.substring(2), 16)
                else (body.substring(1), 10)
              try {
                val cp = Integer.parseInt(digits, radix)
                if (digits.nonEmpty && Character.isValidCodePoint(cp) &&
                    !(cp >= 0xD800 && cp <= 0xDFFF) && cp != 0)
                  new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            case _ => null
          }
          if (decoded == null) { out.append(c); i += 1 } // passthrough verbatim
          else { out.append(decoded); i = semi + 1 }
        }
      }
    }
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hed", this, classOf[HtmlEntityDecode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
