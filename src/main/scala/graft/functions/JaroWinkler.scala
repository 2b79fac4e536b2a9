package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Classic Jaro (1989) / Jaro–Winkler (1990) string similarity as a
  * native Catalyst expression — the fuzzy-compare primitive record
  * linkage uses where Levenshtein's unit-cost edits are the wrong model
  * (JW weights agreement of the PREFIX, where real-world identifiers
  * rarely differ). Spark has levenshtein() built in but no Jaro family;
  * DuckDB has both (jaro_similarity / jaro_winkler_similarity), which
  * is what makes this oracle-checkable.
  *
  * Definition (matching DuckDB's, verified empirically + at its edges):
  * match window = max(l1,l2)/2 − 1 (floor, ≥0); m = matched code
  * points; t = FLOOR(k/2) where k is the out-of-order matched count
  * (k can be odd for multiset permutations — the reference floors);
  * jaro = (m/l1 + m/l2 + (m−t)/m)/3; Winkler boost
  * jw = jaro + min(prefix,4)·0.1·(1−jaro) applied only when
  * jaro > 0.7 (the classic boost threshold — DuckDB keeps it too);
  * either side empty → 0.0 (DuckDB's convention, INCLUDING "" vs "").
  * Operates on CODE POINTS (supplementary-plane safe), matching
  * DuckDB's unicode handling.
  *
  * Scale/codegen: the kernel is a static JVM method the generated code
  * calls directly — per-pair cost O(l1·window) with two small reused
  * flag arrays, no UDF serialization boundary, stays inside the
  * enclosing whole-stage loop (the ArrayCosineSimilarity pattern).
  * Gate surfaces round to 9 decimals: both engines compute the same
  * rational dag but not necessarily in the same op order (~1 ulp).
  */
object JaroWinkler {

  /** Jaro similarity over code points. */
  def jaro(a: UTF8String, b: UTF8String): Double =
    jaroOf(codePoints(a.toString), codePoints(b.toString))

  /** Jaro–Winkler with p = 0.1, max prefix 4, boost threshold 0.7. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = codePoints(a.toString)
    val s2 = codePoints(b.toString)
    val j = jaroOf(s1, s2)
    if (j > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(s1.length, s2.length))
      while (p < maxP && s1(p) == s2(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0; var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp; k += 1; i += Character.charCount(cp)
    }
    out
  }

  private def jaroOf(s1: Array[Int], s2: Array[Int]): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) { m1(i) = true; m2(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: mismatches between the two matched sequences in order
    var k = 0; var t2 = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    // FLOOR division, matching DuckDB/RapidFuzz: the matched sequences
    // are multiset permutations whose mismatch count CAN be odd (e.g.
    // "abc" vs "bca" -> 3), and the reference floors k/2 rather than
    // keeping the half (found against the real-corpus oracle, not the
    // textbook pairs -- k is even in every classic example)
    val t = (t2 / 2).toDouble
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }
}

/** `graft_jaro_winkler(left, right)` — see [[JaroWinkler]]. Children
  * must already be string-typed (callers cast).
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_jaro(left, right)` — the un-boosted Jaro form. */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaro"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.jaro($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
