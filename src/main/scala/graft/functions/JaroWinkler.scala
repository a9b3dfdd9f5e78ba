package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd expression — the
  * record-linkage scorer (names, addresses, product titles) beside
  * [[graft.operators.Joins.blockedFuzzyJoin]]'s edit distance: insensitive
  * to length like Levenshtein is not, with the Winkler prefix bonus that
  * matches how human-entered strings actually diverge (typos cluster at
  * the tail, not the head).
  *
  * Semantics are the CLASSIC Winkler variant, matching DuckDB's
  * `jaro_winkler_similarity` decision for decision (verified empirically
  * against it, including the edges): match window
  * `max(len)/2 − 1`, transpositions = out-of-order matches / 2, bonus
  * `p = 0.1` over a common prefix capped at 4 applied only when
  * jaro > 0.7 (the boost threshold), empty strings score 0 against
  * everything (including each other). Engine parity: the score shape
  * `(m/l1 + m/l2 + (m−t)/m)/3` runs in IEEE doubles in both engines;
  * callers rank on `round(x, 6)` like every cosine here.
  *
  * Codegen: one static call inside whole-stage codegen — no UDF. Cost
  * O(len1·len2) per pair worst case (the bit-vector window scan), which
  * is why the operator SIDE of this is a blocked join, never a
  * cartesian scorer.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects two strings, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.jw($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Classic Jaro-Winkler; see the case-class doc for the exact
    * contract. Operates on UTF-16 units (exact for ASCII/BMP text). */
  def jw(s1: String, s2: String): Double = {
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
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // t/2 is INTEGER division — DuckDB floors odd out-of-order counts
    // (probed: ABCAWXYZ/BCAWXYZ has 3 mismatched matches and scores as
    // one transposition, not 1.5), so the mirror must floor too
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val cap = math.min(4, math.min(l1, l2))
      while (p < cap && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column API: `jaro_winkler(col("a"), col("b"))`. */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.toColumn(JaroWinkler(Bridge.toExpression(a), Bridge.toExpression(b)))
}
