package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable domain (eTLD+1) under the publicsuffix.org algorithm as a
  * native codegen'd expression over [[graft.operators.Urls.TrimmedPsl]] —
  * byte-for-byte the same walk as
  * [[graft.operators.Urls.etld1FromLabels]]'s statically-unrolled CASE
  * chain (exceptions override, longest plain/wildcard match, implicit
  * `*` default; IP literals and hosts that ARE a public suffix pass
  * through whole; NULL → NULL), but emitted as ONE static call.
  *
  * Why it exists (measured, round 15): the unrolled CASE chain is
  * kilobytes of generated code PER REFERENCE, and the link-edge
  * pipeline evaluates TWO walks (both edge ends) inside one aggregate
  * stage — Catalyst fuses the projection into the aggregate, the
  * generated method blows janino's 64 KB limit, and the whole stage
  * silently loses whole-stage codegen (`WholeStageCodegenExec: ...
  * disabled`, reproduced on q261/q262/q264/q267 execution), leaving the
  * PSL walk INTERPRETED per link. The label-array staging added in r14
  * reduced the blowup but could not survive aggregate fusion. One
  * static call is ~40 bytes of generated code however many walks share
  * a stage, and the hash-set probes beat the chain's sequential
  * `isin` scans in either mode.
  *
  * The CASE-chain path remains for CUSTOM rule sets
  * ([[graft.operators.Urls.etld1OfPsl]] dispatches here only for the
  * library default); Etld1EquivalenceSpec pins native ≡ chain on every
  * fixture shape plus the degenerate hosts. */
case class Etld1(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"etld1 expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    Etld1.etld1Of(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Etld1.etld1Of($c)")

  override protected def withNewChildInternal(newChild: Expression): Etld1 =
    copy(child = newChild)
}

object Etld1 {

  // Rule tables compiled ONCE from the same TrimmedPsl the CASE chain
  // unrolls — same source of truth, so the two paths cannot drift.
  // Arrays indexed by label count; HashSet probes replace isin scans.
  private lazy val (plainSets, wildSets, excSets, maxRuleLen) = {
    val psl = graft.operators.Urls.TrimmedPsl
    val max = psl.maxRuleLen
    def tab(m: Map[Int, Seq[String]]): Array[java.util.HashSet[String]] = {
      val a = Array.fill(max + 1)(new java.util.HashSet[String]())
      m.foreach { case (k, rules) => if (k <= max) rules.foreach(a(k).add) }
      a
    }
    (tab(psl.plainByLen), tab(psl.wildcardParentsByLen),
      tab(psl.exceptionsByLen), max)
  }

  private def isIpLike(s: String): Boolean = {
    // the column path's `rlike("^[0-9.]+\z")`: one-or-more of [0-9.]
    if (s.isEmpty) return false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '.' && (c < '0' || c > '9')) return false
      i += 1
    }
    true
  }

  /** The shared eval — the exact etld1FromLabels decision procedure. */
  def etld1Of(u: UTF8String): UTF8String = {
    val h = u.toString
    if (isIpLike(h)) return u
    // Java split with -1: trailing empty labels kept, matching the
    // column path's split(h, "\\.")
    val labels = h.split("\\.", -1)
    val n = labels.length
    def lastK(k: Int): String = {
      val sb = new java.lang.StringBuilder
      var i = n - k
      while (i < n) {
        if (i > n - k) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
    // exceptions override (spec step 2), longest first
    var suffixLen = -1
    var e = maxRuleLen
    while (e >= 1 && suffixLen < 0) {
      if (n >= e && !excSets(e).isEmpty && excSets(e).contains(lastK(e)))
        suffixLen = e - 1
      e -= 1
    }
    if (suffixLen < 0) {
      // longest plain/wildcard match (spec step 3); implicit '*' = 1
      var k = maxRuleLen
      while (k >= 1 && suffixLen < 0) {
        val plainHit = n >= k && !plainSets(k).isEmpty &&
          plainSets(k).contains(lastK(k))
        val wildHit = k >= 2 && n >= k && !wildSets(k - 1).isEmpty &&
          wildSets(k - 1).contains(lastK(k - 1))
        if (plainHit || wildHit) suffixLen = k
        k -= 1
      }
      if (suffixLen < 0) suffixLen = 1
    }
    if (n <= suffixLen) u // the host IS a public suffix
    else UTF8String.fromString(lastK(suffixLen + 1))
  }

  /** Column API: `select(etld1(col("host")))`. */
  def etld1(host: Column): Column =
    Bridge.toColumn(Etld1(Bridge.toExpression(host)))
}
