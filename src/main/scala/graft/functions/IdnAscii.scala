package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IDN (internationalized domain name) host folding to punycode ASCII as
  * a native codegen'd expression — the canonicalization step
  * [[graft.operators.Urls]] documents as the host-side twin of percent
  * normalization: `bücher.example` and `xn--bcher-kva.example` are the
  * SAME authority on the wire (RFC 3490/5890 — a resolver sees only the
  * ACE form), so a frontier that keys on the raw spelling crawls one
  * host twice and a blocklist gate keyed on the other spelling misses.
  *
  * Implementation is the JDK's `java.net.IDN.toASCII` (public knowledge,
  * the ToASCII algorithm with IDNA2003 defaults) applied per label,
  * lowercased first (ToASCII of mixed case is case-folded anyway; doing
  * it up front makes the already-ASCII fast path allocation-free).
  * A host that fails ToASCII (label > 63 chars post-encoding, empty
  * labels, rule violations) returns NULL — the [[graft.operators.Urls]]
  * error-visibility contract: a host we cannot canonicalize must not
  * silently pass through as a distinct frontier key.
  *
  * Codegen: single static call inside whole-stage codegen; pure-ASCII
  * hosts (the overwhelming majority) short-circuit to the input. */
case class IdnAscii(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"idn_ascii expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    IdnAscii.idnOf(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // nullSafeCodeGen (not defineCodeGen): the helper returns null for
    // unencodable hosts, and that null must propagate to isNull
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.IdnAscii.idnOf($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IdnAscii =
    copy(child = newChild)
}

object IdnAscii {

  /** The shared eval. ASCII input short-circuits (lowercased only when
    * an uppercase byte exists) — EXCEPT when a label exceeds 63 bytes,
    * the one wire-impossibility ToASCII enforces that a byte scan can
    * check for free (DNS labels are ≤ 63 octets; a longer "host" cannot
    * exist and must not mint a frontier key). Non-ASCII input takes the
    * full ToASCII path with its complete rule set; null on failure.
    *
    * The asymmetry is INTENTIONAL (the r15 review weighed it): the fast
    * path does NOT apply ToASCII's other validations (empty labels,
    * leading/trailing hyphens), so `"a..b"` passes through while
    * `"a..bü"` folds to NULL. ASCII hosts were never folded before this
    * expression existed, and the frontier's frozen-key contract pins
    * ASCII inputs to byte-identity (modulo lowercasing) — rejecting
    * previously-passing ASCII junk would be a silent key-version bump
    * for every consumer. Junk ASCII hosts mint stable (if useless)
    * frontier keys and are fetch-time failures, which is exactly what
    * they were pre-IDN; a host that needs PUNYCODE, by contrast, never
    * had a stable key, so the full rule set applies with nothing to
    * preserve. */
  def idnOf(u: UTF8String): UTF8String = {
    val n = u.numBytes()
    var i = 0
    var allAsciiLower = true
    var allAscii = true
    var labelLen = 0
    var labelOver = false
    while (i < n && allAscii) {
      val b = u.getByte(i)
      if (b < 0) { allAscii = false; allAsciiLower = false }
      else {
        if (b >= 'A' && b <= 'Z') allAsciiLower = false
        if (b == '.') labelLen = 0
        else { labelLen += 1; if (labelLen > 63) labelOver = true }
      }
      i += 1
    }
    if (allAscii && labelOver) return null
    if (allAsciiLower) return u
    if (allAscii) return u.toLowerCase
    try {
      // Locale.ROOT, never the default locale: under tr/az locales an
      // uppercase ASCII 'I' in a mixed host would fold to dotless 'ı'
      // and punycode-encode differently per MACHINE — a frontier key
      // must not depend on the JVM's locale (the r15 review finding)
      val folded = java.net.IDN.toASCII(
        u.toString.toLowerCase(java.util.Locale.ROOT))
      if (folded.isEmpty) null else UTF8String.fromString(folded)
    } catch { case _: Exception => null }
  }

  /** Column API: `select(idnAscii(col("host")))`. */
  def idnAscii(host: Column): Column =
    Bridge.toColumn(IdnAscii(Bridge.toExpression(host)))
}
