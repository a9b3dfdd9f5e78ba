package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the step
  * that makes content-hash dedup robust across composed/decomposed
  * encodings of the SAME text: "é" arrives as U+00E9 from one crawler and
  * as "e"+U+0301 from another, and without canonical composition their
  * md5 fingerprints differ, silently splitting an exact-duplicate class.
  *
  * Engine parity: `java.text.Normalizer` (NFC) and DuckDB's
  * `nfc_normalize` both implement Unicode canonical composition, so
  * normalized bytes — and therefore md5 fingerprints — agree across the
  * engine and the oracle.
  *
  * Codegen: a single static-call expression inside whole-stage codegen
  * (no UDF, no fallback); the interpreted path short-circuits on
  * already-normalized input (the overwhelmingly common case) via
  * `Normalizer.isNormalized`, returning the input UTF8String unchanged.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfcOf(s.asInstanceOf[UTF8String])

  // the generated code calls the SAME static helper the interpreted path
  // uses, so the isNormalized short-circuit (the overwhelmingly common
  // case: input already NFC, returned unchanged with zero allocation)
  // applies under whole-stage codegen too — an inlined
  // Normalizer.normalize call paid the full recomposition + String +
  // UTF8String allocation on every row
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.nfcOf($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** The shared eval: short-circuits on already-normalized input. */
  def nfcOf(u: UTF8String): UTF8String = {
    val str = u.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API: `select(nfc(col("text")))`. */
  def nfc(text: Column): Column =
    Bridge.toColumn(NfcNormalize(Bridge.toExpression(text)))
}
