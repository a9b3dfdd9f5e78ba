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

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val str = u.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column API: `select(nfc(col("text")))`. */
  def nfc(text: Column): Column =
    Bridge.toColumn(NfcNormalize(Bridge.toExpression(text)))
}
