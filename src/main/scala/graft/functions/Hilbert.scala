package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index as a native codegen'd expression — the layout key
  * beside [[ZOrder.morton16]] with STRICTLY better range locality: the
  * Hilbert curve never teleports (consecutive indices are always
  * adjacent cells, where Z-order jumps across the plane at every power-
  * of-two boundary), so a 2-D query rectangle decomposes into FEWER,
  * LONGER index runs → range-partitioned shards get tighter min/max
  * stats and a range scan touches fewer files (measured against Z-order
  * in LayoutSpec).
  *
  * Why a custom `Expression` and not Column composition like morton16:
  * the Hilbert recurrence carries rotation/reflection STATE across bit
  * planes — each of the 16 stages references the previous stage's (x, y)
  * several times, so a pure Column formulation explodes exponentially
  * (and `CollapseProject` re-inlines any attempt to stage it through
  * projections). The iterative loop belongs in generated code: one
  * static call inside whole-stage codegen, no UDF (preference order
  * SURVEY §7.3 — (b) compose fails structurally here, so (c) a native
  * Expression).
  *
  * Algorithm: the classic bit-plane walk (Warren, Hacker's Delight /
  * Wikipedia d2xy family) over 16-bit NON-NEGATIVE coordinates (caller
  * normalizes, e.g. `pmod(key, 65536)` — morton16's contract): for each
  * plane s from high to low, the quadrant `(3·rx) XOR ry` contributes
  * s²·quadrant to the index, then the lower planes are rotated/reflected
  * into canonical orientation. All arithmetic is two's-complement long
  * +/−/& — identical in the JVM and DuckDB, so the q195 oracle replays
  * the loop with a 16-step recursive CTE bit-for-bit.
  */
case class HilbertIndex(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "hilbert16"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert16 expects two longs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertIndex.xy2d($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** Hilbert index of 16-bit non-negative (x, y); inputs outside
    * [0, 65535] are the caller's bug (morton16's same contract) — the
    * walk only reads the low 16 bits' planes. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the lower planes into canonical orientation
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column entry point; the layout twin of [[ZOrder.morton16]]. */
  def hilbert16(x: Column, y: Column): Column =
    Bridge.toColumn(HilbertIndex(
      Bridge.toExpression(x.cast("long")),
      Bridge.toExpression(y.cast("long"))))
}
