package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** ±1-signed projection core of
  * [[graft.operators.Similarity.randomProjection]] — the exact-decimal
  * dot products against the md5-parity sign matrix, value-identical to
  * the `transform(sequence, j -> aggregate(sequence, ...))` HOF chain it
  * replaces (RandomProjectionEquivalenceSpec pins the law):
  *
  *   - the input is the PRE-ROUNDED component array
  *     (`cast(round(x, 6) as decimal(12,6))` per element, staged in
  *     Catalyst exactly as before — this expression adds NO rounding of
  *     its own), so each term is a 6-dp decimal times ±1 and every sum
  *     is an exact long-micros add, bit-identical to the HOF's
  *     `(acc + term).cast(decimal(18,6))` chain;
  *   - a NULL input array or ANY null component yields ALL-null outputs
  *     (the HOF's null-propagation: every j's fold scans every d);
  *   - an input shorter than `dims` fails loudly (ANSI `element_at`
  *     would have thrown out-of-bounds).
  *
  * Documented divergence from the HOF chain (r17 advice): the long
  * accumulator range-checks only at the final Decimal(18,6)
  * construction, while the HOF re-cast the running sum to decimal(18,6)
  * after EVERY add — an intermediate partial sum past 10^12 micros with
  * a smaller final value threw under ANSI in the old path and passes
  * silently here. Long overflow itself is unreachable at this library's
  * bounds (components are decimal(12,6) ⇒ < 10^12 micros each;
  * dims ≤ 2^20 from the sign-matrix literal bound ⇒ |any partial sum|
  * < 2^20·10^12 < 2^63), and the final-value range is what the (18,6)
  * construction still guards where both paths would throw.
  *
  * Why: the HOF chain is interpreted — dims·outDims lambda steps with
  * boxed decimal adds PER ROW (measured: the dominant cost of q123 at
  * sf0.1). This is a compiled loop over the same integers;
  * CodegenFallback because the per-row work IS the loop (the
  * [[CharEntropyStats]] argument). */
case class SignedProjection(child: Expression, signs: Seq[Int],
                            dims: Int, outDims: Int)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "signed_projection"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(d: DecimalType, _) if d.precision == 12 && d.scale == 6 =>
      if (signs.length == dims * outDims) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"sign matrix has ${signs.length} entries, need dims*outDims = ${dims * outDims}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"signed_projection expects array<decimal(12,6)>, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(DecimalType(18, 6), containsNull = true)

  // never null itself: a NULL child yields the all-null COMPONENT array
  // (the HOF transform's shape — posexplode must still emit outDims rows)
  override def nullable: Boolean = false

  private lazy val signArr: Array[Int] = signs.toArray

  private def allNulls: GenericArrayData =
    new GenericArrayData(new Array[Any](outDims))

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return allNulls
    val a = raw.asInstanceOf[ArrayData]
    if (a.numElements() < dims) throw new IllegalArgumentException(
      s"signed_projection: input has ${a.numElements()} components, needs $dims")
    val mus = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      if (a.isNullAt(d)) return allNulls
      mus(d) = a.getDecimal(d, 12, 6).toUnscaledLong
      d += 1
    }
    val out = new Array[Any](outDims)
    var j = 0
    while (j < outDims) {
      var s = 0L
      d = 0
      while (d < dims) {
        val m = mus(d)
        s += (if (signArr(d * outDims + j) > 0) m else -m)
        d += 1
      }
      out(j) = org.apache.spark.sql.types.Decimal(
        java.math.BigDecimal.valueOf(s, 6), 18, 6)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignedProjection =
    copy(child = newChild)
}

object SignedProjection {
  def apply(vec: Column, signs: Seq[Int], dims: Int, outDims: Int): Column =
    Bridge.toColumn(SignedProjection(Bridge.toExpression(vec), signs, dims, outDims))
}
