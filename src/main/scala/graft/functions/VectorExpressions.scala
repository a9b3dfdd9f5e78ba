package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native vector math for embedding columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a dot
  * product correctly but are CodegenFallback: the lambda is interpreted
  * per element, which measured ~10× slower than generated code on the
  * sf0.1 embedding benchmarks. [[DotProduct]] is a proper Catalyst
  * `Expression` with `doGenCode`: a tight generated Java loop, inside
  * whole-stage codegen, with the SAME left-to-right double-accumulation
  * order as the HOF formulation — so results are bit-identical to the
  * DuckDB oracle's `list_sum(list_transform(list_zip(...)))` fold.
  *
  * Null semantics (match `zip_with` + `aggregate` over `+`): NULL if
  * either array is NULL, lengths differ (zip_with pads with NULL), or any
  * element is NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.$getL($i) * (double) $b.$getR($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native vector expressions. */
object VectorFunctions {
  def dot_product(a: Column, b: Column): Column =
    Bridge.toColumn(DotProduct(Bridge.toExpression(a), Bridge.toExpression(b)))

  def vec_norm(a: Column): Column = sqrt(dot_product(a, a))

  def cosine_sim(a: Column, b: Column): Column =
    dot_product(a, b) / (vec_norm(a) * vec_norm(b))
}
