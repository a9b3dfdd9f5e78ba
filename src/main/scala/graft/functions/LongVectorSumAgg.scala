package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise EXACT long vector sum — [[VectorSumAgg]]'s integer twin,
  * for micro-unit-quantized pipelines ([[graft.operators.Stats
  * .embeddingCovariance]]'s pair-product sums): integer addition is
  * associative, so unlike the double variant the result is bit-identical
  * under ANY partitioning — an order-free fold with one `long[dims]` of
  * state per group and map-side partial merge.
  *
  * Strictness: overflow fails LOUDLY (`Math.addExact` — a silent wrap
  * would corrupt a covariance without any signal; the documented caller
  * bound is n·max|element| < 2^63), and NULL ELEMENTS are rejected the
  * same way (a quantized vector is dense by construction — a NULL slot
  * means the caller's quantization is broken, not "skip me"). All-NULL
  * groups evaluate to NULL, `sum`'s SQL semantics.
  */
case class LongVectorSumAgg(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dims > 0, "dims must be positive")

  override def prettyName: String = "long_vector_sum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // all-NULL group ⇒ NULL, like sum

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"long_vector_sum needs array<bigint>, got $t")
    }

  // slot `dims` counts non-NULL inputs: 0 ⇒ the group evaluates to NULL
  override def createAggregationBuffer(): Array[Long] = new Array[Long](dims + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dims,
        s"long_vector_sum(dims=$dims) got a ${arr.numElements()}-element vector")
      var i = 0
      while (i < dims) {
        require(!arr.isNullAt(i),
          s"long_vector_sum: NULL element at index $i — quantize densely")
        buf(i) = Math.addExact(buf(i), arr.getLong(i))
        i += 1
      }
      buf(dims) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dims) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a(dims) += b(dims)
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(dims) == 0) null else new GenericArrayData(buf.take(dims))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate((dims + 1) * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(dims + 1)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): LongVectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LongVectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): LongVectorSumAgg =
    copy(child = newChild)
}

object LongVectorSumAgg {
  /** Element-wise exact sum of an `array<bigint>` column. */
  def longVectorSum(c: Column, dims: Int): Column =
    Bridge.toColumn(
      LongVectorSumAgg(Bridge.toExpression(c), dims).toAggregateExpression())
}
