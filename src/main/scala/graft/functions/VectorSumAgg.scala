package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise vector sum as a `TypedImperativeAggregate` (§2.7): the
  * embedding-pooling primitive behind per-group centroids, mean-pooled
  * document vectors, and Lloyd-style cluster updates — in ONE aggregation
  * pass with map-side partial merge.
  *
  * The alternative formulations don't survive scale: `posexplode` +
  * `groupBy(key, dim)` multiplies the shuffle by the dimensionality (64×
  * here) and pays a second shuffle to reassemble the vector;
  * `collect_list` ships every member vector to one reducer. This
  * aggregate's state is a single `double[dims]` per group — the shuffle
  * carries one vector per (group × partition), independent of member
  * count.
  *
  * Engine parity: inputs are cast to double BEFORE summing (each float
  * widens exactly), sums run in double in any engine, and callers round
  * the final per-dimension statistic (`round(x/n, 6)`) exactly as the
  * cosine queries round scores — double addition is not associative, so
  * the unrounded last ulp may legitimately differ with partition count.
  * KNOWN BOUND, not a guarantee: a mean landing within an ulp of a
  * `…x.xxxxxx5` boundary can still round differently across engines or
  * partitionings (probability ~ulp/1e-6 per component — never observed
  * at the fixture scales, but real on adversarial data). A deployment
  * needing bit-exactness under ANY partitioning should quantize first
  * (`floor(x·1e6)` integer sums — the q163 embedding-covariance pattern;
  * floor and multiply are exact IEEE ops in every engine) and accept the
  * quantized-centroid semantics.
  *
  * NULL rows and NULL elements are skipped, and a group with NO non-NULL
  * input evaluates to NULL — `sum`'s SQL semantics, and what keeps an
  * all-NULL group from materializing a spurious zero vector an oracle's
  * unnest-based mirror would never produce.
  */
case class VectorSumAgg(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  require(dims > 0, "dims must be positive")

  override def prettyName: String = "vector_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // all-NULL group ⇒ NULL, like sum

  // resolved lazily: child.dataType is meaningless before analysis binds
  // the column reference
  @transient private lazy val elementIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vector_sum needs array<float|double>, got $t")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_sum needs array<float|double>, got $t")
    }

  // slot `dims` counts non-NULL inputs: 0 ⇒ the group evaluates to NULL
  override def createAggregationBuffer(): Array[Double] = new Array[Double](dims + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dims,
        s"vector_sum(dims=$dims) got a ${arr.numElements()}-element vector")
      var i = 0
      while (i < dims) {
        if (!arr.isNullAt(i))
          buf(i) += (if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buf(dims) += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dims) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(dims) == 0) null else new GenericArrayData(buf.take(dims))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate((dims + 1) * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(dims + 1)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorSumAgg {
  /** Element-wise sum of an `array<float|double>` column. */
  def vectorSum(c: Column, dims: Int): Column =
    Bridge.toColumn(
      VectorSumAgg(Bridge.toExpression(c), dims).toAggregateExpression())
}
