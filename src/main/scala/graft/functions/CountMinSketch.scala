package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a `TypedImperativeAggregate` (SURVEY.md §2.7's
  * sketch-aggregate surface, the frequency companion to [[HllSketchAgg]]):
  * the aggregation state is a fixed `depth × width` table of counters per
  * group, merged map-side by element-wise ADDITION (CMS merge is linear),
  * so frequency profiling at 100 TB shuffles O(depth·width) longs per
  * group instead of the value stream. Estimates are read OFF the sketch
  * afterwards with plain Column math ([[Sketches.cmsEstimate]]):
  * `est(x) = min_r counts[r][h_r(x)]` — an upper bound on the true count
  * (each row of counters only ever over-counts via collisions), within
  * `ε·N` of it with probability 1−δ for w = e/ε, d = ln(1/δ).
  *
  * DETERMINISTIC AND ENGINE-PORTABLE like the HLL: row hashes are
  * `md5(r || ':' || value)` on the value's string form, bucket = first 15
  * hex digits (60 bits, non-negative) mod width, and counters are exact
  * integers — there is no float anywhere, so a DuckDB CTE reproduces the
  * whole table (and therefore every estimate) bit-for-bit.
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
  require(width >= 2 && width <= (1 << 20), "width must be in [2, 2^20]")

  override def prettyName: String = "cms_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  // row prefixes are loop-invariant — interpolating + encoding them per
  // input row × depth would be billions of short-lived allocations at the
  // scale this aggregate exists for
  @transient private lazy val rowPrefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(r => s"$r:".getBytes)

  /** First 15 hex digits of md5(prefix:value) as a non-negative long —
    * identical to the oracle's CAST('0x'||substring(md5(…),1,15) AS
    * BIGINT): the first 8 digest bytes are the first 16 hex digits, and
    * dropping the 16th digit is a 4-bit shift. */
  private def bucket(r: Int, bytes: Array[Byte]): Int = {
    digest.reset()
    digest.update(rowPrefixes(r))
    val h = digest.digest(bytes)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (h(i) & 0xffL); i += 1 }
    ((be >>> 4) % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var r = 0
      while (r < depth) { buf(r * width + bucket(r, bytes)) += 1L; r += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}
