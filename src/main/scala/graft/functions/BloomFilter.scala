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

/** Bloom filter as a `TypedImperativeAggregate` (the membership companion
  * to [[HllSketchAgg]]/[[CmsSketchAgg]]): the aggregation state is a fixed
  * `numBits`-bit set per group packed into longs, merged map-side by
  * bitwise OR, and queried afterwards with pure Column math
  * ([[Sketches.bloomMightContain]]). The contract is the usual one-sided
  * error: NO false negatives (an inserted value always passes), false
  * positives at ~`(1 − e^(−k·n/m))^k`.
  *
  * Why it exists at 100 TB: a broadcast-join pre-filter. When the build
  * side of a membership check (a benchmark shingle set, a blocklist, a
  * seen-URL table) is too big to broadcast as a hash relation, its Bloom
  * filter — a few MB regardless of cardinality — still broadcasts, and the
  * probe side is filtered BEFORE the shuffle of the exact verification
  * join ([[graft.operators.Dedup.decontaminateBloom]]).
  *
  * DETERMINISTIC AND ENGINE-PORTABLE like the other sketches — and
  * single-digest: hash k of a value is hex digits `[8k+1, 8k+8]` (32
  * bits) of ONE `md5(value)` mod numBits, so an insert or probe costs one
  * md5 however many hash functions are configured (the md5 windows are
  * independent enough for Bloom indexing, the classic
  * Kirsch-Mitzenmacher observation). [[Sketches.bloomMightContain]]
  * recomputes exactly these slices in Column math — codegen's
  * subexpression elimination evaluates the shared md5 once per row.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int = 1 << 16,
    numHashes: Int = 3,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 26),
    "numBits must be a positive multiple of 64, at most 2^26")
  require(numHashes >= 1 && numHashes <= 4,
    "numHashes must be in [1, 4] (one 4-byte md5 window each)")

  override def prettyName: String = "bloom_filter"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      digest.reset()
      val h = digest.digest(v.asInstanceOf[UTF8String].getBytes)
      var k = 0
      while (k < numHashes) {
        // digest bytes [4k, 4k+3] = hex digits [8k+1, 8k+8], unsigned
        var be = 0L
        var i = 4 * k
        while (i < 4 * k + 4) { be = (be << 8) | (h(i) & 0xffL); i += 1 }
        val b = (be % numBits).toInt
        buf(b >>> 6) |= 1L << (b & 63)
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}
