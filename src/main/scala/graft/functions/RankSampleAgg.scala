package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable rank/quantile sketch as a `TypedImperativeAggregate` — the
  * heavy-tail-safe scale path beside `ApproxQuantile.histogramQuantiles`
  * (whose equi-width 256 counters bound error by range/256: one 1e9
  * outlier in a [0,1]-valued group stretches the grid until every real
  * value shares a bucket) and `exactQuantiles` (exact, but three passes).
  * One pass, fixed state, rank error O(1/√k) INDEPENDENT of the value
  * range — the property heavy-tailed distributions need.
  *
  * Design: BOTTOM-k-BY-HASH sampling, not KLL/t-digest. Classic KLL's
  * compaction keeps alternating elements of a sorted buffer at a
  * pseudo-random parity, and t-digest's centroids depend on insertion
  * order — both make the final state depend on partition/merge order,
  * which this repo's bit-exact replay contract forbids. Keeping the k
  * lexicographically-smallest `(md5-hash, value)` pairs instead is a
  * PURE FUNCTION OF THE INPUT MULTISET: truncation can only drop pairs
  * larger than the running k-th smallest, which can never re-enter the
  * final bottom-k, so any arrival order, partitioning, or merge tree
  * yields byte-identical state (the [[HllSketchAgg]]/q58 determinism
  * pattern, applied to rank sketching). The sample is a uniform random
  * row sample (md5 as the random source, seeded by a caller-supplied
  * unique row key), so the q-quantile of the sample estimates the
  * q-quantile of the data with the standard DKW/binomial rank bound —
  * e.g. k = 1024 puts the p50 estimate within ~±1.6 rank percentiles
  * at 95% confidence, at ANY scale and ANY tail shape.
  *
  * ENGINE-PORTABLE: the oracle replays the sample exactly with
  * `row_number() OVER (ORDER BY h, v) <= k` over the same md5-derived
  * 60-bit hash, then reads the same order statistics — see q192.
  *
  * State: ≤ 2k (hash, value) pairs (compacted to k on overflow and at
  * serialization), merged by concatenate-and-truncate. NULL hashes and
  * NULL values are skipped; a group with no rows evaluates to NULL.
  * Eval emits the sampled VALUES SORTED ASCENDING (array<double>) — the
  * order-statistics form quantile readouts consume directly.
  */
case class RankSampleAgg(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Double)]]
  with BinaryLike[Expression] {

  require(k >= 16 && k <= (1 << 20), "sample size k must be in [16, 2^20]")

  override def left: Expression = hash
  override def right: Expression = value

  override def prettyName: String = "rank_sample"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // no input ⇒ NULL, like percentile

  type Buf = scala.collection.mutable.ArrayBuffer[(Long, Double)]

  override def createAggregationBuffer(): Buf =
    new scala.collection.mutable.ArrayBuffer[(Long, Double)](k / 4)

  /** Keep the k lexicographically-smallest pairs. Safe at any point in
    * the fold: dropped pairs are ≥ the kept k-th smallest and can never
    * rejoin the global bottom-k. */
  private def compact(buf: Buf): Buf = {
    if (buf.length > k) {
      // TotalOrdering: -0.0 < 0.0 and NaN sorts last — a deterministic
      // total order, so ties in h break identically on every engine
      val sorted = buf.sortInPlace()(
        Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering))
      sorted.takeInPlace(k)
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      buf += ((h.asInstanceOf[Long], v.asInstanceOf[Double]))
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a ++= b
    compact(a)
  }

  override def eval(buf: Buf): Any = {
    if (buf.isEmpty) return null
    compact(buf)
    val values = buf.map(_._2).toArray
    java.util.Arrays.sort(values) // readout order: BY VALUE, ascending
    new GenericArrayData(values)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    compact(buf)
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, Double)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): RankSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RankSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RankSampleAgg =
    copy(hash = newLeft, value = newRight)
}

object RankSampleAgg {
  /** Bottom-k-by-hash value sample of `value`, keyed by `hash` (a 60-bit
    * non-negative long, typically [[RankSample.rowHash60]] of a unique
    * row key). Returns the sampled values sorted ascending. */
  def rankSample(hash: Column, value: Column, k: Int): Column =
    Bridge.toColumn(
      RankSampleAgg(Bridge.toExpression(hash.cast("long")),
        Bridge.toExpression(value.cast("double")), k)
        .toAggregateExpression())
}
