package graft.functions

import java.math.BigInteger
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog approximate count-distinct as a `TypedImperativeAggregate`
  * (SURVEY.md §2.7's sketch-aggregate surface) — the cardinality sketch a
  * 100 TB profiling pass actually runs: the aggregation state is a fixed
  * `2^p`-byte register array per group, merged map-side, so distinct-heavy
  * profiling never shuffles values — only sketches.
  *
  * DETERMINISTIC AND ENGINE-PORTABLE by construction, like the q24 minhash
  * family: the value hash is md5 of the value's string form (not JVM
  * hashCode), the register index/rank come from the first 16 hex digits,
  * and the estimator's float arithmetic is arranged so a DuckDB CTE
  * reproduces it bit-for-bit:
  *
  *   - register sums are EXACT integers — `Σ 2^(64−M[j])` ≤ 2^(73) held in
  *     BigInteger here and HUGEINT in the oracle (a float Σ 2^−M[j] would
  *     depend on accumulation order);
  *   - the double formula `α·m·m·2^64 / S` is one left-associated
  *     expression over exact inputs, IEEE-identical in both engines;
  *   - the linear-counting branch (`m·ln(m/V)`) passes through libm `ln`,
  *     whose last ulp may differ across engines — callers round the final
  *     estimate (round(…, 2)) exactly as the cosine queries round scores.
  *
  * Standard HLL otherwise (Flajolet et al.; α = 0.7213/(1+1.079/m) — the
  * m ≥ 128 constant): idx = top p bits, ρ = leading-zero count of the
  * remaining 64−p bits + 1, small-range correction below 2.5·m.
  */
/** The register-update/merge/estimate core shared by [[HllSketchAgg]]
  * (emits the estimate) and [[HllRegistersAgg]] (emits the registers, for
  * sketch SET OPERATIONS — union two groups' registers elementwise-max
  * and re-estimate, the mergeable-sketch algebra a 100 TB overlap audit
  * runs instead of shuffling raw ids). One implementation so the two
  * aggregates can never drift. */
private[functions] object HllCore {
  def update(buf: Array[Byte], digest: java.security.MessageDigest,
             valueBytes: Array[Byte], precision: Int): Unit = {
    digest.reset()
    val hexBytes = digest.digest(valueBytes)
    // first 16 hex digits = first 8 md5 bytes, as two unsigned 32-bit ints
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 4) { h1 = (h1 << 8) | (hexBytes(i) & 0xffL); i += 1 }
    while (i < 8) { h2 = (h2 << 8) | (hexBytes(i) & 0xffL); i += 1 }
    val idx = (h1 >>> (32 - precision)).toInt
    val w = ((h1 & ((1L << (32 - precision)) - 1)) << 32) | h2
    val rho = (if (w == 0L) 64 - precision + 1
               else java.lang.Long.numberOfLeadingZeros(w) - precision + 1).toByte
    if (rho > buf(idx)) buf(idx) = rho
  }

  def merge(a: Array[Byte], b: Array[Byte], m: Int): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def estimate(buf: Array[Byte], m: Int): Double = {
    var zeros = 0
    var s = BigInteger.ZERO
    var i = 0
    while (i < m) {
      if (buf(i) == 0) zeros += 1
      s = s.add(BigInteger.ONE.shiftLeft(64 - buf(i)))
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m * 1.8446744073709551616e19 / s.doubleValue
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}

case class HllSketchAgg(
    child: Expression,
    precision: Int = 9,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 7 && precision <= 16, "precision must be in [7, 16]")
  private val m = 1 << precision

  override def prettyName: String = "hll_approx_nd"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllCore.update(buf, digest, v.asInstanceOf[UTF8String].getBytes, precision)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllCore.merge(a, b, m)

  override def eval(buf: Array[Byte]): Any = HllCore.estimate(buf, m)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** [[HllSketchAgg]]'s register array instead of its estimate — one
  * `int` per register (byte-valued, int-typed so plain Column math —
  * `zip_with`/`greatest`/`aggregate` — composes without binary
  * plumbing). Registers are the HLL's whole state, so groups become
  * SET-ALGEBRA values: union = elementwise max, |A∩B| ≈ est(A) +
  * est(B) − est(A∪B) by inclusion-exclusion — no raw ids ever
  * re-shuffled. Estimate with [[Sketches.hllEstimateFromRegs]]. */
case class HllRegistersAgg(
    child: Expression,
    precision: Int = 9,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 7 && precision <= 16, "precision must be in [7, 16]")
  private val m = 1 << precision

  override def prettyName: String = "hll_registers"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllCore.update(buf, digest, v.asInstanceOf[UTF8String].getBytes, precision)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllCore.merge(a, b, m)

  override def eval(buf: Array[Byte]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HllRegistersAgg =
    copy(child = newChild)
}

/** Column-level entry points for the sketch aggregates. */
object Sketches {
  /** Approximate count-distinct of `c` (any type — hashed via its string
    * form so the DuckDB oracle hashes identical bytes). Estimator error is
    * the standard ~1.04/√m (~4.6% at the default p=9). */
  def hllApproxCountDistinct(c: Column, precision: Int = 9): Column =
    Bridge.toColumn(
      HllSketchAgg(Bridge.toExpression(c.cast("string")), precision)
        .toAggregateExpression())

  /** [[hllApproxCountDistinct]]'s register state as array<int> — the
    * set-algebra form: union groups with [[hllUnionRegs]], estimate any
    * register array with [[hllEstimateFromRegs]]. */
  def hllRegisters(c: Column, precision: Int = 9): Column =
    Bridge.toColumn(
      HllRegistersAgg(Bridge.toExpression(c.cast("string")), precision)
        .toAggregateExpression())

  /** Sketch union: elementwise register max — the lossless HLL merge, so
    * `hllEstimateFromRegs(hllUnionRegs(a, b))` estimates |A ∪ B| exactly
    * as one sketch built over both inputs would. */
  def hllUnionRegs(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    zip_with(a, b, (x, y) => greatest(x, y))
  }

  /** The [[HllSketchAgg]] estimator over a register-array column, as pure
    * Column math — bit-identical to the aggregate's own eval: the
    * register sum Σ 2^(64−M[j]) is EXACT (2^k is an exact double for
    * k ≤ 64; summed as DECIMAL(38,0), order-free), the α·m²·2^64/S
    * readout is the same left-associated double expression, and the
    * linear-counting branch the same m·ln(m/V). Callers round(…, 2) like
    * every HLL readout (ln's last ulp is engine-specific). */
  def hllEstimateFromRegs(regs: Column, precision: Int = 9): Column = {
    import org.apache.spark.sql.functions._
    val m = 1 << precision
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val zeros = aggregate(regs, lit(0),
      (acc, r) => acc + when(r === 0, 1).otherwise(0))
    val s = aggregate(regs, lit(0).cast("decimal(38,0)"),
      (acc, r) => (acc + pow(lit(2.0), lit(64) - r).cast("decimal(38,0)"))
        .cast("decimal(38,0)"))
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
      lit(1.8446744073709551616e19) / s.cast("double")
    when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** Count-Min sketch of `c` (string form): a depth×width counter table
    * as a flat array<long>, row r at offset r·width. Query it with
    * [[cmsEstimate]]. */
  def cmsSketch(c: Column, depth: Int = 4, width: Int = 64): Column =
    Bridge.toColumn(
      CmsSketchAgg(Bridge.toExpression(c.cast("string")), depth, width)
        .toAggregateExpression())

  /** Bloom filter of `c` (string form): a `numBits`-bit set packed into
    * longs, built map-side and OR-merged. Query with [[bloomMightContain]].
    * Size it as m ≈ −n·ln(fpr)/ln(2)², k ≈ (m/n)·ln(2). */
  def bloomFilter(c: Column, numBits: Int = 1 << 16, numHashes: Int = 3): Column =
    Bridge.toColumn(
      BloomFilterAgg(Bridge.toExpression(c.cast("string")), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against a [[bloomFilter]] array: true iff every one
    * of the k md5-derived bits is set. Pure Column math — the filter is
    * typically a one-row broadcast next to the probe stream, so this is a
    * map-only pre-filter in front of an exact join. The k bit indexes are
    * 8-hex-digit windows of ONE md5 (matching [[BloomFilterAgg]]). No
    * false negatives; false positives bounded by the m/n/k sizing.
    *
    * Callers on a hot path should pre-project `md5(item)` as a named
    * column and use [[bloomMightContainHex]]: a probe that lands in a
    * join condition (e.g. after the cross join with the one-row filter)
    * is evaluated OUTSIDE whole-stage codegen, where nothing dedupes the
    * k·2 md5 references this convenience form expands to. */
  def bloomMightContain(bf: Column, item: Column,
                        numBits: Int = 1 << 16, numHashes: Int = 3): Column = {
    import org.apache.spark.sql.functions._
    bloomMightContainHex(bf, md5(item.cast("string")), numBits, numHashes)
  }

  /** [[bloomMightContain]] over an already-computed md5 hex column —
    * the one-digest-per-row form for hot paths. */
  def bloomMightContainHex(bf: Column, hexCol: Column,
                           numBits: Int = 1 << 16, numHashes: Int = 3): Column = {
    import org.apache.spark.sql.functions._
    (0 until numHashes).map { k =>
      val h = conv(substring(hexCol, 8 * k + 1, 8), 16, 10).cast("long") % numBits
      call_function("shiftright",
        element_at(bf, (h / 64).cast("int") + 1), (h % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Point-frequency estimate off a [[cmsSketch]] array: min over rows of
    * the item's bucket counter. Pure Column math (codegen'd) — the sketch
    * is typically a one-row broadcast next to a probe set. */
  def cmsEstimate(sketch: Column, item: Column, depth: Int = 4, width: Int = 64): Column = {
    import org.apache.spark.sql.functions._
    val rows = (0 until depth).map { r =>
      val bkt = pmod(conv(substring(md5(concat(lit(s"$r:"), item.cast("string"))), 1, 15),
        16, 10).cast("long"), lit(width.toLong))
      element_at(sketch, (lit(r * width) + bkt + 1).cast("int"))
    }
    least(rows: _*)
  }
}
