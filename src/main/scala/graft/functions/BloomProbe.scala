package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-membership probe against a DRIVER-MATERIALIZED filter —
  * the hot-path twin of [[Sketches.bloomMightContainHex]].
  *
  * The Column-math probe re-derives each bit index from md5 HEX with
  * `conv(substring(...))`: measured ~2.5 µs/row × numHashes at sf0.1 —
  * string slicing and radix parsing per index, and the filter array
  * printed inline into every plan string. This expression instead holds
  * the bit array as a plan-opaque reference and calls one static JVM
  * helper per row: one `MessageDigest` md5 over the raw bytes + k bit
  * tests, exactly [[BloomFilterAgg.update]]'s index math (digest bytes
  * [4k, 4k+3] big-endian unsigned, mod numBits) — so anything the
  * aggregate inserted always passes (no false negatives), byte-for-byte.
  *
  * Codegen'd via a static call (the array rides `addReferenceObj`, never
  * generated source), with an interpreted `nullSafeEval` fallback of the
  * same helper.
  */
case class BloomProbe(child: Expression, bits: IndexedSeq[Long],
                      numBits: Int, numHashes: Int)
  extends UnaryExpression {

  // IndexedSeq, NOT Array: a case class holding an array gets
  // reference-based equals/hashCode, so two structurally identical probes
  // (same small side, two join calls) never compare equal and Catalyst's
  // sameResult/canonicalization misses exchange & subexpression reuse
  @transient private lazy val bitsArr: Array[Long] = bits.toArray

  require(numBits >= 64 && numBits % 64 == 0 && bits.length == numBits / 64,
    "bits length must be numBits/64")
  require(numHashes >= 1 && numHashes <= 4,
    "numHashes must be in [1, 4] (one 4-byte md5 window each)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_probe needs a STRING child, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override protected def nullSafeEval(v: Any): Any =
    BloomProbe.contains(bitsArr, numBits, numHashes, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bitsArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomProbe.contains($bitsRef, $numBits, $numHashes, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** True iff every one of the k md5-window bits of `v` is set — the
    * probe-side mirror of [[BloomFilterAgg.update]]. */
  def contains(bits: Array[Long], numBits: Int, numHashes: Int,
               v: UTF8String): Boolean = {
    val d = md.get()
    d.reset()
    val h = d.digest(v.getBytes)
    var k = 0
    while (k < numHashes) {
      var be = 0L
      var i = 4 * k
      while (i < 4 * k + 4) { be = (be << 8) | (h(i) & 0xffL); i += 1 }
      val b = (be % numBits).toInt
      if ((bits(b >>> 6) & (1L << (b & 63))) == 0L) return false
      k += 1
    }
    true
  }
}
