package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row Shannon character-entropy core, shared by the expression and
  * tests. Bit-for-bit identical to the relational formulation the q152
  * ORACLE runs (per-char counts → Σ c·round(ln c, 6) as exact decimal →
  * one double readout, rounded once), so swapping the operator from the
  * two-shuffle relational plan to this map-only expression changes the
  * PLAN and nothing else:
  *
  *   - counts are per CODE POINT (Spark `substring`/DuckDB `substr`
  *     both index code points, so a surrogate pair is one symbol);
  *   - every rounding is `BigDecimal.valueOf(d).setScale(6, HALF_UP)` —
  *     the value-identical JVM form of Spark's `round(double, 6)`;
  *   - the plogp sum is exact java BigDecimal at scale 6 (integer count
  *     × 6-dp factor), mirroring the oracle's DECIMAL sum, order-free.
  */
object CharEntropyCore {
  private def r6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (n_chars, n_distinct, entropy | null) as an InternalRow. */
  def compute(s: UTF8String): InternalRow = {
    if (s == null) return new GenericInternalRow(Array[Any](0L, 0L, null))
    val str = s.toString
    if (str.isEmpty) return new GenericInternalRow(Array[Any](0L, 0L, null))
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var plogp = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      plogp = plogp.add(java.math.BigDecimal.valueOf(r6(math.log(c.toDouble)))
        .multiply(java.math.BigDecimal.valueOf(c)))
    }
    val entropy = r6(r6(math.log(n.toDouble)) - plogp.doubleValue() / n)
    new GenericInternalRow(Array[Any](n, counts.size().toLong, entropy))
  }
}

/** `char_entropy_stats(text)` → struct(n_chars, n_distinct, entropy).
  *
  * CodegenFallback by design: the per-row work IS a code-point hash map
  * (unlike the scalar [[DotProduct]] loop there is no tight-loop codegen
  * to win), so the fallback's boxed call is amortized by the map walk —
  * and the expression keeps the operator MAP-ONLY, replacing the
  * relational form's explode + two aggregate shuffles. */
case class CharEntropyStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "char_entropy_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = true)))

  // NULL text folds to the (0, 0, null) row — same membership as the
  // relational left join — so the expression itself never returns null
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    CharEntropyCore.compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {
  def stats(text: Column): Column =
    Bridge.toColumn(CharEntropyStats(Bridge.toExpression(text)))
}
