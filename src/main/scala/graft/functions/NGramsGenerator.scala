package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram generator: one row in, the document's word n-grams out —
  * normalization (trim, lowercase, whitespace split) and shingle assembly
  * fused into a single `Generate` node.
  *
  * Why an expression instead of composition: the composed formulation
  * (`posexplode(split(...))` + a `lead(...)` window per shingle position)
  * needs a shuffle + sort on `doc_id` just to reassemble adjacent words,
  * and the earlier higher-order-function formulation re-evaluated the
  * split per element (O(words²), measured 24 s at sf0.1). This generator
  * emits shingles in one pass over each row — NO shuffle, no sort, no
  * per-element re-evaluation; at 100 TB the whole tokenize stage becomes
  * map-only. (Generators run interpreted under `GenerateExec`
  * (CodegenFallback), but the work per row is exactly the string walk —
  * there is no expression-tree re-evaluation to pay for.)
  *
  * Normalization matches `lower(trim(text))` + split on `\s+` exactly —
  * it uses Spark's own `UTF8String.trim/toLowerCase`, not JVM locale
  * lowercase, so output is byte-identical to the composed pipeline and to
  * the DuckDB oracle mirror (`regexp_replace(lower(trim(text)), ...)`).
  */
case class NGramsGenerator(child: Expression, n: Int, withPos: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngrams expects a string column, got ${t.catalogString}")
  }

  override def elementSchema: StructType =
    if (withPos)
      StructType(StructField("pos", IntegerType, nullable = false) ::
        StructField("shingle", StringType, nullable = false) :: Nil)
    else
      StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input).asInstanceOf[UTF8String]
    if (raw == null) return Nil
    // limit -1 keeps trailing empty tokens: SQL trim strips only 0x20, so
    // text ending in '\t'/'\n' becomes a trailing "" token in the composed
    // split(regexp_replace(...)) pipeline and in DuckDB's string_split —
    // Java's default split would drop it and diverge from the oracle.
    // (A whitespace-only input likewise yields [""] → one empty 1-gram.)
    val words = raw.trim().toLowerCase.toString.split("\\s+", -1)
    if (words.length < n) return Nil
    (0 to words.length - n).iterator.map { i =>
      val s = UTF8String.fromString(words.slice(i, i + n).mkString(" "))
      if (withPos) InternalRow(i, s) else InternalRow(s)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramsGenerator =
    copy(child = newChild)
}

object NGramsGenerator {
  /** Column API: `select(col("doc_id"), ngrams(col("text"), 5))`. */
  def ngrams(text: Column, n: Int): Column =
    Bridge.toColumn(NGramsGenerator(Bridge.toExpression(text), n))

  /** Positional variant: emits (pos, shingle) with pos = 0-based index of
    * the shingle's first token — the shape span-level dedup needs. Same
    * single-pass map-only Generate as [[ngrams]]. */
  def posNgrams(text: Column, n: Int): Column =
    Bridge.toColumn(NGramsGenerator(Bridge.toExpression(text), n, withPos = true))
}
