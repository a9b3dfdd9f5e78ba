package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.typedlit
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-word BPE merge application — the single-pass core of
  * [[graft.operators.TextAnalysis]]'s `bpeTrain`, value-identical to the
  * per-round windowed rewrite it replaces (BpeEquivalenceSpec pins the
  * bit-for-bit law):
  *
  *   - the initial symbol sequence is the word's CODE POINTS plus the
  *     `</w>` marker, exactly the relational `substring(w, pos, 1)`
  *     enumeration (Spark's substring indexes by code point);
  *   - each merge round is ONE leftmost-nonoverlapping greedy pass over
  *     the pre-round symbols. Chaining within a round is only possible
  *     when left == right (a pair at p and p+1 shares symbol p+1,
  *     forcing left == right), where the greedy scan merges at even
  *     offsets within each equal-symbol run — precisely the windowed
  *     gaps-and-islands "_runpos % 2 == 0" rule;
  *   - merged symbols never start another merge in the same round (the
  *     window marked starts on the PRE-rewrite stream; the greedy scan
  *     skips past a merge with p += 2 the same way).
  *
  * Why an expression and not the window loop: the merge table is ≤ 64
  * tiny rows, so re-deriving a word's post-merge symbols is bounded
  * per-row work at ANY corpus size — while the round form paid, per
  * round, a word-partitioned lead window, three more window passes for
  * the rewrite, and a localCheckpoint of the full symbol table (pure
  * stage overhead on the distinct-word frame, the unigram-trainer r17
  * lesson). CodegenFallback by design: the per-row work IS the merge
  * loop, there is no tight-loop codegen to win.
  */
object BpeMergeCore {
  /** Apply `merges` (lefts(i), rights(i)), in order, to `word`'s initial
    * symbol sequence. Returns the post-merge symbols. */
  def syms(word: String, lefts: Array[String], rights: Array[String]): Array[String] = {
    val cps = word.codePoints().toArray
    var cur = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) { cur(i) = new String(cps, i, 1); i += 1 }
    cur(cps.length) = "</w>"
    var m = 0
    while (m < lefts.length) {
      val l = lefts(m)
      val r = rights(m)
      val out = new Array[String](cur.length)
      var n = 0
      var p = 0
      while (p < cur.length) {
        if (p + 1 < cur.length && cur(p) == l && cur(p + 1) == r) {
          out(n) = l + r; n += 1; p += 2
        } else { out(n) = cur(p); n += 1; p += 1 }
      }
      if (n != cur.length) cur = java.util.Arrays.copyOf(out, n)
      else System.arraycopy(out, 0, cur, 0, n)
      m += 1
    }
    cur
  }
}

/** `BpeSymbols(word, lefts, rights)` → ARRAY<STRING>: the word's symbol
  * sequence after applying the merge list in order (see [[BpeMergeCore]]).
  * `lefts`/`rights` are parallel ARRAY<STRING> merge halves — in the
  * trainer they are literals (the merges decided so far). */
case class BpeSymbols(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_symbols"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"bpe_symbols expects (string, array<string>, array<string>), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def nullSafeEval(word: Any, leftsRaw: Any, rightsRaw: Any): Any = {
    val w = word.asInstanceOf[UTF8String].toString
    val la = leftsRaw.asInstanceOf[ArrayData]
    val ra = rightsRaw.asInstanceOf[ArrayData]
    val lefts = new Array[String](la.numElements())
    val rights = new Array[String](ra.numElements())
    var i = 0
    while (i < lefts.length) {
      lefts(i) = la.getUTF8String(i).toString
      rights(i) = ra.getUTF8String(i).toString
      i += 1
    }
    val out = BpeMergeCore.syms(w, lefts, rights)
    new GenericArrayData(out.map(UTF8String.fromString(_)): Array[Any])
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeSymbols =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeSymbols {
  def apply(word: Column, lefts: Seq[String], rights: Seq[String]): Column =
    Bridge.toColumn(BpeSymbols(Bridge.toExpression(word),
      Bridge.toExpression(typedlit(lefts)), Bridge.toExpression(typedlit(rights))))
}
