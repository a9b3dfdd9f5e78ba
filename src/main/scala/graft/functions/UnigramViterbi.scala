package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-word Viterbi segmentation under a unigram-LM piece table — the
  * single-pass core of [[graft.operators.TextAnalysis]]'s hard-EM
  * E-step, value-identical to the prefix-length-round relational DP it
  * replaces (UnigramEquivalenceSpec pins the bit-for-bit law):
  *
  *   - scores are integer MICROS of the 6-dp piece log-probs, so every
  *     `(score + lp).cast(decimal(18,6))` of the round form is an exact
  *     long add here (6-dp inputs cannot round at scale 6);
  *   - the per-prefix argmax tie-breaks on (score, piece length, piece)
  *     exactly like the round form's `max_by(..., struct(score2, k,
  *     piece))`; the piece comparison is by CODE POINT, which equals
  *     Spark's binary UTF8String ordering;
  *   - `substring`/`length` indexing is by code point, matching the
  *     relational `substring(w, i, k)` the edge enumeration used.
  *
  * Why an expression and not the round loop: the DP state per word is
  * ≤ maxWordLen cells and the candidate set ≤ maxWordLen · maxPieceLen
  * edges — control-plane work per row — while the round form paid
  * `nIters · maxWordLen` join+aggregate+checkpoint STAGES on
  * vocab-cardinality frames (the r16 A/B showed per-round stage
  * overhead dominating those frames at any realistic distinct-word
  * count). One groupBy replaces them all; the frame stays
  * distinct-word-bounded at any corpus size. CodegenFallback by
  * design: the per-row work is the DP loop itself, there is no
  * tight-loop codegen to win (the [[CharEntropyStats]] argument).
  */
object UnigramViterbiCore {
  /** edges: (start 1-based by code point, piece length ≥ 1, lp micros).
    * Returns (bestScoreMicros, pieces) or null when the final prefix is
    * unreachable (no coverage — cannot happen when every single char is
    * in the vocab, but the round form drops such words and so do we).
    *
    * PRECONDITION (r17 advice): edges must be UNIQUE per (start, k) —
    * the tie-break below compares (score, k) only, on the argument that
    * for a fixed prefix end, distinct k ⇒ distinct piece and equal k ⇒
    * the same piece (same substring), so the piece never decides. A
    * caller joining a piece table with DUPLICATE piece rows (two lp
    * values for one piece) would break that argument and could pick a
    * different lp than the round form's max_by. The shipped pipeline
    * guarantees uniqueness (pieces is grouped by piece before the
    * join); any new caller must too. */
  def segment(word: Array[Int], edges: Array[(Int, Int, Long)]): (Long, Array[String]) = {
    val n = word.length
    if (n == 0) return null
    // best per prefix length 0..n; parallel arrays, -1 marks unreachable
    val reach = new Array[Boolean](n + 1)
    val score = new Array[Long](n + 1)
    val bpStart = new Array[Int](n + 1) // backpointer: start0 of last piece
    val bpLen = new Array[Int](n + 1)
    reach(0) = true
    var i = 1
    while (i <= n) {
      var bestScore = 0L
      var bestK = 0
      var found = false
      var e = 0
      while (e < edges.length) {
        val (st, k, lp) = edges(e)
        val p = st - 1 // 0-based start
        if (p + k == i && reach(p)) {
          val cand = score(p) + lp
          // tie-break: (score, k, piece) descending-max; for a fixed
          // prefix end, distinct k ⇒ distinct piece, and piece order
          // never decides (same k ⇒ same start ⇒ same piece), but keep
          // the k compare explicit — it mirrors max_by's struct order
          if (!found || cand > bestScore || (cand == bestScore && k > bestK)) {
            bestScore = cand; bestK = k; found = true
          }
        }
        e += 1
      }
      if (found) {
        reach(i) = true; score(i) = bestScore
        bpStart(i) = i - bestK; bpLen(i) = bestK
      }
      i += 1
    }
    if (!reach(n)) return null
    // walk back, then reverse
    var cnt = 0
    var pos = n
    while (pos > 0) { cnt += 1; pos = bpStart(pos) }
    val out = new Array[String](cnt)
    pos = n
    var j = cnt - 1
    while (pos > 0) {
      out(j) = new String(word, bpStart(pos), bpLen(pos))
      j -= 1
      pos = bpStart(pos)
    }
    (score(n), out)
  }
}

/** `UnigramViterbi(word, edges)` → struct(score_mu BIGINT, seg ARRAY<STRING>)
  * or NULL when the word has no full segmentation under the edge set.
  * `edges` is ARRAY<STRUCT<i INT, k INT, lp_mu BIGINT>> — the in-vocab
  * substrings of the word with their log-prob micros, any order. */
case class UnigramViterbi(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "unigram_viterbi"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(s: StructType, _))
      if s.length == 3 && s(0).dataType == IntegerType &&
        s(1).dataType == IntegerType && s(2).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi expects (string, array<struct<int,int,bigint>>), " +
        s"got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("score", DecimalType(18, 6), nullable = false),
    StructField("seg", ArrayType(StringType, containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(word: Any, edgesRaw: Any): Any = {
    val w = word.asInstanceOf[UTF8String].toString
    val cps = w.codePoints().toArray
    val arr = edgesRaw.asInstanceOf[ArrayData]
    val edges = new Array[(Int, Int, Long)](arr.numElements())
    var e = 0
    while (e < edges.length) {
      val row = arr.getStruct(e, 3)
      edges(e) = (row.getInt(0), row.getInt(1), row.getLong(2))
      e += 1
    }
    UnigramViterbiCore.segment(cps, edges) match {
      case null => null
      case (mu, seg) =>
        // micros → decimal(18,6): exact (the value has ≤ 6 dp by
        // construction — every summand was a 6-dp log-prob)
        val dec = org.apache.spark.sql.types.Decimal(
          java.math.BigDecimal.valueOf(mu, 6), 18, 6)
        new GenericInternalRow(Array[Any](dec,
          new GenericArrayData(seg.map(UTF8String.fromString(_)): Array[Any])))
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): UnigramViterbi =
    copy(left = newLeft, right = newRight)
}

object UnigramViterbi {
  def apply(word: Column, edges: Column): Column =
    Bridge.toColumn(UnigramViterbi(Bridge.toExpression(word), Bridge.toExpression(edges)))
}
