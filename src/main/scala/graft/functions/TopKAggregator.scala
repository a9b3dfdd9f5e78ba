package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k per group as a typed `Aggregator` — the custom-UDAF surface
  * (SURVEY.md §2.7), and the scale-correct shape for small-k ranking over
  * huge groups: the k-bounded buffer partial-aggregates MAP-SIDE, so each
  * group ships at most k rows per input partition through the shuffle,
  * where the `row_number()` window formulation sorts every group row.
  * (TakeOrderedAndProject does the same trick globally; this is the
  * per-group version.)
  *
  * Ordering is total and deterministic: score descending, id ascending on
  * ties — identical to the oracle's `ORDER BY score DESC, id ASC`.
  */
case class ScoredId(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def best(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sortBy(s => (-s.score, s.id)).take(k)

  override def zero: Seq[ScoredId] = Nil
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
    best(buf, in :: Nil)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = best(a, b)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
