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

  private def compact(a: Seq[ScoredId]): Seq[ScoredId] =
    a.sortBy(s => (-s.score, s.id)).take(k)

  // Vector, not List: the per-row length check below must be O(1) — on a
  // List it walks the whole buffer (~1.5k hops) for EVERY input row,
  // turning the hot path O(n·k) despite the compaction amortization
  override def zero: Seq[ScoredId] = Vector.empty
  // append-then-compact-at-2k (the RankSampleAgg pattern): a full re-sort
  // per input row would cost O(n·k·log k) on exactly the huge-group hot
  // path this aggregate exists for; amortized this is O(n·log k)
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
    val appended = in +: buf
    if (appended.length >= 2 * k) compact(appended) else appended
  }
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    compact(a ++ b)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = compact(r)
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
