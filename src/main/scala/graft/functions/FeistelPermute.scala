package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Seeded Feistel permutation over a power-of-two id domain — the
  * EPOCH-SHUFFLE primitive a multi-epoch training pipeline needs:
  * `feistel(id, seed)` is a BIJECTION on [0, 2^(2·halfBits)), so ordering
  * (or range-partitioning) a corpus by the permuted id is a full,
  * deterministic, collision-free shuffle computed as one map-side
  * expression — no global sort by random() (non-reproducible), no
  * `rand()` tie-breaking, no shuffle-by-hash collisions, O(1) state.
  * Each epoch uses a different seed → a completely different but exactly
  * reproducible order; `pmod(pos, nShards)` then deals balanced shards
  * because the positions are a permutation, never hash-clumped.
  *
  * Why a native `Expression`: the 4-round network reuses each round's
  * output twice (swap + xor), so a Column formulation duplicates the
  * whole prefix tree per round (the HilbertIndex argument — SURVEY §7.3
  * preference (c)); one static call stays inside whole-stage codegen.
  *
  * The round function is plain integer arithmetic —
  * `F(r) = ((r·2654435761 + (seed + 40503·round)·65537) DIV 2^halfBits)
  * AND mask` — multiply, add, integer divide, mask: bit-replayable in
  * DuckDB with BIGINT-only math for halfBits ≤ 16 (the q240 oracle
  * chains the four rounds through CTEs; the spread is 65537 there). The
  * ·(2^halfBits+1) spread (= s<<halfBits + s) puts the seed's LOW bits
  * above the DIV cut at EVERY width — without it, seeds differing only
  * in their low halfBits shift the whole difference out of the kept
  * window and collide. Bijectivity holds for ANY round function
  * (Feistel's theorem), so the mixing constants are free choices; keep
  * seed in [0, 2^38) — that bounds every intermediate inside a signed
  * 64-bit long at halfBits ≤ 23, and NEGATIVE seeds would break the
  * engine-replay parity (>>> and BIGINT DIV diverge below zero) even
  * though the permutation itself stays bijective under wrap.
  *
  * Scale: at 100 TB the shuffle order is computed where the data lives
  * (a codegen'd projection), and the sort is by a LONG key — range
  * partition on it and each executor writes its shard; re-running any
  * epoch regenerates the identical order from (seed) alone.
  */
case class FeistelPermute(left: Expression, right: Expression,
                          halfBits: Int = 16)
  extends BinaryExpression {

  require(halfBits >= 4 && halfBits <= 23,
    "halfBits must be in [4, 23] (23 keeps every round inside a signed long)")

  override def prettyName: String = "feistel_permute"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"feistel_permute expects (id long, seed long), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    FeistelPermute.permute(a.asInstanceOf[Long], b.asInstanceOf[Long], halfBits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.FeistelPermute.permute($a, $b, $halfBits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FeistelPermute =
    copy(left = newLeft, right = newRight)
}

object FeistelPermute {

  /** 4-round Feistel on the low 2·halfBits bits of `x` (higher bits are
    * the caller's bug — same contract as hilbert16/morton16). Bijective
    * on [0, 2^(2·halfBits)) for every seed. */
  def permute(x: Long, seed: Long, halfBits: Int): Long = {
    val mask = (1L << halfBits) - 1
    // seed spread = 2^halfBits + 1, so (s·spread = (s << halfBits) + s)
    // puts the seed's LOW bits above the >>> halfBits cut AT EVERY WIDTH —
    // without it, adjacent seeds (17 vs 18) shift their whole difference
    // out of the kept window and produce IDENTICAL permutations; a
    // 16-pinned constant would leave the same collision alive for
    // halfBits 17..23 (FeistelSpec's seed-separation legs). At the
    // oracle-replayable width 16 the spread is exactly 65537, the q240
    // CTE's constant. Overflow headroom: keep seed in [0, 2^38) so
    // (seed + 40503·4)·2^24 stays inside a signed long — negative seeds
    // also break the DuckDB DIV replay (>>> vs DIV diverge below zero),
    // though bijectivity itself holds for ANY seed (wrap included).
    val spread = (1L << halfBits) + 1L
    var l = (x >>> halfBits) & mask
    var r = x & mask
    var round = 1
    while (round <= 4) {
      val f = ((r * 2654435761L + (seed + 40503L * round) * spread)
        >>> halfBits) & mask
      val t = r
      r = l ^ f
      l = t
      round += 1
    }
    (l << halfBits) | r
  }

  /** Column entry point: the epoch-shuffle key. `id` and `seed` are
    * longs; positions are a permutation of [0, 2^(2·halfBits)). */
  def feistel(id: Column, seed: Column, halfBits: Int = 16): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.toColumn(FeistelPermute(
      Bridge.toExpression(id.cast("long")),
      Bridge.toExpression(seed.cast("long")),
      halfBits))
  }
}
