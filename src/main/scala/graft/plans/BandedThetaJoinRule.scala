package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a banded THETA join — `a JOIN b ON
  * abs(a.t - b.t) <= w` (with no usable equi-predicate) — into the
  * bucketed equi-join formulation of [[graft.operators.Joins.rangeJoin]].
  *
  * Spark plans an inequality-only join as BroadcastNestedLoopJoin (or a
  * cartesian product): O(|a|·|b|) comparisons, the classic accidental
  * scale-killer a user writes in plain SQL. A qualifying pair always
  * falls in the same or an adjacent `w`-sized time bucket, so the rule
  *
  *   1. stamps the LARGER side with `bucket = t div w` (one projection);
  *   2. explodes the SMALLER side to buckets {b-1, b, b+1} (bounded 3× of
  *      the cheaper input — sizes from plan stats, the BloomJoinRule
  *      pattern);
  *   3. joins on bucket equality, with the band test as the exact
  *      residual filter REWRITTEN in widened Long arithmetic — the bucket
  *      match is a necessary condition, and each qualifying pair matches
  *      on exactly ONE of the three replicas, so no duplicates;
  *   4. projects back to the original output.
  *
  * Arithmetic normalization (deliberate, documented): the residual
  * evaluates abs(CAST(x AS LONG) − CAST(y AS LONG)) ≤ w, so for INT
  * columns the rewrite is EXACT where the naive plan's 32-bit subtract
  * would wrap (non-ANSI: a pair at distance ~2^32 'matched' by wrap is
  * NOT matched here — that match is a corrupt-data artifact) or throw
  * (ANSI: the nested-loop plan errors on any distant pair it merely
  * EXAMINES; the rewrite never evaluates the residual on non-co-located
  * pairs and returns the correct result). LONG columns keep long
  * arithmetic (the same corner exists only at |x−y| ≥ 2^63). Kill switch:
  * spark.graft.bandedThetaRule.enabled=false.
  *
  * `div` truncates where a mathematical floor would round down on
  * negatives, but over any interval of length `w` the truncated bucket
  * still spans at most two adjacent values, so the ±1 expansion covers it.
  *
  * Scope (deliberately narrow, semantics-preserving): INNER joins whose
  * condition contains `abs(x - y) <= literal` over integral columns, one
  * side each, with NO cross-side equality conjunct — if one exists, Spark
  * already hash-joins on it and the band is a cheap residual; 3×-ing the
  * right side would only add work. Registered through
  * [[graft.functions.GraftExtensions]] (injectOptimizerRule) — the rule
  * runs inside a fixed-point batch, so it marks its output with
  * `_graft_band` attributes and skips plans already carrying them.
  */
object BandedThetaJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val bandPrefix = "_graft_band"

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def litLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  /** Extract |x - y| <= w (either comparison order). The null guard on
    * the literal matters: a CAST(NULL AS BIGINT) width reaching litLong
    * would MatchError inside the optimizer and kill the whole query. */
  private def bandOf(p: Expression): Option[(Expression, Expression, Long)] = p match {
    case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(w, t))
        if w != null && isIntegral(x) && isIntegral(y) &&
          (t == LongType || t == IntegerType) =>
      Some((x, y, litLong(w)))
    case GreaterThanOrEqual(Literal(w, t), Abs(Subtract(x, y, _), _))
        if w != null && isIntegral(x) && isIntegral(y) &&
          (t == LongType || t == IntegerType) =>
      Some((x, y, litLong(w)))
    case _ => None
  }

  private def crossSideEquality(p: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    p match {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if !l.output.exists(_.name.startsWith(bandPrefix)) &&
          !r.output.exists(_.name.startsWith(bandPrefix)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // keep the PRODUCING conjunct alongside the extracted band: only that
      // one conjunct is replaced by the widened residual — every other
      // predicate (a second band, a same-side band filter, anything else)
      // must survive verbatim or the join silently returns extra rows
      val band = conjuncts.flatMap { p =>
        bandOf(p).flatMap { case (x, y, w) =>
          if (w <= 0) None
          else if (x.references.subsetOf(l.outputSet) &&
            y.references.subsetOf(r.outputSet)) Some((p, x, y, w))
          else if (y.references.subsetOf(l.outputSet) &&
            x.references.subsetOf(r.outputSet)) Some((p, y, x, w))
          else None
        }
      }.headOption
      val hasEqui = conjuncts.exists(p => crossSideEquality(p, l, r))
      band match {
        case Some((chosen, lt, rt, w)) if !hasEqui =>
          val wLit = Literal(w, LongType)
          def bucket(t: Expression) =
            IntegralDivide(Cast(t, LongType), wLit)
          // residual in widened LONG arithmetic (see the header's
          // normalization note): exact for INT columns in both ANSI modes
          val residual = {
            val bandTest = LessThanOrEqual(
              Abs(Subtract(Cast(lt, LongType), Cast(rt, LongType))), wLit)
            val others = conjuncts.filterNot(_ eq chosen)
            (others :+ bandTest).reduce(And)
          }
          // explode the SMALLER side (3x the cheaper input); stamp the
          // larger. Stats are always present (size-only estimates at
          // minimum — the BloomJoinRule pattern).
          val explodeLeft = l.stats.sizeInBytes < r.stats.sizeInBytes
          val (stampPlan, stampT, genPlan, genT) =
            if (explodeLeft) (r, rt, l, lt) else (l, lt, r, rt)
          val stampAlias = Alias(bucket(stampT), s"${bandPrefix}_l")()
          val stampProj = Project(stampPlan.output :+ stampAlias, stampPlan)
          val gBucket = bucket(genT)
          val expand = CreateArray(Seq(
            Subtract(gBucket, Literal(1L, LongType)), gBucket,
            Add(gBucket, Literal(1L, LongType))))
          val gAttr = AttributeReference(s"${bandPrefix}_r", LongType,
            nullable = expand.children.exists(_.nullable))()
          val gen = Generate(Explode(expand), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(gAttr),
            child = genPlan)
          val newCond = And(residual, EqualTo(stampAlias.toAttribute, gAttr))
          val (newL, newR) = if (explodeLeft) (gen, stampProj) else (stampProj, gen)
          Project(j.output, Join(newL, newR, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
