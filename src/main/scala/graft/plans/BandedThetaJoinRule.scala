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
  *   1. stamps the left side with `bucket = t div w` (one projection);
  *   2. explodes the right side to buckets {b-1, b, b+1} (bounded 3×);
  *   3. joins on bucket equality, keeping the ORIGINAL predicate as the
  *      exact residual filter (so results are identical — the bucket
  *      match is a necessary condition, and each qualifying pair matches
  *      on exactly ONE of the three replicas, so no duplicates);
  *   4. projects back to the original output.
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

  /** Extract |x - y| <= w (either comparison order). */
  private def bandOf(p: Expression): Option[(Expression, Expression, Long)] = p match {
    case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(w, t))
        if isIntegral(x) && isIntegral(y) && (t == LongType || t == IntegerType) =>
      Some((x, y, litLong(w)))
    case GreaterThanOrEqual(Literal(w, t), Abs(Subtract(x, y, _), _))
        if isIntegral(x) && isIntegral(y) && (t == LongType || t == IntegerType) =>
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
      val band = conjuncts.flatMap { p =>
        bandOf(p).flatMap { case (x, y, w) =>
          if (w <= 0) None
          else if (x.references.subsetOf(l.outputSet) &&
            y.references.subsetOf(r.outputSet)) Some((x, y, w))
          else if (y.references.subsetOf(l.outputSet) &&
            x.references.subsetOf(r.outputSet)) Some((y, x, w))
          else None
        }
      }.headOption
      val hasEqui = conjuncts.exists(p => crossSideEquality(p, l, r))
      band match {
        case Some((lt, rt, w)) if !hasEqui =>
          val wLit = Literal(w, LongType)
          def bucket(t: Expression) =
            IntegralDivide(Cast(t, LongType), wLit)
          val lAlias = Alias(bucket(lt), s"${bandPrefix}_l")()
          val lProj = Project(l.output :+ lAlias, l)
          val rBucket = bucket(rt)
          val expand = CreateArray(Seq(
            Subtract(rBucket, Literal(1L, LongType)), rBucket,
            Add(rBucket, Literal(1L, LongType))))
          val rAttr = AttributeReference(s"${bandPrefix}_r", LongType,
            nullable = expand.children.exists(_.nullable))()
          val rGen = Generate(Explode(expand), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(rAttr), child = r)
          val newCond = And(cond, EqualTo(lAlias.toAttribute, rAttr))
          Project(j.output, Join(lProj, rGen, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
