package graft.plans

import graft.expressions.TokenExpressions.JaccardSim
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: any predicate `jaccardSim(a, b) >= t` (t in (0, 1])
  * gains the cheap size-band prefilter
  * `size(a) >= t·size(b) AND size(b) >= t·size(a)` conjoined IN FRONT, so
  * the O(|a|+|b|) set intersection short-circuits away for pairs whose
  * cardinalities alone rule them out — the classic length filter of
  * similarity self-joins, applied automatically.
  *
  * Soundness: J(A,B) ≤ min(|A|,|B|) / max(|A|,|B|) holds only for SET
  * cardinalities, and `size()` sees raw array lengths — so the rewrite
  * fires only when both inputs are provably duplicate-free: either an
  * `array_distinct(...)` expression inline, or an attribute whose defining
  * Project alias is one (the shape Catalyst leaves after collapsing
  * projections into join/filter children).
  *
  * Installed builder-time via [[GraftExtensions]] or per-session via
  * `spark.experimental.extraOptimizations`. Idempotent: a predicate whose
  * conjunction already probes `size(a)` is left alone (this also respects
  * hand-written guards like q44's).
  */
object JaccardPrefilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = inject(cond, f)
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = inject(cond, j)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }

  private def inject(cond: Expression, scope: LogicalPlan): Expression =
    cond.transformUp {
      case cmp @ GreaterThanOrEqual(j: JaccardSim, Literal(t: Double, DoubleType))
          if eligible(j, t, cond, scope) => And(bandGuard(j, t), cmp)
      case cmp @ GreaterThan(j: JaccardSim, Literal(t: Double, DoubleType))
          if eligible(j, t, cond, scope) => And(bandGuard(j, t), cmp)
      case cmp @ LessThanOrEqual(Literal(t: Double, DoubleType), j: JaccardSim)
          if eligible(j, t, cond, scope) => And(bandGuard(j, t), cmp)
      case cmp @ LessThan(Literal(t: Double, DoubleType), j: JaccardSim)
          if eligible(j, t, cond, scope) => And(bandGuard(j, t), cmp)
    }

  private def eligible(j: JaccardSim, t: Double, cond: Expression,
      scope: LogicalPlan): Boolean =
    t > 0 && t <= 1 &&
      provablyDistinct(j.left, scope) && provablyDistinct(j.right, scope) &&
      !alreadyGuarded(cond, j)

  /** A Size probe on either jaccard input anywhere in the predicate means
    * a guard (ours or hand-written) is already present.
    */
  private def alreadyGuarded(cond: Expression, j: JaccardSim): Boolean =
    cond.exists {
      case s: Size =>
        s.child.semanticEquals(j.left) || s.child.semanticEquals(j.right)
      case _ => false
    }

  /** min(|A|,|B|) ≥ t · (max(|A|,|B|) − 1), written symmetrically.
    *
    * The −1 slack makes the guard sound under null elements:
    * JaccardOps.compute ignores nulls, but `size()` counts them, and
    * array_distinct (the eligibility proof) keeps at most ONE null — so
    * the true set cardinality is size or size−1. From J ≥ t follows
    * min(|A|,|B|) ≥ t·max(|A|,|B|) ≥ t·(max(sa,sb)−1) and
    * min(sa,sb) ≥ min(|A|,|B|), hence the relaxed compare never drops a
    * qualifying pair (e.g. [x,null] vs [x], J = 1.0, sizes 2 vs 1 — the
    * strict form rejected it). For null-free arrays it is weaker by at
    * most t, preserving essentially all of the pruning.
    */
  private def bandGuard(j: JaccardSim, t: Double): Expression = {
    val sa = Cast(Size(j.left), DoubleType)
    val sb = Cast(Size(j.right), DoubleType)
    val one = Literal(1.0)
    And(
      GreaterThanOrEqual(sa, Multiply(Literal(t), Subtract(sb, one))),
      GreaterThanOrEqual(sb, Multiply(Literal(t), Subtract(sa, one))))
  }

  /** Duplicate-freedom proof: inline array_distinct, or an attribute whose
    * defining alias in a Project below `scope` is array_distinct.
    */
  private def provablyDistinct(e: Expression, scope: LogicalPlan): Boolean = e match {
    case _: ArrayDistinct => true
    case a: AttributeReference =>
      scope.collectFirst {
        case p: Project if p.projectList.exists {
          case al @ Alias(_: ArrayDistinct, _) => al.exprId == a.exprId
          case _ => false
        } => true
      }.getOrElse(false)
    case _ => false
  }
}
