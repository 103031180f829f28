package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom [[AsOfJoin]] operator: Catalyst's own
  * PushDownPredicates knows nothing about foreign plan nodes, so a
  * `WHERE` above an as-of join would otherwise evaluate AFTER the
  * co-partition + sort + merge — scanning and shuffling rows the query
  * throws away. This rule teaches the optimizer the operator's
  * semantics:
  *
  *  - a predicate that references only LEFT output pushes below the
  *    join unconditionally (each output row is one left row, matched or
  *    not — left-only predicates commute with the join);
  *  - RIGHT-side (or mixed) predicates must stay put: right columns are
  *    null-extended on no-match, and pushing a right predicate down
  *    would also change WHICH candidate row is "the latest" (dropping a
  *    right row promotes an older one — different join result, not just
  *    fewer rows).
  */
object AsOfFilterPushdown extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, asof: AsOfJoin) =>
      val (pushable, kept) = splitConjuncts(cond).partition { c =>
        c.deterministic && c.references.subsetOf(asof.left.outputSet)
      }
      if (pushable.isEmpty) f
      else {
        val pushed = asof.copy(left = Filter(pushable.reduce(And), asof.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
