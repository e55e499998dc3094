package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom as-of node: Catalyst's own
  * PushDownPredicates cannot see through an unknown operator, so a
  * `Filter` sitting above [[AsOfJoinNode]] would run after the join's
  * exchanges. Key-only deterministic predicates are safe to push into
  * BOTH children (the join is key-equal), pruning each side before its
  * shuffle — at 100 TB, filtering one symbol this way is the difference
  * between shuffling one key's ticks and shuffling the world.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinNode) =>
      val (pushable, keep) = splitConjunctivePredicates(cond).partition { p =>
        p.deterministic && p.references.subsetOf(AttributeSet(Seq(a.pKey)))
      }
      if (pushable.isEmpty) f
      else {
        val probePred = pushable.reduce(And)
        // same predicate on the tick side, re-anchored to the tick key
        val tickPred = probePred.transform {
          case attr: Attribute if attr.exprId == a.pKey.exprId => a.tKey
        }
        val pushed = a.copy(
          probes = Filter(probePred, a.probes),
          ticks = Filter(tickPred, a.ticks))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
