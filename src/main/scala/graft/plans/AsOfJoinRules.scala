package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for [[AsOfJoinPlan]] — the `Rule[LogicalPlan]` rung
  * of the extension ladder. Catalyst's own pushdown/pruning rules
  * pattern-match known node types, so a custom node is an optimization
  * BARRIER by default: filters stack up above it and every child column
  * survives to the exchange. This rule restores the two transformations
  * that matter for the as-of join's 100 TB shape:
  *
  *  1. '''Predicate pushdown (left side).''' The join is left-preserving
  *     and one-to-one per left row, so any deterministic conjunct that
  *     references only left-side columns commutes with the join; pushed
  *     below, it reaches the parquet scan (`PushedFilters`) instead of
  *     filtering after the shuffle. Right-side conjuncts must NOT push:
  *     dropping a right row can change which row is "latest earlier" or
  *     flip a match to null — the outer side of any outer join.
  *
  *  2. '''Column pruning.''' A `Project` above the join narrows each
  *     child to (referenced columns ∪ join keys ∪ time ∪ tiebreak), so
  *     the shuffles carry only what the query reads.
  *
  * Injected by `GraftExtensions` (operator-optimization fixed-point
  * batch, where follow-on rules finish the push into the scan);
  * `AsOf.joinBackward` also adds it to `experimental.extraOptimizations`
  * as an end-batch fallback for sessions built without extensions.
  */
object AsOfJoinRules extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {

    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val joined = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, joined)).getOrElse(joined)
      }

    case p @ Project(_, a: AsOfJoinPlan) =>
      val needed = AttributeSet(p.projectList.flatMap(_.references)) ++
        AttributeSet((a.leftKeys ++ a.rightKeys ++ a.rightTiebreak :+
          a.leftTime :+ a.rightTime).flatMap(_.references))
      val lKeep = a.left.output.filter(needed.contains)
      val rKeep = a.right.output.filter(needed.contains)
      if (lKeep.size == a.left.output.size && rKeep.size == a.right.output.size) p
      else p.copy(child = a.copy(
        left = Project(lKeep, a.left), right = Project(rKeep, a.right)))
  }
}
