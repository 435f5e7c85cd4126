package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Custom Catalyst optimizer rule (SURVEY §4.5's staged extension rung —
 * the one semantics the built-in optimizer cannot derive itself):
 * guard every `levenshtein(a, b) <= k` filter conjunct with the FREE
 * length-difference lower bound,
 *
 *   |length(a) - length(b)| > k  ⇒  levenshtein(a, b) > k,
 *
 * so the rewritten predicate `abs(length(a) - length(b)) <= k AND
 * levenshtein(a, b) <= k` is equivalent — but the O(|a|·|b|) dynamic
 * program now runs only for pairs the O(1) codegen'd length test admits.
 * On a blocked fuzzy-match (q64/q104 shape) at 10^10 rows, most
 * candidate pairs differ wildly in length and never reach the DP.
 *
 * Fixed-point safe: a conjunct is rewritten only when its guard is not
 * already present, so the second optimizer pass is a no-op.
 *
 * Two registration paths:
 *  - `spark.experimental.extraOptimizations` on a live session;
 *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
 *    (the SparkSessionExtensions contract).
 */
object LevenshteinBoundRule extends Rule[LogicalPlan] {

  private def boundGuard(l: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l.left), Length(l.right))), k)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Guard every `levenshtein(a,b) <= k` conjunct of `cond`; None = no
    * conjunct needed one (already guarded, or none present). */
  private def rewriteCond(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val guards: Map[Expression, Expression] = conjuncts.collect {
      case lte @ LessThanOrEqual(l: Levenshtein, k) if l.threshold.isEmpty
          && !conjuncts.exists(_.semanticEquals(boundGuard(l, k))) =>
        (lte: Expression) -> boundGuard(l, k)
    }.toMap
    if (guards.isEmpty) None
    else Some(conjuncts.map {
      case c if guards.contains(c) => And(guards(c), c)
      case c => c
    }.reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the rule runs AFTER the main optimizer batches (extraOptimizations /
    // injected-rule slot), i.e. after predicate pushdown — a levenshtein
    // filter over a join (the q64/q104 blocked-match shape) has been
    // folded into the Join CONDITION by then, so both nodes must match
    // (round-6: the Filter-only rule never fired on the production plans
    // it was built for).
    case f @ Filter(cond, child) =>
      rewriteCond(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      rewriteCond(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}

/** `spark.sql.extensions` entry point registering the graft rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => LevenshteinBoundRule)
}
