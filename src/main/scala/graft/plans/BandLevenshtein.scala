package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, Length, LessThan, LessThanOrEqual, Levenshtein, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Custom Catalyst optimizer rule (injected via
  * `SparkSessionExtensions.injectOptimizerRule` — the third extension
  * surface after native Expressions and the AsOfJoin planner
  * Strategy): auto-band `levenshtein(a, b) <= k` predicates.
  *
  * Edit distance is bounded below by the length difference, so
  * `|length(a) - length(b)| <= k` is a FREE necessary condition — the
  * repo's hand-tuned dedup joins (dd8) add it manually; this rule
  * gives the same O(1) short-circuit to any naive user query, injected
  * as the FIRST conjunct so it evaluates before the O(len²) distance
  * (the catalyst-join-condition-order discipline, applied by the
  * optimizer instead of the query author).
  *
  * Idempotence across the optimizer's fixpoint batches rides a
  * TreeNodeTag on the Levenshtein node (tags survive makeCopy /
  * transform), so the band is added exactly once. Only deterministic
  * operands are banded (Length would double-evaluate its child).
  * A query that already carries its own equivalent band (dd8) pays
  * one redundant O(chars) length() scan per surviving pair — noise
  * next to the O(chars²) distance it guards; the rule cannot detect
  * semantically-equivalent hand-written bands.
  * Semantics are unchanged: when either side is null both the original
  * predicate and the band are null, and And(null, null) = null; for
  * non-null inputs the band is implied by the predicate it guards.
  */
object BandLevenshtein extends Rule[LogicalPlan] {
  private val banded = TreeNodeTag[Boolean]("graft.lev.banded")

  private def band(l: Expression, r: Expression,
      k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  // ONLY the 2-arg form: levenshtein(a, b, t) returns the -1 sentinel
  // when the distance exceeds t, so `lev(a,b,t) <= k` can be TRUE on
  // pairs the length band rejects — banding the threshold form would
  // change results (and it already early-exits internally anyway)
  private def bandify(cond: Expression): Expression = cond.transformUp {
    case cmp @ LessThanOrEqual(lev @ Levenshtein(l, r, None), k)
        if lev.getTagValue(banded).isEmpty && k.foldable &&
          l.deterministic && r.deterministic =>
      lev.setTagValue(banded, true)
      And(band(l, r, k), cmp)
    case cmp @ LessThan(lev @ Levenshtein(l, r, None), k)
        if lev.getTagValue(banded).isEmpty && k.foldable &&
          l.deterministic && r.deterministic =>
      lev.setTagValue(banded, true)
      And(band(l, r, k), cmp)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val next = bandify(cond)
      if (next fastEquals cond) f else f.copy(condition = next)
    case j @ Join(_, _, _, Some(cond), _) =>
      val next = bandify(cond)
      if (next fastEquals cond) j else j.copy(condition = Some(next))
  }
}
