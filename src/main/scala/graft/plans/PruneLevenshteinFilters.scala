package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prepend a length-difference guard to thresholded
  * Levenshtein predicates.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each insert/delete changes the length by one), but the guard is O(1)
  * while the edit-distance DP is O(|a|·|b|). In a thresholded similarity
  * join — the blocking pattern of fuzzy dedup — most candidate pairs differ
  * wildly in length, so the rewritten conjunction
  * `abs(length(a)-length(b)) <= k AND levenshtein(a,b) <= k` short-circuits
  * the quadratic work for the common case. Conjuncts are evaluated
  * left-to-right under codegen, so the cheap test really does gate the
  * expensive one.
  *
  * Idempotent by construction: the guard is only added when no semantically
  * equal conjunct is already present, so the optimizer's fixed-point loop
  * terminates after one effective application.
  */
object PruneLevenshteinFilters extends Rule[LogicalPlan] with PredicateHelper {

  private def guardFor(cmp: Expression): Option[Expression] = cmp match {
    case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, _)) =>
      Some(LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k))
    case LessThan(Levenshtein(a, b, None), k @ Literal(_, _)) =>
      Some(LessThan(Abs(Subtract(Length(a), Length(b))), k))
    // fuzz_ratio(a,b) >= t: ratio = rint(200·LCS/(|a|+|b|)) and
    // LCS <= min(|a|,|b|), so rint(x) >= t implies x > t - 0.5, hence
    // 400·min(|a|,|b|) > (2t-1)·(|a|+|b|) — an O(1) length-proportion
    // guard in front of the O(|a|·|b|) LCS DP. Units agree exactly:
    // Catalyst `Length` on strings is UTF8String.numChars — CODE POINTS,
    // the same unit IndelRatioExpr folds over — so the implication is
    // sound for astral-plane text too. Skipped for t <= 0 (trivially
    // true guard).
    case GreaterThanOrEqual(r @ IndelRatioExpr(a, b), Literal(t: Int, _)) if t >= 1 =>
      Some(indelGuard(a, b, t))
    case GreaterThan(r @ IndelRatioExpr(a, b), Literal(t: Int, _)) if t >= 0 =>
      Some(indelGuard(a, b, t + 1)) // integer scores: > t  ⟺  >= t+1
    case _ => None
  }

  private def indelGuard(a: Expression, b: Expression, t: Int): Expression = {
    def len(e: Expression) = Cast(Length(e), org.apache.spark.sql.types.LongType)
    GreaterThan(
      Multiply(Literal(400L), Least(Seq(len(a), len(b)))),
      Multiply(Literal(2L * t - 1L), Add(len(a), len(b))))
  }

  private def rewrite(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val additions = conjuncts.flatMap(guardFor).filterNot(g =>
      conjuncts.exists(_.semanticEquals(g)))
    if (additions.isEmpty) None
    else Some((additions ++ conjuncts).reduceLeft(And))
  }

  /** Matches both placements: a Filter node, and the predicate after
    * push-down has turned it into a join condition (the thresholded
    * similarity-join shape).
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      rewrite(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      rewrite(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
