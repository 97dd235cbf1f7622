package graft.spark

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, Greatest, GreaterThan, GreaterThanOrEqual, Least, Length, Literal, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a Filter conjunct `graft_jaro_winkler(a, b) >= c`
  * gains a CHEAP length-ratio guard evaluated before the kernel.
  *
  * Soundness (never drops a qualifying pair): with p ≤ 4 prefix chars,
  * `jw = j + p·0.1·(1−j) ≤ 0.6·j + 0.4`, so `jw ≥ c ⟹ j ≥ j₀ =
  * (c−0.4)/0.6`. Matches are bounded by the shorter string
  * (`m ≤ lmin`), so `j ≤ (m/la + m/lb + 1)/3 ≤ (2 + lmin/lmax)/3`,
  * giving `lmin/lmax ≥ 3·j₀ − 2`. The guard is that inequality —
  * two `length()` calls and a multiply — and `And` short-circuits, so
  * the O(len·window) kernel never runs for pairs whose lengths alone
  * disqualify them (in a blocked ER self-join, most of them). The
  * bound is positive only for c > 0.8667; below that the filter is
  * left untouched.
  *
  * Shape notes: the guard references BOTH sides of a join, so this is
  * a predicate-ORDERING optimization (skip the expensive kernel), not
  * a pushdown; it runs in `extraOptimizations`/injected batches AFTER
  * alias inlining, so `df.withColumn("sim", jw).filter($"sim" >= c)`
  * has already collapsed to the matchable shape. Idempotent: a
  * conjunct semantically equal to the guard suppresses re-injection.
  */
object JaroWinklerPrefilterRule extends Rule[LogicalPlan] {

  private def lengthBound(c: Double): Option[Double] = {
    val r = 3 * ((c - 0.4) / 0.6) - 2
    if (r > 0 && r <= 1) Some(r) else None
  }

  private def guard(a: Expression, b: Expression, r: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(Length(a), Length(b))), DoubleType),
      Multiply(Literal(r),
        Cast(Greatest(Seq(Length(a), Length(b))), DoubleType)))

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other     => Seq(other)
  }

  /** (guarded condition, changed?) for one predicate tree. */
  private def rewrite(cond: Expression): (Expression, Boolean) = {
    val conjuncts = splitAnd(cond)
    val guards = conjuncts.flatMap {
      case GreaterThanOrEqual(JaroWinklerExpression(a, b),
          Literal(c: Double, DoubleType)) =>
        lengthBound(c).map(guard(a, b, _))
      case GreaterThan(JaroWinklerExpression(a, b),
          Literal(c: Double, DoubleType)) =>
        lengthBound(c).map(guard(a, b, _))
      case _ => None
    }
    val fresh = guards.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (fresh.isEmpty) (cond, false)
    else ((fresh ++ conjuncts).reduceLeft(And), true)
  }

  // predicate pushdown may have moved the jw conjunct into a Join
  // condition before this rule runs, so both homes are matched
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val (c2, changed) = rewrite(cond)
      if (changed) f.copy(condition = c2) else f
    case j @ Join(_, _, _, Some(cond), _) =>
      val (c2, changed) = rewrite(cond)
      if (changed) j.copy(condition = Some(c2)) else j
  }
}
