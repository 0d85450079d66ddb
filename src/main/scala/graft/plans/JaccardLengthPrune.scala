package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.DoubleType
import graft.functions.SortedIntArrayJaccard

/** Optimizer rule: in front of any `sorted_int_array_jaccard(a, b) ≥ τ`
  * predicate, inject the lossless length prefilter
  * `|a| ≥ τ'·|b| AND |b| ≥ τ'·|a|`.
  *
  * Soundness: jaccard(A,B) = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|),
  * so jac ≥ τ implies the size-ratio bound — rows the prefilter drops
  * can never pass the original predicate. τ' = τ − 1e-9 absorbs the
  * floating multiply's rounding so a boundary-exact pair is never
  * over-pruned. The injected conjunct is placed FIRST, so codegen's
  * short-circuit And skips the O(|a|+|b|) merge-count for every pair
  * the two O(1) size reads already rule out — in a similarity
  * self-join almost all candidate pairs.
  *
  * This is the engine-extension shape for such rewrites: users write
  * the declarative predicate; the session (via GraftExtensions →
  * injectOptimizerRule) makes it cheap. Runs after predicate pushdown,
  * so the predicate has already settled at its join; the added sizes
  * reference the same attributes and stay with it.
  */
object JaccardLengthPrune extends Rule[LogicalPlan] {

  private val done = TreeNodeTag[Boolean]("graft.jaccardLengthPrune")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if f.getTagValue(done).isEmpty =>
      val extra = prefilters(cond)
      val out =
        if (extra.isEmpty) f
        else Filter(And(extra.reduce(And), cond), child)
      out.setTagValue(done, true)
      out
  }

  private def bound(jac: SortedIntArrayJaccard, t: Double): Expression = {
    val tt = Literal(t - 1e-9, DoubleType)
    val (a, b) = (jac.left, jac.right)
    def sz(e: Expression) = Cast(Size(e), DoubleType)
    And(
      GreaterThanOrEqual(sz(a), Multiply(tt, sz(b))),
      GreaterThanOrEqual(sz(b), Multiply(tt, sz(a))))
  }

  private def prefilters(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => prefilters(l) ++ prefilters(r)
    case GreaterThanOrEqual(j: SortedIntArrayJaccard, Literal(t: Double, DoubleType))
        if t > 0 => Seq(bound(j, t))
    case GreaterThan(j: SortedIntArrayJaccard, Literal(t: Double, DoubleType))
        if t > 0 => Seq(bound(j, t))
    case LessThanOrEqual(Literal(t: Double, DoubleType), j: SortedIntArrayJaccard)
        if t > 0 => Seq(bound(j, t))
    case LessThan(Literal(t: Double, DoubleType), j: SortedIntArrayJaccard)
        if t > 0 => Seq(bound(j, t))
    case _ => Nil
  }
}
