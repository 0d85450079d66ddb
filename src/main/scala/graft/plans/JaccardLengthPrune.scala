package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
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

  /** Idempotence is STRUCTURAL, not tag-based: guard conjuncts already
    * present in the condition (by semanticEquals) are not re-added.
    * Fixed-point optimizer batches interleave this rule with rules that
    * REBUILD Filter nodes (PushDownPredicates, CombineFilters) — a
    * TreeNodeTag does not survive the rebuild, so a tag-guarded rule
    * would re-inject its conjuncts every iteration, bloating the
    * predicate and risking batch non-convergence. The generated guards
    * are deterministic for a given (jaccard, τ), so semantic equality
    * recognizes them whatever node the condition ended up in.
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val present = conjuncts(cond)
      val extra = prefilters(cond)
        .filterNot(g => present.exists(_.semanticEquals(g)))
        .foldLeft(Seq.empty[Expression]) { (acc, g) =>
          if (acc.exists(_.semanticEquals(g))) acc else acc :+ g
        }
      if (extra.isEmpty) f
      else Filter(And(extra.reduce(And), cond), child)
  }

  private def conjuncts(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case e => Seq(e)
  }

  /** The two size-ratio guards for one jaccard-threshold predicate,
    * emitted as SEPARATE conjuncts so each is individually recognizable
    * after CombineFilters/PushDownPredicates reassociate the And tree.
    */
  private def bound(jac: SortedIntArrayJaccard, t: Double): Seq[Expression] = {
    val tt = Literal(t - 1e-9, DoubleType)
    val (a, b) = (jac.left, jac.right)
    def sz(e: Expression) = Cast(Size(e), DoubleType)
    Seq(
      GreaterThanOrEqual(sz(a), Multiply(tt, sz(b))),
      GreaterThanOrEqual(sz(b), Multiply(tt, sz(a))))
  }

  private def prefilters(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => prefilters(l) ++ prefilters(r)
    case GreaterThanOrEqual(j: SortedIntArrayJaccard, Literal(t: Double, DoubleType))
        if t > 0 => bound(j, t)
    case GreaterThan(j: SortedIntArrayJaccard, Literal(t: Double, DoubleType))
        if t > 0 => bound(j, t)
    case LessThanOrEqual(Literal(t: Double, DoubleType), j: SortedIntArrayJaccard)
        if t > 0 => bound(j, t)
    case LessThan(Literal(t: Double, DoubleType), j: SortedIntArrayJaccard)
        if t > 0 => bound(j, t)
    case _ => Nil
  }
}
