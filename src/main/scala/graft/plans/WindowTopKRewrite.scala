package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Auto-rewrite of the declarative grouped top-k idiom — `row_number()
  * .over(partitionBy(g).orderBy(o)).filter(rank <= k)` — into the
  * bounded-heap [[TopKPerGroup]] operator, so ANY query (including raw
  * SQL through the session) gets the O(k)-memory, group-key-only-sort
  * plan without knowing the operator exists. The library's query code
  * calls `TopK.perGroup` directly; this rule is the engine-level
  * counterpart that upgrades the spelling everyone actually writes.
  *
  * Versus Spark's own `InferWindowGroupLimit` (3.5+): that rule keeps
  * WindowExec and inserts a WindowGroupLimit pre-filter, so the
  * surviving ≤k-per-group rows are still fully sorted on
  * (partition, order) and buffered per group; this rewrite removes the
  * Window entirely — the sort drops to the group key alone and the
  * operator streams each group through a k-row heap. When Spark has
  * already inserted its WindowGroupLimit below the Window, the rewrite
  * strips it (the TopK operator subsumes the limit).
  *
  * Safety contract:
  *  - only a Window computing EXACTLY ONE expression, a plain
  *    `row_number()`, is touched (rank/dense_rank/lag/... keep their
  *    WindowExec semantics);
  *  - the filter must bound the rank above by an integer literal
  *    (`<=`, `<`, `=`, or their flipped forms); the ORIGINAL filter is
  *    kept on top of the TopK node, so equality predicates (`rank = 3`)
  *    and extra conjuncts keep their exact semantics — the rewrite only
  *    changes HOW the top-k rows are found, never which rows survive;
  *  - the rank attribute keeps its exprId, so downstream references
  *    stay bound;
  *  - partition spec must be non-empty (global top-k already lowers to
  *    TakeOrderedAndProject through the usual Limit path);
  *  - row_number over a non-total order is nondeterministic in BOTH
  *    spellings — the rewrite preserves the contract, not any
  *    incidental sort stability.
  *
  * Disable with `SET spark.graft.topk.rewrite=false`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topk.rewrite"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            part, order, child, _))
          if part.nonEmpty && order.nonEmpty =>
        val rank = alias.toAttribute
        rankBound(cond, rank) match {
          case Some(k) if k >= 1 =>
            // Spark's InferWindowGroupLimit may already have inserted
            // its pre-filter below the Window; TopK subsumes it — but
            // ONLY when that limit provably keeps every row TopK needs:
            // same partition/order specs (semantically), a row_number
            // rank function, and a limit of at least k. Any other
            // WindowGroupLimit (a future rule, a spec mismatch) is
            // preserved as the child rather than silently dropped.
            val base = child match {
              case wgl @ WindowGroupLimit(p2, o2, rankFn, limit, grandchild) =>
                val sameSpecs = p2.length == part.length &&
                  p2.zip(part).forall { case (a, b) => a.semanticEquals(b) } &&
                  o2.length == order.length &&
                  o2.zip(order).forall { case (a, b) => a.semanticEquals(b) }
                if (sameSpecs && rankFn.isInstanceOf[RowNumber] && limit >= k)
                  grandchild
                else wgl
              case other => other
            }
            Filter(cond, TopKPerGroup(part, order, k, rank, base))
          case _ => f
        }
    }
  }

  /** Tightest integer upper bound the condition places on the rank
    * attribute, scanning top-level conjuncts only.
    */
  private def rankBound(cond: Expression, rank: Attribute): Option[Int] = {
    val bounds = conjuncts(cond).flatMap {
      case LessThanOrEqual(r: Attribute, IntegerLiteral(v))
        if r.semanticEquals(rank) => Some(v)
      case LessThan(r: Attribute, IntegerLiteral(v))
        if r.semanticEquals(rank) => Some(v - 1)
      case EqualTo(r: Attribute, IntegerLiteral(v))
        if r.semanticEquals(rank) => Some(v)
      case GreaterThanOrEqual(IntegerLiteral(v), r: Attribute)
        if r.semanticEquals(rank) => Some(v)
      case GreaterThan(IntegerLiteral(v), r: Attribute)
        if r.semanticEquals(rank) => Some(v - 1)
      case EqualTo(IntegerLiteral(v), r: Attribute)
        if r.semanticEquals(rank) => Some(v)
      case _ => None
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }

  private def conjuncts(cond: Expression): Seq[Expression] = cond match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case e => Seq(e)
  }
}
