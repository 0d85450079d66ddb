package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, In, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Filter, Join, Limit, LogicalPlan, Project, WriteDelta}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Runtime key-set file narrowing for DELTA row-level operations (r12
  * verdict item 4).
  *
  * The problem: Spark's RowLevelOperationRuntimeGroupFiltering fires
  * only for GROUP-based (copy-on-write) rewrites — a merge-on-read
  * MERGE plans a [[WriteDelta]], whose positional target scan gets
  * static partition pruning plus stats/bloom whole-file skipping but
  * never learns what keys the MERGE SOURCE actually carries. A MERGE
  * whose source touches one partition of a 100 TB table therefore
  * positional-scans every partition (the ON condition references source
  * attributes, so nothing static is pushable). Iceberg closes this hole
  * with its own injected runtime-filtering rule; this is that rule for
  * the graft engine, in the [[GraftCowLeafScope]] eager-evaluation
  * style.
  *
  * Mechanics: for a delta MERGE, the rewrite's query is MergeRows over
  * a join of the target read relation and the source plan. This rule
  * splits the WriteDelta condition into conjuncts, keeps the
  * equi-conjuncts `targetCol = <source expression>`, evaluates
  *
  *   SELECT DISTINCT <source key expressions> FROM <source side> LIMIT cap+1
  *
  * eagerly at optimization time (delta-bounded: the source is the small
  * side by merge-on-read's premise; over the cap the rule declines),
  * and injects a static per-column `IN` filter directly above the
  * target relation. The ordinary pushdown then takes it the rest of the
  * way: partition-column keys prune the FILE LISTING, data-column keys
  * reach [[GraftDeltaMor.MetaScan]]'s stats/bloom whole-file skipping —
  * the positional scan schedules only files that can hold a source key.
  *
  * Soundness: a target row whose key set cannot equal any source key
  * can never satisfy a MATCHED clause, and delta writes carry no
  * carryover — unmatched target rows produce no ops. Filtering them
  * out is semantics-preserving exactly when unmatched TARGET rows are
  * irrelevant, so the rule requires the join shape to prove it: the
  * join type must preserve only the source side (Inner, or the outer
  * join whose preserved side is the source). A MERGE with NOT MATCHED
  * BY SOURCE clauses plans a target-preserving join and DECLINES.
  * NULL keys are safe by construction: `=` never matches NULL, and the
  * injected IN drops NULL-keyed target rows only.
  *
  * Decline-to-correct posture throughout (the [[GraftCowLeafScope]]
  * contract): any unexpected shape, non-deterministic expression,
  * EqualNullSafe conjunct (it CAN match NULLs), multiple target
  * relation occurrences, or an over-cap key set leaves the statement
  * on today's statically-pruned behavior. The decision is made once
  * per operation instance via [[GraftMorOperation]].
  */
object GraftMorRuntimeScope extends Rule[LogicalPlan] {

  /** Max distinct source keys the injected IN may carry; beyond it the
    * narrowing declines (plan-size and eager-collect bound).
    */
  val MaxKeys = 1000

  /** Count of delta writes this rule actually narrowed — the loud
    * regression tripwire, mirroring [[GraftCowLeafScope.engagements]].
    */
  private[graft] val engagements = new java.util.concurrent.atomic.LongAdder

  /** Test seam: table-relative paths of the files the most recent
    * positional [[GraftDeltaMor.MetaScan]] planned (after ALL
    * narrowing). Written by the scan, read by specs.
    */
  private[graft] val lastPlannedRels =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)

  /** Once-per-operation decision channel, carried by the merge-on-read
    * SupportsDelta operation instance [[GraftTable]] builds.
    */
  private[sources] trait GraftMorOperation {
    @volatile private var decided = false
    def morScopeDecided: Boolean = decided
    def decideMorScope(): Unit = { decided = true }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case wd: WriteDelta =>
      operationOf(wd) match {
        case Some(op) if !op.morScopeDecided =>
          op.decideMorScope() // one attempt per statement, success or not
          try narrow(wd)
          catch { case scala.util.control.NonFatal(_) => wd }
        case _ => wd
      }
  }

  /** The graft merge-on-read operation behind a WriteDelta, when it is
    * one (same reflective RowLevelOperationTable contact as
    * [[GraftCowLeafScope.operationOf]] — guarded, never throws).
    */
  private def operationOf(wd: WriteDelta): Option[GraftMorOperation] =
    wd.table match {
      case rel: DataSourceV2Relation
        if rel.table.getClass.getSimpleName == "RowLevelOperationTable" =>
        try rel.table.getClass.getMethod("operation").invoke(rel.table) match {
          case g: GraftMorOperation => Some(g)
          case _ => None
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def narrow(wd: WriteDelta): LogicalPlan = {
    val opTable = wd.table match {
      case r: DataSourceV2Relation => r.table
      case _ => return wd
    }
    def isTarget(p: LogicalPlan): Boolean = p.exists {
      case r: DataSourceV2Relation => r.table eq opTable
      case _ => false
    }
    // exactly one target relation occurrence, inside exactly one join
    val occurrences = wd.query.collect {
      case r: DataSourceV2Relation if r.table eq opTable => r
    }
    if (occurrences.length != 1) return wd
    val targetRel = occurrences.head
    val joins = wd.query.collect { case j: Join => j }
    if (joins.length != 1) return wd
    val j = joins.head

    // which side holds the target; the join must preserve ONLY the
    // source side for target-row filtering to be semantics-preserving
    val (sourceSide, safeType) =
      if (isTarget(j.left) && !isTarget(j.right))
        (j.right, j.joinType == Inner || j.joinType == RightOuter)
      else if (isTarget(j.right) && !isTarget(j.left))
        (j.left, j.joinType == Inner || j.joinType == LeftOuter)
      else return wd
    if (!safeType) return wd

    // equi-conjuncts targetCol = <source expr> from the command condition
    val targetOut = targetRel.outputSet
    val sourceOut = sourceSide.outputSet
    def keyPair(e: Expression): Option[(AttributeReference, Expression)] =
      e match {
        case EqualTo(a: AttributeReference, s)
          if targetOut.contains(a) && s.references.subsetOf(sourceOut) &&
            s.deterministic => Some((a, s))
        case EqualTo(s, a: AttributeReference)
          if targetOut.contains(a) && s.references.subsetOf(sourceOut) &&
            s.deterministic => Some((a, s))
        case _ => None
      }
    val pairs = splitConjuncts(wd.condition).flatMap(keyPair)
    if (pairs.isEmpty) return wd

    // the eager key collection is a SEPARATE execution of the source:
    // a source whose output can differ between runs (non-deterministic
    // expressions, samples, un-ordered limits) would leave the IN
    // filter stale and silently drop matched target rows — decline.
    // DECLINE-TO-CORRECT CONTRACT: what this check cannot see is a
    // CONCURRENT COMMIT to a source TABLE between this collect and the
    // join's own execution. The engine's statement-level assumption
    // (shared with every scan: file sets are pinned at planning) is
    // that a table's snapshot is stable for the duration of one
    // statement; a writer landing mid-statement already yields
    // undefined rows for the join itself, so the narrowing filter adds
    // no NEW exposure class — but it can turn "reads the racing
    // commit's rows" into "silently skips them". Engine writers are
    // serialized per-table by [[GraftCommitLock]]; cross-engine
    // writers racing a MERGE's source are outside the contract.
    val sourceUnstable = sourceSide.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Sample => true
      case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => true
      case p => p.expressions.exists(!_.deterministic)
    }
    if (sourceUnstable) return wd

    // one eager distinct over ALL key expressions (delta-bounded; the
    // cap turns a large-source merge back into the static plan)
    val keyExprs: Seq[NamedExpression] = pairs.zipWithIndex.map {
      case ((_, s), i) => Alias(s, s"__graft_k$i")()
    }
    val spark = SparkSession.active
    val rows = spark.sessionState.executePlan(
        Limit(Literal(MaxKeys + 1),
          Distinct(Project(keyExprs, sourceSide))))
      .executedPlan.executeCollect()
    if (rows.length > MaxKeys) return wd

    // per-column distinct non-null values -> IN lists. An empty list
    // (all-null or empty source) means NO target row can match: a
    // false filter is sound and collapses the positional scan.
    val preds: Seq[Expression] = pairs.zipWithIndex.map {
      case ((a, s), i) =>
        val vals = rows.toSeq.flatMap { r =>
          if (r.isNullAt(i)) None else Some(r.get(i, s.dataType))
        }.distinct
        if (vals.isEmpty) Literal.FalseLiteral
        else In(a, vals.map(Literal(_, s.dataType)))
    }
    val pred = preds.reduceLeft[Expression](And(_, _))
    val newQuery = wd.query.transformUp {
      case r: DataSourceV2Relation if r.table eq opTable => Filter(pred, r)
    }
    engagements.increment()
    wd.copy(query = newQuery)
  }
}
