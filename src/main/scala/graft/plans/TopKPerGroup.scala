package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator: logical node → strategy →
  * physical plan, registered through SparkSessionExtensions — the
  * whole-operator extension tier next to the codegen'd expressions,
  * the typed Aggregator, and the injected optimizer rule.
  *
  * Why not window+filter? `row_number().over(partitionBy(g).orderBy(o))
  * .filter(rk <= k)` is the declarative spelling (q29's original
  * shape), but WindowExec must SORT every partition completely —
  * O(n log n) comparisons and full materialization of each group —
  * before the filter throws away all but k rows. This operator keeps a
  * bounded heap of k rows per group: O(n log k) comparisons, O(groups
  * × k) memory, no sort buffer spills. Same single hash-partition
  * shuffle on the group key (ClusteredDistribution), so the plan shape
  * at 100 TB is identical — only the per-partition cost drops.
  *
  * Determinism contract: like the window spelling, ranks are total only
  * if `order` carries a unique tiebreak; ties at the heap boundary are
  * otherwise arbitrary (exactly as row_number over a non-total order).
  */
object TopK {

  /** Top-k rows per group with a rank column appended. `order` follows
    * Column.asc/desc; pass a unique tiebreak for total determinism.
    */
  def perGroup(df: DataFrame, group: Seq[Column], order: Seq[Column],
               k: Int, rankName: String = "rk"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.graft.ColumnBridge
    val groupE = group.map(ColumnBridge.convertedExpression)
    val orderE = order.map(ColumnBridge.convertedExpression).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupE, orderE, k, rankAttr, df.queryExecution.analyzed))
  }
}

/** Logical grouped top-k. `rankAttr` is a constructor member (not
  * derived) so tree copies keep the exprId stable and downstream
  * references stay bound.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: one-to-one lowering of the logical node. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      TopKPerGroupExec(g, o, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical grouped top-k: per-partition hash of group key → bounded
  * max-heap (worst kept row at the head), emit each group's survivors
  * in rank order. Requires clustering on the group key —
  * EnsureRequirements inserts the hash exchange, AQE handles it like
  * any aggregate shuffle. No sort of the input, ever.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val orderLocal = order
    val groupLocal = groupExprs
    val rankLocal = rankAttr
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val ord = RowOrdering.create(orderLocal, childOutput)
      // max-heap per group under `ord` (head = worst kept row)
      val heaps = new java.util.LinkedHashMap[
        InternalRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.lt(row, heap.peek())) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(
        childOutput :+ rankLocal, childOutput :+ rankLocal)
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        // draining the max-heap yields worst-first → fill backwards
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
        rows.iterator.zipWithIndex.map { case (r, idx) =>
          rankRow.setInt(0, idx + 1)
          outProj(joined(r, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
