package graft.plans

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
  * shape), but WindowExec must sort every partition on (group, ALL
  * order columns) and buffer each group completely before the filter
  * throws away all but k rows. This operator requires only a sort on
  * the group key (cheaper comparisons, and Spark's SortExec spills, so
  * the pre-step is safe at any scale) and then streams one group at a
  * time through a bounded heap of k rows: O(n log k) order-column
  * comparisons and O(k) operator memory regardless of group count or
  * group size — high-cardinality keys can never OOM the operator the
  * way an unbounded groups-map would. Same single hash-partition
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
    require(!df.columns.contains(rankName),
      s"rank column '$rankName' collides with an input column; pass a distinct rankName")
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

/** Physical grouped top-k: input clustered AND sorted on the group key
  * (EnsureRequirements inserts the hash exchange + a spillable SortExec;
  * AQE handles the exchange like any aggregate shuffle), then one
  * streaming pass — a bounded max-heap of k rows (worst kept row at the
  * head) for the CURRENT group only, drained in rank order at each group
  * boundary. Operator memory is O(k); the order columns are never
  * sorted.
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

  // group-key-only sort: rows of one group arrive contiguously, so the
  // operator holds at most k rows at a time. SortExec spills, so this
  // stays safe where an in-operator hash-of-heaps would OOM on
  // high-cardinality keys.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupExprs.map(SortOrder(_, Ascending)))

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
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(
        childOutput :+ rankLocal, childOutput :+ rankLocal)
      new Iterator[InternalRow] {
        // max-heap of the current group's kept rows (head = worst)
        private val heap =
          new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
        private var curKey: InternalRow = null
        private var drained: Iterator[InternalRow] = Iterator.empty

        private def drainHeap(): Iterator[InternalRow] = {
          val rows = new Array[InternalRow](heap.size)
          var i = rows.length - 1
          // draining the max-heap yields worst-first → fill backwards
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
          rows.iterator.zipWithIndex.map { case (r, idx) =>
            rankRow.setInt(0, idx + 1)
            outProj(joined(r, rankRow))
          }
        }

        override def hasNext: Boolean = {
          while (!drained.hasNext && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            if (curKey == null) curKey = key.copy()
            else if (!key.equals(curKey)) {
              // group boundary: emit the finished group; the heap is
              // empty again after drainHeap's eager poll loop, so the
              // boundary row below starts the new group
              drained = drainHeap()
              curKey = key.copy()
            }
            if (heap.size < kLocal) heap.add(row.copy())
            else if (ord.lt(row, heap.peek())) {
              heap.poll()
              heap.add(row.copy())
            }
          }
          if (!drained.hasNext && heap.size > 0) drained = drainHeap()
          drained.hasNext
        }

        override def next(): InternalRow = drained.next()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
