package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step that
  * turns near-duplicate PAIRS (MinHash/SimHash/embedding miners) into
  * duplicate GROUPS, from which a pipeline keeps one canonical document
  * per group.
  *
  * Algorithm: iterative min-label propagation (the Pregel formulation
  * GraphX's connectedComponents uses): every node starts labeled with
  * its own id; each round, a node adopts the minimum label among itself
  * and its neighbors; fixpoint = every node labeled with its
  * component's minimum id. Rounds needed = graph diameter — near-dup
  * graphs are unions of near-cliques (all pairs in a bucket mine
  * against each other), so the diameter is small in practice. For
  * adversarially long chain graphs at 100 TB scale, swap the loop body
  * for the alternating large-star/small-star rounds of Kiveris et al.
  * ("Connected Components in MapReduce and Beyond", SoCC'14), which
  * converge in O(log n) rounds with the same per-round join shape.
  *
  * Scale design per round: one equi-join (labels keyed by node id, the
  * edge list keyed by endpoint) + one min-aggregate — both shuffle on
  * the node-id key, no all-pairs anything. The edge list and each
  * round's labels are materialized (Materialize.once policy) so the
  * loop re-reads stored blocks instead of replaying the pair miner's
  * lineage every iteration; the convergence probe is a count over the
  * (pre-aggregated, ≤ |nodes|-row) changed-label set, never a collect.
  */
object Clusters {

  /** Component labels for every node appearing in `pairs`: returns
    * (id, cluster) where cluster = the minimum node id reachable from
    * `id`. Nodes absent from `pairs` (singletons) are not returned —
    * callers union them back with cluster = own id.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame = {
    // symmetric edge list: propagation must flow both directions. The
    // two directions come from ONE explode over each pair row — a
    // two-branch union would embed the (possibly expensive) pair
    // miner's lineage twice, and Spark does not reuse identical
    // subtrees within a job.
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .transform(graft.runtime.Materialize.once)
    // initialization fused with the first propagation round: a node's
    // round-1 label is min(self, neighbors), which one aggregate over
    // the edge list yields directly — saves a full shuffle+probe round
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mindst"))
      .select(col("src").as("id"),
        least(col("src"), col("mindst")).as("label"))
      .transform(graft.runtime.Materialize.once)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val fromNeighbors = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
      // the node's own previous label rides through the SAME aggregate
      // (min over the tagged self-branch), so the convergence probe
      // needs no join back against the old labels — one shuffle and one
      // count action per round, full stop
      val next = labels.withColumn("own", lit(true))
        .unionByName(fromNeighbors.withColumn("own", lit(false)))
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"),
          min(when(col("own"), col("label"))).as("prev"))
        .transform(graft.runtime.Materialize.once)
      val changed = next.filter(col("label") =!= col("prev")).count()
      converged = changed == 0L
      if (converged) {
        // zero changes ⇒ `next`'s (id, label) set equals `labels`'s, so
        // keep the already-materialized previous generation and free the
        // redundant new one
        unpersistCheckpoint(next)
      } else {
        // free the previous round's checkpoint blocks now that `next` is
        // materialized: without this, executor storage accumulates one
        // label generation per round until driver GC gets around to it
        unpersistCheckpoint(labels)
        labels = next.select(col("id"), col("label"))
      }
      i += 1
    }
    // the symmetric edge list (the largest frame of the loop) is dead
    // once labels have converged — localCheckpoint truncated the label
    // lineage, so nothing downstream can reference it
    unpersistCheckpoint(edges)
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Free the checkpoint blocks behind a frame returned by
    * [[connectedComponents]] once it has been fully consumed. The
    * returned labels are backed by one materialized generation that
    * otherwise lives until the driver GCs the frame.
    */
  def release(labels: DataFrame): Unit = unpersistCheckpoint(labels)

  /** Drop the storage blocks behind a frame whose plan ROOT is a
    * [[graft.runtime.Materialize.once]] leaf, looking through
    * Project/SubqueryAlias wrappers only. Deliberately NOT a whole-tree
    * collect: a derived frame can embed some OTHER still-live
    * materialized frame deeper in its lineage, and unpersisting that one
    * would be unrecoverable (localCheckpoint truncates lineage, so the
    * blocks cannot be recomputed). Frames without a materialized root
    * are a no-op.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    @annotation.tailrec
    def leaf(p: LogicalPlan): Option[org.apache.spark.sql.execution.LogicalRDD] =
      p match {
        case l: org.apache.spark.sql.execution.LogicalRDD => Some(l)
        case pr: Project => leaf(pr.child)
        case s: SubqueryAlias => leaf(s.child)
        case _ => None
      }
    leaf(df.queryExecution.analyzed).foreach(_.rdd.unpersist(false))
  }
}
