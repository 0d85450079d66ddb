package graft.runtime

import org.apache.spark.sql.DataFrame

/** One policy for materializing a frame that multiple plan branches
  * consume (Spark does not reuse arbitrary identical subtrees — only
  * exchanges, and verified-not here): self-joins, verify join-backs,
  * and count/aggregate fan-outs would otherwise re-execute the frame's
  * whole lineage once per branch.
  *
  * `localCheckpoint` stores blocks on executors: fastest, no
  * distributed-storage round-trip, and correct on static-allocation
  * clusters and local mode. CAVEAT for 100 TB deployments with dynamic
  * allocation: losing an executor loses its blocks and fails the job —
  * there, swap this ONE method for `df.checkpoint()` (reliable,
  * cluster-FS-backed) or an explicit parquet write/read of the
  * intermediate. Every multi-branch materialization in the codebase
  * routes through here so the swap is a one-line policy change.
  */
object Materialize {
  def once(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)

  /** Drop the storage blocks behind a frame whose plan ROOT is a
    * [[once]] leaf, looking through Project/SubqueryAlias wrappers
    * only. Deliberately NOT a whole-tree collect: a derived frame can
    * embed some OTHER still-live materialized frame deeper in its
    * lineage, and unpersisting that one would be unrecoverable
    * (localCheckpoint truncates lineage, so the blocks cannot be
    * recomputed). Frames without a materialized root are a no-op.
    * Iterative operators (connected components, BPE training) call
    * this per generation so executor storage holds one generation,
    * not the whole history.
    */
  def free(df: DataFrame): Unit = {
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
