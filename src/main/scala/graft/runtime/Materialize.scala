package graft.runtime

import org.apache.spark.sql.DataFrame

/** One policy for materializing a frame that multiple plan branches
  * consume (Spark does not reuse arbitrary identical subtrees — only
  * exchanges, and verified-not here): self-joins, verify join-backs,
  * and count/aggregate fan-outs would otherwise re-execute the frame's
  * whole lineage once per branch.
  *
  * The policy is a session conf ([[Materialize.PolicyKey]]), not a
  * code edit: `localCheckpoint` (default) stores blocks on executors —
  * fastest, no distributed-storage round-trip, correct on
  * static-allocation clusters and local mode; for 100 TB deployments
  * with dynamic allocation, where losing an executor loses its blocks
  * and fails the job, set the conf to "reliable" (plus
  * `sparkContext.setCheckpointDir`) and every materialization in the
  * codebase switches to cluster-FS-backed `checkpoint`.
  */
object Materialize {
  /** Session conf selecting the materialization policy:
    * "local" (default) = `localCheckpoint` (executor blocks, fastest,
    * correct under static allocation / local mode); "reliable" =
    * `checkpoint` (cluster-FS-backed — REQUIRES
    * `sparkContext.setCheckpointDir`), the right policy under dynamic
    * allocation where losing an executor must not fail the job.
    */
  val PolicyKey = "spark.graft.materialize"

  def once(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(PolicyKey) match {
      case Some("reliable") => df.checkpoint(eager = false)
      case Some("local") | None => df.localCheckpoint(eager = false)
      case Some(other) => throw new IllegalArgumentException(
        s"$PolicyKey must be 'local' or 'reliable', got '$other'")
    }

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
