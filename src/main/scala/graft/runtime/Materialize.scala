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
}
