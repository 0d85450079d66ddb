package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** One packed training sequence: which documents it holds and how full
  * it is against the token budget.
  */
case class PackedSequence(seq_id: Long, doc_ids: Seq[Long], n_docs: Int,
                          total_tokens: Long, fill: Double)

/** Sequence packing for LLM training batches: concatenate documents
  * into fixed token-budget sequences so padding is minimized.
  *
  * Packing is PARTITION-LOCAL greedy (close a sequence when the next
  * doc would overflow; oversized docs get a sequence of their own for
  * the downstream truncator). This is the standard distributed shape:
  * a global optimal packing would serialize the corpus through one
  * node for marginal fill gains, while per-shard greedy keeps packing
  * embarrassingly parallel and streaming — each task packs its shard
  * in one pass with O(1) state. Genuine per-partition imperative
  * logic, so this is one of the few places mapPartitions is the right
  * tool rather than a Column expression.
  *
  * seq_ids embed the partition id in the high bits: globally unique
  * with zero coordination, stable for a fixed partitioning.
  */
object Packing {

  def packSequences(docs: DataFrame, budget: Long,
                    idCol: String = "doc_id",
                    tokensCol: String = "n_tokens"): Dataset[PackedSequence] = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(tokensCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        val pid = TaskContext.getPartitionId().toLong
        var emitted = 0L
        var ids = List.empty[Long]
        var used = 0L
        def close(): PackedSequence = {
          val seq = PackedSequence(
            seq_id = (pid << 40) | emitted,
            doc_ids = ids.reverse,
            n_docs = ids.size,
            total_tokens = used,
            fill = math.min(used.toDouble / budget, 1.0))
          emitted += 1
          ids = Nil
          used = 0L
          seq
        }
        val packed = rows.flatMap { case (id, tokens) =>
          if (used > 0 && used + tokens > budget) {
            val done = close()
            ids = id :: ids; used = tokens
            Iterator.single(done)
          } else {
            ids = id :: ids; used += tokens
            Iterator.empty
          }
        }
        // flush the open sequence after the shard is exhausted
        packed ++ new Iterator[PackedSequence] {
          private var flushed = false
          def hasNext: Boolean = !flushed && ids.nonEmpty
          def next(): PackedSequence = { flushed = true; close() }
        }
      }
  }
}
