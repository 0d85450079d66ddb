package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic distributed uniform sampling: keep the `k` ids whose
  * multiplicative hash is smallest ("bottom-k sampling" — the
  * order-statistics sketch behind KMV distinct estimators and
  * consistent sampling). Because the "randomness" is a fixed bijective
  * hash of the id (Lehmer multiplier mod the Mersenne prime 2^31−1,
  * same family as [[PortableHash]]), the sample is: uniform over ids,
  * identical across runs/engines/partitionings, and MERGEABLE — the
  * bottom-k of a union is the bottom-k of the merged bottom-k's, so
  * partial aggregation ships at most k (hash, id) pairs per group per
  * map task, however many rows the group has. That is the scale story
  * reservoir sampling with rand() cannot give: rand() samples are
  * neither reproducible nor oracle-checkable.
  *
  * Buffer = ascending-sorted Seq of (hash, id), capped at k.
  */
class BottomKAgg(k: Int)
  extends Aggregator[Long, Seq[(Long, Long)], Seq[Long]] {
  require(k > 0, s"need k > 0, got $k")

  private def hash(id: Long): Long =
    // multiplication by a unit mod prime is a bijection — distinct ids
    // get distinct hashes (ids are non-negative and < 2^31−1 here),
    // so the ordering is total without a tiebreak
    (id * 48271L) % 2147483647L

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], id: Long): Seq[(Long, Long)] = {
    val h = hash(id)
    // duplicate ids must be idempotent (a sample of ids, not of rows):
    // the same id re-observed may not occupy a second slot
    if (buf.size >= k && h >= buf.last._1) buf
    else if (buf.contains((h, id))) buf
    else ((buf :+ (h, id)).sortBy(_._1)).take(k)
  }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).distinct.sortBy(_._1).take(k)

  override def finish(buf: Seq[(Long, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object BottomKAgg {
  /** Column-usable UDAF: groupBy(...).agg(BottomKAgg.udaf(8)(idCol)). */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BottomKAgg(k), Encoders.scalaLong)
}
