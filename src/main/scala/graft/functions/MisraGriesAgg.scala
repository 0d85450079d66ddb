package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a mergeable typed Aggregator:
  * per group, a bounded map of at most `k` (token → lower-bound count)
  * counters, whatever the group's cardinality. This is the frequent-
  * items sketch a 100 TB token-frequency scan needs — the exact
  * groupBy(token) alternative shuffles one row per DISTINCT token,
  * while this ships at most `k` entries per group per map task and
  * merges associatively (partial/final, like any Spark aggregate).
  *
  * Guarantees (Misra & Gries 1982; merge step per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 — both public literature):
  *   - `est(t) ≤ true(t)`  (counts only ever under-estimate), and
  *   - `true(t) − est(t) ≤ N/(k+1)` where N is the group's total
  *     element count — so every token with frequency above N/(k+1)
  *     is guaranteed present in the summary.
  * Those two bounds are exactly what q64's `sketch_ok` flag asserts
  * against the exact counts, making the sketch oracle-checkable
  * without fixing engine-specific internals.
  *
  * The reduce step is the classic one: increment a resident counter,
  * admit while there is room, otherwise decrement ALL counters by one
  * (dropping zeros). The merge step sums counters pointwise, then
  * subtracts the (k+1)-th largest count from every entry and keeps the
  * strictly-positive ones — the summary-size/error proof composes, so
  * distributed partial aggregation preserves the bound.
  */
class MisraGriesAgg(k: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"need at least one counter, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1L)
      case None if buf.size < k => buf.updated(tok, 1L)
      case None =>
        buf.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // (k+1)-th largest count; subtracting it zeroes at least size-k
      // entries, so the survivor set is back within k counters
      val counts = sum.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAgg {
  /** Column-usable UDAF: groupBy(...).agg(MisraGriesAgg.udaf(64)(col)). */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGriesAgg(k), Encoders.STRING)
}
