package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * mergeable typed Aggregator — the OVER-estimating complement to
  * [[MisraGriesAgg]]'s under-estimating counters: `depth` hash rows ×
  * `width` counters; an element increments one counter per row; the
  * point estimate is the MINIMUM of its `depth` counters.
  *
  * Guarantees (deterministic, both checkable against exact counts):
  *   - `est(t) ≥ true(t)` — always, every counter only over-counts;
  *   - `est(t) ≤ true(t) + N` trivially; the usual probabilistic bound
  *     `est ≤ true + e·N/width` holds in expectation per row.
  * q96 asserts the deterministic lower bound and — because the hash
  * family is the SQL-portable [[PortableHash]] slot family — the DuckDB
  * oracle replays the EXACT estimate, collisions and all, so the whole
  * sketch algebra is hash-match checked, not just bounded.
  *
  * Merge is cell-wise addition (the sketch is a linear projection of
  * the frequency vector), so Spark's partial/final aggregation ships
  * `depth·width` longs per group per map task regardless of group
  * cardinality — the 100 TB story matches MinHashSignatureAgg's.
  *
  * Row i's bucket for token t: `PortableHash.slot(hash(t), i) % width`
  * — same Horner-base-257 string hash and squared-shift family the
  * portable MinHash/SimHash sketches replay in SQL.
  */
class CountMinAgg(depth: Int, width: Int)
  extends Aggregator[String, Array[Long], Seq[Long]] {
  require(depth > 0 && width > 0, s"need positive dims, got $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    val h = PortableHash.hash(tok)
    var i = 0
    while (i < depth) {
      buf(i * width + (PortableHash.slot(h, i) % width).toInt) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinAgg {
  /** Column-usable UDAF: groupBy(...).agg(CountMinAgg.udaf(4, 512)(col)). */
  def udaf(depth: Int, width: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CountMinAgg(depth, width), Encoders.STRING)
}
