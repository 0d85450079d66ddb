package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog (Flajolet et al., AofA 2007) as a mergeable typed
  * Aggregator over the SQL-portable [[PortableHash]] — the
  * REGISTER-EXACT counterpart of `approx_count_distinct` (whose
  * HLL++/xxhash internals an external engine cannot replay; q47 can
  * only tolerance-check it). Here every derived quantity is integer
  * arithmetic a DuckDB oracle reproduces bit-for-bit.
  *
  * Layout: m = 64 registers (p = 6). The raw Horner hash has no
  * avalanche (consecutive strings → consecutive values, which starves
  * every high-rho event), so elements route through the same
  * squared-shift family member the portable MinHash slots use:
  * hv = PortableHash.slot(hash(t), 1) ∈ [0, 2^31). Then
  *   - bucket  = hv & 63             (low 6 bits)
  *   - payload = hv >>> 6            (25 bits)
  *   - rho     = 26 - bitlength(payload), i.e. leading zeros within
  *               the 25-bit window + 1; payload 0 → 26.
  * Register j keeps the MAX rho seen in bucket j — max is idempotent
  * and commutative, so duplicate inserts are free, merge is
  * elementwise max, and Spark's partial/final aggregation ships 64
  * ints per group per map task regardless of group cardinality (the
  * same 100 TB shuffle story as [[MinHashSignatureAgg]] /
  * [[CountMinAgg]]).
  *
  * The raw estimate alpha_64 * m^2 / sum_j 2^-M_j is kept integral by
  * scaling the harmonic sum by 2^26 (`denom = sum_j 2^(26-M_j)`, at
  * most 64·2^26 < 2^32) and alpha by 1000 (alpha_64 = 0.709):
  * `est = (709·4096 << 26) / (1000·denom)` — exact 64-bit floor
  * division on both engines. The small-range linear-counting branch
  * (m·ln(m/V)) needs a logarithm, so it stays a consumer-side float
  * step; the query emits `n_zero` (V) so the consumer can take it.
  */
class HllAgg extends Aggregator[String, Array[Int], Seq[Int]] {
  import HllAgg.{M, Width}

  override def zero: Array[Int] = new Array[Int](M)

  override def reduce(buf: Array[Int], tok: String): Array[Int] = {
    val h = PortableHash.slot(PortableHash.hash(tok), 1)
    val bucket = (h & (M - 1)).toInt
    val payload = h >>> 6
    val rho =
      if (payload == 0L) Width + 1
      else Width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(payload))
    if (rho > buf(bucket)) buf(bucket) = rho
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}

object HllAgg {
  /** Register count (2^p, p = 6). */
  val M = 64
  /** Payload width in bits: 31-bit hash minus the 6 bucket bits. */
  val Width = 25
  /** alpha_64 scaled by 1000 (Flajolet et al. give 0.709 for m = 64). */
  val AlphaMilli = 709L

  /** Column-usable UDAF: groupBy(...).agg(HllAgg.udaf(col)). */
  def udaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllAgg, Encoders.STRING)
}
