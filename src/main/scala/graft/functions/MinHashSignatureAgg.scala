package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SQL-portable string hash shared by the signature aggregator and its
  * DuckDB oracle: Horner fold over code points, base 257 mod 2^31−1,
  * with the FIRST code point as the fold's initial value — exactly
  * DuckDB's `list_reduce(list_transform(...ascii...), (a,b) ->
  * (a*257+b) % M)`, so both engines derive identical slot values.
  * (The xxhash-based sketches stay the production default; this hash
  * exists for cross-engine checkability.)
  */
object PortableHash {
  val Mod = 2147483647L
  val Base = 257L
  /** The hash family's slot-shift multiplier (Lehmer/minstd constant).
    * Every Scala helper AND every generated oracle SQL interpolates
    * THIS value — a bare 48271 literal anywhere else would silently
    * desync engine from oracle if the family ever changes.
    */
  val Shift = 48271L

  def hash(s: String): Long = {
    var h = 0L
    var first = true
    val it = s.codePoints().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (first) { h = c; first = false }
      else h = (h * Base + c) % Mod
    }
    h
  }

  /** Slot j's hash-family member: shift by j·48271, then SQUARE mod M.
    * A purely affine family is unusable here: the Horner base hash has
    * no avalanche (near-identical strings hash to consecutive values),
    * and affine maps preserve that local ordering, so every slot's
    * argmin lands on the lexicographic extreme of a clustered set —
    * measured ZERO matching slots at jaccard 1/3. The quadratic step
    * breaks the ordering (consecutive v differ by ~2v mod M) while
    * staying SQL-portable: v·v stays under 2^62, no 64-bit overflow in
    * BIGINT engines. Measured 10/32 matches at jac=1/3 (expected 10.7)
    * and 0/32 on disjoint sets.
    */
  def slot(h: Long, j: Int): Long = {
    val v = (h + j * Shift) % Mod
    v * v % Mod
  }
}

/** MinHash signature as a typed Aggregator (SURVEY §7.3's sketch-
  * aggregation tier): per group, slot j holds the min of slot-j hashes
  * over every element. This is the partial/final-merge shape Spark
  * distributes best — each task reduces its shard into a 32-slot
  * buffer, merge is elementwise min, and only `numSlots` longs per
  * group cross the wire, however many elements the group has. The
  * expected fraction of matching slots between two groups' signatures
  * estimates the Jaccard similarity of their element sets.
  */
class MinHashSignatureAgg(numSlots: Int)
  extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numSlots)(Long.MaxValue)

  override def reduce(buf: Array[Long], elem: String): Array[Long] = {
    val h = PortableHash.hash(elem)
    var j = 0
    while (j < numSlots) {
      val v = PortableHash.slot(h, j)
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numSlots) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** Same signature aggregation over PRE-HASHED elements (the exploded
  * output of functions.GramHashes): the reduce path is pure slot
  * arithmetic — no string materialization or per-element re-hashing.
  * Identical signatures to the string form by construction (GramHashes
  * emits exactly PortableHash.hash of each gram).
  */
class MinHashSignatureFromHashes(numSlots: Int)
  extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numSlots)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < numSlots) {
      val v = PortableHash.slot(h, j)
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numSlots) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashSignatureAgg {
  /** Column-usable UDAF: groupBy(...).agg(MinHashSignatureAgg.udaf(32)(col)). */
  def udaf(numSlots: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new MinHashSignatureAgg(numSlots), Encoders.STRING)

  /** UDAF over pre-hashed gram values (array<long> exploded). */
  def udafFromHashes(numSlots: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new MinHashSignatureFromHashes(numSlots), Encoders.scalaLong)
}
