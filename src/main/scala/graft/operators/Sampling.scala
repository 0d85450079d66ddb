package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * The split must be (a) stable under re-runs and cluster topology —
  * never `rand()`; (b) content-independent — keyed on the document id,
  * not text, so editing a doc can't migrate it between train and val;
  * (c) reproducible OUTSIDE Spark so any engine (or the eval harness)
  * can re-derive the assignment. sha-256 of the id satisfies all
  * three; the first byte, read portably from the hex rendering, gives
  * 256 uniform buckets to budget between splits. Shuffle-free: the
  * assignment is a scalar projection.
  */
object Sampling {

  private val HexChars = "0123456789abcdef"

  /** Value of one lowercase hex character (when-chain: plain CASE in
    * any SQL engine, codegen'd in Spark).
    */
  def hexVal(c: Column): Column =
    HexChars.zipWithIndex.tail.foldLeft(when(c === "0", 0)) {
      case (acc, (ch, v)) => acc.when(c === ch.toString, v)
    }

  /** First byte of sha-256(id) as a bucket in [0, 256). */
  def hashBucket(id: Column): Column = {
    val h = sha2(id.cast("string"), 256)
    hexVal(substring(h, 1, 1)) * 16 + hexVal(substring(h, 2, 1))
  }

  /** 'train' for buckets below `trainBuckets`, else 'val' — e.g. 230/256
    * ≈ 89.8% train.
    */
  def splitLabel(id: Column, trainBuckets: Int = 230): Column =
    when(hashBucket(id) < trainBuckets, "train").otherwise("val")

  /** The same bucket as portable SQL text over column `idExpr` (DuckDB
    * dialect: strpos + sha256), kept adjacent to the Column form so the
    * two cannot drift.
    */
  def hashBucketSql(idExpr: String): String = {
    def hx(pos: Int) =
      s"(strpos('$HexChars', substr(sha256(CAST($idExpr AS VARCHAR)), $pos, 1)) - 1)"
    s"(${hx(1)} * 16 + ${hx(2)})"
  }
}
