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

  /** First byte of sha-256(id) as a bucket in [0, 256): one `conv`
    * call (base-16 parse) on the first two hex chars. The oracle text
    * uses a strpos lookup instead because not every engine has conv —
    * same arithmetic, q35's gate proves the equality.
    */
  def hashBucket(id: Column): Column =
    conv(substring(sha2(id.cast("string"), 256), 1, 2), 16, 10).cast("int")

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
