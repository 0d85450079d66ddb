package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: match point rows (key, t) to
  * interval rows (key, start, end) with start ≤ t ≤ end — the second
  * temporal-join primitive Spark has no native operator for.
  *
  * A naive inequality join plans as BroadcastNestedLoopJoin (all pairs
  * per key). Here intervals explode over the fixed-width time buckets
  * they cover and points compute their single bucket, so the match is
  * an EQUI-join on (key, bucket) + an exact range filter — shuffle keys
  * are hashable, work is proportional to true matches plus bucket
  * collisions, and AQE/skew handling apply as with any equi-join. Pick
  * `bucketSeconds` near the typical interval length: too small explodes
  * intervals into many buckets, too large pools unrelated points.
  * A (point, interval) pair can meet only in the point's unique bucket,
  * so no post-join dedup is needed.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], tCol: String,
                      startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    val w = bucketSeconds * 1000000L // microseconds
    val p = points.withColumn("__bucket",
      floor(unix_micros(col(tCol)) / w))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / w),
        floor(unix_micros(col(endCol)) / w))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bucket")
  }
}
