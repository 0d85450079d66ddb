package graft

import java.sql.Timestamp
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("point-in-interval: boundaries inclusive, bucket spans, misses dropped") {
    val points = Seq(
      (1L, "k1", ts("10:00:00")),  // exactly at interval start
      (2L, "k1", ts("10:59:59")),  // inside, different bucket than start
      (3L, "k1", ts("11:00:00")),  // exactly at interval end
      (4L, "k1", ts("11:00:01")),  // one second past the end → no match
      (5L, "k1", ts("09:59:59")),  // before start → no match
      (6L, "k2", ts("10:30:00")),  // right key, other interval
      (7L, "k3", ts("10:30:00")))  // key with no interval
      .toDF("id", "k", "t")
    val intervals = Seq(
      ("k1", ts("10:00:00"), ts("11:00:00"), 100L), // spans 3 30-min buckets
      ("k2", ts("10:00:00"), ts("10:45:00"), 200L))
      .toDF("k", "s", "e", "iv_id")
    val got = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "t", "s", "e", bucketSeconds = 1800)
      .select("id", "iv_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 100L, 2L -> 100L, 3L -> 100L, 6L -> 200L))
  }

  test("a pair meets exactly once even when the interval covers many buckets") {
    val points = Seq((1L, "k", ts("12:00:00"))).toDF("id", "k", "t")
    val intervals = Seq(("k", ts("09:00:00"), ts("15:00:00"), 7L))
      .toDF("k", "s", "e", "iv_id")
    // tiny buckets: the interval explodes over hundreds of buckets, but
    // the point's single bucket yields exactly one joined row
    val rows = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "t", "s", "e", bucketSeconds = 60)
      .collect()
    assert(rows.length == 1)
  }
}
