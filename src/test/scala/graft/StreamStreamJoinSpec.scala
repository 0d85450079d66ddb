package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming

class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("attributionJoin matches clicks within the window, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streaming.attributionJoin(
      imps.toDF().toDF("imp_id", "imp_user", "imp_ts"),
      clicks.toDF().toDF("click_id", "click_user", "click_ts"))
    val q = joined.writeStream.format("memory")
      .queryName("attribution").outputMode("append").start()

    // batch 1: impression for users 1 and 2
    imps.addData(
      (100L, 1L, ts("2026-01-01 10:00:00")),
      (101L, 2L, ts("2026-01-01 10:00:00")))
    q.processAllAvailable()
    // batch 2: user 1 clicks 5 min later (in window); user 2 clicks
    // 30 min later (outside `within`); user 3 clicks with no impression
    clicks.addData(
      (500L, 1L, ts("2026-01-01 10:05:00")),
      (501L, 2L, ts("2026-01-01 10:30:00")),
      (502L, 3L, ts("2026-01-01 10:05:00")))
    q.processAllAvailable()
    val rows = spark.table("attribution")
      .as[(Long, Long, Long, Long)].collect().toSet
    q.stop()

    assert(rows == Set((100L, 500L, 1L, 300L)))
  }

  test("attributionJoinOuter emits unmatched impressions after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streaming.attributionJoinOuter(
      imps.toDF().toDF("imp_id", "imp_user", "imp_ts"),
      clicks.toDF().toDF("click_id", "click_user", "click_ts"))
    val q = joined.writeStream.format("memory")
      .queryName("attribution_outer").outputMode("append").start()

    imps.addData(
      (100L, 1L, ts("2026-01-01 10:00:00")),   // will convert
      (101L, 2L, ts("2026-01-01 10:00:00")))   // will NOT convert
    clicks.addData(
      (500L, 1L, ts("2026-01-01 10:05:00")))
    q.processAllAvailable()
    // advance BOTH watermarks far past 10:30 so impression 101's join
    // state expires, then one more batch to surface the null-side row
    imps.addData((199L, 9L, ts("2026-01-01 12:00:00")))
    clicks.addData((599L, 9L, ts("2026-01-01 12:00:01")))
    q.processAllAvailable()
    imps.addData((198L, 8L, ts("2026-01-01 13:00:00")))
    clicks.addData((598L, 8L, ts("2026-01-01 13:00:01")))
    q.processAllAvailable()
    val rows = spark.table("attribution_outer")
      .select("imp_id", "click_id", "converted")
      .as[(Long, Option[Long], Int)].collect().toSet
    q.stop()

    assert(rows.contains((100L, Some(500L), 1)),
      s"matched impression missing: $rows")
    assert(rows.contains((101L, None, 0)),
      s"watermark-expired impression 101 must emit with NULL click: $rows")
  }
}
