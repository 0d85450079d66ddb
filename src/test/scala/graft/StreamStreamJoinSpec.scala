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
}
