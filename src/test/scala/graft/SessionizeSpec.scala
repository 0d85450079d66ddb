package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: three events inside one session, then a 31-min gap
    (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
    (2L, 1L, ts("2024-01-01 10:10:00"), 2.0),
    (3L, 1L, ts("2024-01-01 10:39:59"), 3.0),
    (4L, 1L, ts("2024-01-01 11:10:00"), 4.0), // 30:01 after #3 → new session
    // user 2: exactly-30:00 gap stays in the SAME session (strict >)
    (5L, 2L, ts("2024-01-01 09:00:00"), 5.0),
    (6L, 2L, ts("2024-01-01 09:30:00"), 6.0),
    // user 2, next day
    (7L, 2L, ts("2024-01-02 09:00:00"), 7.0))
    .toDF("event_id", "user_id", "ts", "value")

  test("session ids split on >30min gaps, 1-based per user") {
    val tagged = Sessionize.withSessionIds(events)
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    assert(tagged(1L) == 1L && tagged(2L) == 1L && tagged(3L) == 1L)
    assert(tagged(4L) == 2L)
    assert(tagged(5L) == 1L && tagged(6L) == 1L) // boundary gap: same session
    assert(tagged(7L) == 2L)
  }

  test("sessionStats rolls up counts, bounds, and decimal-routed totals") {
    val stats = Sessionize.sessionStats(events)
    val u1s1 = stats.filter($"user_id" === 1 && $"session_seq" === 1).collect()(0)
    assert(u1s1.getAs[Long]("n_events") == 3L)
    assert(u1s1.getAs[Timestamp]("started_at") == ts("2024-01-01 10:00:00"))
    assert(u1s1.getAs[Timestamp]("ended_at") == ts("2024-01-01 10:39:59"))
    assert(u1s1.getAs[Double]("total_value") == 6.0)
    assert(stats.count() == 4)
  }

  test("tie timestamps order by event_id so sessionization is deterministic") {
    val dup = Seq(
      (10L, 9L, ts("2024-01-01 00:00:00"), 0.0),
      (11L, 9L, ts("2024-01-01 00:00:00"), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val tagged = Sessionize.withSessionIds(dup)
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    // same instant → zero gap → one session; first by event_id opened it
    assert(tagged(10L) == 1L && tagged(11L) == 1L)
  }
}
