package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("strict funnel: order matters, equal timestamps do not advance") {
    val events = Seq(
      // user 1: full funnel in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: clicked BEFORE viewing → stage 2 not reached
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
      // user 3: view+click but purchase BEFORE click → stage 3 not reached
      (3L, "view", ts(1)), (3L, "purchase", ts(2)), (3L, "click", ts(4)),
      // user 4: click at the SAME instant as view → strictness excludes
      (4L, "view", ts(1)), (4L, "click", ts(1)),
      // user 5: view only
      (5L, "view", ts(1)),
      // user 6: never viewed
      (6L, "purchase", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.strictFunnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "view", 5L),      // users 1-5
      (2, "click", 2L),     // users 1, 3 (2 clicked early, 4 tied)
      (3, "purchase", 1L))) // user 1 only
  }

  test("funnel with a stage no user reaches reports zero, not absence") {
    val events = Seq((1L, "view", ts(1))).toDF("user_id", "event_type", "ts")
    val got = Funnel.strictFunnel(events, "user_id", "event_type", "ts",
        Seq("view", "signup"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 1L), (2, "signup", 0L)))
  }
}
