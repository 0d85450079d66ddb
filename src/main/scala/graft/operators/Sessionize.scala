package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions
  * at inactivity gaps, assign per-user session sequence numbers, and
  * roll sessions up to one row each.
  *
  * Scale design: exactly ONE shuffle (hash on the user key). The gap
  * flag, the running session counter, and the rollup all reuse the same
  * (user) partitioning and (ts, tie) ordering, so Catalyst plans a
  * single sort + window over one exchange, and the final groupBy
  * arrives pre-partitioned — no second shuffle. Per-user state is a
  * sort, never a collect; 10^9 users × 10^3 events each distributes
  * evenly unless one user is pathological (then see [[Skew]]).
  */
object Sessionize {

  /** Tag every event with its user-local `session_seq` (1-based).
    * A session breaks when the gap to the previous event exceeds
    * `gapSec` (microsecond-exact comparison; first event of a user
    * always opens session 1). `tieCol` makes the ordering total so
    * equal timestamps session identically on every run.
    */
  def withSessionIds(events: DataFrame, gapSec: Long = 1800,
                     userCol: String = "user_id", tsCol: String = "ts",
                     tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val gapUs = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w))
    val opens = when(gapUs.isNull.or(gapUs > gapSec * 1000000L), 1).otherwise(0)
    events
      .withColumn("__opens", opens)
      .withColumn("session_seq",
        sum(col("__opens")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__opens")
  }

  /** One row per (user, session): event count, start/end, value total.
    * The value sum routes through decimal(18,2) so it is associativity-
    * safe (bit-identical under any partial-aggregation order).
    */
  def sessionStats(events: DataFrame, gapSec: Long = 1800): DataFrame =
    withSessionIds(events, gapSec)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("started_at"),
        max(col("ts")).as("ended_at"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
}
