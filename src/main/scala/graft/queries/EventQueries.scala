package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Sessionize
import graft.runtime.Tables

/** Extension tier — event-stream analytics over the `events` table. */
object EventQueries {

  /** Gap-based sessionization (30-minute inactivity threshold): tag
    * each user's events with session sequence numbers, roll up to one
    * row per session. One shuffle total — the session window and the
    * rollup share the user-key partitioning. Oracle computes the
    * identical window chain in SQL (microsecond-exact gap compare).
    */
  def q32Sessionize(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessionStats(Tables.load(spark, dir, "events"), gapSec = 1800)

  val q32Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS opens
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM marked)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(ts) AS started_at, max(ts) AS ended_at,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, session_seq""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_sessionize" -> (q32Sessionize _))

  val oracles: Map[String, String] = Map(
    "q32_sessionize" -> q32Oracle)
}
