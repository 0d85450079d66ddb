package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Strict view→click→purchase conversion funnel: stage i counts
    * users whose first stage-i event lands strictly after their first
    * stage-(i−1) completion. Oracle replays the identical
    * filtered-min/join chain; timestamps compare at microseconds on
    * both sides (CAST in the oracle, nanos→micros truncation in
    * Tables.loadEvents).
    */
  def q44Funnel(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.strictFunnel(
      Tables.load(spark, dir, "events"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))

  val q44Oracle: String =
    """WITH s1 AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t
      |  GROUP BY e.user_id)
      |SELECT CAST(1 AS INT) AS stage_idx, 'view' AS stage,
      |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
      |UNION ALL
      |SELECT CAST(2 AS INT), 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
      |UNION ALL
      |SELECT CAST(3 AS INT), 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3)""".stripMargin

  /** Weekly retention cohorts: users grouped by first-active week,
    * counted in each later week they were active (week_offset 0 = the
    * cohort week itself). Two aggregations — (user, week) distinct,
    * then the cohort rollup — both partial-aggregated; the per-user
    * cohort frame joins back on the user key it is already partitioned
    * by.
    */
  def q45Retention(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.load(spark, dir, "events")
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
      // consumed by the cohort aggregate AND the join back — materialize
      // the (user, week) frame so the scan+distinct runs once
      .transform(graft.runtime.Materialize.once)
    val cohort = activity.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    activity.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val q45Oracle: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      |  FROM events),
      |c AS (
      |  SELECT user_id, min(week) AS cohort_week FROM a GROUP BY user_id)
      |SELECT c.cohort_week,
      |  CAST(date_diff('day', c.cohort_week, a.week) / 7 AS INT) AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM a JOIN c ON a.user_id = c.user_id
      |GROUP BY c.cohort_week, week_offset""".stripMargin

  /** As-of join: each purchase picks up the user's LATEST view at or
    * before it (point-in-time attribution). The engine side is the
    * union-scan window shape (one shuffle on user, linear work); the
    * oracle is DuckDB's native ASOF LEFT JOIN — two completely
    * different algorithms that must produce identical rows.
    */
  def q48AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // payload = the view timestamp itself, so even if two views tied on
    // (user, ts) the carried value would be identical — deterministic
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("ts").as("view_ts"))
    graft.operators.AsOf.asofJoin(
        purchases, views, keys = Seq("user_id"), leftTs = "ts", rightTs = "ts")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("view_ts_asof"),
        col("view_ts_asof").isNotNull.cast("int").as("had_view"))
  }

  val q48Oracle: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |  WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts FROM events
      |  WHERE event_type = 'view')
      |SELECT p.event_id, p.user_id, p.ts, v.vts AS view_ts_asof,
      |  CAST(CASE WHEN v.vts IS NOT NULL THEN 1 ELSE 0 END AS INT) AS had_view
      |FROM p ASOF LEFT JOIN v
      |  ON p.user_id = v.user_id AND v.vts <= p.ts""".stripMargin

  /** Range join: assign every event to the session interval containing
    * it. Sessions come from the q32 sessionizer, so by construction
    * each event lands in exactly one [started_at, ended_at] interval of
    * its user — the query re-derives that assignment through the
    * bucket-explode equi-join and the oracle through a plain inequality
    * join, so the range-join machinery is verified against an identity
    * the sessionizer guarantees.
    */
  def q49RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val points = e.select(col("user_id"), col("event_id"), col("ts"))
    val intervals = Sessionize.sessionStats(e, gapSec = 1800)
      .select(col("user_id"), col("session_seq"),
        col("started_at"), col("ended_at"))
      // referenced once, but sessionStats is two windows over the full
      // stream — materialize the small interval frame
      .transform(graft.runtime.Materialize.once)
    graft.operators.RangeJoin.pointInInterval(
        points, intervals, keys = Seq("user_id"), tCol = "ts",
        startCol = "started_at", endCol = "ended_at",
        bucketSeconds = 1800)
      .select(col("user_id"), col("event_id"), col("session_seq"))
  }

  val q49Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS opens
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM marked),
      |iv AS (
      |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |    min(ts) AS started_at, max(ts) AS ended_at
      |  FROM sess GROUP BY user_id, session_seq)
      |SELECT e.user_id, e.event_id, iv.session_seq
      |FROM e JOIN iv ON e.user_id = iv.user_id
      |  AND e.ts >= iv.started_at AND e.ts <= iv.ended_at""".stripMargin

  /** Pivot: per-user event-type activity matrix (the relational
    * pivot/crosstab operator). An explicit value list keeps the plan a
    * single-pass pivot aggregate — omitting it adds a distinct-values
    * collect job before the real one. The oracle is the conditional-
    * aggregation expansion, which is exactly what PivotFirst compiles
    * to underneath.
    */
  def q50Pivot(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("user_id"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .count()
      // scoped fill: an unscoped na.fill(0) would also rewrite a null
      // user_id GROUPING KEY to 0, corrupting that group
      .na.fill(0L, Seq("view", "click", "purchase", "signup", "error"))
      .select(
        col("user_id"),
        col("view").as("n_view"), col("click").as("n_click"),
        col("purchase").as("n_purchase"), col("signup").as("n_signup"),
        col("error").as("n_error"))
  }

  val q50Oracle: String =
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
      |FROM events GROUP BY user_id""".stripMargin

  /** q137 — CUSUM changepoint detection over daily event volume: the
    * monitoring primitive that catches a sustained level shift a
    * per-day z-score (q68) misses, because small same-signed deviations
    * ACCUMULATE. Per event type, daily value totals in integer cents;
    * the per-type mean daily total is the target; the classic recursive
    * chart S_t = max(0, S_{t-1} + (x_t − target)) is rewritten as the
    * window-expressible identity S_t = C_t − min(0, min_{j≤t} C_j)
    * (C = prefix sum of deltas, C_0 = 0) — a cumulative sum plus a
    * running min, so the recursion never leaves Catalyst. The downward
    * chart is the same identity on negated deltas. A day is flagged
    * when either chart exceeds 20% of the target.
    *
    * Scale shape: one day-level aggregate (the only data-sized
    * shuffle), then both window chains ride ONE sort partitioned by
    * event_type; the per-type target joins back broadcast
    * (type-cardinality rows). All-integer cents, so both engines agree
    * bit-for-bit.
    */
  def q137Cusum(spark: SparkSession, dir: String): DataFrame =
    cusumCharts(dailyVolume(Tables.load(spark, dir, "events")))

  /** Daily value totals per event type, in integer cents — the
    * day-level aggregate both the batch chart (q137) and the streaming
    * monitor ([[graft.streaming.Streaming.changepointSink]]) maintain.
    */
  def dailyVolume(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 100) as long)").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("day_cents"))

  /** Both CUSUM charts + shift flags from a (event_type, day,
    * day_cents) frame. Day-cardinality input, so this is cheap enough
    * to recompute from the stored aggregate on every refresh — which
    * is also the only correct cadence: the target (per-type mean)
    * shifts with every new day, so the charts are a function of the
    * WHOLE daily history, not foldable into per-day state.
    */
  def cusumCharts(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val target = daily.groupBy(col("event_type"))
      .agg(expr("sum(day_cents) div count(*)").as("target"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(target), Seq("event_type"))
      .withColumn("c_pos", sum(col("day_cents") - col("target")).over(w))
      .withColumn("c_neg", sum(col("target") - col("day_cents")).over(w))
      .select(col("event_type"), col("day"), col("day_cents"),
        (col("c_pos") - least(lit(0L), min(col("c_pos")).over(w)))
          .as("cusum_pos"),
        (col("c_neg") - least(lit(0L), min(col("c_neg")).over(w)))
          .as("cusum_neg"),
        col("target"))
      .withColumn("shifted",
        when(col("cusum_pos") * 5 > col("target") ||
          col("cusum_neg") * 5 > col("target"), 1).otherwise(0))
  }

  val q137Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
      |t AS (
      |  SELECT event_type,
      |    CAST(sum(day_cents) // count(*) AS BIGINT) AS target
      |  FROM daily GROUP BY event_type),
      |c AS (
      |  SELECT d.event_type, d.day, d.day_cents, t.target,
      |    sum(d.day_cents - t.target) OVER w AS c_pos,
      |    sum(t.target - d.day_cents) OVER w AS c_neg
      |  FROM daily d JOIN t ON t.event_type = d.event_type
      |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
      |               ROWS UNBOUNDED PRECEDING)),
      |s AS (
      |  SELECT event_type, day, day_cents, target,
      |    c_pos - least(0, min(c_pos) OVER w) AS cusum_pos,
      |    c_neg - least(0, min(c_neg) OVER w) AS cusum_neg
      |  FROM c
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS UNBOUNDED PRECEDING))
      |SELECT event_type, day, day_cents,
      |  CAST(cusum_pos AS BIGINT) AS cusum_pos,
      |  CAST(cusum_neg AS BIGINT) AS cusum_neg, target,
      |  CASE WHEN cusum_pos * 5 > target OR cusum_neg * 5 > target
      |       THEN 1 ELSE 0 END AS shifted
      |FROM s""".stripMargin

  /** q145 — gaps-and-islands run collapse (Tabibitosan): consecutive
    * same-type events per user collapse into runs via the
    * two-row_number difference (global seq − per-type seq is constant
    * within a run), the standard SQL islands idiom — here surfacing
    * repeated-action bursts (≥3 of the same event back to back), the
    * event-stream analogue of q43's text repetition profile and the
    * shape bot/retry detection reads.
    *
    * Scale shape: both row_numbers and the rollup ride ONE shuffle
    * keyed by user_id; runs are emitted per (user, island), never
    * globally ordered. Event ties broken by event_id for a total,
    * engine-agreed order.
    */
  def q145EventRuns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("island",
        row_number().over(byUser) - row_number().over(byUserType))
      .groupBy(col("user_id"), col("event_type"), col("island"))
      .agg(count(lit(1)).as("run_len"),
        min(col("ts")).as("run_start"), max(col("ts")).as("run_end"))
      .filter(col("run_len") >= 3)
      .select(col("user_id"), col("event_type"), col("run_len"),
        col("run_start"), col("run_end"))
  }

  val q145Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      |  FROM events),
      |i AS (
      |  SELECT user_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id)
      |    - row_number() OVER (PARTITION BY user_id, event_type
      |                         ORDER BY ts, event_id) AS island
      |  FROM e)
      |SELECT user_id, event_type,
      |  CAST(count(*) AS BIGINT) AS run_len,
      |  min(ts) AS run_start, max(ts) AS run_end
      |FROM i GROUP BY user_id, event_type, island
      |HAVING count(*) >= 3""".stripMargin

  /** q146 — association mining over session baskets: support and lift
    * of event-type PAIRS co-occurring in a session (the q32 gap
    * sessions as baskets) — the "users who do A in a session also do
    * B" table, the 2-itemset core of market-basket analysis. Lift as
    * integer ppm: lift = P(ab)/(P(a)P(b)) =
    * n_pair·n_sessions / (n_a·n_b) — ppm-scaled, no floats (the
    * products fit i64 through sf=1 session counts; past ~10⁸ sessions
    * the ratio moves to decimal(38) — noted, not needed here).
    *
    * Scale shape: basket membership is one distinct over (session,
    * item); the pair join is keyed on the session with fanout bounded
    * by distinct items per session (≤ the event-type cardinality, NOT
    * events); singleton supports and the session count broadcast back
    * at item-cardinality size.
    */
  def q146AssocPairs(spark: SparkSession, dir: String): DataFrame = {
    val sess = Sessionize
      .withSessionIds(Tables.load(spark, dir, "events"))
      .select(col("user_id"), col("session_seq"), col("event_type"))
      .distinct()
      // consumed by the census, the scalar count, and both join sides
      .transform(graft.runtime.Materialize.once)
    val nSessions = sess.select(col("user_id"), col("session_seq"))
      .distinct().agg(count(lit(1)).as("n_sessions"))
    val items = sess.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_item"))
    sess.as("a")
      .join(sess.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_seq") === col("b.session_seq") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 20)
      .join(broadcast(items.select(col("event_type").as("t1"),
        col("n_item").as("n1"))), Seq("t1"))
      .join(broadcast(items.select(col("event_type").as("t2"),
        col("n_item").as("n2"))), Seq("t2"))
      .crossJoin(broadcast(nSessions))
      .select(col("t1"), col("t2"), col("n_pair"), col("n1"), col("n2"),
        expr("(n_pair * 1000000L) div n_sessions").as("support_ppm"),
        expr("(n_pair * n_sessions * 1000000L) div (n1 * n2)")
          .as("lift_ppm"))
  }

  val q146Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS opens
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT DISTINCT user_id,
      |    sum(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS session_seq,
      |    event_type
      |  FROM marked),
      |ns AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM (
      |    SELECT DISTINCT user_id, session_seq FROM sess)),
      |items AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_item
      |  FROM sess GROUP BY event_type),
      |pairs AS (
      |  SELECT a.event_type AS t1, b.event_type AS t2,
      |    CAST(count(*) AS BIGINT) AS n_pair
      |  FROM sess a
      |  JOIN sess b ON a.user_id = b.user_id
      |    AND a.session_seq = b.session_seq
      |    AND a.event_type < b.event_type
      |  GROUP BY a.event_type, b.event_type
      |  HAVING count(*) >= 20)
      |SELECT p.t1, p.t2, p.n_pair, x.n_item AS n1, y.n_item AS n2,
      |  (p.n_pair * 1000000) // ns.n_sessions AS support_ppm,
      |  (p.n_pair * ns.n_sessions * 1000000) // (x.n_item * y.n_item)
      |    AS lift_ppm
      |FROM pairs p
      |JOIN items x ON x.event_type = p.t1
      |JOIN items y ON y.event_type = p.t2, ns""".stripMargin

  /** q147 — first/last-touch attribution: every purchase is credited
    * to the FIRST and the LAST view by the same user in the preceding
    * 7 days — the two canonical marketing-attribution models, computed
    * WITHOUT a self-join: a conditional struct min/max over an
    * event-time RANGE frame (7 days preceding) picks the views while
    * scanning the ordered event stream once. Purchases with no view in
    * the window keep NULL attribution — the miss audit rides along.
    *
    * Scale shape: one shuffle keyed by user_id; both attribution
    * models and the filter ride that sort. The range frame bounds the
    * state the window operator holds to 7 days of one user's events.
    * (ts, event_id) struct ordering makes tie-breaks total in both
    * engines.
    */
  def q147Attribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val SevenDaysUs = 7L * 86400L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-SevenDaysUs, 0)
    val viewStruct = when(col("event_type") === "view",
      struct(col("ts"), col("event_id")))
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("first_view", min(viewStruct).over(w))
      .withColumn("last_view", max(viewStruct).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"),
        col("first_view.ts").as("first_view_ts"),
        col("first_view.event_id").as("first_view_id"),
        col("last_view.ts").as("last_view_ts"),
        col("last_view.event_id").as("last_view_id"),
        expr("(us - unix_micros(last_view.ts)) div 1000000L")
          .as("lag_seconds"))
  }

  val q147Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |a AS (
      |  SELECT user_id, event_type, ts, event_id, us,
      |    min(CASE WHEN event_type = 'view'
      |             THEN {'ts': ts, 'event_id': event_id} END)
      |      OVER w AS first_view,
      |    max(CASE WHEN event_type = 'view'
      |             THEN {'ts': ts, 'event_id': event_id} END)
      |      OVER w AS last_view
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us
      |               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
      |  first_view.ts AS first_view_ts,
      |  first_view.event_id AS first_view_id,
      |  last_view.ts AS last_view_ts,
      |  last_view.event_id AS last_view_id,
      |  (us - epoch_us(last_view.ts)) // 1000000 AS lag_seconds
      |FROM a WHERE event_type = 'purchase'""".stripMargin

  /** q153 — RFM segmentation: the classic customer scoring — Recency
    * (days since last purchase, relative to the corpus max day so the
    * query is reproducible), Frequency (purchase count), Monetary
    * (integer-cents spend) — each quartiled into 1–4 codes via ntile
    * over a deterministic (metric, user_id) order, concatenated into
    * the 'rfm' segment label ("444" = best). The segmentation every
    * lifecycle-marketing table starts from; also the template for any
    * multi-metric quantile coding.
    *
    * Scale shape: one per-user aggregate (the only event-scale
    * shuffle), then three ntile windows over the USER-sized frame.
    * ntile needs a total order — user_id tiebreaks make codes stable
    * across engines and runs.
    */
  def q153Rfm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(expr("cast(round(value * 100) as long)")).as("monetary_cents"))
    val anchor = p.agg(max(col("last_day")).as("anchor_day"))
    p.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("anchor_day"), col("last_day")).cast("long"))
      .withColumn("r_code", ntile(4).over(
        Window.orderBy(col("recency_days").desc, col("user_id"))))
      .withColumn("f_code", ntile(4).over(
        Window.orderBy(col("frequency"), col("user_id"))))
      .withColumn("m_code", ntile(4).over(
        Window.orderBy(col("monetary_cents"), col("user_id"))))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        concat(col("r_code"), col("f_code"), col("m_code")).as("rfm"))
  }

  val q153Oracle: String =
    """WITH p AS (
      |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
      |    CAST(count(*) AS BIGINT) AS frequency,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS monetary_cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |a AS (SELECT max(last_day) AS anchor_day FROM p)
      |SELECT user_id,
      |  CAST(date_diff('day', last_day, anchor_day) AS BIGINT)
      |    AS recency_days,
      |  frequency, monetary_cents,
      |  CAST(ntile(4) OVER (ORDER BY date_diff('day', last_day, anchor_day)
      |      DESC, user_id) AS STRING)
      |  || CAST(ntile(4) OVER (ORDER BY frequency, user_id) AS STRING)
      |  || CAST(ntile(4) OVER (ORDER BY monetary_cents, user_id) AS STRING)
      |    AS rfm
      |FROM p, a""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_sessionize" -> (q32Sessionize _),
    "q44_funnel" -> (q44Funnel _),
    "q45_retention" -> (q45Retention _),
    "q48_asof_join" -> (q48AsofJoin _),
    "q49_range_join" -> (q49RangeJoin _),
    "q50_pivot" -> (q50Pivot _),
    "q137_cusum" -> (q137Cusum _),
    "q145_event_runs" -> (q145EventRuns _),
    "q146_assoc_pairs" -> (q146AssocPairs _),
    "q153_rfm" -> (q153Rfm _),
    "q147_attribution" -> (q147Attribution _))

  val oracles: Map[String, String] = Map(
    "q32_sessionize" -> q32Oracle,
    "q44_funnel" -> q44Oracle,
    "q45_retention" -> q45Oracle,
    "q48_asof_join" -> q48Oracle,
    "q49_range_join" -> q49Oracle,
    "q50_pivot" -> q50Oracle,
    "q137_cusum" -> q137Oracle,
    "q145_event_runs" -> q145Oracle,
    "q146_assoc_pairs" -> q146Oracle,
    "q153_rfm" -> q153Oracle,
    "q147_attribution" -> q147Oracle)
}
