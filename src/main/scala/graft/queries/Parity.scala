package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.runtime.Tables

/** Parity-tier queries: one entry per operator family from SURVEY.md §2,
  * re-expressed over the driver's TPC-H-ish testdata so each has a DuckDB
  * oracle twin. Reference sites cited per query.
  *
  * Determinism rules (so Spark and DuckDB hash-match bit-for-bit):
  *  - SUM over a non-integral double column goes through decimal(18,2)
  *    (exact, order-independent); cast back to double only at the end.
  *  - Window ORDER BY always includes a unique tiebreak column.
  *  - printf-style rendering sticks to %d/%s plus %.2f over 2-decimal
  *    doubles (never representable at an exact rounding half).
  *  - Timestamps truncate to micros on both sides (see Tables.loadEvents).
  */
object Parity {

  /** A1 — hash aggregate, multi-sum + count (process_covid_ods.py:61-69). */
  def q01Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n_rows"))
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** W1+F4+F14 — LAG day-over-day delta wrapped in GREATEST(COALESCE(Δ,0),0)
    * (process_covid_data_mart.py:67-79). Decimal arithmetic end-to-end so
    * the window output is exact; unique `o_orderkey` tiebreak keeps LAG
    * deterministic. Scale note: one shuffle on o_custkey, nothing else.
    */
  def q02LagDelta(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val price = col("o_totalprice").cast("decimal(18,2)")
    o.select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        greatest(
          coalesce(price - lag(price, 1).over(w), lit(0).cast("decimal(19,2)")),
          lit(0).cast("decimal(19,2)"))
          .cast("double").as("delta_price"))
  }

  val q02Oracle: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  CAST(GREATEST(COALESCE(
      |    CAST(o_totalprice AS DECIMAL(18,2)) -
      |      LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    0), 0) AS DOUBLE) AS delta_price
      |FROM orders""".stripMargin

  /** J2+A1 — broadcast inner equi-join fact↔dim then hash aggregate
    * (process_covid_data_mart.py:60-61). `part` is the small dim →
    * explicit broadcast: at 100 TB the lineitem side never shuffles for
    * the join; only the final groupBy exchanges on p_brand.
    */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    val revenue = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q03Oracle: String =
    """SELECT p_brand,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  /** J1+J4+P5 — LEFT equi-join on a compound key with join-miss audit
    * (process_covid_dds.py:60-77): per-(user, event_type) activity joined
    * to a filtered dim; misses surface as nulls → coalesce + boolean flag.
    */
  def q04LeftJoinCompound(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val fact = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val dim = ev.filter(col("value") > 90)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("hi_cnt"))
    fact.join(broadcast(dim), Seq("user_id", "event_type"), "left")
      .select(
        col("user_id"), col("event_type"), col("cnt"),
        coalesce(col("hi_cnt"), lit(0L)).as("hi_cnt"),
        col("hi_cnt").isNull.as("missing_in_dim"))
  }

  val q04Oracle: String =
    """WITH fact AS (
      |  SELECT user_id, event_type, count(*) AS cnt
      |  FROM events GROUP BY user_id, event_type),
      |dim AS (
      |  SELECT user_id, event_type, count(*) AS hi_cnt
      |  FROM events WHERE value > 90 GROUP BY user_id, event_type)
      |SELECT f.user_id, f.event_type, f.cnt,
      |  COALESCE(d.hi_cnt, 0) AS hi_cnt,
      |  d.hi_cnt IS NULL AS missing_in_dim
      |FROM fact f LEFT JOIN dim d
      |  ON f.user_id = d.user_id AND f.event_type = d.event_type""".stripMargin

  /** J3 — correlated NOT EXISTS dedup as a left_anti join
    * (alert_case_spike.sql:57-63): parts with no shipment before
    * 1995-07-01 (non-empty at every SF, unlike customers-with-no-orders).
    */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1995-07-01").cast("timestamp"))
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
  }

  val q05Oracle: String =
    """SELECT p_partkey, p_name, p_brand
      |FROM part
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey
      |    AND l_shipdate < TIMESTAMP '1995-07-01')""".stripMargin

  /** F2 — CASE WHEN risk bucketing (process_covid_data_mart.py:106-111). */
  def q06CaseBucket(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    c.withColumn("balance_tier",
        when(col("c_acctbal") > 5000, "Premium")
          .when(col("c_acctbal") > 1000, "Standard")
          .when(col("c_acctbal") > 0, "Basic")
          .otherwise("Delinquent"))
      .groupBy(col("balance_tier"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_balance"))
  }

  val q06Oracle: String =
    """SELECT CASE WHEN c_acctbal > 5000 THEN 'Premium'
      |            WHEN c_acctbal > 1000 THEN 'Standard'
      |            WHEN c_acctbal > 0 THEN 'Basic'
      |            ELSE 'Delinquent' END AS balance_tier,
      |  count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
      |FROM customer
      |GROUP BY 1""".stripMargin

  /** F10+F16 — deterministic sha-256 surrogate key over
    * upper(trim(name)) || discriminator (process_covid_dds.py:35).
    */
  def q07Surrogate(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(spark, dir, "nation")
    n.select(
      col("n_name"),
      graft.functions.Exprs.surrogateKey(col("n_name"), col("n_nationkey"))
        .as("location_key"))
  }

  val q07Oracle: String =
    """SELECT n_name,
      |  sha256(upper(trim(n_name)) || CAST(n_nationkey AS VARCHAR)) AS location_key
      |FROM nation""".stripMargin

  /** F6 — regexp_extract over a semi-structured string column
    * (process_covid_ods.py:32-35 derives report_date the same way).
    */
  def q08Regexp(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(
        col("event_type"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
  }

  val q08Oracle: String =
    """SELECT event_type,
      |  CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type""".stripMargin

  /** F5+F4 — multi-format timestamp parsing via
    * coalesce(try_to_timestamp(fmt1), try_to_timestamp(fmt2))
    * (process_covid_raw.py:47-51). Even event_ids render minute-granular
    * US format, odd ids second-granular ISO; the coalesce chain recovers
    * both. The oracle expresses the identical result as date_trunc.
    */
  def q09MultiTs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val raw = when(col("event_id") % 2 === 0,
        date_format(col("ts"), "MM/dd/yyyy HH:mm"))
      .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
    ev.select(
      col("event_id"),
      coalesce(
        try_to_timestamp(raw, lit("MM/dd/yyyy HH:mm")),
        try_to_timestamp(raw, lit("yyyy-MM-dd HH:mm:ss"))).as("parsed_ts"))
  }

  val q09Oracle: String =
    """SELECT event_id,
      |  CASE WHEN event_id % 2 = 0
      |       THEN date_trunc('minute', CAST(ts AS TIMESTAMP))
      |       ELSE date_trunc('second', CAST(ts AS TIMESTAMP)) END AS parsed_ts
      |FROM events""".stripMargin

  /** A2 — distinct() dedup (process_covid_dds.py:39). */
  def q10Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()

  val q10Oracle: String =
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"

  /** F15 — printf-style message rendering (alert_case_spike.sql:15-19). */
  def q11FormatString(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.select(
      col("o_orderkey"),
      format_string("order %d [%s] priority=%s total=%.2f",
        col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice")).as("msg"))
  }

  val q11Oracle: String =
    """SELECT o_orderkey,
      |  printf('order %d [%s] priority=%s total=%.2f',
      |         o_orderkey, o_orderstatus, o_orderpriority, o_totalprice) AS msg
      |FROM orders""".stripMargin

  /** F3+F12+F13 — guarded division + ROUND
    * (process_covid_data_mart.py:85-88): per-nation account stats.
    */
  def q12GuardedDiv(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    c.groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).as("sum_bal"),
        sum(when(col("c_acctbal") > 0, 1L).otherwise(0L)).as("n_positive"))
      .select(
        col("c_nationkey"), col("n_customers"),
        col("sum_bal").cast("double").as("total_balance"),
        // round at SCALE 0 after scaling by 100: the .5 boundary is
        // exactly representable there, so Spark's shortest-repr rounding
        // and DuckDB's binary rounding agree — round(x, 2) does NOT
        // (4201.315 repr rounds up, its binary value rounds down)
        when(col("n_customers") > 0,
          round(col("sum_bal").cast("double") / col("n_customers") * 100) / 100)
          .otherwise(lit(0.0)).as("avg_balance"),
        (round(col("n_positive").cast("double") / col("n_customers") * 100 * 100) / 100)
          .as("positive_pct"))
  }

  val q12Oracle: String =
    """SELECT c_nationkey, count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
      |  CASE WHEN count(*) > 0
      |       THEN round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |                  / count(*) * 100) / 100
      |       ELSE 0.0 END AS avg_balance,
      |  round(CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / count(*) * 100 * 100) / 100 AS positive_pct
      |FROM customer
      |GROUP BY c_nationkey""".stripMargin

  /** P4+P5 — partition-style pruning filter + null guard reaching the
    * parquet scan (process_covid_dds.py:49, process_covid_data_mart.py:114).
    * `.explain` shows PushedFilters on l_shipdate/l_returnflag.
    */
  def q13FilterPushdown(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_returnflag") === "R" && col("l_quantity").isNotNull)
      .groupBy(month(col("l_shipdate")).as("ship_month"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
  }

  val q13Oracle: String =
    """SELECT month(l_shipdate) AS ship_month,
      |  sum(l_quantity) AS sum_qty, count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_returnflag = 'R' AND l_quantity IS NOT NULL
      |GROUP BY month(l_shipdate)""".stripMargin

  /** O3 — the flagship 3-CTE mart analytics query
    * (process_covid_data_mart.py:50-115) re-expressed over testdata and
    * executed through spark.sql (the SSQL path §3.2): join → rollup →
    * LAG delta → CASE bucket. The same SQL text runs on DuckDB.
    */
  val q14Sql: String =
    """WITH fact AS (
      |  SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS order_date,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_total,
      |    count(*) AS n_orders
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, CAST(o_orderdate AS DATE)),
      |deltas AS (
      |  SELECT nation, order_date, day_total, n_orders,
      |    GREATEST(COALESCE(day_total - LAG(day_total) OVER
      |      (PARTITION BY nation ORDER BY order_date), 0), 0) AS delta_total
      |  FROM fact)
      |SELECT nation, order_date, CAST(day_total AS DOUBLE) AS day_total,
      |  n_orders, CAST(delta_total AS DOUBLE) AS delta_total,
      |  CASE WHEN day_total > 60000 THEN 'Critical'
      |       WHEN day_total > 30000 THEN 'High'
      |       WHEN day_total > 10000 THEN 'Medium'
      |       ELSE 'Low' END AS activity_tier
      |FROM deltas""".stripMargin

  def q14CteFlagship(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q14Sql)
  }

  val q14Oracle: String = q14Sql

  /** W2+P6+J3+F15 composite — the alert pipeline shape (§3.3): shared
    * windowed base → two threshold rules → UNION ALL → NOT EXISTS dedup
    * against an exclusion set, all in one engine. The window is computed
    * once for both rules (vs the reference's four federated scans).
    */
  def q15AlertRules(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val daily = ev.groupBy(col("user_id"), col("ts").cast("date").as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val deltas = daily.withColumn("delta", col("total") - lag(col("total"), 1).over(w))
    // The two rule predicates are disjoint (delta can't be >50 and
    // <-50), so they fold into ONE filter+CASE pass — a union of two
    // filtered branches would re-execute the aggregate+window lineage
    // once per rule.
    val cand = deltas
      .filter(col("delta") > 50 || col("delta") < -50)
      .select(col("user_id"), col("d"),
        when(col("delta") > 50, "SPIKE").otherwise("DROP").as("rule"),
        when(col("delta") > 50, col("delta")).otherwise(-col("delta"))
          .cast("double").as("metric"))
    val exclusions = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
    cand.join(exclusions, Seq("user_id", "d"), "left_anti")
      .select(col("user_id"), col("d").as("alert_date"), col("rule"),
        col("metric"),
        format_string("user %d %s by %.2f", col("user_id"), col("rule"),
          col("metric")).as("msg"))
  }

  val q15Oracle: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |    sum(CAST(value AS DECIMAL(18,2))) AS total
      |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
      |deltas AS (
      |  SELECT user_id, d,
      |    total - LAG(total) OVER (PARTITION BY user_id ORDER BY d) AS delta
      |  FROM daily),
      |cand AS (
      |  SELECT user_id, d, 'SPIKE' AS rule, CAST(delta AS DOUBLE) AS metric
      |  FROM deltas WHERE delta > 50
      |  UNION ALL
      |  SELECT user_id, d, 'DROP' AS rule, CAST(-delta AS DOUBLE) AS metric
      |  FROM deltas WHERE delta < -50)
      |SELECT user_id, d AS alert_date, rule, metric,
      |  printf('user %d %s by %.2f', user_id, rule, metric) AS msg
      |FROM cand c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM events e
      |  WHERE e.user_id = c.user_id AND CAST(e.ts AS DATE) = c.d
      |    AND e.event_type = 'error')""".stripMargin

  /** All parity queries, keyed as they appear in SparkEntry. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (q01Agg _),
    "q02_lag_delta" -> (q02LagDelta _),
    "q03_join_agg" -> (q03JoinAgg _),
    "q04_left_join_compound" -> (q04LeftJoinCompound _),
    "q05_anti_join" -> (q05AntiJoin _),
    "q06_case_bucket" -> (q06CaseBucket _),
    "q07_surrogate" -> (q07Surrogate _),
    "q08_regexp" -> (q08Regexp _),
    "q09_multi_ts" -> (q09MultiTs _),
    "q10_distinct" -> (q10Distinct _),
    "q11_format_string" -> (q11FormatString _),
    "q12_guarded_div" -> (q12GuardedDiv _),
    "q13_filter_pushdown" -> (q13FilterPushdown _),
    "q14_cte_flagship" -> (q14CteFlagship _),
    "q15_alert_rules" -> (q15AlertRules _))

  val oracles: Map[String, String] = Map(
    "q01_agg" -> q01Oracle,
    "q02_lag_delta" -> q02Oracle,
    "q03_join_agg" -> q03Oracle,
    "q04_left_join_compound" -> q04Oracle,
    "q05_anti_join" -> q05Oracle,
    "q06_case_bucket" -> q06Oracle,
    "q07_surrogate" -> q07Oracle,
    "q08_regexp" -> q08Oracle,
    "q09_multi_ts" -> q09Oracle,
    "q10_distinct" -> q10Oracle,
    "q11_format_string" -> q11Oracle,
    "q12_guarded_div" -> q12Oracle,
    "q13_filter_pushdown" -> q13Oracle,
    "q14_cte_flagship" -> q14Oracle,
    "q15_alert_rules" -> q15Oracle)
}
