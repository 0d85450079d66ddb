package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.runtime.Tables

/** Round-4 relational operator tier: the classic warehouse operators a
  * user of the reference's Trino/Spark-SQL surface would reach for next
  * — TF-IDF vocabulary weighting, CUBE, set operations, semi joins,
  * the full ranking-window family, event-time tumbling windows,
  * skew-safe distinct aggregation, and edit-distance near-dup mining.
  * Every query is DuckDB-oracle-checked (hash match, not rows-only).
  */
object RelationalQueries {

  /** TF-IDF top-3 terms per source — the vocabulary-weighting composition
    * built on q39's document-frequency shape (here: source-frequency).
    * One token-keyed shuffle computes tf AND df (df via a count window
    * over the token partition — no self-join, no second scan); the
    * corpus-wide source count rides in as a broadcast 1-row aggregate
    * inside the same lazy plan.
    *
    * Cross-engine float discipline: the score is QUANTIZED to an int
    * (round(tf·ln(N/df)·1e4)) before ranking, so the rank — and the
    * whole output — is integer-deterministic; ln() differing by an ulp
    * between engines would need to land within 1e-12 of a rounding
    * boundary to flip anything.
    */
  def q51Tfidf(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val tf = d
      .select(col("source"), explode(TextAnalysis.wsTokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("token"))))
    val nSources = d.agg(countDistinct(col("source")).as("n_sources"))
    val scored = withDf
      .join(broadcast(nSources))
      .withColumn("score_q",
        round(col("tf").cast("double")
          * log(col("n_sources").cast("double") / col("df"))
          * lit(10000.0)).cast("long"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("score_q").desc, col("token"))))
      .filter(col("rk") <= 3)
      .select(col("source"), col("token"), col("tf"), col("df"),
        col("score_q"), col("rk"))
  }

  val q51Oracle: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |tf AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY source, token),
      |n AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
      |sc AS (
      |  SELECT source, token, tf,
      |    CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df
      |  FROM tf),
      |scored AS (
      |  SELECT source, token, tf, df,
      |    CAST(round(CAST(tf AS DOUBLE)
      |      * ln(CAST(n_sources AS DOUBLE) / df) * 10000.0) AS BIGINT) AS score_q
      |  FROM sc, n)
      |SELECT source, token, tf, df, score_q, rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY source
      |    ORDER BY score_q DESC, token) AS rk
      |  FROM scored)
      |WHERE rk <= 3""".stripMargin

  /** CUBE over (source, lang): all four grouping levels — cell, per-
    * source, per-lang, grand total — from one Expand + one aggregate
    * shuffle (q38's ROLLUP sibling; CUBE adds the per-lang axis a
    * rollup can't produce). grouping_id disambiguates real NULL keys
    * from subtotal rows exactly as in q38.
    */
  def q52Cube(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"), col("lang"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("n_tokens"))
    d.cube(col("source"), col("lang"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  val q52Oracle: String =
    """SELECT source, lang,
      |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS INT) AS gid,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY CUBE (source, lang)""".stripMargin

  /** Set operations: INTERSECT / EXCEPT cohort split of event users
    * (viewers ∩ purchasers, viewers ∖ purchasers, purchasers ∖
    * viewers), tagged and unioned. Catalyst plans INTERSECT/EXCEPT as
    * left-semi/left-anti aggregates on the hashed key — same scale
    * shape as an equi-join, no sort. The distinct'd inputs each feed
    * two branches, so they are materialized once.
    */
  def q53SetOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    def users(t: String): DataFrame =
      e.filter(col("event_type") === t).select(col("user_id")).distinct()
        .transform(graft.runtime.Materialize.once)
    val v = users("view")
    val p = users("purchase")
    v.intersect(p).withColumn("cohort", lit("both"))
      .unionByName(v.except(p).withColumn("cohort", lit("view_only")))
      .unionByName(p.except(v).withColumn("cohort", lit("purchase_only")))
      .select(col("cohort"), col("user_id"))
  }

  val q53Oracle: String =
    """WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT 'both' AS cohort, user_id
      |FROM (SELECT user_id FROM v INTERSECT SELECT user_id FROM p)
      |UNION ALL
      |SELECT 'view_only', user_id
      |FROM (SELECT user_id FROM v EXCEPT SELECT user_id FROM p)
      |UNION ALL
      |SELECT 'purchase_only', user_id
      |FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM v)""".stripMargin

  /** Left-semi join: customers holding at least one high-value order
    * (EXISTS semantics — J3's anti-join mirror). The order-side filter
    * is pushed to the parquet scan; the semi join never duplicates or
    * carries the probe side's payload, and the filtered build side
    * broadcasts.
    */
  def q54SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val q54Oracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""".stripMargin

  /** The ranking-window family in one pass: ntile quartiles,
    * percent_rank, cume_dist, lead, and first-of-partition share ONE
    * window spec — Catalyst evaluates all five in a single WindowExec
    * (one shuffle on source, one sort). The ordering carries a unique
    * doc_id tiebreak so every rank function is total; percent_rank and
    * cume_dist are exact IEEE rational divisions both engines compute
    * identically.
    */
  def q55WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    d.select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("next_chars", lead(col("n_chars"), 1).over(w))
      .withColumn("shortest_doc", first(col("doc_id")).over(w))
  }

  val q55Oracle: String =
    """SELECT source, doc_id, n_chars,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  lead(n_chars, 1) OVER w AS next_chars,
      |  first_value(doc_id) OVER w AS shortest_doc
      |FROM documents
      |WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)""".stripMargin

  /** Event-time tumbling windows: Spark's `window()` bucketing (the
    * batch form of the Structured Streaming windowed aggregate) at 1
    * hour, per event type. Epoch-aligned 1-hour windows coincide with
    * date_trunc('hour'), which is exactly how the oracle replays them.
    * The double `value` is quantized per row to cents BEFORE summing —
    * integer sums are associative, so the result is partition-layout-
    * proof on both engines.
    */
  def q56TimeWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("value_cents"))
  }

  val q56Oracle: String =
    """SELECT
      |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |  date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
      |  event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** Skew-safe distinct aggregation: exact per-type distinct-user
    * counts via the two-phase rewrite ([[graft.operators.Skew
    * .twoPhaseDistinct]]). event_type has 5 hot values — a direct
    * count(DISTINCT) shuffles every row to 5 tasks; phase 1 here
    * shuffles on the composite (event_type, user_id) key, spreading
    * each hot type across the whole cluster, and phase 2 reduces 5
    * tiny pre-aggregated groups.
    */
  def q58SkewDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.twoPhaseDistinct(
      Tables.load(spark, dir, "events"), "event_type", "user_id")

  val q58Oracle: String =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
      |  CAST(count(*) AS BIGINT) AS n_rows
      |FROM events GROUP BY event_type""".stripMargin

  /** Edit-distance near-dup mining: block on the first-2-token prefix
    * key (q20's blocking key), pair within blocks (id1 < id2 — never an
    * all-pairs product), keep pairs whose Levenshtein distance is ≤ 20%
    * of the longer text. The integer form `5·dist ≤ max(len)` avoids
    * float thresholds entirely; the length-difference prune
    * `5·|l1−l2| ≤ max(len)` is implied by it (dist ≥ |l1−l2|), so it
    * discards doomed pairs BEFORE the O(n·m) distance computation
    * without changing the result.
    */
  def q59EditDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        TextAnalysis.prefixKey(col("text")).as("prefix_key"))
    val a = d.select(col("prefix_key"), col("doc_id").as("id1"),
      col("text").as("t1"), col("len").as("l1"))
    val b = d.select(col("prefix_key"), col("doc_id").as("id2"),
      col("text").as("t2"), col("len").as("l2"))
    val scored = a.join(b, Seq("prefix_key"))
      .filter(col("id1") < col("id2"))
      .filter(abs(col("l1") - col("l2")) * 5 <= greatest(col("l1"), col("l2")))
      // spread the DP stage across every core: the candidate frame is
      // only ~MBs (the testdata parquet is one split, and AQE would
      // keep a tiny join output on few tasks), so without an explicit
      // exchange the giga-cell distance work serializes
      .repartition(spark.sparkContext.defaultParallelism)
      // banded Levenshtein: the per-pair threshold floor(max/5) equals
      // the largest distance the final predicate can accept, so the
      // O(n·k) band is exact for every kept pair and all others
      // short-circuit to -1 instead of paying the full O(n·m) table
      .select(col("id1"), col("id2"), col("l1"), col("l2"),
        expr("levenshtein(t1, t2, CAST(floor(greatest(l1, l2) / 5) AS INT))")
          .as("dist"))
      // materialization barrier, not just lineage hygiene: without it
      // Catalyst pushes the dist predicates below the repartition into
      // the join's residual condition, evaluating the DP twice per pair
      // inside the (single-split) join task — verified via explain
      .transform(graft.runtime.Materialize.once)
    scored
      .filter(col("dist") >= 0 &&
        col("dist") * 5 <= greatest(col("l1"), col("l2")))
      .select(col("id1"), col("id2"), col("dist"))
  }

  // NB: DuckDB's levenshtein counts UTF-8 BYTE edits while Spark's
  // counts code points — identical on this all-ASCII corpus (verified
  // length(text) = strlen(text) for every row); a multi-byte corpus
  // would need an oracle-side code-point shim.
  val q59Oracle: String =
    s"""WITH k AS (
      |  SELECT doc_id, text, length(text) AS len,
      |    ${TextAnalysis.prefixKeySql}
      |      AS prefix_key
      |  FROM documents)
      |SELECT a.doc_id AS id1, b.doc_id AS id2,
      |  CAST(levenshtein(a.text, b.text) AS INT) AS dist
      |FROM k a JOIN k b ON a.prefix_key = b.prefix_key AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.text, b.text) * 5 <= greatest(a.len, b.len)""".stripMargin

  /** Rolling 7-day window per user over daily rollups — the RANGE-frame
    * window family (value-based bounds over an ordered axis), distinct
    * from the LAG/rank families already covered: with gap days in the
    * series, a ROWS frame would silently span more than 7 calendar
    * days, while the RANGE frame is anchored to the day axis itself.
    * Day index is an integer (epoch days) so both engines frame
    * identically; sums are cent-quantized as in q56. One shuffle: the
    * daily rollup and the window share the user key.
    */
  def q60RollingWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val daily = e
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        sum(round(col("value") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_events"))
      .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_day"))
      .rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("rolling_cents", sum(col("cents")).over(w))
      .withColumn("rolling_events", sum(col("n_events")).over(w))
      .select(col("user_id"), col("day"), col("cents"), col("n_events"),
        col("rolling_cents"), col("rolling_events"))
  }

  val q60Oracle: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |    CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS BIGINT)
      |      AS epoch_day
      |  FROM events GROUP BY 1, 2, 5)
      |SELECT user_id, day, cents, n_events,
      |  CAST(sum(cents) OVER w AS BIGINT) AS rolling_cents,
      |  CAST(sum(n_events) OVER w AS BIGINT) AS rolling_events
      |FROM daily
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_day
      |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /** GROUPING SETS ((source), (lang)) through the dedicated
    * Dataset.groupingSets API (Spark 4): exactly the two single-axis
    * reports in ONE Expand + aggregate — a shape neither ROLLUP (q38)
    * nor CUBE (q52) produces without also paying for the cell-level
    * grouping. grouping_id keys which axis each row belongs to.
    */
  def q61GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"), col("lang"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("n_tokens"))
    d.groupingSets(Seq(Seq(col("source")), Seq(col("lang"))),
        col("source"), col("lang"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  val q61Oracle: String =
    """SELECT source, lang,
      |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS INT) AS gid,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY GROUPING SETS ((source), (lang))""".stripMargin

  /** Semi-structured extraction: parse the events' JSON `props` payload
    * with a schema'd from_json (codegen'd Jackson parse, no UDF) and
    * aggregate the extracted field per event type. The parse is a
    * per-row projection — scan-bound, shuffle only for the 5-group
    * rollup; at 100 TB the same plan applies with the JSON column
    * pruned down to the single referenced path.
    */
  def q62JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.select(col("event_type"),
        from_json(col("props"), "k BIGINT",
          Map.empty[String, String]).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
  }

  val q62Oracle: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'k' AS BIGINT)) AS min_k,
      |  max(CAST(props->>'k' AS BIGINT)) AS max_k,
      |  CAST(count(DISTINCT CAST(props->>'k' AS BIGINT)) AS BIGINT) AS n_distinct_k
      |FROM events GROUP BY event_type""".stripMargin

  /** Ordered list aggregation: the 3 longest docs per source as a
    * comma-joined id string. collect_list is ORDER-NONDETERMINISTIC by
    * contract (partition arrival order), so the aggregate sorts the
    * collected array explicitly before joining — the only way a
    * distributed listagg is reproducible; the oracle's string_agg uses
    * the matching ORDER BY clause.
    */
  def q63StringAgg(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val top = d
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rk") <= 3)
    top.groupBy(col("source"))
      .agg(count(lit(1)).as("n_top"),
        sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("source"), col("n_top"),
        expr("array_join(transform(ids, x -> CAST(x AS STRING)), ',')")
          .as("top_ids"))
  }

  val q63Oracle: String =
    """WITH top AS (
      |  SELECT source, doc_id FROM (
      |    SELECT source, doc_id,
      |      row_number() OVER (PARTITION BY source
      |        ORDER BY n_chars DESC, doc_id) AS rk
      |    FROM documents)
      |  WHERE rk <= 3)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_top,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS top_ids
      |FROM top GROUP BY source""".stripMargin

  /** q148 — local-supplier volume (the TPC-H Q5 shape): revenue per
    * nation from 1996 ASIA orders where the supplier and the customer
    * share a nation — the canonical 6-table star-plus-selective-twist
    * join that exercises join ordering, broadcast selection, and a
    * non-key equality (c_nationkey = s_nationkey) on top of the key
    * chain. Revenue is exact integer units (price cents × discount
    * complement in percent): no floating sums cross the hash check.
    *
    * Scale shape: region→nation is a 5×25-row broadcast spine;
    * customer and supplier broadcast at sf-small but shuffle-join at
    * TB scale (Catalyst's size estimate flips it — nothing in the
    * query pins a side); the fact chain orders→lineitem co-shuffles on
    * the order key once. The 1996 predicate reaches the orders scan as
    * a pushed filter.
    */
  def q148LocalVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
      .filter(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val lineitem = Tables.load(spark, dir, "lineitem")
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(expr("cast(round(l_extendedprice * 100) as long) * " +
          "(100 - cast(round(l_discount * 100) as long))"))
          .as("revenue_u"),
        count(lit(1)).as("n_items"))
  }

  val q148Oracle: String =
    """SELECT n_name,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |    AS BIGINT) AS revenue_u,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1996-01-01'
      |  AND o_orderdate < DATE '1997-01-01'
      |GROUP BY n_name""".stripMargin

  /** q156 — Benford's-law first-digit screen over order totals: the
    * forensic data-quality test (Nigrini's fraud screen, Benford 1938)
    * — naturally-occurring multi-scale amounts follow
    * P(d) = log10(1 + 1/d); fabricated or truncated feeds don't. The
    * first significant digit is extracted lexically (no logarithm in
    * either engine), observed shares are integer ppm, expected shares
    * are the Benford constants as ppm literals, and the deviation is
    * the absolute ppm gap per digit plus its sum — flag when the total
    * gap exceeds 10%.
    *
    * Scale shape: one scan + a 9-row aggregate; the total-count scalar
    * broadcasts. Nothing else.
    */
  def q156Benford(spark: SparkSession, dir: String): DataFrame = {
    // round(log10(1 + 1/d) * 1e6) for d = 1..9 — fixed constants, so
    // no runtime logarithm can drift between engines
    val benfordPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val expected = benfordPpm.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, ${p}L)" }
      .mkString("VALUES ", ", ", " AS t(digit, expected_ppm)")
    val d = Tables.load(spark, dir, "orders")
      .select(expr(
        "cast(substring(cast(cast(round(o_totalprice * 100) as long) " +
          "as string), 1, 1) as int)").as("digit"))
      .filter(col("digit").between(1, 9))
    val counts = d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = d.agg(count(lit(1)).as("n_total"))
    counts.crossJoin(broadcast(total))
      .join(broadcast(spark.sql(s"SELECT * FROM ($expected)")),
        Seq("digit"))
      .withColumn("observed_ppm", expr("(n * 1000000L) div n_total"))
      .withColumn("gap_ppm",
        abs(col("observed_ppm") - col("expected_ppm")))
      .select(col("digit"), col("n"), col("observed_ppm"),
        col("expected_ppm"), col("gap_ppm"))
  }

  val q156Oracle: String = {
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L).zipWithIndex
      .map { case (p, i) => s"(${i + 1}, $p)" }.mkString(", ")
    s"""WITH d AS (
       |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
       |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM orders),
       |f AS (SELECT digit FROM d WHERE digit BETWEEN 1 AND 9),
       |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM f
       |      GROUP BY digit),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM f),
       |e(digit, expected_ppm) AS (VALUES $benford)
       |SELECT c.digit, c.n,
       |  (c.n * 1000000) // t.n_total AS observed_ppm,
       |  CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
       |  abs((c.n * 1000000) // t.n_total - e.expected_ppm) AS gap_ppm
       |FROM c JOIN e ON e.digit = c.digit, t""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_tfidf" -> (q51Tfidf _),
    "q52_cube" -> (q52Cube _),
    "q53_set_ops" -> (q53SetOps _),
    "q54_semi_join" -> (q54SemiJoin _),
    "q55_window_rank" -> (q55WindowRank _),
    "q56_time_window" -> (q56TimeWindow _),
    "q58_skew_distinct" -> (q58SkewDistinct _),
    "q59_edit_dedup" -> (q59EditDedup _),
    "q60_rolling_window" -> (q60RollingWindow _),
    "q61_grouping_sets" -> (q61GroupingSets _),
    "q62_json_extract" -> (q62JsonExtract _),
    "q63_string_agg" -> (q63StringAgg _),
    "q148_local_volume" -> (q148LocalVolume _),
    "q156_benford" -> (q156Benford _))

  val oracles: Map[String, String] = Map(
    "q51_tfidf" -> q51Oracle,
    "q52_cube" -> q52Oracle,
    "q53_set_ops" -> q53Oracle,
    "q54_semi_join" -> q54Oracle,
    "q55_window_rank" -> q55Oracle,
    "q56_time_window" -> q56Oracle,
    "q58_skew_distinct" -> q58Oracle,
    "q59_edit_dedup" -> q59Oracle,
    "q60_rolling_window" -> q60Oracle,
    "q61_grouping_sets" -> q61Oracle,
    "q62_json_extract" -> q62Oracle,
    "q63_string_agg" -> q63Oracle,
    "q148_local_volume" -> q148Oracle,
    "q156_benford" -> q156Oracle)
}
