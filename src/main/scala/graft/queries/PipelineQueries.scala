package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis._
import graft.runtime.{Materialize, Tables}

/** Round-5 extension tier — the remaining large-scale training-data
  * pipeline primitives: mergeable heavy-hitter sketches, deterministic
  * stratified sampling, reshaping (unpivot), distribution profiling,
  * windowed anomaly scoring, SCD2 dimension builds, and fixed-point
  * graph analytics. Same contract as every other tier: each query has
  * a DuckDB oracle; approximate/sketch outputs are validated through
  * their mathematical guarantees (invariant flags), exact columns
  * hash-match.
  */
object PipelineQueries {

  /** Heavy hitters: exact top-3 tokens per source (hash-checked), with
    * a Misra–Gries k=64 summary ([[graft.functions.MisraGriesAgg]])
    * validated through its guarantees: estimates never exceed the true
    * count and under-estimate by at most N/(k+1). At 100 TB the exact
    * branch is the one you drop — the MG sketch ships ≤64 counters per
    * source per map task instead of one row per distinct token.
    */
  def q64HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.MisraGriesAgg
    val k = 64
    val toks = Tables.load(spark, dir, "documents")
      .select(col("source"), explode_outer(wsTokens(col("text"))).as("token"))
      // three consumers below (exact counts, totals, sketch) — without
      // this the tokenize+explode lineage runs once per branch
      .transform(Materialize.once)
    val exact = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = exact
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("cnt").desc, col("token"))))
      .filter(col("rnk") <= 3)
    val totals = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"))
    val sketch = toks.groupBy(col("source"))
      .agg(MisraGriesAgg.udaf(k)(col("token")).as("summary"))
    val est = coalesce(try_element_at(col("summary"), col("token")), lit(0L))
    ranked.join(sketch, Seq("source")).join(totals, Seq("source"))
      .select(
        col("source"), col("rnk"), col("token"), col("cnt"),
        ((est <= col("cnt")) &&
          ((col("cnt") - est).cast("double")
            <= col("n_tokens").cast("double") / (k + 1)))
          .cast("int").as("sketch_ok"))
  }

  val q64Oracle: String =
    """WITH t AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |c AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
      |  FROM t GROUP BY source, token),
      |r AS (
      |  SELECT source, token, cnt,
      |    CAST(row_number() OVER (
      |      PARTITION BY source ORDER BY cnt DESC, token) AS INT) AS rnk
      |  FROM c)
      |SELECT source, rnk, token, cnt, 1 AS sketch_ok
      |FROM r WHERE rnk <= 3""".stripMargin

  /** Deterministic stratified sampling: a multiplicative (Lehmer-mix)
    * hash of the key picks a stable pseudo-random percentile per row,
    * and the keep-fraction varies by stratum (10% of `en` docs, 30% of
    * everything else). This is the scale-correct sampling shape — a
    * pure per-row filter (no shuffle, no state, fully pushdown-able),
    * reproducible across runs/engines because the "randomness" is
    * arithmetic on the key, unlike rand()-based TABLESAMPLE.
    */
  def q65StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val pct = (col("doc_id") * lit(48271L)) % lit(2147483647L) % lit(100)
    val frac = when(col("lang") === "en", lit(10)).otherwise(lit(30))
    d.filter(pct < frac)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).as("sum_chars"))
  }

  val q65Oracle: String =
    """SELECT source, lang,
      |  CAST(count(*) AS BIGINT) AS n_sampled,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE (doc_id * 48271) % 2147483647 % 100
      |      < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
      |GROUP BY source, lang""".stripMargin

  /** Unpivot (melt): wide per-source aggregate columns → long
    * (source, metric, value) rows via Dataset.unpivot — the reshaping
    * step feeding metric stores / plotting layers. The wide aggregate
    * is one shuffle; the unpivot itself is a per-row expand (no
    * shuffle, output = rows × metrics).
    */
  def q66Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .unpivot(
        ids = Array(col("source")),
        values = Array(col("n_docs"), col("sum_chars"), col("n_langs")),
        variableColumnName = "metric",
        valueColumnName = "value")
  }

  val q66Oracle: String =
    """WITH w AS (
      |  SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |  FROM documents GROUP BY source)
      |SELECT source, 'n_docs' AS metric, n_docs AS value FROM w
      |UNION ALL
      |SELECT source, 'sum_chars', sum_chars FROM w
      |UNION ALL
      |SELECT source, 'n_langs', n_langs FROM w""".stripMargin

  /** Fixed-width histogram profiling of document length: bucket =
    * n_chars div 100 clamped to a top bucket — a single hash aggregate
    * over ~20 buckets however large the corpus, the standard
    * distribution-profiling primitive before filtering rules are
    * chosen.
    */
  def q67Histogram(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(least(expr("n_chars div 100"), lit(19L)).as("bucket"),
        col("n_chars"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
  }

  val q67Oracle: String =
    """SELECT least(n_chars // 100, 19) AS bucket,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  min(n_chars) AS min_chars,
      |  max(n_chars) AS max_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** Windowed z-score anomaly detection: hourly event counts per type,
    * each hour scored against the 6 trailing hours' mean/stddev. The
    * |z| > 2 test is evaluated in EXACT integer arithmetic —
    * |x − S/n| > 2·sqrt(var_samp) squared and cleared of denominators
    * becomes (n·x − S)²·(n−1) > 4·n·(n·SS − S²) over bigint counts —
    * so the flag is bit-identical across engines (no float stddev near
    * the threshold boundary). Same one-pass shape at 100 TB: one
    * aggregate shuffle to (type, hour), one window per type.
    */
  def q68ZscoreAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, dir, "events")
    val hourly = e
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-6, -1)
    val scored = hourly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("ss", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("n") === 6)
    val dev = col("cnt") * lit(6L) - col("s")
    val varTerm = col("ss") * lit(6L) - col("s") * col("s")
    scored.select(
      col("event_type"), col("hour"), col("cnt"), col("s").as("win_sum"),
      (dev * dev * lit(5L) > varTerm * lit(24L)).cast("int").as("anomaly"))
  }

  val q68Oracle: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, hour, cnt,
      |    count(*) OVER w AS n,
      |    CAST(sum(cnt) OVER w AS BIGINT) AS s,
      |    CAST(sum(cnt * cnt) OVER w AS BIGINT) AS ss
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hour, cnt, s AS win_sum,
      |  CAST(CASE WHEN (cnt*6 - s)*(cnt*6 - s)*5 > (ss*6 - s*s)*24
      |       THEN 1 ELSE 0 END AS INT) AS anomaly
      |FROM scored WHERE n = 6""".stripMargin

  /** Slowly-changing-dimension type-2 build: collapse each user's event
    * stream into attribute VERSIONS — a new row only when event_type
    * changes — with [valid_from, valid_to) intervals from lead() and an
    * is_current flag. The standard lakehouse dimension-history
    * primitive: one shuffle on user_id, two window passes (change
    * detection, then interval stitch), no self-join.
    */
  def q69Scd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, dir, "events")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = e
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("version", row_number().over(byUser))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(
        col("user_id"), col("version"),
        col("event_type").as("attr"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  val q69Oracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |changes AS (
      |  SELECT user_id, event_type, ts, event_id FROM e
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS INT) AS version,
      |  event_type AS attr,
      |  ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INT)
      |    AS is_current
      |FROM changes
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_heavy_hitters" -> (q64HeavyHitters _),
    "q65_stratified_sample" -> (q65StratifiedSample _),
    "q66_unpivot" -> (q66Unpivot _),
    "q67_histogram" -> (q67Histogram _),
    "q68_zscore_anomaly" -> (q68ZscoreAnomaly _),
    "q69_scd2" -> (q69Scd2 _))

  val oracles: Map[String, String] = Map(
    "q64_heavy_hitters" -> q64Oracle,
    "q65_stratified_sample" -> q65Oracle,
    "q66_unpivot" -> q66Oracle,
    "q67_histogram" -> q67Oracle,
    "q68_zscore_anomaly" -> q68Oracle,
    "q69_scd2" -> q69Oracle)
}
