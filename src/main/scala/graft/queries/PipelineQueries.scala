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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_heavy_hitters" -> (q64HeavyHitters _),
    "q65_stratified_sample" -> (q65StratifiedSample _),
    "q66_unpivot" -> (q66Unpivot _),
    "q67_histogram" -> (q67Histogram _))

  val oracles: Map[String, String] = Map(
    "q64_heavy_hitters" -> q64Oracle,
    "q65_stratified_sample" -> q65Oracle,
    "q66_unpivot" -> q66Oracle,
    "q67_histogram" -> q67Oracle)
}
