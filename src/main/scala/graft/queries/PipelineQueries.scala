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
      // explode_outer dodges the implied size>0 pushdown (spark4 HOF
      // re-inlining hazard); the null token a null text would emit is
      // dropped here — a Map buffer cannot key on null, and DuckDB's
      // unnest never produces it
      .filter(col("token").isNotNull)
      // the consumers below (exact counts, sketch) — without this the
      // tokenize+explode lineage runs once per branch
      .transform(Materialize.once)
    val exact = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .transform(Materialize.once)
    // bounded-heap grouped top-k (graft.plans.TopK) instead of a
    // row_number window: no full per-partition sort on the order
    // columns, O(k) operator memory — same single shuffle on source
    val ranked = graft.plans.TopK.perGroup(exact,
      group = Seq(col("source")),
      order = Seq(col("cnt").desc, col("token")),
      k = 3, rankName = "rnk")
    // total token count per source = sum of the per-token counts —
    // derived from the (much smaller) distinct-token aggregate instead
    // of a third pass over the full token explosion
    val totals = exact.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"))
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
    val e = Tables.load(spark, dir, "events")
    graft.operators.Scd2.fromEvents(e,
      key = col("user_id"), ts = col("ts"),
      attr = col("event_type"), tiebreak = col("event_id"))
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

  /** Fixed-iteration PageRank over the customer→supplier purchase
    * graph (supplier ids offset into a disjoint node space). Rank mass
    * is INTEGER micros — start 1,000,000 per node, per step
    * `150,000 + (85·Σ incoming(prev div outdeg)) div 100` — because
    * integer addition is associative, the result is independent of
    * partitioning/aggregation order and bit-identical across engines,
    * which float PageRank is not. Three unrolled iterations, each one
    * broadcast-or-shuffle join + hash aggregate; the edge list and
    * node set are materialized once and reused by every iteration.
    * (Public-algorithm note: PageRank per Brin & Page 1998; the
    * integer-mass determinism trick is standard fixed-point practice.)
    */
  def q70Pagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
    graft.operators.Graphs.pagerankInt(edges, iterations = 3)
      .orderBy(col("mass").desc, col("node")).limit(20)
  }

  val q70Oracle: String = {
    def iter(prev: String, cur: String): String =
      s"""c$cur AS (
         |  SELECT e.dst, CAST(sum(r.mass // o.d) AS BIGINT) AS inc
         |  FROM $prev r JOIN edges e ON r.node = e.src
         |  JOIN outdeg o ON e.src = o.src
         |  GROUP BY e.dst),
         |$cur AS (
         |  SELECT n.node,
         |    150000 + (85 * coalesce(c.inc, 0)) // 100 AS mass
         |  FROM nodes n LEFT JOIN c$cur c ON n.node = c.dst)""".stripMargin
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, CAST(mass AS BIGINT) AS mass FROM r3
       |ORDER BY mass DESC, node LIMIT 20""".stripMargin
  }

  /** BPE-ish lexer token frequencies: the classic pre-tokenizer split
    * (letter runs | digit runs | single symbol) via regexp_extract_all,
    * top 5 tokens per language. Pure per-row built-ins + one aggregate
    * + a per-group top-k window over tiny groups.
    */
  def q71LexerTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val counts = d.select(col("lang"),
        explode_outer(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("token"))
      .filter(col("token").isNotNull) // null text: oracle's unnest emits nothing
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    // bounded-heap grouped top-k (graft.plans.TopK): the token-count
    // frame is vocabulary-sized, so skipping WindowExec's full sort on
    // (cnt, token) per language matters as the vocabulary grows
    graft.plans.TopK.perGroup(counts,
      group = Seq(col("lang")),
      order = Seq(col("cnt").desc, col("token")),
      k = 5, rankName = "rnk")
  }

  val q71Oracle: String =
    """WITH t AS (
      |  SELECT lang,
      |    unnest(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
      |      AS token
      |  FROM documents),
      |c AS (
      |  SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
      |  FROM t GROUP BY lang, token)
      |SELECT lang, token, cnt,
      |  CAST(row_number() OVER (
      |    PARTITION BY lang ORDER BY cnt DESC, token) AS INT) AS rnk
      |FROM c QUALIFY rnk <= 5""".stripMargin

  /** Triangle counting on the supplier co-occurrence graph (edge when
    * two suppliers share ≥8 orders): the standard three-way edge join
    * with `a<b<c` orientation so each triangle is produced exactly
    * once. Edge mining is one self-join on order key + one aggregate;
    * the oriented closure join touches only the thresholded edge list,
    * never the raw co-occurrence pairs.
    */
  def q72Triangles(spark: SparkSession, dir: String): DataFrame = {
    val os = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val a = os.select(col("ok"), col("sk").as("s1"))
    val b = os.select(col("ok").as("ok2"), col("sk").as("s2"))
    val edges = a.join(b, col("ok") === col("ok2") && col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 8)
      .select(col("s1"), col("s2"))
      .transform(Materialize.once)
    val e1 = edges.select(col("s1").as("a"), col("s2").as("b"))
    val e2 = edges.select(col("s1").as("b2"), col("s2").as("c"))
    val e3 = edges.select(col("s1").as("a3"), col("s2").as("c3"))
    val tris = e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(tris.agg(count(lit(1)).as("n_triangles")))
  }

  val q72Oracle: String =
    """WITH os AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
      |edges AS (
      |  SELECT a.sk AS s1, b.sk AS s2
      |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
      |  GROUP BY a.sk, b.sk HAVING count(*) >= 8),
      |tris AS (
      |  SELECT 1 FROM edges e1
      |  JOIN edges e2 ON e1.s2 = e2.s1
      |  JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
      |       (SELECT CAST(count(*) AS BIGINT) FROM tris) AS n_triangles""".stripMargin

  /** Deterministic bottom-k sampling per group via the mergeable
    * [[graft.functions.BottomKAgg]]: the 8 docs per source whose
    * Lehmer-hash is smallest — a uniform, reproducible, engine-exact
    * sample (at most k (hash,id) pairs per group cross the shuffle).
    * The oracle replays the identical hash order relationally.
    */
  def q73BottomkSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BottomKAgg
    Tables.load(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(BottomKAgg.udaf(8)(col("doc_id")).as("sample"))
      .select(col("source"), posexplode(col("sample")))
      .withColumnRenamed("col", "doc_id")
  }

  val q73Oracle: String =
    """WITH h AS (
      |  SELECT source, doc_id,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY (doc_id * 48271) % 2147483647) - 1 AS INT) AS pos
      |  FROM documents)
      |SELECT source, pos, doc_id FROM h WHERE pos < 8""".stripMargin

  /** Calendar/date-function family over order dates: year / quarter /
    * ISO week / day-of-week extraction, date difference spans — the
    * time-dimension shaping every reporting layer needs. One hash
    * aggregate; every function is a codegen'd built-in.
    */
  def q74Calendar(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"))
    o.groupBy(year(col("d")).as("yr"), quarter(col("d")).as("qtr"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(weekofyear(col("d"))).as("n_iso_weeks"),
        min(col("d")).as("first_day"),
        datediff(max(col("d")), min(col("d"))).as("span_days"),
        dayofweek(min(col("d"))).as("dow_first"))
  }

  val q74Oracle: String =
    """SELECT
      |  CAST(year(d) AS INT) AS yr,
      |  CAST(quarter(d) AS INT) AS qtr,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(count(DISTINCT week(d)) AS BIGINT) AS n_iso_weeks,
      |  min(d) AS first_day,
      |  CAST(date_diff('day', min(d), max(d)) AS INT) AS span_days,
      |  CAST(dayofweek(min(d)) + 1 AS INT) AS dow_first
      |FROM (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
      |GROUP BY 1, 2""".stripMargin

  /** Benchmark decontamination: flag training docs sharing 3-token
    * shingles with a held-out "benchmark" set (here: doc_id % 97 == 0),
    * the standard eval-leakage scan before training. Shape: one
    * shingle explode shared by both branches (materialized), the
    * benchmark shingle set stays small (distinct shingles of the
    * held-out docs, broadcastable at any corpus size since benchmarks
    * are fixed), corpus side joins against it and aggregates per doc —
    * no all-pairs doc comparison anywhere. Emits only contaminated
    * docs: shared/total distinct-shingle counts and a ≥5% flag.
    */
  def q75Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode_outer(Dedup.sortedShingles(wsTokens(col("text")), 3))
          .as("shingle"))
      .filter(col("shingle").isNotNull) // null text: oracle emits nothing
      .transform(Materialize.once)
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("shingle")).distinct()
    val corpus = sh.filter(col("doc_id") % 97 =!= 0)
    val totals = corpus.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    corpus.join(bench, "shingle")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        (col("n_shared") * 20 >= col("n_shingles")).cast("int")
          .as("flagged"))
  }

  val q75Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(toks)-2, 1)+1),
      |      i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS shingle
      |  FROM t),
      |bench AS (
      |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      |corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
      |totals AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
      |  FROM corpus GROUP BY doc_id),
      |shared AS (
      |  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
      |  FROM corpus c JOIN bench b ON c.shingle = b.shingle
      |  GROUP BY c.doc_id)
      |SELECT s.doc_id, s.n_shared, t.n_shingles,
      |  CAST(CASE WHEN s.n_shared * 20 >= t.n_shingles
      |       THEN 1 ELSE 0 END AS INT) AS flagged
      |FROM shared s JOIN totals t ON s.doc_id = t.doc_id""".stripMargin

  /** Bigram language-model scoring (perplexity-style quality filter):
    * train add-one-smoothed bigram probabilities on the corpus itself,
    * then score each document by its total negative log-likelihood.
    * Per-bigram NLL is QUANTIZED to an integer (×10⁴) BEFORE summing —
    * ln() can differ by an ulp across engines, and float sums are
    * order-dependent; integer sums are neither. Shape at 100 TB: one
    * window shuffle per doc for bigram extraction, two count
    * aggregates (the "model"), two key-partitioned joins to score —
    * the model tables are ordinary aggregates, never driver-side.
    */
  def q76LmScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode_outer(wsTokens(col("text"))))
      .withColumnRenamed("col", "w1")
      .filter(col("w1").isNotNull)
    val bigrams = toks
      .withColumn("w2", lead(col("w1"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w1"), col("w2"))
      // model counts AND scoring both read the bigram stream
      .transform(Materialize.once)
    val big = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val uni = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = bigrams.select(col("w1")).distinct()
      .agg(count(lit(1)).as("v"))
    val qnll = // add-one smoothing, ×1e4 integer quantization per bigram
      (round(-log((col("c12") + 1).cast("double") / (col("c1") + col("v"))) * 1e4))
        .cast("long")
    bigrams
      .join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(vocab)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(qnll).as("q_nll"))
      .select(col("doc_id"), col("n_bigrams"), col("q_nll"),
        (col("q_nll") > col("n_bigrams") * lit(60000L)).cast("int")
          .as("high_perplexity"))
  }

  val q76Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks)),
      |      i -> array_to_string(list_slice(toks, i, i+1), ' '))) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |bigrams AS (
      |  SELECT doc_id, split_part(bg, ' ', 1) AS w1,
      |    split_part(bg, ' ', 2) AS w2
      |  FROM g),
      |big AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
      |uni AS (SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1),
      |vocab AS (SELECT count(DISTINCT w1) AS v FROM bigrams),
      |scored AS (
      |  SELECT g.doc_id,
      |    CAST(round(-ln((big.c12 + 1) * 1.0 / (uni.c1 + vocab.v)) * 1e4)
      |         AS BIGINT) AS q
      |  FROM bigrams g
      |  JOIN big ON g.w1 = big.w1 AND g.w2 = big.w2
      |  JOIN uni ON g.w1 = uni.w1
      |  CROSS JOIN vocab)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(q) AS BIGINT) AS q_nll,
      |  CAST(CASE WHEN sum(q) > count(*) * 60000 THEN 1 ELSE 0 END AS INT)
      |    AS high_perplexity
      |FROM scored GROUP BY doc_id""".stripMargin

  /** Referential-integrity audit across the star schema: distinct keys
    * referenced vs existing, and orphan counts per relationship
    * (orders→customer, lineitem→orders, lineitem→part/supplier). Each
    * check is a distinct + anti-join — the data-quality gate every
    * warehouse load runs before publishing a layer. All joins are
    * broadcast-or-shuffle equi-joins on the keys; output is one row.
    */
  def q77FkAudit(spark: SparkSession, dir: String): DataFrame = {
    def orphans(refs: DataFrame, dim: DataFrame, key: String): DataFrame =
      refs.join(dim, Seq(key), "left_anti")
    val cust = Tables.load(spark, dir, "customer").select(col("c_custkey").as("key"))
    val part = Tables.load(spark, dir, "part").select(col("p_partkey").as("key"))
    val supp = Tables.load(spark, dir, "supplier").select(col("s_suppkey").as("key"))
    val ords = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    // one distinct pass feeds both the count and the orphan branch;
    // count(col) (not count(*)) skips a NULL key exactly like SQL's
    // count(DISTINCT o_custkey) — a NULL FK must not desync the audit
    // from its oracle
    val custRefs = ords.select(col("o_custkey").as("key")).distinct()
      .transform(Materialize.once)
    val oKeys = custRefs.agg(count(col("key")).as("n_custkeys_referenced"))
    val oOrphans = orphans(custRefs, cust, "key")
      .agg(count(lit(1)).as("n_orphan_custkeys"))
    val liOrder = orphans(
      li.select(col("l_orderkey")).distinct(),
      ords.select(col("o_orderkey").as("l_orderkey")), "l_orderkey")
      .agg(count(lit(1)).as("n_orphan_orderkeys"))
    val liPart = orphans(
      li.select(col("l_partkey").as("key")).distinct(), part, "key")
      .agg(count(lit(1)).as("n_orphan_partkeys"))
    val liSupp = orphans(
      li.select(col("l_suppkey").as("key")).distinct(), supp, "key")
      .agg(count(lit(1)).as("n_orphan_suppkeys"))
    oKeys.crossJoin(oOrphans).crossJoin(liOrder)
      .crossJoin(liPart).crossJoin(liSupp)
  }

  val q77Oracle: String =
    """SELECT
      |  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders)
      |    AS n_custkeys_referenced,
      |  (SELECT CAST(count(*) AS BIGINT) FROM
      |    (SELECT DISTINCT o_custkey FROM orders) o
      |    WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                      WHERE c.c_custkey = o.o_custkey))
      |    AS n_orphan_custkeys,
      |  (SELECT CAST(count(*) AS BIGINT) FROM
      |    (SELECT DISTINCT l_orderkey FROM lineitem) l
      |    WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                      WHERE o.o_orderkey = l.l_orderkey))
      |    AS n_orphan_orderkeys,
      |  (SELECT CAST(count(*) AS BIGINT) FROM
      |    (SELECT DISTINCT l_partkey FROM lineitem) l
      |    WHERE NOT EXISTS (SELECT 1 FROM part p
      |                      WHERE p.p_partkey = l.l_partkey))
      |    AS n_orphan_partkeys,
      |  (SELECT CAST(count(*) AS BIGINT) FROM
      |    (SELECT DISTINCT l_suppkey FROM lineitem) l
      |    WHERE NOT EXISTS (SELECT 1 FROM supplier s
      |                      WHERE s.s_suppkey = l.l_suppkey))
      |    AS n_orphan_suppkeys""".stripMargin

  /** Incremental dedup merge — the delta-load pattern: an arriving
    * batch (doc_id % 10 ≥ 8) is admitted only if its content
    * fingerprint is new BOTH against the existing corpus (anti-join)
    * and within the batch itself (keep-first). Per source: batch size,
    * accepted, rejected-as-corpus-dup, rejected-as-batch-dup. This is
    * how dedup actually runs day to day — nobody re-dedupes 100 TB
    * per load; the anti-join touches only fingerprints.
    */
  def q78IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val d = Tables.load(spark, dir, "documents")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .transform(Materialize.once)
    val existing = d.filter(col("doc_id") % 10 < 8)
      .select(col("fp")).distinct()
    val batch = d.filter(col("doc_id") % 10 >= 8)
    val vsCorpus = batch.join(existing, Seq("fp"), "left_anti")
    val accepted = vsCorpus
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    batch.groupBy(col("source")).agg(count(lit(1)).as("n_batch"))
      .join(vsCorpus.groupBy(col("source")).agg(count(lit(1)).as("n_new_fp")),
        Seq("source"), "left")
      .join(accepted.groupBy(col("source")).agg(count(lit(1)).as("n_accepted")),
        Seq("source"), "left")
      .select(col("source"), col("n_batch"),
        coalesce(col("n_accepted"), lit(0L)).as("n_accepted"),
        (col("n_batch") - coalesce(col("n_new_fp"), lit(0L)))
          .as("n_corpus_dups"),
        (coalesce(col("n_new_fp"), lit(0L)) -
          coalesce(col("n_accepted"), lit(0L))).as("n_batch_dups"))
  }

  val q78Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents),
      |existing AS (SELECT DISTINCT fp FROM d WHERE doc_id % 10 < 8),
      |batch AS (SELECT * FROM d WHERE doc_id % 10 >= 8),
      |vs_corpus AS (
      |  SELECT * FROM batch b
      |  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.fp = b.fp)),
      |accepted AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |    FROM vs_corpus) WHERE rn = 1)
      |SELECT b.source,
      |  CAST(count(*) AS BIGINT) AS n_batch,
      |  CAST(coalesce(a.n_accepted, 0) AS BIGINT) AS n_accepted,
      |  CAST(count(*) - coalesce(v.n_new_fp, 0) AS BIGINT) AS n_corpus_dups,
      |  CAST(coalesce(v.n_new_fp, 0) - coalesce(a.n_accepted, 0) AS BIGINT)
      |    AS n_batch_dups
      |FROM batch b
      |LEFT JOIN (SELECT source, count(*) AS n_new_fp
      |           FROM vs_corpus GROUP BY source) v ON b.source = v.source
      |LEFT JOIN (SELECT source, count(*) AS n_accepted
      |           FROM accepted GROUP BY source) a ON b.source = a.source
      |GROUP BY b.source, v.n_new_fp, a.n_accepted""".stripMargin

  /** The DSv2 synthetic connector, oracle-checked END TO END: because
    * [[graft.sources.SynthSource]] generates rows as pure Lehmer
    * arithmetic on doc_id, DuckDB can replay the exact generator in
    * SQL — so even a custom connector's output is hash-verified, not
    * just spec-asserted. The oracle SQL is built from the SAME Scala
    * constants the generator uses. (Ignores sfDir by design: the
    * source is storageless.)
    */
  def q79SynthSource(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", "2000").option("partitions", "8").load()
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))

  val q79Oracle: String = {
    import graft.sources.SynthSource.{Langs, Words}
    def mix(saltExpr: String) = s"(($saltExpr) * 48271) % 2147483647"
    val langList = Langs.map(l => s"'$l'").mkString("[", ", ", "]")
    val wordList = Words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH ids AS (SELECT i AS id FROM range(0, 2000) r(i)),
       |g AS (
       |  SELECT id,
       |    'src' || CAST(${mix("id + 1")} % 20 AS VARCHAR) AS source,
       |    ($langList)[CAST(${mix("id + 2")} % 4 AS INT) + 1] AS lang,
       |    5 + CAST(${mix("id + 3")} % 20 AS INT) AS n_words
       |  FROM ids),
       |t AS (
       |  SELECT source, lang,
       |    length(array_to_string(list_transform(range(0, n_words),
       |      i -> ($wordList)[CAST(${mix("id + 4 + i")} % 10 AS INT) + 1]),
       |      ' ')) AS n_chars
       |  FROM g)
       |SELECT source, lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM t GROUP BY source, lang""".stripMargin
  }

  /** Interval union (sweep-line coverage): each event opens a 5-minute
    * activity interval; per user, overlapping/touching intervals merge
    * and the query reports merged-interval count and total covered
    * seconds. The merge is the classic one-pass sweep — a running max
    * of interval ends marks group starts, a running sum of the start
    * flags numbers the groups — so one shuffle on user_id and two
    * window passes replace any self-join formulation. All arithmetic
    * is integer epoch seconds: exact across engines.
    */
  def q80IntervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("s"),
        col("event_id"))
      .withColumn("e", col("s") + 300)
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    val grouped = e
      .withColumn("prev_max_end",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_grp",
        (col("prev_max_end").isNull || col("prev_max_end") < col("s"))
          .cast("long"))
      .withColumn("grp", sum(col("new_grp")).over(w))
    grouped.groupBy(col("user_id"), col("grp"))
      .agg(min(col("s")).as("lo"), max(col("e")).as("hi"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("hi") - col("lo")).as("covered_seconds"))
  }

  val q80Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(date_part('epoch', CAST(ts AS TIMESTAMP))) AS BIGINT) AS s
      |  FROM events),
      |iv AS (SELECT user_id, event_id, s, s + 300 AS en FROM e),
      |marked AS (
      |  SELECT user_id, event_id, s, en,
      |    max(en) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS prev_max_end
      |  FROM iv),
      |grouped AS (
      |  SELECT user_id, s, en,
      |    CAST(sum(CASE WHEN prev_max_end IS NULL OR prev_max_end < s
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY s, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS grp
      |  FROM marked),
      |merged AS (
      |  SELECT user_id, grp, min(s) AS lo, max(en) AS hi
      |  FROM grouped GROUP BY user_id, grp)
      |SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(hi - lo) AS BIGINT) AS covered_seconds
      |FROM merged GROUP BY user_id""".stripMargin

  /** SLIDING event-time windows (q56's tumbling sibling): 2-hour
    * windows advancing hourly, so each event lands in exactly two
    * windows. Spark's window() plans this as a 2-row expand before the
    * aggregate — row amplification = window/slide ratio, paid before
    * the partial aggregation, so the shuffle still carries only
    * (type, window) groups.
    */
  def q81SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("event_type"),
        window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("w.start").as("win_start"),
        col("n_events"))
  }

  val q81Oracle: String =
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr
      |  FROM events),
      |x AS (
      |  SELECT event_type, hr AS win_start FROM h
      |  UNION ALL
      |  SELECT event_type, hr - INTERVAL 1 HOUR FROM h)
      |SELECT event_type, win_start,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM x GROUP BY event_type, win_start""".stripMargin

  /** Selection aggregates: max_by/min_by with a composite (metric, id)
    * selector so ties cannot make the answer engine-dependent — the
    * "representative row per group" primitive (longest doc per source
    * here) without a window or self-join: one hash aggregate. The key
    * is a zero-padded string "nchars‖docid": lexicographic order on
    * fixed-width digits equals numeric (metric, id) order at ANY id
    * magnitude — an arithmetic n_chars·C + doc_id key would collide or
    * reorder once doc_id reaches C.
    */
  def q82SelectionAgg(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val key = format_string("%019d%019d", col("n_chars"), col("doc_id"))
    d.groupBy(col("source"))
      .agg(
        max_by(col("doc_id"), key).as("longest_doc"),
        min_by(col("doc_id"), key).as("shortest_doc"),
        max(col("n_chars")).as("max_chars"),
        count(lit(1)).as("n_docs"))
  }

  val q82Oracle: String =
    """SELECT source,
      |  max_by(doc_id, printf('%019d%019d', n_chars, doc_id)) AS longest_doc,
      |  min_by(doc_id, printf('%019d%019d', n_chars, doc_id)) AS shortest_doc,
      |  max(n_chars) AS max_chars,
      |  CAST(count(*) AS BIGINT) AS n_docs
      |FROM documents GROUP BY source""".stripMargin

  /** Embedding-norm profiling per label: ‖x‖² computed by a sequential
    * left fold over the float32 vector (deterministic accumulation
    * order), QUANTIZED per row to an integer before the group sum —
    * the float-safety pattern every embedding-stats query here uses
    * (per-row quantize → associative integer aggregate). The fold is a
    * higher-order `aggregate` on a 64-dim array: per-row work, no
    * shuffle beyond the final label aggregate.
    */
  def q83EmbeddingNorms(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val q = expr(
      "CAST(round(aggregate(embedding, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 1e6) AS BIGINT)")
    e.select(col("label"), q.as("qn"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("qn")).as("sum_qnorm2"),
        max(col("qn")).as("max_qnorm2"))
  }

  val q83Oracle: String =
    """SELECT label,
      |  CAST(count(*) AS BIGINT) AS n_vectors,
      |  CAST(sum(qn) AS BIGINT) AS sum_qnorm2,
      |  max(qn) AS max_qnorm2
      |FROM (
      |  SELECT label,
      |    CAST(round(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                CAST(embedding AS DOUBLE[])) * 1e6)
      |         AS BIGINT) AS qn
      |  FROM embeddings)
      |GROUP BY label""".stripMargin

  /** Winsorized (percentile-clamped) robust statistics: per-source p5/
    * p95 integer thresholds computed in one aggregate pass, broadcast
    * back, and n_chars clamped before the second aggregate — the
    * outlier-robust profiling pass run before length-filter thresholds
    * are chosen. Thresholds are floor/ceil INTEGERS so the clamp and
    * the clamped sum stay engine-exact.
    */
  def q84Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"), col("n_chars"))
      .transform(Materialize.once)
    val cuts = d.groupBy(col("source")).agg(
      floor(expr("percentile(n_chars, 0.05)")).cast("long").as("lo"),
      ceil(expr("percentile(n_chars, 0.95)")).cast("long").as("hi"))
    val clamped = least(greatest(col("n_chars"), col("lo")), col("hi"))
    d.join(cuts, Seq("source"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(clamped).as("winsorized_sum"),
        sum((col("n_chars") < col("lo")).cast("long")).as("n_clamped_low"),
        sum((col("n_chars") > col("hi")).cast("long")).as("n_clamped_high"))
  }

  val q84Oracle: String =
    """WITH cuts AS (
      |  SELECT source,
      |    CAST(floor(quantile_cont(n_chars, 0.05)) AS BIGINT) AS lo,
      |    CAST(ceil(quantile_cont(n_chars, 0.95)) AS BIGINT) AS hi
      |  FROM documents GROUP BY source)
      |SELECT d.source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(least(greatest(n_chars, lo), hi)) AS BIGINT)
      |    AS winsorized_sum,
      |  CAST(sum(CASE WHEN n_chars < lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clamped_low,
      |  CAST(sum(CASE WHEN n_chars > hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clamped_high
      |FROM documents d JOIN cuts c ON d.source = c.source
      |GROUP BY d.source""".stripMargin

  /** User-journey path analysis: each user's first three event types
    * (in event-time order) become a path string, counted across users
    * — the onboarding-funnel exploration query. Per-user ordering via
    * one window (rank ≤ 3), path assembly via an ORDERED collect, then
    * a small aggregate over distinct paths.
    */
  def q85EventPaths(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val first3 = e
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val paths = first3.groupBy(col("user_id"))
      .agg(array_join(
        // sort by rank, then project the type: an ordered collect
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= 2)
  }

  val q85Oracle: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events),
      |p AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 3 GROUP BY user_id)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_users
      |FROM p GROUP BY path HAVING count(*) >= 2""".stripMargin

  /** Ratio-to-report windows: each (day, type)'s share of its day's
    * events and of the whole table, as INTEGER parts-per-million
    * (n·10⁶ div total — exact, no float division) — the
    * percent-of-total reporting pattern via unpartitioned-free
    * aggregation: day shares come from a window over the daily
    * aggregate (tiny), the global total from a broadcast scalar.
    */
  def q86RatioToTotal(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val daily = e.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      // two consumers (day window + grand-total agg) — one aggregation
      .transform(Materialize.once)
    val withDay = daily.withColumn("day_total",
      sum(col("n")).over(Window.partitionBy(col("day"))))
    val total = daily.agg(sum(col("n")).as("grand_total"))
    withDay.crossJoin(total)
      .select(
        col("day"), col("event_type"), col("n"),
        expr("n * 1000000 div day_total").as("day_share_ppm"),
        expr("n * 1000000 div grand_total").as("total_share_ppm"))
  }

  val q86Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT day, event_type, n,
      |    CAST(sum(n) OVER (PARTITION BY day) AS BIGINT) AS day_total,
      |    CAST(sum(n) OVER () AS BIGINT) AS grand_total
      |  FROM daily)
      |SELECT day, event_type, n,
      |  (n * 1000000) // day_total AS day_share_ppm,
      |  (n * 1000000) // grand_total AS total_share_ppm
      |FROM w""".stripMargin

  /** Z-order cell profiling: Morton-interleave (partkey, suppkey) mod
    * 1024 via the codegen'd [[graft.functions.MortonCode]] and report
    * the densest 4096-code cells — the diagnostic run before choosing
    * a ZORDER clustering key. The oracle replays the interleave from
    * SQL generated off the SAME magic constants
    * ([[graft.functions.ZOrderHelper.mortonSql]]), so the custom
    * expression is hash-verified bit for bit.
    */
  def q87ZorderCells(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.MortonCode
    val li = Tables.load(spark, dir, "lineitem")
    li.select(MortonCode(col("l_partkey") % 1024, col("l_suppkey") % 1024)
        .as("z"))
      .select(expr("z div 4096").as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("cell")).limit(20)
  }

  val q87Oracle: String = {
    val code = graft.functions.ZOrderHelper
      .mortonSql("l_partkey % 1024", "l_suppkey % 1024")
    s"""SELECT ($code) // 4096 AS cell, CAST(count(*) AS BIGINT) AS n
       |FROM lineitem
       |GROUP BY 1 ORDER BY n DESC, cell LIMIT 20""".stripMargin
  }

  /** MAD (median-absolute-deviation) outlier detection — the robust
    * sibling of q68's z-score: per source, median length and MAD as
    * floor-integers, then |x − med| > 3·MAD flags. Medians come from
    * one percentile pass broadcast back (q84's two-pass shape); all
    * comparisons are integer-exact.
    */
  def q88MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"), col("n_chars"))
      .transform(Materialize.once)
    val med = d.groupBy(col("source"))
      .agg(floor(expr("percentile(n_chars, 0.5)")).cast("long").as("med"))
    val dev = d.join(med, Seq("source"))
      .withColumn("adev", abs(col("n_chars") - col("med")))
      .transform(Materialize.once)
    val mad = dev.groupBy(col("source"))
      .agg(floor(expr("percentile(adev, 0.5)")).cast("long").as("mad"),
        first(col("med")).as("med"))
    dev.select(col("source"), col("n_chars"))
      .join(mad, Seq("source"))
      .groupBy(col("source"))
      .agg(
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum((abs(col("n_chars") - col("med")) > col("mad") * 3)
          .cast("long")).as("n_outliers"))
  }

  val q88Oracle: String =
    """WITH med AS (
      |  SELECT source,
      |    CAST(floor(quantile_cont(n_chars, 0.5)) AS BIGINT) AS med
      |  FROM documents GROUP BY source),
      |dev AS (
      |  SELECT d.source, d.n_chars, m.med, abs(d.n_chars - m.med) AS adev
      |  FROM documents d JOIN med m ON d.source = m.source),
      |mad AS (
      |  SELECT source, CAST(floor(quantile_cont(adev, 0.5)) AS BIGINT) AS mad
      |  FROM dev GROUP BY source)
      |SELECT v.source, any_value(v.med) AS med, any_value(a.mad) AS mad,
      |  CAST(sum(CASE WHEN abs(v.n_chars - v.med) > a.mad * 3
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev v JOIN mad a ON v.source = a.source
      |GROUP BY v.source""".stripMargin

  /** Count-Min sketch validation: per-source sketches over the token
    * stream ([[graft.functions.CountMinAgg]], depth 4 × width 512,
    * PortableHash family), probed at the exact top-3 tokens. The
    * DuckDB oracle replays the ESTIMATE exactly — for each probe token
    * and hash row it sums the counts of every token colliding into the
    * same bucket, then takes the row minimum — so the full sketch
    * algebra (hash family, bucket layout, cell-wise mergeability) is
    * hash-match checked, collisions included, not just bounded. The
    * deterministic CM guarantee est ≥ true is emitted as a flag.
    *
    * Scale shape: the sketch ships depth·width longs per source per
    * map task however many distinct tokens exist — the linear-sketch
    * sibling of q64's Misra-Gries counters (that one under-estimates
    * with bounded error; this one over-estimates, supports deletions /
    * arbitrary linear combinations, and its row minimum is what a
    * 100 TB frequency-probe service would serve).
    */
  // q96's sketch dimensions, interpolated into BOTH the Spark plan and
  // the oracle SQL — a bare literal on either side would silently
  // desync them (the PortableHash.Shift rule, applied here too)
  private val CmDepth = 4
  private val CmWidth = 512

  def q96CountMin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CountMinAgg, PortableHash}
    val depth = CmDepth
    val width = CmWidth
    val toks = Tables.load(spark, dir, "documents")
      .select(col("source"), explode_outer(wsTokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      // consumed by the exact counts and the sketch — one tokenize pass
      .transform(Materialize.once)
    val exact = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = graft.plans.TopK.perGroup(exact,
      group = Seq(col("source")),
      order = Seq(col("cnt").desc, col("token")),
      k = 3, rankName = "rnk")
    val sketch = toks.groupBy(col("source"))
      .agg(CountMinAgg.udaf(depth, width)(col("token")).as("cm"))
    // probe: row i's counter for the token, min across rows — the same
    // constants (Mod/Shift/width) the Aggregator used, via the codegen'd
    // portable hash so engine and oracle share one definition
    val h = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PortableStringHash(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("token"))))
    val est = (0 until depth).map { i =>
      val v = (h + lit(i.toLong * PortableHash.Shift)) % lit(PortableHash.Mod)
      val bkt = (v * v % lit(PortableHash.Mod)) % lit(width.toLong)
      element_at(col("cm"), (lit(i.toLong * width) + bkt + lit(1L)).cast("int"))
    }.reduce(least(_, _))
    ranked.join(sketch, Seq("source"))
      .select(col("source"), col("rnk"), col("token"), col("cnt"),
        est.as("cm_est"),
        (est >= col("cnt")).cast("int").as("overestimates_ok"))
  }

  val q96Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH t AS (
       |  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |  FROM documents),
       |c AS (
       |  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
       |  FROM t GROUP BY 1, 2),
       |h AS (
       |  SELECT source, token, cnt,
       |    CASE WHEN length(token) = 0 THEN 0 ELSE
       |      list_reduce(list_transform(range(1, length(token)+1),
       |                                 i -> ascii(token[i])::BIGINT),
       |                  (a, b) -> (a * $Base + b) % $Mod) END AS hv
       |  FROM c),
       |b AS (
       |  SELECT source, token, cnt, r.i,
       |    (((hv + r.i * $Shift) % $Mod) * ((hv + r.i * $Shift) % $Mod)
       |      % $Mod) % $CmWidth AS bkt
       |  FROM h, range(0, $CmDepth) r(i)),
       |top AS (
       |  SELECT source, token, cnt,
       |    CAST(row_number() OVER (
       |      PARTITION BY source ORDER BY cnt DESC, token) AS INT) AS rnk
       |  FROM c QUALIFY rnk <= 3),
       |est AS (
       |  SELECT tb.source, tb.token, tb.i, sum(ab.cnt) AS row_est
       |  FROM (SELECT b.source, b.token, b.i, b.bkt
       |        FROM b JOIN top USING (source, token)) tb
       |  JOIN b ab ON ab.source = tb.source AND ab.i = tb.i
       |            AND ab.bkt = tb.bkt
       |  GROUP BY tb.source, tb.token, tb.i)
       |SELECT top.source, top.rnk, top.token, top.cnt,
       |  CAST(min(est.row_est) AS BIGINT) AS cm_est,
       |  CAST(CASE WHEN min(est.row_est) >= top.cnt THEN 1 ELSE 0 END AS INT)
       |    AS overestimates_ok
       |FROM top JOIN est ON est.source = top.source AND est.token = top.token
       |GROUP BY top.source, top.rnk, top.token, top.cnt""".stripMargin
  }

  /** One BPE training step: global adjacent-token-pair frequencies,
    * top 20 — the merge-candidate table a tokenizer trainer recomputes
    * each round. Pair extraction is a two-arg transform lambda (no
    * UDF, stays in codegen): element i of the length-(n−1) slice
    * paired with token i+1. Top-20 with a (cnt, l, r) total order
    * plans as TakeOrderedAndProject — no global sort materializes.
    *
    * Scale shape: one explode (≈ token count rows), one partial-
    * aggregated groupBy on the pair, then a driver-bound top-k. A full
    * BPE train loops this query, applying the winning merge between
    * rounds — each round is this same plan over the rewritten corpus.
    */
  def q97BpePairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(wsTokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS l, t[i + 1] AS r))"))
        .as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .groupBy(col("l"), col("r"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l"), col("r"))
      .limit(20)
  }

  val q97Oracle: String =
    """WITH t AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
      |p AS (
      |  SELECT t[i] AS l, t[i + 1] AS r
      |  FROM t, unnest(range(1, len(t))) u(i)
      |  WHERE len(t) >= 2)
      |SELECT l, r, CAST(count(*) AS BIGINT) AS cnt
      |FROM p GROUP BY l, r
      |ORDER BY cnt DESC, l, r LIMIT 20""".stripMargin

  /** Corpus novelty profiling: per source, how much of its shingle
    * mass appears THERE FIRST (first occurrence = lowest doc_id over
    * the whole corpus) — the curation signal separating original
    * content from recombinations of earlier documents. One shingle
    * explode, a global min(doc_id) per shingle (vocabulary-scale
    * aggregate), a join back on the shingle key, and a per-doc →
    * per-source rollup; novelty is integer ppm so the profile is
    * hash-exact.
    */
  def q98Novelty(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(Dedup.allShingles(wsTokens(col("text")), 3)).as("shingle"))
      .distinct()
      // consumed by the first-occurrence aggregate AND the join back
      .transform(Materialize.once)
    val firstSeen = sh.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, Seq("shingle"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum((col("doc_id") === col("first_doc")).cast("long")).as("n_novel"))
      .select(col("source"), col("n_shingles"), col("n_novel"),
        expr("n_novel * 1000000 div n_shingles").as("novelty_ppm"))
  }

  val q98Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, source,
      |    array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
      |  FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)),
      |fs AS (
      |  SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
      |SELECT sh.source,
      |  CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(CASE WHEN sh.doc_id = fs.first_doc THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_novel,
      |  CAST(sum(CASE WHEN sh.doc_id = fs.first_doc THEN 1 ELSE 0 END)
      |    * 1000000 // count(*) AS BIGINT) AS novelty_ppm
      |FROM sh JOIN fs USING (shingle)
      |GROUP BY sh.source""".stripMargin

  /** Two-tier incremental dedup: a Bloom filter over the corpus
    * fingerprints pre-screens the incoming batch, and only the
    * maybe-duplicate survivors pay the exact fingerprint join. Bloom
    * filters have NO false negatives, so rows the filter rejects are
    * definitively new and skip the join; false positives are removed
    * by the exact semi/anti joins — the RESULT is therefore exact set
    * arithmetic (and fully oracle-checkable) while the PLAN only ships
    * the candidate fraction into the corpus join. At 100 TB this is
    * the difference between joining the whole day's batch against the
    * corpus fingerprint table and joining the few percent the filter
    * can't clear; the filter itself is one mergeable aggregate
    * (Catalyst's BloomFilterAggregate, the same machinery AQE runtime
    * filters inject) broadcast as a single row.
    */
  def q102BloomDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    val d = Tables.load(spark, dir, "documents")
      .withColumn("fp", fingerprint(col("text")))
      .transform(Materialize.once)
    val corpusFps = d.filter(col("doc_id") % 10 < 8)
      .select(col("fp")).distinct()
      .transform(Materialize.once)
    val bloomAgg = ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("fp"))),
        Literal(10000L), Literal(80000L)).toAggregateExpression())
    val bloom = corpusFps.agg(bloomAgg.as("bf"))
    val batch = d.filter(col("doc_id") % 10 >= 8)
      .select(col("source"), col("fp"))
    // might_contain demands a CONSTANT/scalar-subquery filter side (it
    // is evaluated per row without a join) — hand it the one-row bloom
    // aggregate as a scalar subquery, exactly how InjectRuntimeFilter
    // wires the same expression pair
    val maybe = ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloom.queryExecution.analyzed),
        ColumnBridge.expression(xxhash64(col("fp")))))
    val tagged = batch
      .withColumn("maybe_dup", maybe)
      .transform(Materialize.once)
    // bloom-cleared rows are new with certainty; only candidates join
    val definiteNew = tagged.filter(!col("maybe_dup"))
    val candidates = tagged.filter(col("maybe_dup"))
    val dups = candidates.join(corpusFps, Seq("fp"), "left_semi")
    val clearedFalsePositives = candidates.join(corpusFps, Seq("fp"), "left_anti")
    val newRows = definiteNew.unionByName(clearedFalsePositives)
    batch.groupBy(col("source")).agg(count(lit(1)).as("n_batch"))
      .join(dups.groupBy(col("source")).agg(count(lit(1)).as("n_dups")),
        Seq("source"), "left")
      .join(newRows.groupBy(col("source")).agg(count(lit(1)).as("n_new")),
        Seq("source"), "left")
      .select(col("source"), col("n_batch"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
  }

  val q102Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents),
      |existing AS (SELECT DISTINCT fp FROM d WHERE doc_id % 10 < 8),
      |batch AS (SELECT source, fp FROM d WHERE doc_id % 10 >= 8)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_batch,
      |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM existing e
      |                             WHERE e.fp = b.fp)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
      |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM existing e
      |                             WHERE e.fp = b.fp)
      |           THEN 0 ELSE 1 END) AS BIGINT) AS n_new
      |FROM batch b GROUP BY source""".stripMargin

  /** Mixture rebalancing — the data-mixing step that samples a corpus
    * DOWN to target language proportions (Pile/ROOTS-style mixture
    * weights). Feasible sample size is bound by the scarcest language
    * (S = min over langs of n_l·1M div w_l), per-language keep rates
    * follow, and membership is the deterministic Lehmer-hash filter —
    * so the same doc set is kept on every engine and every run. All
    * arithmetic is integer (ppm), every stage oracle-replayable.
    *
    * Scale shape: one count aggregate (languages-sized), broadcast back
    * as rates; the filter is scan-parallel; nothing beyond the
    * per-language count table ever leaves the executors.
    */
  def q103MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    // target mixture in ppm (sums to 1M): English-heavy with a uniform
    // tail — the constants the oracle replays
    val targets = Seq("en" -> 400000L, "de" -> 150000L, "es" -> 150000L,
      "fr" -> 150000L, "zh" -> 150000L)
    val tdf = broadcast(spark.createDataFrame(targets)
      .toDF("lang", "target_ppm"))
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .transform(Materialize.once)
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .join(tdf, Seq("lang"))
    // scarcest language bounds the total feasible sample
    val feasible = counts
      .agg(min(expr("n_docs * 1000000 div target_ppm")).as("s_total"))
    val rates = counts.crossJoin(broadcast(feasible))
      .select(col("lang"), col("n_docs"), col("target_ppm"),
        // kept target for this language, then its per-doc keep rate
        expr("(s_total * target_ppm div 1000000) * 1000000 div n_docs")
          .as("rate_ppm"))
    val kept = d.join(broadcast(rates), Seq("lang"))
      .filter((col("doc_id") * lit(16807L) + lit(11L)) % lit(2147483647L)
        % lit(1000000L) < col("rate_ppm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
    // LEFT from rates so a language whose rate rounds to zero still
    // reports (n_kept = 0) — matching the oracle's left join
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("target_ppm"),
        col("rate_ppm"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  val q103Oracle: String =
    """WITH t(lang, target_ppm) AS (VALUES
      |  ('en', 400000), ('de', 150000), ('es', 150000),
      |  ('fr', 150000), ('zh', 150000)),
      |c AS (
      |  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(t.target_ppm AS BIGINT) AS target_ppm
      |  FROM documents d JOIN t ON t.lang = d.lang
      |  GROUP BY d.lang, t.target_ppm),
      |f AS (SELECT min(n_docs * 1000000 // target_ppm) AS s_total FROM c),
      |r AS (
      |  SELECT lang, n_docs, target_ppm,
      |    (s_total * target_ppm // 1000000) * 1000000 // n_docs AS rate_ppm
      |  FROM c, f),
      |kept AS (
      |  SELECT d.lang, count(*) AS n_kept
      |  FROM documents d JOIN r ON r.lang = d.lang
      |  WHERE (d.doc_id * 16807 + 11) % 2147483647 % 1000000 < r.rate_ppm
      |  GROUP BY d.lang)
      |SELECT r.lang, r.n_docs, r.target_ppm,
      |  CAST(r.rate_ppm AS BIGINT) AS rate_ppm,
      |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
      |FROM r LEFT JOIN kept k ON k.lang = r.lang""".stripMargin

  /** Document chunking with overlap — the retrieval/embedding prep
    * step: fixed 64-token windows at stride 48 (16-token overlap), one
    * row per chunk with its position and a content fingerprint. Chunk
    * starts come from `sequence(...)` + explode and the window is
    * `slice` — pure built-ins inside codegen, no UDF; a document with
    * n tokens yields one chunk per stride step up to n−1 (the short
    * tail chunk is kept — dropping tails loses corpus content). Each
    * row carries the chunk's length and its first/last tokens, which
    * the oracle replays positionally.
    */
  // q104's window geometry — interpolated into BOTH sides (the q96 rule)
  private val ChunkTokens = 64
  private val ChunkStride = 48

  def q104Chunking(spark: SparkSession, dir: String): DataFrame = {
    val chunk = ChunkTokens
    val stride = ChunkStride
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("n"))
    d.select(col("doc_id"), col("t"), col("n"),
        explode(expr(s"sequence(0, greatest(n - 1, 0), $stride)"))
          .as("start"))
      // a start inside the previous chunk's overlap that adds no NEW
      // tokens (start >= n) can't happen by construction (starts stop
      // at n-1); emit every window, including the short tail
      .select(col("doc_id"),
        expr(s"start div $stride").cast("int").as("chunk_idx"),
        expr(s"size(slice(t, start + 1, $chunk))").as("chunk_len"),
        expr("t[start]").as("head_token"),
        expr(s"element_at(slice(t, start + 1, $chunk), -1)").as("tail_token"))
  }

  val q104Oracle: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t,
      |    len(string_split_regex(trim(text), '\\s+')) AS n
      |  FROM documents),
      |starts AS (
      |  SELECT doc_id, t, n, CAST(u.s AS BIGINT) AS start
      |  FROM d, unnest(range(0, greatest(n - 1, 0) + 1, $ChunkStride)) AS u(s))
      |SELECT doc_id,
      |  CAST(start // $ChunkStride AS INT) AS chunk_idx,
      |  CAST(len(list_slice(t, start + 1, least(start + $ChunkTokens, n))) AS INT)
      |    AS chunk_len,
      |  t[start + 1] AS head_token,
      |  t[least(start + $ChunkTokens, n)] AS tail_token
      |FROM starts""".stripMargin

  /** Inverted-index construction — the retrieval-index build a corpus
    * pipeline ships: per token, document frequency, total term
    * frequency, and the first 5 postings of the doc_id-sorted posting
    * list. Restricted to tokens with df ≥ 20 so the output (and the
    * collect_list state) stays head-of-vocabulary sized; full posting
    * lists at 100 TB would go straight to a partitioned sink rather
    * than through a driver-checkable result, but the build plan — one
    * explode, one (token, doc) aggregate, one token aggregate with
    * sorted collect — is exactly this.
    */
  def q99InvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val posting = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    posting.groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("ttf"),
        // string-encoded so the cross-engine compare sees one scalar
        // representation (list cells render differently per engine)
        concat_ws(",", slice(sort_array(collect_list(col("doc_id"))), 1, 5))
          .as("head_postings"))
      .filter(col("df") >= 20)
  }

  val q99Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |p AS (
      |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
      |  FROM t GROUP BY token, doc_id)
      |SELECT token, CAST(count(*) AS BIGINT) AS df,
      |  CAST(sum(tf) AS BIGINT) AS ttf,
      |  array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 5), ',')
      |    AS head_postings
      |FROM p GROUP BY token HAVING count(*) >= 20""".stripMargin

  /** Collocation mining: PMI-ranked adjacent token pairs, carried as
    * an EXACT integer rational instead of a logarithm —
    * pmi = log(N·c(l,r) / (c(l)·c(r))) is monotone in the ratio, so
    * ranking and thresholding use num = N·c(l,r), den = c(l)·c(r)
    * directly and no float ever enters the plan. Pairs seen ≥ 10 times
    * with ratio > 1 (positive PMI), per-million-quantized. Reuses the
    * q97 pair-extraction lambda; unigram counts come from one token
    * aggregate joined in twice (vocabulary-scale frames).
    */
  def q100Collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(wsTokens(col("text")).as("t"))
      .transform(Materialize.once)
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .transform(Materialize.once)
    val total = uni.agg(sum(col("c")).as("n"))
    val pairs = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS l, t[i + 1] AS r))"))
        .as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .groupBy(col("l"), col("r"))
      .agg(count(lit(1)).as("c_lr"))
      .filter(col("c_lr") >= 10)
    pairs
      .join(uni.select(col("w").as("l"), col("c").as("c_l")), Seq("l"))
      .join(uni.select(col("w").as("r"), col("c").as("c_r")), Seq("r"))
      .crossJoin(broadcast(total))
      .select(col("l"), col("r"), col("c_lr"), col("c_l"), col("c_r"),
        (col("n") * col("c_lr")).as("pmi_num"),
        (col("c_l") * col("c_r")).as("pmi_den"))
      .filter(col("pmi_num") > col("pmi_den"))
      .select(col("l"), col("r"), col("c_lr"), col("c_l"), col("c_r"),
        expr("pmi_num * 1000000 div pmi_den").as("pmi_ratio_ppm"))
  }

  val q100Oracle: String =
    """WITH t AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
      |uni AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(t) AS w FROM t) GROUP BY w),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
      |p AS (
      |  SELECT t[i] AS l, t[i + 1] AS r
      |  FROM t, unnest(range(1, len(t))) u(i)
      |  WHERE len(t) >= 2),
      |pc AS (
      |  SELECT l, r, CAST(count(*) AS BIGINT) AS c_lr
      |  FROM p GROUP BY l, r HAVING count(*) >= 10)
      |SELECT pc.l, pc.r, pc.c_lr, ul.c AS c_l, ur.c AS c_r,
      |  CAST((n * c_lr) * 1000000 // (ul.c * ur.c) AS BIGINT)
      |    AS pmi_ratio_ppm
      |FROM pc JOIN uni ul ON ul.w = pc.l JOIN uni ur ON ur.w = pc.r
      |CROSS JOIN tot
      |WHERE n * c_lr > ul.c * ur.c""".stripMargin

  /** Least-squares trend slopes in EXACT integer arithmetic: per event
    * type, the regression of daily counts on the day index reduces to
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²); both sides are exact
    * bigints, emitted as numerator/denominator plus a ppm-quantized
    * ratio — regr_slope semantics with no float aggregation anywhere,
    * so partition order cannot move the result. One aggregate over
    * (type, day), one over type.
    */
  def q89TrendSlope(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val daily = e.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2020-01-01")).as("x"))
      .agg(count(lit(1)).as("y"))
    daily.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      // den = n²·var(x) > 0 whenever two distinct days exist
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0)
      .select(
        col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        // slopes can be negative: VERIFIED both Spark's `div` and
        // DuckDB's `//` truncate toward zero (-7/2 = -3 in both), so
        // plain integer division is cross-engine exact here
        expr("(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)")
          .as("slope_ppm"))
  }

  val q89Oracle: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM daily GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
      |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
      |  CAST(((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
      |       AS BIGINT) AS slope_ppm
      |FROM s WHERE n * sxx - sx * sx > 0""".stripMargin

  /** Number of BPE merge rounds q105 learns; the oracle unrolls the
    * same count, so this is the single definition.
    */
  val BpeTrainRounds = 8

  /** q105 — iterative BPE tokenizer TRAINING: learn [[BpeTrainRounds]]
    * merges over the corpus vocabulary, recounting pair frequencies
    * after applying each winner (q97 is one round's census; this is
    * the loop). All heavy lifting in [[graft.operators.Bpe]]: corpus
    * touched once for word counts, then vocabulary-scale rounds.
    */
  def q105BpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val words = d.select(explode(wsTokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    graft.operators.Bpe.train(words, BpeTrainRounds)
  }

  /** Shared oracle fragment for the BPE queries: given a `w(w, cnt)`
    * vocabulary CTE already in scope, emit r0 (char-split reprs) and
    * the unrolled b_i (best pair, same (count desc, l, r) order) /
    * r_i (greedy merge application via the same separator-delimited
    * `replace` trick — see [[graft.operators.Bpe]] for why replace =
    * greedy left-to-right non-overlapping application) round CTEs.
    * `carryWord` threads the word itself through the rewrites so the
    * final symbolization can be joined back (q107).
    */
  private def bpeRoundCtes(carryWord: Boolean): String = {
    val S = "chr(31)"
    val SS = "chr(31) || chr(31)"
    val wcol = if (carryWord) "w, " else ""
    val r0 =
      s"""r0 AS (
         |  SELECT $wcol$S || array_to_string(
         |      list_transform(range(1, length(w) + 1), j -> w[j]), $SS)
         |    || $S AS repr, cnt
         |  FROM w)""".stripMargin
    val steps = (1 to BpeTrainRounds).map { i =>
      s"""b$i AS (
         |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT t[i] AS l, t[i + 1] AS r, cnt FROM (
         |      SELECT string_split(substr(repr, 2, length(repr) - 2), $SS)
         |               AS t, cnt
         |      FROM r${i - 1}) sy, unnest(range(1, len(t))) u(i)
         |    WHERE len(t) >= 2)
         |  GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1),
         |r$i AS (
         |  SELECT ${wcol}replace(repr, $S || l || $SS || r || $S,
         |                 $S || l || r || $S) AS repr, cnt
         |  FROM r${i - 1}, b$i)""".stripMargin
    }
    (r0 +: steps).mkString(",\n")
  }

  /** The oracle replays the identical training algorithm with
    * unrolled rounds over the same vocabulary.
    */
  val q105Oracle: String = {
    val head =
      """WITH w AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents)
        |  WHERE w <> '' GROUP BY 1),""".stripMargin
    val sel = (1 to BpeTrainRounds).map(i =>
      s"SELECT CAST($i AS INT) AS round, l, r, l || r AS merged, c AS cnt FROM b$i")
      .mkString("\nUNION ALL\n")
    head + "\n" + bpeRoundCtes(carryWord = false) + "\n" + sel +
      "\nORDER BY round"
  }

  /** q107 — BPE tokenization APPLY (q105's consumer): train the merge
    * table, then TOKENIZE the corpus with it and report per-source
    * token accounting — the compression measurement a tokenizer build
    * ends with. The apply step runs on the VOCABULARY (distinct
    * words), not the token stream: each word's symbolization is the
    * learned replace chain ([[graft.operators.Bpe.applyMerges]], all
    * codegen literals), and per-source sums come from joining the
    * (source, word) occurrence table — vocabulary-scale join, one
    * corpus scan total (shared with training via the materialized
    * token frame).
    *
    * Output: (source, n_docs, n_words, n_chars, n_bpe_tokens) — all
    * exact integers.
    */
  def q107BpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bpe
    val docWords = Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        explode(wsTokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .transform(Materialize.once) // vocab counts + per-source rollups
    val words = docWords.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val merges = Bpe.trainMerges(words, BpeTrainRounds)
    val perWord = words.select(col("w"),
      Bpe.tokenCount(Bpe.applyMerges(Bpe.reprOf(col("w")), merges))
        .as("n_tok"))
    val docs = docWords.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val sw = docWords.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("occ"))
    sw.join(perWord, "w")
      .groupBy(col("source"))
      .agg(
        sum(col("occ")).as("n_words"),
        sum(col("occ") * length(col("w")).cast("long")).as("n_chars"),
        sum(col("occ") * col("n_tok").cast("long")).as("n_bpe_tokens"))
      .join(docs, "source")
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_chars"), col("n_bpe_tokens"))
  }

  /** q180 — tokenizer compression-rate sweep: corpus chars-per-token
    * after 0 / 2 / 4 / 8 BPE merge rounds — the vocabulary-size design
    * table (how much each merge budget actually buys) that q105/q107
    * end at a single point. BPE merge sequences are prefix-stable
    * (round r+1 never revises rounds 1..r), so ONE 8-round training
    * serves every sweep point via merge-list prefixes; each point
    * re-symbolizes the VOCABULARY (distinct words), never the corpus.
    *
    * Scale shape: q105's training cost once, then 4 vocabulary-scale
    * scalar aggregates — corpus token mass rides the word-frequency
    * weights, so the corpus is touched exactly once (the shared `words`
    * aggregate).
    */
  def q180BpeSweep(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bpe
    val words = Tables.load(spark, dir, "documents")
      .select(explode(wsTokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .transform(Materialize.once) // training + 4 sweep points
    val merges8 = Bpe.trainMerges(words, BpeTrainRounds)
    Seq(0, 2, 4, BpeTrainRounds).map { r =>
      words.select(col("cnt"),
          length(col("w")).cast("long").as("n_chars"),
          Bpe.tokenCount(Bpe.applyMerges(Bpe.reprOf(col("w")),
            merges8.take(r))).cast("long").as("n_tok"))
        .agg(sum(col("cnt") * col("n_chars")).as("total_chars"),
          sum(col("cnt") * col("n_tok")).as("total_tokens"))
        .select(lit(r).as("merge_rounds"), col("total_chars"),
          col("total_tokens"))
    }.reduce(_ unionByName _)
      .withColumn("chars_per_token_ppm",
        expr("total_chars * 1000000L div total_tokens"))
  }

  val q180Oracle: String = {
    val SS = "chr(31) || chr(31)"
    val head =
      """WITH w AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents)
        |  WHERE w <> '' GROUP BY 1),""".stripMargin
    val points = Seq(0, 2, 4, BpeTrainRounds).map { r =>
      s"""SELECT CAST($r AS INT) AS merge_rounds,
         |  CAST(sum(cnt * length(w)) AS BIGINT) AS total_chars,
         |  CAST(sum(cnt * len(string_split(
         |      substr(repr, 2, length(repr) - 2), $SS))) AS BIGINT)
         |    AS total_tokens
         |FROM r$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    head + "\n" + bpeRoundCtes(carryWord = true) + ",\n" +
      s"""pts AS (
         |$points)
         |SELECT merge_rounds, total_chars, total_tokens,
         |  CAST(total_chars * 1000000 // total_tokens AS BIGINT)
         |    AS chars_per_token_ppm
         |FROM pts""".stripMargin
  }

  val q107Oracle: String = {
    val SS = "chr(31) || chr(31)"
    val head =
      """WITH ww AS (
        |  SELECT source, doc_id, w FROM (
        |    SELECT source, doc_id,
        |      unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |w AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM ww GROUP BY 1),""".stripMargin
    val tail =
      s"""tok AS (
         |  SELECT w, CAST(len(string_split(
         |      substr(repr, 2, length(repr) - 2), $SS)) AS BIGINT) AS n_tok
         |  FROM r$BpeTrainRounds),
         |sw AS (
         |  SELECT source, w, CAST(count(*) AS BIGINT) AS occ
         |  FROM ww GROUP BY 1, 2),
         |docs AS (
         |  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |  FROM ww GROUP BY 1),
         |agg AS (
         |  SELECT sw.source,
         |    CAST(sum(occ) AS BIGINT) AS n_words,
         |    CAST(sum(occ * length(sw.w)) AS BIGINT) AS n_chars,
         |    CAST(sum(occ * n_tok) AS BIGINT) AS n_bpe_tokens
         |  FROM sw JOIN tok ON sw.w = tok.w GROUP BY 1)
         |SELECT d.source, d.n_docs, a.n_words, a.n_chars, a.n_bpe_tokens
         |FROM agg a JOIN docs d ON a.source = d.source""".stripMargin
    head + "\n" + bpeRoundCtes(carryWord = true) + ",\n" + tail
  }

  /** q106 — SPAN-level benchmark decontamination (q75's sibling): q75
    * flags contaminated documents; this emits the contaminated token
    * RANGES a pipeline would actually excise. Positional 3-token
    * shingles of corpus docs are joined against the (broadcast-sized,
    * fixed) benchmark shingle set, and each hit's covered positions
    * [i, i+2] are merged into maximal spans with the q80 sweep-line
    * (running max of interval ends marks span starts — one shuffle on
    * doc_id, two window passes, no self-join). Contiguous coverage
    * merges: a hit starting at most one past the previous furthest
    * end extends the span.
    *
    * Output: (doc_id, start_tok, end_tok, n_hits) — 1-based inclusive
    * token positions, one row per maximal contaminated span.
    */
  def q106ContamSpans(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), " +
          "i -> struct(i AS s, concat_ws(' ', slice(toks, i, 3)) AS shingle))"))
        .as("p"))
      .select(col("doc_id"), col("p.s").as("s"), col("p.shingle").as("shingle"))
      .transform(Materialize.once) // shared by the bench + corpus branches
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("shingle")).distinct()
    val hits = sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "shingle")
      .select(col("doc_id"), col("s"), (col("s") + 2).as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    hits
      .withColumn("pme",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        (col("pme").isNull || col("pme") + 1 < col("s")).cast("long"))
      .withColumn("grp", sum(col("new_span")).over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("s")).as("start_tok"), max(col("e")).as("end_tok"),
        count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"), col("n_hits"))
  }

  val q106Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CAST(i AS INT) AS s,
      |    array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
      |  FROM t, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) u(i)),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT doc_id, s, s + 2 AS e FROM sh
      |  WHERE doc_id % 97 <> 0
      |    AND shingle IN (SELECT shingle FROM bench)),
      |marked AS (
      |  SELECT doc_id, s, e,
      |    max(e) OVER (PARTITION BY doc_id ORDER BY s
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS pme
      |  FROM hits),
      |grouped AS (
      |  SELECT doc_id, s, e,
      |    CAST(sum(CASE WHEN pme IS NULL OR pme + 1 < s THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY s
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS grp
      |  FROM marked)
      |SELECT doc_id, CAST(min(s) AS INT) AS start_tok,
      |  CAST(max(e) AS INT) AS end_tok,
      |  CAST(count(*) AS BIGINT) AS n_hits
      |FROM grouped GROUP BY doc_id, grp""".stripMargin

  /** q112 — corpus-internal duplicated-substring spans: the
    * shingle-level approximation of suffix-array exact-substring
    * dedup (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022 — their unit is a ≥50-token repeated
    * substring; here 8-token shingles at test scale). Any 8-token
    * window whose text occurs MORE THAN ONCE in the corpus marks its
    * positions; per document, overlapping marks merge into maximal
    * spans with the q80/q106 sweep-line. Unlike q106 (contamination
    * against a fixed benchmark set), the duplicated-gram table is
    * corpus-scale, so the hits join shuffles on the gram key — no
    * broadcast — and the rest is one window pass per doc.
    *
    * Output: (doc_id, start_tok, end_tok, n_hits) — the ranges an
    * exact-substring dedup pass would excise or count.
    */
  def q112DupSubstrings(spark: SparkSession, dir: String): DataFrame =
    dupSubstringSpans(spark, dir)

  /** Shared span pipeline for q112 (detection) and q113 (removal):
    * positional 8-gram census → duplicated grams (occ > 1, corpus-scale
    * shuffle on the gram key) → per-doc sweep-line merge into maximal
    * spans. Output (doc_id, start_tok, end_tok, n_hits), 1-based
    * inclusive, spans disjoint and separated by ≥1 kept token.
    */
  private def dupSubstringSpans(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 7), " +
          "i -> struct(i AS s, concat_ws(' ', slice(toks, i, 8)) AS g))"))
        .as("p"))
      .select(col("doc_id"), col("p.s").as("s"), col("p.g").as("g"))
      .transform(Materialize.once) // duplicate census + hits join
    val dup = sh.groupBy(col("g"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
      .select(col("g"))
    val hits = sh.join(dup, Seq("g"))
      .select(col("doc_id"), col("s"), (col("s") + 7).as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    hits
      .withColumn("pme",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        (col("pme").isNull || col("pme") + 1 < col("s")).cast("long"))
      .withColumn("grp", sum(col("new_span")).over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("s")).as("start_tok"), max(col("e")).as("end_tok"),
        count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"), col("n_hits"))
  }

  /** q113 — duplicated-substring REMOVAL: the excision step q112 only
    * locates (Lee et al. ACL 2022 drop every occurrence of a repeated
    * substring; a keep-one-copy policy is the document-level dedup
    * tier's job, q20/q78). Every token covered by a merged duplicate
    * span is cut and the document re-assembled from the survivors.
    *
    * Scale shape: the only corpus-scale shuffle is the gram census the
    * spans already need. The excision itself never explodes tokens into
    * a shuffle — spans collapse to one array per affected doc (bounded
    * by doc length), broadcast-free equi-join back on doc_id, and the
    * cut is a codegen'd filter-with-index lambda over the token array
    * inside the scan's stage. Docs with nothing to cut pass through the
    * left join untouched.
    *
    * Output: (doc_id, n_tokens, n_removed, cleaned_text) — whitespace-
    * normalized rebuild, empty string when everything was duplicated.
    */
  def q113DupRemoval(spark: SparkSession, dir: String): DataFrame =
    exciseSpans(spark, dir, dupSubstringSpans(spark, dir))

  /** Shared excision step for q113/q119: cut every token covered by a
    * span and rebuild. Spans collapse to one array per affected doc,
    * equi-join back on doc_id, codegen'd filter-with-index lambda in
    * the scan stage — tokens never explode into a shuffle.
    */
  private def exciseSpans(spark: SparkSession, dir: String,
                          spans: DataFrame): DataFrame = {
    val spanAgg = spans
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("spans"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .join(spanAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(expr(
          "aggregate(spans, 0L, (acc, sp) -> acc + sp.end_tok - sp.start_tok + 1)"),
          lit(0L)).as("n_removed"),
        expr(
          "array_join(filter(toks, (t, i) -> spans IS NULL OR NOT exists(spans, " +
            "sp -> sp.start_tok <= i + 1 AND i + 1 <= sp.end_tok)), ' ')")
          .as("cleaned_text"))
  }

  /** q119 — exact-substring dedup with KEEP-FIRST semantics: the full
    * Lee et al. (ACL 2022) policy. q113 drops EVERY occurrence of a
    * duplicated 8-gram; here each duplicated gram's canonical
    * occurrence — the globally first by (doc_id, position) — survives,
    * and only the non-canonical occurrences are marked, swept into
    * spans, and excised. One copy of every repeated substring remains
    * in the corpus.
    *
    * The canonical choice is a min-struct aggregate riding on the gram
    * census the pipeline already shuffles for — no extra corpus-scale
    * stage vs q113. A hit is non-canonical iff its (doc_id, s) differs
    * from the gram's minimum, an O(1) filter inside the census join.
    */
  def q119DupKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 7), " +
          "i -> struct(i AS s, concat_ws(' ', slice(toks, i, 8)) AS g))"))
        .as("p"))
      .select(col("doc_id"), col("p.s").as("s"), col("p.g").as("g"))
      .transform(Materialize.once) // census + hits join
    val census = sh.groupBy(col("g"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("s"))).as("canon"))
      .filter(col("occ") > 1)
      .select(col("g"), col("canon"))
    val hits = sh.join(census, Seq("g"))
      .filter(!(col("doc_id") === col("canon.doc_id") &&
        col("s") === col("canon.s")))
      .select(col("doc_id"), col("s"), (col("s") + 7).as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val spans = hits
      .withColumn("pme",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        (col("pme").isNull || col("pme") + 1 < col("s")).cast("long"))
      .withColumn("grp", sum(col("new_span")).over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("s")).as("start_tok"), max(col("e")).as("end_tok"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"))
    exciseSpans(spark, dir, spans)
  }

  val q112Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CAST(i AS INT) AS s,
      |    array_to_string(list_slice(toks, i, i + 7), ' ') AS g
      |  FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) u(i)),
      |dup AS (SELECT g FROM sh GROUP BY g HAVING count(*) > 1),
      |hits AS (
      |  SELECT doc_id, s, s + 7 AS e FROM sh
      |  WHERE g IN (SELECT g FROM dup)),
      |marked AS (
      |  SELECT doc_id, s, e,
      |    max(e) OVER (PARTITION BY doc_id ORDER BY s
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS pme
      |  FROM hits),
      |grouped AS (
      |  SELECT doc_id, s, e,
      |    CAST(sum(CASE WHEN pme IS NULL OR pme + 1 < s THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY s
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS grp
      |  FROM marked)
      |SELECT doc_id, CAST(min(s) AS INT) AS start_tok,
      |  CAST(max(e) AS INT) AS end_tok,
      |  CAST(count(*) AS BIGINT) AS n_hits
      |FROM grouped GROUP BY doc_id, grp""".stripMargin

  val q113Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CAST(i AS INT) AS s,
      |    array_to_string(list_slice(toks, i, i + 7), ' ') AS g
      |  FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) u(i)),
      |dup AS (SELECT g FROM sh GROUP BY g HAVING count(*) > 1),
      |hits AS (
      |  SELECT doc_id, s, s + 7 AS e FROM sh
      |  WHERE g IN (SELECT g FROM dup)),
      |marked AS (
      |  SELECT doc_id, s, e,
      |    max(e) OVER (PARTITION BY doc_id ORDER BY s
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS pme
      |  FROM hits),
      |grouped AS (
      |  SELECT doc_id, s, e,
      |    sum(CASE WHEN pme IS NULL OR pme + 1 < s THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY s
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM marked),
      |spans AS (
      |  SELECT doc_id, min(s) AS s, max(e) AS e
      |  FROM grouped GROUP BY doc_id, grp),
      |pos AS (
      |  SELECT doc_id, CAST(i AS INT) AS s, toks[CAST(i AS INT)] AS tok
      |  FROM t, unnest(range(1, len(toks) + 1)) u(i)),
      |kept AS (
      |  SELECT p.doc_id, p.s, p.tok FROM pos p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM spans sp
      |    WHERE sp.doc_id = p.doc_id AND sp.s <= p.s AND p.s <= sp.e)),
      |reb AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY s) AS cleaned_text
      |  FROM kept GROUP BY doc_id),
      |rem AS (
      |  SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_removed
      |  FROM spans GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |  coalesce(rem.n_removed, CAST(0 AS BIGINT)) AS n_removed,
      |  coalesce(reb.cleaned_text, '') AS cleaned_text
      |FROM t LEFT JOIN rem USING (doc_id) LEFT JOIN reb USING (doc_id)""".stripMargin

  /** q114 — register-exact HyperLogLog distinct-count sketch
    * ([[graft.functions.HllAgg]]): per-language distinct-token
    * cardinality. q47 already exercises Spark's built-in
    * `approx_count_distinct`, but its HLL++/xxhash registers are
    * opaque to any other engine, so the oracle there can only check a
    * tolerance band. This sketch runs the SAME algorithm over the
    * SQL-portable hash, so the DuckDB oracle rebuilds every register
    * and hash-matches the harmonic denominator, the zero-register
    * count, and the integer raw estimate — the sketch algebra itself
    * is the thing under test. `n_exact` rides along as the quality
    * yardstick (and is what the 100 TB deployment would NOT compute:
    * the sketch ships 64 ints per group instead of a distinct-token
    * shuffle).
    */
  def q114HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HllAgg
    val toks = Tables.load(spark, dir, "documents")
      .select(col("lang"), explode_outer(wsTokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      // consumed by the sketch and the exact yardstick — one pass
      .transform(Materialize.once)
    val sketch = toks.groupBy(col("lang"))
      .agg(HllAgg.udaf(col("token")).as("reg"))
    val exact = toks.groupBy(col("lang"))
      .agg(countDistinct(col("token")).as("n_exact"))
    // denom is the harmonic sum scaled by 2^(Width+1) (empty register
    // contributes 2^26), so the numerator carries the same scale
    val num = (HllAgg.AlphaMilli * HllAgg.M * HllAgg.M) << (HllAgg.Width + 1)
    sketch.join(exact, Seq("lang"))
      .withColumn("n_zero",
        expr("size(filter(reg, r -> r = 0))").cast("long"))
      .withColumn("denom",
        expr("aggregate(reg, 0L, (acc, r) -> acc + shiftleft(1L, 26 - r))"))
      .withColumn("est_hll", expr(s"${num}L div (1000L * denom)"))
      .select(col("lang"), col("n_zero"), col("denom"), col("est_hll"),
        // Flajolet small-range rule: below 2.5m with empty registers,
        // a consumer applies linear counting m·ln(m/V) — float, so the
        // flag (exact integers) is emitted rather than the correction
        (col("est_hll") < lit(5L * HllAgg.M / 2) && col("n_zero") > 0)
          .cast("int").as("small_range"),
        col("n_exact"))
  }

  val q114Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH tok0 AS (
       |  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |tok AS (SELECT DISTINCT lang, tok FROM tok0 WHERE tok IS NOT NULL),
       |h0 AS (
       |  SELECT lang,
       |    list_reduce(list_transform(range(1, length(tok)+1),
       |      i -> ascii(tok[i])::BIGINT),
       |      (a, b) -> (a * $Base + b) % $Mod) AS hraw
       |  FROM tok),
       |h AS (
       |  SELECT lang,
       |    ((hraw + $Shift) % $Mod) * ((hraw + $Shift) % $Mod) % $Mod AS hv
       |  FROM h0),
       |r AS (
       |  SELECT lang, CAST(hv % 64 AS INT) AS b,
       |    CASE WHEN hv // 64 = 0 THEN 26
       |         ELSE 26 - length(bin(hv // 64)) END AS rho
       |  FROM h),
       |regs AS (SELECT lang, b, max(rho) AS m FROM r GROUP BY lang, b),
       |grid AS (
       |  SELECT l.lang, CAST(t.b AS INT) AS b
       |  FROM (SELECT DISTINCT lang FROM documents) l, range(0, 64) t(b)),
       |fr AS (
       |  SELECT g.lang, coalesce(regs.m, 0) AS m
       |  FROM grid g LEFT JOIN regs ON g.lang = regs.lang AND g.b = regs.b),
       |agg AS (
       |  SELECT lang,
       |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |    CAST(sum(1::BIGINT << (26 - m)) AS BIGINT) AS denom
       |  FROM fr GROUP BY lang),
       |ex AS (
       |  SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
       |  FROM tok GROUP BY lang),
       |est AS (
       |  SELECT lang, n_zero, denom,
       |    (2904064::BIGINT << 26) // (1000::BIGINT * denom) AS est_hll
       |  FROM agg)
       |SELECT e.lang, e.n_zero, e.denom, e.est_hll,
       |  CAST(CASE WHEN e.est_hll < 160 AND e.n_zero > 0
       |       THEN 1 ELSE 0 END AS INT) AS small_range,
       |  ex.n_exact
       |FROM est e JOIN ex USING (lang)""".stripMargin
  }

  /** q116 — model-based quality scoring via the hashing trick
    * ([[graft.functions.HashedLinearScore]]): the classifier-filter
    * stage of an LLM data pipeline (fastText-style linear model over
    * hashed bag-of-words), complementing the RULE-based gates of
    * q42/q43. The whole model evaluation is one codegen'd expression
    * inside the scan stage — no explode, no shuffle, no feature
    * vector; 100 TB cost is exactly one corpus read. The oracle
    * replays hash → bucket → weight → multiset sum bit-for-bit.
    */
  def q116QualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val score = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HashedLinearScore(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          wsTokens(col("text")))))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        wsTokenCount(col("text")).cast("long").as("n_tokens"),
        score.as("score"))
      .withColumn("keep", (col("score") > 0).cast("int"))
  }

  val q116Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |h AS (
       |  SELECT doc_id,
       |    list_reduce(list_transform(range(1, length(tok)+1),
       |      i -> ascii(tok[i])::BIGINT),
       |      (a, b) -> (a * $Base + b) % $Mod) AS hv
       |  FROM tok),
       |w AS (
       |  SELECT doc_id,
       |    ((((hv + 2 * $Shift) % $Mod) * ((hv + 2 * $Shift) % $Mod) % $Mod)
       |      % 1024) % 13 - 6 AS w
       |  FROM h),
       |s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score FROM w GROUP BY doc_id)
       |SELECT t.doc_id, t.source, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  s.score,
       |  CAST(CASE WHEN s.score > 0 THEN 1 ELSE 0 END AS INT) AS keep
       |FROM t JOIN s USING (doc_id)""".stripMargin
  }

  /** q117 — distributed quantiles via a MERGEABLE fixed-width
    * histogram: the scale path q37/q46 only allude to. An exact
    * quantile needs a global sort; `approx_percentile`'s t-digest is
    * engine-opaque. A bin-count histogram is both mergeable (counts
    * add — partial aggregation ships one long per occupied bin) and
    * exactly replayable: the quantile's BIN LOWER BOUND is a
    * deterministic integer both engines agree on, with resolution =
    * bin width (16 chars here). Shape: one corpus-scale groupBy on
    * (lang, bin), then a bins-per-lang-sized window — at 100 TB the
    * second stage is KB-sized however large the corpus.
    */
  def q117HistQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val bins = Tables.load(spark, dir, "documents")
      .select(col("lang"), expr("n_chars div 16").as("bin"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang")).orderBy(col("bin"))
    bins
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n_docs", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(
        max(col("n_docs")).as("n_docs"),
        min(when(col("cum") * 100 >= col("n_docs") * 50, col("bin") * 16))
          .as("p50_lb"),
        min(when(col("cum") * 100 >= col("n_docs") * 90, col("bin") * 16))
          .as("p90_lb"),
        min(when(col("cum") * 100 >= col("n_docs") * 99, col("bin") * 16))
          .as("p99_lb"))
  }

  val q117Oracle: String =
    """WITH c AS (
      |  SELECT lang, n_chars // 16 AS bin, CAST(count(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY lang, bin),
      |cum AS (
      |  SELECT lang, bin, cnt,
      |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
      |    sum(cnt) OVER (PARTITION BY lang) AS n_docs
      |  FROM c)
      |SELECT lang, CAST(max(n_docs) AS BIGINT) AS n_docs,
      |  CAST(min(CASE WHEN cum * 100 >= n_docs * 50 THEN bin * 16 END) AS BIGINT)
      |    AS p50_lb,
      |  CAST(min(CASE WHEN cum * 100 >= n_docs * 90 THEN bin * 16 END) AS BIGINT)
      |    AS p90_lb,
      |  CAST(min(CASE WHEN cum * 100 >= n_docs * 99 THEN bin * 16 END) AS BIGINT)
      |    AS p99_lb
      |FROM cum GROUP BY lang""".stripMargin

  val q119Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CAST(i AS INT) AS s,
      |    array_to_string(list_slice(toks, i, i + 7), ' ') AS g
      |  FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) u(i)),
      |canon AS (
      |  SELECT g, doc_id AS cdoc, s AS cs FROM (
      |    SELECT g, doc_id, s,
      |      row_number() OVER (PARTITION BY g ORDER BY doc_id, s) AS rn,
      |      count(*) OVER (PARTITION BY g) AS occ
      |    FROM sh) WHERE rn = 1 AND occ > 1),
      |hits AS (
      |  SELECT sh.doc_id, sh.s, sh.s + 7 AS e
      |  FROM sh JOIN canon ON sh.g = canon.g
      |  WHERE NOT (sh.doc_id = canon.cdoc AND sh.s = canon.cs)),
      |marked AS (
      |  SELECT doc_id, s, e,
      |    max(e) OVER (PARTITION BY doc_id ORDER BY s
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS pme
      |  FROM hits),
      |grouped AS (
      |  SELECT doc_id, s, e,
      |    sum(CASE WHEN pme IS NULL OR pme + 1 < s THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY s
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM marked),
      |spans AS (
      |  SELECT doc_id, min(s) AS s, max(e) AS e
      |  FROM grouped GROUP BY doc_id, grp),
      |pos AS (
      |  SELECT doc_id, CAST(i AS INT) AS s, toks[CAST(i AS INT)] AS tok
      |  FROM t, unnest(range(1, len(toks) + 1)) u(i)),
      |kept AS (
      |  SELECT p.doc_id, p.s, p.tok FROM pos p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM spans sp
      |    WHERE sp.doc_id = p.doc_id AND sp.s <= p.s AND p.s <= sp.e)),
      |reb AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY s) AS cleaned_text
      |  FROM kept GROUP BY doc_id),
      |rem AS (
      |  SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_removed
      |  FROM spans GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |  coalesce(rem.n_removed, CAST(0 AS BIGINT)) AS n_removed,
      |  coalesce(reb.cleaned_text, '') AS cleaned_text
      |FROM t LEFT JOIN rem USING (doc_id) LEFT JOIN reb USING (doc_id)""".stripMargin

  /** q121 — k-anonymous release (Sweeney 2002, the suppression form):
    * publish per-(lang, source) corpus stats only where the group has
    * ≥ k = 5 members; smaller groups collapse into one __suppressed__
    * residual per lang, and a residual that STILL has < k members is
    * withheld entirely (publishing it would re-identify the tail).
    * The privacy row of the pipeline tier: what a corpus-stats export
    * runs before leaving the trust boundary. Deterministic set
    * algebra — no noise — so the oracle hash-matches. Scale: two
    * partial-aggregated shuffles on group keys, group-count-sized.
    */
  def q121Kanon(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val g = Tables.load(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      // consumed by both the publish and the residual branches
      .transform(Materialize.once)
    val ok = g.filter(col("n_docs") >= k)
    val residual = g.filter(col("n_docs") < k)
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_chars")).as("sum_chars"))
      .filter(col("n_docs") >= k)
      .select(col("lang"), lit("__suppressed__").as("source"),
        col("n_docs"), col("sum_chars"))
    ok.select(col("lang"), col("source"), col("n_docs"), col("sum_chars"))
      .unionByName(residual)
  }

  val q121Oracle: String =
    """WITH g AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |  FROM documents GROUP BY lang, source),
      |ok AS (
      |  SELECT lang, source, n_docs, sum_chars FROM g WHERE n_docs >= 5),
      |residual AS (
      |  SELECT lang, '__suppressed__' AS source,
      |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |    CAST(sum(sum_chars) AS BIGINT) AS sum_chars
      |  FROM g WHERE n_docs < 5 GROUP BY lang
      |  HAVING sum(n_docs) >= 5)
      |SELECT lang, source, n_docs, sum_chars FROM ok
      |UNION ALL
      |SELECT lang, source, n_docs, sum_chars FROM residual""".stripMargin

  /** q124 — scalable dense ID assignment: the global
    * `row_number() OVER (ORDER BY ...)` every naive pipeline writes —
    * and PlanShapeSpec bans — done the way that survives 100 TB.
    * Range-partition by the sort key, rank WITHIN each partition, and
    * add per-partition offsets (a partition-count-sized prefix sum —
    * the ONE intended tiny global window, whitelisted). Because range
    * partitions are contiguous in key order and (source, doc_id) is a
    * strict total order, offset + local rank IS the global dense rank,
    * independent of where the sampled range boundaries land. This is
    * the training-example-numbering / shard-assignment primitive.
    */
  def q124StableIds(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .repartitionByRange(col("source"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      // pid must be IDENTICAL in the rank and offset branches — pin it
      .transform(Materialize.once)
    val local = d.withColumn("lrank",
      row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("source"), col("doc_id"))))
    val offsets = d.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    local.join(broadcast(offsets), Seq("pid"))
      .select(col("doc_id"), col("source"),
        (col("offset") + col("lrank")).as("stable_id"))
  }

  val q124Oracle: String =
    """SELECT doc_id, source,
      |  row_number() OVER (ORDER BY source, doc_id) AS stable_id
      |FROM documents""".stripMargin

  /** q130 — rolling distinct via STORED-SKETCH merging: the lakehouse
    * pattern q114's mergeability exists for. Per synthetic day
    * (doc_id mod 7), persistable HLL registers track the day's
    * distinct tokens; the cumulative distinct-to-date then comes from
    * merging the STORED registers (zip_with greatest over the window's
    * register arrays — pure codegen built-ins), never rescanning
    * earlier days. The exact rolling count rides along via the q98
    * first-occurrence trick (min-day per token + cumulative histogram)
    * as the quality yardstick. At 100 TB: day registers are 64 ints in
    * a summary table; the rolling union is arithmetic on those,
    * independent of corpus size.
    */
  def q130HllRolling(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HllAgg
    val num = (HllAgg.AlphaMilli * HllAgg.M * HllAgg.M) << (HllAgg.Width + 1)
    val toks = Tables.load(spark, dir, "documents")
      .select(pmod(col("doc_id"), lit(7)).cast("int").as("day"),
        explode_outer(wsTokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      // consumed by the sketch AND the exact first-day yardstick
      .transform(Materialize.once)
    val daily = toks.groupBy(col("day"))
      .agg(HllAgg.udaf(col("token")).as("reg"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rolled = daily
      .withColumn("regs", collect_list(col("reg")).over(w))
      .withColumn("rreg", expr(
        "aggregate(regs, transform(sequence(1, 64), x -> 0), " +
          "(acc, r) -> zip_with(acc, r, (a, b) -> greatest(a, b)))"))
      .select(col("day"),
        expr("aggregate(reg, 0L, (acc, r) -> acc + shiftleft(1L, 26 - r))")
          .as("dd"),
        expr("aggregate(rreg, 0L, (acc, r) -> acc + shiftleft(1L, 26 - r))")
          .as("rd"))
      .select(col("day"),
        expr(s"${num}L div (1000L * dd)").as("est_daily"),
        expr(s"${num}L div (1000L * rd)").as("est_rolling"))
    val firstDays = toks.groupBy(col("token"))
      .agg(min(col("day")).as("first_day"))
      .groupBy(col("first_day")).agg(count(lit(1)).as("novel"))
    val wd = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // day spine: left-join onto the rolled frame so a day with no
    // first-seen tokens still gets its rolling count — the windowed
    // sum skips the null novel and the cumulative stays correct
    rolled
      .join(firstDays.withColumnRenamed("first_day", "day"), Seq("day"), "left")
      .withColumn("n_exact_rolling",
        coalesce(sum(col("novel")).over(wd), lit(0L)))
      .select(col("day"), col("est_daily"), col("est_rolling"),
        col("n_exact_rolling"))
  }

  val q130Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH tok0 AS (
       |  SELECT CAST(doc_id % 7 AS INT) AS day,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |tok AS (SELECT DISTINCT day, tok FROM tok0 WHERE tok IS NOT NULL),
       |h0 AS (
       |  SELECT day, tok,
       |    list_reduce(list_transform(range(1, length(tok)+1),
       |      i -> ascii(tok[i])::BIGINT),
       |      (a, b) -> (a * $Base + b) % $Mod) AS hraw
       |  FROM tok),
       |h AS (
       |  SELECT day,
       |    ((hraw + $Shift) % $Mod) * ((hraw + $Shift) % $Mod) % $Mod AS hv
       |  FROM h0),
       |r AS (
       |  SELECT day, CAST(hv % 64 AS INT) AS b,
       |    CASE WHEN hv // 64 = 0 THEN 26
       |         ELSE 26 - length(bin(hv // 64)) END AS rho
       |  FROM h),
       |regs AS (SELECT day, b, max(rho) AS m FROM r GROUP BY day, b),
       |grid AS (
       |  SELECT d.day, CAST(t.b AS INT) AS b
       |  FROM (SELECT DISTINCT CAST(doc_id % 7 AS INT) AS day
       |        FROM documents) d, range(0, 64) t(b)),
       |fr AS (
       |  SELECT g.day, g.b, coalesce(regs.m, 0) AS m
       |  FROM grid g LEFT JOIN regs ON g.day = regs.day AND g.b = regs.b),
       |rolled AS (
       |  SELECT day, b, m,
       |    max(m) OVER (PARTITION BY b ORDER BY day
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS rm
       |  FROM fr),
       |agg AS (
       |  SELECT day,
       |    CAST(sum(1::BIGINT << (26 - m)) AS BIGINT) AS dd,
       |    CAST(sum(1::BIGINT << (26 - rm)) AS BIGINT) AS rd
       |  FROM rolled GROUP BY day),
       |est AS (
       |  SELECT day,
       |    (2904064::BIGINT << 26) // (1000::BIGINT * dd) AS est_daily,
       |    (2904064::BIGINT << 26) // (1000::BIGINT * rd) AS est_rolling
       |  FROM agg),
       |fd AS (SELECT tok, min(day) AS first_day FROM tok GROUP BY tok),
       |novel AS (SELECT first_day, count(*) AS novel FROM fd GROUP BY first_day),
       |ex AS (
       |  SELECT e.day,
       |    coalesce(CAST(sum(n.novel) OVER (ORDER BY e.day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
       |      CAST(0 AS BIGINT)) AS n_exact_rolling
       |  FROM est e LEFT JOIN novel n ON n.first_day = e.day)
       |SELECT e.day, e.est_daily, e.est_rolling, ex.n_exact_rolling
       |FROM est e JOIN ex USING (day)""".stripMargin
  }

  /** q131 — shard assignment for training export: carve the q124
    * dense-ID order into 16 contiguous shards
    * (shard = (stable_id−1)·16 div N) and report each shard's
    * document count and token mass — the balance report a data loader
    * reads before an epoch. Contiguity in (source, doc_id) order keeps
    * each shard's files co-located with the range partitioning that
    * produced the IDs; the corpus-count scalar is a broadcast 1-row
    * aggregate (the q86/q91 pattern).
    */
  def q131ShardBalance(spark: SparkSession, dir: String): DataFrame = {
    val ids = q124StableIds(spark, dir)
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokenCount(col("text")).cast("long").as("n_tokens"))
    val total = ids.agg(count(lit(1)).as("n_total"))
    ids.join(toks, Seq("doc_id"))
      .crossJoin(broadcast(total))
      .withColumn("shard",
        expr("((stable_id - 1) * 16) div n_total").cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
  }

  val q131Oracle: String =
    """WITH ids AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY source, doc_id) AS stable_id,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |  FROM documents),
      |t AS (SELECT count(*) AS n_total FROM documents)
      |SELECT CAST(((stable_id - 1) * 16) // n_total AS INT) AS shard,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM ids, t GROUP BY shard""".stripMargin

  /** q133 — posting-list compression accounting: the index-engineering
    * step that decides how a retrieval index is laid out on disk. For
    * each head-of-vocabulary token (df ≥ 20, the q99 bound), walk the
    * doc_id-sorted posting list as DELTA GAPS (first gap = doc_id + 1,
    * so every gap ≥ 1) and price the Lucene-style varint encoding:
    * ceil(bitlen(gap)/7) bytes per gap, where bitlen = length(bin(gap))
    * — all-integer, so both engines agree bit-for-bit. Reported next to
    * the raw 8-byte/posting cost as savings in ppm.
    *
    * Scale shape: one (token, doc_id) aggregate (the same shuffle q99's
    * index build pays), then the gap window PARTITION BY token rides
    * that shuffle's partitioning — no second exchange. Output is
    * head-of-vocab sized. At 100 TB the per-token row is exactly the
    * sizing entry a shard planner feeds to its storage budget.
    */
  def q133PostingBytes(spark: SparkSession, dir: String): DataFrame = {
    val posting = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    posting
      .withColumn("gap",
        col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(-1L)))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        sum(expr("(length(bin(gap)) + 6) div 7")).as("varint_bytes"),
        max(expr("length(bin(gap))")).as("max_gap_bits"))
      .filter(col("df") >= 20)
      .withColumn("raw_bytes", col("df") * lit(8L))
      .withColumn("savings_ppm",
        expr("((raw_bytes - varint_bytes) * 1000000L) div raw_bytes"))
  }

  val q133Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |p AS (
      |  SELECT token, doc_id FROM t GROUP BY token, doc_id),
      |g AS (
      |  SELECT token,
      |    doc_id - coalesce(lag(doc_id) OVER (PARTITION BY token ORDER BY doc_id),
      |                      -1) AS gap
      |  FROM p),
      |agg AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS df,
      |    CAST(sum((length(bin(gap)) + 6) // 7) AS BIGINT) AS varint_bytes,
      |    CAST(max(length(bin(gap))) AS INT) AS max_gap_bits
      |  FROM g GROUP BY token HAVING count(*) >= 20)
      |SELECT token, df, varint_bytes, max_gap_bits,
      |  df * 8 AS raw_bytes,
      |  ((df * 8 - varint_bytes) * 1000000) // (df * 8) AS savings_ppm
      |FROM agg""".stripMargin

  /** q138 — Pareto-frontier curation (2-D skyline): keep the documents
    * no other document beats on BOTH length and lexical diversity —
    * the multi-criteria "best exemplars" selection a single weighted
    * score can't express (any weighting picks one frontier point; the
    * skyline returns them all). Dominance: b dominates a iff
    * b.n_tokens ≥ a.n_tokens AND b.div_ppm ≥ a.div_ppm with one strict.
    *
    * The naive skyline is an all-pairs NOT EXISTS — O(n²) and banned.
    * The scale shape here is the sorted-sweep identity: on DISTINCT
    * (x, y) pairs sorted by (x desc, y desc), a pair is on the skyline
    * iff its y strictly exceeds every earlier y — a running max. That
    * global order is realized WITHOUT a global window by q124's
    * two-phase trick: range-partition by (x desc, y desc), per-partition
    * running max, then a partition-count-sized prefix-max spine joined
    * back broadcast. Metric space is distinct-pair-sized (≤ corpus),
    * the sweep is one range exchange, and doc ids rejoin by (x, y) key.
    * The oracle is the O(n²) NOT EXISTS — completeness proof, not the
    * plan.
    */
  def q138Skyline(spark: SparkSession, dir: String): DataFrame = {
    val metrics = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"))
      .filter(col("n_tokens") > 0)
      .withColumn("div_ppm", expr("(n_types * 1000000L) div n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("div_ppm"))
      // consumed by the sweep AND the id join-back
      .transform(Materialize.once)
    val pairs = metrics.select(col("n_tokens"), col("div_ppm")).distinct()
      .repartitionByRange(col("n_tokens").desc, col("div_ppm").desc)
      .withColumn("pid", spark_partition_id())
      // pid must be IDENTICAL in the sweep and spine branches — pin it
      .transform(Materialize.once)
    val swept = pairs.withColumn("prev_y",
      max(col("div_ppm")).over(Window.partitionBy(col("pid"))
        .orderBy(col("n_tokens").desc, col("div_ppm").desc)
        .rowsBetween(Window.unboundedPreceding, -1)))
    val spine = pairs.groupBy(col("pid"))
      .agg(max(col("div_ppm")).as("pmax"))
      .withColumn("carry_y",
        max(col("pmax")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("pid"), col("carry_y"))
    val sky = swept.join(broadcast(spine), Seq("pid"))
      .withColumn("dom_y", greatest(
        coalesce(col("prev_y"), lit(Long.MinValue)),
        coalesce(col("carry_y"), lit(Long.MinValue))))
      .filter(col("div_ppm") > col("dom_y"))
      .select(col("n_tokens"), col("div_ppm"))
    metrics.join(sky, Seq("n_tokens", "div_ppm"))
      .select(col("doc_id"), col("n_tokens"), col("div_ppm"))
  }

  val q138Oracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_tokens,
      |    CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
      |      AS BIGINT) AS n_types
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, n_tokens,
      |    (n_types * 1000000) // n_tokens AS div_ppm
      |  FROM m WHERE n_tokens > 0)
      |SELECT a.doc_id, a.n_tokens, a.div_ppm
      |FROM d a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM d b
      |  WHERE b.n_tokens >= a.n_tokens AND b.div_ppm >= a.div_ppm
      |    AND (b.n_tokens > a.n_tokens OR b.div_ppm > a.div_ppm))""".stripMargin

  /** q142 — token burstiness (Church & Gale): a token that appears at
    * all in a document tends to appear AGAIN — the repeat probability
    * df₂/df₁ (docs with ≥2 occurrences over docs with ≥1) separates
    * bursty content words from evenly-sprinkled function words, which
    * matters when shingle- or tf-based dedup weights are tuned. Also
    * carries the mean within-doc tf (in ppm) for the head vocabulary.
    *
    * Scale shape: the (token, doc) tf aggregate is the same shuffle
    * q99's index build pays; the per-token rollup rides it. Output is
    * head-of-vocabulary sized. All-integer ratios.
    */
  def q142Burstiness(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("token"))
      .agg(
        count(lit(1)).as("df1"),
        sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("df2"),
        sum(col("tf")).as("occurrences"))
      .filter(col("df1") >= 20)
      .withColumn("burst_ppm", expr("(df2 * 1000000L) div df1"))
      .withColumn("mean_tf_ppm", expr("(occurrences * 1000000L) div df1"))
  }

  val q142Oracle: String =
    """WITH tf AS (
      |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
      |      AS token
      |    FROM documents)
      |  GROUP BY token, doc_id)
      |SELECT token, CAST(count(*) AS BIGINT) AS df1,
      |  CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
      |  CAST(sum(tf) AS BIGINT) AS occurrences,
      |  CAST((sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) * 1000000)
      |    // count(*) AS BIGINT) AS burst_ppm,
      |  CAST((sum(tf) * 1000000) // count(*) AS BIGINT) AS mean_tf_ppm
      |FROM tf GROUP BY token HAVING count(*) >= 20""".stripMargin

  /** q143 — Heaps'-law vocabulary growth: cumulative distinct-type
    * count as a function of cumulative token count, sampled at corpus
    * deciles — the curve that predicts vocabulary (and so tokenizer
    * and index) size at 10× the data from a prefix, and whose early
    * flattening is the classic symptom of a template-dominated crawl.
    *
    * Scale shape: corpus order is q124's two-phase dense ID (no global
    * window over data rows); each token's FIRST position is one
    * vocabulary-scale min-aggregate (q98's first-occurrence trick);
    * both cumulative curves then live on the 10-row decile spine.
    * Nothing data-sized is ever sorted globally or windowed.
    */
  def q143VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val ids = q124StableIds(spark, dir)
      .transform(Materialize.once) // consumed by totals, tokens, deciles
    val total = ids.agg(count(lit(1)).as("n_total"))
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
      .join(ids.select(col("doc_id"), col("stable_id")), Seq("doc_id"))
    val tokensPerDecile = toks.crossJoin(broadcast(total))
      .groupBy(expr("cast(((stable_id - 1) * 10) div n_total as int)")
        .as("decile"))
      .agg(count(lit(1)).as("n_tokens"))
    val newTypesPerDecile = toks.groupBy(col("token"))
      .agg(min(col("stable_id")).as("first_sid"))
      .crossJoin(broadcast(total))
      .groupBy(expr("cast(((first_sid - 1) * 10) div n_total as int)")
        .as("decile"))
      .agg(count(lit(1)).as("n_new_types"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokensPerDecile
      .join(newTypesPerDecile, Seq("decile"), "left")
      .na.fill(0L, Seq("n_new_types"))
      .select(col("decile"),
        sum(col("n_tokens")).over(w).as("cum_tokens"),
        sum(col("n_new_types")).over(w).as("cum_vocab"))
  }

  val q143Oracle: String =
    """WITH ids AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY source, doc_id) AS stable_id
      |  FROM documents),
      |tot AS (SELECT count(*) AS n_total FROM documents),
      |toks AS (
      |  SELECT i.stable_id, unnest(string_split_regex(trim(d.text), '\s+'))
      |    AS token
      |  FROM documents d JOIN ids i ON i.doc_id = d.doc_id),
      |tpd AS (
      |  SELECT CAST(((stable_id - 1) * 10) // n_total AS INT) AS decile,
      |    CAST(count(*) AS BIGINT) AS n_tokens
      |  FROM toks, tot GROUP BY 1),
      |fo AS (
      |  SELECT token, min(stable_id) AS first_sid FROM toks GROUP BY token),
      |npd AS (
      |  SELECT CAST(((first_sid - 1) * 10) // n_total AS INT) AS decile,
      |    CAST(count(*) AS BIGINT) AS n_new_types
      |  FROM fo, tot GROUP BY 1)
      |SELECT t.decile,
      |  CAST(sum(t.n_tokens) OVER (ORDER BY t.decile
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
      |  CAST(sum(coalesce(n.n_new_types, 0)) OVER (ORDER BY t.decile
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
      |FROM tpd t LEFT JOIN npd n ON n.decile = t.decile""".stripMargin

  /** q157 — cross-source quantile normalization: replace each
    * document's length with the POOLED distribution's value at the
    * same within-source rank fraction — the harmonization that makes
    * per-source metrics comparable when sources have systematically
    * different scales (the microarray-normalization trick, applied to
    * corpus stats). Position mapping is integer
    * (pos = max(1, rank_s·N div n_s)); the pooled order statistic at
    * pos resolves through the support spine's [lo, hi] cumulative
    * runs with the q49 bucket-explode range-join trick — an
    * equi-join, never a broadcast inequality scan.
    *
    * Scale shape: within-source ranks ride source-partitioned
    * windows; the pooled CDF lives on the SUPPORT spine (distinct
    * values — bucket first for continuous metrics); the lookup is one
    * bucket-keyed equi-join with interval replication bounded by
    * run-length/bucket-width.
    */
  def q157QuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        wsTokenCount(col("text")).cast("long").as("x"))
      .transform(Materialize.once) // ranks AND support read it
    val nAll = d.agg(count(lit(1)).as("n_all"))
    val pos = d
      .withColumn("rank_s", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("x"), col("doc_id"))))
      .withColumn("n_s",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .crossJoin(broadcast(nAll))
      .withColumn("pos", expr("greatest((rank_s * n_all) div n_s, 1L)"))
      .withColumn("bk", expr("pos div (n_all div 32 + 1)"))
      .select(col("doc_id"), col("source"), col("x"), col("pos"), col("bk"))
    val spine = d.groupBy(col("x")).agg(count(lit(1)).as("c"))
      .withColumn("hi",
        sum(col("c")).over(Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lo", col("hi") - col("c") + 1)
      .crossJoin(broadcast(nAll))
      .withColumn("bk", explode(expr(
        "sequence(lo div (n_all div 32 + 1), hi div (n_all div 32 + 1))")))
      .select(col("x").as("norm_x"), col("lo"), col("hi"), col("bk"))
    pos.join(spine, Seq("bk"))
      .filter(col("pos").between(col("lo"), col("hi")))
      .select(col("doc_id"), col("source"), col("x"), col("norm_x"))
  }

  val q157Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS x
      |  FROM documents),
      |na AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM d),
      |r AS (
      |  SELECT doc_id, source, x,
      |    row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
      |      AS rank_s,
      |    count(*) OVER (PARTITION BY source) AS n_s
      |  FROM d),
      |p AS (
      |  SELECT r.doc_id, r.source, r.x,
      |    greatest((r.rank_s * na.n_all) // r.n_s, 1) AS pos
      |  FROM r, na),
      |sup AS (SELECT x AS norm_x, CAST(count(*) AS BIGINT) AS c
      |        FROM d GROUP BY x),
      |sc AS (
      |  SELECT norm_x,
      |    CAST(sum(c) OVER (ORDER BY norm_x ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS hi,
      |    CAST(sum(c) OVER (ORDER BY norm_x ROWS UNBOUNDED PRECEDING)
      |      - c + 1 AS BIGINT) AS lo
      |  FROM sup)
      |SELECT p.doc_id, p.source, p.x, s.norm_x
      |FROM p JOIN sc s ON p.pos BETWEEN s.lo AND s.hi""".stripMargin

  /** q155 — re-sharding movement audit: when a 16-shard layout grows
    * to 17, what fraction of documents MOVE? Under mod-N assignment
    * nearly everything does (≈ 16/17); under rendezvous hashing
    * (highest-random-weight, Thaler & Ravishankar 1998) an ideal hash
    * moves only 1/17 — the reason consistent-placement schemes exist.
    * Measured here exactly with the SQL-portable squared-slot family
    * both engines replay (whose imperfect avalanche lands within a
    * small factor of the ideal rate — the measurement, not the ideal,
    * is what the audit reports). At 100 TB this is the table a store
    * reads before committing to a shard-count change, priced in rows
    * and token mass.
    *
    * Scale shape: pure per-row expressions (17 portable hashes per
    * doc for the HRW argmax, fused in one projection) + one
    * two-row-per-scheme aggregate. No shuffle beyond the final
    * scheme-sized rollup.
    */
  def q155Reshard(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash.{Mod, Shift}
    // HRW weight = the squared-slot family (PortableHash.slot — the
    // q21 MinHash hash family): the raw polynomial hash is monotone in
    // a trailing shard digit (no avalanche), which would make the
    // argmax collapse to the largest shard id; squaring mod M restores
    // per-slot independence. Ties break to the lower shard id
    // (array_position finds the FIRST max).
    def hrw(n: Int): org.apache.spark.sql.Column =
      expr(s"""array_position(
        |  transform(sequence(0, ${n - 1}),
        |    s -> ((h + s * ${Shift}L) % ${Mod}L)
        |         * ((h + s * ${Shift}L) % ${Mod}L) % ${Mod}L),
        |  array_max(transform(sequence(0, ${n - 1}),
        |    s -> ((h + s * ${Shift}L) % ${Mod}L)
        |         * ((h + s * ${Shift}L) % ${Mod}L) % ${Mod}L))) - 1
        |""".stripMargin)
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokenCount(col("text")).cast("long").as("w"))
      .withColumn("h", expr(
        "portable_string_hash(cast(doc_id as string))"))
      .withColumn("mod_moved",
        (pmod(col("h"), lit(16)) =!= pmod(col("h"), lit(17))).cast("long"))
      .withColumn("hrw_moved", (hrw(16) =!= hrw(17)).cast("long"))
    d.select(lit("mod").as("scheme"), col("mod_moved").as("moved"), col("w"))
      .unionByName(d.select(lit("rendezvous").as("scheme"),
        col("hrw_moved").as("moved"), col("w")))
      .groupBy(col("scheme"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("moved")).as("n_moved"),
        sum(col("w") * col("moved")).as("tokens_moved"))
      .withColumn("moved_ppm",
        expr("(n_moved * 1000000L) div n_docs"))
  }

  val q155Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    // the established replay idioms: q21's ascii-char fold for the
    // string hash and its squared-slot family for the HRW weights
    def h(e: String) =
      s"""list_reduce(list_transform(range(1, length($e) + 1),
         |      i -> ascii(($e)[i])::BIGINT),
         |    (a, b) -> (a * $Base + b) % $Mod)""".stripMargin
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
       |    CAST(doc_id AS VARCHAR) AS ds
       |  FROM documents),
       |hh AS (
       |  SELECT doc_id, w, ${h("ds")} AS h FROM base),
       |sh AS (
       |  SELECT doc_id, s,
       |    ((h + s * $Shift) % $Mod) * ((h + s * $Shift) % $Mod) % $Mod
       |      AS hs
       |  FROM hh, range(0, 17) r(s)),
       |mx AS (
       |  SELECT doc_id,
       |    max(CASE WHEN s < 16 THEN hs END) AS m16, max(hs) AS m17
       |  FROM sh GROUP BY doc_id),
       |pick AS (
       |  SELECT sh.doc_id,
       |    CAST(min(CASE WHEN sh.s < 16 AND sh.hs = mx.m16 THEN sh.s END)
       |      AS BIGINT) AS hrw16,
       |    CAST(min(CASE WHEN sh.hs = mx.m17 THEN sh.s END) AS BIGINT)
       |      AS hrw17
       |  FROM sh JOIN mx ON mx.doc_id = sh.doc_id GROUP BY sh.doc_id),
       |m AS (
       |  SELECT 'mod' AS scheme,
       |    CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END AS moved, w
       |  FROM hh
       |  UNION ALL
       |  SELECT 'rendezvous',
       |    CASE WHEN p.hrw16 <> p.hrw17 THEN 1 ELSE 0 END, hh.w
       |  FROM pick p JOIN hh ON hh.doc_id = p.doc_id)
       |SELECT scheme, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(moved) AS BIGINT) AS n_moved,
       |  CAST(sum(w * moved) AS BIGINT) AS tokens_moved,
       |  CAST((sum(moved) * 1000000) // count(*) AS BIGINT) AS moved_ppm
       |FROM m GROUP BY scheme""".stripMargin
  }

  /** q152 — systematic PPS sampling (Madow): select ~k documents with
    * probability proportional to token weight by walking the global
    * cumulative-weight axis and taking every item whose weight span
    * crosses a multiple of step = W div k — the DETERMINISTIC weighted
    * sampler (no random keys, no floats) whose inclusion probability
    * is exactly w·k/W, the design a token-budgeted eval or distillation
    * draw wants. A document heavier than step is selected with
    * multiplicity (reported), the textbook systematic-PPS behavior.
    *
    * Scale shape: the global cumulative weight is q124's two-phase
    * pattern (range exchange + partition-spine prefix sums — no
    * data-sized global window); the total-weight scalar broadcasts
    * into the crossing test, which is a per-row integer check.
    */
  def q152PpsSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 50
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokenCount(col("text")).cast("long").as("w"))
      .filter(col("w") > 0)
      .repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      // pid must be IDENTICAL in the cumsum and spine branches
      .transform(Materialize.once)
    val local = d.withColumn("lcum",
      sum(col("w")).over(Window.partitionBy(col("pid"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = d.groupBy(col("pid")).agg(sum(col("w")).as("pw"))
      .withColumn("offset",
        coalesce(sum(col("pw")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    val total = d.agg(sum(col("w")).as("tw"))
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("cum", col("offset") + col("lcum"))
      .crossJoin(broadcast(total))
      .withColumn("step", expr(s"tw div $k"))
      .withColumn("multiplicity",
        expr("(cum div step) - ((cum - w) div step)"))
      .filter(col("multiplicity") > 0)
      .select(col("doc_id"), col("w"), col("cum"), col("multiplicity"))
  }

  val q152Oracle: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
      |  FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) > 0),
      |c AS (
      |  SELECT doc_id, w,
      |    CAST(sum(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cum
      |  FROM w),
      |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
      |s AS (SELECT c.doc_id, c.w, c.cum, t.tw // 50 AS step FROM c, t)
      |SELECT doc_id, w, cum,
      |  (cum // step) - ((cum - w) // step) AS multiplicity
      |FROM s
      |WHERE (cum // step) - ((cum - w) // step) > 0""".stripMargin

  /** q151 — two-sample Kolmogorov–Smirnov drift screen: per source,
    * D = max |F_source(x) − F_corpus(x)| over document token lengths,
    * in ppm — the nonparametric "does this source's length
    * distribution match the corpus" test run before mixing a new crawl
    * in, stronger than comparing means/quantiles because it sees the
    * whole CDF. Both CDFs are integer rationals (cum·10⁶ div n)
    * evaluated at every corpus support point, so the statistic replays
    * bit-for-bit.
    *
    * Scale shape: the support is DISTINCT length values, not
    * documents; the corpus CDF rides one support-sized window (for a
    * continuous metric at 100 TB you bucket first, keeping the
    * support bounded — same shape); the per-source step functions come
    * from a support × source grid built by broadcasting the
    * source-count-sized census, with per-source cumulative windows on
    * the grid. Nothing document-sized is windowed.
    */
  def q151KsDrift(spark: SparkSession, dir: String): DataFrame = {
    val lengths = Tables.load(spark, dir, "documents")
      .select(col("source"), wsTokenCount(col("text")).cast("long").as("x"))
      .transform(Materialize.once) // support + census + counts read it
    val support = lengths.groupBy(col("x")).agg(count(lit(1)).as("c_all"))
      .withColumn("cum_all",
        sum(col("c_all")).over(Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val census = lengths.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val perSource = lengths.groupBy(col("source"), col("x"))
      .agg(count(lit(1)).as("c_s"))
    val nAll = lengths.agg(count(lit(1)).as("n_all"))
    val grid = support.crossJoin(broadcast(census))
      .join(perSource, Seq("source", "x"), "left")
      .na.fill(0L, Seq("c_s"))
      .withColumn("cum_s",
        sum(col("c_s")).over(Window.partitionBy(col("source"))
          .orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grid.crossJoin(broadcast(nAll))
      .withColumn("diff_ppm", abs(
        expr("(cum_s * 1000000L) div n_s") -
          expr("(cum_all * 1000000L) div n_all")))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"), max(col("diff_ppm")).as("ks_ppm"))
      .withColumn("drifted", (col("ks_ppm") > 200000).cast("int"))
  }

  val q151Oracle: String =
    """WITH l AS (
      |  SELECT source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS x
      |  FROM documents),
      |sup AS (
      |  SELECT x, CAST(count(*) AS BIGINT) AS c_all FROM l GROUP BY x),
      |supc AS (
      |  SELECT x, CAST(sum(c_all) OVER (ORDER BY x
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_all
      |  FROM sup),
      |cen AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM l GROUP BY source),
      |ps AS (
      |  SELECT source, x, CAST(count(*) AS BIGINT) AS c_s
      |  FROM l GROUP BY source, x),
      |na AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM l),
      |grid AS (
      |  SELECT c.source, s.x, c.n_s, s.cum_all,
      |    CAST(sum(coalesce(p.c_s, 0)) OVER (PARTITION BY c.source
      |      ORDER BY s.x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_s
      |  FROM supc s CROSS JOIN cen c
      |  LEFT JOIN ps p ON p.source = c.source AND p.x = s.x)
      |SELECT g.source, max(g.n_s) AS n_docs,
      |  CAST(max(abs((g.cum_s * 1000000) // g.n_s
      |    - (g.cum_all * 1000000) // na.n_all)) AS BIGINT) AS ks_ppm,
      |  CAST(CASE WHEN max(abs((g.cum_s * 1000000) // g.n_s
      |    - (g.cum_all * 1000000) // na.n_all)) > 200000
      |    THEN 1 ELSE 0 END AS INT) AS drifted
      |FROM grid g, na GROUP BY g.source""".stripMargin

  /** q149 — Stupid Backoff bigram scoring (Brants et al., EMNLP 2007,
    * "Large Language Models in Machine Translation"): the
    * web-scale LM score that deliberately skips normalization —
    * S(w2|w1) = c12/c1 when the bigram was seen in training, else
    * α·c2/N with α = 0.4 — because at corpus scale the unnormalized
    * ratio ranks as well as Kneser-Ney at a fraction of the cost. The
    * model trains on even doc_ids and scores odd ones, so the backoff
    * path actually fires; α = 2/5 keeps every score an integer ppm
    * rational. Per scored doc: Σ score, how often backoff fired, and
    * fully-unknown bigram count — the held-out-fluency profile a
    * quality gate thresholds.
    *
    * Scale shape: identical to q76 — one bigram-stream shuffle for
    * counts, vocabulary-scale joins back onto the scoring stream, the
    * train-mass scalar broadcast. Backoff adds only two LEFT joins.
    */
  def q149StupidBackoff(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode_outer(wsTokens(col("text"))))
      .withColumnRenamed("col", "w1")
      .filter(col("w1").isNotNull)
    val bigrams = toks
      .withColumn("w2", lead(col("w1"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), pmod(col("doc_id"), lit(2)).as("parity"),
        col("w1"), col("w2"))
      // model counts AND the scoring stream both read this
      .transform(Materialize.once)
    val train = bigrams.filter(col("parity") === 0)
    val big = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val uni2 = train.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val n = train.agg(count(lit(1)).as("n_train"))
    bigrams.filter(col("parity") === 1)
      .join(big, Seq("w1", "w2"), "left")
      .join(uni1, Seq("w1"), "left")
      .join(uni2, Seq("w2"), "left")
      .crossJoin(broadcast(n))
      .withColumn("score_ppm", expr(
        """CASE WHEN c12 IS NOT NULL THEN (c12 * 1000000L) div c1
          |     WHEN c2 IS NOT NULL THEN (2L * c2 * 1000000L) div (5L * n_train)
          |     ELSE 0L END""".stripMargin))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("score_ppm")).as("score_ppm"),
        sum(when(col("c12").isNull && col("c2").isNotNull, 1L)
          .otherwise(0L)).as("n_backoff"),
        sum(when(col("c12").isNull && col("c2").isNull, 1L)
          .otherwise(0L)).as("n_unknown"))
  }

  val q149Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, doc_id % 2 AS parity, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM t, unnest(range(1, len(toks))) u(i)
      |  WHERE len(toks) >= 2),
      |train AS (SELECT w1, w2 FROM s WHERE parity = 0),
      |big AS (
      |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |  FROM train GROUP BY w1, w2),
      |uni1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM train GROUP BY w1),
      |uni2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM train GROUP BY w2),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM train),
      |scored AS (
      |  SELECT sc.doc_id,
      |    CASE WHEN b.c12 IS NOT NULL THEN (b.c12 * 1000000) // u1.c1
      |         WHEN u2.c2 IS NOT NULL THEN (2 * u2.c2 * 1000000) // (5 * n.n_train)
      |         ELSE 0 END AS score_ppm,
      |    CASE WHEN b.c12 IS NULL AND u2.c2 IS NOT NULL THEN 1 ELSE 0 END AS bo,
      |    CASE WHEN b.c12 IS NULL AND u2.c2 IS NULL THEN 1 ELSE 0 END AS unk
      |  FROM s sc
      |  LEFT JOIN big b ON b.w1 = sc.w1 AND b.w2 = sc.w2
      |  LEFT JOIN uni1 u1 ON u1.w1 = sc.w1
      |  LEFT JOIN uni2 u2 ON u2.w2 = sc.w2, n
      |  WHERE sc.parity = 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(score_ppm) AS BIGINT) AS score_ppm,
      |  CAST(sum(bo) AS BIGINT) AS n_backoff,
      |  CAST(sum(unk) AS BIGINT) AS n_unknown
      |FROM scored GROUP BY doc_id""".stripMargin

  /** q150 — embedding centroid drift: per label, the integer-quantized
    * centroid of the even-id half against the odd-id half, reported as
    * squared distance — zero-ish for a stationary distribution, large
    * when a label's embedding mass moved. The snapshot-to-snapshot
    * drift monitor (here the halves stand in for two snapshots) run
    * before trusting a trained classifier or ANN index against fresh
    * data; complements q140's per-dimension quartile drift.
    *
    * Scale shape: one (label, parity, dim) aggregate over the exploded
    * frame, then a label×dim-sized self-align and a label-sized
    * rollup. Centroid components are quantized sums div counts, so the
    * whole result is integer-exact.
    */
  /** q179 — interpolated Kneser-Ney bigram scoring (Kneser & Ney
    * ICASSP'95; Chen & Goodman '98 eq. 4.25, absolute discount
    * d = 1/2): the canonical LM smoothing next to q149's Stupid
    * Backoff. Continuation probabilities use TYPE counts — N1+(w1·)
    * distinct successors, N1+(·w2) distinct predecessors, T distinct
    * bigram types — so frequent-but-narrow tokens (the "San
    * Francisco" effect) score low in novel contexts. Same
    * even/odd-document train/score split as q149 so every code path
    * (hit, interpolated-only, unseen-context continuation, unknown)
    * fires. All terms are floor-scaled integer rationals with d = 1/2
    * exact as (2c−1)/2c₁ arithmetic — both engines agree bit-for-bit.
    *
    * Scale shape: model frames are vocabulary-sized aggregates off one
    * materialized bigram stream; scoring is three hash joins + the
    * 1-row types scalar broadcast (q149's shape).
    */
  def q179KneserNey(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode_outer(wsTokens(col("text"))))
      .withColumnRenamed("col", "w1")
      .filter(col("w1").isNotNull)
    val bigrams = toks
      .withColumn("w2", lead(col("w1"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), pmod(col("doc_id"), lit(2)).as("parity"),
        col("w1"), col("w2"))
      .transform(Materialize.once)
    val big = bigrams.filter(col("parity") === 0)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .transform(Materialize.once) // ctx, cont, and types all read this
    val ctx = big.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cont = big.groupBy(col("w2")).agg(count(lit(1)).as("n1m"))
    val types = big.agg(count(lit(1)).as("t_types"))
    bigrams.filter(col("parity") === 1)
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .withColumn("score_ppb", expr(
        """CASE
          |  WHEN c1 IS NOT NULL THEN
          |    (CASE WHEN c12 IS NOT NULL
          |          THEN ((2L * c12 - 1L) * 1000000000L) div (2L * c1)
          |          ELSE 0L END)
          |    + (n1p * coalesce(n1m, 0L) * 1000000000L)
          |      div (2L * c1 * t_types)
          |  WHEN n1m IS NOT NULL THEN (n1m * 1000000000L) div t_types
          |  ELSE 0L END""".stripMargin))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("score_ppb")).as("score_ppb"),
        sum(when(col("c12").isNull && col("c1").isNotNull, 1L)
          .otherwise(0L)).as("n_interp"),
        sum(when(col("c1").isNull && col("n1m").isNotNull, 1L)
          .otherwise(0L)).as("n_cont"),
        sum(when(col("c1").isNull && col("n1m").isNull, 1L)
          .otherwise(0L)).as("n_unknown"))
  }

  val q179Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, doc_id % 2 AS parity, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM t, unnest(range(1, len(toks))) u(i)
      |  WHERE len(toks) >= 2),
      |big AS (
      |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      |  FROM s WHERE parity = 0 GROUP BY w1, w2),
      |ctx AS (
      |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
      |    CAST(count(*) AS BIGINT) AS n1p
      |  FROM big GROUP BY w1),
      |cont AS (
      |  SELECT w2, CAST(count(*) AS BIGINT) AS n1m FROM big GROUP BY w2),
      |ty AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM big),
      |scored AS (
      |  SELECT sc.doc_id,
      |    CASE
      |      WHEN x.c1 IS NOT NULL THEN
      |        (CASE WHEN b.c12 IS NOT NULL
      |              THEN ((2 * b.c12 - 1) * 1000000000) // (2 * x.c1)
      |              ELSE 0 END)
      |        + (x.n1p * coalesce(n.n1m, 0) * 1000000000)
      |          // (2 * x.c1 * ty.t_types)
      |      WHEN n.n1m IS NOT NULL THEN (n.n1m * 1000000000) // ty.t_types
      |      ELSE 0 END AS score_ppb,
      |    CASE WHEN b.c12 IS NULL AND x.c1 IS NOT NULL THEN 1 ELSE 0 END
      |      AS it,
      |    CASE WHEN x.c1 IS NULL AND n.n1m IS NOT NULL THEN 1 ELSE 0 END
      |      AS co,
      |    CASE WHEN x.c1 IS NULL AND n.n1m IS NULL THEN 1 ELSE 0 END AS un
      |  FROM s sc
      |  LEFT JOIN big b ON b.w1 = sc.w1 AND b.w2 = sc.w2
      |  LEFT JOIN ctx x ON x.w1 = sc.w1
      |  LEFT JOIN cont n ON n.w2 = sc.w2
      |  CROSS JOIN ty
      |  WHERE sc.parity = 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(score_ppb) AS BIGINT) AS score_ppb,
      |  CAST(sum(it) AS BIGINT) AS n_interp,
      |  CAST(sum(co) AS BIGINT) AS n_cont,
      |  CAST(sum(un) AS BIGINT) AS n_unknown
      |FROM scored GROUP BY doc_id""".stripMargin

  def q150CentroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("label"), pmod(col("vec_id"), lit(2)).as("parity"),
        posexplode(col("embedding")).as(Seq("i", "v0")))
      .select(col("label"), col("parity"), (col("i") + 1).as("dim"),
        expr("CAST(round(CAST(v0 AS DOUBLE) * 10000) AS BIGINT)").as("q"))
    val cent = m.groupBy(col("label"), col("parity"), col("dim"))
      .agg(expr("sum(q) div count(*)").as("c"),
        count(lit(1)).as("n_vec"))
    cent.filter(col("parity") === 0)
      .select(col("label"), col("dim"), col("c").as("c0"),
        col("n_vec").as("n_even"))
      .join(cent.filter(col("parity") === 1)
        .select(col("label"), col("dim"), col("c").as("c1"),
          col("n_vec").as("n_odd")), Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(max(col("n_even")).as("n_even"), max(col("n_odd")).as("n_odd"),
        sum((col("c0") - col("c1")) * (col("c0") - col("c1")))
          .as("drift_sq"))
  }

  val q150Oracle: String =
    """WITH m AS (
      |  SELECT label, vec_id % 2 AS parity, i AS dim,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS q
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
      |  WHERE embedding IS NOT NULL),
      |cent AS (
      |  SELECT label, parity, dim,
      |    sum(q) // count(*) AS c,
      |    CAST(count(*) AS BIGINT) AS n_vec
      |  FROM m GROUP BY label, parity, dim)
      |SELECT a.label,
      |  CAST(max(a.n_vec) AS BIGINT) AS n_even,
      |  CAST(max(b.n_vec) AS BIGINT) AS n_odd,
      |  CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS drift_sq
      |FROM cent a JOIN cent b ON a.label = b.label AND a.dim = b.dim
      |WHERE a.parity = 0 AND b.parity = 1
      |GROUP BY a.label""".stripMargin

  /** q158 — exact tie-aware ROC-AUC (Mann–Whitney rank-sum) of the
    * hashed-linear quality score (q116) against the `lang='en'` label,
    * per source: the calibration number a pipeline reads BEFORE
    * trusting a cheap classifier as a corpus gate (q116 reports the
    * keep decision; this reports how well the score actually ranks the
    * positive class, threshold-free). Ties get the standard half
    * credit, exactly: AUC = (Σ_{p,n} [s_p>s_n] + ½[s_p=s_n]) / n⁺n⁻,
    * carried as the integer 2·numerator so nothing is halved early.
    *
    * Scale shape: per-doc scoring is the codegen'd expression; the
    * rank-sum never materializes the n⁺·n⁻ pair space — it collapses
    * to the (source, score) SUPPORT spine (c⁺, c⁻ per distinct score),
    * one source-partitioned window over that spine, and a per-source
    * rollup. The only caveat at extreme scale is the n⁺·n⁻·10⁶ scalar
    * overflowing int64 past ~10⁹ balanced docs per source — at that
    * point compute the ppm per stratified sample, or split the
    * division; the spine algebra itself is exact and unbounded.
    */
  def q158Auc(spark: SparkSession, dir: String): DataFrame = {
    val score = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HashedLinearScore(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          wsTokens(col("text")))))
    val spine = Tables.load(spark, dir, "documents")
      .select(col("source"), score.as("score"),
        (col("lang") === "en").cast("long").as("pos"))
      .groupBy(col("source"), col("score"))
      .agg(sum(col("pos")).as("c_pos"),
        sum(lit(1L) - col("pos")).as("c_neg"))
    val w = Window.partitionBy(col("source")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .withColumn("neg_below", sum(col("c_neg")).over(w) - col("c_neg"))
      .groupBy(col("source"))
      .agg(sum(col("c_pos")).as("n_pos"),
        sum(col("c_neg")).as("n_neg"),
        sum(col("c_pos") * (col("neg_below") * 2 + col("c_neg")))
          .as("auc2_num"))
      .withColumn("auc_ppm",
        expr("(auc2_num * 1000000L) div (2 * n_pos * n_neg)"))
  }

  val q158Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
       |    string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |h AS (
       |  SELECT doc_id,
       |    list_reduce(list_transform(range(1, length(tok)+1),
       |      i -> ascii(tok[i])::BIGINT),
       |      (a, b) -> (a * $Base + b) % $Mod) AS hv
       |  FROM tok),
       |wgt AS (
       |  SELECT doc_id,
       |    ((((hv + 2 * $Shift) % $Mod) * ((hv + 2 * $Shift) % $Mod) % $Mod)
       |      % 1024) % 13 - 6 AS w
       |  FROM h),
       |s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
       |      FROM wgt GROUP BY doc_id),
       |spine AS (
       |  SELECT t.source, s.score,
       |    CAST(sum(t.pos) AS BIGINT) AS c_pos,
       |    CAST(sum(1 - t.pos) AS BIGINT) AS c_neg
       |  FROM t JOIN s USING (doc_id) GROUP BY t.source, s.score),
       |acc AS (
       |  SELECT source, c_pos, c_neg,
       |    sum(c_neg) OVER (PARTITION BY source ORDER BY score
       |      ROWS UNBOUNDED PRECEDING) - c_neg AS neg_below
       |  FROM spine)
       |SELECT source,
       |  CAST(sum(c_pos) AS BIGINT) AS n_pos,
       |  CAST(sum(c_neg) AS BIGINT) AS n_neg,
       |  CAST(sum(c_pos * (neg_below * 2 + c_neg)) AS BIGINT) AS auc2_num,
       |  CAST((sum(c_pos * (neg_below * 2 + c_neg)) * 1000000)
       |    // (2 * sum(c_pos) * sum(c_neg)) AS BIGINT) AS auc_ppm
       |FROM acc GROUP BY source""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_heavy_hitters" -> (q64HeavyHitters _),
    "q65_stratified_sample" -> (q65StratifiedSample _),
    "q66_unpivot" -> (q66Unpivot _),
    "q67_histogram" -> (q67Histogram _),
    "q68_zscore_anomaly" -> (q68ZscoreAnomaly _),
    "q69_scd2" -> (q69Scd2 _),
    "q70_pagerank" -> (q70Pagerank _),
    "q71_lexer_tokens" -> (q71LexerTokens _),
    "q72_triangles" -> (q72Triangles _),
    "q73_bottomk_sample" -> (q73BottomkSample _),
    "q74_calendar" -> (q74Calendar _),
    "q75_decontaminate" -> (q75Decontaminate _),
    "q76_lm_score" -> (q76LmScore _),
    "q77_fk_audit" -> (q77FkAudit _),
    "q78_incremental_dedup" -> (q78IncrementalDedup _),
    "q79_synth_source" -> (q79SynthSource _),
    "q80_interval_union" -> (q80IntervalUnion _),
    "q81_sliding_window" -> (q81SlidingWindow _),
    "q82_selection_agg" -> (q82SelectionAgg _),
    "q83_embedding_norms" -> (q83EmbeddingNorms _),
    "q84_winsorize" -> (q84Winsorize _),
    "q85_event_paths" -> (q85EventPaths _),
    "q86_ratio_to_total" -> (q86RatioToTotal _),
    "q87_zorder_cells" -> (q87ZorderCells _),
    "q88_mad_outliers" -> (q88MadOutliers _),
    "q89_trend_slope" -> (q89TrendSlope _),
    "q96_count_min" -> (q96CountMin _),
    "q97_bpe_pairs" -> (q97BpePairs _),
    "q98_novelty" -> (q98Novelty _),
    "q99_inverted_index" -> (q99InvertedIndex _),
    "q100_collocations" -> (q100Collocations _),
    "q102_bloom_dedup" -> (q102BloomDedup _),
    "q103_mixture_sample" -> (q103MixtureSample _),
    "q104_chunking" -> (q104Chunking _),
    "q105_bpe_train" -> (q105BpeTrain _),
    "q106_contam_spans" -> (q106ContamSpans _),
    "q107_bpe_tokenize" -> (q107BpeTokenize _),
    "q112_dup_substrings" -> (q112DupSubstrings _),
    "q113_dup_removal" -> (q113DupRemoval _),
    "q114_hll_distinct" -> (q114HllDistinct _),
    "q116_quality_classifier" -> (q116QualityClassifier _),
    "q117_hist_quantiles" -> (q117HistQuantiles _),
    "q119_dup_keep_first" -> (q119DupKeepFirst _),
    "q121_kanon" -> (q121Kanon _),
    "q124_stable_ids" -> (q124StableIds _),
    "q130_hll_rolling" -> (q130HllRolling _),
    "q131_shard_balance" -> (q131ShardBalance _),
    "q133_posting_bytes" -> (q133PostingBytes _),
    "q138_skyline" -> (q138Skyline _),
    "q149_stupid_backoff" -> (q149StupidBackoff _),
    "q179_kneser_ney" -> (q179KneserNey _),
    "q180_bpe_sweep" -> (q180BpeSweep _),
    "q150_centroid_drift" -> (q150CentroidDrift _),
    "q151_ks_drift" -> (q151KsDrift _),
    "q152_pps_sample" -> (q152PpsSample _),
    "q155_reshard" -> (q155Reshard _),
    "q157_quantile_norm" -> (q157QuantileNorm _),
    "q158_auc" -> (q158Auc _),
    "q142_burstiness" -> (q142Burstiness _),
    "q143_vocab_growth" -> (q143VocabGrowth _))

  val oracles: Map[String, String] = Map(
    "q64_heavy_hitters" -> q64Oracle,
    "q65_stratified_sample" -> q65Oracle,
    "q66_unpivot" -> q66Oracle,
    "q67_histogram" -> q67Oracle,
    "q68_zscore_anomaly" -> q68Oracle,
    "q69_scd2" -> q69Oracle,
    "q70_pagerank" -> q70Oracle,
    "q71_lexer_tokens" -> q71Oracle,
    "q72_triangles" -> q72Oracle,
    "q73_bottomk_sample" -> q73Oracle,
    "q74_calendar" -> q74Oracle,
    "q75_decontaminate" -> q75Oracle,
    "q76_lm_score" -> q76Oracle,
    "q77_fk_audit" -> q77Oracle,
    "q78_incremental_dedup" -> q78Oracle,
    "q79_synth_source" -> q79Oracle,
    "q80_interval_union" -> q80Oracle,
    "q81_sliding_window" -> q81Oracle,
    "q82_selection_agg" -> q82Oracle,
    "q83_embedding_norms" -> q83Oracle,
    "q84_winsorize" -> q84Oracle,
    "q85_event_paths" -> q85Oracle,
    "q86_ratio_to_total" -> q86Oracle,
    "q87_zorder_cells" -> q87Oracle,
    "q88_mad_outliers" -> q88Oracle,
    "q89_trend_slope" -> q89Oracle,
    "q96_count_min" -> q96Oracle,
    "q97_bpe_pairs" -> q97Oracle,
    "q98_novelty" -> q98Oracle,
    "q99_inverted_index" -> q99Oracle,
    "q100_collocations" -> q100Oracle,
    "q102_bloom_dedup" -> q102Oracle,
    "q103_mixture_sample" -> q103Oracle,
    "q104_chunking" -> q104Oracle,
    "q105_bpe_train" -> q105Oracle,
    "q106_contam_spans" -> q106Oracle,
    "q107_bpe_tokenize" -> q107Oracle,
    "q112_dup_substrings" -> q112Oracle,
    "q113_dup_removal" -> q113Oracle,
    "q114_hll_distinct" -> q114Oracle,
    "q116_quality_classifier" -> q116Oracle,
    "q117_hist_quantiles" -> q117Oracle,
    "q119_dup_keep_first" -> q119Oracle,
    "q121_kanon" -> q121Oracle,
    "q124_stable_ids" -> q124Oracle,
    "q130_hll_rolling" -> q130Oracle,
    "q131_shard_balance" -> q131Oracle,
    "q133_posting_bytes" -> q133Oracle,
    "q138_skyline" -> q138Oracle,
    "q149_stupid_backoff" -> q149Oracle,
    "q179_kneser_ney" -> q179Oracle,
    "q180_bpe_sweep" -> q180Oracle,
    "q150_centroid_drift" -> q150Oracle,
    "q151_ks_drift" -> q151Oracle,
    "q152_pps_sample" -> q152Oracle,
    "q155_reshard" -> q155Oracle,
    "q157_quantile_norm" -> q157Oracle,
    "q158_auc" -> q158Oracle,
    "q142_burstiness" -> q142Oracle,
    "q143_vocab_growth" -> q143Oracle)
}
