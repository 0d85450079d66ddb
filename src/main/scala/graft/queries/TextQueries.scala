package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis._
import graft.runtime.Tables

/** Extension tier — text analysis over the `documents` table (the
  * training-data-pipeline operators from BASELINE.json's north star).
  * Everything is per-document built-in expressions: embarrassingly
  * parallel, no shuffle except q19's fingerprint-group window.
  */
object TextQueries {

  /** Token counting: whitespace tokens + BPE-ish lexer tokens +
    * chars-per-token density.
    */
  def q16TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(
      col("doc_id"),
      wsTokenCount(col("text")).as("n_ws_tokens"),
      lexTokenCount(col("text")).as("n_lex_tokens"),
      (nonSpaceChars(col("text")).cast("double") / wsTokenCount(col("text")))
        .as("chars_per_token"))
  }

  val q16Oracle: String =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_lex_tokens,
      |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      |    / len(string_split_regex(trim(text), '\s+')) AS chars_per_token
      |FROM documents""".stripMargin

  /** Language ID: standalone-marker-word scores per language, argmax with
    * first-wins tie-break.
    */
  def q17LangId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val scored = d.select(
      (Seq(col("doc_id")) ++
        langMarkers.map { case (l, _) => langScore(col("text"), l).as(s"s_$l") } :+
        langId(col("text")).as("lang_pred")): _*)
    scored
  }

  private def occSql(word: String): String =
    s"len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t = '$word'))"

  val q17Oracle: String = {
    val scoreExprs = langMarkers.map { case (l, ws) =>
      s"(${ws.map(occSql).mkString(" + ")}) AS s_$l"
    }
    val best = s"greatest(${langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")})"
    val caseArms = langMarkers.map { case (l, _) =>
      s"WHEN s_$l = $best THEN '$l'"
    }.mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, ${scoreExprs.mkString(",\n    ")}
       |  FROM documents)
       |SELECT doc_id, s_en, s_es, s_de, s_fr,
       |  CASE $caseArms ELSE 'und' END AS lang_pred
       |FROM scored""".stripMargin
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, and the
    * CASE-bucketed verdict of a pretraining quality filter.
    */
  def q18Quality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val tf = textFeatures(col("text"))
    val nTokens = tf.getField("n_tokens")
    val punctRatio = punctCount(col("text")).cast("double") / length(col("text"))
    val stopRatio = stopwordRatioFrom(tf)
    d.select(
      col("doc_id"),
      length(col("text")).as("n_chars_computed"),
      nTokens.as("n_tokens"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      qualityBucket(nTokens, punctRatio, stopRatio).as("quality"))
  }

  val q18Oracle: String = {
    val nTok = """len(string_split_regex(trim(text), '\s+'))"""
    val punct = """CAST(length(regexp_replace(text, '[a-z0-9\s]', '', 'g')) AS DOUBLE) / length(text)"""
    val stop = s"""CAST(${Seq("the", "a", "and", "of").map(occSql).mkString(" + ")} AS DOUBLE) / $nTok"""
    s"""WITH f AS (
       |  SELECT doc_id, length(text) AS n_chars_computed, $nTok AS n_tokens,
       |    $punct AS punct_ratio, $stop AS stopword_ratio
       |  FROM documents)
       |SELECT doc_id, n_chars_computed, n_tokens, punct_ratio, stopword_ratio,
       |  CASE WHEN n_tokens < 5 THEN 'too_short'
       |       WHEN punct_ratio > 0.3 THEN 'symbol_spam'
       |       WHEN stopword_ratio > 0.4 THEN 'boilerplate'
       |       ELSE 'ok' END AS quality
       |FROM f""".stripMargin
  }

  /** Document fingerprinting: sha-256 over normalized text + per-
    * fingerprint group size (the exact-dup detector's first stage).
    */
  def q19Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val w = Window.partitionBy(col("fingerprint"))
    d.select(col("doc_id"), fingerprint(col("text")).as("fingerprint"))
      .withColumn("n_same", count(lit(1)).over(w))
  }

  val q19Oracle: String =
    """SELECT doc_id,
      |  sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  count(*) OVER (PARTITION BY sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_same
      |FROM documents""".stripMargin

  /** Top-k-per-group selection: keep the 3 longest documents per source
    * (the "keep N best docs per domain" step of corpus curation) — via
    * the custom TopKPerGroup operator (logical node + strategy +
    * bounded-heap physical plan, graft.plans.TopK): O(n log k) per
    * partition and O(groups×k) memory instead of WindowExec's full
    * partition sort; the (desc metric, unique id) order keeps ranks
    * total. TopKSpec proves it row-identical to the window spelling.
    */
  def q29TopkPerSource(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    graft.plans.TopK.perGroup(
      d.select(col("source"), col("doc_id"), col("n_chars")),
      group = Seq(col("source")),
      order = Seq(col("n_chars").desc, col("doc_id")),
      k = 3)
  }

  val q29Oracle: String =
    """SELECT source, doc_id, n_chars, rk FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 3""".stripMargin

  /** End-to-end training-data prep chain: quality-filter → exact dedup
    * (keep-first on the prefix blocking key) → per-language corpus
    * stats. The composition the extension operators exist for.
    */
  def q30TrainingPrep(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    // one fused tokenization feeds n_tokens, the stopword ratio, AND the
    // dedup blocking key (was 3 independent regex splits per row)
    val tf = textFeatures(col("text"))
    val nTokens = tf.getField("n_tokens")
    val punctRatio = punctCount(col("text")).cast("double") / length(col("text"))
    val stopRatio = stopwordRatioFrom(tf)
    val ok = d
      .withColumn("n_tokens", nTokens)
      .withColumn("quality", qualityBucket(nTokens, punctRatio, stopRatio))
      .filter(col("quality") === "ok")
      .withColumn("prefix_key", tf.getField("prefix_key"))
    val kept = graft.operators.Dedup.keepFirst(ok, col("prefix_key"), col("doc_id"))
    kept.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(length(col("text"))).as("total_chars"))
  }

  val q30Oracle: String = {
    val nTok = """len(string_split_regex(trim(text), '\s+'))"""
    val punct = """CAST(length(regexp_replace(text, '[a-z0-9\s]', '', 'g')) AS DOUBLE) / length(text)"""
    val stop = s"""CAST(${Seq("the", "a", "and", "of").map(occSql).mkString(" + ")} AS DOUBLE) / $nTok"""
    s"""WITH f AS (
       |  SELECT doc_id, lang, text, length(text) AS n_chars_c, $nTok AS n_tokens,
       |    $punct AS punct_ratio, $stop AS stopword_ratio,
       |    $prefixKeySql
       |      AS prefix_key
       |  FROM documents),
       |ok AS (
       |  SELECT * FROM f
       |  WHERE NOT (n_tokens < 5)
       |    AND NOT (punct_ratio > 0.3)
       |    AND NOT (stopword_ratio > 0.4)),
       |kept AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY prefix_key ORDER BY doc_id) AS rn
       |    FROM ok) WHERE rn = 1)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(n_chars_c) AS BIGINT) AS total_chars
       |FROM kept GROUP BY lang""".stripMargin
  }

  /** Winnowing fingerprints (SIGMOD'03): rolling polynomial hash over
    * char 4-grams, min of each 5-window, distinct+sorted — summarized
    * per doc (count/min/max/sum) so the oracle compare stays scalar.
    * The hash is plain modular arithmetic, so DuckDB computes the SAME
    * values; both sides' constants come from WinnowHelper. Shuffle-free
    * scan → scales linearly; the fused expression evaluates the rolling
    * loop once per row in JIT-compiled code.
    */
  def q31Winnow(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      // docs shorter than k have no k-gram and therefore no fingerprint;
      // excluded on BOTH sides (ANSI element_at would throw on the empty
      // array, and list_sum of an empty list is NULL vs aggregate's 0)
      .filter(length(col("text")) >= 4)
    d.select(col("doc_id"), winnowFingerprints(col("text"), 4, 5).as("fp"))
      .select(
        col("doc_id"),
        size(col("fp")).as("n_fp"),
        element_at(col("fp"), 1).as("min_fp"),
        element_at(col("fp"), -1).as("max_fp"),
        expr("aggregate(fp, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_fp"))
  }

  val q31Oracle: String = {
    import graft.functions.WinnowHelper.{Base => B, Mod => M}
    val (c3, c2, c1) = (B * B * B % M, B * B % M, B)
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_transform(range(1, length(text) - 2),
       |      i -> (ascii(text[i]) * $c3::BIGINT + ascii(text[i+1]) * $c2::BIGINT +
       |            ascii(text[i+2]) * $c1::BIGINT + ascii(text[i+3])) % $M) AS hs
       |  FROM documents WHERE length(text) >= 4),
       |wins AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(
       |      range(1, greatest(len(hs) - 3, 2)),
       |      j -> list_min(hs[j:j+4])))) AS fps
       |  FROM h)
       |SELECT doc_id, len(fps) AS n_fp, fps[1] AS min_fp, fps[-1] AS max_fp,
       |  CAST(list_sum(fps) AS BIGINT) AS sum_fp
       |FROM wins""".stripMargin
  }

  /** Deterministic hash-based train/val split (≈90/10 via 230/256
    * sha-256 buckets), reported per source so stratification is
    * inspectable. The assignment is a shuffle-free scalar projection,
    * reproducible by any engine — the oracle re-derives the identical
    * split from the same hash.
    */
  def q35TrainSplit(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = Tables.load(spark, dir, "documents")
    d.select(col("source"),
        Sampling.splitLabel(col("doc_id")).as("split"),
        wsTokenCount(col("text")).as("n_tokens"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
  }

  val q35Oracle: String = {
    val bucket = graft.operators.Sampling.hashBucketSql("doc_id")
    s"""WITH assigned AS (
       |  SELECT source,
       |    CASE WHEN $bucket < 230 THEN 'train' ELSE 'val' END AS split,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens
       |  FROM documents)
       |SELECT source, split, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |FROM assigned GROUP BY source, split""".stripMargin
  }

  /** Sequence packing at a 512-token budget, reported as the
    * PARTITION-INVARIANT facts plus packing-invariant checks, so even
    * this imperative operator is oracle-checkable: the exact sequence
    * count and fills depend on the shard layout (greedy packing is
    * partition-local by design), but conservation (every doc packed
    * exactly once, token totals preserved), the budget contract (only
    * single-oversized-doc sequences may exceed it), and the count
    * bounds (ceil(capped/budget) ≤ n_seq ≤ n_docs, where capped counts
    * each doc at most `budget` tokens) hold for EVERY layout. The oracle recomputes the facts relationally and expects
    * every invariant flag = 1 — a packing bug flips a flag and fails
    * the hash match. PackingSpec covers the per-sequence greedy
    * semantics deterministically.
    */
  def q36PackStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Packing
    val budget = 512L
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .repartitionByRange(32, col("doc_id"))
      .sortWithinPartitions("doc_id")
    // checkpoint: the coverage branch and the main aggregate both
    // consume `packed` — without materialization the mapPartitions
    // packing job runs twice, and `conserved` would silently rely on
    // both executions sampling identical range boundaries
    val packed = Packing.packSequences(d, budget).toDF().transform(graft.runtime.Materialize.once)
    val corpus = broadcast(d.agg(
      count(lit(1)).as("n_corpus_docs"),
      sum(col("n_tokens")).as("corpus_tokens"),
      // capped token mass: an oversized doc fills exactly one sequence,
      // so it may contribute at most `budget` to any valid lower bound
      // on the sequence count
      sum(least(col("n_tokens"), lit(budget))).as("capped_tokens")))
    val coverage = broadcast(packed
      .select(explode(col("doc_ids")).as("doc_id"))
      .agg(count(lit(1)).as("n_packed_slots"),
        count_distinct(col("doc_id")).as("n_packed_docs")))
    packed
      .agg(
        count(lit(1)).as("n_sequences"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        // multi-doc sequences must respect the budget; a lone oversized
        // doc legitimately exceeds it (downstream truncator's job)
        max(when(col("n_docs") > 1, col("total_tokens")).otherwise(0L))
          .as("max_multi_tokens"),
        min(col("total_tokens")).as("min_seq_tokens"))
      .crossJoin(corpus)
      .crossJoin(coverage)
      .select(
        col("n_docs"), col("total_tokens"),
        (col("n_docs") === col("n_corpus_docs") &&
          col("n_packed_slots") === col("n_corpus_docs") &&
          col("n_packed_docs") === col("n_corpus_docs") &&
          col("total_tokens") === col("corpus_tokens")).cast("int")
          .as("conserved"),
        (col("max_multi_tokens") <= budget).cast("int").as("within_budget"),
        // lower bound uses CAPPED tokens: with an oversized doc, the raw
        // ceil(total/budget) exceeds the true minimum (the doc packs
        // into ONE sequence however many tokens it has) and would flag a
        // correct packing as invalid
        (col("n_sequences") >= ceil(col("capped_tokens") / budget.toDouble) &&
          col("n_sequences") <= col("n_docs") &&
          col("min_seq_tokens") > 0).cast("int").as("bounds_ok"))
  }

  val q36Oracle: String =
    """WITH t AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS tok
      |  FROM documents)
      |SELECT CAST(n AS BIGINT) AS n_docs, tok AS total_tokens,
      |  1 AS conserved, 1 AS within_budget, 1 AS bounds_ok
      |FROM t""".stripMargin

  /** Per-source length-distribution percentiles (exact interpolated
    * p50/p90/p99 over n_chars) — the corpus-profiling aggregate a
    * curation pipeline reports. Exact percentile is a sort-based
    * aggregate; at 100 TB swap in approx_percentile (t-digest sketch,
    * partial+final merge) — kept exact here for oracle parity.
    */
  def q37LengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.groupBy(col("source")).agg(
      // scale-0 rounding after *100: cross-engine safe, unlike
      // round(x, 2) whose .5 boundary is repr-dependent (see q12)
      (round(expr("percentile(n_chars, 0.5)") * 100) / 100).as("p50"),
      (round(expr("percentile(n_chars, 0.9)") * 100) / 100).as("p90"),
      (round(expr("percentile(n_chars, 0.99)") * 100) / 100).as("p99"),
      max(col("n_chars")).as("max_chars"))
  }

  val q37Oracle: String =
    """SELECT source,
      |  round(quantile_cont(n_chars, 0.5) * 100) / 100 AS p50,
      |  round(quantile_cont(n_chars, 0.9) * 100) / 100 AS p90,
      |  round(quantile_cont(n_chars, 0.99) * 100) / 100 AS p99,
      |  max(n_chars) AS max_chars
      |FROM documents GROUP BY source""".stripMargin

  /** Corpus accounting at every granularity in one pass: ROLLUP over
    * (source, lang) gives per-(source,lang), per-source, and grand
    * totals from a single shuffle — the multi-level report a curation
    * dashboard wants without three scans. Spark plans rollup as one
    * Expand + aggregate; the oracle uses the identical ANSI ROLLUP.
    */
  def q38RollupStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"), col("lang"),
        wsTokenCount(col("text")).cast("long").as("n_tokens"))
    d.rollup(col("source"), col("lang"))
      .agg(
        // grouping_id disambiguates a real NULL group key from the rollup
        // subtotal row (classic ROLLUP ambiguity); oracle mirrors it via
        // GROUPING(source)*2 + GROUPING(lang).
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  val q38Oracle: String =
    """SELECT source, lang,
      |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS INT) AS gid,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY ROLLUP (source, lang)""".stripMargin

  /** Document frequency: explode distinct tokens per doc, count docs per
    * token, keep terms appearing in ≥ 5% of docs, rank by df. The
    * explode → hash-aggregate shape distributes trivially (token-keyed
    * shuffle of one row per distinct (doc, token)); at 100 TB this is
    * the standard first half of TF-IDF / vocabulary building.
    */
  def q39DocFrequency(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val exploded = d
      .select(col("doc_id"), explode(array_distinct(wsTokens(col("text")))).as("token"))
    // total doc count as a broadcast scalar inside the SAME lazy plan (no
    // eager driver-side action, one job per execution); the 1-row agg side
    // is broadcast, never shuffled.
    val total = d.agg(count(lit(1)).cast("double").as("n_total"))
    exploded.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .join(broadcast(total))
      .filter(col("df") >= col("n_total") * 0.05)
      .drop("n_total")
      // the ≥5% df filter shrinks the set to the shared vocabulary before
      // this single-partition ranking window — acceptable funnel.
      .withColumn("rank",
        row_number().over(Window.orderBy(col("df").desc, col("token"))))
  }

  val q39Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS token
      |  FROM documents),
      |df AS (
      |  SELECT token, count(*) AS df FROM tok GROUP BY token),
      |total AS (SELECT count(*) AS n FROM documents)
      |SELECT token, df,
      |  row_number() OVER (ORDER BY df DESC, token) AS rank
      |FROM df, total WHERE df >= n * 0.05""".stripMargin

  /** Global top-20 documents by a quality-ish score. orderBy+limit is
    * planned as TakeOrderedAndProject: each partition keeps a 20-row
    * heap and the driver merges partition heads — no global sort, no
    * shuffle of the full corpus, O(k) driver memory. The ordering
    * carries a unique tiebreak (doc_id) so ranks are total.
    */
  def q40GlobalTopK(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(col("doc_id"), col("source"),
        (wsTokenCount(col("text")) * lexTokenCount(col("text"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  val q40Oracle: String =
    """SELECT doc_id, source,
      |  len(string_split_regex(trim(text), '\s+'))
      |    * len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS score
      |FROM documents ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** Gopher-style corpus quality gate (Rae et al. 2021 §A1.1 rule
    * families, thresholds tuned to this corpus so both outcomes occur):
    * per-source keep counts under token-count, mean-word-length,
    * symbol-ratio, and stopword-presence rules. One fused tokenization
    * (textFeatures) feeds every token-derived signal; the whole gate is
    * per-document built-ins — scan-bound, shuffle only for the final
    * per-source rollup.
    */
  def q42QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusFilters
    val d = Tables.load(spark, dir, "documents")
    val tf = textFeatures(col("text"))
    val nTokens = tf.getField("n_tokens")
    val keep = CorpusFilters.gopherKeep(
      nTokens,
      CorpusFilters.meanWordLen(col("text"), nTokens),
      CorpusFilters.symbolRatio(col("text")),
      CorpusFilters.stopwordHits(tf),
      minTokens = 20, maxTokens = 1000,
      minMeanWl = 3.0, maxMeanWl = 10.0,
      maxSymbolRatio = 0.1, minStopHits = 1)
    d.withColumn("keep", keep.cast("int"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_kept"))
  }

  val q42Oracle: String =
    """WITH s AS (
      |  SELECT source,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tok,
      |    length(regexp_replace(text, '\s+', '', 'g'))
      |      * 1.0 / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS mean_wl,
      |    length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
      |      * 1.0 / greatest(length(text), 1) AS sym_ratio,
      |    list_contains(string_split_regex(trim(text), '\s+'), 'the')::INT
      |      + list_contains(string_split_regex(trim(text), '\s+'), 'a')::INT
      |      + list_contains(string_split_regex(trim(text), '\s+'), 'and')::INT
      |      + list_contains(string_split_regex(trim(text), '\s+'), 'of')::INT AS hits
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN n_tok >= 20 AND n_tok <= 1000
      |    AND mean_wl >= 3.0 AND mean_wl <= 10.0
      |    AND sym_ratio <= 0.1 AND hits >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM s GROUP BY source""".stripMargin

  /** Gopher's repetition signal: per-document duplicate-bigram profile
    * (total bigram occurrences, top bigram count) with a flagged bit
    * when the top bigram covers > 10% of the document. Relational
    * two-stage aggregate — map-side combine on (doc, gram) collapses
    * repeats before the shuffle.
    */
  def q43Repetition(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusFilters
    val d = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
    CorpusFilters.topNgramProfile(d, "doc_id", "toks", n = 2)
      .select(
        col("doc_id"), col("n_grams"), col("max_gram_count"),
        (col("max_gram_count").cast("double") / col("n_grams") > 0.1)
          .cast("int").as("repetitive"))
  }

  val q43Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, greatest(len(toks)-1, 1)+1),
      |      i -> array_to_string(list_slice(toks, i, i+1), ' '))) AS gram
      |  FROM t),
      |c AS (
      |  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
      |p AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
      |    CAST(max(cnt) AS BIGINT) AS max_gram_count
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, n_grams, max_gram_count,
      |  CAST(CASE WHEN max_gram_count * 1.0 / n_grams > 0.1
      |       THEN 1 ELSE 0 END AS INT) AS repetitive
      |FROM p""".stripMargin

  /** Sketch-based approximate aggregation — the aggregates that REPLACE
    * q37's exact sort-based percentile and exact distinct at 100 TB:
    * approx_percentile (t-digest-style quantile summary, partial/final
    * mergeable) checked against the exact value with a tolerance flag.
    * Both engines verify the exact value hash-exactly; the approx side
    * is validated relationally (flag = 1), since sketch internals are
    * engine-specific by nature.
    */
  def q46ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.groupBy(col("source"))
      .agg(
        expr("percentile(n_chars, 0.5)").as("ep50"),
        expr("percentile(n_chars, 0.9)").as("ep90"),
        expr("approx_percentile(n_chars, 0.5, 1000)").as("ap50"),
        expr("approx_percentile(n_chars, 0.9, 1000)").as("ap90"))
      .select(
        col("source"),
        (round(col("ep50") * 100) / 100).as("p50"),
        (round(col("ep90") * 100) / 100).as("p90"),
        // tolerance 10% + 2: approx_percentile returns an OBSERVED value
        // (discrete) while percentile() interpolates — on small groups
        // the discrete/interpolated gap dominates the sketch error, so
        // the flag needs headroom for both
        (abs(col("ap50") - col("ep50")) <= col("ep50") * 0.1 + 2)
          .cast("int").as("p50_ok"),
        (abs(col("ap90") - col("ep90")) <= col("ep90") * 0.1 + 2)
          .cast("int").as("p90_ok"))
  }

  val q46Oracle: String =
    """SELECT source,
      |  round(quantile_cont(n_chars, 0.5) * 100) / 100 AS p50,
      |  round(quantile_cont(n_chars, 0.9) * 100) / 100 AS p90,
      |  1 AS p50_ok, 1 AS p90_ok
      |FROM documents GROUP BY source""".stripMargin

  /** HyperLogLog distinct counting (approx_count_distinct, rsd 2%) —
    * the mergeable-sketch replacement for exact COUNT(DISTINCT) at
    * scale — validated against the exact per-source vocabulary size
    * with a 10% tolerance flag (≥ 5σ at rsd 0.02).
    */
  def q47ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(wsTokens(col("text"))).as("token"))
    d.groupBy(col("source"))
      .agg(
        countDistinct(col("token")).as("exact_distinct"),
        approx_count_distinct(col("token"), 0.02).as("approx"))
      .select(
        col("source"), col("exact_distinct"),
        (abs(col("approx") - col("exact_distinct"))
          <= col("exact_distinct") * 0.1).cast("int").as("approx_ok"))
  }

  val q47Oracle: String =
    """SELECT source,
      |  CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct,
      |  1 AS approx_ok
      |FROM (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents)
      |GROUP BY source""".stripMargin

  /** q125 — n-gram diversity profiling: per-source word-3-gram
    * type/token ratio, the self-BLEU-adjacent metric a pipeline runs
    * to flag low-diversity (template-generated or model-generated)
    * sources — collapsing TTR is the standard tell. Integer ppm so the
    * ratio hash-matches. One vocabulary-scale aggregate (the distinct
    * side) riding the same shuffle as the totals — at 100 TB the
    * drop-in is the q114 HLL registers per source instead of the
    * exact distinct.
    */
  def q125NgramDiversity(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.load(spark, dir, "documents")
      .select(col("source"), wsTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3)))")).as("g"))
    grams.groupBy(col("source"))
      .agg(count(lit(1)).as("total_grams"),
        countDistinct(col("g")).as("distinct_grams"))
      .withColumn("ttr_ppm",
        expr("(distinct_grams * 1000000L) div total_grams"))
  }

  val q125Oracle: String =
    """WITH t AS (
      |  SELECT source, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT source,
      |    array_to_string(list_slice(toks, i, i + 2), ' ') AS g
      |  FROM t, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) u(i)),
      |agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS total_grams,
      |    CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams
      |  FROM g GROUP BY source)
      |SELECT source, total_grams, distinct_grams,
      |  (distinct_grams * 1000000) // total_grams AS ttr_ppm
      |FROM agg""".stripMargin

  /** q128 — vocabulary-truncation OOV accounting: fix the vocabulary
    * at the global top-20 tokens (ties broken lexically — the
    * tokenizer-design decision of capping vocab size) and report each
    * source's out-of-vocabulary token rate in ppm. The metric that
    * decides V when designing a tokenizer, and the per-source skew a
    * mixture rebalance must know about. Scale: the frequency census
    * is the one vocabulary-scale shuffle; the vocab is broadcast into
    * a map-side anti-join, so the OOV pass never reshuffles the
    * corpus.
    */
  def q128OovRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("source"), explode_outer(wsTokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      // consumed by the census, the totals, and the OOV anti-join
      .transform(graft.runtime.Materialize.once)
    val vocab = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)
      .select(col("token"))
    val totals = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("total_tokens"))
    val oov = toks.join(broadcast(vocab), Seq("token"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("oov_tokens"))
    totals.join(oov, Seq("source"), "left")
      .select(col("source"), col("total_tokens"),
        coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"))
      .withColumn("oov_ppm", expr("(oov_tokens * 1000000L) div total_tokens"))
  }

  val q128Oracle: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
      |  FROM documents),
      |freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
      |vocab AS (SELECT t FROM freq ORDER BY c DESC, t LIMIT 20),
      |tot AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS total_tokens
      |  FROM tok GROUP BY source),
      |oov AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS oov_tokens
      |  FROM tok WHERE t NOT IN (SELECT t FROM vocab) GROUP BY source)
      |SELECT t.source, t.total_tokens,
      |  coalesce(o.oov_tokens, CAST(0 AS BIGINT)) AS oov_tokens,
      |  (coalesce(o.oov_tokens, 0) * 1000000) // t.total_tokens AS oov_ppm
      |FROM tot t LEFT JOIN oov o USING (source)""".stripMargin

  /** q129 — filter-funnel accounting: every document attributed to the
    * FIRST pipeline stage that would drop it — quality gates (q18's
    * buckets), then exact-dup (q20's keep-first blocking key), then
    * benchmark contamination (q106's shingle membership) — or 'kept'.
    * The observability report every curation pipeline publishes (what
    * did each stage cost us), with counts and token mass per stage.
    * Deterministic first-failure attribution makes the funnel additive:
    * stages sum to the corpus. One corpus-scale shuffle per
    * group-keyed stage (dup window, shingle join), all reused shapes.
    */
  def q129FilterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val tf = textFeatures(col("text"))
    val nTokens = tf.getField("n_tokens")
    val punctRatio = punctCount(col("text")).cast("double") / length(col("text"))
    val stopRatio = stopwordRatioFrom(tf)
    val base = d.select(col("doc_id"), col("text"),
      nTokens.as("n_tokens"),
      qualityBucket(nTokens, punctRatio, stopRatio).as("quality"),
      tf.getField("prefix_key").as("prefix_key"))
    val withDup = base.withColumn("rn",
      row_number().over(Window.partitionBy(col("prefix_key"))
        .orderBy(col("doc_id"))))
    // q106's contamination geometry: 3-token shingles against the
    // deterministic benchmark subset (doc_id ≡ 0 mod 97)
    val sh = d
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3)))")).as("shingle"))
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("shingle")).distinct()
    val contaminated = sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "shingle")
      .select(col("doc_id")).distinct()
      .withColumn("contam", lit(1))
    withDup.join(contaminated, Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("quality") =!= "ok", col("quality"))
          .when(col("rn") > 1, lit("duplicate"))
          .when(col("contam").isNotNull, lit("contaminated"))
          .otherwise(lit("kept")))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
  }

  val q129Oracle: String = {
    val nTok = """len(string_split_regex(trim(text), '\s+'))"""
    val punct = """CAST(length(regexp_replace(text, '[a-z0-9\s]', '', 'g')) AS DOUBLE) / length(text)"""
    val stop = s"""CAST(${Seq("the", "a", "and", "of").map(occSql).mkString(" + ")} AS DOUBLE) / $nTok"""
    s"""WITH f AS (
       |  SELECT doc_id, text, $nTok AS n_tokens,
       |    CASE WHEN $nTok < 5 THEN 'too_short'
       |         WHEN $punct > 0.3 THEN 'symbol_spam'
       |         WHEN $stop > 0.4 THEN 'boilerplate'
       |         ELSE 'ok' END AS quality,
       |    $prefixKeySql
       |      AS prefix_key
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, n_tokens, quality,
       |    row_number() OVER (PARTITION BY prefix_key ORDER BY doc_id) AS rn
       |  FROM f),
       |t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
       |  FROM t, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) u(i)),
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
       |contam AS (
       |  SELECT DISTINCT doc_id FROM sh
       |  WHERE doc_id % 97 <> 0 AND shingle IN (SELECT shingle FROM bench)),
       |staged AS (
       |  SELECT r.doc_id, r.n_tokens,
       |    CASE WHEN r.quality <> 'ok' THEN r.quality
       |         WHEN r.rn > 1 THEN 'duplicate'
       |         WHEN c.doc_id IS NOT NULL THEN 'contaminated'
       |         ELSE 'kept' END AS stage
       |  FROM ranked r LEFT JOIN contam c ON c.doc_id = r.doc_id)
       |SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |FROM staged GROUP BY stage""".stripMargin
  }

  /** q132 — language-ID confidence filtering: q17 gives an argmax;
    * pipelines gate on the MARGIN (best score − runner-up). Margin 0
    * means the classifier is guessing (full tie); a small margin means
    * mixed-language or template text. Emits the margin and the keep
    * verdict (margin ≥ 2) — the confidence-threshold discipline any
    * classifier-driven filter needs, all integer arithmetic in one
    * scan pass.
    */
  def q132LangMargin(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val scores = langMarkers.map { case (l, _) => langScore(col("text"), l) }
    val best = greatest(scores: _*)
    // runner-up = max over each score bounded by the others' max: the
    // second-largest of N values via greatest of pairwise leasts
    val second = greatest(scores.indices.map { i =>
      least(scores(i), greatest(scores.indices.collect {
        case j if j != i => scores(j)
      }: _*))
    }: _*)
    d.select(col("doc_id"), langId(col("text")).as("lang_pred"),
      best.cast("long").as("best_score"),
      second.cast("long").as("second_score"))
      .withColumn("margin", col("best_score") - col("second_score"))
      .withColumn("keep", (col("margin") >= 2).cast("int"))
  }

  val q132Oracle: String = {
    val scoreExprs = langMarkers.map { case (l, ws) =>
      s"(${ws.map(occSql).mkString(" + ")}) AS s_$l"
    }
    val names = langMarkers.map { case (l, _) => s"s_$l" }
    val best = s"greatest(${names.mkString(", ")})"
    val second = names.indices.map { i =>
      s"least(${names(i)}, greatest(${names.indices.collect {
        case j if j != i => names(j)
      }.mkString(", ")}))"
    }.mkString(", ")
    val caseArms = langMarkers.map { case (l, _) =>
      s"WHEN s_$l = $best THEN '$l'"
    }.mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, ${scoreExprs.mkString(",\n    ")}
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CASE $caseArms ELSE 'und' END AS lang_pred,
       |    CAST($best AS BIGINT) AS best_score,
       |    CAST(greatest($second) AS BIGINT) AS second_score
       |  FROM scored)
       |SELECT doc_id, lang_pred, best_score, second_score,
       |  best_score - second_score AS margin,
       |  CAST(CASE WHEN best_score - second_score >= 2
       |       THEN 1 ELSE 0 END AS INT) AS keep
       |FROM m""".stripMargin
  }

  /** q135 — Simpson concentration index per source: the probability
    * that two tokens drawn without replacement from a source are the
    * SAME type, Σ c·(c−1) / (T·(T−1)) — the diversity complement to
    * q125's type/token ratio that needs no logarithm (the
    * entropy-family metric a cross-engine hash check can carry
    * exactly). High concentration flags template/generated sources the
    * same way collapsing TTR does, but from repeated-draw mass rather
    * than the distinct-type census — so unlike q125 there is no
    * count(DISTINCT) side: both aggregates ride ONE (source, token)
    * shuffle, then a source-sized rollup. Integer ppb via 64-bit
    * rationals (Σc·(c−1) ≤ T², so the ·10⁹ product needs T ≲ 3·10⁴ per
    * source per slice — at 100 TB the same two sums run per partition
    * slice and the final ratio is taken once per source from the
    * merged longs, or in 128-bit decimal if a single source exceeds
    * that).
    */
  def q135Simpson(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(wsTokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("source"))
      .agg(
        sum(col("c")).as("total_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(col("c") * (col("c") - 1)).as("repeat_mass"))
      .withColumn("simpson_ppb",
        expr("(repeat_mass * 1000000000L) div (total_tokens * (total_tokens - 1))"))
  }

  val q135Oracle: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
      |  FROM documents),
      |c AS (
      |  SELECT source, t, CAST(count(*) AS BIGINT) AS c
      |  FROM tok GROUP BY source, t),
      |agg AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS total_tokens,
      |    CAST(count(*) AS BIGINT) AS distinct_tokens,
      |    CAST(sum(c * (c - 1)) AS BIGINT) AS repeat_mass
      |  FROM c GROUP BY source)
      |SELECT source, total_tokens, distinct_tokens, repeat_mass,
      |  (repeat_mass * 1000000000) // (total_tokens * (total_tokens - 1))
      |    AS simpson_ppb
      |FROM agg""".stripMargin

  /** q141 — distributional token similarity: tokens that appear in the
    * same neighborhoods are interchangeable — the count-based kernel of
    * distributional semantics (Firth's "you shall know a word by the
    * company it keeps"), run entirely in the engine with no model. Each
    * token's profile is its adjacency co-occurrence counts (both
    * directions), TRUNCATED to the top-32 contexts through the
    * bounded-heap TopKPerGroup operator (deterministic (count desc,
    * ctx) tie-break) — the standard fanout bound that keeps the
    * per-context self-join from degenerating on stopword-like hubs.
    * Similarity is weighted Jaccard Σmin/Σmax over the truncated
    * profiles — all-integer (Σmax = tot1 + tot2 − Σmin by
    * inclusion–exclusion), so the ranking replays bit-for-bit.
    *
    * Scale shape: profile build is one (token, ctx) shuffle; the
    * candidate join shuffles truncated profiles on ctx with per-key
    * fanout bounded by how many tokens keep that ctx in their top-32;
    * totals join back broadcast (vocabulary-sized — swap to a shuffle
    * join past ~10M tokens). Pair space never touches documents.
    */
  def q141DistribSim(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(wsTokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val adj = toks.select(explode(expr(
      "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS l, t[i + 1] AS r))"))
      .as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
    val prof = graft.plans.TopK.perGroup(
      adj.select(col("l").as("token"), col("r").as("ctx"))
        .union(adj.select(col("r").as("token"), col("l").as("ctx")))
        .groupBy(col("token"), col("ctx")).agg(count(lit(1)).as("c")),
      group = Seq(col("token")),
      order = Seq(col("c").desc, col("ctx")),
      k = 32)
      .drop("rk")
      // consumed by the totals census and BOTH sides of the pair join
      .transform(graft.runtime.Materialize.once)
    val totals = prof.groupBy(col("token")).agg(sum(col("c")).as("tot"))
    val inter = prof.as("a")
      .join(prof.as("b"),
        col("a.ctx") === col("b.ctx") && col("a.token") < col("b.token"))
      .select(col("a.token").as("t1"), col("b.token").as("t2"),
        least(col("a.c"), col("b.c")).as("m"))
      .groupBy(col("t1"), col("t2")).agg(sum(col("m")).as("n_min"))
    inter
      .join(broadcast(totals.select(col("token").as("t1"),
        col("tot").as("tot1"))), Seq("t1"))
      .join(broadcast(totals.select(col("token").as("t2"),
        col("tot").as("tot2"))), Seq("t2"))
      .withColumn("sim_ppm",
        expr("(n_min * 1000000L) div (tot1 + tot2 - n_min)"))
      .filter(col("sim_ppm") >= 300000)
      .select(col("t1"), col("t2"), col("n_min"), col("tot1"),
        col("tot2"), col("sim_ppm"))
  }

  val q141Oracle: String =
    """WITH t AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
      |adj AS (
      |  SELECT t[i] AS l, t[i + 1] AS r
      |  FROM t, unnest(range(1, len(t))) u(i)
      |  WHERE len(t) >= 2),
      |pr0 AS (
      |  SELECT token, ctx, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT l AS token, r AS ctx FROM adj
      |    UNION ALL SELECT r AS token, l AS ctx FROM adj)
      |  GROUP BY token, ctx),
      |pr AS (
      |  SELECT token, ctx, c FROM (
      |    SELECT token, ctx, c,
      |      row_number() OVER (PARTITION BY token ORDER BY c DESC, ctx)
      |        AS rk
      |    FROM pr0) WHERE rk <= 32),
      |tot AS (
      |  SELECT token, CAST(sum(c) AS BIGINT) AS tot FROM pr GROUP BY token),
      |i AS (
      |  SELECT a.token AS t1, b.token AS t2,
      |    CAST(sum(least(a.c, b.c)) AS BIGINT) AS n_min
      |  FROM pr a JOIN pr b ON a.ctx = b.ctx AND a.token < b.token
      |  GROUP BY a.token, b.token)
      |SELECT i.t1, i.t2, i.n_min, x.tot AS tot1, y.tot AS tot2,
      |  (i.n_min * 1000000) // (x.tot + y.tot - i.n_min) AS sim_ppm
      |FROM i
      |JOIN tot x ON x.token = i.t1
      |JOIN tot y ON y.token = i.t2
      |WHERE (i.n_min * 1000000) // (x.tot + y.tot - i.n_min) >= 300000""".stripMargin

  /** q154 — degree distribution of the token co-occurrence graph:
    * distinct-neighbor degree per token (undirected adjacency), the
    * degree histogram, and the complementary CDF in ppm — the
    * heavy-tail profile read BEFORE running graph algorithms on a
    * corpus graph (a power-law tail means hub-aware salting; a thin
    * tail means plain hash partitioning is fine), and the growth curve
    * for q141's top-k context truncation.
    *
    * Scale shape: distinct edges are one shuffle; degrees one
    * aggregate; the histogram is degree-support-sized and the CCDF
    * rides a support-spine window (distinct degree VALUES, never
    * tokens). The vocabulary total broadcasts as a 1-row scalar.
    */
  def q154DegreeDist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adj = Tables.load(spark, dir, "documents")
      .select(wsTokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS l, t[i + 1] AS r))"))
        .as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .filter(col("l") =!= col("r"))
    val edges = adj
      .select(least(col("l"), col("r")).as("a"),
        greatest(col("l"), col("r")).as("b"))
      .distinct()
    val degrees = edges.select(col("a").as("token"))
      .union(edges.select(col("b").as("token")))
      .groupBy(col("token")).agg(count(lit(1)).as("degree"))
    val hist = degrees.groupBy(col("degree"))
      .agg(count(lit(1)).as("n_tokens"))
    val total = degrees.agg(count(lit(1)).as("n_vocab"))
    hist.crossJoin(broadcast(total))
      .withColumn("n_at_least",
        sum(col("n_tokens")).over(Window.orderBy(col("degree").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ccdf_ppm",
        expr("(n_at_least * 1000000L) div n_vocab"))
      .select(col("degree"), col("n_tokens"), col("n_at_least"),
        col("ccdf_ppm"))
  }

  val q154Oracle: String =
    """WITH t AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
      |adj AS (
      |  SELECT t[i] AS l, t[i + 1] AS r
      |  FROM t, unnest(range(1, len(t))) u(i)
      |  WHERE len(t) >= 2 AND t[i] <> t[i + 1]),
      |e AS (
      |  SELECT DISTINCT least(l, r) AS a, greatest(l, r) AS b FROM adj),
      |d AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS degree FROM (
      |    SELECT a AS token FROM e UNION ALL SELECT b FROM e)
      |  GROUP BY token),
      |h AS (
      |  SELECT degree, CAST(count(*) AS BIGINT) AS n_tokens
      |  FROM d GROUP BY degree),
      |v AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM d)
      |SELECT degree, n_tokens,
      |  CAST(sum(n_tokens) OVER (ORDER BY degree DESC
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_least,
      |  CAST((sum(n_tokens) OVER (ORDER BY degree DESC
      |    ROWS UNBOUNDED PRECEDING) * 1000000) // n_vocab AS BIGINT)
      |    AS ccdf_ppm
      |FROM h, v""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_token_stats" -> (q16TokenStats _),
    "q17_lang_id" -> (q17LangId _),
    "q18_quality" -> (q18Quality _),
    "q19_fingerprint" -> (q19Fingerprint _),
    "q29_topk_per_source" -> (q29TopkPerSource _),
    "q30_training_prep" -> (q30TrainingPrep _),
    "q31_winnow" -> (q31Winnow _),
    "q35_train_split" -> (q35TrainSplit _),
    "q36_pack_stats" -> (q36PackStats _),
    "q37_length_percentiles" -> (q37LengthPercentiles _),
    "q38_rollup_stats" -> (q38RollupStats _),
    "q39_doc_frequency" -> (q39DocFrequency _),
    "q40_global_topk" -> (q40GlobalTopK _),
    "q42_quality_filter" -> (q42QualityFilter _),
    "q43_repetition" -> (q43Repetition _),
    "q46_approx_percentiles" -> (q46ApproxPercentiles _),
    "q47_approx_distinct" -> (q47ApproxDistinct _),
    "q125_ngram_diversity" -> (q125NgramDiversity _),
    "q128_oov_rate" -> (q128OovRate _),
    "q129_filter_funnel" -> (q129FilterFunnel _),
    "q132_lang_margin" -> (q132LangMargin _),
    "q135_simpson" -> (q135Simpson _),
    "q141_distrib_sim" -> (q141DistribSim _),
    "q154_degree_dist" -> (q154DegreeDist _))

  val oracles: Map[String, String] = Map(
    "q16_token_stats" -> q16Oracle,
    "q17_lang_id" -> q17Oracle,
    "q18_quality" -> q18Oracle,
    "q19_fingerprint" -> q19Oracle,
    "q29_topk_per_source" -> q29Oracle,
    "q30_training_prep" -> q30Oracle,
    "q31_winnow" -> q31Oracle,
    "q35_train_split" -> q35Oracle,
    "q36_pack_stats" -> q36Oracle,
    "q37_length_percentiles" -> q37Oracle,
    "q38_rollup_stats" -> q38Oracle,
    "q39_doc_frequency" -> q39Oracle,
    "q40_global_topk" -> q40Oracle,
    "q42_quality_filter" -> q42Oracle,
    "q43_repetition" -> q43Oracle,
    "q46_approx_percentiles" -> q46Oracle,
    "q47_approx_distinct" -> q47Oracle,
    "q125_ngram_diversity" -> q125Oracle,
    "q128_oov_rate" -> q128Oracle,
    "q129_filter_funnel" -> q129Oracle,
    "q132_lang_margin" -> q132Oracle,
    "q135_simpson" -> q135Oracle,
    "q141_distrib_sim" -> q141Oracle,
    "q154_degree_dist" -> q154Oracle)
}
