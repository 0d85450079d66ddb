package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.runtime.{Materialize, Tables}

/** Round-5 additions: the remaining classic corpus-processing shapes —
  * an EXACT set-similarity self-join via prefix filtering (the
  * AllPairs/PPJoin family, the deterministic complement to the
  * MinHash/SimHash approximate miners), BM25 relevance scoring, and
  * time-series gap filling with forward fill. Same contract as every
  * tier: a DuckDB oracle per query, integer/rational threshold math so
  * hash comparison is exact.
  */
object CorpusQueries {

  /** Exact Jaccard self-join (τ = 0.8) via prefix filtering.
    *
    * Unlike the LSH miners (q21/q23), this is EXACT: every qualifying
    * pair is found, no probabilistic recall. The classic AllPairs /
    * PPJoin prefix-filter principle (Bayardo et al., WWW'07; Xiao et
    * al., WWW'08): order each document's token set by ascending global
    * document frequency (rarest first — the canonical ordering that
    * minimizes candidate volume), keep only the first
    * `p = n − ceil(τ·n) + 1` tokens as the document's PREFIX; any pair
    * with jac ≥ τ must share at least one prefix token (pigeonhole on
    * the required overlap ceil(τ·max(|a|,|b|))), so an equi-join on
    * prefix tokens is a complete candidate generator.
    *
    * Scale shape: the frequency join shuffles on token (vocabulary
    * scale), the candidate join shuffles on (source, prefix-token) —
    * bucket sizes are small BY CONSTRUCTION because prefixes hold the
    * rarest tokens; verification joins back on doc_id. No all-pairs
    * stage anywhere. Threshold math is integer (5·common ≥ 4·union and
    * ceil(0.8n) = (4n+4) div 5), so both engines compare exactly.
    *
    * The oracle is the within-source ALL-PAIRS join — sound AND
    * complete, so a hash match proves the prefix filter missed nothing
    * (completeness is the hard claim; a too-short prefix silently drops
    * pairs).
    */
  def q90PrefixJoin(spark: SparkSession, dir: String): DataFrame = {
    // sorted ONCE per document so the verify stage can merge-count
    // (SortedArrayIntersectCount) instead of allocating an
    // array_intersect hash set per candidate pair
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        array_sort(array_distinct(TextAnalysis.wsTokens(col("text"))))
          .as("toks"))
      // consumed by the token explode and BOTH verify join-backs
      .transform(Materialize.once)
    val tok = docs.select(col("doc_id"), col("source"),
      explode(col("toks")).as("token"))
    // global document frequency — the prefix-filter canonical ordering
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // posexplode carries each prefix token's 0-based POSITION in the
    // document's rarity-ordered token list — the input to the PPJoin
    // positional filter below (Xiao et al., WWW'08 §3.2)
    val prefixes = tok.join(freq, Seq("token"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sort_array(collect_list(struct(col("df"), col("token"))))
        .as("byRarity"))
      .select(col("doc_id"), col("source"), size(col("byRarity")).as("n"),
        posexplode(expr(
          "slice(transform(byRarity, x -> x.token), 1, " +
            "size(byRarity) - ((4 * size(byRarity) + 4) div 5) + 1)")))
      .withColumnRenamed("pos", "ppos")
      .withColumnRenamed("col", "ptok")
      // consumed by BOTH candidate-join branches; without this the
      // probe/index sides are no longer identical subtrees (the index
      // filter sits between them), so ReuseExchange can't dedupe the
      // collect_list aggregate and it would run twice. The frame is
      // prefix-sized (≈ |docs|·n/5 rows), far smaller than the corpus.
      .transform(Materialize.once)
    // AllPairs indexing-prefix asymmetry (Bayardo et al., WWW'07 §3.1;
    // Xiao et al., WWW'08): orient each pair so the SMALLER document
    // (ties by id) is the index side, which then only needs its first
    // n − ceil(2τ/(1+τ)·n) + 1 tokens — n/9+1 at τ = 0.8 vs the probe
    // side's n/5+1. Soundness: for a qualifying pair the required
    // overlap α = ceil(τ/(1+τ)·(nP+nI)) satisfies α ≥ ceil(τ·nP) (as
    // nI ≥ τ·nP) and α ≥ ceil(2τ/(1+τ)·nI) (as nP ≥ nI), and the
    // globally SMALLEST common token has ≥ α−1 common tokens after it
    // in both lists, so it sits within both prefixes — the equi-join
    // finds it. Cuts the candidate-occurrence volume almost in half.
    val index = prefixes
      .filter(col("ppos") < col("n") - expr("(8 * n + 8) div 9") + lit(1))
    // Three O(1) integer prunes inside the candidate join, before the
    // pair aggregation and the array-carrying verify joins:
    //  - orientation: index side strictly smaller (or equal-size,
    //    lower id) — each pair generated exactly one way;
    //  - AllPairs size-ratio: jac ≤ min/max, so τ = 0.8 requires
    //    5·nI ≥ 4·nP (nI ≤ nP by orientation);
    //  - PPJoin positional: both docs order tokens by the same global
    //    (df, token) key, so at the pair's FIRST shared prefix token
    //    (min position on both sides simultaneously — the relative
    //    order of shared tokens is identical in both lists, and any
    //    common token before it would sit inside both prefixes,
    //    contradicting minimality) no earlier token is shared, and
    //    overlap ≤ 1 + min(nP−pP−1, nI−pI−1) = min(nP−pP, nI−pI)
    //    (0-based p). jac ≥ 4/5 needs overlap ≥ ceil(4(nP+nI)/9), so
    //    pairs whose suffixes can't reach that bound die here — the
    //    all-pairs oracle's hash match keeps proving no qualifying
    //    pair is lost.
    val cand = prefixes.select(col("source"), col("ptok"),
        col("doc_id").as("idp"), col("n").as("np"), col("ppos").as("pp"))
      .join(index.select(col("source"), col("ptok"),
          col("doc_id").as("idi"), col("n").as("ni"), col("ppos").as("pi")),
        Seq("source", "ptok"))
      .filter(col("ni") < col("np") ||
        (col("ni") === col("np") && col("idi") < col("idp")))
      .filter(col("ni") * 5 >= col("np") * 4)
      .groupBy(col("source"), col("idp"), col("idi"), col("np"), col("ni"))
      .agg(min(col("pp")).as("pp"), min(col("pi")).as("pi"))
      .filter(least(col("np") - col("pp"), col("ni") - col("pi")) >=
        expr("(4 * (np + ni) + 8) div 9"))
      // output pairs are id-ordered (the oracle's a.doc_id < b.doc_id),
      // independent of the size orientation used for candidate mining
      .select(col("source"),
        least(col("idp"), col("idi")).as("id1"),
        greatest(col("idp"), col("idi")).as("id2"))
    val interCount = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SortedArrayIntersectCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("t1")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col("t2"))))
    cand
      .join(docs.select(col("doc_id").as("id1"), col("toks").as("t1")), Seq("id1"))
      .join(docs.select(col("doc_id").as("id2"), col("toks").as("t2")), Seq("id2"))
      .select(col("source"), col("id1"), col("id2"),
        interCount.cast("long").as("n_common"),
        (size(col("t1")) + size(col("t2"))).cast("long").as("n_sizes"))
      // union = |a| + |b| − |a∩b| from the carried sizes — no second merge
      .select(col("source"), col("id1"), col("id2"), col("n_common"),
        (col("n_sizes") - col("n_common")).as("n_union"))
      .filter(col("n_common") * 5 >= col("n_union") * 4)
  }

  val q90Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    list_distinct(string_split_regex(trim(text), '\s+')) AS toks
      |  FROM documents)
      |SELECT a.source, a.doc_id AS id1, b.doc_id AS id2,
      |  CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_common,
      |  CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS BIGINT) AS n_union
      |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE 5 * len(list_intersect(a.toks, b.toks))
      |      >= 4 * len(list_distinct(list_concat(a.toks, b.toks)))""".stripMargin

  /** BM25 relevance scoring (k1 = 1.2, b = 0.75) of every document
    * against a fixed query-term set — the retrieval-quality signal a
    * training-data pipeline uses to rank documents against seed
    * queries. Emitted per (doc, term) so no cross-term float summation
    * order can differ between engines; the idf uses the ratio form
    * (N − df + 0.5)/(df + 0.5) with no logarithm.
    *
    * Cross-engine float exactness: a chain of double ×/+ ops is NOT
    * hash-safe (one engine may contract a·b+c into an FMA — observed
    * as a 1-ulp drift on this very query), so the score is carried as
    * an EXACT integer rational: multiplying idf · tf·(k1+1) /
    * (tf + k1·(1−b) + k1·b·dl·N/S) through by (2df+1)·10·S gives
    *   num = (2N − 2df + 1) · 22 · S · tf
    *   den = (2df + 1) · (10·S·tf + 3·S + 9·dl·N)
    * (S = Σ dl, all integer). The double `score` is then ONE division
    * of two exactly-equal longs — long→double conversion and a single
    * IEEE divide are both exactly rounded, so it is bit-identical in
    * any engine.
    *
    * Scale shape: one token explode + filter to the (tiny, broadcast)
    * term list, per-(doc, term) count, df from the tf frame (not a
    * second corpus pass), S/N as a broadcast 1-row scalar aggregate.
    * (num/den fit a long up to ~10^5 docs per aggregation scope; at
    * larger N, scope the scoring per shard or divide num/den by
    * gcd-scale factors before the multiply-through.)
    */
  def q91Bm25(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "vector", "customer")
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
      .transform(Materialize.once)
    val stats = d.agg(sum(col("dl")).as("sdl"), count(lit(1)).as("n"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val num = (lit(2) * col("n") - lit(2) * col("df") + lit(1)) *
      lit(22) * col("sdl") * col("tf")
    val den = (lit(2) * col("df") + lit(1)) *
      (lit(10) * col("sdl") * col("tf") + lit(3) * col("sdl") +
        lit(9) * col("dl") * col("n"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
        num.cast("long").as("score_num"), den.cast("long").as("score_den"),
        (num.cast("double") / den.cast("double")).as("score"))
  }

  val q91Oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS dl,
      |    string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |stats AS (
      |  SELECT CAST(sum(dl) AS BIGINT) AS sdl, count(*) AS n FROM d),
      |tf AS (
      |  SELECT doc_id, t AS term, count(*) AS tf
      |  FROM d, unnest(toks) AS u(t)
      |  WHERE t IN ('spark', 'vector', 'customer') GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
      |SELECT tf.doc_id, tf.term,
      |  CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
      |  CAST((2*n - 2*df.df + 1) * 22 * sdl * tf.tf AS BIGINT) AS score_num,
      |  CAST((2*df.df + 1) * (10*sdl*tf.tf + 3*sdl + 9*d.dl*n) AS BIGINT)
      |    AS score_den,
      |  CAST((2*n - 2*df.df + 1) * 22 * sdl * tf.tf AS DOUBLE)
      |    / CAST((2*df.df + 1) * (10*sdl*tf.tf + 3*sdl + 9*d.dl*n) AS DOUBLE)
      |    AS score
      |FROM tf JOIN df USING (term) JOIN d USING (doc_id)
      |CROSS JOIN stats""".stripMargin

  /** Hourly gap fill with forward fill: the time-series densification
    * every monitoring/feature pipeline needs — materialize the full
    * (event_type × day × hour) spine, left-join observed hourly counts,
    * carry the last observed count forward into empty slots (0 before
    * the first observation), and flag which slots were gaps.
    *
    * Scale shape: the spine is generated (sequence + explode), never
    * collected; the observed counts come from one partial-aggregated
    * groupBy; the forward fill is one window per event_type ordered by
    * (day, hour) — at 100 TB the spine stays proportional to
    * types × slots, not to the event volume, and the window key is the
    * low-cardinality type column with a time-ordered sequential scan
    * per key.
    */
  def q92GapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val slots = e.groupBy(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val spine = e.agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(spark.range(0, 24).select(col("id").cast("int").as("hr")))
      .crossJoin(e.select(col("event_type")).distinct())
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"), col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(slots, Seq("event_type", "day", "hr"), "left")
      .select(col("event_type"), col("day"), col("hr"),
        coalesce(last(col("n"), ignoreNulls = true).over(w), lit(0L))
          .as("n_filled"),
        col("n").isNull.cast("int").as("was_gap"))
  }

  val q92Oracle: String =
    """WITH slots AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr, count(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |b AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |      FROM events),
      |spine AS (
      |  SELECT et.event_type, gs.day, h.hr
      |  FROM (SELECT DISTINCT event_type FROM events) et
      |  CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
      |              AS day FROM b) gs
      |  CROSS JOIN (SELECT unnest(generate_series(0, 23))::INT AS hr) h),
      |j AS (
      |  SELECT s.event_type, s.day, s.hr, o.n
      |  FROM spine s LEFT JOIN slots o USING (event_type, day, hr))
      |SELECT event_type, day, hr,
      |  CAST(coalesce(last_value(n IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY day, hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
      |    AS n_filled,
      |  CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
      |FROM j""".stripMargin

  /** Rare-shingle containment between sources — the cross-shard
    * contamination / duplication signal: how many of a source's RARE
    * 3-token shingles (present in ≤ 5 sources) also appear in another
    * source. Shingles reuse the fused codegen'd
    * [[graft.functions.TokenShinglesAll]] expression from the q21/q43
    * path.
    *
    * Scale shape: the rarity threshold is ALSO the join bound — a
    * shingle in ≤ 5 sources contributes ≤ C(5,2) = 10 pairs, so the
    * shingle-keyed self-join has constant per-key fanout no matter how
    * large the corpus (the frequent-shingle mass that would make the
    * join quadratic is exactly what the HAVING clause drops). ppm
    * containment is integer division — hash-exact.
    */
  def q93RareOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val maxSources = 5
    val st = Tables.load(spark, dir, "documents")
      .select(col("source"),
        explode(Dedup.allShingles(TextAnalysis.wsTokens(col("text")), 3))
          .as("shingle"))
      .distinct()
      // consumed by the rarity aggregate, the pair join (twice), and
      // the per-source size aggregate
      .transform(Materialize.once)
    val rare = st.groupBy(col("shingle"))
      .agg(count(lit(1)).as("n_src"))
      .filter(col("n_src") <= maxSources)
      .select(col("shingle"))
    val rs = st.join(rare, Seq("shingle")).transform(Materialize.once)
    val sz = rs.groupBy(col("source")).agg(count(lit(1)).as("n_rare"))
    rs.select(col("shingle"), col("source").as("s1"))
      .join(rs.select(col("shingle"), col("source").as("s2")), Seq("shingle"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sz.select(col("source").as("s1"), col("n_rare").as("n_rare_s1")),
        Seq("s1"))
      .select(col("s1"), col("s2"), col("n_shared"),
        expr("n_shared * 1000000 div n_rare_s1").as("containment_ppm"))
  }

  val q93Oracle: String =
    """WITH toks AS (
      |  SELECT source, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |st AS (
      |  SELECT DISTINCT source,
      |    array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
      |  FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)),
      |rare AS (
      |  SELECT shingle FROM st GROUP BY shingle HAVING count(*) <= 5),
      |rs AS (SELECT st.source, st.shingle FROM st JOIN rare USING (shingle)),
      |sz AS (SELECT source, count(*) AS n_rare FROM rs GROUP BY source)
      |SELECT a.source AS s1, b.source AS s2,
      |  CAST(count(*) AS BIGINT) AS n_shared,
      |  CAST(count(*) * 1000000 // max(sz.n_rare) AS BIGINT)
      |    AS containment_ppm
      |FROM rs a JOIN rs b ON a.shingle = b.shingle AND a.source < b.source
      |JOIN sz ON sz.source = a.source
      |GROUP BY a.source, b.source""".stripMargin

  /** Equi-depth deciles of document length per source (ntile): the
    * profiling shape that drives partition sizing and length-bucketed
    * curriculum sampling. ntile assigns ties by row order, so the
    * window orders by the UNIQUE (dl, doc_id) key — deterministic in
    * any engine. Output is all-integer.
    */
  def q94NtileDeciles(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(TextAnalysis.wsTokens(col("text"))).as("dl"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("dl"), col("doc_id"))
    d.withColumn("decile", ntile(10).over(w))
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("dl")).as("min_dl"), max(col("dl")).as("max_dl"))
  }

  val q94Oracle: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS dl
      |  FROM documents),
      |t AS (
      |  SELECT source, dl,
      |    ntile(10) OVER (PARTITION BY source ORDER BY dl, doc_id)
      |      AS decile
      |  FROM d)
      |SELECT source, CAST(decile AS INT) AS decile,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(min(dl) AS INT) AS min_dl, CAST(max(dl) AS INT) AS max_dl
      |FROM t GROUP BY source, decile""".stripMargin

  /** Distribution position statistics per (source, length):
    * percent_rank = (rank−1)/(N−1) and cume_dist = |≤| / N. Both are
    * functions of the VALUE, not of tie order, so they are
    * deterministic under ties; both are one exact IEEE division of two
    * integers — bit-identical across engines.
    */
  def q95CumeDist(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(TextAnalysis.wsTokens(col("text"))).as("dl"))
    val w = Window.partitionBy(col("source")).orderBy(col("dl"))
    d.select(col("source"), col("dl"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .distinct()
  }

  val q95Oracle: String =
    """WITH d AS (
      |  SELECT source, len(string_split_regex(trim(text), '\s+')) AS dl
      |  FROM documents)
      |SELECT DISTINCT source, CAST(dl AS INT) AS dl,
      |  percent_rank() OVER (PARTITION BY source ORDER BY dl) AS pct_rank,
      |  cume_dist() OVER (PARTITION BY source ORDER BY dl) AS cume
      |FROM d""".stripMargin

  /** q115 — phrase search over a POSITIONAL token index: the retrieval
    * primitive q99's inverted index lacks (its postings are per-token;
    * a phrase needs adjacency). Query phrases are the opening 3-grams
    * of a deterministic document subset (doc_id ≡ 0 mod 101 — the
    * "query log"). Matching is the classic positional-index plan: seed
    * on the phrase's FIRST token, then one adjacency equi-join per
    * remaining position ((doc_id, pos+k) against a token stream
    * PRE-FILTERED to that position's token set). Generalizes to any
    * phrase length by adding joins — no n-gram materialization, unlike
    * the shingle joins of q106/q112.
    *
    * Scale shape: the phrase table is broadcast everywhere; every
    * corpus-side stream is membership-filtered map-side BEFORE its
    * shuffle, so each adjacency join moves only tokens that can still
    * match (corpus frequency of the phrase's tokens, not corpus size).
    */
  def q115PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextAnalysis.wsTokens(col("text"))).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("pos"), col("tok"))
      .transform(Materialize.once) // seed + two adjacency streams
    val ph = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 101 === 0)
      .select(TextAnalysis.wsTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(
        concat_ws(" ", slice(col("toks"), 1, 3)).as("phrase"),
        element_at(col("toks"), 1).as("t1"),
        element_at(col("toks"), 2).as("t2"),
        element_at(col("toks"), 3).as("t3"))
      .distinct()
    def filtered(tcol: String): DataFrame = toks
      .join(broadcast(ph.select(col(tcol)).distinct()), col("tok") === col(tcol))
      .select(col("doc_id"), col("pos"), col("tok"))
    val seed = toks.join(broadcast(ph), col("tok") === col("t1"))
      .select(col("phrase"), col("t2"), col("t3"), col("doc_id"), col("pos"))
    val two = seed.join(filtered("t2").as("p2"),
      seed("doc_id") === col("p2.doc_id") &&
        col("p2.pos") === seed("pos") + 1 && col("p2.tok") === seed("t2"))
      .select(col("phrase"), col("t3"), seed("doc_id").as("doc_id"), seed("pos").as("pos"))
    val three = two.join(filtered("t3").as("p3"),
      two("doc_id") === col("p3.doc_id") &&
        col("p3.pos") === two("pos") + 2 && col("p3.tok") === two("t3"))
      .select(col("phrase"), two("doc_id").as("doc_id"))
    three.groupBy(col("phrase"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
  }

  val q115Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, CAST(i AS INT) AS pos, toks[CAST(i AS INT)] AS tok
      |  FROM t, unnest(range(1, len(toks) + 1)) u(i)),
      |ph AS (
      |  SELECT DISTINCT array_to_string(list_slice(toks, 1, 3), ' ') AS phrase,
      |    toks[1] AS t1, toks[2] AS t2, toks[3] AS t3
      |  FROM t WHERE doc_id % 101 = 0 AND len(toks) >= 3),
      |m AS (
      |  SELECT ph.phrase, p1.doc_id FROM ph
      |  JOIN pos p1 ON p1.tok = ph.t1
      |  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
      |    AND p2.tok = ph.t2
      |  JOIN pos p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
      |    AND p3.tok = ph.t3)
      |SELECT phrase, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_occurrences
      |FROM m GROUP BY phrase""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_prefix_join" -> (q90PrefixJoin _),
    "q91_bm25" -> (q91Bm25 _),
    "q92_gap_fill" -> (q92GapFill _),
    "q93_rare_overlap" -> (q93RareOverlap _),
    "q94_ntile_deciles" -> (q94NtileDeciles _),
    "q95_cume_dist" -> (q95CumeDist _),
    "q115_phrase_search" -> (q115PhraseSearch _))

  val oracles: Map[String, String] = Map(
    "q90_prefix_join" -> q90Oracle,
    "q91_bm25" -> q91Oracle,
    "q92_gap_fill" -> q92Oracle,
    "q93_rare_overlap" -> q93Oracle,
    "q94_ntile_deciles" -> q94Oracle,
    "q95_cume_dist" -> q95Oracle,
    "q115_phrase_search" -> q115Oracle)
}
