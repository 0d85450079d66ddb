package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.{Base, Mod, Shift}
import graft.operators.Similarity
import graft.operators.TextAnalysis.wsTokenCount
import graft.plans.TopK
import graft.queries.OracleIdioms.{bi, wsTokensNonEmpty, wsTokensNonEmptySql}
import graft.runtime.{Materialize, Tables}

/** Round-8 curation tier: the training-run-facing operators a corpus
  * pipeline needs AFTER filtering/dedup have decided what survives —
  * how the data is ordered for training (q162), which cross-document
  * boilerplate is cut (q163), how much statistical confidence a corpus
  * metric carries (q164), and how two retrieval signals merge into one
  * ranking (q165).
  *
  * All four follow the portable-oracle idioms in [[OracleIdioms]]
  * (BIGINT-cast sums, non-negative `div`, empty-token-filtered
  * tokenization) and the established PortableHash replay (ascii fold +
  * squared-slot family) so every query is hash-match checked against
  * DuckDB.
  */
object CurationQueries {

  /** Seed tag baked into the q162 permutation hash — a new epoch is a
    * new tag, giving an independent deterministic order.
    */
  private val EpochTag = "e1:"
  private val MicrobatchSize = 32

  /** q163 fixed segmentation width (tokens) and the distinct-document
    * frequency at which a segment counts as cross-document boilerplate.
    */
  private val SegTokens = 16
  private val SegDf = 3

  /** q164 Poisson-bootstrap replica count. */
  private val BootReplicas = 32

  /** Integer inverse-CDF thresholds for a Poisson(1) draw from a
    * uniform hash slot in [0, Mod): the replica multiplicity is the
    * number of thresholds ≤ slot (0..6). Computed once here and
    * interpolated into BOTH the Spark plan and the oracle SQL, so the
    * two engines share the literal constants.
    */
  private val PoissonThresholds: Seq[Long] = {
    var term = math.exp(-1.0)
    var cdf = 0.0
    (0 to 5).map { k =>
      if (k > 0) term /= k
      cdf += term
      math.floor(cdf * Mod).toLong
    }
  }

  /** q165 rank-fusion constants (Cormack et al. SIGIR'09: k = 60). The
    * reciprocal is scaled to an integer so both engines sum exactly.
    */
  private val RrfCutoff = 10
  private val RrfDepth = 10
  private val RrfK = 60
  private val RrfScale = 1000000000L
  private val RrfTop = 5

  /** The PortableStringHash ascii fold replayed in DuckDB SQL —
    * identical to the q155/q21 idiom (list_reduce seeds with the first
    * element, matching the Scala fold's first-char initialization).
    */
  private def hSql(e: String): String =
    s"""list_reduce(list_transform(range(1, length($e) + 1),
       |      i -> ascii(($e)[i])::BIGINT),
       |    (a, b) -> (a * $Base + b) % $Mod)""".stripMargin

  // ---------------------------------------------------------------- q162

  /** q162 — deterministic epoch shuffle + microbatch mixture audit: the
    * training-order construction step. Each document's position in the
    * epoch is its rank under a seeded permutation hash (re-tag for a new
    * epoch → an independent order, reproducible across reruns and
    * restarts — the property a resumable training job needs). Positions
    * are grouped into fixed-size microbatches and each batch's source
    * diversity / language mix / token mass is reported — the audit that
    * catches a degenerate shuffle (e.g. source-clumped batches) before
    * a training run does.
    *
    * Scale shape: the global rank is q124's two-phase pattern — range
    * exchange on the hash, per-partition row_number, plus a
    * partition-count-sized offset spine — never a single-partition
    * window over the corpus. The audit is one hash aggregate on the
    * microbatch key. At 100 TB this is one range shuffle of slim rows
    * (id, source, lang, weight, hash).
    */
  def q162EpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        wsTokenCount(col("text")).cast("long").as("w"))
      .withColumn("h", expr(
        s"portable_string_hash(concat('$EpochTag', cast(doc_id as string)))"))
      // squared-slot avalanche: the raw polynomial fold of a SHORT id
      // string is small and consecutive ids stay adjacent (the fold is
      // linear in the last digit) — squaring mod M wraps thousands of
      // times and decorrelates neighbors, so the permutation has no
      // id-locality clumps
      .withColumn("hk", expr(s"h * h % ${Mod}L"))
      .repartitionByRange(col("hk"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      // pid must be IDENTICAL in the rank and offset branches — pin it
      .transform(Materialize.once)
    val local = d.withColumn("lrank",
      row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("hk"), col("doc_id"))))
    val offsets = d.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("pos", col("offset") + col("lrank") - 1)
      .withColumn("microbatch", expr(s"pos div $MicrobatchSize"))
      .groupBy(col("microbatch"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(col("w")).as("tokens"))
  }

  val q162Oracle: String = {
    val h = hSql("'" + EpochTag + "' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT doc_id, source, lang,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
       |    $h AS h
       |  FROM documents),
       |k AS (
       |  SELECT *, (h * h) % $Mod AS hk FROM d),
       |p AS (
       |  SELECT *, row_number() OVER (ORDER BY hk, doc_id) - 1 AS pos FROM k)
       |SELECT ${bi(s"pos // $MicrobatchSize")} AS microbatch,
       |  ${bi("count(*)")} AS n_docs,
       |  ${bi("count(DISTINCT source)")} AS n_sources,
       |  ${bi("sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)")} AS n_en,
       |  ${bi("sum(w)")} AS tokens
       |FROM p GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q163

  /** q163 — cross-document boilerplate removal on a FIXED segmentation
    * (the CCNet/RefinedWeb line-dedup analog, Wenzek et al. 2020 §3.1 —
    * our newline-free corpus segments on 16-token boundaries instead of
    * lines): a segment whose hash appears in ≥ [[SegDf]] DISTINCT
    * documents is boilerplate (headers, navigation, license blurbs) and
    * is excised from every document carrying it; documents are rebuilt
    * from their kept segments in position order. Differs from
    * q112/q113 (Lee et al. sliding-gram spans) in unit and policy:
    * fixed non-overlapping segments, distinct-document frequency
    * threshold, removal from ALL carriers — the cheap first-pass cut
    * that runs before span-level dedup.
    *
    * Scale shape: the census shuffles 8-byte segment hashes + doc ids
    * (never text); the join-back is hash-keyed; the rebuild groups each
    * document's own segments (per-doc cardinality, no data-sized
    * window). One corpus scan feeds segmentation, census, and rebuild
    * via a single materialization.
    */
  def q163SegmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        wsTokensNonEmpty(col("text")).as("t"))
      .withColumn("n", size(col("t")))
    val segs = base.filter(col("n") > 0)
      .select(col("doc_id"), col("source"), col("t"), col("n"),
        explode(expr(s"sequence(0, greatest(n - 1, 0), $SegTokens)"))
          .as("start"))
      .select(col("doc_id"), col("source"),
        expr(s"start div $SegTokens").as("seg_idx"),
        expr(s"array_join(slice(t, start + 1, $SegTokens), ' ')").as("seg"),
        expr(s"size(slice(t, start + 1, $SegTokens))").cast("long")
          .as("seg_len"))
      .withColumn("seg_h", expr("portable_string_hash(seg)"))
      .transform(Materialize.once) // census + join-back share one scan
    val census = segs.groupBy(col("seg_h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val flagged = segs.join(census, "seg_h")
      .withColumn("boiler", col("df") >= SegDf)
    val rebuilt = flagged.filter(!col("boiler"))
      .groupBy(col("doc_id"))
      .agg(length(array_join(
        transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          x => x.getField("seg")), " ")).cast("long").as("chars_kept"))
    val segStats = flagged.groupBy(col("source")).agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("n_segments"),
      sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
      sum(col("seg_len")).as("tokens_total"),
      sum(when(col("boiler"), col("seg_len")).otherwise(0L))
        .as("tokens_removed"))
    val charStats = base.filter(col("n") > 0)
      .select(col("doc_id"), col("source"))
      .join(rebuilt, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(sum(coalesce(col("chars_kept"), lit(0L))).as("chars_kept"))
    segStats.join(charStats, "source")
      .withColumn("removed_ppm",
        expr("(tokens_removed * 1000000L) div tokens_total"))
  }

  val q163Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, ${wsTokensNonEmptySql("text")} AS t
       |  FROM documents),
       |dd AS (
       |  SELECT doc_id, source, t, len(t) AS n FROM d WHERE len(t) > 0),
       |segs AS (
       |  SELECT doc_id, source,
       |    CAST(u.s // $SegTokens AS BIGINT) AS seg_idx,
       |    array_to_string(list_slice(t, u.s + 1, least(u.s + $SegTokens, n)), ' ')
       |      AS seg,
       |    CAST(len(list_slice(t, u.s + 1, least(u.s + $SegTokens, n))) AS BIGINT)
       |      AS seg_len
       |  FROM dd, unnest(range(0, greatest(n - 1, 0) + 1, $SegTokens)) AS u(s)),
       |sh AS (
       |  SELECT *, ${hSql("seg")} AS seg_h FROM segs),
       |census AS (
       |  SELECT seg_h, count(DISTINCT doc_id) AS df FROM sh GROUP BY seg_h),
       |fl AS (
       |  SELECT sh.*, census.df >= $SegDf AS boiler
       |  FROM sh JOIN census USING (seg_h)),
       |rebuilt AS (
       |  SELECT doc_id,
       |    CAST(length(string_agg(seg, ' ' ORDER BY seg_idx)) AS BIGINT)
       |      AS chars_kept
       |  FROM fl WHERE NOT boiler GROUP BY doc_id),
       |seg_stats AS (
       |  SELECT source,
       |    ${bi("count(DISTINCT doc_id)")} AS n_docs,
       |    ${bi("count(*)")} AS n_segments,
       |    ${bi("sum(CASE WHEN boiler THEN 1 ELSE 0 END)")} AS n_boiler,
       |    ${bi("sum(seg_len)")} AS tokens_total,
       |    ${bi("sum(CASE WHEN boiler THEN seg_len ELSE 0 END)")}
       |      AS tokens_removed
       |  FROM fl GROUP BY source),
       |chars AS (
       |  SELECT dd.source, ${bi("sum(coalesce(r.chars_kept, 0))")} AS chars_kept
       |  FROM dd LEFT JOIN rebuilt r ON r.doc_id = dd.doc_id
       |  GROUP BY dd.source)
       |SELECT s.source, n_docs, n_segments, n_boiler, tokens_total,
       |  tokens_removed, chars_kept,
       |  ${bi("(tokens_removed * 1000000) // tokens_total")} AS removed_ppm
       |FROM seg_stats s JOIN chars USING (source)""".stripMargin

  // ---------------------------------------------------------------- q164

  /** q164 — Poisson-bootstrap confidence bands (Chamandy et al. 2012,
    * "Estimating Uncertainty for Massive Data Streams" — the
    * one-pass bootstrap): every row draws a deterministic
    * Poisson(1) multiplicity per replica from the squared-slot hash
    * family (integer inverse-CDF over [[PoissonThresholds]]), giving
    * [[BootReplicas]] resampled per-source mean-token estimates in a
    * single scan; the band is the 2nd/31st order statistic of the 32
    * replica means (≈ p5/p95). The answer to "is this per-source metric
    * movement real or noise?" without a second pass over the data.
    *
    * Scale shape: the replica explosion is map-side (×32 per row) and
    * collapses immediately via partial aggregation — the shuffle
    * carries sources × 32 rows, independent of corpus size. No window
    * over data rows; the order statistics sort a 32-element array per
    * source. Determinism makes the bands reproducible and
    * oracle-checkable — no RNG state, no seed plumbing.
    */
  def q164BootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val draw = PoissonThresholds
      .map(t => when(col("hs") >= lit(t), 1L).otherwise(0L))
      .reduce(_ + _)
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        wsTokenCount(col("text")).cast("long").as("w"))
      .withColumn("h", expr(
        "portable_string_hash(cast(doc_id as string))"))
    val exact = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      expr("(sum(w) * 1000000L) div count(1)").as("exact_mean_ppm"))
    val boot = d
      .select(col("source"), col("w"), col("h"),
        explode(expr(s"sequence(0, ${BootReplicas - 1})")).as("r"))
      // DOUBLE squared-slot: one squaring is not enough here — the raw
      // fold of a short id string is small, so a single square of
      // (h + r·Shift) maps a narrow id band onto a narrow arc and a
      // whole replica can draw all-zero in lockstep. Square h first
      // (wraps ≫ M for any ≥3-char input, breaking id adjacency), THEN
      // shift per replica and square again for avalanche.
      .withColumn("y", expr(
        s"(h * h % ${Mod}L + (r + 1) * ${Shift}L) % ${Mod}L"))
      .withColumn("hs", expr(s"y * y % ${Mod}L"))
      .withColumn("c", draw)
      .groupBy(col("source"), col("r"))
      .agg(sum(col("c")).as("rn"), sum(col("c") * col("w")).as("rw"))
      .withColumn("mean_ppm",
        when(col("rn") === 0, 0L)
          .otherwise(expr("(rw * 1000000L) div rn")))
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("mean_ppm"))).as("means"))
      .select(col("source"),
        element_at(col("means"), 2).as("boot_lo_ppm"),
        element_at(col("means"), BootReplicas - 1).as("boot_hi_ppm"))
    exact.join(boot, "source")
      .select(col("source"), col("n_docs"), col("exact_mean_ppm"),
        col("boot_lo_ppm"), col("boot_hi_ppm"))
  }

  val q164Oracle: String = {
    val h = hSql("CAST(doc_id AS VARCHAR)")
    val drawSql = PoissonThresholds
      .map(t => s"CASE WHEN hs >= $t THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
       |    $h AS h
       |  FROM documents),
       |exact AS (
       |  SELECT source, ${bi("count(*)")} AS n_docs,
       |    ${bi("(sum(w) * 1000000) // count(*)")} AS exact_mean_ppm
       |  FROM d GROUP BY source),
       |reps AS (
       |  SELECT source, w, r, (y * y) % $Mod AS hs FROM (
       |    SELECT source, w, u.r AS r,
       |      ((h * h % $Mod) + (u.r + 1) * $Shift) % $Mod AS y
       |    FROM d, unnest(range(0, $BootReplicas)) AS u(r))),
       |boot AS (
       |  SELECT source, r, sum(c) AS rn, sum(c * w) AS rw
       |  FROM (SELECT source, w, r, $drawSql AS c FROM reps)
       |  GROUP BY source, r),
       |bands AS (
       |  SELECT source,
       |    list_sort(list(CASE WHEN rn = 0 THEN 0
       |                        ELSE CAST((rw * 1000000) // rn AS BIGINT) END))
       |      AS means
       |  FROM boot GROUP BY source)
       |SELECT e.source, e.n_docs, e.exact_mean_ppm,
       |  ${bi("b.means[2]")} AS boot_lo_ppm,
       |  ${bi(s"b.means[${BootReplicas - 1}]")} AS boot_hi_ppm
       |FROM exact e JOIN bands b ON b.source = e.source""".stripMargin
  }

  // ---------------------------------------------------------------- q165

  /** q165 — reciprocal-rank fusion (Cormack, Clarke & Büttcher
    * SIGIR'09) of a semantic ranking (exact cosine top-10 over the
    * embeddings, q24's machinery) and a lexical ranking (distinct-token
    * overlap top-10 via the inverted token index): fused score =
    * Σ floor(1e9 / (60 + rank)) over the lists containing the
    * candidate, top-5 per query. The standard no-tuning hybrid-search
    * combiner — and an exercise of FULL OUTER join semantics, since a
    * candidate may appear in either list alone.
    *
    * Scale shape: both rankings end in the bounded-heap TopKPerGroup
    * operator (no WindowExec sort); the semantic side broadcasts the
    * bounded query set; the lexical side joins on token (inverted-index
    * shape, work ∝ postings of shared tokens, never |queries|×|corpus|).
    * The fusion joins two k-bounded lists — 2·k rows per query.
    */
  /** The q165/q171 shared machinery: (semantic top-RrfDepth, lexical
    * top-RrfDepth, fused top-RrfTop) frames.
    */
  private def rrfParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < RrfCutoff)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val sem = Similarity.bruteForceTopK(e, q, RrfDepth)
      .select(col("query_id"), col("neighbor_id").as("id"),
        col("rank").cast("long").as("rank_sem"))
    val dt = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(wsTokensNonEmpty(col("text")))).as("tok"))
      .transform(Materialize.once) // query side + corpus side, one scan
    val qt = dt.filter(col("doc_id") < RrfCutoff)
      .select(col("doc_id").as("query_id"), col("tok"))
    val overlap = qt.join(dt, "tok")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("overlap"))
    val lex = TopK.perGroup(overlap, Seq(col("query_id")),
        Seq(col("overlap").desc, col("doc_id").asc), RrfDepth,
        rankName = "rank_lex")
      .select(col("query_id"), col("doc_id").as("id"),
        col("rank_lex").cast("long").as("rank_lex"))
    val fused = sem.join(lex, Seq("query_id", "id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr(s"${RrfScale}L div ($RrfK + rank_sem)"), lit(0L)) +
          coalesce(expr(s"${RrfScale}L div ($RrfK + rank_lex)"), lit(0L)))
      .select(col("query_id"), col("id"), col("rrf"))
    val top = TopK.perGroup(fused, Seq(col("query_id")),
      Seq(col("rrf").desc, col("id").asc), RrfTop, rankName = "rank")
    (sem, lex, top)
  }

  def q165RrfFusion(spark: SparkSession, dir: String): DataFrame =
    rrfParts(spark, dir)._3

  /** Shared q165/q171 oracle CTE chain, ending with `sem` / `lex`
    * (top-RrfDepth rankings) and `fr` (fused top-RrfTop).
    */
  private val rrfCtes: String =
    s"""q AS (
       |  SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id < $RrfCutoff),
       |sem0 AS (
       |  SELECT q.query_id, e.vec_id AS id,
       |    list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))
       |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))))
       |      AS cos
       |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
       |sem AS (
       |  SELECT query_id, id, rn AS rank_sem FROM (
       |    SELECT query_id, id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id)
       |        AS rn
       |    FROM sem0) WHERE rn <= $RrfDepth),
       |dt AS (
       |  SELECT doc_id, unnest(list_distinct(${wsTokensNonEmptySql("text")}))
       |    AS tok
       |  FROM documents),
       |ov AS (
       |  SELECT a.doc_id AS query_id, b.doc_id AS id, count(*) AS overlap
       |  FROM dt a JOIN dt b ON b.tok = a.tok AND b.doc_id <> a.doc_id
       |  WHERE a.doc_id < $RrfCutoff
       |  GROUP BY a.doc_id, b.doc_id),
       |lex AS (
       |  SELECT query_id, id, rn AS rank_lex FROM (
       |    SELECT query_id, id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY overlap DESC, id) AS rn
       |    FROM ov) WHERE rn <= $RrfDepth),
       |f AS (
       |  SELECT query_id, id,
       |    coalesce($RrfScale // (${RrfK} + s.rank_sem), 0)
       |      + coalesce($RrfScale // (${RrfK} + l.rank_lex), 0) AS rrf
       |  FROM sem s FULL JOIN lex l USING (query_id, id)),
       |fr AS (
       |  SELECT query_id, id, rrf, rank FROM (
       |    SELECT query_id, id, rrf,
       |      row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, id)
       |        AS rank
       |    FROM f) WHERE rank <= $RrfTop)""".stripMargin

  val q165Oracle: String =
    s"""WITH $rrfCtes
       |SELECT query_id, id, ${bi("rrf")} AS rrf, rank FROM fr""".stripMargin

  // ---------------------------------------------------------------- q171

  /** Evaluation depth and integer DCG weights: W_r = floor(1e9 /
    * log2(r+1)), the standard discounted-gain table as fixed constants
    * both engines share; IDCG@5 is the ideal-ordering constant for the
    * graded ground truth rel = 11 − rank (10, 9, 8, 7, 6).
    */
  private val NdcgK = 5
  private val DcgW: Seq[Long] = (1 to NdcgK).map(r =>
    math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)
  private val IdcgAtK: Long =
    (1 to NdcgK).map(r => (11 - r).toLong * DcgW(r - 1)).sum

  /** q171 — retrieval-quality evaluation (MRR and nDCG@5, Järvelin &
    * Kekäläinen TOIS'02): the lexical token-overlap ranking and the
    * RRF-fused ranking (q165's two systems) are scored against the
    * exact-cosine ranking as graded ground truth (rel = 11 − rank over
    * its top-10). The eval harness every retrieval change needs before
    * it ships — and the measurement that justifies fusing at all: the
    * fused system must dominate the lexical arm on both metrics.
    * All-integer: reciprocal ranks and discount weights are scaled
    * floors of fixed constants, so both engines agree exactly.
    *
    * Scale shape: rankings are the k-bounded q165 frames; the eval
    * joins |Q|·k-row lists and aggregates to one row per system.
    */
  def q171RankEval(spark: SparkSession, dir: String): DataFrame = {
    val (sem, lex, top) = rrfParts(spark, dir)
    val gt = sem.select(col("query_id"), col("id"),
      (lit(11L) - col("rank_sem")).as("rel"))
    val wCase = "CASE rank " + (1 to NdcgK)
      .map(r => s"WHEN $r THEN ${DcgW(r - 1)}L").mkString(" ") + " ELSE 0L END"
    def evalSys(name: String, sys: DataFrame): DataFrame =
      sys.join(gt, Seq("query_id", "id"), "left")
        .withColumn("rel", coalesce(col("rel"), lit(0L)))
        .groupBy(col("query_id"))
        .agg(sum(expr(s"rel * ($wCase)")).as("dcg"),
          min(when(col("rel") > 0, col("rank"))).as("rfirst"))
        .select(
          when(col("rfirst").isNull, 0L)
            .otherwise(expr(s"${RrfScale}L div rfirst")).as("rr_ppb"),
          expr(s"dcg * 1000000L div ${IdcgAtK}L").as("ndcg_ppm"))
        .agg(count(lit(1)).as("n_queries"),
          expr("sum(rr_ppb) div count(1)").as("mrr_ppb"),
          expr("sum(ndcg_ppm) div count(1)").as("ndcg_ppm"))
        .select(lit(name).as("system"), col("n_queries"),
          col("mrr_ppb"), col("ndcg_ppm"))
    val lexK = lex.filter(col("rank_lex") <= NdcgK)
      .select(col("query_id"), col("id"), col("rank_lex").as("rank"))
    val rrfK = top.select(col("query_id"), col("id"),
      col("rank").cast("long").as("rank"))
    evalSys("lexical", lexK).unionByName(evalSys("rrf", rrfK))
  }

  val q171Oracle: String = {
    val wCase = "CASE rank " + (1 to NdcgK)
      .map(r => s"WHEN $r THEN ${DcgW(r - 1)}").mkString(" ") + " ELSE 0 END"
    s"""WITH $rrfCtes,
       |gt AS (
       |  SELECT query_id, id, 11 - rank_sem AS rel FROM sem),
       |sys AS (
       |  SELECT 'lexical' AS system, query_id, id, rank_lex AS rank
       |  FROM lex WHERE rank_lex <= $NdcgK
       |  UNION ALL
       |  SELECT 'rrf', query_id, id, rank FROM fr),
       |j AS (
       |  SELECT s.system, s.query_id, s.rank, coalesce(g.rel, 0) AS rel
       |  FROM sys s LEFT JOIN gt g
       |    ON g.query_id = s.query_id AND g.id = s.id),
       |pq AS (
       |  SELECT system, query_id,
       |    sum(rel * ($wCase)) AS dcg,
       |    min(CASE WHEN rel > 0 THEN rank END) AS rfirst
       |  FROM j GROUP BY system, query_id),
       |per AS (
       |  SELECT system,
       |    CASE WHEN rfirst IS NULL THEN 0
       |         ELSE $RrfScale // rfirst END AS rr_ppb,
       |    dcg * 1000000 // $IdcgAtK AS ndcg_ppm
       |  FROM pq)
       |SELECT system, ${bi("count(*)")} AS n_queries,
       |  ${bi("sum(rr_ppb) // count(*)")} AS mrr_ppb,
       |  ${bi("sum(ndcg_ppm) // count(*)")} AS ndcg_ppm
       |FROM per GROUP BY system""".stripMargin
  }

  // ---------------------------------------------------------------- q167

  /** Distinct l-diversity threshold for q167. */
  private val LDiv = 3

  /** q167 — l-diversity release gate (Machanavajjhala et al. ICDE'06):
    * k-anonymity (q121) bounds group SIZE but a uniform sensitive value
    * still leaks; distinct l-diversity additionally requires ≥ l
    * distinct sensitive values per quasi-identifier group. QI =
    * (lang, source), sensitive = the document length band; groups
    * below l collapse into a per-lang residual that is itself released
    * only if diverse. The privacy-release companion to q121.
    *
    * Scale shape: one row-level aggregate for the group census, one
    * broadcast join of the (small) suppressed-key set back over the
    * rows for the residual diversity — no window, no self-join.
    */
  def q167LDiversity(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("source"), expr("n_chars div 200").as("band"))
      .transform(Materialize.once) // census + residual branches
    val g = d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("band")).as("l_div"))
      .transform(Materialize.once)
    val ok = g.filter(col("l_div") >= LDiv)
      .select(col("lang"), col("source"), col("n_docs"), col("l_div"))
    val suppKeys = g.filter(col("l_div") < LDiv).select(col("lang"), col("source"))
    val residual = d.join(broadcast(suppKeys), Seq("lang", "source"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("band")).as("l_div"))
      .filter(col("l_div") >= LDiv)
      .select(col("lang"), lit("__suppressed__").as("source"),
        col("n_docs"), col("l_div"))
    ok.unionByName(residual)
  }

  val q167Oracle: String =
    s"""WITH d AS (
       |  SELECT lang, source, n_chars // 200 AS band FROM documents),
       |g AS (
       |  SELECT lang, source, ${bi("count(*)")} AS n_docs,
       |    ${bi("count(DISTINCT band)")} AS l_div
       |  FROM d GROUP BY lang, source),
       |ok AS (
       |  SELECT lang, source, n_docs, l_div FROM g WHERE l_div >= $LDiv),
       |supp AS (
       |  SELECT d.* FROM d JOIN g USING (lang, source) WHERE g.l_div < $LDiv),
       |residual AS (
       |  SELECT lang, '__suppressed__' AS source,
       |    ${bi("count(*)")} AS n_docs,
       |    ${bi("count(DISTINCT band)")} AS l_div
       |  FROM supp GROUP BY lang
       |  HAVING count(DISTINCT band) >= $LDiv)
       |SELECT lang, source, n_docs, l_div FROM ok
       |UNION ALL
       |SELECT lang, source, n_docs, l_div FROM residual""".stripMargin

  // ---------------------------------------------------------------- q168

  /** q168 — temperature-scaled mixture weights (Lample & Conneau 2019 /
    * XLM-R α-sampling, α = 0.5): source s is sampled proportionally to
    * n_s^α, upweighting small sources against head domination without
    * the q103 hard-target mixture's feasibility cliff. Weight =
    * EXACT integer sqrt (double sqrt + a one-step integer correction,
    * so an ulp-off floor can never desync the engines); the target
    * sample (half the corpus) is allocated ∝ weight and capped at the
    * source's size.
    *
    * Scale shape: one source-sized aggregate; the Σweights/total scalar
    * broadcasts back over the source table (1-row crossJoin, q103's
    * pattern). The corpus is scanned once.
    */
  def q168TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w0", expr(
        "CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)"))
      .withColumn("weight", expr(
        "w0 - (CASE WHEN w0 * w0 > n_docs THEN 1 ELSE 0 END)" +
          " + (CASE WHEN (w0 + 1) * (w0 + 1) <= n_docs THEN 1 ELSE 0 END)"))
      .transform(Materialize.once) // scalar + allocation branches
    val tot = counts.agg(sum(col("weight")).as("sw"),
      sum(col("n_docs")).as("total"))
    counts.crossJoin(broadcast(tot))
      .withColumn("alloc",
        least(expr("(total div 2) * weight div sw"), col("n_docs")))
      .withColumn("alloc_ppm", expr("alloc * 1000000L div n_docs"))
      .select(col("source"), col("n_docs"), col("weight"), col("alloc"),
        col("alloc_ppm"))
  }

  val q168Oracle: String =
    s"""WITH counts AS (
       |  SELECT source, ${bi("count(*)")} AS n_docs FROM documents
       |  GROUP BY source),
       |wts AS (
       |  SELECT source, n_docs,
       |    ${bi("""w0 - (CASE WHEN w0 * w0 > n_docs THEN 1 ELSE 0 END)
       |       + (CASE WHEN (w0 + 1) * (w0 + 1) <= n_docs THEN 1 ELSE 0 END)""")}
       |      AS weight
       |  FROM (SELECT source, n_docs,
       |          CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w0
       |        FROM counts)),
       |tot AS (
       |  SELECT ${bi("sum(weight)")} AS sw, ${bi("sum(n_docs)")} AS total
       |  FROM wts)
       |SELECT source, n_docs, weight,
       |  ${bi("least((total // 2) * weight // sw, n_docs)")} AS alloc,
       |  ${bi("least((total // 2) * weight // sw, n_docs) * 1000000 // n_docs")}
       |    AS alloc_ppm
       |FROM wts, tot""".stripMargin

  // ---------------------------------------------------------------- q169

  /** Truncated discrete-Laplace inverse-CDF thresholds for ε = ln 2
    * (decay 1/2 per step, support clamped to ±8 with the tails
    * absorbed into the extreme bins — tail mass 1/384 per side). CDF
    * values are exact rationals (denominator 3·2^k), scaled to [0, Mod)
    * with BigInt floor division — no float anywhere, and both engines
    * interpolate these literal constants.
    */
  private val DpThresholds: Seq[Long] = {
    val M = BigInt(Mod)
    val neg = (-8 to -1).map { k => // CDF(k) = (1/3)(1/2)^(-k-1)
      (M / (BigInt(3) * BigInt(2).pow(-k - 1))).toLong
    }
    val zero = (M * 2 / 3).toLong // CDF(0) = 2/3
    val pos = (1 to 7).map { k => // CDF(k) = 1 - (1/3)(1/2)^k
      val d = BigInt(3) * BigInt(2).pow(k)
      ((M * (d - 1)) / d).toLong
    }
    neg ++ Seq(zero) ++ pos
  }

  /** q169 — differentially-private noisy counts (Dwork et al. TCC'06;
    * discrete/geometric mechanism, Ghosh-Roughgarden-Sundararajan
    * SICOMP'12): per-source document counts released with additive
    * two-sided-geometric noise at ε = ln 2, drawn DETERMINISTICALLY
    * from the double-squared-slot hash of the group key via the exact
    * integer inverse-CDF [[DpThresholds]] — reproducible, seedable
    * (retag the hash), and oracle-checkable, with no RNG service in
    * the loop. The true count rides along here for verifiability; a
    * production release would drop it (and the clamp-at-zero).
    *
    * Scale shape: one aggregate, then per-GROUP scalar arithmetic —
    * the noise draw costs nothing at any corpus size.
    */
  def q169DpCounts(spark: SparkSession, dir: String): DataFrame = {
    val draw = DpThresholds
      .map(t => when(col("hs") >= lit(t), 1L).otherwise(0L))
      .reduce(_ + _) - lit(8L)
    Tables.load(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_true"))
      .withColumn("h", expr("portable_string_hash(concat('dp1:', source))"))
      .withColumn("y", expr(s"h * h % ${Mod}L"))
      .withColumn("hs", expr(s"y * y % ${Mod}L"))
      .withColumn("noise", draw)
      .select(col("source"), col("n_true"), col("noise"),
        greatest(lit(0L), col("n_true") + col("noise")).as("n_noisy"))
  }

  val q169Oracle: String = {
    val h = hSql("'dp1:' || source")
    val drawSql = DpThresholds
      .map(t => s"CASE WHEN hs >= $t THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH g AS (
       |  SELECT source, ${bi("count(*)")} AS n_true FROM documents
       |  GROUP BY source),
       |hh AS (
       |  SELECT source, n_true, (y * y) % $Mod AS hs FROM (
       |    SELECT source, n_true, (($h) * ($h)) % $Mod AS y FROM g)),
       |nz AS (
       |  SELECT source, n_true, ${bi(s"($drawSql) - 8")} AS noise FROM hh)
       |SELECT source, n_true, noise,
       |  ${bi("greatest(0, n_true + noise)")} AS n_noisy
       |FROM nz""".stripMargin
  }

  // ---------------------------------------------------------------- q170

  /** q170 fixed example length (tokens, EOS included). */
  private val BlockLen = 128

  /** q170 — concat-and-slice training-example construction (the GPT
    * pretraining layout: every document's tokens plus one EOS flow
    * into a single corpus-ordered stream, sliced into fixed
    * [[BlockLen]]-token examples; documents CROSS example boundaries).
    * Differs from q104 (per-document overlapping windows) and q36
    * (greedy whole-doc bin packing): here the slicing is global and
    * exact, the layout that wastes zero tokens to padding. Output is
    * the docs-per-example distribution with each bucket's example
    * token range — the fragmentation profile that decides whether
    * BlockLen fits the corpus's document lengths.
    *
    * Scale shape: the global token offset is q124's two-phase prefix
    * sum (range exchange + per-partition cumsum + partition-spine
    * offsets — no corpus-sized window); each document then emits only
    * its own overlapped example ids (≤ len/BlockLen + 1 rows), and two
    * hash aggregates finish. One corpus scan, one range shuffle.
    */
  def q170ExamplePack(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (size(wsTokensNonEmpty(col("text"))) + 1).cast("long").as("n_tok"))
      .repartitionByRange(col("source"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .transform(Materialize.once) // local cumsum + offset spine
    val local = t.withColumn("loff",
      coalesce(sum(col("n_tok")).over(Window.partitionBy(col("pid"))
        .orderBy(col("source"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = t.groupBy(col("pid")).agg(sum(col("n_tok")).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    val spans = local.join(broadcast(offsets), Seq("pid"))
      .withColumn("off", col("loff") + col("offset"))
      .withColumn("e_end", col("off") + col("n_tok") - 1)
    val perExample = spans
      .select(col("off"), col("e_end"),
        explode(expr(s"sequence(off div $BlockLen, e_end div $BlockLen)"))
          .as("example_id"))
      .withColumn("tok", expr(
        s"least(e_end, (example_id + 1) * $BlockLen - 1)" +
          s" - greatest(off, example_id * $BlockLen) + 1"))
      .groupBy(col("example_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
    perExample.groupBy(col("n_docs").as("docs_per_example"))
      .agg(count(lit(1)).as("n_examples"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
  }

  val q170Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(${wsTokensNonEmptySql("text")}) + 1 AS BIGINT) AS n_tok
       |  FROM documents),
       |o AS (
       |  SELECT *, coalesce(sum(n_tok) OVER (ORDER BY source, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM t),
       |spans AS (
       |  SELECT CAST(off AS BIGINT) AS off,
       |    CAST(off + n_tok - 1 AS BIGINT) AS e_end
       |  FROM o),
       |ex AS (
       |  SELECT u.e AS example_id,
       |    least(e_end, (u.e + 1) * $BlockLen - 1)
       |      - greatest(off, u.e * $BlockLen) + 1 AS tok
       |  FROM spans, unnest(range(off // $BlockLen, e_end // $BlockLen + 1))
       |    AS u(e)),
       |agg AS (
       |  SELECT example_id, count(*) AS n_docs, sum(tok) AS n_tokens
       |  FROM ex GROUP BY example_id)
       |SELECT ${bi("n_docs")} AS docs_per_example,
       |  ${bi("count(*)")} AS n_examples,
       |  ${bi("min(n_tokens)")} AS min_tokens,
       |  ${bi("max(n_tokens)")} AS max_tokens
       |FROM agg GROUP BY n_docs""".stripMargin

  // ----------------------------------------------------------------

  // ---------------------------------------------------------------- q187

  /** q187 PII patterns (replace-all on both engines): plain character
    * classes + bounded repetition only, the regex subset where Java's
    * engine (Spark) and RE2 (DuckDB) agree exactly.
    */
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** q187 — PII redaction screen (the C4/Dolma-style scrub pass every
    * released corpus runs): regex-detect emails and phone numbers,
    * replace ALL occurrences with typed placeholder tokens, and audit
    * per language how many instances were removed and how much
    * character mass the scrub cost. The synthetic corpus carries no
    * PII, so both engines PLANT it deterministically first (every
    * 3rd doc gets two emails, the next a phone number, the rest stay
    * clean) — the planted shapes exercise replace-all, multi-match
    * counting, and the untouched-document path on one oracle hash.
    *
    * Scale shape: pure rowwise regex work inside the scan stage plus
    * one hash aggregate on lang — no joins, no window, codegen
    * end-to-end. At 100 TB this is the cheapest kind of full-corpus
    * pass there is.
    */
  def q187PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val aug0 = Tables.load(spark, dir, "documents").withColumn("aug",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or ping ops@corp.example.org")))
        .when(col("doc_id") % 3 === 1,
          concat(col("text"), lit(" call +1-202-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" today")))
        .otherwise(col("text")))
    val red = aug0
      .withColumn("emails", regexp_count(col("aug"), lit(EmailPat)))
      .withColumn("phones", regexp_count(col("aug"), lit(PhonePat)))
      .withColumn("red", regexp_replace(
        regexp_replace(col("aug"), EmailPat, "<EMAIL>"),
        PhonePat, "<PHONE>"))
    red.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("emails").cast("long")).as("emails"),
      sum(col("phones").cast("long")).as("phones"),
      sum(when(col("red") === col("aug"), 1L).otherwise(0L)).as("clean_docs"),
      sum((length(col("aug")) - length(col("red"))).cast("long"))
        .as("chars_removed"))
  }

  val q187Oracle: String =
    s"""WITH aug AS (
       |  SELECT lang,
       |    CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' ||
       |           CAST(doc_id AS VARCHAR) ||
       |           '@mail.example.com or ping ops@corp.example.org'
       |         WHEN doc_id % 3 = 1 THEN text || ' call +1-202-555-' ||
       |           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
       |         ELSE text END AS aug
       |  FROM documents),
       |red AS (
       |  SELECT lang, aug,
       |    len(regexp_extract_all(aug, '$EmailPat')) AS emails,
       |    len(regexp_extract_all(aug, '$PhonePat')) AS phones,
       |    regexp_replace(regexp_replace(aug, '$EmailPat', '<EMAIL>', 'g'),
       |      '$PhonePat', '<PHONE>', 'g') AS red
       |  FROM aug)
       |SELECT lang, ${bi("count(*)")} AS n_docs,
       |  ${bi("sum(emails)")} AS emails,
       |  ${bi("sum(phones)")} AS phones,
       |  ${bi("sum(CASE WHEN red = aug THEN 1 ELSE 0 END)")} AS clean_docs,
       |  ${bi("sum(len(aug) - len(red))")} AS chars_removed
       |FROM red GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------- q188

  /** q188 hashed-feature space and integer weight scale. */
  private val DsirBuckets = 1024
  private val DsirScale = 1000000L

  /** q188 — DSIR importance weighting (Xie et al., NeurIPS 2023 "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much its hashed-bigram profile looks like a
    * TARGET distribution (here: the English slice standing in for the
    * curated seed corpus) relative to the RAW crawl distribution.
    * Per-bucket weight is the add-one-smoothed probability ratio
    * `S · p_target(b) / p_raw(b)` with `p(b) = (count[b]+1) /
    * (total+B)`, computed as one fused integer multiply-divide; a
    * document's score is the sum over its bigram occurrences, and
    * docs scoring above ratio 1 (`S` per bigram) are the ones
    * importance resampling would upweight. Reported per source:
    * docs, bigram mass, total weight, upweighted count.
    *
    * Scale shape: bigram explode is corpus-linear (no materialized
    * n-gram table — `transform` over the token array inside the
    * scan); the feature space is CAPPED at [[DsirBuckets]] buckets, so
    * the weight table is a broadcast — the corpus-sized side shuffles
    * once for the per-doc aggregate and once for the source rollup.
    * Integer math throughout ([[OracleIdioms]] class 2: positive
    * operands, so `div`/`//` agree).
    */
  def q188DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        wsTokensNonEmpty(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = toks.select(col("doc_id"), col("source"), col("lang"),
        explode(expr(
          "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
          .as("bg"))
      // portable hash is non-negative, so plain % is already the
      // canonical residue on both engines
      .withColumn("b", expr(s"portable_string_hash(bg) % $DsirBuckets"))
    val counts = bigrams.groupBy(col("b")).agg(
      count(lit(1)).as("r"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
    // the importance ratio needs the PROBABILITY estimates, not raw
    // counts (target is a subset of raw, so tc/r alone is always < 1):
    // p_t(b) = (tc+1)/(tt+B), p_r(b) = (r+1)/(rt+B) — add-one
    // smoothed — and w = S · p_t/p_r, an exact integer via one fused
    // multiply-divide. rt/tt are a 1-row scalar broadcast.
    val totals = counts.agg(sum(col("r")).as("rt"), sum(col("tc")).as("tt"))
    // exact integer math in DECIMAL(38,0): the numerator is
    // (tc+1)·(rt+B)·S ≈ tt·rt·10^6, which exceeds Long around 10^13
    // corpus bigrams (≈ sf1 of all-English text — ANSI Spark would
    // throw, non-ANSI would wrap while DuckDB promotes, r09 ADVICE).
    // 38 digits hold products up to ~10^38, i.e. ~10^15 bigrams
    // (petabytes of text); `div` on decimals is exact integral
    // division on both engines, so the hash is magnitude-independent.
    val perDoc = bigrams.join(broadcast(counts), Seq("b"))
      .crossJoin(broadcast(totals))
      .withColumn("w", expr(
        s"CAST((CAST(tc + 1 AS DECIMAL(38,0)) * (rt + $DsirBuckets) * $DsirScale) div " +
          s"(CAST(r + 1 AS DECIMAL(38,0)) * (tt + $DsirBuckets)) AS BIGINT)"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bg"), sum(col("w")).as("w_sum"))
    perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_bg")).as("bigrams"),
      sum(col("w_sum")).as("w_total"),
      // doc's mean importance ratio above 1 (= S per occurrence)
      sum(when(col("w_sum") > col("n_bg") * DsirScale, 1L).otherwise(0L))
        .as("n_upweighted"))
  }

  val q188Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, lang, ${wsTokensNonEmptySql("text")} AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, source, lang, t[gi] || ' ' || t[gi + 1] AS bg
       |  FROM toks, UNNEST(range(1, len(t))) AS u(gi)),
       |bgb AS (
       |  SELECT doc_id, source, lang,
       |    (${hSql("bg")}) % $DsirBuckets AS b
       |  FROM bg),
       |counts AS (
       |  SELECT b, count(*) AS r,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
       |  FROM bgb GROUP BY b),
       |totals AS (
       |  SELECT sum(r) AS rt, sum(tc) AS tt FROM counts),
       |scored AS (
       |  SELECT g.doc_id, g.source,
       |    CAST(((c.tc + 1)::HUGEINT * (t.rt + $DsirBuckets) * $DsirScale) //
       |      ((c.r + 1)::HUGEINT * (t.tt + $DsirBuckets)) AS BIGINT) AS w
       |  FROM bgb g JOIN counts c USING (b), totals t),
       |perdoc AS (
       |  SELECT doc_id, source, count(*) AS n_bg, sum(w) AS w_sum
       |  FROM scored GROUP BY doc_id, source)
       |SELECT source, ${bi("count(*)")} AS n_docs,
       |  ${bi("sum(n_bg)")} AS bigrams,
       |  ${bi("sum(w_sum)")} AS w_total,
       |  ${bi(s"sum(CASE WHEN w_sum > n_bg * $DsirScale THEN 1 ELSE 0 END)")}
       |    AS n_upweighted
       |FROM perdoc GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- q189

  /** q189 volume threshold: mild-term occurrences at or above this
    * drop the document.
    */
  private val MildCap = 8

  /** q189 — blocklist screening (the C4 "bad words" filter, Raffel et
    * al. JMLR 2020 §2.2, as a policy with severity tiers): documents
    * containing ANY severe term are dropped outright; documents with
    * at least [[MildCap]] mild-term occurrences are dropped for
    * volume; the rest keep. Occurrences count as a multiset (every
    * token hit, not distinct terms) — the shape that lets the same
    * join power both the any-hit and the frequency policy. Reported
    * per (lang, verdict) with the hit masses that justified it.
    *
    * Scale shape: token explode joined against a BROADCAST blocklist
    * (blocklists are thousands of terms, never corpus-sized), one
    * per-doc aggregate, one left join back to keep zero-hit docs, one
    * rollup. No all-pairs anything.
    */
  def q189Blocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bl = Seq(("spark", 1), ("slow", 0), ("hash", 0), ("fast", 0),
      ("value", 0)).toDF("term", "severe")
    val docs = Tables.load(spark, dir, "documents")
    val hits = docs.select(col("doc_id"),
        explode(wsTokensNonEmpty(col("text"))).as("tok"))
      .join(broadcast(bl), col("tok") === col("term"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("severe") === 1, 1L).otherwise(0L)).as("severe_hits"),
        sum(when(col("severe") === 0, 1L).otherwise(0L)).as("mild_hits"))
    docs.join(hits, Seq("doc_id"), "left")
      .withColumn("sh", coalesce(col("severe_hits"), lit(0L)))
      .withColumn("mh", coalesce(col("mild_hits"), lit(0L)))
      .withColumn("verdict",
        when(col("sh") > 0, "drop_severe")
          .when(col("mh") >= MildCap, "drop_volume")
          .otherwise("keep"))
      .groupBy(col("lang"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("sh")).as("severe_hits"),
        sum(col("mh")).as("mild_hits"))
  }

  val q189Oracle: String =
    s"""WITH tk AS (
       |  SELECT doc_id, unnest(${wsTokensNonEmptySql("text")}) AS tok
       |  FROM documents),
       |bl AS (
       |  SELECT * FROM (VALUES ('spark', 1), ('slow', 0), ('hash', 0),
       |    ('fast', 0), ('value', 0)) AS t(term, severe)),
       |h AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN severe = 1 THEN 1 ELSE 0 END) AS severe_hits,
       |    sum(CASE WHEN severe = 0 THEN 1 ELSE 0 END) AS mild_hits
       |  FROM tk JOIN bl ON tk.tok = bl.term
       |  GROUP BY doc_id),
       |v AS (
       |  SELECT d.lang,
       |    COALESCE(h.severe_hits, 0) AS sh,
       |    COALESCE(h.mild_hits, 0) AS mh,
       |    CASE WHEN COALESCE(h.severe_hits, 0) > 0 THEN 'drop_severe'
       |         WHEN COALESCE(h.mild_hits, 0) >= $MildCap THEN 'drop_volume'
       |         ELSE 'keep' END AS verdict
       |  FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id)
       |SELECT lang, verdict, ${bi("count(*)")} AS n_docs,
       |  ${bi("sum(sh)")} AS severe_hits,
       |  ${bi("sum(mh)")} AS mild_hits
       |FROM v GROUP BY lang, verdict""".stripMargin

  // ---------------------------------------------------------------- q190

  /** q190 per-domain document cap. */
  private val DomainCap = 10

  /** q190 — per-domain quota sampling (the RefinedWeb/C4 crawl-balance
    * rule: no single domain may dominate the corpus): within each
    * source, rank documents by token mass (doc_id tiebreak) and keep
    * only the top [[DomainCap]]. Reports per source the kept/total
    * split, the retained token mass, and the admission cutoff — the
    * table a crawl operator reads to see what the cap cost each
    * domain.
    *
    * Engine path: the keep set is the `row_number().over(...)
    * .filter(rn <= k)` idiom, which [[graft.plans.WindowTopKRewrite]]
    * rewrites into the bounded-heap TopKPerGroup operator — this query
    * keeps that rewrite exercised (and oracle-checked) on the driver
    * path, not just in its spec. Scale shape: two hash aggregates and
    * a per-group bounded heap; no global sort, no data-sized window.
    */
  def q190DomainQuota(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        wsTokenCount(col("text")).cast("long").as("tok"))
    val kept = d
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("tok").desc, col("doc_id"))))
      .filter(col("rn") <= DomainCap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("kept_mass"),
        min(col("tok")).as("cutoff_tok"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"), sum(col("tok")).as("total_mass"))
      .join(kept, Seq("source"))
  }

  val q190Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(${wsTokensNonEmptySql("text")}) AS BIGINT) AS tok
       |  FROM documents),
       |r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY source ORDER BY tok DESC, doc_id) AS rn
       |  FROM d)
       |SELECT source, ${bi("count(*)")} AS n_total,
       |  ${bi("sum(tok)")} AS total_mass,
       |  ${bi(s"sum(CASE WHEN rn <= $DomainCap THEN 1 ELSE 0 END)")} AS n_kept,
       |  ${bi(s"sum(CASE WHEN rn <= $DomainCap THEN tok ELSE 0 END)")}
       |    AS kept_mass,
       |  ${bi(s"min(CASE WHEN rn <= $DomainCap THEN tok END)")} AS cutoff_tok
       |FROM r GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- q191

  /** q191 repetition thresholds, in ppm of a document's bigram mass —
    * set at the synthetic corpus's ~p95 so the gate actually
    * discriminates here (Gopher's absolute 0.18/0.40 values target
    * natural web text; a real deployment tunes gates against the
    * observed distribution exactly like this).
    */
  private val TopBigramPpm = 90000L
  private val DupMassPpm = 85000L

  /** q191 — within-document repetition screen (the Gopher repetition
    * rules, Rae et al. 2021 §A1.1: drop documents whose text is
    * dominated by repeated n-grams — boilerplate listings, keyword
    * stuffing, template spam). Two integer-ppm signals per document
    * over its bigram multiset: the share of the single most frequent
    * bigram, and the share of all repeated occurrences (occurrences
    * beyond each bigram's first). A document fails on either
    * threshold; reported per language with the signal masses.
    *
    * Scale shape: bigram explode (corpus-linear, inside the scan
    * stage), one (doc, bigram) count aggregate, one per-doc rollup,
    * one language rollup — shuffles carry counts, never text.
    */
  def q191Repetition(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), wsTokensNonEmpty(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(expr(
          "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
          .as("bg"))
    val perDoc = bigrams.groupBy(col("doc_id"), col("lang"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("m"), max(col("c")).as("top"),
        sum(col("c") - 1).as("dup"))
      .withColumn("top_ppm", expr("(top * 1000000L) div m"))
      .withColumn("dup_ppm", expr("(dup * 1000000L) div m"))
      .withColumn("fail",
        (col("top_ppm") > TopBigramPpm || col("dup_ppm") > DupMassPpm)
          .cast("int"))
    perDoc.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("fail")).as("n_dropped"),
      sum(col("top_ppm")).as("top_ppm_sum"),
      sum(col("dup_ppm")).as("dup_ppm_sum"))
  }

  val q191Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, ${wsTokensNonEmptySql("text")} AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, lang, t[gi] || ' ' || t[gi + 1] AS bg
       |  FROM toks, UNNEST(range(1, len(t))) AS u(gi)),
       |cnt AS (
       |  SELECT doc_id, lang, bg, count(*) AS c
       |  FROM bg GROUP BY doc_id, lang, bg),
       |perdoc AS (
       |  SELECT doc_id, lang, sum(c) AS m, max(c) AS top,
       |    sum(c - 1) AS dup
       |  FROM cnt GROUP BY doc_id, lang),
       |ppm AS (
       |  SELECT lang,
       |    (top * 1000000) // m AS top_ppm,
       |    (dup * 1000000) // m AS dup_ppm
       |  FROM perdoc)
       |SELECT lang, ${bi("count(*)")} AS n_docs,
       |  ${bi(s"sum(CASE WHEN top_ppm > $TopBigramPpm OR " +
      s"dup_ppm > $DupMassPpm THEN 1 ELSE 0 END)")} AS n_dropped,
       |  ${bi("sum(top_ppm)")} AS top_ppm_sum,
       |  ${bi("sum(dup_ppm)")} AS dup_ppm_sum
       |FROM ppm GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------- q193

  /** q193 vocabulary admission threshold (train-split occurrences) and
    * the interleaved split stride (both halves must contain every
    * source, or per-source attribution degenerates — doc ids cycle
    * through sources, so parity-style splits silently partition BY
    * source).
    */
  private val VocabMinCount = 10L
  private val SplitStride = 20L

  /** q193 — tokenizer merge-coverage / OOV-rate screen: build the
    * BIGRAM vocabulary from the train half (every pair with at least
    * [[VocabMinCount]] occurrences — a frequency threshold is
    * deterministic where a top-K cut would tie-break), then measure
    * each source's out-of-vocabulary pair rate on the held-out half.
    * Pairs, not unigrams, are the unit a BPE tokenizer's merges
    * actually cover — a high OOV-pair source fragments into short
    * merges and inflates its token bill, the signal that a tokenizer
    * retrain is due before the next corpus revision ships.
    *
    * Scale shape: two bigram explodes (train census, probe), one
    * count aggregate for the vocabulary, one pair-keyed shuffle join
    * of probe pairs against it (a merge table can be millions of
    * entries — no broadcast assumption), one source rollup. Integer
    * ppm throughout.
    */
  def q193OovRate(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), wsTokensNonEmpty(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(expr(
          "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
          .as("bg"))
      .withColumn("half", expr(s"(doc_id div $SplitStride) % 2"))
    val vocab = bigrams.filter(col("half") === 0).groupBy(col("bg"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= VocabMinCount)
      .select(col("bg"), lit(1).as("in_vocab"))
    bigrams.filter(col("half") === 1).join(vocab, Seq("bg"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("(n_oov * 1000000L) div n_pairs"))
  }

  val q193Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, ${wsTokensNonEmptySql("text")} AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, source, t[gi] || ' ' || t[gi + 1] AS bg,
       |    (doc_id // $SplitStride) % 2 AS half
       |  FROM toks, UNNEST(range(1, len(t))) AS u(gi)),
       |vocab AS (
       |  SELECT bg FROM bg WHERE half = 0
       |  GROUP BY bg HAVING count(*) >= $VocabMinCount),
       |j AS (
       |  SELECT p.source,
       |    CASE WHEN v.bg IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM bg p LEFT JOIN vocab v ON p.bg = v.bg
       |  WHERE p.half = 1),
       |agg AS (
       |  SELECT source, count(*) AS n_pairs, sum(oov) AS n_oov
       |  FROM j GROUP BY source)
       |SELECT source, ${bi("n_pairs")} AS n_pairs, ${bi("n_oov")} AS n_oov,
       |  ${bi("(n_oov * 1000000) // n_pairs")} AS oov_ppm
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------- q194

  /** q194 candidate sequence lengths (tokens per padded batch row),
    * spanning the corpus's 10-99-token document range so every bucket
    * is populated AND the truncation path is live (docs above the
    * largest length lose tokens — the real trade the table surfaces).
    */
  private val PadBuckets = Seq(16L, 32L, 64L, 80L)

  /** q194 — length-bucketed padding-waste audit (the dynamic-batching
    * design table): assign every document to the smallest candidate
    * sequence length that holds it (longer documents truncate to the
    * largest), then report per bucket the document count, kept token
    * mass, padding mass, and padding share in ppm. This is the table
    * that picks the bucket boundaries for batched training or
    * inference — padding share IS the wasted accelerator time.
    *
    * Scale shape: pure rowwise CASE arithmetic inside the scan plus
    * one 4-group aggregate. Nothing shuffles but the counters.
    */
  def q194PaddingAudit(spark: SparkSession, dir: String): DataFrame = {
    val last = PadBuckets.last
    val bucket = PadBuckets.init.foldRight(lit(last)) { (b, rest) =>
      when(col("tok") <= b, lit(b)).otherwise(rest)
    }
    Tables.load(spark, dir, "documents")
      .select(wsTokenCount(col("text")).cast("long").as("tok"))
      .withColumn("bucket", bucket)
      .withColumn("kept", least(col("tok"), lit(last)))
      .withColumn("pad", col("bucket") - col("kept"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("kept_tokens"),
        sum(col("pad")).as("pad_tokens"))
      .withColumn("pad_ppm",
        expr("(pad_tokens * 1000000L) div (pad_tokens + kept_tokens)"))
  }

  val q194Oracle: String = {
    val last = PadBuckets.last
    val caseSql = PadBuckets.init
      .map(b => s"WHEN tok <= $b THEN $b").mkString(" ")
    s"""WITH d AS (
       |  SELECT CAST(len(${wsTokensNonEmptySql("text")}) AS BIGINT) AS tok
       |  FROM documents),
       |b AS (
       |  SELECT CASE $caseSql ELSE $last END AS bucket,
       |    least(tok, $last) AS kept
       |  FROM d),
       |agg AS (
       |  SELECT bucket, count(*) AS n_docs, sum(kept) AS kept_tokens,
       |    sum(bucket - kept) AS pad_tokens
       |  FROM b GROUP BY bucket)
       |SELECT bucket, ${bi("n_docs")} AS n_docs,
       |  ${bi("kept_tokens")} AS kept_tokens,
       |  ${bi("pad_tokens")} AS pad_tokens,
       |  ${bi("(pad_tokens * 1000000) // (pad_tokens + kept_tokens)")}
       |    AS pad_ppm
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- q195

  /** q195 funnel constants: prefix-fingerprint width (tokens), the
    * repetition thresholds (q191's), the blocklist policy (q189's
    * shape with 'dup' as the severe term — rare enough that the
    * funnel's later stages stay populated), and the per-source cap
    * (q190's).
    */
  private val FunnelPrefix = 8
  private val FunnelMildCap = 8

  /** q195 — the composed curation funnel: the screens of this tier
    * chained the way a release pipeline actually runs them, with one
    * survivor-count/token-mass row PER STAGE — the attrition table
    * every corpus datasheet leads with. Stages: ingest → keep-first
    * prefix-fingerprint dedup (sorted-neighborhood's blocking key as
    * an exact screen) → within-doc repetition gate (q191 thresholds)
    * → severity blocklist (severe term drops outright, mild volume at
    * [[FunnelMildCap]]) → per-source quota cap (q190). Each stage
    * consumes the previous stage's SURVIVORS, so the oracle checks
    * the composition, not just each screen in isolation.
    *
    * Scale shape: every stage is a aggregate/semi-join over the
    * shrinking survivor set — dedup is a keep-first aggregate, the
    * gates are per-doc aggregates joined back left-semi, the quota is
    * the TopKPerGroup bounded heap. No stage materializes pairs.
    */
  def q195CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Single-pass shape (r17): the stages are MONOTONE filters
    // (s5 ⊆ s4 ⊆ s3 ⊆ s2 ⊆ d), so per-doc pass FLAGS + flag-gated
    // sums produce the identical attrition table in ONE evaluation of
    // the chain — the previous five-branch union re-ran tokenization
    // and every upstream screen once per stage (1+2+3+4+5 waves).
    // The token frame and the doc-level flag frame are each
    // materialized once inside the query (no cross-run state).
    val keyed = graft.runtime.Materialize.once(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          wsTokensNonEmpty(col("text")).as("t"))
        .withColumn("tok", size(col("t")).cast("long"))
        .withColumn("pfx",
          expr(s"array_join(slice(t, 1, $FunnelPrefix), ' ')")))
    val reps = keyed.groupBy(col("pfx"))
      .agg(min(col("doc_id")).as("doc_id"))
      .withColumn("__p2", lit(true))
    val flagged2 = keyed.join(reps, Seq("pfx", "doc_id"), "left")
      .withColumn("p2", col("__p2").isNotNull)
    // repetition gate: bigram stats only exist for stage-2 survivors
    // with >= 2 tokens — exactly the docs the old semi-join admitted
    val repPass = flagged2.filter(col("p2") && size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("m"), max(col("c")).as("top"),
        sum(col("c") - 1).as("dup"))
      .filter(expr(s"(top * 1000000L) div m <= $TopBigramPpm") &&
        expr(s"(dup * 1000000L) div m <= $DupMassPpm"))
      .select(col("doc_id")).withColumn("__p3", lit(true))
    val bl = Seq(("dup", 1), ("slow", 0), ("hash", 0), ("fast", 0),
      ("value", 0)).toDF("term", "severe")
    val flagged3 = flagged2.join(repPass, Seq("doc_id"), "left")
      .withColumn("p3", col("p2") && col("__p3").isNotNull)
    val hits = flagged3.filter(col("p3"))
      .select(col("doc_id"), explode(col("t")).as("tok_w"))
      .join(broadcast(bl), col("tok_w") === col("term"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("severe") === 1, 1L).otherwise(0L)).as("sh"),
        sum(when(col("severe") === 0, 1L).otherwise(0L)).as("mh"))
    // doc-level flag frame: tiny (id, source, tok, three booleans) —
    // materialized so the stage-1..4 aggregate and the stage-5 quota
    // branch share one computation of the joins above
    val flags = graft.runtime.Materialize.once(
      flagged3.join(hits, Seq("doc_id"), "left")
        .withColumn("p4", col("p3") &&
          coalesce(col("sh"), lit(0L)) === 0 &&
          coalesce(col("mh"), lit(0L)) < FunnelMildCap)
        .select(col("doc_id"), col("source"), col("tok"),
          col("p2"), col("p3"), col("p4")))
    // per-source quota over stage-4 survivors: same row_number shape
    // as before (the TopKPerGroup rewrite still applies)
    val s5 = flags.filter(col("p4"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("tok").desc, col("doc_id"))))
      .filter(col("rn") <= DomainCap)
    def gated(flag: Column): Seq[Column] = Seq(
      sum(when(flag, 1L).otherwise(0L)),
      sum(when(flag, col("tok"))))
    val a = flags.agg(
      count(lit(1)).as("n1"), sum(col("tok")).as("m1"),
      gated(col("p2"))(0).as("n2"), gated(col("p2"))(1).as("m2"),
      gated(col("p3"))(0).as("n3"), gated(col("p3"))(1).as("m3"),
      gated(col("p4"))(0).as("n4"), gated(col("p4"))(1).as("m4"))
    val stages14 = a.select(expr(
      "stack(4, 1, 'ingested', n1, m1, 2, 'prefix_dedup', n2, m2, " +
        "3, 'repetition', n3, m3, 4, 'blocklist', n4, m4) " +
        "AS (stage_ord, stage, n_docs, token_mass)"))
    val stage5 = s5.agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("token_mass"))
      .select(lit(5).as("stage_ord"), lit("domain_quota").as("stage"),
        col("n_docs"), col("token_mass"))
    stages14.unionByName(stage5)
  }

  val q195Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, ${wsTokensNonEmptySql("text")} AS t,
       |    CAST(len(${wsTokensNonEmptySql("text")}) AS BIGINT) AS tok
       |  FROM documents),
       |k AS (
       |  SELECT *, array_to_string(t[1:$FunnelPrefix], ' ') AS pfx FROM d),
       |s2 AS (
       |  SELECT * FROM k
       |  WHERE doc_id IN (SELECT min(doc_id) FROM k GROUP BY pfx)),
       |bgc AS (
       |  SELECT doc_id, bg, count(*) AS c FROM (
       |    SELECT s2.doc_id, t[gi] || ' ' || t[gi + 1] AS bg
       |    FROM s2, UNNEST(range(1, len(t))) AS u(gi))
       |  GROUP BY doc_id, bg),
       |pd AS (
       |  SELECT doc_id, sum(c) AS m, max(c) AS top, sum(c - 1) AS dup
       |  FROM bgc GROUP BY doc_id),
       |s3 AS (
       |  SELECT s2.* FROM s2 JOIN pd USING (doc_id)
       |  WHERE (pd.top * 1000000) // pd.m <= $TopBigramPpm
       |    AND (pd.dup * 1000000) // pd.m <= $DupMassPpm),
       |bl AS (
       |  SELECT * FROM (VALUES ('dup', 1), ('slow', 0), ('hash', 0),
       |    ('fast', 0), ('value', 0)) AS v(term, severe)),
       |hits AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN severe = 1 THEN 1 ELSE 0 END) AS sh,
       |    sum(CASE WHEN severe = 0 THEN 1 ELSE 0 END) AS mh
       |  FROM (SELECT s3.doc_id, unnest(t) AS tok_w FROM s3) tk
       |  JOIN bl ON tk.tok_w = bl.term
       |  GROUP BY doc_id),
       |s4 AS (
       |  SELECT s3.* FROM s3 LEFT JOIN hits USING (doc_id)
       |  WHERE COALESCE(hits.sh, 0) = 0
       |    AND COALESCE(hits.mh, 0) < $FunnelMildCap),
       |s5 AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY source ORDER BY tok DESC, doc_id) AS rn
       |    FROM s4)
       |  WHERE rn <= $DomainCap)
       |SELECT 1 AS stage_ord, 'ingested' AS stage,
       |  ${bi("count(*)")} AS n_docs, ${bi("sum(tok)")} AS token_mass FROM d
       |UNION ALL SELECT 2, 'prefix_dedup', ${bi("count(*)")},
       |  ${bi("sum(tok)")} FROM s2
       |UNION ALL SELECT 3, 'repetition', ${bi("count(*)")},
       |  ${bi("sum(tok)")} FROM s3
       |UNION ALL SELECT 4, 'blocklist', ${bi("count(*)")},
       |  ${bi("sum(tok)")} FROM s4
       |UNION ALL SELECT 5, 'domain_quota', ${bi("count(*)")},
       |  ${bi("sum(tok)")} FROM s5""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_epoch_shuffle" -> (q162EpochShuffle _),
    "q163_segment_dedup" -> (q163SegmentDedup _),
    "q164_bootstrap_ci" -> (q164BootstrapCi _),
    "q165_rrf_fusion" -> (q165RrfFusion _),
    "q167_l_diversity" -> (q167LDiversity _),
    "q168_temperature_mix" -> (q168TemperatureMix _),
    "q169_dp_counts" -> (q169DpCounts _),
    "q170_example_pack" -> (q170ExamplePack _),
    "q171_rank_eval" -> (q171RankEval _),
    "q187_pii_redact" -> (q187PiiRedact _),
    "q188_dsir_weights" -> (q188DsirWeights _),
    "q189_blocklist" -> (q189Blocklist _),
    "q190_domain_quota" -> (q190DomainQuota _),
    "q191_repetition" -> (q191Repetition _),
    "q193_oov_rate" -> (q193OovRate _),
    "q194_padding_audit" -> (q194PaddingAudit _),
    "q195_curation_funnel" -> (q195CurationFunnel _))

  val oracles: Map[String, String] = Map(
    "q162_epoch_shuffle" -> q162Oracle,
    "q163_segment_dedup" -> q163Oracle,
    "q164_bootstrap_ci" -> q164Oracle,
    "q165_rrf_fusion" -> q165Oracle,
    "q167_l_diversity" -> q167Oracle,
    "q168_temperature_mix" -> q168Oracle,
    "q169_dp_counts" -> q169Oracle,
    "q170_example_pack" -> q170Oracle,
    "q171_rank_eval" -> q171Oracle,
    "q187_pii_redact" -> q187Oracle,
    "q188_dsir_weights" -> q188Oracle,
    "q189_blocklist" -> q189Oracle,
    "q190_domain_quota" -> q190Oracle,
    "q191_repetition" -> q191Oracle,
    "q193_oov_rate" -> q193Oracle,
    "q194_padding_audit" -> q194Oracle,
    "q195_curation_funnel" -> q195Oracle)
}
