package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.runtime.Tables

/** Extension tier — deduplication over the `documents` table.
  *
  * q20 exact keep-first (oracle-checked), q21 MinHash+LSH candidate
  * pipeline (portable hash family → the whole sketch/band/verify chain
  * is oracle-checked), q22 char-3-gram Jaccard verification with a
  * DuckDB list-function oracle, q23 SimHash + banded hamming pairs
  * (portable fingerprints → oracle checks them against brute-force
  * hamming, proving the banding complete for d ≤ 3).
  */
object DedupQueries {

  /** Exact dedup, keep-first: block on the first-2-token prefix key,
    * survivor = lowest doc_id, with group size (A2/J3 family semantics:
    * one row per key, deterministic winner).
    */
  def q20ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .withColumn("prefix_key", TextAnalysis.prefixKey(col("text")))
    val grouped = d.withColumn("group_size",
      count(lit(1)).over(Window.partitionBy(col("prefix_key"))))
    Dedup.keepFirst(grouped, col("prefix_key"), col("doc_id"))
      .select(col("prefix_key"), col("doc_id"), col("group_size"))
  }

  val q20Oracle: String =
    s"""WITH keyed AS (
      |  SELECT doc_id,
      |    ${TextAnalysis.prefixKeySql}
      |      AS prefix_key
      |  FROM documents),
      |ranked AS (
      |  SELECT prefix_key, doc_id,
      |    row_number() OVER (PARTITION BY prefix_key ORDER BY doc_id) AS rn,
      |    count(*) OVER (PARTITION BY prefix_key) AS group_size
      |  FROM keyed)
      |SELECT prefix_key, doc_id, group_size FROM ranked WHERE rn = 1""".stripMargin

  /** MinHash+LSH near-dup pipeline: word-3-shingles → 32-slot MinHash
    * signature → 8 bands × 4 rows → same-bucket candidate pairs →
    * Jaccard-verified on the true shingle sets. No all-pairs product:
    * candidate generation shuffles on the band hash only.
    *
    * (b=8, r=4) puts the S-curve threshold at (1/b)^(1/r) ≈ 0.59 — the
    * near-dup regime. Looser bands (e.g. 2 rows) collide quadratically
    * on corpora with shared vocabulary and defeat the point of LSH.
    *
    * Band keys use the SQL-portable hash family (PortableHash slots +
    * Horner band fold), so the ENTIRE pipeline — sketch, banding,
    * candidate join, Jaccard verify — is replayed by the DuckDB oracle
    * and hash-match checked, not just row-counted. The xxhash form
    * ([[Dedup.minHashBandKeys]]) remains the production default.
    */
  def q21MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // repartition: the testdata is one small parquet file (one input
    // split); spread the per-document sketch work across all cores, as
    // a many-file 100 TB corpus would be naturally.
    // one sketch pass total: the candidate self-join references the
    // banded frame from two branches and the verify joins reference the
    // shingle sets twice more — without materialization the shingle
    // build + 32-slot signature would run up to four times. Note the
    // materialized frame is tokenized-corpus-sized (it carries the
    // shingle sets the verify stage needs): one corpus-sized write
    // bought four sketch passes. On a storage-bound cluster, checkpoint
    // only (doc_id, bands) — 64 B/doc — and accept recomputing shingles
    // in the verify joins.
    val sketched = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.sortedShingles(col("toks"), 3).as("shingles"))
      .withColumn("bands", Dedup.portableMinHashBandKeys(col("shingles"), 32, 8))
      .transform(graft.runtime.Materialize.once)
    val pairs = Dedup.lshCandidatePairs(
      sketched.select(col("doc_id"), col("bands")), "doc_id")
    val sets = sketched.select(col("doc_id"), col("shingles"))
    pairs
      .join(sets.withColumnRenamed("doc_id", "id1")
                .withColumnRenamed("shingles", "sh1"), Seq("id1"))
      .join(sets.withColumnRenamed("doc_id", "id2")
                .withColumnRenamed("shingles", "sh2"), Seq("id2"))
      .select(col("id1"), col("id2"),
        Dedup.sortedJaccard(col("sh1"), col("sh2")).as("shingle_jaccard"))
      .filter(col("shingle_jaccard") >= 0.5)
  }

  /** The full q21 LSH pipeline replayed in DuckDB: same shingles, same
    * PortableHash slot family, same Horner band fold, same candidate
    * join, same Jaccard verify. The empty-shingle CASE guards DuckDB's
    * list_reduce (errors on an empty list) for whitespace-only docs,
    * matching PortableHash.hash("") = 0.
    */
  /** Shared CTE chain of the q21 LSH replay (shingles → portable hash
    * → 32 slots → 8 band keys → candidate pairs → Jaccard verify),
    * reused by q21's final SELECT and by q134's estimator-calibration
    * joins (which read the `slots` and `sh` CTEs directly — the
    * single-definition rule for the hash math).
    */
  private val lshOracleCtes: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, greatest(len(t)-2, 1)+1),
       |      i -> array_to_string(list_slice(t, i, i+2), ' '))) AS shingles
       |  FROM toks),
       |hs AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh),
       |h AS (
       |  SELECT doc_id,
       |    CASE WHEN length(s) = 0 THEN 0 ELSE
       |      list_reduce(list_transform(range(1, length(s)+1), i -> ascii(s[i])::BIGINT),
       |                  (a, b) -> (a * $Base + b) % $Mod) END AS hv
       |  FROM hs),
       |slots AS (
       |  SELECT doc_id, j,
       |    min(((hv + j * $Shift) % $Mod) * ((hv + j * $Shift) % $Mod) % $Mod) AS mn
       |  FROM h, range(0, 32) t(j)
       |  GROUP BY doc_id, j),
       |bands AS (
       |  SELECT doc_id, j // 4 AS band_idx,
       |    list_reduce(list(mn ORDER BY j), (a, b) -> (a * $Base + b) % $Mod) AS band_key
       |  FROM slots GROUP BY doc_id, j // 4),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |       AND a.doc_id < b.doc_id),
       |verified AS (
       |  SELECT c.id1, c.id2,
       |    CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
       |      / len(list_distinct(list_concat(x.shingles, y.shingles))) AS shingle_jaccard
       |  FROM cand c
       |  JOIN sh x ON x.doc_id = c.id1
       |  JOIN sh y ON y.doc_id = c.id2)""".stripMargin
  }

  val q21Oracle: String =
    s"""$lshOracleCtes
       |SELECT id1, id2, shingle_jaccard FROM verified
       |WHERE shingle_jaccard >= 0.5""".stripMargin

  /** n-gram Jaccard near-dup verify, blocked by `source` (a real blocking
    * key keeps the pair space per-block, not global n²).
    */
  def q22NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Gram sets are sorted ONCE per document (before the pair join);
    // each of the O(block²) pairs then scores via the merge-count
    // expression — no per-pair set allocation.
    // Packed int grams: bijective with the string 3-gram set on this
    // ASCII corpus, so jac is EXACTLY the oracle's value while the
    // arrays copied into each joined pair are ~6× smaller.
    // materialized: the triangle-salted self-join consumes g from both
    // sides, which would otherwise pack the gram arrays twice
    val g = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"),
        Dedup.packedNgrams(col("text"), 3).as("grams"))
      .transform(graft.runtime.Materialize.once)
    // Triangle-salted self-join: 20 sources would otherwise cap the
    // pair-scoring parallelism at 20 tasks; salting by 4 sub-blocks
    // fans each source over 10 join keys.
    // The lossless length prefilter (jac ≤ min/max size ratio) is
    // injected automatically by graft.plans.JaccardLengthPrune in
    // front of the jac >= 0.6 predicate — the query stays declarative.
    Dedup.saltedBlockPairs(g, "source", "doc_id", subBlocks = 4)
      .select(col("source"),
        least(col("doc_id_1"), col("doc_id_2")).as("id1"),
        greatest(col("doc_id_1"), col("doc_id_2")).as("id2"),
        Dedup.sortedIntJaccard(col("grams_1"), col("grams_2")).as("jac"))
      .filter(col("jac") >= 0.6)
  }

  val q22Oracle: String =
    """WITH g AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(range(1, greatest(length(text)-2,1)+1),
      |                  i -> substr(text, i, 3))) AS grams
      |  FROM documents),
      |pairs AS (
      |  SELECT a.source, a.doc_id AS id1, b.doc_id AS id2,
      |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.grams, b.grams))) AS jac
      |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id)
      |SELECT source, id1, id2, jac FROM pairs WHERE jac >= 0.6""".stripMargin

  /** SimHash near-dup: 64-bit fingerprints, 16-bit banded candidate
    * pairs, hamming ≤ 3 (banding is sound for d ≤ 3: pigeonhole over 4
    * bands).
    */
  def q23Simhash(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        Dedup.portableSimHash(TextAnalysis.wsTokens(col("text"))).as("simhash"))
      // the pair miner references the fingerprint frame from up to six
      // plan branches and Spark does not reuse the subtree (verified: no
      // ReusedExchange) — checkpoint the tiny (id, long) frame so the
      // dominant per-token fingerprinting runs ONCE. At 100 TB this is
      // exactly the artifact you'd materialize: 16 bytes/doc.
      .transform(graft.runtime.Materialize.once)
    // banding over DISTINCT fingerprints only: duplicate-heavy corpora
    // otherwise collide every identical pair on all four bands and make
    // within-bucket pairing quadratic in the duplicate count
    Dedup.simHashNearPairs(fp, "doc_id", "simhash", maxHamming = 3)
  }

  /** Oracle: brute-force ALL hamming ≤ 3 pairs over recomputed portable
    * fingerprints. 4×16-bit banding is sound AND complete for d ≤ 3, so
    * the engine's banded mining must equal this exact pair set — the
    * oracle checks the fingerprint math AND the LSH completeness claim
    * in one comparison. (All-pairs is fine for the ORACLE at sf0.01;
    * the engine side never does it.)
    */
  val q23Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |h AS (
       |  SELECT doc_id,
       |    CASE WHEN length(tok) = 0 THEN 0 ELSE
       |      list_reduce(list_transform(range(1, length(tok)+1), i -> ascii(tok[i])::BIGINT),
       |                  (a, b) -> (a * $Base + b) % $Mod) END AS hv
       |  FROM toks),
       |votes AS (
       |  SELECT doc_id, j,
       |    sum(CASE WHEN ((hv + j * $Shift) % $Mod) * ((hv + j * $Shift) % $Mod) % $Mod % 2 = 1
       |             THEN 1 ELSE -1 END) AS s
       |  FROM h, range(0, 64) t(j)
       |  GROUP BY doc_id, j),
       |fp AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN s > 0 THEN
       |          CASE WHEN j = 63 THEN (-9223372036854775807)::HUGEINT - 1
       |               ELSE (1::BIGINT << j)::HUGEINT END
       |        ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id)
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  }

  /** Embedding-cosine near-dup dedup: drop every vector that has a
    * same-sign-bucket neighbor with a LOWER id at cosine ≥ 0.25; emit
    * survivors (the greedy keep-lowest-id LSH dedup). Candidates come
    * from the bucketed join — never an all-pairs product — and the
    * survivor filter is one left-anti join on the dropped-id set.
    * Fully SQL-portable (sign buckets + list_dot_product), so this one
    * is oracle-checked end to end.
    */
  def q34EmbedDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.load(spark, dir, "embeddings")
    // same bucketing/threshold as q26, from the shared pair miner
    val dropped = Similarity.signBucketNearPairs(e, bits = 8, minCos = 0.25)
      .select(col("id2").as("vec_id"))
    e.join(dropped, Seq("vec_id"), "left_anti").select(col("vec_id"))
  }

  val q34Oracle: String = {
    val bucket = graft.operators.Similarity.signBucketSql("embedding", 8)
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
       |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.25)
       |SELECT vec_id FROM e
       |WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = e.vec_id)""".stripMargin
  }

  /** Corpus-level similarity via the MinHash signature AGGREGATOR: one
    * 32-slot signature per source (partial/final elementwise-min merge
    * — only 32 longs per source cross the shuffle, whatever the corpus
    * size), then pairwise matching-slot counts, which estimate the
    * Jaccard similarity of the sources' 3-gram universes. The portable
    * affine hash family lets DuckDB re-derive the identical signatures,
    * so even this sketch is hash-match checkable.
    */
  def q41SourceMinhash(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.MinHashSignatureAgg
    val d = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    // Grams are hashed by the rolling codegen'd expression and exploded
    // as longs — no gram strings ever materialize (min is idempotent,
    // so skipping distinct changes nothing). explode_outer dodges the
    // implicit size>0 pushed filter (arrays are never empty).
    val sigs = d
      .select(col("source"), explode_outer(Dedup.gramHashes(col("text"), 3)).as("gh"))
      .groupBy(col("source"))
      .agg(MinHashSignatureAgg.udafFromHashes(32)(col("gh")).as("sig"))
      // both sides of the signature self-join read this tiny frame
      // (one row per source); without materialization the gram explode
      // + aggregation runs twice
      .transform(graft.runtime.Materialize.once)
    val a = sigs.select(col("source").as("s1"), col("sig").as("sig1"))
    val b = sigs.select(col("source").as("s2"), col("sig").as("sig2"))
    a.join(b, col("s1") < col("s2"))
      .select(col("s1"), col("s2"),
        expr("size(filter(zip_with(sig1, sig2, (x, y) -> x = y), m -> m))")
          .as("matching_slots"))
      .filter(col("matching_slots") >= 1)
  }

  val q41Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH g AS (
       |  SELECT source,
       |    unnest(list_transform(range(1, greatest(length(text)-2,1)+1),
       |                          i -> substr(text, i, 3))) AS s
       |  FROM documents),
       |h AS (
       |  SELECT source,
       |    CASE WHEN length(s) = 0 THEN 0 ELSE
       |      list_reduce(list_transform(range(1, length(s)+1), i -> ascii(s[i])::BIGINT),
       |                  (a, b) -> (a * $Base + b) % $Mod) END AS hv
       |  FROM g),
       |shifted AS (
       |  SELECT source, j, (hv + j * $Shift) % $Mod AS v
       |  FROM h, range(0, 32) t(j)),
       |slots AS (
       |  SELECT source, j, min((v * v) % $Mod) AS mn
       |  FROM shifted GROUP BY source, j),
       |matches AS (
       |  SELECT a.source AS s1, b.source AS s2
       |  FROM slots a JOIN slots b ON a.j = b.j AND a.mn = b.mn AND a.source < b.source)
       |SELECT s1, s2, count(*) AS matching_slots FROM matches GROUP BY s1, s2""".stripMargin
  }

  /** Near-dup PAIRS → duplicate GROUPS: connected components over the
    * q26 pair miner's output ([[graft.operators.Clusters]], iterative
    * min-label propagation), singletons unioned back, plus each
    * cluster's size. This is the step that makes pair mining usable —
    * a pipeline keeps min-id per cluster and drops the rest. The
    * oracle recomputes the identical pair set and closes it with a
    * recursive CTE (min reachable id), so the distributed propagation
    * is checked against an independent transitive-closure algorithm.
    */
  def q57DupClusters(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Clusters, Similarity}
    val e = Tables.load(spark, dir, "embeddings")
    val pairs = Similarity.signBucketNearPairs(e, bits = 8, minCos = 0.25)
      .select(col("id1"), col("id2"))
    val comps = Clusters.connectedComponents(pairs, "id1", "id2")
      .withColumnRenamed("id", "vec_id")
    e.select(col("vec_id"))
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("vec_id")).as("cluster"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster"))))
  }

  /** Shared q57/q110 oracle fragment: sign-bucket near pairs →
    * symmetric edges → recursive transitive closure → per-node min
    * reachable id (`comp(id, cluster)`) — the independent
    * transitive-closure check of the distributed propagation.
    */
  private val dupClusterCtes: String = {
    val bucket = graft.operators.Similarity.signBucketSql("embedding", 8)
    s"""e AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
       |pairs AS (
       |  SELECT a.vec_id AS id1, b.vec_id AS id2
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
       |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.25),
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM pairs
       |  UNION SELECT id2, id1 FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS lab FROM edges
       |  UNION
       |  SELECT g.src, r.lab FROM edges g JOIN reach r ON g.dst = r.id),
       |comp AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id)""".stripMargin
  }

  val q57Oracle: String =
    s"""WITH RECURSIVE $dupClusterCtes
       |SELECT v.vec_id, coalesce(c.cluster, v.vec_id) AS cluster,
       |  CAST(count(*) OVER (PARTITION BY coalesce(c.cluster, v.vec_id)) AS BIGINT)
       |    AS cluster_size
       |FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.id""".stripMargin

  /** q110 — canonical-document selection, the dedup FINISHING step:
    * after pair mining (q26) and clustering (q57), keep exactly one
    * representative per duplicate cluster — longest document first
    * (the standard keep-longest heuristic), doc_id as the
    * deterministic tie-break — and mark the rest for dropping. One
    * window pass over the clustered frame; the quality join is a
    * broadcast-sized id join (embeddings ↔ documents are 1:1 here).
    */
  def q110CanonicalDocs(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Clusters, Similarity}
    val e = Tables.load(spark, dir, "embeddings")
    val pairs = Similarity.signBucketNearPairs(e, bits = 8, minCos = 0.25)
      .select(col("id1"), col("id2"))
    val comps = Clusters.connectedComponents(pairs, "id1", "id2")
      .withColumnRenamed("id", "vec_id")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val clustered = e.select(col("vec_id"))
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id").as("doc_id"),
        coalesce(col("cluster"), col("vec_id")).as("cluster"))
      .join(docs, Seq("doc_id"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    clustered
      .withColumn("keep", (row_number().over(w) === 1).cast("int"))
      .select(col("doc_id"), col("cluster"), col("source"), col("keep"))
  }

  val q110Oracle: String =
    s"""WITH RECURSIVE $dupClusterCtes,
       |cl AS (
       |  SELECT v.vec_id AS doc_id,
       |    coalesce(c.cluster, v.vec_id) AS cluster
       |  FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.id)
       |SELECT cl.doc_id, cl.cluster, d.source,
       |  CAST(CASE WHEN row_number() OVER (PARTITION BY cl.cluster
       |         ORDER BY d.n_chars DESC, cl.doc_id) = 1
       |       THEN 1 ELSE 0 END AS INT) AS keep
       |FROM cl JOIN documents d ON d.doc_id = cl.doc_id""".stripMargin

  /** q118 — SemDeDup ([[graft.operators.Similarity.semDedup]]): drop
    * vectors with a lower-id near-duplicate inside their k-means cell.
    * The oracle replays the full chain — seed centroids from the 16
    * lowest vec_ids, one integer-quantized Lloyd round, max-cos cell
    * assignment, within-cell pairwise threshold — so the clustering
    * AND the dedup decision are both hash-checked.
    */
  def q118SemDedup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.semDedup(
      Tables.load(spark, dir, "embeddings"), nlist = 16, minCos = 0.25)

  val q118Oracle: String = {
    def cos(a: String, b: String) = SimilarityQueries.cosSql(a, b)
    s"""WITH cent0 AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |a0 AS (
       |  SELECT cid, vec_id, embedding FROM (
       |    SELECT c.cid, e.vec_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS crank
       |    FROM embeddings e, cent0 c) WHERE crank = 1),
       |comp AS (
       |  SELECT cid, i AS dim,
       |    sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
       |        AS BIGINT)) AS sq,
       |    count(*) AS n
       |  FROM a0, unnest(range(1, len(embedding) + 1)) u(i)
       |  GROUP BY cid, i),
       |cent AS (
       |  SELECT cid,
       |    list(CAST((sq / n) / 1000000.0 AS FLOAT) ORDER BY dim) AS cvec
       |  FROM comp GROUP BY cid),
       |cells AS (
       |  SELECT cid, vec_id, embedding FROM (
       |    SELECT c.cid, e.vec_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS crank
       |    FROM embeddings e, cent c) WHERE crank = 1),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM cells a JOIN cells b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${cos("a.embedding", "b.embedding")} >= 0.25)
       |SELECT c.vec_id, c.cid,
       |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
       |FROM cells c LEFT JOIN dropped d ON d.vec_id = c.vec_id""".stripMargin
  }

  /** q127 — train/val split-leakage audit: near-duplicate pairs (the
    * q21 MinHash+LSH chain, jaccard ≥ 0.5) that STRADDLE the q35 split
    * boundary — the leakage an eval suite must not have (a val doc
    * near-identical to a train doc inflates every metric). Composes
    * the dedup miner with the split assignment: at 100 TB this is the
    * same LSH banding cost as q21 plus two id-keyed label joins.
    */
  def q127SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val pairs = q21MinhashLsh(spark, dir)
    val splits = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), Sampling.splitLabel(col("doc_id")).as("split"))
    pairs
      .join(splits.select(col("doc_id").as("id1"), col("split").as("split1")),
        Seq("id1"))
      .join(splits.select(col("doc_id").as("id2"), col("split").as("split2")),
        Seq("id2"))
      .filter(col("split1") =!= col("split2"))
      .select(col("id1"), col("id2"), col("split1"), col("split2"))
  }

  val q127Oracle: String = {
    val bucket1 = graft.operators.Sampling.hashBucketSql("l.id1")
    val bucket2 = graft.operators.Sampling.hashBucketSql("l.id2")
    s"""WITH pairs AS ($q21Oracle),
       |labeled AS (
       |  SELECT l.id1, l.id2,
       |    CASE WHEN $bucket1 < 230 THEN 'train' ELSE 'val' END AS split1,
       |    CASE WHEN $bucket2 < 230 THEN 'train' ELSE 'val' END AS split2
       |  FROM pairs l)
       |SELECT id1, id2, split1, split2 FROM labeled
       |WHERE split1 <> split2""".stripMargin
  }

  /** q134 — MinHash estimator calibration: for every LSH-surfaced
    * near-dup pair (the q21 chain), the 32-slot signature's collision
    * fraction (the MinHash Jaccard ESTIMATE, E[matches/k] = J) next to
    * the exact shingle Jaccard, both as integer ppm, plus the absolute
    * error. This is the table a pipeline reads before trusting
    * signature-only dedup decisions (skipping the exact verify pass at
    * 100 TB buys a full corpus-sized join — IF the estimator error is
    * tolerable; expected |err| ≈ √(J(1−J)/32) ≈ 0.07 at J = 0.6).
    *
    * Scale shape: pair set is LSH-candidate-sized (never all-pairs);
    * the signature frame is 32 longs/doc joined back by id; slot
    * comparison is a fused zip_with over two fixed-width arrays on a
    * pair-sized frame. Integer ppm throughout, so both engines agree
    * bit-for-bit. The oracle replays the slot family from the shared
    * q21 CTE chain — estimate AND exact are independently rebuilt.
    */
  def q134MinhashErr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val sketched = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        Dedup.sortedShingles(TextAnalysis.wsTokens(col("text")), 3).as("sh"))
      .withColumn("sig", ColumnBridge.column(
        graft.functions.PortableMinHashSignature(
          ColumnBridge.expression(col("sh")), 32)))
      // consumed by both join-backs below
      .transform(graft.runtime.Materialize.once)
    val interCount = ColumnBridge.column(
      graft.functions.SortedArrayIntersectCount(
        ColumnBridge.expression(col("sh1")),
        ColumnBridge.expression(col("sh2"))))
    q21MinhashLsh(spark, dir)
      .select(col("id1"), col("id2"))
      .join(sketched.select(col("doc_id").as("id1"),
        col("sh").as("sh1"), col("sig").as("sig1")), Seq("id1"))
      .join(sketched.select(col("doc_id").as("id2"),
        col("sh").as("sh2"), col("sig").as("sig2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        interCount.cast("long").as("n_common"),
        (size(col("sh1")) + size(col("sh2"))).cast("long").as("n_sizes"),
        expr("aggregate(zip_with(sig1, sig2, (a, b) -> if(a = b, 1, 0)), " +
          "0, (acc, x) -> acc + x)").cast("long").as("slot_matches"))
      .withColumn("n_union", col("n_sizes") - col("n_common"))
      .select(col("id1"), col("id2"),
        expr("(n_common * 1000000L) div n_union").as("exact_ppm"),
        expr("(slot_matches * 1000000L) div 32").as("est_ppm"),
        col("slot_matches"))
      .withColumn("err_ppm", abs(col("est_ppm") - col("exact_ppm")))
  }

  /** q181 — LSH band/row operating-point sweep: candidate volume and
    * estimated-similarity profile for (bands × rows/band) =
    * (16×2, 8×4, 4×8) over the SAME 32-slot portable signatures — the
    * S-curve design table (Leskovec/Rajaraman/Ullman MMDS §3.4) that
    * decides b and r before a corpus-scale dedup run: more bands catch
    * lower-similarity pairs (recall) at the price of candidate volume
    * (cost), fewer bands sharpen the threshold. q134 calibrates the
    * estimator; this sweeps the operating point.
    *
    * Scale shape: one signature materialization; each config is a
    * banded equi-join (bucket-bounded, the q21 shape — never
    * all-pairs) plus a k-bounded slot-match join-back; the report is
    * three scalar aggregates.
    */
  def q181LshSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val sketched = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        Dedup.sortedShingles(TextAnalysis.wsTokens(col("text")), 3).as("sh"))
      .withColumn("sig", ColumnBridge.column(
        graft.functions.PortableMinHashSignature(
          ColumnBridge.expression(col("sh")), 32)))
      .select(col("doc_id"), col("sig"))
      .transform(graft.runtime.Materialize.once) // 3 configs + join-backs
    Seq((16, 2), (8, 4), (4, 8)).map { case (b, r) =>
      val bands = sketched.select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, ${b - 1}), i -> struct(i AS band,
           |  array_join(transform(slice(sig, i * $r + 1, $r),
           |    x -> cast(x as string)), ',') AS key))""".stripMargin))
        .as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      cand
        .join(sketched.select(col("doc_id").as("id1"), col("sig").as("sig1")),
          Seq("id1"))
        .join(sketched.select(col("doc_id").as("id2"), col("sig").as("sig2")),
          Seq("id2"))
        .select(expr("aggregate(zip_with(sig1, sig2, (a, b) -> if(a = b, 1, 0)), " +
          "0, (acc, x) -> acc + x)").cast("long").as("m"))
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(col("m")), lit(0L)).as("sm"),
          coalesce(sum(when(col("m") * 2 >= 32, 1L).otherwise(0L)), lit(0L))
            .as("n_est_above_half"))
        .select(lit(b).as("n_bands"), lit(r).as("rows_per_band"),
          col("n_candidates"),
          expr("CASE WHEN n_candidates = 0 THEN 0L " +
            "ELSE (sm * 1000000L) div (32L * n_candidates) END")
            .as("mean_est_ppm"),
          col("n_est_above_half"))
    }.reduce(_ unionByName _)
  }

  val q181Oracle: String = {
    def config(b: Int, r: Int): String =
      s"""bk$b AS (
         |  SELECT doc_id, (j) // $r AS band,
         |    string_agg(CAST(mn AS VARCHAR), ',' ORDER BY j) AS key
         |  FROM slots GROUP BY doc_id, (j) // $r),
         |cand$b AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bk$b a JOIN bk$b b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |sm$b AS (
         |  SELECT c.id1, c.id2,
         |    CAST(sum(CASE WHEN x.mn = y.mn THEN 1 ELSE 0 END) AS BIGINT) AS m
         |  FROM cand$b c
         |  JOIN slots x ON x.doc_id = c.id1
         |  JOIN slots y ON y.doc_id = c.id2 AND y.j = x.j
         |  GROUP BY c.id1, c.id2),
         |pt$b AS (
         |  SELECT CAST($b AS INT) AS n_bands, CAST($r AS INT) AS rows_per_band,
         |    CAST(count(*) AS BIGINT) AS n_candidates,
         |    CAST(CASE WHEN count(*) = 0 THEN 0
         |         ELSE (sum(m) * 1000000) // (32 * count(*)) END AS BIGINT)
         |      AS mean_est_ppm,
         |    CAST(coalesce(sum(CASE WHEN m * 2 >= 32 THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_est_above_half
         |  FROM sm$b)""".stripMargin
    s"""$lshOracleCtes,
       |${config(16, 2)},
       |${config(8, 4)},
       |${config(4, 8)}
       |SELECT * FROM pt16
       |UNION ALL SELECT * FROM pt8
       |UNION ALL SELECT * FROM pt4""".stripMargin
  }

  val q134Oracle: String =
    s"""$lshOracleCtes,
       |pairs AS (
       |  SELECT id1, id2 FROM verified WHERE shingle_jaccard >= 0.5),
       |est AS (
       |  SELECT p.id1, p.id2,
       |    CAST(sum(CASE WHEN x.mn = y.mn THEN 1 ELSE 0 END) AS BIGINT)
       |      AS slot_matches
       |  FROM pairs p
       |  JOIN slots x ON x.doc_id = p.id1
       |  JOIN slots y ON y.doc_id = p.id2 AND y.j = x.j
       |  GROUP BY p.id1, p.id2),
       |ex AS (
       |  SELECT p.id1, p.id2,
       |    CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS i,
       |    CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS BIGINT)
       |      AS u
       |  FROM pairs p
       |  JOIN sh a ON a.doc_id = p.id1
       |  JOIN sh b ON b.doc_id = p.id2)
       |SELECT e.id1, e.id2,
       |  (x.i * 1000000) // x.u AS exact_ppm,
       |  (e.slot_matches * 1000000) // 32 AS est_ppm,
       |  e.slot_matches,
       |  abs((e.slot_matches * 1000000) // 32 - (x.i * 1000000) // x.u)
       |    AS err_ppm
       |FROM est e JOIN ex x ON x.id1 = e.id1 AND x.id2 = e.id2""".stripMargin

  /** q136 — exact source-pair shingle Jaccard: the EXACT twin of q41's
    * MinHash source-similarity estimate. Distinct (source, shingle)
    * membership, a per-shingle source-pair join (fan-out bounded by the
    * source count — C(20,2) worst case per shingle, never doc-pair
    * scale), per-source set sizes joined back broadcast, union by
    * inclusion–exclusion, similarity as integer ppm. Against q41 this
    * is the calibration table: |est − exact| per pair is the MinHash
    * error a 32-slot signature actually delivers.
    *
    * Scale shape: the membership distinct is one vocabulary-scale
    * shuffle; the pair join shuffles the membership frame on shingle
    * with per-key fan-out ≤ sources²; sizes are a broadcast
    * source-count-sized frame. No stage touches doc pairs.
    */
  def q136SourceJaccard(spark: SparkSession, dir: String): DataFrame = {
    val member = Tables.load(spark, dir, "documents")
      .select(col("source"),
        explode(Dedup.sortedShingles(
          TextAnalysis.wsTokens(col("text")), 3)).as("sh"))
      .distinct()
      // consumed by the size census and BOTH pair-join branches
      .transform(graft.runtime.Materialize.once)
    val sizes = member.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = member.as("a")
      .join(member.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .select(col("a.source").as("s1"), col("b.source").as("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("s1"), col("n").as("n1"))),
        Seq("s1"))
      .join(broadcast(sizes.select(col("source").as("s2"), col("n").as("n2"))),
        Seq("s2"))
      .withColumn("n_union", col("n1") + col("n2") - col("n_common"))
      .withColumn("jaccard_ppm",
        expr("(n_common * 1000000L) div n_union"))
      .select(col("s1"), col("s2"), col("n_common"), col("n_union"),
        col("jaccard_ppm"))
  }

  val q136Oracle: String =
    """WITH t AS (
      |  SELECT source, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |g AS (
      |  SELECT DISTINCT source,
      |    unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 1)+1),
      |      i -> array_to_string(list_slice(t, i, i+2), ' ')))) AS sh
      |  FROM t),
      |sizes AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY source),
      |inter AS (
      |  SELECT a.source AS s1, b.source AS s2,
      |    CAST(count(*) AS BIGINT) AS n_common
      |  FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source
      |  GROUP BY a.source, b.source)
      |SELECT i.s1, i.s2, i.n_common,
      |  x.n + y.n - i.n_common AS n_union,
      |  (i.n_common * 1000000) // (x.n + y.n - i.n_common) AS jaccard_ppm
      |FROM inter i
      |JOIN sizes x ON x.source = i.s1
      |JOIN sizes y ON y.source = i.s2""".stripMargin

  /** q144 — sorted-neighborhood dedup (Hernández & Stolfo): the THIRD
    * blocking family next to LSH banding (q21) and prefix filtering
    * (q90). Sort the corpus by a cheap key that co-locates likely
    * duplicates (here (n_chars, doc_id)), then compare only records
    * within a rank window of w=8 — candidate volume is n·w by
    * construction, whatever the corpus looks like, which is the
    * property the other two families can't promise under adversarial
    * key distributions.
    *
    * Scale shape: the global rank is q124's two-phase dense ID (range
    * exchange + partition-spine offsets, no data-sized global window);
    * the w-window pair join is a bucket trick — each rank registers at
    * buckets {r div w, r div w + 1}, so every pair within w shares a
    * bucket and one equi-join with a distinct() finds them all (2×
    * replication, fanout ≤ 2w per bucket). Verification is the exact
    * integer shingle Jaccard (q134's arithmetic).
    */
  def q144SortedNeighbors(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val w = 8
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        Dedup.sortedShingles(TextAnalysis.wsTokens(col("text")), 3).as("sh"))
      .repartitionByRange(col("n_chars"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      // pid must be IDENTICAL in the rank and offset branches — pin it
      .transform(graft.runtime.Materialize.once)
    val local = d.withColumn("lrank",
      row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("n_chars"), col("doc_id"))))
    val offsets = d.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    val ranked = local.join(broadcast(offsets), Seq("pid"))
      .select(col("doc_id"), col("sh"),
        (col("offset") + col("lrank")).as("r"))
      // both sides of the pair join read this frame
      .transform(graft.runtime.Materialize.once)
    // pair mining on BARE (rank, id) rows — the shingle arrays never
    // ride the bucket join or the distinct; they join back by id after
    // the (much smaller) pair set is fixed (q134's shape)
    val buckets = ranked.select(col("doc_id"), col("r"),
      explode(array(expr(s"r div $w"), expr(s"r div $w + 1"))).as("bk"))
    val interCount = ColumnBridge.column(
      graft.functions.SortedArrayIntersectCount(
        ColumnBridge.expression(col("sh1")),
        ColumnBridge.expression(col("sh2"))))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.bk") === col("b.bk") && col("a.r") < col("b.r") &&
          col("b.r") - col("a.r") <= w)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct() // a pair can share both buckets
      .join(ranked.select(col("doc_id").as("id1"), col("sh").as("sh1")),
        Seq("id1"))
      .join(ranked.select(col("doc_id").as("id2"), col("sh").as("sh2")),
        Seq("id2"))
      .select(col("id1"), col("id2"),
        interCount.cast("long").as("n_common"),
        (size(col("sh1")) + size(col("sh2"))).cast("long").as("n_sizes"))
      .withColumn("jaccard_ppm",
        expr("(n_common * 1000000L) div (n_sizes - n_common)"))
      .filter(col("jaccard_ppm") >= 300000)
      .select(col("id1"), col("id2"), col("n_common"), col("jaccard_ppm"))
  }

  val q144Oracle: String =
    """WITH sh AS (
      |  SELECT doc_id, n_chars,
      |    list_sort(list_distinct(list_transform(
      |      range(1, greatest(len(t) - 2, 1) + 1),
      |      i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS sh
      |  FROM (SELECT doc_id, n_chars,
      |          string_split_regex(trim(text), '\s+') AS t
      |        FROM documents)),
      |r AS (
      |  SELECT doc_id, sh,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS r
      |  FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sh AS sh1, b.sh AS sh2
      |  FROM r a JOIN r b ON b.r > a.r AND b.r - a.r <= 8),
      |v AS (
      |  SELECT id1, id2,
      |    CAST(len(list_intersect(sh1, sh2)) AS BIGINT) AS n_common,
      |    CAST(len(sh1) + len(sh2) AS BIGINT) AS n_sizes
      |  FROM pairs)
      |SELECT id1, id2, n_common,
      |  (n_common * 1000000) // (n_sizes - n_common) AS jaccard_ppm
      |FROM v
      |WHERE (n_common * 1000000) // (n_sizes - n_common) >= 300000""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_exact_dedup" -> (q20ExactDedup _),
    "q21_minhash_lsh" -> (q21MinhashLsh _),
    "q22_ngram_jaccard" -> (q22NgramJaccard _),
    "q23_simhash" -> (q23Simhash _),
    "q34_embed_dedup" -> (q34EmbedDedup _),
    "q41_source_minhash" -> (q41SourceMinhash _),
    "q57_dup_clusters" -> (q57DupClusters _),
    "q110_canonical_docs" -> (q110CanonicalDocs _),
    "q118_semdedup" -> (q118SemDedup _),
    "q127_split_leakage" -> (q127SplitLeakage _),
    "q134_minhash_err" -> (q134MinhashErr _),
    "q181_lsh_sweep" -> (q181LshSweep _),
    "q136_source_jaccard" -> (q136SourceJaccard _),
    "q144_sorted_neighbors" -> (q144SortedNeighbors _))

  val oracles: Map[String, String] = Map(
    "q20_exact_dedup" -> q20Oracle,
    "q21_minhash_lsh" -> q21Oracle,
    "q22_ngram_jaccard" -> q22Oracle,
    "q23_simhash" -> q23Oracle,
    "q34_embed_dedup" -> q34Oracle,
    "q41_source_minhash" -> q41Oracle,
    "q57_dup_clusters" -> q57Oracle,
    "q110_canonical_docs" -> q110Oracle,
    "q118_semdedup" -> q118Oracle,
    "q127_split_leakage" -> q127Oracle,
    "q134_minhash_err" -> q134Oracle,
    "q181_lsh_sweep" -> q181Oracle,
    "q136_source_jaccard" -> q136Oracle,
    "q144_sorted_neighbors" -> q144Oracle)
}
