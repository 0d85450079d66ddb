package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.runtime.{Materialize, Tables}

/** Extension tier — similarity search over the `embeddings` table.
  *
  * q24 brute-force cosine top-k (exact baseline, oracle-checked on
  * neighbor ids/ranks), q25 multi-table hyperplane-LSH ANN (scale path,
  * portable plane hash → fully oracle-checked), q26 sign-bucketed
  * near-similar pairs (bucketed join, oracle-checked — the bucket
  * function is plain SQL).
  */
object SimilarityQueries {

  /** Query-set cutoff, shared by the Spark queries AND every oracle's
    * interpolated predicate so the two can never drift apart.
    */
  private val QueryCutoff = 10

  private def queriesOf(df: DataFrame): DataFrame =
    df.filter(col("vec_id") < QueryCutoff)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  /** Brute-force exact top-5: broadcast 10 query vectors against the
    * corpus, one scan, no shuffle before the per-query top-k window.
    * Output is ids+ranks only — floats stay internal so the oracle
    * compare is ulp-proof.
    */
  def q24KnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    Similarity.bruteForceTopK(e, queriesOf(e), 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  val q24Oracle: String =
    s"""WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS query_vec
      |  FROM embeddings WHERE vec_id < $QueryCutoff),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_dot_product(CAST(q.query_vec AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
      |      / (sqrt(list_dot_product(CAST(q.query_vec AS DOUBLE[]), CAST(q.query_vec AS DOUBLE[])))
      |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos
      |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5""".stripMargin

  /** ANN top-5 via 8 tables × 8-bit hyperplane signatures, exact-cosine
    * reranked. Work scales with bucket collisions, never the full n²
    * product — this is the plan shape that survives 100 TB.
    *
    * Buckets use the SQL-portable plane-sign hash so the DuckDB oracle
    * replays the ENTIRE ANN pipeline — signatures, bucket join, rerank —
    * and the result is hash-match checked ([[Similarity.annBuckets]],
    * the xxhash form, stays the production default).
    */
  def q25AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    Similarity.annTopK(e, queriesOf(e), 5,
        buckets = Similarity.portableAnnBuckets)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** The q25 pipeline replayed in DuckDB. The plane sign for flat index
    * x = (t·bits+p)·dims+i is the parity of ((x+1)·48271)² mod 2^31−1 —
    * integer arithmetic both engines compute identically — and each
    * projection folds left-to-right in doubles exactly like the fused
    * Spark expression, so even the dot-product signs match bit-for-bit.
    */
  val q25Oracle: String = {
    import graft.functions.PortableHash.{Mod => M, Shift}
    val (tables, bits, k) = (8, 8, 5)
    // dims tracks each row's actual vector length (len(embedding)),
    // exactly like PortableHyperplaneHelper — never a hardcoded 64
    val dims = "len(embedding)"
    // ±embedding[i+1] by the parity-of-square sign; v stays < 2^31 so
    // v*v fits BIGINT on both engines
    val signedComponent =
      s"""CASE WHEN ((((t*$bits+p)*$dims+i+1)*$Shift) % $M)
         |           * ((((t*$bits+p)*$dims+i+1)*$Shift) % $M) % $M % 2 = 1
         |      THEN CAST(embedding[i+1] AS DOUBLE)
         |      ELSE -CAST(embedding[i+1] AS DOUBLE) END""".stripMargin
    s"""WITH b AS (
       |  SELECT vec_id, embedding, tt.t AS tbl,
       |    list_reduce(list_transform(range(0, $bits), p ->
       |      CASE WHEN list_reduce(list_transform(range(0, $dims), i ->
       |             $signedComponent), (acc, x) -> acc + x) > 0
       |        THEN CAST(1 << ($bits - 1 - p) AS BIGINT) ELSE 0 END),
       |      (acc, x) -> acc + x) AS bucket
       |  FROM embeddings, range(0, $tables) tt(t)),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, q.embedding AS query_vec,
       |    c.vec_id AS neighbor_id, c.embedding AS cemb
       |  FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |  WHERE q.vec_id < $QueryCutoff AND c.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT query_id, neighbor_id, ${cosSql("query_vec", "cemb")} AS cos
       |  FROM cand),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Near-similar pair mining inside SQL-portable sign buckets (first 8
    * dims' signs): same-bucket pairs with cosine above threshold. Both
    * the bucketing and the threshold decision are computed identically
    * by the oracle.
    */
  def q26SignBucketPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.signBucketNearPairs(
      Tables.load(spark, dir, "embeddings"), bits = 8, minCos = 0.25)

  val q26Oracle: String = {
    val bucket = Similarity.signBucketSql("embedding", 8)
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
       |pairs AS (
       |  SELECT a.bucket, a.vec_id AS id1, b.vec_id AS id2,
       |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
       |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT bucket, id1, id2 FROM pairs WHERE cos >= 0.25""".stripMargin
  }

  /** DuckDB cosine over float[] columns — double accumulation in the
    * same order as the native expression, so values compare exactly.
    */
  def cosSql(a: String, b: String): String =
    s"""list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))
       |         * sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))""".stripMargin

  /** IVF ANN: 16 seeded centroid cells tightened by ONE Lloyd
    * refinement round, 2-cell probes, exact rerank — the
    * inverted-file scale path next to q25's hash-bucket scale path.
    * The oracle replays the identical seed → assign → quantized-mean →
    * re-assign / probe / rerank chain, so ids and ranks match by
    * construction (the refined centroid components are float-exact on
    * both engines — see [[Similarity.refineCentroids]]).
    */
  def q33IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    Similarity.ivfTopK(e, queriesOf(e), 5, nlist = 16, nprobe = 2,
      refine = 1)
  }

  val q33Oracle: String =
    s"""WITH cent0 AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |a0 AS (
       |  SELECT cid, vec_id, embedding FROM (
       |    SELECT c.cid, e.vec_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosSql("e.embedding", "c.cvec")} DESC, c.cid) AS crank
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
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS query_vec
       |  FROM embeddings WHERE vec_id < $QueryCutoff),
       |assigned AS (
       |  SELECT cid, vec_id, embedding FROM (
       |    SELECT c.cid, e.vec_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosSql("e.embedding", "c.cvec")} DESC, c.cid) AS crank
       |    FROM embeddings e, cent c) WHERE crank = 1),
       |probed AS (
       |  SELECT cid, query_id, query_vec FROM (
       |    SELECT c.cid, q.query_id, q.query_vec,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        ${cosSql("q.query_vec", "c.cvec")} DESC, c.cid) AS crank
       |    FROM q, cent c) WHERE crank <= 2),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ${cosSql("p.query_vec", "a.embedding")} AS cos
       |  FROM probed p JOIN assigned a USING (cid)
       |  WHERE a.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5""".stripMargin

  /** q108 — product-quantization codebook training: 2 subspaces × 4
    * codes, seeded from the lowest vec_ids, one Lloyd round, exact
    * integer math throughout ([[graft.operators.Pq]]). The oracle
    * replays the full quantize → split → assign → floor-mean →
    * re-assign chain; every value is an integer, so the result is
    * hash-exact by construction.
    */
  def q108PqCodebook(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Pq.codebookStats(
      Tables.load(spark, dir, "embeddings"), m = PqM, k = PqK)

  /** The q108/q109 PQ geometry — single definition, interpolated into
    * both oracles.
    */
  private val PqM = 2
  private val PqK = 4

  /** Integer L2² between two subvector aliases (ascending integer
    * fold — order-free, engine-exact).
    */
  private def pqDistSql(a: String, b: String): String =
    s"""list_reduce(
       |      list_transform(range(1, len($a) + 1),
       |        i -> ($a[i] - $b[i]) * ($a[i] - $b[i])),
       |      (x, y) -> x + y)""".stripMargin

  /** Shared PQ training CTE chain (quantize → split → seed → assign →
    * floor-mean → refined assignment a1(ss, vec_id, code, d)), ending
    * without a final SELECT so each query appends its own rollup.
    */
  private def pqTrainCtes: String =
    s"""e AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |sv AS (
       |  SELECT vec_id, CAST(ss AS INT) AS ss,
       |    CASE WHEN ss = $PqM - 1
       |      THEN list_slice(q, ss * (len(q) // $PqM) + 1, len(q))
       |      ELSE list_slice(q, ss * (len(q) // $PqM) + 1,
       |                      (ss + 1) * (len(q) // $PqM)) END AS v
       |  FROM e, range(0, $PqM) r(ss)),
       |seeds AS (
       |  SELECT ss, vec_id AS code, v AS cvec FROM sv
       |  WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT $PqK)),
       |d0 AS (
       |  SELECT s.ss, s.vec_id, c.code, s.v,
       |    ${pqDistSql("s.v", "c.cvec")} AS d
       |  FROM sv s JOIN seeds c USING (ss)),
       |a0 AS (
       |  SELECT ss, vec_id, code, v FROM (
       |    SELECT *, row_number() OVER (PARTITION BY ss, vec_id
       |      ORDER BY d, code) AS rk FROM d0) WHERE rk = 1),
       |comp AS (
       |  SELECT ss, code, i AS dim, sum(v[i]) AS sq, count(*) AS n
       |  FROM a0, unnest(range(1, len(v) + 1)) u(i)
       |  GROUP BY 1, 2, 3),
       |cb1 AS (
       |  SELECT ss, code,
       |    list(CAST(floor(CAST(sq AS DOUBLE) / n) AS BIGINT)
       |         ORDER BY dim) AS cvec
       |  FROM comp GROUP BY 1, 2),
       |d1 AS (
       |  SELECT s.ss, s.vec_id, c.code,
       |    ${pqDistSql("s.v", "c.cvec")} AS d
       |  FROM sv s JOIN cb1 c USING (ss)),
       |a1 AS (
       |  SELECT ss, vec_id, code, d FROM (
       |    SELECT *, row_number() OVER (PARTITION BY ss, vec_id
       |      ORDER BY d, code) AS rk FROM d1) WHERE rk = 1)""".stripMargin

  val q108Oracle: String =
    s"""WITH $pqTrainCtes
       |SELECT ss AS subspace, code,
       |  CAST(count(*) AS BIGINT) AS n_vectors,
       |  CAST(sum(d) AS BIGINT) AS sq_err
       |FROM a1 GROUP BY 1, 2""".stripMargin

  /** q109 — PQ's query path (ADC): encode the corpus as m codes per
    * vector, build each query's per-(subspace, code) integer distance
    * lookup table, rank neighbors by the summed table entries
    * ([[graft.operators.Pq.adcTopK]]). Distances are integers, so the
    * ranking — and the whole result — is hash-exact.
    */
  def q109PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    graft.operators.Pq.adcTopK(e, queriesOf(e), topK = 5, m = PqM, k = PqK)
  }

  val q109Oracle: String =
    s"""WITH $pqTrainCtes,
       |qe AS (
       |  SELECT vec_id AS query_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id < $QueryCutoff),
       |qsv AS (
       |  SELECT query_id, CAST(ss AS INT) AS ss,
       |    CASE WHEN ss = $PqM - 1
       |      THEN list_slice(q, ss * (len(q) // $PqM) + 1, len(q))
       |      ELSE list_slice(q, ss * (len(q) // $PqM) + 1,
       |                      (ss + 1) * (len(q) // $PqM)) END AS v
       |  FROM qe, range(0, $PqM) r(ss)),
       |lut AS (
       |  SELECT s.query_id, s.ss, c.code,
       |    ${pqDistSql("s.v", "c.cvec")} AS d
       |  FROM qsv s JOIN cb1 c USING (ss)),
       |sc AS (
       |  SELECT l.query_id, e2.vec_id, CAST(sum(l.d) AS BIGINT) AS ad
       |  FROM (SELECT ss, vec_id, code FROM a1) e2
       |  JOIN lut l ON e2.ss = l.ss AND e2.code = l.code
       |  WHERE e2.vec_id <> l.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, vec_id AS neighbor_id, ad AS adc_dist,
       |  CAST(rk AS INT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY ad, vec_id) AS rk FROM sc)
       |WHERE rk <= 5""".stripMargin

  /** q111 — random-projection (Johnson–Lindenstrauss) dimensionality
    * reduction with a neighborhood-preservation measurement: project
    * the integer-quantized 64-dim embeddings onto [[RpDims]] ±1
    * pseudo-random axes (sign = parity of an integer square hash —
    * no stored matrix, any engine can re-derive it), then report, per
    * query, how many of its true dot-product top-5 survive in the
    * reduced space. Everything is integer (quantized components,
    * exact ±1 sums, integer dot products), so the overlap counts are
    * hash-exact. The projection is a scan-parallel scalar transform;
    * both rankings run through the bounded-heap top-k operator.
    */
  private val RpDims = 16

  /** ±1 sign for (component i, output dim j) as inline SQL — shared
    * verbatim between the Spark expression and the DuckDB oracle.
    */
  private def rpSign(qi: String): String =
    s"CASE WHEN (((i * 131 + j * 31 + 7) * (i * 131 + j * 31 + 7)) % 1000003) % 2 = 0 THEN $qi ELSE -$qi END"

  def q111JlOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    def dotL(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, p) => acc + p)
    val e = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
    val red = e.select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        .as("q"))
      .withColumn("r", expr(
        s"""transform(sequence(0, ${RpDims - 1}), j ->
           |  aggregate(sequence(1, size(q)), CAST(0 AS BIGINT),
           |    (acc, i) -> acc + ${rpSign("element_at(q, i)")}))""".stripMargin))
      .transform(Materialize.once) // corpus side + query side
    val qs = broadcast(red.filter(col("vec_id") < QueryCutoff)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("r").as("qr")))
    val scored = red.crossJoin(qs)
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        dotL(col("q"), col("qq")).as("d0"),
        dotL(col("r"), col("qr")).as("d1"))
      .transform(Materialize.once) // two top-k consumers
    def top(ord: Column) = graft.plans.TopK
      .perGroup(scored, Seq(col("query_id")),
        Seq(ord.desc, col("vec_id").asc), 5, rankName = "rk")
      .select(col("query_id"), col("vec_id"))
    val overlap = top(col("d0")).join(top(col("d1")),
        Seq("query_id", "vec_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
    // left join from the query list: a query whose top-5 sets are
    // disjoint must still appear, with overlap 0
    qs.select(col("query_id")).join(overlap, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n"), lit(0L)).as("n_overlap"))
  }

  val q111Oracle: String =
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |red AS (
       |  SELECT vec_id, q,
       |    list_transform(range(0, $RpDims), j ->
       |      list_reduce(list_transform(range(1, len(q) + 1),
       |        i -> ${rpSign("q[i]")}), (x, y) -> x + y)) AS r
       |  FROM e),
       |qs AS (
       |  SELECT vec_id AS query_id, q AS qq, r AS qr FROM red
       |  WHERE vec_id < $QueryCutoff),
       |sc AS (
       |  SELECT s.query_id, c.vec_id,
       |    list_reduce(list_transform(range(1, len(c.q) + 1),
       |      i -> c.q[i] * s.qq[i]), (x, y) -> x + y) AS d0,
       |    list_reduce(list_transform(range(1, len(c.r) + 1),
       |      i -> c.r[i] * s.qr[i]), (x, y) -> x + y) AS d1
       |  FROM red c, qs s WHERE c.vec_id <> s.query_id),
       |t0 AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY d0 DESC, vec_id) AS rk FROM sc) WHERE rk <= 5),
       |t1 AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY d1 DESC, vec_id) AS rk FROM sc) WHERE rk <= 5),
       |ov AS (
       |  SELECT t0.query_id, CAST(count(*) AS BIGINT) AS n
       |  FROM t0 JOIN t1 ON t0.query_id = t1.query_id
       |                 AND t0.vec_id = t1.vec_id
       |  GROUP BY 1)
       |SELECT q.query_id, coalesce(ov.n, 0) AS n_overlap
       |FROM qs q LEFT JOIN ov ON q.query_id = ov.query_id""".stripMargin

  /** q123 — Rocchio nearest-centroid classification: per-label class
    * centroids (the q33/q108 integer-quantized mean — partition-order
    * independent, float-exact on both engines), every vector assigned
    * to its max-cosine centroid (ties → lowest label), confusion
    * matrix out. The label-propagation/classification primitive of an
    * embedding pipeline (e.g. quality-domain routing of documents by
    * a labeled seed set). Scale: centroids are a label-count-sized
    * broadcast; assignment is one map-side max_by pass — the corpus
    * never shuffles on anything but the final confusion aggregate.
    */
  def q123Rocchio(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
    val cent = e.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * 1e6).cast("long")).as("sq"),
        count(lit(1)).as("n"))
      .withColumn("c", ((col("sq") / col("n")) / lit(1e6)).cast("float"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cvec"))
      .withColumnRenamed("label", "clabel")
    e.crossJoin(broadcast(cent))
      .withColumn("ccos", Similarity.cosine(col("embedding"), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("label"), col("clabel")),
        struct(col("ccos"), -col("clabel"))).as("best"))
      .select(col("best.label").as("label"), col("best.clabel").as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
  }

  val q123Oracle: String =
    s"""WITH comp AS (
       |  SELECT label, i AS dim,
       |    sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
       |        AS BIGINT)) AS sq,
       |    count(*) AS n
       |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
       |  GROUP BY label, i),
       |cent AS (
       |  SELECT label AS clabel,
       |    list(CAST((sq / n) / 1000000.0 AS FLOAT) ORDER BY dim) AS cvec
       |  FROM comp GROUP BY label),
       |assigned AS (
       |  SELECT label, pred FROM (
       |    SELECT e.vec_id, e.label, c.clabel AS pred,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosSql("e.embedding", "c.cvec")} DESC, c.clabel) AS crank
       |    FROM embeddings e, cent c) WHERE crank = 1)
       |SELECT label, pred, CAST(count(*) AS BIGINT) AS n
       |FROM assigned GROUP BY label, pred""".stripMargin

  /** q126 — contrastive training-pair construction: for each query
    * vector, emit top-5 neighbors as POSITIVES, ranks 6–10 as HARD
    * NEGATIVES (the just-below-threshold band that makes contrastive
    * training work), and 3 deterministic RANDOM negatives drawn from
    * the remaining corpus by salted portable hash — the bottom-k
    * discipline of q73, so "random" is reproducible, partition-
    * independent, and oracle-replayable. This is the
    * (anchor, positive, negative) tuple builder for embedding-model
    * finetuning. Scale: queries broadcast everywhere; both rankings
    * run through the bounded-heap TopKPerGroup operator.
    */
  def q126TrainPairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash.{Mod, Shift}
    val e = Tables.load(spark, dir, "embeddings")
    val q = queriesOf(e)
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("query_vec")).as("cos"))
    val top10 = graft.plans.TopK.perGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("vec_id")), 10, rankName = "rank")
      .select(col("query_id"), col("vec_id"), col("rank"))
      // consumed by the role split AND the random-negative anti-join
      .transform(Materialize.once)
    val posHard = top10.select(col("query_id"), col("vec_id"),
      when(col("rank") <= 5, lit("positive"))
        .otherwise(lit("hard_negative")).as("role"),
      col("rank"))
    val hraw = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PortableStringHash(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          concat(col("query_id").cast("string"), lit(":"),
            col("vec_id").cast("string")))))
    val v = (hraw + lit(4L * Shift)) % lit(Mod)
    val cand = e.select(col("vec_id"))
      .crossJoin(broadcast(q.select(col("query_id"))))
      .filter(col("vec_id") =!= col("query_id"))
      .join(top10.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_anti")
      .withColumn("h", v * v % lit(Mod))
    val rnd = graft.plans.TopK.perGroup(cand, Seq(col("query_id")),
      Seq(col("h").asc, col("vec_id")), 3, rankName = "rank")
      .select(col("query_id"), col("vec_id"),
        lit("random_negative").as("role"), col("rank"))
    posHard.unionByName(rnd)
  }

  val q126Oracle: String = {
    import graft.functions.PortableHash.{Base, Mod, Shift}
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS query_vec
       |  FROM embeddings WHERE vec_id < $QueryCutoff),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |    ${cosSql("q.query_vec", "e.embedding")} AS cos
       |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored),
       |top10 AS (SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 10),
       |poshard AS (
       |  SELECT query_id, vec_id,
       |    CASE WHEN rank <= 5 THEN 'positive' ELSE 'hard_negative' END AS role,
       |    rank
       |  FROM top10),
       |cand AS (
       |  SELECT q.query_id, e.vec_id,
       |    CAST(q.query_id AS VARCHAR) || ':' || CAST(e.vec_id AS VARCHAR) AS s
       |  FROM (SELECT query_id FROM q) q, embeddings e
       |  WHERE e.vec_id <> q.query_id
       |    AND NOT EXISTS (SELECT 1 FROM top10 t
       |          WHERE t.query_id = q.query_id AND t.vec_id = e.vec_id)),
       |h AS (
       |  SELECT query_id, vec_id,
       |    ((list_reduce(list_transform(range(1, length(s)+1),
       |        i -> ascii(s[i])::BIGINT), (a, b) -> (a * $Base + b) % $Mod)
       |      + 4 * $Shift) % $Mod)
       |    * ((list_reduce(list_transform(range(1, length(s)+1),
       |        i -> ascii(s[i])::BIGINT), (a, b) -> (a * $Base + b) % $Mod)
       |      + 4 * $Shift) % $Mod) % $Mod AS h
       |  FROM cand),
       |rnd AS (
       |  SELECT query_id, vec_id, 'random_negative' AS role,
       |    row_number() OVER (PARTITION BY query_id ORDER BY h, vec_id) AS rank
       |  FROM h)
       |SELECT query_id, vec_id, role, rank FROM poshard
       |UNION ALL
       |SELECT query_id, vec_id, role, rank FROM rnd WHERE rank <= 3""".stripMargin
  }

  /** Power-iteration round count, shared by the Spark loop and the
    * unrolled oracle CTEs so the two can never drift apart.
    */
  private val PowerRounds = 4

  /** q139 — distributed power iteration: the top principal direction
    * of the embedding second-moment matrix EᵀE, the spectral profile a
    * pipeline reads before whitening, rank-truncation, or drift checks
    * (a collapsing top direction = embeddings degenerating toward a
    * line). Each round is two matrix-free products over the exploded
    * (vec_id, dim, value) frame: dot_i = q_i·x (one vec-keyed
    * aggregate), y = Σ dot_i·q_i (one dim-keyed aggregate), then an
    * integer renormalization x ← sign(y)·(|y|·10⁴ div max|y|). All
    * quantities are quantized longs — q at 10⁻⁴, dots damped by
    * div 10⁵ before the second product — chosen so every intermediate
    * fits i64 at sf=1 corpus counts (≤3.2·10¹⁸ worst case) and both
    * engines replay the arithmetic bit-for-bit (div truncates toward
    * zero in both). Division by |y| only ever sees non-negative
    * operands; sign is reapplied explicitly.
    *
    * Scale shape: the exploded frame is (corpus × dim) rows
    * materialized once; per round, one shuffle keyed by vec_id and one
    * keyed by dim; x (dim-sized) broadcasts into the first product and
    * the max-|y| scalar broadcasts into the renorm — the same
    * materialized-loop discipline as connected components. Lanczos
    * would converge faster; power iteration is the deterministic,
    * oracle-replayable baseline.
    */
  def q139PowerIter(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v0")))
      .select(col("vec_id"), (col("i") + 1).as("j"),
        expr("CAST(round(CAST(v0 AS DOUBLE) * 10000) AS BIGINT)").as("v"))
      // re-read by both products in every round
      .transform(Materialize.once)
    var x = m.select(col("j")).distinct().withColumn("x", lit(10000L))
    for (_ <- 1 to PowerRounds) {
      val d = m.join(broadcast(x), Seq("j"))
        .groupBy(col("vec_id"))
        .agg(expr("sum(v * x) div 100000").as("dp"))
      val y = m.join(d, Seq("vec_id"))
        .groupBy(col("j"))
        .agg(sum(col("dp") * col("v")).as("y"))
      val mx = y.agg(max(abs(col("y"))).as("mx"))
      x = y.crossJoin(broadcast(mx))
        .select(col("j"),
          (when(col("y") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr("(abs(y) * 10000L) div mx")).as("x"))
        .transform(Materialize.once)
    }
    x.select(col("j").cast("long").as("dim"), col("x").as("component"))
  }

  val q139Oracle: String = {
    val rounds = (1 to PowerRounds).map { r =>
      s"""d$r AS (
         |  SELECT m.vec_id, sum(m.v * x.x) // 100000 AS dp
         |  FROM m JOIN x${r - 1} x ON x.j = m.j GROUP BY m.vec_id),
         |y$r AS (
         |  SELECT m.j, CAST(sum(d.dp * m.v) AS BIGINT) AS y
         |  FROM m JOIN d$r d ON d.vec_id = m.vec_id GROUP BY m.j),
         |n$r AS (SELECT max(abs(y)) AS mx FROM y$r),
         |x$r AS (
         |  SELECT j, (CASE WHEN y < 0 THEN -1 ELSE 1 END)
         |    * ((abs(y) * 10000) // mx) AS x
         |  FROM y$r, n$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |m AS (
       |  SELECT vec_id, i AS j, q[i] AS v
       |  FROM q, unnest(range(1, len(q) + 1)) u(i)),
       |x0 AS (
       |  SELECT DISTINCT j, CAST(10000 AS BIGINT) AS x FROM m),
       |$rounds
       |SELECT CAST(j AS BIGINT) AS dim, CAST(x AS BIGINT) AS component
       |FROM x$PowerRounds""".stripMargin
  }

  /** q140 — per-dimension robust distribution profile: exact discrete
    * quartiles (lower-of-the-two, replayed as row_number positions so
    * neither engine's quantile interpolation is in play) and IQR of
    * each embedding dimension, quantized at 10⁻⁴ — the table a
    * whitening / robust-scaling step is configured from, and the drift
    * monitor a pipeline diffs between corpus snapshots (a dimension
    * whose IQR collapses has died; one whose median walks is drifting).
    *
    * Scale shape: one exchange keyed by dimension; the rank window and
    * the count ride that partitioning; dims × 3 probe rows join back
    * on (dim, rank). Output is dimension-sized.
    */
  def q140DimStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(posexplode(col("embedding")).as(Seq("i", "v0")))
      .select((col("i") + 1).cast("long").as("dim"),
        expr("CAST(round(CAST(v0 AS DOUBLE) * 10000) AS BIGINT)").as("v"))
    val ranked = m
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("dim")).orderBy(col("v"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("dim"))))
      // consumed by all three quartile probes
      .transform(Materialize.once)
    val probes = ranked
      .filter(col("rk") === expr("((n - 1) * 25) div 100 + 1") ||
        col("rk") === expr("((n - 1) * 50) div 100 + 1") ||
        col("rk") === expr("((n - 1) * 75) div 100 + 1"))
      .select(col("dim"), col("n"), col("rk"), col("v"))
    probes
      .groupBy(col("dim"), col("n"))
      .agg(
        min(when(col("rk") === expr("((n - 1) * 25) div 100 + 1"), col("v")))
          .as("q25"),
        min(when(col("rk") === expr("((n - 1) * 50) div 100 + 1"), col("v")))
          .as("q50"),
        min(when(col("rk") === expr("((n - 1) * 75) div 100 + 1"), col("v")))
          .as("q75"))
      .withColumn("iqr", col("q75") - col("q25"))
  }

  val q140Oracle: String =
    """WITH m AS (
      |  SELECT i AS dim,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
      |  WHERE embedding IS NOT NULL),
      |r AS (
      |  SELECT dim, v,
      |    row_number() OVER (PARTITION BY dim ORDER BY v) AS rk,
      |    count(*) OVER (PARTITION BY dim) AS n
      |  FROM m)
      |SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
      |  min(CASE WHEN rk = ((n - 1) * 25) // 100 + 1 THEN v END) AS q25,
      |  min(CASE WHEN rk = ((n - 1) * 50) // 100 + 1 THEN v END) AS q50,
      |  min(CASE WHEN rk = ((n - 1) * 75) // 100 + 1 THEN v END) AS q75,
      |  min(CASE WHEN rk = ((n - 1) * 75) // 100 + 1 THEN v END)
      |    - min(CASE WHEN rk = ((n - 1) * 25) // 100 + 1 THEN v END) AS iqr
      |FROM r
      |WHERE rk = ((n - 1) * 25) // 100 + 1
      |   OR rk = ((n - 1) * 50) // 100 + 1
      |   OR rk = ((n - 1) * 75) // 100 + 1
      |GROUP BY dim, n""".stripMargin

  /** q166 — the composed IVF-PQ index ([[graft.operators.Pq.ivfpqTopK]]):
    * coarse cells + residual PQ codes + probed ADC search, the layout
    * billion-scale ANN deploys. All-integer (quantized components,
    * integer L2², floor-mean Lloyd), so the oracle replays the ENTIRE
    * chain — coarse assign, residuals, codebook training, encoding,
    * probing, LUT scoring — hash-exact.
    */
  def q166Ivfpq(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    graft.operators.Pq.ivfpqTopK(e, queriesOf(e), topK = 5,
      nlist = IvfpqNlist, m = IvfpqM, k = IvfpqK, nprobe = IvfpqNprobe)
  }

  private val IvfpqNlist = 8
  private val IvfpqM = 2
  private val IvfpqK = 4
  private val IvfpqNprobe = 2

  val q166Oracle: String = {
    val qz = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
    def split(src: String, vec: String) =
      s"""SELECT *, CAST(t.ss AS INT) AS sss,
         |    CASE WHEN t.ss = $IvfpqM - 1
         |      THEN list_slice($vec, t.ss * (len($vec) // $IvfpqM) + 1, len($vec))
         |      ELSE list_slice($vec, t.ss * (len($vec) // $IvfpqM) + 1,
         |                      (t.ss + 1) * (len($vec) // $IvfpqM)) END AS vv
         |  FROM $src, range(0, $IvfpqM) t(ss)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, $qz AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |cents AS (
       |  SELECT vec_id AS cid, q AS cq FROM e ORDER BY vec_id LIMIT $IvfpqNlist),
       |ca AS (
       |  SELECT vec_id, cid,
       |    list_transform(range(1, len(q) + 1), i -> q[i] - cq[i]) AS r
       |  FROM (
       |    SELECT e.vec_id, c.cid, e.q, c.cq,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${pqDistSql("e.q", "c.cq")}, c.cid) AS rk
       |    FROM e, cents c) WHERE rk = 1),
       |sv AS (
       |  SELECT vec_id, sss AS ss, vv AS v FROM (${split("ca", "r")})),
       |seeds AS (
       |  SELECT ss, vec_id AS code, v AS cvec FROM sv
       |  WHERE vec_id IN (SELECT vec_id FROM ca ORDER BY vec_id LIMIT $IvfpqK)),
       |d0 AS (
       |  SELECT s.ss, s.vec_id, c.code, s.v, ${pqDistSql("s.v", "c.cvec")} AS d
       |  FROM sv s JOIN seeds c USING (ss)),
       |a0 AS (
       |  SELECT ss, vec_id, code, v FROM (
       |    SELECT *, row_number() OVER (PARTITION BY ss, vec_id
       |      ORDER BY d, code) AS rk FROM d0) WHERE rk = 1),
       |comp AS (
       |  SELECT ss, code, i AS dim, sum(v[i]) AS sq, count(*) AS n
       |  FROM a0, unnest(range(1, len(v) + 1)) u(i) GROUP BY 1, 2, 3),
       |cb1 AS (
       |  SELECT ss, code,
       |    list(CAST(floor(CAST(sq AS DOUBLE) / n) AS BIGINT)
       |         ORDER BY dim) AS cvec
       |  FROM comp GROUP BY 1, 2),
       |d1 AS (
       |  SELECT s.ss, s.vec_id, c.code, ${pqDistSql("s.v", "c.cvec")} AS d
       |  FROM sv s JOIN cb1 c USING (ss)),
       |a1 AS (
       |  SELECT ss, vec_id, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY ss, vec_id
       |      ORDER BY d, code) AS rk FROM d1) WHERE rk = 1),
       |enc AS (
       |  SELECT a1.ss, a1.vec_id, a1.code, ca.cid FROM a1 JOIN ca USING (vec_id)),
       |qe AS (
       |  SELECT vec_id AS query_id, $qz AS qq
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id < $QueryCutoff),
       |qp AS (
       |  SELECT query_id, cid,
       |    list_transform(range(1, len(qq) + 1), i -> qq[i] - cq[i]) AS qr
       |  FROM (
       |    SELECT q.query_id, c.cid, q.qq, c.cq,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        ${pqDistSql("q.qq", "c.cq")}, c.cid) AS rk
       |    FROM qe q, cents c) WHERE rk <= $IvfpqNprobe),
       |qsv AS (
       |  SELECT query_id, cid, sss AS ss, vv AS v FROM (${split("qp", "qr")})),
       |lut AS (
       |  SELECT s.query_id, s.cid, s.ss, c.code, ${pqDistSql("s.v", "c.cvec")} AS d
       |  FROM qsv s JOIN cb1 c USING (ss)),
       |sc AS (
       |  SELECT l.query_id, e2.vec_id, CAST(sum(l.d) AS BIGINT) AS ad
       |  FROM enc e2
       |  JOIN lut l ON e2.cid = l.cid AND e2.ss = l.ss AND e2.code = l.code
       |  WHERE e2.vec_id <> l.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, vec_id AS neighbor_id, ad AS adc_dist,
       |  CAST(rk AS INT) AS rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY ad, vec_id) AS rk FROM sc)
       |WHERE rk <= 5""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_knn_brute" -> (q24KnnBrute _),
    "q25_ann_lsh" -> (q25AnnLsh _),
    "q26_sign_bucket_pairs" -> (q26SignBucketPairs _),
    "q33_ivf_ann" -> (q33IvfAnn _),
    "q108_pq_codebook" -> (q108PqCodebook _),
    "q109_pq_adc" -> (q109PqAdc _),
    "q111_jl_overlap" -> (q111JlOverlap _),
    "q123_rocchio" -> (q123Rocchio _),
    "q126_train_pairs" -> (q126TrainPairs _),
    "q139_power_iter" -> (q139PowerIter _),
    "q140_dim_stats" -> (q140DimStats _),
    "q166_ivfpq" -> (q166Ivfpq _))

  val oracles: Map[String, String] = Map(
    "q24_knn_brute" -> q24Oracle,
    "q25_ann_lsh" -> q25Oracle,
    "q26_sign_bucket_pairs" -> q26Oracle,
    "q33_ivf_ann" -> q33Oracle,
    "q108_pq_codebook" -> q108Oracle,
    "q109_pq_adc" -> q109Oracle,
    "q111_jl_overlap" -> q111Oracle,
    "q123_rocchio" -> q123Oracle,
    "q126_train_pairs" -> q126Oracle,
    "q139_power_iter" -> q139Oracle,
    "q140_dim_stats" -> q140Oracle,
    "q166_ivfpq" -> q166Oracle)
}
