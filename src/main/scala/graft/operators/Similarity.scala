package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a multi-table
  * random-hyperplane LSH variant as the 100 TB scale path.
  *
  * Scale design: brute force broadcasts only the (small) query set, so
  * the corpus side streams through one scan with no shuffle before the
  * per-query top-k; the LSH path joins on (table, bucket) keys so work
  * is proportional to bucket collisions. Hyperplanes are derived from
  * xxhash64(table, bit, dim) signs — deterministic, no stored model, the
  * same planes on every executor without any broadcast of plane data.
  */
object Similarity {

  /** Cosine similarity via the native codegen'd expression. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CosineSimilarity(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Reference formulation with higher-order built-ins — same fold
    * order, bit-identical results; kept for oracle parity and as the
    * baseline the custom expression is benched against.
    */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, p) => acc + p)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query vector: broadcast the queries,
    * score every (query, corpus) pair, keep k by (cos desc, id) with a
    * deterministic tie-break. Ranking runs through the bounded-heap
    * [[graft.plans.TopKPerGroup]] operator — O(k) memory per query
    * instead of WindowExec's full per-partition sort+buffer.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("query_vec"), col("embedding")).as("cos"))
    graft.plans.TopK.perGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("neighbor_id").asc), k, rankName = "rank")
  }

  /** Multi-table random-hyperplane signatures: `tables` independent
    * `bits`-bit sign signatures. Plane component for (table t, bit p,
    * dim i) is ±1 by the low bit of xxhash(t, p, i); the signature bit
    * is the sign of the projected dot product. Returns an array of
    * `tables` bucket keys. Fused custom expression
    * (graft.functions.HyperplaneBuckets) — the HOF formulation of the
    * same math runs interpreted and pays tables×bits×dims lambda
    * dispatches per row.
    */
  def annBuckets(vec: Column, tables: Int, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HyperplaneBuckets(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec), tables, bits))

  /** SQL-portable variant of [[annBuckets]]: plane signs come from the
    * parity-of-square integer hash instead of xxhash, and projections
    * accumulate left-to-right in doubles — exactly what a SQL oracle's
    * list_reduce replays, so ANN bucketing is independently checkable.
    */
  def portableAnnBuckets(vec: Column, tables: Int, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PortableHyperplaneBuckets(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec), tables, bits))

  /** ANN top-k: candidates = corpus vectors sharing ≥1 (table, bucket)
    * with the query, exact-cosine reranked. Recall is tunable via
    * tables × bits; misses are possible by construction (that is the
    * accuracy/cost trade the scale path buys).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 8, bits: Int = 8,
              buckets: (Column, Int, Int) => Column = annBuckets): DataFrame = {
    // outer: a plain posexplode implies size(..)>0, which gets pushed
    // below the scan's partitioning and re-inlines the bucket
    // computation per-row in a filter (see Dedup.lshCandidatePairs).
    def explodeBuckets(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.select(col(idCol), col(vecCol),
          posexplode_outer(buckets(col(vecCol), tables, bits))
            .as(Seq("tbl", "bucket")))
    val c = explodeBuckets(corpus, "vec_id", "embedding")
    val q = explodeBuckets(queries, "query_id", "query_vec")
    val candidates = q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("query_vec"),
        col("vec_id").as("neighbor_id"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .withColumn("cos", cosine(col("query_vec"), col("embedding")))
    graft.plans.TopK.perGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("neighbor_id").asc), k, rankName = "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** IVF-style ANN (the inverted-file index shape, à la FAISS IVF-Flat):
    * partition the corpus into `nlist` cells around centroid vectors,
    * probe only each query's `nprobe` nearest cells, exact-cosine rerank
    * within them. Centroids are seeded deterministically (the lowest
    * `nlist` vec_ids) and optionally tightened by `refine` Lloyd
    * rounds ([[refineCentroids]] — deterministic, SQL-replayable); at
    * real scale you would train more k-means rounds offline and
    * broadcast the result — the query-time plan is identical either
    * way.
    *
    * Scale design: centroids are broadcast (nlist rows), so both
    * assignment and probing are one scan + broadcast join with no
    * all-pairs product; the rerank join keys on cell id, so work is
    * proportional to probed-cell sizes — n/nlist × nprobe per query in
    * expectation, not n. Cell assignment is a `max_by` partial
    * aggregate, not a window: the crossJoin against broadcast centroids
    * keeps all nlist candidates of a vector in its partition, so the
    * map-side combine collapses them to one row BEFORE the shuffle and
    * nothing is sorted (a row_number window ships all n×nlist rows and
    * sorts every partition). Tie-break matches the window formulation:
    * highest cos, then lowest cid, via struct ordering on (ccos, -cid).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 2, refine: Int = 0): DataFrame = {
    // null embeddings are excluded from the index EXPLICITLY: they have
    // no cosine to any centroid, so the max_by assignment would drop
    // them silently (null ordering keys are skipped) — make the
    // contract visible rather than an aggregate artifact
    val indexable = corpus.filter(col("embedding").isNotNull)
    // seed = the nlist lowest vec_ids, whatever the id space looks like
    // (a bare `vec_id < nlist` would yield few or zero centroids on
    // sparse or offset id spaces)
    val seeded = broadcast(indexable.orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
    val centroids = (1 to refine).foldLeft(seeded)((c, _) =>
      broadcast(refineCentroids(indexable, c)))
    val assigned = assignCells(indexable, centroids)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probed = queries.crossJoin(centroids)
      .withColumn("ccos", cosine(col("query_vec"), col("cvec")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nprobe)
      .select(col("cid"), col("query_id"), col("query_vec"))
    val reranked = probed.join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("query_vec"), col("embedding")).as("cos"))
    graft.plans.TopK.perGroup(reranked, Seq(col("query_id")),
      Seq(col("cos").desc, col("neighbor_id").asc), k, rankName = "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Cell assignment against broadcast centroids — a `max_by` partial
    * aggregate, not a window (see [[ivfTopK]]'s scale note); the
    * tie-break matches the window formulation: highest cos, then
    * lowest cid, via struct ordering on (ccos, -cid).
    */
  private def assignCells(indexable: DataFrame,
                          centroids: DataFrame): DataFrame =
    indexable.crossJoin(centroids)
      .withColumn("ccos", cosine(col("embedding"), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("cid"), col("embedding")),
        struct(col("ccos"), -col("cid"))).as("best"))
      .select(col("best.cid").as("cid"), col("vec_id"),
        col("best.embedding").as("embedding"))

  /** One Lloyd (k-means) refinement round: assign every vector to its
    * nearest centroid, replace each centroid with its cell's
    * component-wise mean. The mean is computed over INTEGER-quantized
    * components (floor(x·10⁶), summed exactly as longs) and the
    * double-divided result is cast back to float — so the new
    * centroid is independent of partitioning and float-summation
    * order, bit-replayable in SQL, and exactly representable on both
    * engines. Deliberately one-round-at-a-time: IVF index builds run
    * a fixed small number of Lloyd rounds offline; each round here is
    * one broadcast-join assignment + one (cell × dim)-scale aggregate,
    * never an all-pairs product.
    */
  def refineCentroids(indexable: DataFrame,
                      centroids: DataFrame): DataFrame =
    assignCells(indexable, centroids)
      .select(col("cid"), posexplode(col("embedding")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * 1e6).cast("long")).as("sq"),
        count(lit(1)).as("n"))
      .withColumn("c", ((col("sq") / col("n")) / lit(1e6)).cast("float"))
      .groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cvec"))

  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup scoped
    * to k-means cells — cluster the embedding space, then drop every
    * vector that has a near-duplicate (cos ≥ minCos) with a LOWER
    * vec_id in the SAME cell (the keep-first discipline of q20, lifted
    * to embedding space). Complements [[signBucketNearPairs]]: sign
    * buckets partition by fixed hyperplanes, cells follow the data.
    *
    * Scale shape: centroids are broadcast (nlist rows), assignment is
    * a map-side max_by, and the pair search is a CELL-KEYED self-join
    * — never all-pairs over the corpus; cell population is controlled
    * by nlist (at 100 TB you size nlist so cells fit the
    * sub-quadratic budget, exactly like the paper's per-cluster
    * pairwise pass).
    *
    * Output: (vec_id, cid, kept) for every indexable vector.
    */
  def semDedup(embeddings: DataFrame, nlist: Int = 16,
               minCos: Double = 0.25): DataFrame = {
    val indexable = embeddings.filter(col("embedding").isNotNull)
    val seeded = broadcast(indexable.orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
    val cent = broadcast(refineCentroids(indexable, seeded))
    val cells = graft.runtime.Materialize.once(
      assignCells(indexable, cent)) // pair self-join (2×) + final join
    val dropped = cells
      .select(col("cid"), col("vec_id").as("id1"), col("embedding").as("v1"))
      .join(cells.select(col("cid"), col("vec_id").as("id2"),
        col("embedding").as("v2")), Seq("cid"))
      .filter(col("id1") < col("id2"))
      .filter(cosine(col("v1"), col("v2")) >= minCos)
      .select(col("id2").as("vec_id")).distinct()
    cells.join(dropped.withColumn("d", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        when(col("d").isNull, 1).otherwise(0).cast("int").as("kept"))
  }

  /** SQL-portable sign bucket over the first `bits` dimensions
    * (axis-aligned hyperplane LSH): expressible identically in any SQL
    * engine, so bucketed near-dup queries stay oracle-checkable.
    */
  def signBucket(vec: Column, bits: Int): Column =
    (0 until bits).map { i =>
      // try_element_at: a vector shorter than `bits` contributes 0 for
      // the missing dims (NULL > 0 is NULL → otherwise-branch), exactly
      // like SQL engines' out-of-bounds list index — plain element_at
      // would THROW under Spark 4 ANSI mode and diverge from the oracle
      when(try_element_at(vec, lit(i + 1)) > 0f, lit(1 << (bits - 1 - i)))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Near-similar pairs inside sign buckets: bucketed self-join (never
    * an all-pairs product), id1 < id2, exact cosine ≥ minCos. Shared by
    * the pair-mining and dedup queries so bucketing/threshold semantics
    * live in one place. Output: (bucket, id1, id2).
    */
  def signBucketNearPairs(embeddings: DataFrame, bits: Int,
                          minCos: Double): DataFrame = {
    val e = embeddings.withColumn("bucket", signBucket(col("embedding"), bits))
    val a = e.select(col("bucket"), col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = e.select(col("bucket"), col("vec_id").as("id2"), col("embedding").as("v2"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .filter(cosine(col("v1"), col("v2")) >= minCos)
      .select(col("bucket"), col("id1"), col("id2"))
  }

  /** The same bucket as DuckDB SQL text (for oracle generation). */
  def signBucketSql(vecExpr: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(CASE WHEN $vecExpr[${i + 1}] > 0 THEN ${1 << (bits - 1 - i)} ELSE 0 END)"
    }.mkString(" + ")
}
