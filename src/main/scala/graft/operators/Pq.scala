package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.runtime.Materialize

/** Product-quantization codebook training + ADC search (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
  * the compression backbone of billion-scale ANN indexes: split each
  * vector into `m` subvectors, train an independent k-centroid
  * codebook per subspace, encode every vector as its m nearest codes,
  * and answer queries by summing per-subspace lookup-table distances
  * against the codes (asymmetric distance computation) instead of
  * touching raw vectors.
  *
  * Everything is computed in INTEGER space so the result is exact and
  * engine-replayable: components quantize to floor(x·10⁶) longs up
  * front, distances are integer sums of squared differences (order-
  * free), centroid means floor-divide the exact component sums, and
  * ADC scores are sums of integer table entries. No float accumulates
  * anywhere.
  *
  * Scale shape: the subspace table is (m × corpus) rows but each row
  * carries only dim/m components — same bytes as the corpus. Both
  * assignment passes are broadcast joins against the (m × k)-row
  * codebook followed by a max_by partial aggregate (map-side
  * collapse, no window sort); the Lloyd mean is a (m × k × dim/m)-
  * group aggregate. ADC search joins the (|Q| × m × k)-row broadcast
  * lookup table against the m-codes-per-vector encoded corpus — the
  * classic table-scan formulation, never a raw-vector product.
  */
object Pq {
  /** Integer L2² distance between two quantized subvectors — a fixed
    * ascending fold of exact longs, identical in any engine.
    */
  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** Quantize a float-vector frame and split it into m subspace rows
    * (id, ss, v); the last subspace takes the remainder when
    * dim % m != 0 (width = floor(dim / m)).
    */
  private def subspaceRows(df: DataFrame, idCol: String, vecCol: String,
                           m: Int): DataFrame = {
    val parts = (0 until m).map { s =>
      val len = if (s == m - 1) s"size(q) - $s * wdt" else "wdt"
      s"struct($s AS ss, slice(q, $s * wdt + 1, $len) AS v)"
    }
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), expr(
        s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        .as("q"))
      .withColumn("wdt", expr(s"CAST(floor(size(q) / $m) AS INT)"))
      .select(col("id"),
        explode(expr(s"array(${parts.mkString(", ")})")).as("p"))
      .select(col("id"), col("p.ss").as("ss"), col("p.v").as("v"))
  }

  /** Nearest code per (subspace, id): broadcast join + max_by
    * collapse; tie-break min distance then min code, matching the SQL
    * row_number() ORDER BY d, code replay.
    */
  private def assign(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(cb, Seq("ss"))
      .withColumn("d", dist2(col("v"), col("cvec")))
      .groupBy(col("ss"), col("id"))
      .agg(max_by(struct(col("code"), col("v"), col("d")),
        struct(-col("d"), -col("code"))).as("best"))
      .select(col("ss"), col("id"), col("best.code").as("code"),
        col("best.v").as("v"), col("best.d").as("d"))

  /** Seed (k lowest vec_ids, code = seeding vec_id — the IVF
    * convention) and run one Lloyd round of exact integer component
    * sums, floor-divided. Returns (materialized subspace rows,
    * broadcast refined codebook).
    */
  private def train(embeddings: DataFrame, m: Int,
                    k: Int): (DataFrame, DataFrame) = {
    val subs = subspaceRows(embeddings, "vec_id", "embedding", m)
      .transform(Materialize.once) // seeds + two assignment passes
    val seedIds = embeddings.filter(col("embedding").isNotNull)
      .orderBy(col("vec_id")).limit(k).select(col("vec_id").as("sid"))
    val cb0 = broadcast(
      subs.join(broadcast(seedIds), subs("id") === seedIds("sid"))
        .select(col("ss"), col("id").as("code"), col("v").as("cvec")))
    val cb1 = broadcast(assign(subs, cb0)
      .select(col("ss"), col("code"), posexplode(col("v")))
      .groupBy(col("ss"), col("code"), col("pos"))
      .agg(sum(col("col")).as("sq"), count(lit(1)).as("n"))
      .withColumn("c", floor(col("sq") / col("n")).cast("long"))
      .groupBy(col("ss"), col("code"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cvec")))
    (subs, cb1)
  }

  /** Train and report the codebook's cells: (subspace int, code long,
    * n_vectors long, sq_err long), one row per non-empty cell after
    * the refined assignment; sq_err is the cell's total integer
    * squared quantization error.
    */
  def codebookStats(embeddings: DataFrame, m: Int, k: Int): DataFrame = {
    val (subs, cb1) = train(embeddings, m, k)
    assign(subs, cb1)
      .groupBy(col("ss"), col("code"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d")).as("sq_err"))
      .select(col("ss").cast("int").as("subspace"), col("code"),
        col("n_vectors"), col("sq_err"))
  }

  /** PQ's query path: encode the corpus as m codes per vector, build
    * each query's per-(subspace, code) distance lookup table, and
    * rank neighbors by the SUM of table entries — the asymmetric
    * distance. Expects queries(query_id, query_vec); returns
    * (query_id, neighbor_id, adc_dist, rank), top `topK` per query by
    * (distance asc, neighbor_id).
    */
  def adcTopK(embeddings: DataFrame, queries: DataFrame, topK: Int,
              m: Int, k: Int): DataFrame = {
    val (subs, cb1) = train(embeddings, m, k)
    val encoded = assign(subs, cb1)
      .select(col("ss"), col("id").as("vec_id"), col("code"))
    val lut = broadcast(
      subspaceRows(queries, "query_id", "query_vec", m)
        .join(cb1, Seq("ss"))
        .select(col("id").as("query_id"), col("ss"), col("code"),
          dist2(col("v"), col("cvec")).as("d")))
    val scored = encoded.join(lut, Seq("ss", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("ad"))
    // rank through the bounded-heap TopKPerGroup operator — O(topK)
    // memory per query, no full per-partition sort
    graft.plans.TopK.perGroup(scored, Seq(col("query_id")),
      Seq(col("ad").asc, col("vec_id").asc), topK, rankName = "rank")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("ad").as("adc_dist"), col("rank"))
  }
}
