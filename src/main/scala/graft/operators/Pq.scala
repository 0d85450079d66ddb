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

  /** The shared float→integer quantization: floor(x·10⁶) as a long —
    * the exact, engine-replayable component space every PQ distance
    * lives in.
    */
  private def quantized(vecCol: String): Column = expr(
    s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")

  /** Split an already-quantized long-array column into m subspace rows
    * (id, [extra...], ss, v); the last subspace takes the remainder
    * when dim % m != 0 (width = floor(dim / m)).
    */
  private def splitQuantized(df: DataFrame, idCol: String, qCol: String,
                             m: Int, extra: Seq[String] = Nil): DataFrame = {
    val parts = (0 until m).map { s =>
      val len = if (s == m - 1) s"size($qCol) - $s * wdt" else "wdt"
      s"struct($s AS ss, slice($qCol, $s * wdt + 1, $len) AS v)"
    }
    df.withColumn("wdt", expr(s"CAST(floor(size($qCol) / $m) AS INT)"))
      .select(col(idCol).as("id") +: extra.map(col) :+
        explode(expr(s"array(${parts.mkString(", ")})")).as("p"): _*)
      .select(col("id") +: extra.map(col) :+ col("p.ss").as("ss") :+
        col("p.v").as("v"): _*)
  }

  /** Quantize a float-vector frame and split it into m subspace rows
    * (id, ss, v).
    */
  private def subspaceRows(df: DataFrame, idCol: String, vecCol: String,
                           m: Int): DataFrame =
    splitQuantized(
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).as("id"), quantized(vecCol).as("q")),
      "id", "q", m)

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

  /** The composed IVF-PQ index (Jégou TPAMI'11 §V, the FAISS IVFPQ
    * layout — the shape billion-scale ANN actually deploys): a coarse
    * quantizer of `nlist` cells partitions the corpus; each vector's
    * RESIDUAL from its cell centroid is PQ-encoded (m codes from one
    * shared k-code residual codebook, one Lloyd round); a query probes
    * its `nprobe` nearest cells and ranks ONLY their members by
    * asymmetric distance between its per-cell residual and the codes.
    *
    * All arithmetic happens in the quantized integer space (components
    * floor(x·10⁶), integer L2², floor-divided Lloyd means), so results
    * are exact and engine-replayable. Cell assignment and probing use
    * integer L2 — the metric PQ distances live in — not cosine.
    *
    * Scale shape: the coarse pass is a broadcast nlist-row join +
    * max_by collapse; residual/codebook passes mirror [[adcTopK]]
    * (broadcast m×k codebooks); the search join keys on (cell,
    * subspace, code) against the broadcast per-query LUT, so scan work
    * is bounded by the probed cells' postings — never the corpus — and
    * the encoded index carries m small codes per vector, the
    * compression that lets 100 TB of raw vectors fit a cluster's disks.
    */
  def ivfpqTopK(embeddings: DataFrame, queries: DataFrame, topK: Int,
                nlist: Int, m: Int, k: Int, nprobe: Int): DataFrame = {
    val e = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"), quantized("embedding").as("q"))
      .transform(Materialize.once) // seeds + assignment share one scan
    val cents = broadcast(e.orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id").as("cid"), col("q").as("cq")))
    // nearest cell by integer L2 (tie → lowest cid), then the residual
    val assigned = e.crossJoin(cents)
      .withColumn("cd", dist2(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("cq"), col("q")),
        struct(-col("cd"), -col("cid"))).as("b"))
      .select(col("vec_id"), col("b.cid").as("cid"),
        zip_with(col("b.q"), col("b.cq"), (x, c) => x - c).as("r"))
      .transform(Materialize.once) // PQ train + encode + cid join-back
    val subs = splitQuantized(assigned, "vec_id", "r", m)
      .transform(Materialize.once)
    val seedIds = assigned.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("sid"))
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
    val encoded = assign(subs, cb1)
      .select(col("ss"), col("id").as("vec_id"), col("code"))
      .join(assigned.select(col("vec_id"), col("cid")), "vec_id")
    val qe = queries.filter(col("query_vec").isNotNull)
      .select(col("query_id"), quantized("query_vec").as("qq"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cd"), col("cid"))
    val probed = qe.crossJoin(cents)
      .withColumn("cd", dist2(col("qq"), col("cq")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cid"),
        zip_with(col("qq"), col("cq"), (x, c) => x - c).as("qr"))
    val lut = broadcast(
      splitQuantized(probed, "query_id", "qr", m, extra = Seq("cid"))
        .join(cb1, Seq("ss"))
        .select(col("id").as("query_id"), col("cid"), col("ss"),
          col("code"), dist2(col("v"), col("cvec")).as("d")))
    val scored = encoded.join(lut, Seq("cid", "ss", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("ad"))
    graft.plans.TopK.perGroup(scored, Seq(col("query_id")),
      Seq(col("ad").asc, col("vec_id").asc), topK, rankName = "rank")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("ad").as("adc_dist"), col("rank"))
  }
}
