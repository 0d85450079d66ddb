package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.runtime.Materialize

/** Product-quantization codebook training (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * compression backbone of billion-scale ANN indexes: split each
  * vector into `m` subvectors, train an independent k-centroid
  * codebook per subspace, and encode every vector as its m nearest
  * codes. This operator trains the codebooks (seed → one Lloyd round,
  * the [[Similarity.refineCentroids]] discipline) and reports the
  * resulting cells and quantization error.
  *
  * Everything is computed in INTEGER space so the result is exact and
  * engine-replayable: components quantize to floor(x·10⁶) longs up
  * front, distances are integer sums of squared differences (order-
  * free), centroid means floor-divide the exact component sums, and
  * the reported per-cell error is a sum of integer distances. No
  * float accumulates anywhere.
  *
  * Scale shape: the subspace table is (m × corpus) rows but each row
  * carries only dim/m components — same bytes as the corpus. Both
  * assignment passes are broadcast joins against the (m × k)-row
  * codebook followed by a max_by partial aggregate (map-side
  * collapse, no window sort); the Lloyd mean is a (m × k × dim/m)-
  * group aggregate. Nothing is ever all-pairs.
  *
  * Input: embeddings(vec_id: long, embedding: array<float>).
  * Output: (subspace int, code long, n_vectors long, sq_err long) —
  * one row per non-empty cell after the refined assignment; `code` is
  * the seeding vector's vec_id, sq_err the cell's total integer
  * squared quantization error.
  */
object Pq {
  /** Integer L2² distance between two quantized subvectors — a fixed
    * ascending fold of exact longs, identical in any engine.
    */
  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  def codebookStats(embeddings: DataFrame, m: Int, k: Int): DataFrame = {
    val e = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        .as("q"))
    // m subspace rows per vector; the last subspace takes the
    // remainder when dim % m != 0 (width = floor(dim / m))
    val parts = (0 until m).map { s =>
      val len = if (s == m - 1) s"size(q) - $s * wdt" else "wdt"
      s"struct($s AS ss, slice(q, $s * wdt + 1, $len) AS v)"
    }
    val subs = e
      .withColumn("wdt", expr(s"CAST(floor(size(q) / $m) AS INT)"))
      .select(col("vec_id"),
        explode(expr(s"array(${parts.mkString(", ")})")).as("p"))
      .select(col("vec_id"), col("p.ss").as("ss"), col("p.v").as("v"))
      .transform(Materialize.once) // seeds + two assignment passes
    // per-subspace seed codebook: the k lowest vec_ids' subvectors
    // (code = seeding vec_id, the IVF convention)
    val seedIds = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("sid"))
    val cb0 = broadcast(
      subs.join(broadcast(seedIds), subs("vec_id") === seedIds("sid"))
        .select(col("ss"), col("vec_id").as("code"), col("v").as("cvec")))
    // nearest code per (subspace, vector): broadcast join + max_by
    // collapse; tie-break min distance then min code, matching the
    // SQL row_number() ORDER BY d, code replay
    def assign(cb: DataFrame): DataFrame =
      subs.join(cb, Seq("ss"))
        .withColumn("d", dist2(col("v"), col("cvec")))
        .groupBy(col("ss"), col("vec_id"))
        .agg(max_by(struct(col("code"), col("v"), col("d")),
          struct(-col("d"), -col("code"))).as("best"))
        .select(col("ss"), col("vec_id"), col("best.code").as("code"),
          col("best.v").as("v"), col("best.d").as("d"))
    // one Lloyd round: exact integer component sums, floor-divided
    val cb1 = broadcast(assign(cb0)
      .select(col("ss"), col("code"), posexplode(col("v")))
      .groupBy(col("ss"), col("code"), col("pos"))
      .agg(sum(col("col")).as("sq"), count(lit(1)).as("n"))
      .withColumn("c", floor(col("sq") / col("n")).cast("long"))
      .groupBy(col("ss"), col("code"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cvec")))
    assign(cb1)
      .groupBy(col("ss"), col("code"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d")).as("sq_err"))
      .select(col("ss").cast("int").as("subspace"), col("code"),
        col("n_vectors"), col("sq_err"))
  }
}
