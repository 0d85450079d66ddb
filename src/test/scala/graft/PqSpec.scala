package graft

import graft.operators.Pq

/** PQ codebook semantics: per-subspace independence, exact-integer
  * quantization error, deterministic tie-breaks.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("exact cluster structure is recovered with zero error") {
    // dim 4, m=2 → 2-component subvectors. Four planted patterns per
    // subspace; ids 0-3 (the seeds) carry one of each, every other
    // vector replays a pattern — so the seeded codebook is already
    // exact, the Lloyd mean of identical members is a fixpoint, and
    // the final quantization error must be exactly zero.
    val pats = Seq(
      Array(0f, 0f, .5f, .5f), Array(.1f, .1f, .4f, .4f),
      Array(.2f, .2f, .3f, .3f), Array(.3f, .3f, .2f, .2f))
    val rows = pats.zipWithIndex.map { case (p, i) => (i.toLong, p) } ++
      (10L to 29L).map(i => (i, pats((i % 4).toInt)))
    val out = Pq.codebookStats(rows.toDF("vec_id", "embedding"), m = 2, k = 4)
      .as[(Int, Long, Long, Long)].collect()
    assert(out.length == 8) // 2 subspaces × 4 non-empty cells
    assert(out.forall(_._4 == 0L), s"nonzero quantization error: ${out.toSeq}")
    // each pattern has 1 seed + 5 replicas
    assert(out.forall(_._3 == 6L))
  }

  test("ADC search ranks exact-pattern replicas first with zero distance") {
    val pats = Seq(
      Array(0f, 0f, .5f, .5f), Array(.1f, .1f, .4f, .4f),
      Array(.2f, .2f, .3f, .3f), Array(.3f, .3f, .2f, .2f))
    val corpus = (pats.zipWithIndex.map { case (p, i) => (i.toLong, p) } ++
      (10L to 29L).map(i => (i, pats((i % 4).toInt))))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, pats(0))).toDF("query_id", "query_vec")
    val got = Pq.adcTopK(corpus, queries, topK = 5, m = 2, k = 4)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // the 5 replicas of pattern 0 (ids ≡ 0 mod 4, self excluded), all
    // at asymmetric distance 0, ranked by neighbor id
    assert(got.map(_._2).toSeq == Seq(12L, 16L, 20L, 24L, 28L))
    assert(got.forall(_._3 == 0L))
  }

  test("IVF-PQ scores exact residual-pattern matches at zero distance") {
    // dim 8, m=2 → 4-component subvectors. 12 vectors = a base point
    // plus one of 4 exact offset patterns (id%4): the patterns ARE the
    // residual structure, so after coarse assignment the shared
    // codebook recovers them exactly and a query replaying pattern 2
    // must see every pattern-2 member at ADC distance exactly 0,
    // ranked ahead of everything else (ties toward the lowest id).
    // Note the discrimination lives in the CODES: ADC cannot split
    // same-code members — that is the documented PQ trade, and this
    // fixture keeps one pattern per code so the ranking is exact.
    val offs = Seq(
      Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(1f, 1f, 1f, 1f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 1f, 1f, 1f, 1f),
      Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f))
    def vec(i: Long): Array[Float] =
      offs((i % 4).toInt).map(_ + 0.5f)
    val corpus = (0L until 12L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val queries = Seq((999L, vec(2L))).toDF("query_id", "query_vec")
    val out = Pq.ivfpqTopK(corpus, queries, topK = 5,
        nlist = 2, m = 2, k = 4, nprobe = 2)
      .orderBy("rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(out.take(3).map(_._2).toSeq == Seq(2L, 6L, 10L),
      s"pattern-2 members must lead by lowest id, got ${out.toSeq}")
    assert(out.take(3).forall(_._3 == 0L),
      "exact pattern matches must sit at ADC distance 0")
    assert(out(3)._3 > 0L, "other patterns must score a positive distance")
  }

  test("equidistant vectors break ties toward the lowest code") {
    // quantized subvector (1e6,1e6) sits exactly between the seed
    // patterns (0,0) and (2e6,2e6) — equal integer distance to both,
    // so it must land on the LOWER code; the refined centroid is then
    // floor((0+1e6)/2) = 5e5 per component (float values 0/1/2 are
    // exact, so the quantization is too)
    val rows = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),
      (1L, Array(2f, 2f, 2f, 2f)),
      (5L, Array(1f, 1f, 1f, 1f)))
    val out = Pq.codebookStats(rows.toDF("vec_id", "embedding"), m = 2, k = 2)
      .as[(Int, Long, Long, Long)].collect()
    val c0 = out.filter(_._2 == 0L).sortBy(_._1)
    assert(c0.map(_._3).toSeq == Seq(2L, 2L)) // seed + tie vector
    // both members are 5e5 from the refined centroid in each of the 2
    // components: err = 2 × 2 × (5e5)² per subspace
    assert(c0.map(_._4).toSeq == Seq(1000000000000L, 1000000000000L))
    val c1 = out.filter(_._2 == 1L)
    assert(c1.length == 2 && c1.forall(r => r._3 == 1L && r._4 == 0L))
  }
}
