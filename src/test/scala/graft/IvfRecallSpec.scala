package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measured recall-vs-nprobe curve for the IVF index (VERDICT r07
  * item 8): the accuracy/cost trade the q33 docstring claims, computed
  * against exact brute-force ground truth on real testdata embeddings —
  * measured, not asserted. The per-level numbers are printed so the
  * build log carries the table; the committed summary lives in SCALE.md.
  *
  * Two structural facts are asserted, both guaranteed by construction:
  * probing more cells only ever ADDS candidates (recall is monotone
  * non-decreasing in nprobe), and probing ALL cells with the same
  * (cos desc, id asc) tie-break IS the brute-force ranking (recall 1.0
  * at nprobe = nlist).
  */
class IvfRecallSpec extends SparkSpec {
  import spark.implicits._

  test("IVF recall@10 vs nprobe: monotone, exhaustive at nprobe=nlist") {
    val k = 10
    val nlist = 16
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val queries = corpus.orderBy(col("vec_id")).limit(20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = Similarity.bruteForceTopK(corpus, queries, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nQ = truth.size
    val curve = Seq(1, 2, 4, 8, 16).map { nprobe =>
      val got = Similarity
        .ivfTopK(corpus, queries, k, nlist = nlist, nprobe = nprobe,
          refine = 1)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t).toDouble / t.size
      }.sum / nQ
      (nprobe, recall)
    }
    info(f"IVF recall@$k%d over $nQ%d queries (nlist=$nlist, refine=1):")
    curve.foreach { case (np, r) => info(f"  nprobe=$np%2d  recall=$r%.3f") }
    curve.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1 - 1e-12,
        s"recall must not drop with more probes: $np1->$np2 gave $r1->$r2")
    }
    assert(math.abs(curve.last._2 - 1.0) < 1e-12,
      s"nprobe=nlist probes every cell and must equal brute force, " +
        s"got ${curve.last._2}")
    assert(curve.head._2 > 0.3,
      s"nprobe=1 recall implausibly low (${curve.head._2}) — " +
        "cell assignment is likely broken")
  }
}
