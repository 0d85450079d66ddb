package graft

import org.apache.spark.sql.functions._
import graft.operators.Clusters

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("planted components resolve to their minimum ids") {
    val labels = labelsOf(Seq((2L, 1L), (2L, 3L), (9L, 5L), (7L, 7L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 9L -> 5L, 7L -> 7L))
  }

  test("a long chain converges to one component (multi-round propagation)") {
    // path graph 1-2-…-20: min-label needs ~diameter rounds to reach the
    // far end, exercising the loop beyond a single iteration
    val chain = (1L until 20L).map(i => (i, i + 1))
    val labels = labelsOf(chain)
    assert(labels.keySet == (1L to 20L).toSet)
    assert(labels.values.toSet == Set(1L))
  }

  test("two merging chains and an isolated edge stay separate components") {
    // 10-11-12 joined to 1-2-3 via (3,10); (100,200) apart
    val labels = labelsOf(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
      (3L, 10L), (200L, 100L)))
    assert((1L to 3L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 1L))
    assert(labels(100L) == 100L && labels(200L) == 100L)
  }

  test("only nodes present in pairs are labeled") {
    val labels = labelsOf(Seq((4L, 8L)))
    assert(labels.keySet == Set(4L, 8L))
  }

  test("star fallback: long paths converge in O(log n), not O(diameter)") {
    // a 4096-node path has diameter 4095 — min-label propagation alone
    // would need that many rounds. With the default propagation budget
    // (8) the loop must hand off to large-star/small-star and still
    // finish within maxIter = 50 total: 8 + ceil(c·log2 4096) ≪ 4095.
    // Convergence within the budget IS the O(log n) assertion; the
    // label check proves the contraction kept components intact.
    val n = 4096L
    val path = (0L until n - 1).map(i => (i + 1, i))
    val labels = labelsOf(path)
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L))
  }

  test("star fallback keeps disjoint components and isolated pairs apart") {
    // two interleaved chains (evens, odds) + a far-away pair, diameter
    // big enough to engage the star phase
    val evens = (0L until 400L).map(i => (2 * i + 2, 2 * i))
    val odds = (0L until 400L).map(i => (2 * i + 3, 2 * i + 1))
    val labels = labelsOf(evens ++ odds ++ Seq((9000L, 9001L)))
    assert((0L to 800L by 2).forall(labels(_) == 0L))
    assert((1L to 801L by 2).forall(labels(_) == 1L))
    assert(labels(9000L) == 9000L && labels(9001L) == 9000L)
  }

  test("propagation path and star path agree on random graphs") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val viaPropagation = Clusters
      .connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val viaStars = Clusters
      .connectedComponents(pairs.toDF("a", "b"), "a", "b",
        propagationRounds = 0)
      .as[(Long, Long)].collect().toMap
    assert(viaStars == viaPropagation)
  }
}
