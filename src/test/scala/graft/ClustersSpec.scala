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
}
