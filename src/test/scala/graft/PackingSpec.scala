package graft

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy packing respects the budget, covers every doc exactly once") {
    val docs = Seq(
      (1L, 400L), (2L, 500L), (3L, 300L), // 400+500 fit; 300 overflows
      (4L, 200L), (5L, 100L), (6L, 950L), // 300+200+100 fit; 950 overflows
      (7L, 60L))                          // 950+60 overflows again
      .toDF("doc_id", "n_tokens").coalesce(1)
    val seqs = Packing.packSequences(docs, budget = 1000L).collect()
      .sortBy(_.seq_id)

    assert(seqs.map(_.doc_ids.toList).toList ==
      List(List(1L, 2L), List(3L, 4L, 5L), List(6L), List(7L)))
    assert(seqs.map(_.total_tokens).toList == List(900L, 600L, 950L, 60L))
    assert(seqs.forall(_.total_tokens <= 1000L))
    assert(seqs.flatMap(_.doc_ids).sorted.toList == (1L to 7L).toList)
  }

  test("oversized docs get their own sequence, fill capped at 1.0") {
    val docs = Seq((1L, 50L), (2L, 3000L), (3L, 40L))
      .toDF("doc_id", "n_tokens").coalesce(1)
    val seqs = Packing.packSequences(docs, budget = 1000L).collect()
      .sortBy(_.seq_id)
    assert(seqs.map(_.doc_ids.toList).toList ==
      List(List(1L), List(2L), List(3L)))
    val oversized = seqs.find(_.doc_ids == Seq(2L)).get
    assert(oversized.total_tokens == 3000L && oversized.fill == 1.0)
  }

  test("seq_ids are globally unique across partitions") {
    val docs = (1L to 1000L).map(i => (i, 100L)).toDF("doc_id", "n_tokens")
      .repartition(8)
    val seqs = Packing.packSequences(docs, budget = 512L).collect()
    assert(seqs.map(_.seq_id).distinct.length == seqs.length)
    assert(seqs.flatMap(_.doc_ids).sorted.toList == (1L to 1000L).toList)
  }
}
