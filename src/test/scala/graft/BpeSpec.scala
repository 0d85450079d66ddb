package graft

import graft.operators.Bpe

/** BPE training semantics: pair census weighted by word frequency,
  * (count desc, l, r) tie-break, and — the part that's easy to get
  * wrong — GREEDY left-to-right non-overlapping merge application
  * inside runs of the merged pair.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def learned(words: Seq[(String, Long)], rounds: Int = 8) =
    Bpe.train(words.toDF("w", "cnt"), rounds)
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("census counts overlapping pairs; application merges greedily") {
    // "aaa": the census sees TWO (a,a) pairs (positions 1-2 and 2-3,
    // the textbook statistic), but greedy application produces
    // [aa, a] — only ONE merge fires, and the leftover 'a' pairs with
    // the new 'aa' symbol next round
    assert(learned(Seq(("aaa", 1L))) == Seq(
      (1, "a", "a", "aa", 2L),
      (2, "aa", "a", "aaa", 1L)))
  }

  test("frequency-weighted selection with deterministic tie-break") {
    // round 1: (a,b) appears twice in "abab" at weight 2 → 4, beating
    // (a,a)'s 3 in "aaaa"; rounds then alternate as counts shrink
    assert(learned(Seq(("aaaa", 1L), ("abab", 2L))) == Seq(
      (1, "a", "b", "ab", 4L),
      (2, "a", "a", "aa", 3L),
      (3, "ab", "ab", "abab", 2L),
      (4, "aa", "aa", "aaaa", 1L)))
  }

  test("training stops when every word is a single symbol") {
    val m = learned(Seq(("ab", 3L)), rounds = 8)
    assert(m == Seq((1, "a", "b", "ab", 3L)))
  }

  test("rounds cap is honored") {
    assert(learned(Seq(("aaaa", 1L), ("abab", 2L)), rounds = 2).size == 2)
  }
}
