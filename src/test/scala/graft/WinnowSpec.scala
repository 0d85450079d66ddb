package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Oracle-free reference: direct (non-rolling) hash + naive winnow. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val M = 2147483647L; val B = 257L
    val m = s.length - k + 1
    if (m < 1) return Seq.empty
    val hs = (0 until m).map { i =>
      s.substring(i, i + k).foldLeft(0L)((h, c) => (h * B + c) % M)
    }
    (0 until math.max(m - w + 1, 1))
      .map(j => hs.slice(j, j + w).min).distinct.sorted
  }

  test("rolling hash matches the direct polynomial; output sorted distinct") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaa", "abcd", "abc", "spark native analytics engine")
    val got = texts.toDF("text")
      .select(TextAnalysis.winnowFingerprints($"text", 4, 5).as("fp"))
      .as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, fp) =>
      assert(fp == reference(t, 4, 5), s"mismatch for '$t'")
      assert(fp == fp.distinct.sorted)
    }
    // shorter than k → empty
    assert(reference("abc", 4, 5).isEmpty && got(3).isEmpty)
  }

  test("shared substring of length ≥ k+w−1 implies a shared fingerprint") {
    val core = "winnowing guarantees shared fingerprints"
    val a = s"prefix text one $core and some suffix"
    val b = s"completely different opening $core closing words here"
    val Seq(fa, fb) = Seq(a, b).toDF("text")
      .select(TextAnalysis.winnowFingerprints($"text", 4, 5).as("fp"))
      .as[Seq[Long]].collect().toSeq
    assert(fa.toSet.intersect(fb.toSet).nonEmpty)
  }

  test("winnow_fp is callable from SQL via extensions") {
    val n = spark.sql(
      "SELECT size(winnow_fp('the quick brown fox', 4, 5)) AS n").as[Int].head()
    assert(n == reference("the quick brown fox", 4, 5).size)
  }
}
