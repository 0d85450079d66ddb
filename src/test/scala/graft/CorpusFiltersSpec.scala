package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusFilters, TextAnalysis}

class CorpusFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("quality signals: symbol ratio, mean word length, stopword hits") {
    val d = Seq(
      (1L, "the cat and the hat sat on a mat"),      // clean, stopwords
      (2L, "$$$ ### @@@ %%%"),                       // all symbols
      (3L, "supercalifragilistic expialidocious"))   // long words, no stops
      .toDF("doc_id", "text")
    val tf = TextAnalysis.textFeatures(col("text"))
    val n = tf.getField("n_tokens")
    val rows = d.select(
      col("doc_id"),
      CorpusFilters.symbolRatio(col("text")).as("sym"),
      CorpusFilters.meanWordLen(col("text"), n).as("mwl"),
      CorpusFilters.stopwordHits(tf).as("hits"))
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Double]("sym") == 0.0)
    assert(rows(0).getAs[Int]("hits") == 3) // the, and, a present; 'of' absent
    // "the cat and the hat sat on a mat": 24 non-ws chars / 9 tokens
    assert(math.abs(rows(0).getAs[Double]("mwl") - 24.0 / 9) < 1e-12)
    assert(rows(1).getAs[Double]("sym") > 0.7) // only symbols + spaces
    assert(rows(1).getAs[Int]("hits") == 0)
    assert(rows(2).getAs[Double]("mwl") > 10.0)
  }

  test("gopherKeep composes the rules with the given thresholds") {
    val d = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the barn door"),
      (2L, "word"), // too short
      (3L, "xxxxxxxxxxxxxxxxxxx yyyyyyyyyyyyyyyyyyyy zzzzzzzzzzzzzzzzz " +
        "aaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbb cccccccccccccccccc " +
        "dddddddddddddddddd eeeeeeeeeeeeeeeeee ffffffffffffffffff " +
        "gggggggggggggggggg hhhhhhhhhhhhhhhhhh iiiiiiiiiiiiiiiiii")) // mean wl
      .toDF("doc_id", "text")
    val tf = TextAnalysis.textFeatures(col("text"))
    val n = tf.getField("n_tokens")
    val kept = d.filter(CorpusFilters.gopherKeep(
        n,
        CorpusFilters.meanWordLen(col("text"), n),
        CorpusFilters.symbolRatio(col("text")),
        CorpusFilters.stopwordHits(tf),
        minTokens = 5, maxTokens = 100,
        minMeanWl = 3.0, maxMeanWl = 10.0,
        maxSymbolRatio = 0.1, minStopHits = 1))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("topNgramProfile counts occurrences, not distinct grams") {
    val d = Seq(
      (1L, "go go go go stop"),       // bigram "go go" x3 of 4
      (2L, "all words here differ"))  // every bigram unique
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
    val prof = CorpusFilters.topNgramProfile(d, "doc_id", "toks", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(prof == Seq((1L, 4L, 3L), (2L, 3L, 1L)))
  }
}
