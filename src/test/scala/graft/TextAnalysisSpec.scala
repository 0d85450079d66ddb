package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("whitespace and lexer token counts") {
    val row = one("the quick  brown fox-42 jumps!")
      .select(
        wsTokenCount(col("text")).as("ws"),
        lexTokenCount(col("text")).as("lex"))
      .as[(Int, Int)].head()
    assert(row._1 == 5) // runs of whitespace collapse
    // the|quick|brown|fox|-|42|jumps|! (letters, digits, single symbols)
    assert(row._2 == 8)
  }

  test("occurrences counts standalone tokens only") {
    val df = one("the theme of the day")
    assert(df.select(occurrences(col("text"), "the")).as[Int].head() == 2)
    assert(df.select(occurrences(col("text"), "theme")).as[Int].head() == 1)
    assert(df.select(occurrences(col("text"), "missing")).as[Int].head() == 0)
  }

  test("language id: marker argmax with en-first tie-break") {
    assert(one("the cat and the dog of note")
      .select(langId(col("text"))).as[String].head() == "en")
    assert(one("el gato la casa los perros")
      .select(langId(col("text"))).as[String].head() == "es")
    assert(one("der hund die katze und")
      .select(langId(col("text"))).as[String].head() == "de")
    assert(one("le chat les chiens et")
      .select(langId(col("text"))).as[String].head() == "fr")
    // zero scores everywhere -> all equal greatest -> first lang wins
    assert(one("xyzzy plugh")
      .select(langId(col("text"))).as[String].head() == "en")
  }

  test("quality bucketing thresholds") {
    val short = one("tiny doc here")
    val nTok = wsTokenCount(col("text"))
    val punct = punctCount(col("text")).cast("double") / length(col("text"))
    val stop = stopwordRatio(col("text"))
    assert(short.select(qualityBucket(nTok, punct, stop))
      .as[String].head() == "too_short")
    assert(one("a!!! b### c$$$ d%%% e^^^ f&&&")
      .select(qualityBucket(nTok, punct, stop))
      .as[String].head() == "symbol_spam")
    assert(one("the a and of the a and of x y")
      .select(qualityBucket(nTok, punct, stop))
      .as[String].head() == "boilerplate")
    assert(one("solid unique informative content with real substance here")
      .select(qualityBucket(nTok, punct, stop))
      .as[String].head() == "ok")
  }

  test("fingerprint is whitespace/case insensitive but content sensitive") {
    val fps = Seq("Hello  World", "hello world", " HELLO\tWORLD ", "hello worlds")
      .toDF("text").select(fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(1) == fps(2))
    assert(fps(3) != fps(0))
    assert(fps(0).length == 64)
  }
}
