package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // A and B differ by one word (near-dups); C is unrelated.
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy cat again and again today"),
    (3L, "completely different content about distributed query engines here"))
    .toDF("doc_id", "text")

  private def withShingles = docs
    .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
    .withColumn("shingles", array_distinct(Dedup.tokenShingles(col("toks"), 3)))

  test("keepFirst keeps exactly one survivor per key, lowest order wins") {
    val df = Seq((1L, "k1"), (2L, "k1"), (3L, "k2"), (4L, "k1"))
      .toDF("id", "key")
    val kept = Dedup.keepFirst(df, col("key"), col("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(kept == Seq((1L, "k1"), (3L, "k2")))
  }

  test("token shingles and char ngrams have the expected shapes") {
    val sh = docs.filter($"doc_id" === 1)
      .select(Dedup.tokenShingles(TextAnalysis.wsTokens($"text"), 3))
      .as[Seq[String]].head()
    assert(sh.head == "the quick brown" && sh.last == "and again today")
    val ng = docs.filter($"doc_id" === 3)
      .select(Dedup.charNgrams($"text", 3)).as[Seq[String]].head()
    assert(ng.contains("com") && ng.forall(_.length == 3))
  }

  test("minhash+LSH surfaces the planted near-dup pair and not the outlier") {
    val withBands = withShingles
      .withColumn("sig", Dedup.minHashSignature(col("shingles"), 32))
      .withColumn("bands", Dedup.bandHashes(col("sig"), 16, 2))
    val pairs = Dedup.lshCandidatePairs(
      withBands.select(col("doc_id"), col("bands")), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("minhash signature is deterministic and identical for identical docs") {
    val dup = Seq((10L, "same text here"), (11L, "same text here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .withColumn("shingles", array_distinct(Dedup.tokenShingles(col("toks"), 2)))
      .withColumn("sig", Dedup.minHashSignature(col("shingles"), 16))
    val sigs = dup.select("sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1) && sigs(0).length == 16)
  }

  test("jaccard on the true shingle sets separates near-dups from noise") {
    val sets = withShingles.select(col("doc_id"), col("shingles"))
    val j12 = sets.as("a").join(sets.as("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(Dedup.jaccard(col("a.shingles"), col("b.shingles")))
      .as[Double].head()
    val j13 = sets.as("a").join(sets.as("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 3)
      .select(Dedup.jaccard(col("a.shingles"), col("b.shingles")))
      .as[Double].head()
    assert(j12 > 0.5)
    assert(j13 == 0.0)
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val fp = docs
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .withColumn("simhash", Dedup.simHash("toks"))
      .select("doc_id", "simhash").as[(Long, Long)].collect()
      .toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
    assert(ham(fp(1L), fp(1L)) == 0)
  }

  test("simhash bands cover all 64 bits") {
    val bands = docs.filter($"doc_id" === 1)
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .withColumn("simhash", Dedup.simHash("toks"))
      .withColumn("bands", Dedup.simHashBands("simhash"))
      .select("bands").as[Seq[Long]].head()
    assert(bands.length == 4)
    assert(bands.forall(b => b >= 0 && b <= 65535))
  }
}
