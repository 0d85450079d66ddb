package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // A and B differ by one word (near-dups, shingle jaccard ≈ 0.75 so the
  // 8×4 banding catches them); C is unrelated.
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today " +
      "while the patient hound watches from the shaded porch nearby"),
    (2L, "the quick brown fox jumps over the lazy cat again and again today " +
      "while the patient hound watches from the shaded porch nearby"),
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
    assert(sh.head == "the quick brown" && sh.last == "shaded porch nearby")
    val ng = docs.filter($"doc_id" === 3)
      .select(Dedup.charNgrams($"text", 3)).as[Seq[String]].head()
    assert(ng.contains("com") && ng.forall(_.length == 3))
  }

  test("minhash+LSH surfaces the planted near-dup pair and not the outlier") {
    val withBands = withShingles
      .withColumn("bands", Dedup.minHashBandKeys(col("shingles"), 32, 8))
    val pairs = Dedup.lshCandidatePairs(
      withBands.select(col("doc_id"), col("bands")), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("portable minhash+LSH (q21 family) finds the planted pair too") {
    val withBands = withShingles
      .withColumn("bands", Dedup.portableMinHashBandKeys(col("shingles"), 32, 8))
    val pairs = Dedup.lshCandidatePairs(
      withBands.select(col("doc_id"), col("bands")), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("minhash band keys are deterministic and identical for identical docs") {
    val dup = Seq((10L, "same text here again"), (11L, "same text here again"),
        (12L, "entirely other words instead"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .withColumn("shingles", array_distinct(Dedup.tokenShingles(col("toks"), 2)))
      .withColumn("bands", Dedup.minHashBandKeys(col("shingles"), 16, 4))
    val bands = dup.orderBy("doc_id").select("bands").as[Seq[Long]].collect()
    assert(bands(0) == bands(1) && bands(0).length == 4)
    assert(bands(2) != bands(0))
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

  test("sortedJaccard matches the built-in set jaccard exactly") {
    val sets = withShingles
      .select(col("doc_id"), array_sort(col("shingles")).as("s"))
    val both = sets.as("a").join(sets.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(
        Dedup.sortedJaccard(col("a.s"), col("b.s")).as("fast"),
        Dedup.jaccard(col("a.s"), col("b.s")).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val fp = docs
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .withColumn("simhash", Dedup.simHash(col("toks")))
      .select("doc_id", "simhash").as[(Long, Long)].collect()
      .toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
    assert(ham(fp(1L), fp(1L)) == 0)
  }

  test("portable simhash (q23 family): near-dups close, unrelated docs far") {
    val fp = docs
      .select(col("doc_id"),
        Dedup.portableSimHash(TextAnalysis.wsTokens(col("text"))).as("simhash"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
    assert(ham(fp(1L), fp(1L)) == 0)
    // and the bits are well-mixed, not clustered in one band
    val bits = java.lang.Long.bitCount(fp(3L))
    assert(bits > 16 && bits < 48, s"fingerprint bits skewed: $bits/64 set")
  }

  test("simHashNearPairs equals brute-force hamming<=3 pairs, dup-heavy corpus") {
    // duplicate-heavy: 30 docs share fingerprint A, 3 near-A (d=1..3),
    // 2 far outliers — exercises the distinct-fingerprint collapse path
    val a = 0x0123456789ABCDEFL
    val rows =
      (1L to 30L).map(i => (i, a)) ++ Seq(
        (31L, a ^ 1L),                     // d=1
        (32L, a ^ 0x5L),                   // d=2
        (33L, a ^ 0x7L),                   // d=3
        (34L, a ^ 0xFFL),                  // d=8, out
        (35L, ~a))                         // d=64, out
    val fps = rows.toDF("doc_id", "simhash")
    val got = Dedup.simHashNearPairs(fps, "doc_id", "simhash")
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (i, hi) <- rows; (j, hj) <- rows if i < j
      d = java.lang.Long.bitCount(hi ^ hj) if d <= 3
    } yield (i, j, d)).toSet
    assert(got == want)
    assert(got.size == 30 * 29 / 2 + 3 * 30 + 3) // dups + near×dups + near×near
  }

  test("simhash bands cover all 64 bits") {
    val bands = docs.filter($"doc_id" === 1)
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .withColumn("simhash", Dedup.simHash(col("toks")))
      .withColumn("bands", Dedup.simHashBands("simhash"))
      .select("bands").as[Seq[Long]].head()
    assert(bands.length == 4)
    assert(bands.forall(b => b >= 0 && b <= 65535))
  }

  test("minhash signature aggregator: merge-order-independent, estimates jaccard") {
    import graft.functions.{MinHashSignatureAgg, PortableHash}
    // identical element sets → identical signatures regardless of
    // partitioning/merge order
    val elems = (1 to 200).map(i => s"elem$i")
    def sig(parts: Int): Seq[Long] =
      elems.toDF("e").repartition(parts)
        .agg(MinHashSignatureAgg.udaf(32)(col("e"))).as[Seq[Long]].head()
    assert(sig(1) == sig(7))
    // scala-side reference: slot j = min over elements of slot(hash(e), j)
    val expected = (0 until 32).map { j =>
      elems.map(e => PortableHash.slot(PortableHash.hash(e), j)).min
    }
    assert(sig(3) == expected)
    // overlapping sets share slots roughly in proportion to jaccard:
    // 50% overlap → expect a substantial fraction of matching slots
    val other = (101 to 300).map(i => s"elem$i")
    val sigOther = other.toDF("e")
      .agg(MinHashSignatureAgg.udaf(32)(col("e"))).as[Seq[Long]].head()
    val matching = sig(1).zip(sigOther).count { case (x, y) => x == y }
    assert(matching >= 3 && matching <= 29, s"matching=$matching") // jac=1/3
  }

  test("rolling gram hashes equal PortableHash over each charNgrams element") {
    import graft.functions.PortableHash
    val texts = Seq("the quick brown fox", "ab", "abc", "abcd", "x")
    texts.foreach { t =>
      val (hashes, grams) = Seq(t).toDF("text")
        .select(
          graft.operators.Dedup.gramHashes(col("text"), 3).as("h"),
          graft.operators.Dedup.charNgrams(col("text"), 3).as("g"))
        .as[(Seq[Long], Seq[String])].head()
      // positional hashes cover exactly the (possibly duplicated) gram
      // sequence; charNgrams dedupes, so compare as sets
      assert(hashes.toSet == grams.map(PortableHash.hash).toSet, s"for '$t'")
    }
  }

  test("fused allShingles equals the HOF tokenShingles exactly (order + dups)") {
    val both = docs
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("toks"))
      .select(
        Dedup.allShingles(col("toks"), 3).as("fused"),
        Dedup.tokenShingles(col("toks"), 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (f, h) => assert(f == h) }
    // short docs clamp to one truncated shingle in both forms
    val short = Seq((1L, "just two")).toDF("doc_id", "text")
      .select(Dedup.allShingles(TextAnalysis.wsTokens(col("text")), 3).as("s"))
      .as[Seq[String]].head()
    assert(short == Seq("just two"))
  }

  test("fused sortedShingles equals array_sort(array_distinct(tokenShingles))") {
    val texts = Seq("a b c d e", "one two", "solo", "", "x x x x")
    texts.foreach { t =>
      val row = Seq(t).toDF("text")
        .select(graft.operators.TextAnalysis.wsTokens(col("text")).as("toks"))
        .select(
          graft.operators.Dedup.sortedShingles(col("toks"), 3).as("fused"),
          array_sort(array_distinct(
            graft.operators.Dedup.tokenShingles(col("toks"), 3))).as("hof"))
        .as[(Seq[String], Seq[String])].head()
      assert(row._1 == row._2, s"shingle mismatch for '$t'")
    }
  }

  test("packed int n-grams give exactly the string n-gram jaccard on ASCII") {
    val texts = Seq(
      ("the quick brown fox jumps", "the quick brown dog jumps"),
      ("aaaa", "aaab"), ("abcdef", "uvwxyz"), ("same text", "same text"))
    texts.foreach { case (t1, t2) =>
      val row = Seq((t1, t2)).toDF("t1", "t2")
        .select(
          graft.operators.Dedup.sortedIntJaccard(
            graft.operators.Dedup.packedNgrams(col("t1"), 3),
            graft.operators.Dedup.packedNgrams(col("t2"), 3)).as("packed"),
          graft.operators.Dedup.jaccard(
            graft.operators.Dedup.charNgrams(col("t1"), 3),
            graft.operators.Dedup.charNgrams(col("t2"), 3)).as("str"))
        .as[(Double, Double)].head()
      assert(row._1 == row._2, s"packed vs string jaccard for ($t1, $t2)")
    }
  }

  test("saltedBlockPairs yields every unordered within-block pair exactly once") {
    val df = (0L until 40L).map(i => (s"blk${i % 3}", i, s"payload$i"))
      .toDF("block", "id", "p")
    for (s <- Seq(1, 2, 4, 7)) {
      val got = graft.operators.Dedup.saltedBlockPairs(df, "block", "id", s)
        .select(col("block"),
          least(col("id_1"), col("id_2")).as("lo"),
          greatest(col("id_1"), col("id_2")).as("hi"))
        .as[(String, Long, Long)].collect().toSeq
      val expected = (0L until 40L).combinations(2).collect {
        case Seq(x, y) if x % 3 == y % 3 => (s"blk${x % 3}", x, y)
      }.toSeq
      assert(got.size == expected.size, s"subBlocks=$s: pair count")
      assert(got.toSet == expected.toSet, s"subBlocks=$s: pair set")
    }
  }
}
