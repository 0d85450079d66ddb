package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near- and exact-duplicate detection for a training-data pipeline:
  * exact (hash groupBy keep-first), MinHash+LSH, SimHash, and n-gram
  * Jaccard verification.
  *
  * Scale design (the point of LSH): candidate generation NEVER compares
  * all pairs — documents are exploded into (band, bandHash) buckets and
  * only same-bucket pairs are joined, so the shuffle keys on the bucket
  * hash and work is proportional to collisions, not n². All signature
  * math is Catalyst higher-order functions (transform/aggregate) over
  * arrays with xxhash64 — codegen'd, no UDFs, no driver-side state.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Keep-first dedup: one survivor per key, smallest `orderCol` wins
    * (row_number over the key partition). The relational form of the
    * reference's NOT EXISTS exactly-once insert (alert_case_spike.sql:57-63).
    */
  def keepFirst(df: DataFrame, key: Column, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles from a token array. */
  def tokenShingles(tokens: Column, n: Int): Column =
    transform(sequence(lit(0), greatest(size(tokens) - n, lit(0))),
      i => concat_ws(" ", slice(tokens, i + 1, lit(n))))

  /** Character n-gram set (distinct) — the n-gram Jaccard universe. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => substr(text, i, lit(n))))

  // ------------------------------------------------------------- minhash

  /** MinHash signature: `numHashes` independent hash families simulated
    * as xxhash64(j, shingle); each signature slot is the min over the
    * document's shingles. One pass over the shingle array per slot.
    */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingles, s => xxhash64(j, s))))

  /** LSH band hashes: fold each band's signature slice into one 64-bit
    * key (rolling xxhash64 combine). bands*rowsPerBand must equal the
    * signature length.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => aggregate(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
        lit(42L), (acc, x) => xxhash64(acc, x)))

  /** Same-bucket candidate pairs from an (id, bands) frame: explode to
    * (bandIdx, bandHash) buckets, self-join within buckets, id1 < id2.
    * This is the scale path — no all-pairs product anywhere.
    */
  def lshCandidatePairs(withBands: DataFrame, idCol: String): DataFrame = {
    val buckets = withBands.select(
      col(idCol),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()
  }

  /** Set Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over a token array: per bit position, tokens vote
    * +1/−1 by their xxhash64 bit; the sign becomes the fingerprint bit.
    * Variable shifts force the expr form (the Scala shiftright wrapper
    * only takes literal shift amounts).
    */
  def simHash(tokensColName: String): Column = expr(
    s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, b) ->
       |  acc + CASE WHEN aggregate($tokensColName, 0, (vacc, t) ->
       |      vacc + CASE WHEN (shiftright(xxhash64(t), b) & 1) = 1
       |                  THEN 1 ELSE -1 END) > 0
       |    THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)"""
      .stripMargin)

  /** 16-bit SimHash bands (4 per fingerprint): two fingerprints within
    * hamming distance 3 of each other agree on ≥1 band, so banding is a
    * sound candidate filter for d ≤ 3.
    */
  def simHashBands(simhashColName: String): Column = expr(
    s"transform(sequence(0, 3), i -> shiftright($simhashColName, i * 16) & 65535)")

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
