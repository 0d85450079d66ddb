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

  /** Sorted distinct shingle set via the fused codegen'd expression —
    * equals array_sort(array_distinct(tokenShingles(t, n))) but builds
    * set + order in one JIT pass (the HOF chain runs interpreted AND
    * re-inlines into every consuming plan branch; q21 evaluates its
    * shingles in three branches).
    */
  def sortedShingles(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TokenShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n))

  /** Every shingle occurrence in order (duplicates kept), codegen'd —
    * the occurrence-counting twin of [[sortedShingles]] for repetition
    * profiling.
    */
  def allShingles(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TokenShinglesAll(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n))

  /** Character n-gram set (distinct) — the n-gram Jaccard universe. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => substr(text, i, lit(n))))

  /** Byte n-grams packed into sorted distinct array<int> (n ≤ 4) via
    * the codegen'd expression — bijective with the string n-gram set on
    * ASCII text, so Jaccard values are identical while each element is
    * 4 bytes instead of a ~20-byte string. Use for pair-join verify
    * stages, where gram arrays are copied into every joined row and
    * element width dominates bytes moved.
    */
  def packedNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PackedNgrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** PortableHash of every char n-gram, rolling, no gram strings
    * materialized (codegen'd) — feed MinHashSignatureAgg.udafFromHashes.
    */
  def gramHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.GramHashes(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** Jaccard of two packedNgrams arrays (sorted distinct ints). */
  def sortedIntJaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SortedIntArrayJaccard(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  // ------------------------------------------------------------- minhash

  /** MinHash signature + LSH banding, fused into one custom codegen'd
    * expression (graft.functions.MinHashBands): `numHashes` hash-family
    * slots minimized over the shingle set, folded into `bands` band
    * keys, all in a single JIT-compiled pass per document. A HOF
    * formulation of the same math evaluates interpreted AND gets
    * re-inlined by CollapseProject into every downstream use — measured
    * ~100× slower on the LSH pipeline.
    */
  def minHashBandKeys(shingles: Column, numHashes: Int, bands: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MinHashBands(
        org.apache.spark.sql.graft.ColumnBridge.expression(shingles),
        numHashes, bands))

  /** SQL-portable variant of [[minHashBandKeys]] (PortableHash family,
    * Horner band fold): slower per row than the xxhash form but every
    * step is replayable by a SQL oracle, so the full LSH pipeline is
    * hash-match checkable end to end. Use the xxhash form in production,
    * this one where independent verification matters.
    */
  def portableMinHashBandKeys(shingles: Column, numHashes: Int, bands: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PortableMinHashBands(
        org.apache.spark.sql.graft.ColumnBridge.expression(shingles),
        numHashes, bands))

  /** Same-bucket candidate pairs from an (id, bands) frame: explode to
    * (bandIdx, bandHash) buckets, self-join within buckets, id1 < id2.
    * This is the scale path — no all-pairs product anywhere.
    */
  def lshCandidatePairs(withBands: DataFrame, idCol: String): DataFrame = {
    // posexplode_outer, NOT posexplode: the non-outer generator implies
    // a size(bands)>0 filter that Catalyst pushes below any repartition,
    // re-inlining the whole (interpreted-HOF) sketch chain into a
    // per-row filter on the unpartitioned scan — measured as the whole
    // query running twice on one core. Band arrays are fixed-length
    // non-empty by construction, so outer semantics are identical.
    val buckets = withBands.select(
      col(idCol),
      posexplode_outer(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()
  }

  /** Every distinct unordered within-block pair exactly once, carrying
    * both sides' payload columns (suffixed _1/_2), with the self-join
    * triangle-salted: each row gets a deterministic sub-block in
    * [0, subBlocks) from its id hash, and the join key becomes
    * (block, u, v) with u ≤ v — so one block fans out over
    * subBlocks·(subBlocks+1)/2 join keys instead of ONE. With a
    * handful of large blocks (the common real shape: block = source /
    * language / prefix), the plain `a.join(b, block)` formulation caps
    * parallelism at the block count no matter how many executors exist;
    * this keeps every core busy at any block size. The (id_1, id_2)
    * orientation of a pair is salt-dependent — normalize with
    * least/greatest downstream if a canonical order matters.
    */
  def saltedBlockPairs(df: DataFrame, blockCol: String, idCol: String,
                       subBlocks: Int): DataFrame = {
    require(subBlocks >= 1, "subBlocks must be >= 1")
    val S = subBlocks
    def side(n: Int): DataFrame =
      df.columns.filterNot(_ == blockCol).foldLeft(df) { (d, c) =>
        d.withColumnRenamed(c, s"${c}_$n")
      }
    // a covers keys (salt, v) for v ≥ salt; b covers (u, salt) for
    // u ≤ salt. A pair with salts sx < sy meets exactly once, at
    // (sx, sy); equal salts meet twice (both orientations), so the
    // diagonal keeps only id_1 < id_2.
    val a = side(1)
      .withColumn("__u", pmod(xxhash64(col(s"${idCol}_1")), lit(S)).cast("int"))
      .withColumn("__v", explode(sequence(col("__u"), lit(S - 1))))
    val b = side(2)
      .withColumn("__v", pmod(xxhash64(col(s"${idCol}_2")), lit(S)).cast("int"))
      .withColumn("__u", explode(sequence(lit(0), col("__v"))))
    a.join(b, Seq(blockCol, "__u", "__v"))
      .filter(col("__u") < col("__v") ||
        col(s"${idCol}_1") < col(s"${idCol}_2"))
      .drop("__u", "__v")
  }

  /** Set Jaccard similarity of two (distinct-element) arrays — built-in
    * formulation; fine for small pair counts (specs, ad-hoc).
    */
  def jaccard(a: Column, b: Column): Column = {
    val union = size(array_union(a, b))
    // two empty sets: define jac = 0 (not 0/0 = NaN), matching
    // JaccardHelper so the two formulations are true drop-ins
    when(union === 0, 0.0)
      .otherwise(size(array_intersect(a, b)).cast("double") / union)
  }

  /** Set Jaccard of two SORTED distinct arrays via the custom merge-count
    * expression — no per-pair hash-set allocation; the sort happens once
    * per document before the pair join. Use this in verify stages that
    * score hundreds of thousands of candidate pairs.
    */
  def sortedJaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SortedArrayJaccard(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over a token array via the custom codegen'd
    * expression (graft.functions.SimHash64): per bit position, tokens
    * vote +1/−1 by their xxhash64 bit; the sign becomes the fingerprint
    * bit. One tight loop per document.
    */
  def simHash(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SimHash64(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))

  /** SQL-portable variant of [[simHash]] (PortableHash slot-parity
    * votes): slower per token than the xxhash form, but an oracle can
    * recompute the fingerprint — and since 4×16-bit banding is sound
    * AND complete for hamming ≤ 3, the oracle then checks the whole
    * near-pair mining against a brute-force hamming join.
    */
  def portableSimHash(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PortableSimHash64(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))

  /** 16-bit SimHash bands (4 per fingerprint): two fingerprints within
    * hamming distance 3 of each other agree on ≥1 band, so banding is a
    * sound candidate filter for d ≤ 3.
    */
  def simHashBands(simhashColName: String): Column = expr(
    s"transform(sequence(0, 3), i -> shiftright($simhashColName, i * 16) & 65535)")

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** All (id1 < id2) pairs whose 64-bit fingerprints are within hamming
    * distance `maxHamming` (≤ 3: pigeonhole soundness over the 4 16-bit
    * bands), from an (idCol, hashCol) frame.
    *
    * Identical fingerprints are collapsed BEFORE banding: on a
    * duplicate-heavy corpus every identical pair otherwise collides on
    * all four bands and low-entropy fingerprints cluster band buckets,
    * making within-bucket pairing quadratic in the duplicate count.
    * Banding therefore runs over DISTINCT fingerprints only; hamming is
    * computed directly on the fingerprint pair (no join-back); doc pairs
    * re-expand via two hash joins on the fingerprint. The equal-
    * fingerprint (hamming-0) pairs come from a same-key self-join — its
    * output IS the answer's duplicate-pair list, so its size is bounded
    * by the result, not an intermediate blowup.
    */
  def simHashNearPairs(fps: DataFrame, idCol: String, hashCol: String,
                       maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band LSH is only sound for hamming <= 3")
    val distinctFp = fps.select(col(hashCol)).distinct()
      .withColumn("bands", simHashBands(hashCol))
    val fpPairs = lshCandidatePairs(
        distinctFp.select(col(hashCol), col("bands")), hashCol)
      .select(col("id1").as("__h1"), col("id2").as("__h2"))
      .withColumn("hamming", hamming(col("__h1"), col("__h2")))
      .filter(col("hamming") <= maxHamming)
    val cross = fpPairs
      .join(fps.select(col(idCol).as("__d1"), col(hashCol).as("__h1")), Seq("__h1"))
      .join(fps.select(col(idCol).as("__d2"), col(hashCol).as("__h2")), Seq("__h2"))
      .select(
        least(col("__d1"), col("__d2")).as("id1"),
        greatest(col("__d1"), col("__d2")).as("id2"),
        col("hamming"))
    val within = fps.select(col(idCol).as("__d1"), col(hashCol).as("__h"))
      .join(fps.select(col(idCol).as("__d2"), col(hashCol).as("__h")), Seq("__h"))
      .filter(col("__d1") < col("__d2"))
      .select(col("__d1").as("id1"), col("__d2").as("id2"),
        lit(0).as("hamming"))
    cross.unionByName(within)
  }
}
