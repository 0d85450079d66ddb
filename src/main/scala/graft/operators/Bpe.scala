package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.runtime.Materialize

/** Iterative BPE tokenizer training (Sennrich et al., ACL 2016) —
  * the merge-table learner a real tokenizer build runs, not just one
  * round's pair census.
  *
  * Scale design, in order of importance:
  *
  *  1. **Train over the word-frequency table, not the token stream.**
  *     BPE's pair statistics are identical computed over
  *     (distinct word, count) as over the raw corpus, and the
  *     vocabulary is bounded (millions) while the corpus is not
  *     (100 TB). The corpus is touched exactly once, by the word
  *     count aggregate; every merge round is vocabulary-scale.
  *  2. **Merge application is a single codegen'd `replace`.** Each
  *     word's symbol sequence is one string: symbols joined by a
  *     doubled U+001F separator and wrapped in single ones
  *     (`␟l␟␟r␟` …). Applying merge (l, r) greedily left-to-right,
  *     non-overlapping — exactly BPE's application rule — is then
  *     `replace(repr, "␟l␟␟r␟", "␟lr␟")`: string replace scans left
  *     to right and resumes AFTER each replacement. The doubled
  *     interior separator keeps adjacent matches disjoint (a shared
  *     single separator would make the scan skip every second
  *     occurrence in a run) while the single outer/inner flanks make
  *     a false match impossible: symbols cannot contain the
  *     separator, so any `␟x␟␟y␟` window is a complete symbol pair.
  *  3. **Same loop discipline as connected components**
  *     (`Clusters.connectedComponents`): each generation of word
  *     representations is materialized ([[Materialize.once]]) so the
  *     next round's two consumers (pair census, rewrite) don't replay
  *     the whole merge history, and the previous generation's blocks
  *     are freed as soon as the next is live.
  *
  * Per round: one vocabulary-scale pair aggregate, a top-1 decision
  * (count desc, then (l, r) ascending — the deterministic tie-break),
  * and one projection-only rewrite. The only driver transfer is the
  * single winning row per round.
  *
  * Reference anchor: the reference's pipeline has no tokenizer
  * trainer — this is part of the LLM-data-pipeline extension tier
  * (driver brief), built on the same pair census as q97.
  *
  * Input: words(w: string, cnt: long) — w non-empty, free of U+001F.
  * Output: one row per learned merge,
  * (round int, l string, r string, merged string, cnt long).
  */
object Bpe {
  /** Separator; U+001F (unit separator) never appears in text. */
  val Sep = "\u001f"

  /** One learned merge: l + r -> merged, chosen with frequency c. */
  final case class Merge(round: Int, l: String, r: String,
                         merged: String, c: Long)

  /** A word as its separator-delimited initial (single-character)
    * symbol sequence.
    */
  def reprOf(w: Column): Column =
    concat(lit(Sep), array_join(split(w, ""), Sep + Sep), lit(Sep))

  /** Apply a learned merge list to a representation column -- the
    * TOKENIZE step. Each merge is one codegen'd literal `replace`
    * (greedy left-to-right, BPE's application rule; see the class
    * doc), chained in training order, exactly how a trained BPE
    * tokenizer applies its merge table.
    */
  def applyMerges(repr: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(repr)((c, m) =>
      replace(c, lit(Sep + m.l + Sep + Sep + m.r + Sep),
        lit(Sep + m.merged + Sep)))

  /** Token count of a representation: number of symbols. */
  def tokenCount(repr: Column): Column =
    size(split(repr.substr(lit(2), length(repr) - 2), Sep + Sep))

  def train(words: DataFrame, rounds: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    trainMerges(words, rounds)
      .map(m => (m.round, m.l, m.r, m.merged, m.c))
      .toDF("round", "l", "r", "merged", "cnt")
  }

  /** The training loop itself, returning the merge table as a driver
    * value (bounded: `rounds` rows) for reuse by the apply step.
    */
  def trainMerges(words: DataFrame, rounds: Int): Seq[Merge] = {
    val SS = Sep + Sep
    // initial symbols = single characters: ␟c1␟␟c2␟␟…␟cn␟
    var reprs = words.select(
      concat(lit(Sep), array_join(split(col("w"), ""), SS), lit(Sep))
        .as("repr"),
      col("cnt"))
      .transform(Materialize.once)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // previous generation, freed only AFTER the census action has
    // materialized the current one (the census is the first action
    // over `reprs`, so it doubles as the materialization barrier — no
    // separate count() job per round)
    var prev: Option[DataFrame] = None
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // pair census over the current symbolization, weighted by word
      // frequency; the (c desc, l, r) total order + limit(1) plans as
      // TakeOrderedAndProject — no global sort materializes
      val best = reprs
        .select(
          split(expr("substring(repr, 2, length(repr) - 2)"), SS).as("t"),
          col("cnt"))
        .filter(size(col("t")) >= 2)
        .select(
          explode(expr(
            "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS l, t[i + 1] AS r))"))
            .as("p"),
          col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect() // 1 row: the round's merge decision
      prev.foreach(Materialize.free) // current gen is now materialized
      prev = None
      if (best.isEmpty) exhausted = true // every word is one symbol
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(round, l, r, l + r, c)
        val next = reprs.select(
          replace(col("repr"),
            lit(Sep + l + SS + r + Sep), lit(Sep + l + r + Sep)).as("repr"),
          col("cnt"))
          .transform(Materialize.once)
        prev = Some(reprs)
        reprs = next
      }
      round += 1
    }
    prev.foreach(Materialize.free)
    Materialize.free(reprs)
    merges.toSeq
  }
}
