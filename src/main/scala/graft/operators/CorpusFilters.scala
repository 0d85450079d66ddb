package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level quality filtering for LLM training data, after the
  * published rule families: Gopher's document heuristics (Rae et al.
  * 2021, "Scaling Language Models", §A1.1) and C4's cleanup rules
  * (Raffel et al. 2020). All signals are Catalyst built-ins over the
  * text column — per-document, shuffle-free, scan-bound at 100 TB — and
  * every rule is plain arithmetic a SQL oracle replays exactly.
  *
  * The repetition detector (duplicate n-gram fraction, Gopher §A1.1's
  * "repetition" family) is the one relational member: it explodes token
  * n-grams and two-stage-aggregates, so its cost is one partial-agg
  * shuffle keyed on (doc, gram) — map-side combine collapses repeated
  * grams before anything crosses the wire.
  */
object CorpusFilters {

  /** Characters that are neither alphanumeric nor whitespace, as a
    * fraction of all characters — Gopher's symbol-ratio family.
    */
  def symbolRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1))

  /** Mean word length: non-whitespace characters over token count.
    * Gopher keeps documents with mean word length in a sane band
    * (their published band is [3, 10]).
    */
  def meanWordLen(text: Column, nTokens: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(nTokens, lit(1))

  /** How many of the common-stopword markers appear as standalone
    * tokens (Gopher requires ≥2 of a small stopword set; we score
    * presence of each of the TextFeatures markers). Takes the fused
    * textFeatures struct so the tokenization is shared with the other
    * token-derived signals.
    */
  def stopwordHits(tf: Column): Column =
    (tf.getField("occ_the") > 0).cast("int") +
      (tf.getField("occ_a") > 0).cast("int") +
      (tf.getField("occ_and") > 0).cast("int") +
      (tf.getField("occ_of") > 0).cast("int")

  /** The Gopher-style keep decision for one document. Thresholds are
    * parameters (the published ones target web text; callers tune per
    * corpus).
    */
  def gopherKeep(nTokens: Column, meanWl: Column, symRatio: Column,
                 stopHits: Column,
                 minTokens: Int, maxTokens: Int,
                 minMeanWl: Double, maxMeanWl: Double,
                 maxSymbolRatio: Double, minStopHits: Int): Column =
    nTokens.geq(minTokens) && nTokens.leq(maxTokens) &&
      meanWl.geq(minMeanWl) && meanWl.leq(maxMeanWl) &&
      symRatio.leq(maxSymbolRatio) && stopHits.geq(minStopHits)

  /** Per-document duplicate n-gram profile: total n-gram occurrences
    * and the count of the most frequent n-gram. The duplicate-fraction
    * (max/total) is Gopher's repetition signal — a document whose top
    * bigram covers a large fraction of the text is boilerplate or a
    * generation loop. Output: (idCol, n_grams, max_gram_count).
    */
  def topNgramProfile(docs: DataFrame, idCol: String, tokensCol: String,
                      n: Int): DataFrame =
    docs
      // explode_outer: plain explode implies size(..)>0, which pushes
      // below the scan and re-inlines the (interpreted HOF) shingle
      // chain into a per-row filter — see Dedup.lshCandidatePairs
      .select(col(idCol),
        explode_outer(Dedup.allShingles(col(tokensCol), n)).as("__gram"))
      // a null token array (null text) survives explode_outer as one
      // null-gram row; drop it so such docs produce NO profile — the
      // relational twin (unnest) drops them identically. This filter is
      // on the generator OUTPUT, so it cannot be pushed below the
      // generate and re-inline the shingle chain.
      .filter(col("__gram").isNotNull)
      .groupBy(col(idCol), col("__gram"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__cnt")).as("n_grams"),
        max(col("__cnt")).as("max_gram_count"))
}
