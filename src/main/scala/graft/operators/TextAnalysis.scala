package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for a large-scale training-data pipeline:
  * tokenization, language-ID heuristics, quality scoring, fingerprinting.
  *
  * All of it is pure Catalyst built-ins (no UDFs) so every column stays
  * inside whole-stage codegen and distributes trivially: each document is
  * scored independently — no shuffle, no state, scan-bound at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens (split on runs of whitespace). */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  def wsTokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish lexer token count: letter runs, digit runs, then any single
    * non-space symbol — the classic pre-tokenizer shape.
    */
  def lexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Occurrences of `word` as a standalone token: count matching
    * elements of the whitespace tokenization. (An earlier
    * replace-counting formulation undercounted CONSECUTIVE occurrences —
    * "the the" counted 1 — because each replace consumed the boundary
    * space the next match needed; token-filter counting has no boundary
    * sharing. Regex lookaround would too, but RE2-based engines can't
    * oracle-check it.)
    */
  def occurrences(text: Column, word: String): Column =
    size(filter(wsTokens(text), t => t === word))

  /** Marker words per language for the n-gram/stopword heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "et"))

  /** Per-language marker score: total standalone occurrences. */
  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(occurrences(text, _))
      .reduce(_ + _)

  /** Argmax language with deterministic first-wins tie-break in
    * langMarkers order (so 'en' wins full ties).
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(Option.empty[Column]) { case (acc, (l, s)) =>
      Some(acc.fold(when(s === best, l))(_.when(s === best, l)))
    }.get.otherwise(lit("und"))
  }

  /** Count of punctuation/symbol characters. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9\\s]", ""))

  /** Characters excluding whitespace — the numerator for chars/token. */
  def nonSpaceChars(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  /** Quality features + a CASE-bucketed verdict: the length / punctuation
    * / stopword-ratio heuristics of a pretraining quality filter.
    */
  def stopwordRatio(text: Column): Column =
    (occurrences(text, "the") + occurrences(text, "a") +
      occurrences(text, "and") + occurrences(text, "of")).cast("double") /
      wsTokenCount(text)

  def qualityBucket(nTokens: Column, punctRatio: Column,
                    stopRatio: Column): Column =
    when(nTokens < 5, "too_short")
      .when(punctRatio > 0.3, "symbol_spam")
      .when(stopRatio > 0.4, "boilerplate")
      .otherwise("ok")

  /** Document fingerprint: sha-256 of whitespace-collapsed, lowercased,
    * trimmed text — the exact-dedup key (process_covid_dds.py:35 uses the
    * same sha2-surrogate shape for dimension keys).
    */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** First-2-token blocking key shared by the exact (q20) and
    * edit-distance (q59) dedup paths — one definition so the two can
    * never block differently. The fused textFeatures struct computes
    * the identical key for the paths that need the other features too.
    */
  def prefixKey(text: Column): Column =
    concat_ws(" ", slice(wsTokens(text), 1, 2))

  /** The same blocking key as DuckDB SQL text, for oracle generation. */
  val prefixKeySql: String =
    """array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1, 2), ' ')"""

  /** Fused whitespace-token features (n_tokens, stopword occurrences,
    * 2-token prefix key) as one codegen'd struct — one tokenization per
    * row instead of one per feature; see graft.functions.TextFeatures.
    */
  def textFeatures(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TextFeatures(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Stopword ratio derived from a textFeatures struct column. */
  def stopwordRatioFrom(tf: Column): Column =
    (tf.getField("occ_the") + tf.getField("occ_a") +
      tf.getField("occ_and") + tf.getField("occ_of")).cast("double") /
      tf.getField("n_tokens")

  /** Winnowing fingerprints (rolling-hash k-grams, window-min selection)
    * via the codegen'd expression — sorted distinct array<long>. Any
    * shared substring of length ≥ k+w−1 between two documents yields a
    * shared fingerprint; see graft.functions.WinnowFingerprint.
    */
  def winnowFingerprints(text: Column, k: Int = 4, w: Int = 5): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.WinnowFingerprint(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), k, w))
}
