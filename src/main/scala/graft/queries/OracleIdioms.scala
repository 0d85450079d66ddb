package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The proven-portable Spark↔DuckDB expression forms, in one place.
  *
  * Every driver-checked query is compared cell-for-cell (stringified,
  * then hashed) against DuckDB running the paired `oracleSql`. Four
  * idiom classes have historically produced engine/oracle mismatches;
  * new queries MUST build on these forms instead of re-deriving them
  * (r07 shipped five hash-reds from exactly these classes —
  * VERDICT.md "What's wrong").
  *
  * 1. '''Result dtype''' (the r07 root cause): DuckDB's `sum()` over
  *    integers returns HUGEINT, which pandas renders as float64 — so an
  *    uncast sum-derived oracle column hashes as `"5.0"` against
  *    Spark's `"5"` even when numerically identical. EVERY oracle
  *    output column derived from `sum()` (directly, via window sum, or
  *    via arithmetic over one) must be wrapped [[bi]].
  *    `tools/check.py` fails on int-vs-float dtype divergence since r08.
  * 2. '''Integer division''': Spark `div` truncates toward zero; DuckDB
  *    1.0 `//` does too (verified empirically; `-7 // 2 = -3`), so
  *    `div`/`//` pair safely — but only the FLOOR pair is
  *    version-proof (Python, PostgreSQL `div()`, and some engines
  *    floor). For negative-capable dividends prefer [[floorDiv]] +
  *    [[floorDivSql]], which agree under BOTH division semantics
  *    because the adjusted dividend is an exact multiple of the
  *    divisor.
  * 3. '''Signed modulo''': Spark `%` and DuckDB `%` both keep the
  *    dividend's sign. For a canonical non-negative residue use Spark
  *    `pmod` with [[posModSql]] on the oracle side.
  * 4. '''Whitespace tokenization''': Spark `split(trim(s), "\\s+")`
  *    and DuckDB `string_split_regex(trim(s), '\s+')` agree, INCLUDING
  *    the degenerate case (empty/whitespace-only input → `['']`, one
  *    empty token — not `[]`). Queries that must not see the empty
  *    token filter it EXPLICITLY on both sides ([[wsTokensNonEmpty]] /
  *    [[wsTokensNonEmptySql]]); relying on one engine's split to drop
  *    it silently is not portable.
  *
  * All four classes are property-tested against in-JVM references in
  * `PropertiesSpec` ("portable idiom:" tests).
  */
object OracleIdioms {

  /** Oracle-side cast forcing a BIGINT (int64) result column. Wrap every
    * sum-derived oracle output column — see class note 1.
    */
  def bi(sql: String): String = s"CAST(($sql) AS BIGINT)"

  /** Floor division a/b (b > 0) that evaluates identically under
    * truncating AND flooring integer division: subtracting the
    * non-negative residue first makes the dividend an exact multiple,
    * where the two semantics coincide.
    */
  def floorDiv(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)

  /** DuckDB-side twin of [[floorDiv]]; `((a % b) + b) % b` is the
    * non-negative residue for b > 0 regardless of `%` sign convention.
    */
  def floorDivSql(a: String, b: String): String =
    bi(s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) // ($b)")

  /** DuckDB-side non-negative residue, pairing with Spark `pmod`. */
  def posModSql(a: String, m: String): String =
    s"((($a) % ($m)) + ($m)) % ($m)"

  /** Whitespace tokens with the degenerate empty token removed — use
    * with [[wsTokensNonEmptySql]] when empty/whitespace-only documents
    * must contribute ZERO tokens rather than one empty one.
    */
  def wsTokensNonEmpty(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** DuckDB-side twin of [[wsTokensNonEmpty]]. */
  def wsTokensNonEmptySql(col: String): String =
    s"list_filter(string_split_regex(trim($col), '\\s+'), t -> t <> '')"
}
