package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative row-level data-quality expectations.
  *
  * The pattern the reference enforces ad hoc (null screens before the
  * mart CTEs, `covid_mart.sql`'s `WHERE country_region IS NOT NULL`,
  * the alert rules' threshold guards) generalized into a rule table: a
  * named predicate per expectation, applied in ONE projection pass,
  * with failing rows routed to a quarantine frame that carries the
  * COMPLETE list of violated rules — remediation wants every reason,
  * not the first (contrast q129's filter funnel, where first-failure
  * attribution is the accounting convention for additive stage
  * counts).
  *
  * Semantics: a predicate that evaluates to NULL counts as a
  * violation (`coalesce(p, false)`): data quality asks "provably
  * fine?", not SQL CHECK's "not provably broken?" — a null-valued
  * guard expression is exactly the dirty row the rule exists to catch.
  *
  * Scale shape: the rule evaluation is a pure projection (all
  * codegen'd built-ins, no shuffle); both returned frames filter the
  * same tagged plan, so a caller consuming both should materialize
  * upstream once (the layers do). Quarantine carries full row
  * provenance the same way the JSON ingest quarantine does.
  */
object Expectations {

  /** One named expectation; `predicate` must hold for a row to pass. */
  final case class Rule(name: String, predicate: Column)

  /** Tag every row with its violated-rule names (empty array = clean). */
  def tag(df: DataFrame, rules: Seq[Rule],
          failedCol: String = "failed_rules"): DataFrame = {
    require(rules.nonEmpty, "expectations need at least one rule")
    require(!df.columns.contains(failedCol),
      s"'$failedCol' collides with an input column; pass a distinct failedCol")
    val verdicts = array(rules.map { r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name))
    }: _*)
    df.withColumn(failedCol, filter(verdicts, v => v.isNotNull))
  }

  /** Split into (clean, quarantined-with-failed_rules). Exhaustive and
    * exclusive: every input row lands in exactly one frame.
    */
  def enforce(df: DataFrame, rules: Seq[Rule],
              failedCol: String = "failed_rules")
  : (DataFrame, DataFrame) = {
    val tagged = tag(df, rules, failedCol)
    (tagged.filter(size(col(failedCol)) === 0).drop(failedCol),
      tagged.filter(size(col(failedCol)) > 0))
  }
}
