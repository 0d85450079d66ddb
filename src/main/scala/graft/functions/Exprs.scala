package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small reusable expression builders (all Catalyst built-ins, codegen'd). */
object Exprs {

  /** First-match-wins CASE chain from literal pairs (F1 family —
    * process_covid_ods.py:42-59). One codegen'd CASE, no join/shuffle.
    */
  def whenChain(c: Column, mapping: Seq[(String, String)]): Column =
    mapping.foldLeft(Option.empty[Column]) { case (acc, (from, to)) =>
      Some(acc.fold(when(c === from, to))(_.when(c === from, to)))
    }.fold(c)(_.otherwise(c))

  /** Deterministic sha-256 surrogate key over (name, discriminator) —
    * F10, process_covid_dds.py:35.
    */
  def surrogateKey(name: Column, discriminator: Column): Column =
    sha2(concat(upper(trim(name)), discriminator.cast("string")), 256)

  /** Exact, order-independent SUM of a 2-decimal double column: route
    * through decimal(18,2) so Spark and any oracle produce bit-identical
    * doubles regardless of partitioning (SURVEY §7.5 float determinism).
    */
  def exactSum2(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")
}
