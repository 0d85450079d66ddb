package graft.ops

import org.apache.spark.sql.Column

/** JHU country-name → World-Bank-style name normalization.
  *
  * Semantics = the 15-branch CASE expression at `process_covid_ods.py:42-59`.
  * Kept as a folded `when` chain (a single codegen'd CASE, no join, no
  * shuffle) rather than a lookup-table join: at 100 TB a broadcast join
  * would also work, but a CASE over ~15 literals is strictly cheaper and
  * preserves first-match-wins semantics.
  */
object CountryMap {

  val mapping: Seq[(String, String)] = Seq(
    "US" -> "United States",
    "Korea, South" -> "Korea, Rep.",
    "Taiwan*" -> "Taiwan",
    "Hong Kong" -> "Hong Kong SAR, China",
    "Iran (Islamic Republic of)" -> "Iran, Islamic Rep.",
    "Russia" -> "Russian Federation",
    "Mainland China" -> "China",
    "Turkey" -> "Turkiye",
    "Vietnam" -> "Viet Nam",
    "Burma" -> "Myanmar",
    "Slovakia" -> "Slovak Republic",
    "Kyrgyzstan" -> "Kyrgyz Republic",
    "Egypt" -> "Egypt, Arab Rep.",
    "Iran" -> "Iran, Islamic Rep.",
    "Venezuela" -> "Venezuela, RB"
  )

  /** `normalize(col("country_region"))` — a CASE column. */
  def normalize(c: Column): Column =
    graft.functions.Exprs.whenChain(c, mapping)
}
