package graft.layers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.runtime.Catalog

/** data_mart layer: the flagship analytics query.
  *
  * Re-expresses the 3-CTE SQL at `process_covid_data_mart.py:50-115` as a
  * DataFrame chain with identical semantics:
  *  - raw_joined: fact INNER JOIN dim on `location_key` (J2, broadcast),
  *    null/positivity guards on the dim side (P5/P6), active-case
  *    arithmetic (F12);
  *  - calc_deltas: day-over-day `LAG` over (country, date) wrapped in
  *    `GREATEST(COALESCE(Δ, 0), 0)` (W1, F4, F14);
  *  - calc_advanced: per-100k rate with `CAST(ROUND(...) AS LONG)` (F7,
  *    F13), guarded-division fatality/recovery rates (F3);
  *  - final CASE risk bucketing (F2) and the run-date filter **above** the
  *    window (SURVEY §7.5: the LAG must see history, so the date predicate
  *    is applied after windowing — Catalyst correctly keeps it there).
  *
  * Scale note: the window shuffles on `country_name` once; everything
  * before it is a broadcast join over a pruned fact scan. At 100 TB the
  * only wide exchange is the window partition-by, which is unavoidable
  * for LAG semantics.
  */
object MartLayer {
  val layer = "data_mart"
  val table = "covid_analytics"

  /** Full-history analytics (no date filter) — the 3 CTEs. */
  def analytics(fact: DataFrame, dim: DataFrame): DataFrame = {
    val rawJoined = fact
      .join(broadcast(dim), Seq("location_key"), "inner")
      .where(col("country_name").isNotNull &&
        col("population").isNotNull && col("population") > 0)
      .select(
        col("report_date"), col("country_name"), col("population"),
        col("confirmed").as("total_confirmed"),
        col("deaths").as("total_deaths"),
        col("recovered").as("total_recovered"),
        (col("confirmed") - col("deaths") - col("recovered"))
          .as("current_active_cases"))

    val w = Window.partitionBy(col("country_name")).orderBy(col("report_date"))
    val calcDeltas = rawJoined
      .withColumn("new_cases_today",
        greatest(coalesce(col("total_confirmed") - lag(col("total_confirmed"), 1).over(w),
          lit(0L)), lit(0L)))
      .withColumn("new_deaths_today",
        greatest(coalesce(col("total_deaths") - lag(col("total_deaths"), 1).over(w),
          lit(0L)), lit(0L)))

    val calcAdvanced = calcDeltas
      .withColumn("cases_per_100k",
        round((col("total_confirmed") / col("population")) * 100000, 0).cast("long"))
      .withColumn("fatality_rate_percent",
        when(col("total_confirmed") > 0,
          round((col("total_deaths") / col("total_confirmed")) * 100, 2))
          .otherwise(lit(0.0)))
      .withColumn("recovery_rate_percent",
        when(col("total_confirmed") > 0,
          round((col("total_recovered") / col("total_confirmed")) * 100, 2))
          .otherwise(lit(0.0)))

    calcAdvanced.withColumn("risk_category",
      when(col("cases_per_100k") > 5000, "Critical")
        .when(col("cases_per_100k") > 1000, "High")
        .when(col("cases_per_100k") > 100, "Medium")
        .otherwise("Low"))
  }

  /** One run-date slice, column order matching the mart DDL
    * (process_covid_data_mart.py:29-47,92-114).
    */
  def slice(fact: DataFrame, dim: DataFrame, reportDate: String): DataFrame =
    analytics(fact, dim)
      .where(col("report_date") === lit(reportDate).cast("date"))
      .select("report_date", "country_name", "population", "total_confirmed",
        "total_deaths", "total_recovered", "current_active_cases",
        "new_cases_today", "new_deaths_today", "cases_per_100k",
        "fatality_rate_percent", "recovery_rate_percent", "risk_category")

  def run(cat: Catalog, reportDate: String): Unit = {
    val df = slice(
      cat.table(DdsLayer.layer, DdsLayer.factTable),
      cat.table(DdsLayer.layer, DdsLayer.dimTable),
      reportDate)
    cat.overwritePartitionsByName(df, layer, table, Seq("report_date"))
  }
}
