package graft.schema

import org.apache.spark.sql.types._

/** Fixed target schemas of the pipeline's layers.
  *
  * Mirrors the reference's declared schemas:
  *  - raw daily report: `process_covid_raw.py:6-21` (14-field StructType)
  *  - population dim source: `population_to_s3.py:41-50`
  *  - mart: `process_covid_data_mart.py:28-48`
  *  - alerts row store: `covid_alerts_dag.py:17-28`
  */
object Schemas {

  /** Target schema for drift-normalized daily reports (process_covid_raw.py:6-21). */
  val rawDailyReport: StructType = StructType(Seq(
    StructField("FIPS", StringType),
    StructField("Admin2", StringType),
    StructField("Province_State", StringType),
    StructField("Country_Region", StringType),
    StructField("Last_Update", TimestampType),
    StructField("Lat", DoubleType),
    StructField("Long_", DoubleType),
    StructField("Confirmed", LongType),
    StructField("Deaths", LongType),
    StructField("Recovered", LongType),
    StructField("Active", LongType),
    StructField("Combined_Key", StringType),
    StructField("Incident_Rate", DoubleType),
    StructField("Case_Fatality_Ratio", DoubleType)
  ))

  /** Country population source table (population_to_s3.py:41-50). */
  val countryPopulation: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("country_code", StringType),
    StructField("year", IntegerType),
    StructField("population", LongType)
  ))

  /** Mart analytics table (process_covid_data_mart.py:29-47). */
  val covidAnalytics: StructType = StructType(Seq(
    StructField("report_date", DateType),
    StructField("country_name", StringType),
    StructField("population", LongType),
    StructField("total_confirmed", LongType),
    StructField("total_deaths", LongType),
    StructField("total_recovered", LongType),
    StructField("current_active_cases", LongType),
    StructField("new_cases_today", LongType),
    StructField("new_deaths_today", LongType),
    StructField("cases_per_100k", LongType),
    StructField("fatality_rate_percent", DoubleType),
    StructField("recovery_rate_percent", DoubleType),
    StructField("risk_category", StringType)
  ))

  /** Alerts row store (covid_alerts_dag.py:18-27), minus the serial PK. */
  val covidAlerts: StructType = StructType(Seq(
    StructField("alert_date", DateType),
    StructField("country", StringType),
    StructField("alert_type", StringType),
    StructField("severity", StringType),
    StructField("metric_value", DoubleType),
    StructField("description", StringType),
    StructField("created_at", TimestampType)
  ))
}
