package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ops.Normalize
import graft.schema.Schemas

/** Drift matrix from process_covid_raw.py:36-51: aliases, multi-format
  * timestamps, missing columns → typed nulls, exact output schema.
  */
class NormalizeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("clean names: strip, slash/space/dash to underscore") {
    assert(Normalize.cleanName(" Province/State ") == "Province_State")
    assert(Normalize.cleanName("Case-Fatality Ratio") == "Case_Fatality_Ratio")
  }

  test("early-2020 6-column format conforms to the 14-field target") {
    val schema = StructType(Seq(
      StructField("Province/State", StringType),
      StructField("Country/Region", StringType),
      StructField("Last Update", StringType),
      StructField("Confirmed", IntegerType),
      StructField("Deaths", IntegerType),
      StructField("Recovered", IntegerType)))
    val df = spark.createDataFrame(
      List(Row("Hubei", "Mainland China", "1/22/2020 17:00", 444, 17, 28)).asJava,
      schema)
    val out = Normalize(df, Schemas.rawDailyReport)
    assert(out.schema == Schemas.rawDailyReport)
    val r = out.collect()(0)
    assert(r.getAs[String]("Province_State") == "Hubei")
    assert(r.getAs[String]("Country_Region") == "Mainland China")
    assert(r.getAs[Long]("Confirmed") == 444L)
    assert(r.getAs[java.sql.Timestamp]("Last_Update").toString == "2020-01-22 17:00:00.0")
    assert(r.isNullAt(r.fieldIndex("FIPS")))          // missing → typed null
    assert(r.isNullAt(r.fieldIndex("Incident_Rate")))
  }

  test("Latitude/Longitude aliases resolve to Lat/Long_") {
    val schema = StructType(Seq(
      StructField("Country_Region", StringType),
      StructField("Latitude", DoubleType),
      StructField("Longitude", DoubleType)))
    val df = spark.createDataFrame(
      List(Row("France", 46.2, 2.2)).asJava, schema)
    val r = Normalize(df, Schemas.rawDailyReport).collect()(0)
    assert(r.getAs[Double]("Lat") == 46.2)
    assert(r.getAs[Double]("Long_") == 2.2)
  }

  test("multi-format timestamps: ISO, M/d/yyyy H:mm, yyyy-MM-dd HH:mm:ss") {
    val schema = StructType(Seq(StructField("Last_Update", StringType)))
    val df = spark.createDataFrame(List(
      Row("2020-03-22T23:45:00"),
      Row("3/22/2020 23:45"),
      Row("2020-03-22 23:45:00"),
      Row("garbage")).asJava, schema)
    val out = Normalize(df, Schemas.rawDailyReport)
      .select("Last_Update").collect().map(r => Option(r.get(0)).map(_.toString))
    assert(out(0).contains("2020-03-22 23:45:00.0"))
    assert(out(1).contains("2020-03-22 23:45:00.0"))
    assert(out(2).contains("2020-03-22 23:45:00.0"))
    assert(out(3).isEmpty) // unparseable → null, not an error
  }

  test("already-conformant input is a no-op projection") {
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.rawDailyReport)
    assert(Normalize(df, Schemas.rawDailyReport).schema == Schemas.rawDailyReport)
  }
}
