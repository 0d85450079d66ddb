package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.layers.{AlertsLayer, PopulationLayer}
import graft.runtime.Catalog

class PopulationLayerSpec extends SparkSpec {
  import spark.implicits._

  private def popDf(rows: (String, String, Int, Long)*) =
    rows.toDF("country", "country_code", "year", "population")

  test("seedIfEmpty seeds a missing table and no-ops on a populated one") {
    val cat = Catalog(spark, tmpDir("pop-wh"))
    var sourceReads = 0
    def source = { sourceReads += 1; popDf(("United States", "US", 2020, 331000000L)) }

    assert(PopulationLayer.seedIfEmpty(cat, source))
    assert(sourceReads == 1)
    assert(cat.read("raw", "country_population").count() == 1)

    // populated → no-op AND the source is never evaluated (C4 branch)
    assert(!PopulationLayer.seedIfEmpty(cat,
      { sourceReads += 1; popDf(("Other", "OT", 2021, 1L)) }))
    assert(sourceReads == 1)
    assert(cat.read("raw", "country_population")
      .select("country").as[String].head() == "United States")
  }

  test("seedIfEmpty conforms drifted source columns and re-seeds an empty table") {
    val cat = Catalog(spark, tmpDir("pop-wh-2"))
    cat.createOrReplace(popDf().limit(0), "raw", "country_population") // empty
    val drifted = popDf(("Germany", "DE", 2020, 83000000L))
      .withColumn("extra_jdbc_col", lit("noise"))
    assert(PopulationLayer.seedIfEmpty(cat, drifted))
    val seeded = cat.read("raw", "country_population")
    assert(seeded.columns.toSeq ==
      Seq("country", "country_code", "year", "population"))
    assert(seeded.count() == 1)
  }

  test("jdbcReader round-trips through an in-process Derby database") {
    // the one executed pass of the federated-scan path: embedded Derby
    // (already on Spark's classpath) stands in for the reference's
    // PostgreSQL-behind-Trino source — same reader, same options
    val url = "jdbc:derby:memory:graftpop;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE country_population (
          |  country VARCHAR(64), country_code VARCHAR(8),
          |  "year" INT, population BIGINT)""".stripMargin)
      st.execute(
        "INSERT INTO country_population VALUES ('United States','US',2020,331000000)")
      st.execute(
        "INSERT INTO country_population VALUES ('France','FR',2020,67000000)")
    } finally conn.close()

    val df = PopulationLayer
      .jdbcReader(spark, url, "country_population", "", "")
      .load()
    val rows = df.orderBy("country_code")
      .as[(String, String, Int, Long)].collect().toSeq
    assert(rows == Seq(
      ("France", "FR", 2020, 67000000L),
      ("United States", "US", 2020, 331000000L)))

    // and the seed path consumes the federated frame end to end
    val cat = Catalog(spark, tmpDir("pop-jdbc-wh"))
    assert(PopulationLayer.seedIfEmpty(cat, df))
    assert(cat.read("raw", "country_population").count() == 2)
  }

  test("alert digest renders a per-country HTML list, None when empty") {
    val alerts = Seq(
      (Date.valueOf("2020-03-01"), "Italy", "case_spike", "high", 0.1, "case rate 0.100% exceeds threshold"),
      (Date.valueOf("2020-03-01"), "Spain", "incidence", "medium", 12.0, "incidence > 10 & rising"),
      (Date.valueOf("2020-02-29"), "France", "case_spike", "high", 0.2, "previous day"))
      .toDF("alert_date", "country", "alert_type", "severity", "metric_value", "description")
    val html = AlertsLayer.renderDigest(alerts, "2020-03-01").get
    assert(html.startsWith("<h3>New COVID alerts for 2020-03-01</h3><ul>"))
    assert(html.contains("<li>Italy: case rate 0.100% exceeds threshold</li>"))
    assert(html.contains("<li>Spain: incidence &gt; 10 &amp; rising</li>")) // escaped
    assert(!html.contains("France")) // other dates excluded
    assert(html.endsWith("</ul>"))
    assert(AlertsLayer.renderDigest(alerts, "2021-01-01").isEmpty)
  }
}
