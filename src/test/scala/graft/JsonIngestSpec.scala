package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.layers.RawLayer
import graft.runtime.Catalog

class JsonIngestSpec extends SparkSpec {

  test("ndjson feed conforms through the same drift pipeline as CSV") {
    val dir = tmpDir("json-feed")
    // per-file dialects, like the real feed: one modern file, one
    // legacy-alias file with missing columns (drift is ACROSS files)
    val modern = s"$dir/2021-06-01.json"
    Files.write(Paths.get(modern),
      """{"Province_State":"Hubei","Country_Region":"Mainland China","Last_Update":"2021-06-01 04:00:00","Confirmed":101,"Deaths":7}"""
        .getBytes)
    val legacy = s"$dir/2020-02-01.json"
    Files.write(Paths.get(legacy),
      """{"Country/Region":"US","Last Update":"2020-02-01 04:00:00","Confirmed":55,"Deaths":2}"""
        .getBytes)

    val cat = Catalog(spark, tmpDir("json-wh"))
    val clock = Some(Timestamp.valueOf("2024-01-01 00:00:00"))
    RawLayer.ingestJson(cat, modern, fixedClock = clock)
    RawLayer.ingestJson(cat, legacy, fixedClock = clock)

    val raw = cat.read("raw", "daily_reports")
    assert(raw.count() == 2)
    assert(raw.columns.contains("Recovered")) // missing column → typed null
    val us = raw.filter(col("Country_Region") === "US").collect()(0)
    assert(us.getAs[Long]("Confirmed") == 55L)      // legacy alias renamed
    assert(us.getAs[Any]("Recovered") == null)
    assert(us.getAs[String]("source_file") == legacy)

    // idempotent: same file again is a no-op
    RawLayer.ingestJson(cat, legacy, fixedClock = clock)
    assert(cat.read("raw", "daily_reports").count() == 2)
  }

  test("malformed lines quarantine with provenance; good lines still land") {
    val dir = tmpDir("json-feed-bad")
    val mixed = s"$dir/2021-07-01.json"
    Files.write(Paths.get(mixed),
      ("""{"Country_Region":"US","Last_Update":"2021-07-01 04:00:00","Confirmed":9,"Deaths":1}""" + "\n" +
        """{"Country_Region": BROKEN LINE""" + "\n" +
        """{"Country_Region":"France","Last_Update":"2021-07-01 04:00:00","Confirmed":4,"Deaths":0}""")
        .getBytes)

    val cat = Catalog(spark, tmpDir("json-wh-bad"))
    val clock = Some(Timestamp.valueOf("2024-01-01 00:00:00"))
    RawLayer.ingestJson(cat, mixed, fixedClock = clock)

    val raw = cat.read("raw", "daily_reports")
    assert(raw.count() == 2, "both well-formed lines land")
    val q = cat.read("raw", "quarantine").collect()
    assert(q.length == 1)
    assert(q(0).getAs[String]("raw_line").contains("BROKEN"))
    assert(q(0).getAs[String]("source_file") == mixed)
  }
}
