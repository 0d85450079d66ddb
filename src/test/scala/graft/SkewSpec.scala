package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of probe rows share one hot key
    val probe = spark.range(0, 1000)
      .select((when($"id" % 10 === 0, $"id" % 7).otherwise(lit(42L))).as("k"),
        $"id".as("payload"))
    val build = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")

    val plain = probe.join(build, Seq("k")).select($"k", $"payload", $"name")
    val salted = Skew.saltedJoin(probe, build, "k", salt = 8)
      .select($"k", $"payload", $"name")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("twoPhaseDistinct matches COUNT(DISTINCT) semantics, including NULLs") {
    // key "b" has a NULL user among real ones; key "c" is all-NULL —
    // COUNT(DISTINCT) must exclude NULLs (0 for "c"), COUNT(*) must not
    val rows = Seq(
      ("a", Some(1L)), ("a", Some(1L)), ("a", Some(2L)),
      ("b", Some(7L)), ("b", None), ("b", Some(7L)),
      ("c", None), ("c", None))
    val df = rows.toDF("k", "u")
    val got = Skew.twoPhaseDistinct(df, "k", "u")
      .as[(String, Long, Long)].collect().toSet
    val want = df.groupBy($"k")
      .agg(countDistinct($"u").as("n_distinct"), count(lit(1)).as("n_rows"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
    assert(got == Set(("a", 2L, 3L), ("b", 1L, 3L), ("c", 0L, 2L)))
  }

  test("probe rows scatter across salt buckets even when rows are identical") {
    // all 1000 rows are the SAME row — a content-hash salt would put
    // them all in one bucket and leave the hot key unsplit
    val probe = spark.range(0, 1000).select(lit(42L).as("k"), lit("dup").as("payload"))
    val buckets = probe.withColumn("__salt", Skew.saltColumn(8))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(buckets == 8L) // every sub-key used → even task sizes
  }
}
