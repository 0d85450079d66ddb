package graft

import org.apache.spark.sql.functions._
import graft.runtime.Catalog

/** Storage-maintenance semantics: small-files compaction and
  * schema-evolution reads.
  */
class CatalogMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("compact collapses many small files into few, preserving rows") {
    val cat = Catalog(spark, tmpDir("compact-wh"))
    val df = (0L until 10000L).toDF("id").repartition(40)
    cat.createOrReplace(df, "raw", "t")
    assert(parquetFiles(cat.path("raw", "t")).size >= 40)
    val written = cat.compact("raw", "t")
    assert(written == 1) // 10k longs are far under one target file
    assert(parquetFiles(cat.path("raw", "t")).size == 1)
    assert(cat.read("raw", "t").as[Long].collect().toSet ==
      (0L until 10000L).toSet)
  }

  test("compact keeps hive partition layout when partition cols are given") {
    val cat = Catalog(spark, tmpDir("compact-part"))
    val df = (0L until 1000L).map(i => (s"d${i % 3}", i)).toDF("d", "v")
      .repartition(20)
    cat.append(df, "ods", "t", Seq("d"))
    cat.compact("ods", "t", partitionCols = Seq("d"))
    val back = cat.read("ods", "t")
    // partition column survives as a hive directory (still readable +
    // prunable), and every row is intact
    assert(back.select("d").distinct().as[String].collect().toSet ==
      Set("d0", "d1", "d2"))
    assert(back.select("v").as[Long].collect().toSet == (0L until 1000L).toSet)
  }

  test("compact is lossless on schema-evolved tables") {
    val cat = Catalog(spark, tmpDir("compact-evolved"))
    cat.append(Seq((1L, "a")).toDF("id", "s"), "raw", "t", Seq.empty)
    cat.append(Seq((2L, "b", 9.5)).toDF("id", "s", "x"), "raw", "t", Seq.empty)
    cat.compact("raw", "t")
    // the column only the second file carried must survive the rewrite
    val back = cat.read("raw", "t")
    assert(back.columns.toSet == Set("id", "s", "x"))
    assert(back.filter(col("id") === 2L).select("x").as[Double].head() == 9.5)
  }

  test("partitioned compaction writes ~one file per partition directory") {
    val cat = Catalog(spark, tmpDir("compact-dirs"))
    val df = (0L until 3000L).map(i => (s"d${i % 3}", i)).toDF("d", "v")
      .repartition(15)
    cat.append(df, "ods", "t", Seq("d"))
    cat.compact("ods", "t", partitionCols = Seq("d"))
    // before the partition-aware repartition fix, every write task
    // dropped a file into every directory it touched
    for (part <- Seq("d=d0", "d=d1", "d=d2")) {
      val n = parquetFiles(s"${cat.path("ods", "t")}/$part").size
      assert(n == 1, s"$part has $n files after compaction")
    }
  }

  test("readMerged unions schemas across appends; plain read does not") {
    val cat = Catalog(spark, tmpDir("evolve-wh"))
    cat.append(Seq((1L, "a")).toDF("id", "s"), "raw", "t", Seq.empty)
    cat.append(Seq((2L, "b", 9.5)).toDF("id", "s", "x"), "raw", "t", Seq.empty)
    val merged = cat.readMerged("raw", "t")
    assert(merged.columns.toSet == Set("id", "s", "x"))
    assert(merged.filter(col("id") === 1L).select("x").first().isNullAt(0))
    assert(merged.filter(col("id") === 2L).select("x").as[Double].head() == 9.5)
  }

  test("readMerged refuses formats without per-file schemas") {
    val cat = Catalog(spark, tmpDir("evolve-csv"), "csv")
    intercept[IllegalArgumentException] { cat.readMerged("raw", "t") }
  }
}
