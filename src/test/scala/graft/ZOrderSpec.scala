package graft

import org.apache.spark.sql.functions._
import graft.functions.{MortonCode, ZOrderHelper}
import graft.runtime.Catalog

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton expression equals the reference interleave, SQL replica included") {
    val pairs = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(MortonCode($"x", $"y").as("z")).as[Long].collect()
    val want = pairs.map { case (x, y) => ZOrderHelper.morton(x, y) }
    assert(got.toSeq == want)
    // the generated SQL text computes the identical codes in Spark SQL
    val viaSql = pairs.toDF("x", "y")
      .selectExpr(s"${ZOrderHelper.mortonSql("x", "y")} AS z")
      .as[Long].collect()
    assert(viaSql.toSeq == want)
    // definition sanity: interleave = spread(x) | spread(y)<<1
    assert(ZOrderHelper.morton(3, 5) ==
      (ZOrderHelper.spread(3) | (ZOrderHelper.spread(5) << 1)))
  }

  test("clustered files are tight in BOTH dimensions; random files are not") {
    val cat = Catalog(spark, tmpDir("zorder-wh"))
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    cat.writeClustered(df, "raw", "clustered", ("x", "y"), files = 16)
    cat.createOrReplace(df.repartition(16), "raw", "shuffled")

    def avgSpan(table: String, c: String): Double = {
      val files = new java.io.File(cat.path("raw", table))
        .listFiles().filter(_.getName.endsWith(".parquet"))
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    // 16 z-range files over a 1024x1024 grid = a 4x4 macro-grid: each
    // file spans ~256 in each dimension; random files span ~the whole
    // range in both
    for (c <- Seq("x", "y")) {
      assert(avgSpan("clustered", c) < 450, s"clustered $c not tight")
      assert(avgSpan("shuffled", c) > 900, s"shuffled $c unexpectedly tight")
    }

    // keys far beyond 16 bits still cluster: values are rescaled from
    // their actual range before interleaving (raw masking would have
    // degraded this to hashing)
    val wide = Seq.fill(20000)(
      (1000000L + rnd.nextInt(1 << 20).toLong,
        -500000L + rnd.nextInt(1 << 20).toLong)).toDF("x", "y")
    cat.writeClustered(wide, "raw", "wide", ("x", "y"), files = 16)
    def span(c: String): Double = {
      val files = new java.io.File(cat.path("raw", "wide"))
        .listFiles().filter(_.getName.endsWith(".parquet"))
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    val full = (1 << 20).toDouble
    assert(span("x") < full * 0.45 && span("y") < full * 0.45)
  }

  test("writeClustered rejects a conflicting __z column") {
    val cat = Catalog(spark, tmpDir("zorder-guard"))
    intercept[IllegalArgumentException] {
      cat.writeClustered(Seq((1L, 2L, 3L)).toDF("x", "y", "__z"),
        "raw", "t", ("x", "y"), files = 2)
    }
  }
}
