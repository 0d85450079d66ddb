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

  test("N-way interleave: k=2 is bit-identical to morton; k=3 matches the bit definition") {
    val rnd = new scala.util.Random(11)
    // k = 2, 16 bits: the generalized interleave IS morton
    for (_ <- 0 until 2000) {
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      assert(ZOrderHelper.interleave(Array(x, y), 16) ==
        ZOrderHelper.morton(x, y))
    }
    // k = 3: result bit (3i + j) is bit i of vals(j), per definition
    def ref(vals: Array[Long], bits: Int): Long = {
      var out = 0L
      for (i <- 0 until bits; j <- vals.indices)
        if (((vals(j) >> i) & 1L) == 1L) out |= 1L << (i * vals.length + j)
      out
    }
    for (_ <- 0 until 2000) {
      val v = Array.fill(3)(rnd.nextInt(65536).toLong)
      assert(ZOrderHelper.interleave(v, 16) == ref(v, 16))
    }
    // curve codes stay non-negative (Long order = curve order)
    assert(ZOrderHelper.interleave(Array(65535L, 65535L, 65535L), 16) > 0)
    // bit budget: 16 up to 3 cols, then the largest equal share of 63
    assert(ZOrderHelper.bitsFor(2) == 16 && ZOrderHelper.bitsFor(3) == 16)
    assert(ZOrderHelper.bitsFor(4) == 15 && ZOrderHelper.bitsFor(6) == 10)
    // 4-col codes still fit 63 bits
    assert(ZOrderHelper.interleave(Array.fill(4)((1L << 15) - 1), 15) > 0)
  }

  test("three-column clustering is tight in ALL dimensions (r11 item 5)") {
    val cat = Catalog(spark, tmpDir("zorder3-wh"))
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(30000)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y", "z")
    cat.writeClustered(df, "raw", "c3", Seq("x", "y", "z"), files = 64)
    cat.createOrReplace(df.repartition(64), "raw", "s3")

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
    // 64 z-range files over a 1024^3 lattice = a 4x4x4 macro-grid:
    // each file spans ~256 per dimension; random files span ~all 1024
    for (c <- Seq("x", "y", "z")) {
      assert(avgSpan("c3", c) < 520, s"3-col clustered $c not tight")
      assert(avgSpan("s3", c) > 900, s"shuffled $c unexpectedly tight")
    }
  }

  test("writeClustered rejects a conflicting __z column") {
    val cat = Catalog(spark, tmpDir("zorder-guard"))
    intercept[IllegalArgumentException] {
      cat.writeClustered(Seq((1L, 2L, 3L)).toDF("x", "y", "__z"),
        "raw", "t", ("x", "y"), files = 2)
    }
  }
}
