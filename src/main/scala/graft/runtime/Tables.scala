package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; this object
  * turns the sfDir into DataFrames. Reads are plain parquet scans so
  * Catalyst's DSv2 pushdown (filters + column pruning) applies untouched.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all testdata tables as temp views (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
