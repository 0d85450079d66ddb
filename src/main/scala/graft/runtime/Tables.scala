package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright. Read `ts` as nanos-since-epoch via the legacy conf
    * (runtime-settable) and truncate to a micros TimestampType — the same
    * value DuckDB produces with `CAST(ts AS TIMESTAMP)`.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // Deliberately session-global: the legacy nanos conf is consulted at
    // EXECUTION time by the parquet readers, so a per-read option or a
    // set/restore around load() fails as soon as the (lazy) plan
    // actually runs — verified: the scan throws PARQUET_TYPE_ILLEGAL
    // with only .option("nanosAsLong"). Session-wide effect on other
    // TIMESTAMP(NANOS) reads: they decode as raw nanos Longs instead of
    // erroring; no currently-supported table is affected.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    // Loud contract check at the only sanctioned read site: if the file
    // layout ever changes (ts already micros, or renamed), fail here
    // with a clear message instead of silently emitting raw Longs
    // downstream. Any OTHER nanos parquet must also come through a
    // loader that normalizes its type — never a bare read.parquet.
    require(
      df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      s"events.ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df
  }

  /** Register all testdata tables as temp views (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
