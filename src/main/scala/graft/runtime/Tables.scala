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

  /** events.parquet has shipped with two `ts` layouts across driver
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * outright — read as nanos-since-epoch via the legacy conf and
    * truncate to micros) and plain TIMESTAMP_NTZ(MICROS). Both normalize
    * here to a micros TimestampType — the same value DuckDB produces
    * with `CAST(ts AS TIMESTAMP)` (session tz is pinned UTC, so the
    * NTZ→instant reinterpretation is value-preserving).
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
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) decoded as raw nanos Longs
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // micros wall-clock; UTC session ⇒ same instant
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        // Loud contract check at the only sanctioned read site: a new
        // layout must be normalized here, never leaked downstream.
        throw new IllegalStateException(
          s"events.ts: unsupported parquet type $other")
    }
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
