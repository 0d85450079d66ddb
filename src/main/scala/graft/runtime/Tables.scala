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

  /** Schema cache per parquet path — METADATA only, never data or
    * results: every action still scans the parquet files. A bare
    * `spark.read.parquet` re-infers the schema (listing + footer read
    * + datasource resolution, ~50 ms driver-side on this box) on every
    * call; with ~2-3 loads per query across a 232-query suite that is
    * tens of seconds of pure re-derivation of an immutable fact. This
    * is exactly what a catalog (metastore) does for named tables —
    * resolve the schema once, plan scans against it. Keyed by absolute
    * path, so different SF dirs never alias; lives for the JVM, and the
    * testdata never changes within a run (the driver regenerates it
    * only between rounds, i.e. between JVMs).
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else readCached(spark, s"$sfDir/$name.parquet")

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
    // cached like the other tables; the conf is set before the FIRST
    // (inferring) read, so the cached schema is the post-conf one
    val raw = readCached(spark, s"$sfDir/events.parquet")
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
