package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Watermarked streaming AGGREGATION landing in a catalog table (r10
  * item 4): `withWatermark` + tumbling-window count/sum in APPEND
  * output mode through `writeStream.toTable` — finalized windows (and
  * only finalized windows) land exactly-once, survive a kill/restart
  * from the checkpoint, and equal the batch computation over the same
  * events.
  */
class StreamingAggToTableSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gsagg${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sagg-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def ts(minute: Long): Timestamp = new Timestamp(minute * 60000L)

  /** The aggregation under test: 10-minute tumbling windows per key,
    * zero watermark delay (watermark = max event time seen).
    */
  private def agg(events: org.apache.spark.sql.DataFrame) =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(col("k"), window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("v_sum"))
      .select(col("k"), col("window.start").as("win_start"),
        col("cnt"), col("v_sum"))

  test("finalized windows land exactly-once across a kill/restart and equal batch") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.winagg " +
      "(k STRING, win_start TIMESTAMP, cnt BIGINT, v_sum BIGINT) " +
      "PARTITIONED BY (k)")
    val cp = tmpDir("gsagg-cp")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long)]
    def start() = agg(mem.toDF().toDF("k", "ts", "v")).writeStream
      .outputMode("append")
      .option("checkpointLocation", cp)
      .toTable(s"$cat.mart.winagg")

    // phase 1: events over minutes 0..24; watermark reaches 24, so
    // windows [0,10) and [10,20) finalize and land — [20,30) stays open
    val q1 = start()
    val phase1 = (0L until 25L).map(m => (if (m % 2 == 0) "a" else "b", ts(m), m))
    mem.addData(phase1: _*)
    q1.processAllAvailable()
    q1.stop() // kill
    val afterP1 = spark.table(s"$cat.mart.winagg").collect()
    assert(afterP1.map(_.getTimestamp(1).getTime / 60000L).toSet == Set(0L, 10L),
      s"expected only the two closed windows, got:\n${afterP1.mkString("\n")}")

    // phase 2: restart from the checkpoint (same in-JVM stream);
    // minutes 30..44 close [20,30) and [30,40); the sentinel closes
    // [40,50); the sentinel's own window never finalizes
    val q2 = start()
    val phase2 = (30L until 45L).map(m => (if (m % 2 == 0) "a" else "b", ts(m), m)) :+
      (("z", ts(100000L), 0L))
    mem.addData(phase2: _*)
    q2.processAllAvailable()
    q2.stop()

    val got = spark.table(s"$cat.mart.winagg")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000L,
        r.getLong(2), r.getLong(3)))
      .toSeq
    // exactly-once: no (key, window) appears twice
    assert(got.map(t => (t._1, t._2)).distinct.size == got.size,
      s"duplicated finalized windows:\n${got.sorted.mkString("\n")}")
    // equals the BATCH computation over the closed windows
    val allEvents = (phase1 ++ phase2.dropRight(1))
      .toDF("k", "ts", "v")
    val expected = allEvents
      .groupBy(col("k"), window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("v_sum"))
      .select(col("k"), col("window.start").as("win_start"),
        col("cnt"), col("v_sum"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000L,
        r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.toSet == expected.toSet,
      s"streamed aggregate != batch:\ngot      ${got.sorted.mkString(", ")}\n" +
        s"expected ${expected.sorted.mkString(", ")}")
    // the restart did not resurrect phase-1 windows with partial counts
    assert(got.count(_._2 == 0L) == 2) // keys a and b in window [0,10)
  }

  test("a re-delivered aggregation epoch is a no-op (sink-side dedup under restart)") {
    // restart WITHOUT stopping cleanly between processAllAvailable
    // calls: the second query instance resumes from the same
    // checkpoint; the sink's epoch markers make any batch Spark chooses
    // to re-run a declared no-op (unit-level proof of the duplicate
    // window lives in StreamingTableWriteSpec; this is the
    // aggregation-pipeline-level restart).
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.winagg2 " +
      "(k STRING, win_start TIMESTAMP, cnt BIGINT, v_sum BIGINT) " +
      "PARTITIONED BY (k)")
    val cp = tmpDir("gsagg2-cp")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long)]
    def start() = agg(mem.toDF().toDF("k", "ts", "v")).writeStream
      .outputMode("append")
      .option("checkpointLocation", cp)
      .toTable(s"$cat.mart.winagg2")
    val q1 = start()
    mem.addData(("a", ts(1), 1L), ("a", ts(5), 2L), ("a", ts(15), 3L))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    mem.addData(("a", ts(25), 4L))
    q2.processAllAvailable()
    q2.stop()
    val q3 = start()
    mem.addData(("a", ts(1000), 0L))
    q3.processAllAvailable()
    q3.stop()
    val rows = spark.table(s"$cat.mart.winagg2")
      .collect()
      .map(r => (r.getTimestamp(1).getTime / 60000L, r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(rows == Seq((0L, 2L, 3L), (10L, 1L, 3L), (20L, 1L, 4L)),
      s"got $rows")
  }
}
