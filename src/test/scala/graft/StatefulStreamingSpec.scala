package graft

import java.sql.Date
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{CumulativeReport, FingerprintedDoc, Stateful}

class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  test("cumulativeDeltas: first day 0, increments across batches, clamp, late drop") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CumulativeReport]
    val q = Stateful.cumulativeDeltas(mem.toDS())
      .writeStream.format("memory").queryName("deltas").outputMode("update").start()

    // batch 1: two days for US arrive together (out of order), one for DE
    mem.addData(
      CumulativeReport("US", d("2020-03-02"), 15L, 2L),
      CumulativeReport("US", d("2020-03-01"), 10L, 1L),
      CumulativeReport("DE", d("2020-03-01"), 4L, 0L))
    q.processAllAvailable()
    // batch 2: US advances; DE goes DOWN (revision) → clamped to 0;
    // a late US day 1 replay is dropped
    mem.addData(
      CumulativeReport("US", d("2020-03-03"), 18L, 2L),
      CumulativeReport("DE", d("2020-03-02"), 3L, 0L),
      CumulativeReport("US", d("2020-03-01"), 999L, 9L))
    q.processAllAvailable()
    val rows = spark.table("deltas")
      .as[(String, Date, Long, Long)].collect()
      .map { case (c, dt, nc, nd) => (c, dt.toString) -> ((nc, nd)) }.toMap
    q.stop()

    assert(rows(("US", "2020-03-01")) == ((0L, 0L)))   // first day: no predecessor
    assert(rows(("US", "2020-03-02")) == ((5L, 1L)))   // in-batch ordering applied
    assert(rows(("US", "2020-03-03")) == ((3L, 0L)))   // state crossed the batch
    assert(rows(("DE", "2020-03-01")) == ((0L, 0L)))
    assert(rows(("DE", "2020-03-02")) == ((0L, 0L)))   // negative delta clamped
    assert(rows.size == 5)                             // late replay emitted nothing
  }

  test("streamingHeavyHitters: MG summary accumulates across batches within bounds") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Stateful.streamingHeavyHitters(mem.toDS(), k = 4)
      .writeStream.format("memory").queryName("hh").outputMode("update").start()

    // batch 1: "hot" dominates source a
    mem.addData(Seq.fill(30)(("a", "hot")) ++ (1 to 10).map(i => ("a", s"c$i")): _*)
    q.processAllAvailable()
    // batch 2: more hot + new cold tokens; a second key appears
    mem.addData(Seq.fill(20)(("a", "hot")) ++ (11 to 20).map(i => ("a", s"c$i"))
      ++ Seq(("b", "x"), ("b", "x"), ("b", "y")): _*)
    q.processAllAvailable()
    val rows = spark.table("hh").as[(String, Map[String, Long])].collect()
    q.stop()

    // latest update per key
    val a = rows.filter(_._1 == "a").last._2
    val b = rows.filter(_._1 == "b").last._2
    assert(a.size <= 4 && b.size <= 4)
    // N(a)=70, bound N/(k+1)=14; true(hot)=50 -> est >= 36 and <= 50
    assert(a.contains("hot") && a("hot") <= 50 && a("hot") >= 36)
    assert(b("x") <= 2 && b.contains("x"))
  }

  test("dedupStreamByContent: whitespace-variant duplicates collapse to one survivor") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Stateful.dedupStreamByContent(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("content_dedup").outputMode("update").start()
    mem.addData(
      (10L, "The  quick   brown fox"),
      (11L, "the quick brown FOX".toLowerCase), // same normalized content? no — case differs from #10 only by case+ws
      (12L, "entirely different text"))
    q.processAllAvailable()
    val out = spark.table("content_dedup").as[FingerprintedDoc].collect()
      .map(_.doc_id).toSet
    q.stop()
    // 10 and 11 normalize identically (lowercase + collapsed whitespace)
    assert(out == Set(10L, 12L))
  }

  test("dedupFirstSeen: one survivor per fingerprint across batches, min id in-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FingerprintedDoc]
    val q = Stateful.dedupFirstSeen(mem.toDS())
      .writeStream.format("memory").queryName("deduped").outputMode("update").start()

    mem.addData(
      FingerprintedDoc(7L, "aaa"), FingerprintedDoc(3L, "aaa"),
      FingerprintedDoc(5L, "bbb"))
    q.processAllAvailable()
    mem.addData(
      FingerprintedDoc(9L, "aaa"),  // suppressed: state remembers "aaa"
      FingerprintedDoc(2L, "ccc"))
    q.processAllAvailable()
    val out = spark.table("deduped").as[FingerprintedDoc].collect()
      .map(r => r.fingerprint -> r.doc_id).toMap
    q.stop()

    assert(out == Map("aaa" -> 3L, "bbb" -> 5L, "ccc" -> 2L))
  }

  test("streamingDistinctSketch: registers equal the batch aggregator's, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Stateful.streamingDistinctSketch(mem.toDS())
      .writeStream.format("memory").queryName("hllsk").outputMode("update").start()

    val batch1 = (0 until 300).map(i => ("a", s"tok$i")) :+ (("b", "only"))
    val batch2 = (150 until 450).map(i => ("a", s"tok$i")) // half overlap
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)                                // duplicate delivery
    q.processAllAvailable()
    val rows = spark.table("hllsk").as[(String, Seq[Int])].collect()
    q.stop()

    val streamedA = rows.filter(_._1 == "a").last._2
    // batch twin over the union of all delivered rows for key a
    import spark.implicits._
    val batchA = (batch1 ++ batch2).filter(_._1 == "a").map(_._2)
      .toDF("t").repartition(4)
      .agg(graft.functions.HllAgg.udaf(org.apache.spark.sql.functions.col("t")))
      .as[Seq[Int]].collect().head
    assert(streamedA == batchA)
    // replayed batch2 changed nothing: the last two updates for a agree
    val updatesA = rows.filter(_._1 == "a").map(_._2)
    assert(updatesA(updatesA.length - 2) == streamedA)
  }

  test("throttledAlerts: one alert per cooldown of event time per key") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Breach
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // transformWithState requires the RocksDB state store; scope the
    // provider switch to this query and restore the suite default
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Breach]
      val q = Stateful.throttledAlerts(mem.toDS(), threshold = 100.0,
        cooldownSec = 600)
        .writeStream.format("memory").queryName("throttled")
        .outputMode("append").start()
      // batch 1: breach alerts; flap 2 min later suppressed;
      // sub-threshold never alerts; second key independent
      mem.addData(
        Breach("api", ts("2024-01-01 10:00:00"), 150.0),
        Breach("api", ts("2024-01-01 10:02:00"), 180.0),
        Breach("api", ts("2024-01-01 10:03:00"), 50.0),
        Breach("db", ts("2024-01-01 10:05:00"), 200.0))
      q.processAllAvailable()
      // batch 2: still inside the api cooldown (suppressed), then past
      // it (alerts) — state carried across batches
      mem.addData(
        Breach("api", ts("2024-01-01 10:08:00"), 300.0),
        Breach("api", ts("2024-01-01 10:11:00"), 120.0))
      q.processAllAvailable()
      q.stop()
      val alerts = spark.table("throttled")
        .as[graft.streaming.ThrottledAlert].collect()
        .map(a => (a.key, a.ts.toString, a.value)).sorted.toSeq
      assert(alerts == Seq(
        ("api", "2024-01-01 10:00:00.0", 150.0),
        ("api", "2024-01-01 10:11:00.0", 120.0),
        ("db", "2024-01-01 10:05:00.0", 200.0)), s"got $alerts")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
