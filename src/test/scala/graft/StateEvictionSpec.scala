package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.{FingerprintedDoc, Stateful, Streaming}

/** Proof that watermarks actually BOUND streaming state, not just that
  * the operators are correct: after the watermark passes evictable
  * keys, the state store's row count must DROP (query progress
  * `stateOperators.numRowsTotal`). Correctness specs alone can't
  * distinguish "right answers at sf0.1" from "state grows without
  * bound and the job dies after a month of uptime" — these can.
  */
class StateEvictionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Total state rows (all stateful operators) per progress event that
    * carried state info, in emission order.
    */
  private def stateTotals(q: StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)

  test("interval join: watermark passing evicts buffered join state") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(String, String, Timestamp)]
    val clicks = MemoryStream[(String, String, Timestamp)]
    val joined = Streaming.attributionJoin(
      imps.toDF().toDF("imp_id", "imp_user", "imp_ts"),
      clicks.toDF().toDF("click_id", "click_user", "click_ts"),
      within = "10 minutes", watermark = "20 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("evict_join").outputMode("append").start()
    try {
      // wave 1: 64 impressions + 8 clicks at T0 — all buffered
      imps.addData((0 until 64).map(i =>
        (s"i$i", s"u$i", ts(s"2024-01-01 10:00:${i % 60}.0"))): _*)
      clicks.addData((0 until 8).map(i =>
        (s"c$i", s"u$i", ts("2024-01-01 10:05:00.0"))): _*)
      q.processAllAvailable()
      val peak = stateTotals(q).max
      assert(peak >= 64, s"expected wave-1 rows buffered, saw peak=$peak")

      // wave 2 then 3: event time jumps 2h on BOTH sides. Wave 2's max
      // event time sets the watermark for the NEXT batch; wave 3 runs
      // that batch, during which wave-1 state (10:00, far behind the
      // ~11:40 watermark) must be evicted.
      imps.addData(("iL1", "uL1", ts("2024-01-01 12:00:00.0")))
      clicks.addData(("cL1", "uL1", ts("2024-01-01 12:00:01.0")))
      q.processAllAvailable()
      imps.addData(("iL2", "uL2", ts("2024-01-01 12:00:02.0")))
      clicks.addData(("cL2", "uL2", ts("2024-01-01 12:00:03.0")))
      q.processAllAvailable()

      val totals = stateTotals(q)
      val after = totals.last
      assert(after < peak,
        s"join state never shrank: peak=$peak, after watermark pass=$after ($totals)")
      assert(after <= 8,
        s"wave-1 rows (64+8) should be gone, only the 2h-wave rows may remain: $after")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedup: markers evicted, late re-arrival re-emits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    val out = Stateful.dedupStreamWithinWatermark(
      mem.toDF().toDF("doc_id", "arrival_ts", "text"),
      watermark = "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("evict_dedup").outputMode("append").start()
    try {
      // wave 1: 40 distinct docs + 1 in-watermark duplicate of doc 0
      mem.addData((0 until 40).map(i =>
        (s"$i", ts("2024-01-01 10:00:00.0"), s"text body $i")): _*)
      mem.addData(("100", ts("2024-01-01 10:01:00.0"), "text body 0"))
      q.processAllAvailable()
      val peak = stateTotals(q).max
      assert(peak >= 40, s"expected 40 fingerprint markers, saw peak=$peak")
      val afterWave1 = spark.table("evict_dedup").count()
      assert(afterWave1 == 40, // the dup was suppressed
        s"in-watermark duplicate must be dropped: $afterWave1")

      // wave 2 then 3: event time jumps 1h; wave-1 markers fall behind
      // the watermark and must be evicted in the following batch.
      mem.addData(("200", ts("2024-01-01 11:00:00.0"), "unrelated A"))
      q.processAllAvailable()
      mem.addData(("201", ts("2024-01-01 11:00:01.0"), "unrelated B"))
      q.processAllAvailable()
      val totals = stateTotals(q)
      assert(totals.last < peak,
        s"dedup state never shrank: peak=$peak, totals=$totals")
      assert(totals.last <= 4,
        s"wave-1 markers should be evicted, saw ${totals.last} ($totals)")

      // semantic proof of eviction: the same content arriving AFTER
      // its marker was evicted is treated as new (and that is the
      // documented contract — within-watermark dups never re-emit,
      // post-horizon replays may)
      mem.addData(("300", ts("2024-01-01 11:00:02.0"), "text body 0"))
      q.processAllAvailable()
      val reEmitted = spark.table("evict_dedup")
        .where($"doc_id" === 300L).count()
      assert(reEmitted == 1, "post-eviction replay should re-emit")
    } finally q.stop()
  }

  test("TTL dedup: processing-time timeout removes markers and re-admits") {
    implicit val sqlCtx = spark.sqlContext
    // ProcessingTimeTimeout keeps the query constructing no-data
    // batches while timeouts are pending, so processAllAvailable never
    // settles (and a 0 ms default trigger would spin). Use a real
    // trigger interval and poll the sink instead.
    val mem = MemoryStream[FingerprintedDoc]
    val q = Stateful.dedupFirstSeen(mem.toDS(), ttl = Some("2 seconds"))
      .writeStream.format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .queryName("evict_ttl").outputMode("update").start()
    def awaitCount(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (spark.table("evict_ttl").count() < n) {
        if (System.nanoTime() > deadline)
          fail(s"sink never reached $n rows (at ${spark.table("evict_ttl").count()})")
        Thread.sleep(200)
      }
    }
    try {
      mem.addData((0 until 30).map(i => FingerprintedDoc(i.toLong, s"fp$i")): _*)
      awaitCount(30)
      val peak = stateTotals(q).max
      assert(peak >= 30, s"expected 30 markers, saw $peak")

      Thread.sleep(4000) // every marker's 2s TTL lapses; the periodic
      // no-data batches fire the timeouts and remove the markers
      // a replay of an expired fingerprint is re-admitted as new
      mem.addData(FingerprintedDoc(501L, "fp0"))
      awaitCount(31)
      val totals = stateTotals(q)
      assert(totals.last < peak,
        s"TTL state never shrank: peak=$peak, totals=$totals")
      val readmitted = spark.table("evict_ttl")
        .as[FingerprintedDoc].collect().filter(_.doc_id == 501L)
      assert(readmitted.length == 1, "expired fingerprint should re-admit")
    } finally q.stop()
  }
}
