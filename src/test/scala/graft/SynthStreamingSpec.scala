package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The DSv2 micro-batch streaming surface of the synthetic connector:
  * offset-paced batches over the deterministic id space, admission
  * control, streaming-batch row parity, and exactly-once restart from
  * a checkpoint through the transactional file sink.
  */
class SynthStreamingSpec extends SparkSpec {

  test("streamed rows equal the batch scan, paced by rowsPerBatch") {
    val q = spark.readStream.format("graft-synth")
      .option("rows", "5000").option("rowsPerBatch", "1300")
      .load()
      .writeStream.format("memory").queryName("synth_stream_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("synth_stream_mem")
      val expected = spark.read.format("graft-synth")
        .option("rows", "5000").load()
      assert(got.count() == 5000)
      assert(got.exceptAll(expected).isEmpty &&
        expected.exceptAll(got).isEmpty,
        "streamed content must equal the batch scan bit-for-bit")
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.forall(_.numInputRows <= 1300),
        "no batch may admit more than rowsPerBatch rows")
      assert(batches.length >= 4, // ceil(5000/1300) = 4
        s"expected at least 4 non-empty batches, got ${batches.length}")
    } finally q.stop()
  }

  test("restart from checkpoint is exactly-once into the file sink") {
    val ckpt = tmpDir("graft-synth-ckpt")
    val out = tmpDir("graft-synth-out")
    // Deterministic mid-stream stop (no sleep-vs-trigger race): phase 1
    // bounds the id space at 2000, drains completely, and stops idle at
    // a known offset; phase 2 reopens the SAME checkpoint with the full
    // 4000-row bound, so the restart must resume from the checkpointed
    // position — the offset is a pure id-space position, which is
    // exactly what makes widening the bound a valid continuation.
    def start(rows: Int) = spark.readStream.format("graft-synth")
      .option("rows", rows.toString).option("rowsPerBatch", "500")
      .load().select(col("doc_id"), col("source"))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(Trigger.ProcessingTime(10))
      .outputMode("append").start()
    val q1 = start(2000)
    try q1.processAllAvailable() finally q1.stop()
    val mid = spark.read.parquet(out).count()
    assert(mid == 2000, s"phase 1 must drain its bounded id space, got $mid")
    val q2 = start(4000)
    try q2.processAllAvailable() finally q2.stop()
    val fin = spark.read.parquet(out)
    assert(fin.count() == 4000,
      s"exactly-once restart must land every id once, got ${fin.count()}")
    assert(fin.select(countDistinct(col("doc_id"))).head.getLong(0) == 4000)
  }

  test("a pruned streaming projection still yields the full id range") {
    val q = spark.readStream.format("graft-synth")
      .option("rows", "600").option("rowsPerBatch", "250")
      .load().select(col("doc_id"))
      .writeStream.format("memory").queryName("synth_stream_pruned")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("synth_stream_pruned")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (0L until 600L).toSeq)
    } finally q.stop()
  }
}
