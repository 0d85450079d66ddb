package graft.sources

import org.apache.spark.sql.Row

/** `MICRO_BATCH_READ` on catalog tables:
  * `spark.readStream.table("<cat>.<ns>.<t>")` via
  * [[GraftTableMicroBatchStream]] — new data files become micro-batches
  * (FileStreamSource semantics on the DSv2 surface), the discovered
  * file set per batch persists in the checkpoint so replay is
  * deterministic. Combined with `STREAMING_WRITE`, a full
  * table-to-table streaming pipeline runs purely by catalog name.
  */
class StreamingTableReadSpec extends graft.SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gsr${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sread-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  test("readStream.table delivers appended batches once; restart resumes from the checkpoint") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.raw")
    spark.sql(s"CREATE TABLE $cat.raw.src (k BIGINT, v STRING)")
    spark.sql(s"CREATE TABLE $cat.raw.dst (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.raw.src VALUES (1, 'a'), (2, 'b')")
    val cp = tmpDir("gsr-cp")

    // table-to-table streaming pipeline, both ends by catalog name
    def start() = spark.readStream.table(s"$cat.raw.src")
      .writeStream.option("checkpointLocation", cp)
      .toTable(s"$cat.raw.dst")

    val q1 = start()
    q1.processAllAvailable()
    spark.sql(s"INSERT INTO $cat.raw.src VALUES (3, 'c')")
    q1.processAllAvailable()
    q1.stop() // kill mid-stream

    spark.sql(s"INSERT INTO $cat.raw.src VALUES (4, 'd')") // lands while down
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.table(s"$cat.raw.dst").orderBy("k").collect().toSeq
    assert(got == Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"), Row(4L, "d")),
      s"stream delivered wrong/duplicate rows: $got")
  }

  test("maxFilesPerTrigger bounds every micro-batch; AvailableNow drains and stops") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.raw")
    spark.sql(s"CREATE TABLE $cat.raw.bsrc (k BIGINT, v STRING)")
    // six single-file appends = six admissible files
    (1 to 6).foreach { i =>
      spark.sql(s"INSERT INTO $cat.raw.bsrc VALUES ($i, 'x$i')")
    }
    val cp = tmpDir("gsr-acp")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxFilesPerTrigger", "2")
      .table(s"$cat.raw.bsrc")
      .writeStream.option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("k").collect().map(_.getLong(0))
        sizes.synchronized { sizes += rows.length.toLong; got ++= rows }
        ()
      }.start()
    // AvailableNow terminates on its own once the start-time snapshot
    // is drained — the backfill ran as bounded batches, not one blob
    assert(q.awaitTermination(120000), "AvailableNow query did not stop")
    assert(got.sorted.toSeq == (1L to 6L), s"got $got")
    assert(sizes.toSeq == Seq(2L, 2L, 2L),
      s"expected three 2-file batches, got $sizes")

    // byte budget: 1 byte admits exactly ONE file per batch (the
    // at-least-one rule prevents a livelock on an over-budget file)
    val cp2 = tmpDir("gsr-acp2")
    val sizes2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream
      .option("maxBytesPerTrigger", "1")
      .table(s"$cat.raw.bsrc")
      .writeStream.option("checkpointLocation", cp2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes2.synchronized { sizes2 += df.count() }
        ()
      }.start()
    assert(q2.awaitTermination(120000), "byte-limited query did not stop")
    assert(sizes2.toSeq == Seq.fill(6)(1L),
      s"expected six 1-file batches, got $sizes2")
  }

  test("a PARTITIONED source streams with partition values intact") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.raw")
    spark.sql(s"CREATE TABLE $cat.raw.psrc (k BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.raw.psrc VALUES (1, 'd1'), (2, 'd2')")
    val cp = tmpDir("gsr-pcp")
    val outDir = tmpDir("gsr-pout")
    val q = spark.readStream.table(s"$cat.raw.psrc")
      .writeStream.format("parquet")
      .option("checkpointLocation", cp).option("path", outDir).start()
    q.processAllAvailable()
    spark.sql(s"INSERT INTO $cat.raw.psrc VALUES (3, 'd1')")
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(outDir).orderBy("k")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("day"))).toSeq
    assert(got == Seq((1L, "d1"), (2L, "d2"), (3L, "d1")), s"got $got")
  }
}
