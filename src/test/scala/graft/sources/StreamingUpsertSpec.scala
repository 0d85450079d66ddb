package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** UPDATE-output-mode streaming into catalog tables (r11 item 4):
  * `outputMode("update")` + the `upsertKeys` option turns each epoch's
  * emitted (changed) groups into a keyed upsert through the engine's
  * own SQL MERGE path — per-epoch exactly-once via the marker
  * protocol, kill/restart convergent, and equal to the batch MERGE /
  * batch aggregation of the same inputs.
  */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gsup${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sup-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  test("update-mode aggregate upserts changed keys; converges across kill/restart; equals batch MERGE") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.state (k BIGINT, total BIGINT, cnt BIGINT)")
    val cp = tmpDir("gsup-cp")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    def start() = mem.toDF().toDF("k", "v")
      .groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("update")
      .option("upsertKeys", "k")
      .option("checkpointLocation", cp)
      .toTable(s"$cat.mart.state")
    try {
      // epoch 1: three keys appear
      val q1 = start()
      mem.addData((1L, 10L), (2L, 20L), (3L, 30L))
      q1.processAllAvailable()
      val after1 = spark.table(s"$cat.mart.state").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(after1 == Seq((1L, 10L, 1L), (2L, 20L, 1L), (3L, 30L, 1L)),
        s"epoch 1 state: $after1")

      // epoch 2: key 2 changes, key 4 appears — ONLY those upsert;
      // rows for keys 1 and 3 stay single (no append-duplicates)
      mem.addData((2L, 5L), (4L, 40L))
      q1.processAllAvailable()
      q1.stop() // kill between epochs
      val after2 = spark.table(s"$cat.mart.state").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(after2 == Seq((1L, 10L, 1L), (2L, 25L, 2L), (3L, 30L, 1L),
        (4L, 40L, 1L)), s"epoch 2 state: $after2")

      // restart from the checkpoint: more updates converge exactly-once
      val q2 = start()
      mem.addData((1L, 1L), (4L, 4L), (5L, 50L))
      q2.processAllAvailable()
      q2.stop()
      val got = spark.table(s"$cat.mart.state").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

      // equals the BATCH aggregation of every input (what a batch
      // MERGE of each epoch's groups would also produce)
      val all = Seq((1L, 10L), (2L, 20L), (3L, 30L), (2L, 5L), (4L, 40L),
        (1L, 1L), (4L, 4L), (5L, 50L))
      val expected = all.toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(got == expected, s"stream upsert != batch:\n$got\n$expected")

      // and the SAME state via the batch SQL MERGE path, key by key —
      // streaming Update and batch MERGE cannot disagree
      spark.sql(s"CREATE TABLE $cat.mart.batch (k BIGINT, total BIGINT, cnt BIGINT)")
      all.toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
        .createOrReplaceTempView("gsup_batch_src")
      spark.sql(s"""MERGE INTO $cat.mart.batch t USING gsup_batch_src s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val viaMerge = spark.table(s"$cat.mart.batch").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got == viaMerge)

      // no stage residue outside the hidden commit dir
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stage = new org.apache.hadoop.fs.Path(
        s"$root/mart/state/_graft_stream_commits")
      assert(fs.exists(stage)) // markers live here
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }

  test("a re-delivered upsert epoch is a no-op (marker protocol)") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.kv (k BIGINT, v BIGINT)")
    // drive the write directly: same epoch delivered twice must apply once
    val dir = s"${spark.conf.get(s"spark.sql.catalog.$cat.root")}/mart/kv"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val write = new GraftPartitionedCow.StreamingUpsertWrite(
      spark, "parquet", schema, dir, s"`$cat`.`mart`.`kv`", Seq("k"), "qX")
    val fac = write.createStreamingWriterFactory(null)
    def deliver(epoch: Long, rows: Seq[(Long, Long)]): Unit = {
      val w = fac.createWriter(0, 0L, epoch)
      rows.foreach { case (k, v) =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(k, v))
      }
      val m = w.commit()
      write.commit(epoch,
        Array[org.apache.spark.sql.connector.write.WriterCommitMessage](m))
    }
    deliver(0L, Seq((1L, 10L), (2L, 20L)))
    deliver(1L, Seq((1L, 11L)))
    // duplicate delivery of epoch 1 (checkpoint-lost retry): no-op
    deliver(1L, Seq((1L, 999L)))
    val got = spark.table(s"$cat.mart.kv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 11L), (2L, 20L)), s"got $got")
  }

  test("update mode WITHOUT upsertKeys is refused at query start") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.nope (k BIGINT, total BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val e = intercept[Throwable] {
      val q = mem.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", tmpDir("gsup-nope-cp"))
        .toTable(s"$cat.mart.nope")
      try { mem.addData((1L, 1L)); q.processAllAvailable() }
      finally q.stop()
    }
    // Spark refuses the sink for Update mode when the builder does not
    // declare SupportsStreamingUpdateAsAppend
    assert(e.getMessage != null)
    assert(spark.table(s"$cat.mart.nope").count() == 0,
      "update mode without keys must write nothing")
  }
}
