package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `STREAMING_WRITE` on catalog tables (r09 item 4):
  * `df.writeStream.toTable("<cat>.<ns>.<t>")` resolves through
  * [[GraftTable]] to [[GraftPartitionedCow.StreamingAppendWrite]] —
  * exactly-once per epoch via the epoch marker + deterministic final
  * file names. The end-to-end test kills a query mid-stream and
  * restarts it from the checkpoint; the direct-harness tests pin the
  * two idempotency levels the directory store needs (duplicate epoch
  * delivery, crash mid-publish).
  */
class StreamingTableWriteSpec extends graft.SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gsw${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-stream-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  test("writeStream.toTable: kill mid-stream, restart from checkpoint, table equals the batch result") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.raw")
    spark.sql(s"CREATE TABLE $cat.raw.ev (k BIGINT, v STRING, seg STRING) " +
      "PARTITIONED BY (seg)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cp = tmpDir("gsw-cp")
    val mem = MemoryStream[(Long, String, String)]
    val df = mem.toDF().toDF("k", "v", "seg")

    val b1 = Seq((1L, "a1", "x"), (2L, "a2", "y"), (3L, "a3", "x"))
    val b2 = Seq((4L, "b1", "y"), (5L, "b2", "z"))

    val q1 = df.writeStream.option("checkpointLocation", cp)
      .toTable(s"$cat.raw.ev")
    mem.addData(b1: _*)
    q1.processAllAvailable()
    q1.stop() // kill mid-stream (between epochs)

    // restart from the same checkpoint: only the NEW batch is processed
    val q2 = df.writeStream.option("checkpointLocation", cp)
      .toTable(s"$cat.raw.ev")
    mem.addData(b2: _*)
    q2.processAllAvailable()
    q2.stop()

    val got = spark.table(s"$cat.raw.ev").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == (b1 ++ b2), s"stream/batch parity broken: $got")
  }

  test("unpartitioned streaming append works and stays exactly-once across restart") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.raw")
    spark.sql(s"CREATE TABLE $cat.raw.flat (k BIGINT, v STRING)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cp = tmpDir("gsw-cp-flat")
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("k", "v")
    val q1 = df.writeStream.option("checkpointLocation", cp)
      .toTable(s"$cat.raw.flat")
    mem.addData((1L, "a"), (2L, "b"))
    q1.processAllAvailable(); q1.stop()
    val q2 = df.writeStream.option("checkpointLocation", cp)
      .toTable(s"$cat.raw.flat")
    mem.addData((3L, "c"))
    q2.processAllAvailable(); q2.stop()
    assert(spark.table(s"$cat.raw.flat").orderBy("k").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
  }

  // ---- direct harness on the streaming write protocol ------------------

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("seg", StringType)))

  private def row(k: Long, v: String, seg: String): InternalRow =
    InternalRow.fromSeq(Seq(k, UTF8String.fromString(v),
      UTF8String.fromString(seg)))

  private def tableRows(dir: String): Seq[(Long, String, String)] =
    spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[String]("seg"))).toSeq.sortBy(_._1)

  test("duplicate epoch commit is a declared no-op") {
    val dir = tmpDir("gsw-direct")
    val write = new GraftPartitionedCow.StreamingAppendWrite(
      spark, "parquet", schema, dir, Seq("seg"), "query-epoch-dedup")
    val factory = write.createStreamingWriterFactory(null)

    val w1 = factory.createWriter(0, 0L, 7L)
    w1.write(row(1L, "a", "x")); w1.write(row(2L, "b", "y"))
    val m1 = w1.commit()
    write.commit(7L, Array[WriterCommitMessage](m1))
    assert(tableRows(dir) == Seq((1L, "a", "x"), (2L, "b", "y")))

    // Spark re-delivers epoch 7 (sink committed, checkpoint log lost):
    // a fresh execution writes fresh staged files, commit must decline
    val w2 = factory.createWriter(0, 1L, 7L)
    w2.write(row(1L, "a", "x")); w2.write(row(2L, "b", "y"))
    val m2 = w2.commit()
    write.commit(7L, Array[WriterCommitMessage](m2))
    assert(tableRows(dir) == Seq((1L, "a", "x"), (2L, "b", "y")),
      "duplicate epoch delivery duplicated rows")
    // and the declined execution's staged files were cleaned up
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def staged(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory && !st.getPath.getName.startsWith("_"))
          staged(st.getPath)
        else if (st.getPath.getName.startsWith(".stg-")) Seq(st.getPath)
        else Nil
      }
    assert(staged(new Path(dir)).isEmpty, "declined epoch left staged files")
  }

  test("a crash between publish renames re-converges on re-execution (deterministic names)") {
    val dir = tmpDir("gsw-crash")
    val write = new GraftPartitionedCow.StreamingAppendWrite(
      spark, "parquet", schema, dir, Seq("seg"), "query-crash-publish")
    val factory = write.createStreamingWriterFactory(null)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // first execution of epoch 3 writes two partitions, then "crashes"
    // after publishing only ONE of its files (no marker written)
    val w1 = factory.createWriter(0, 0L, 3L)
    w1.write(row(1L, "a", "x")); w1.write(row(2L, "b", "y"))
    val m1 = w1.commit()
    val files1 = m1.asInstanceOf[GraftPartitionedCow.CowTaskFiles].files
    val (staged0, fin0, _) = files1.head
    require(fs.rename(new Path(staged0), new Path(fin0))) // partial publish
    files1.tail.foreach { case (s, _, _) => fs.delete(new Path(s), false) }

    // re-execution of epoch 3 (same data, fresh attempt) + full commit:
    // the already-published file must not duplicate, the missing one
    // must appear, and the marker must land
    val w2 = factory.createWriter(0, 1L, 3L)
    w2.write(row(1L, "a", "x")); w2.write(row(2L, "b", "y"))
    val m2 = w2.commit()
    write.commit(3L, Array[WriterCommitMessage](m2))
    assert(tableRows(dir) == Seq((1L, "a", "x"), (2L, "b", "y")),
      "partial publish + re-execution did not converge")
    // a THIRD delivery is now a no-op via the marker
    val w3 = factory.createWriter(0, 2L, 3L)
    w3.write(row(1L, "a", "x")); w3.write(row(2L, "b", "y"))
    write.commit(3L, Array[WriterCommitMessage](w3.commit()))
    assert(tableRows(dir) == Seq((1L, "a", "x"), (2L, "b", "y")))
  }
}
