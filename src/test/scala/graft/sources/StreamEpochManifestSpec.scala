package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The streaming append's per-epoch manifest protocol
  * ([[GraftPartitionedCow.StreamingAppendWrite]]): a re-executed epoch
  * that finds a manifest but no marker retracts everything the crashed
  * attempt published before publishing its own files — closing the
  * re-planned-epoch duplicate window (r10 ADVICE). White-box: the
  * commit is driven directly with fabricated task messages so the spec
  * can stage EXACTLY the crash state (half-published attempt, shape
  * change on retry) that a live restart can't produce
  * deterministically.
  */
class StreamEpochManifestSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("x", LongType)))

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def touch(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      content: String = "d"): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def tag(queryId: String): String =
    f"${scala.util.hashing.MurmurHash3.stringHash(queryId)}%08x"

  test("retry after a half-published epoch retracts the crashed attempt") {
    val dir = tmpDir("graft-epoch-manifest")
    val fs = fsOf(dir)
    val w = new GraftPartitionedCow.StreamingAppendWrite(
      spark, "parquet", schema, dir, Nil, "q-manifest")
    val commits = new Path(dir, s"_graft_stream_commits/${tag("q-manifest")}")

    // crashed attempt of epoch 7: published fileA, never got to fileB,
    // manifest (written before its first rename) lists both; no marker
    val fileA = new Path(dir, "part-sq-e7-p0-r0.parquet")
    val fileB = new Path(dir, "part-sq-e7-p1-r0.parquet")
    touch(fs, fileA, "old-shape-a")
    touch(fs, new Path(commits, "7.manifest"),
      s"${fileA.toString}\n${fileB.toString}")

    // the restart re-planned the epoch into ONE differently-named cell
    val stagedC = new Path(dir, ".part-sq-e7-p0-r1.parquet")
    val finalC = new Path(dir, "part-sq-e7-p0-r1.parquet")
    touch(fs, stagedC, "new-shape-c")
    w.commit(7, Array(GraftPartitionedCow.CowTaskFiles(
      Seq((stagedC.toString, finalC.toString, 1L)))))

    assert(!fs.exists(fileA), "crashed attempt's published file survived")
    assert(fs.exists(finalC), "retry's file was not published")
    assert(fs.exists(new Path(commits, "7")), "epoch marker missing")
    assert(!fs.exists(new Path(commits, "7.manifest")),
      "manifest should be superseded by the marker")

    // re-delivery of the committed epoch declines: staged dropped,
    // published set untouched
    val stagedD = new Path(dir, ".part-sq-e7-p0-r2.parquet")
    touch(fs, stagedD)
    w.commit(7, Array(GraftPartitionedCow.CowTaskFiles(Seq(
      (stagedD.toString, new Path(dir, "part-sq-e7-p0-r2.parquet").toString,
        1L)))))
    assert(!fs.exists(stagedD))
    assert(!fs.exists(new Path(dir, "part-sq-e7-p0-r2.parquet")))
    assert(fs.exists(finalC))
  }

  test("clean first commit writes manifest before publish, then marker") {
    val dir = tmpDir("graft-epoch-clean")
    val fs = fsOf(dir)
    val w = new GraftPartitionedCow.StreamingAppendWrite(
      spark, "parquet", schema, dir, Nil, "q-clean")
    val commits = new Path(dir, s"_graft_stream_commits/${tag("q-clean")}")

    val staged = new Path(dir, ".part-sq-e0-p0-r0.parquet")
    val fin = new Path(dir, "part-sq-e0-p0-r0.parquet")
    touch(fs, staged)
    w.commit(0, Array(GraftPartitionedCow.CowTaskFiles(
      Seq((staged.toString, fin.toString, 1L)))))
    assert(fs.exists(fin) && fs.exists(new Path(commits, "0")))
    assert(!fs.exists(new Path(commits, "0.manifest")))
  }
}
