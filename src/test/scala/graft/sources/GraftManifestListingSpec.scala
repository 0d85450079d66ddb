package graft.sources

import java.net.URI

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Counting local filesystem: every listStatus under a data directory
  * is recorded — the instrumentation proving a manifest-served scan
  * performs ZERO data-directory list calls.
  */
class CountingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftcnt"
  override def getUri: URI = URI.create("graftcnt:///")
  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    CountingLocalFs.record(p)
    super.listStatus(p)
  }
}

object CountingLocalFs {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def record(p: Path): Unit = calls.add(p.toUri.getPath)
  def reset(): Unit = calls.clear()
  /** list calls under `root` excluding engine sidecar dirs (underscore
    * or dot prefixed segments) — the data-directory listings a
    * manifest-served scan must not perform.
    */
  def dataListings(root: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    calls.asScala.toSeq.filter { p =>
      p.startsWith(root) &&
        !p.stripPrefix(root).split('/').exists(s =>
          s.startsWith("_") || s.startsWith("."))
    }
  }
}

/** Manifest-served scan planning ([[GraftManifestListing]], r14 item
  * 4): with `scan.listing_from_manifest = true` and a current census,
  * scans plan from synthesized file statuses — zero data-directory
  * listStatus calls (instrumented filesystem) — with partition pruning
  * intact; ANY change since the census falls back to the real listing,
  * never a stale scan.
  */
class GraftManifestListingSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftcnt.impl", classOf[CountingLocalFs].getName)
    val name = s"gml${n}_${System.nanoTime()}"
    val local = tmpDir(s"graft-ml-$name")
    val root = s"graftcnt://$local"
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, local)
  }

  test("fresh census: zero data-directory listings, pruning intact; any change falls back") {
    val (cat, local) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES " +
      s"('${GraftManifestListing.Prop}' = 'true')")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, id * 10, " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(0, 100)")
    // the guard band: the census only serves when the directories had
    // been quiet for 2s before the analyze walk — and the FIRST analyze
    // creates the stats dir itself (root mtime bump), so the census
    // arms from the second analyze on
    Thread.sleep(GraftManifestListing.GuardMs + 200)
    spark.sql(s"CALL $cat.system.analyze('ods.t')").collect()
    Thread.sleep(GraftManifestListing.GuardMs + 200)
    spark.sql(s"CALL $cat.system.analyze('ods.t')").collect()

    CountingLocalFs.reset()
    val full = spark.table(s"$cat.ods.t")
    assert(full.count() == 100)
    assert(full.agg(sum(col("v"))).head.getLong(0) ==
      (0L until 100L).map(_ * 10).sum)
    val pruned = spark.table(s"$cat.ods.t").where(col("p") === "a")
    assert(pruned.count() == 50)
    val listings = CountingLocalFs.dataListings(s"$local/ods/t")
    assert(listings.isEmpty,
      s"manifest-served scans still listed data dirs: $listings")
    // partition pruning proof: the 'a'-filtered scan planned only the
    // p=a partition's files
    pruned.collect()
    val scanned = new org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanHelper {}
      .collect(pruned.queryExecution.executedPlan) {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.partitions.flatten.collect {
            case fp: org.apache.spark.sql.execution.datasources
                .FilePartition => fp.files.map(_.toPath.toString).toSeq
          }.flatten
      }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("p=a")),
      s"pruning broke under the manifest index: $scanned")

    // a NEW commit makes the census stale: the scan falls back to the
    // real listing and sees the new rows — never a stale snapshot
    spark.sql(s"INSERT INTO $cat.ods.t VALUES (999, 1, 'c')")
    CountingLocalFs.reset()
    assert(spark.table(s"$cat.ods.t").count() == 101,
      "stale census served a pre-commit snapshot")
    assert(CountingLocalFs.dataListings(s"$local/ods/t").nonEmpty,
      "fallback scan should have listed")

    // re-analyze (after the guard) re-arms the census
    Thread.sleep(GraftManifestListing.GuardMs + 200)
    spark.sql(s"CALL $cat.system.analyze('ods.t')").collect()
    CountingLocalFs.reset()
    assert(spark.table(s"$cat.ods.t").count() == 101)
    assert(CountingLocalFs.dataListings(s"$local/ods/t").isEmpty)

    // row-level ops keep working (they use their own write-path
    // listings; correctness is what matters here)
    spark.sql(s"DELETE FROM $cat.ods.t WHERE k = 999")
    assert(spark.table(s"$cat.ods.t").count() == 100,
      "post-census DML must read through (fallback), not stale-serve")
  }

  test("journal-proof census: zero data-dir listings with mtime proof DISABLED (object-store semantics); divergence falls back loudly (r15 item 4)") {
    val (cat, local) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.j (k BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES " +
      s"('${GraftManifestListing.Prop}' = 'true')")
    spark.sql(s"INSERT INTO $cat.ods.j SELECT id, id * 10, " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(0, 100)")
    spark.sql(s"CALL $cat.system.analyze('ods.j')").collect()
    // NO guard-band sleeps: the journal proof does not rest on mtimes
    val prev = spark.conf.getOption(GraftManifestListing.MtimeProofConf)
    spark.conf.set(GraftManifestListing.MtimeProofConf, "false")
    try {
      CountingLocalFs.reset()
      assert(spark.table(s"$cat.ods.j").count() == 100)
      assert(spark.table(s"$cat.ods.j").where(col("p") === "a")
        .count() == 50)
      val listings = CountingLocalFs.dataListings(s"$local/ods/j")
      assert(listings.isEmpty,
        s"journal-proof scans still listed data dirs: $listings")

      // a new journaled commit: the file list comes from the JOURNAL's
      // accounted-live set at the latest complete commit (r17 — the
      // Delta-log pointer contract), with the census as the status
      // cache and one getFileStatus for the post-analyze file — the
      // fresh rows serve with STILL zero data-dir listings
      spark.sql(s"INSERT INTO $cat.ods.j VALUES (999, 1, 'c')")
      CountingLocalFs.reset()
      assert(spark.table(s"$cat.ods.j").count() == 101,
        "journal-pinned census served a stale snapshot")
      assert(CountingLocalFs.dataListings(s"$local/ods/j").isEmpty,
        "journal-pinned serving must not list data dirs for " +
          "post-analyze commits")

      // re-analyze refreshes the status cache; serving stays zero-list
      spark.sql(s"CALL $cat.system.analyze('ods.j')").collect()
      CountingLocalFs.reset()
      assert(spark.table(s"$cat.ods.j").count() == 101)
      assert(CountingLocalFs.dataListings(s"$local/ods/j").isEmpty,
        "journal proof failed to serve after re-analyze")

      // a row-level DELETE retires files and publishes a rewrite: the
      // journal-pinned plan must track it exactly (no stale files, no
      // missing rows), still with zero data-dir listings
      spark.sql(s"DELETE FROM $cat.ods.j WHERE k >= 90")
      CountingLocalFs.reset()
      assert(spark.table(s"$cat.ods.j").count() == 90,
        "journal-pinned serving missed a row-level rewrite")
      assert(CountingLocalFs.dataListings(s"$local/ods/j").isEmpty,
        "post-DML journal-pinned serving listed data dirs")
    } finally prev match {
      case Some(v) =>
        spark.conf.set(GraftManifestListing.MtimeProofConf, v)
      case None =>
        spark.conf.unset(GraftManifestListing.MtimeProofConf)
    }
  }
}
