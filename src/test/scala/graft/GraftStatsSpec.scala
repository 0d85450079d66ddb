package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.runtime.Catalog

/** File-level data skipping ([[graft.sources.GraftStats]]): ANALYZE
  * collects per-file column min/max from parquet footers into the
  * `_graft_stats` sidecar; scans then drop whole files whose stats
  * prove a pushed data filter can't match — the pruning tier between
  * hive partition directories and parquet row-group filters, and the
  * one that matters at 100 TB where opening a million footers to skip
  * them is itself the bottleneck.
  *
  * Every test asserts BOTH the pruning (scheduled file count) and the
  * result (values), because a data-skipping bug that drops a live file
  * is silent data loss.
  */
class GraftStatsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gst${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-st-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  /** Files actually scheduled by the v2 scan(s) of `df` — the
    * AdaptiveSparkPlanHelper `collect` sees through AQE wrappers and
    * materialized query stages (a plain `plan.collect` would not).
    */
  private def scannedFiles(df: DataFrame,
      only: BatchScanExec => Boolean = _ => true): Int =
    collect(df.queryExecution.executedPlan) {
      case b: BatchScanExec if only(b) =>
        b.partitions.flatten.map {
          // KeyedFilePartition (bucketed scans) extends FilePartition
          case fp: FilePartition => fp.files.length
          case _ => 0
        }.sum
    }.sum

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] =
    collect(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }

  /** Four single-task inserts → four files with disjoint id ranges. */
  private def seedRanged(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (id BIGINT, tag STRING, score DOUBLE)")
    (0 until 4).foreach { b =>
      val lo = b * 100
      (lo until lo + 100).map(i => (i.toLong, s"g$b", i / 7.0))
        .toDF("id", "tag", "score").coalesce(1)
        .createOrReplaceTempView("gst_src")
      spark.sql(s"INSERT INTO $cat.ods.t SELECT * FROM gst_src")
    }
  }

  test("auto_analyze: writes keep the manifest fresh without a CALL") {
    n += 1
    val name = s"gsta${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sta-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.auto_analyze", "true")
    seedRanged(name)
    // NO CALL system.analyze anywhere in this test: the inserts
    // themselves refreshed the manifest at each commit
    val q = spark.table(s"$name.ods.t").where(col("id") === 150)
    assert(q.count() == 1)
    assert(scannedFiles(q) == 1, s"expected 1 file, got ${scannedFiles(q)}")
    // a later append is immediately covered too
    Seq((1000L, "late", 0.0)).toDF("id", "tag", "score").coalesce(1)
      .createOrReplaceTempView("gst_auto")
    spark.sql(s"INSERT INTO $name.ods.t SELECT * FROM gst_auto")
    val q2 = spark.table(s"$name.ods.t").where(col("id") === 1000)
    assert(q2.count() == 1)
    assert(scannedFiles(q2) == 1)
    // and a COW rewrite leaves fresh (not just invalidated) stats: at
    // commit the replacement generation is re-analyzed, so EVERY
    // visible file has a VALID manifest entry (size+mtime match) —
    // the rewrite may coalesce input splits into range-overlapping
    // files, so coverage (not a scheduled-file count) is the claim
    spark.sql(s"UPDATE $name.ods.t SET tag = 'hot' WHERE id = 150")
    val q3 = spark.table(s"$name.ods.t").where(col("id") === 150)
    assert(q3.collect().map(_.getString(1)).toSeq == Seq("hot"))
    import org.apache.hadoop.fs.Path
    val dirP = new Path(s"$root/ods/t")
    val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = graft.sources.GraftStats.read(fs, dirP)
    def files(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("_") || nm.startsWith(".")) Nil
        else if (st.isDirectory) files(st.getPath) else Seq(st)
      }
    files(dirP).foreach { st =>
      val rel = st.getPath.toUri.getPath
        .stripPrefix(dirP.toUri.getPath).stripPrefix("/")
      val e = manifest.get(rel)
      assert(e.exists(m => m.size == st.getLen &&
        m.mtime == st.getModificationTime),
        s"rewritten file $rel lacks a fresh manifest entry")
    }
  }

  test("manifest-answered aggregate plans as a LocalTableScan, zero file opens") {
    n += 1
    val name = s"gsta${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sta-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.auto_analyze", "true")
    seedRanged(name)
    def isLocal(df: DataFrame): Boolean = {
      val plan = df.queryExecution.executedPlan
      collect(plan) {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }.nonEmpty &&
        collect(plan) { case b: BatchScanExec => b }.isEmpty
    }
    val q = spark.sql(s"SELECT count(*) AS c, count(tag) AS ct, " +
      s"min(id) AS mn, max(id) AS mx FROM $name.ods.t")
    assert(q.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) ==
      Seq((400L, 400L, 0L, 399L)))
    assert(isLocal(q), "metadata aggregate did not plan as LocalTableScan")

    // the hard proof of "no file opened": corrupt every data file
    // in-place (same length, mtime restored) — the manifest answer
    // must not notice, while a genuine scan must now fail
    import org.apache.hadoop.fs.Path
    val dirP = new Path(s"$root/ods/t")
    val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("_") || nm.startsWith(".")) Nil
        else if (st.isDirectory) dataFiles(st.getPath) else Seq(st)
      }
    dataFiles(dirP).foreach { st =>
      val mt = st.getModificationTime
      val out = fs.create(st.getPath, true)
      out.write(new Array[Byte](st.getLen.toInt)); out.close()
      fs.setTimes(st.getPath, mt, -1)
    }
    val q2 = spark.sql(
      s"SELECT count(*) AS c, max(id) AS mx FROM $name.ods.t")
    assert(q2.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((400L, 399L)))
    assert(isLocal(q2))
    // sum() is not manifest-derivable -> real scan -> corrupt parquet
    intercept[Throwable] {
      spark.sql(s"SELECT sum(id) FROM $name.ods.t").collect()
    }
  }

  test("aggregate fast path declines fail-safe: uncovered file, filter, string, distinct") {
    val (cat, root) = freshCatalog()
    seedRanged(cat)
    spark.sql(s"CALL $cat.system.analyze('ods.t')")
    def planOf(df: DataFrame) = df.queryExecution.executedPlan
    def isScan(df: DataFrame): Boolean =
      collect(planOf(df)) { case b: BatchScanExec => b }.nonEmpty
    // all-covered: the count/min/max rides the manifest
    val fast = spark.sql(s"SELECT count(*) AS c FROM $cat.ods.t")
    assert(fast.head.getLong(0) == 400L && !isScan(fast))
    // a filter (even a partition-free one) disables the fast path
    val filt = spark.table(s"$cat.ods.t").where(col("id") >= 200)
      .agg(count(lit(1)).as("c"))
    assert(filt.head.getLong(0) == 200L && isScan(filt))
    // string min/max: refused (parquet may truncate binary stats)
    val smin = spark.sql(s"SELECT min(tag) AS m FROM $cat.ods.t")
    assert(smin.head.getString(0) == "g0" && isScan(smin))
    // count(distinct): not derivable
    val dst = spark.sql(s"SELECT count(DISTINCT tag) AS d FROM $cat.ods.t")
    assert(dst.head.getLong(0) == 4L && isScan(dst))
    // an append AFTER the analyze leaves one uncovered file: the
    // aggregate must fall back to the scan and SEE the new row
    Seq((9999L, "late", 0.0)).toDF("id", "tag", "score").coalesce(1)
      .createOrReplaceTempView("gst_late_agg")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT * FROM gst_late_agg")
    val after = spark.sql(
      s"SELECT count(*) AS c, max(id) AS mx FROM $cat.ods.t")
    assert(after.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((401L, 9999L)))
    assert(isScan(after))
  }

  test("manifest aggregate: null counts and all-null files answer exactly") {
    n += 1
    val name = s"gsta${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sta-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.auto_analyze", "true")
    spark.sql(s"CREATE NAMESPACE $name.ods")
    spark.sql(s"CREATE TABLE $name.ods.nl (id BIGINT, v BIGINT)")
    Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("id", "v").coalesce(1).createOrReplaceTempView("gst_nl1")
    spark.sql(s"INSERT INTO $name.ods.nl SELECT * FROM gst_nl1")
    // second file: v entirely NULL (min/max absent, nulls == rows)
    Seq((4L, None: Option[Long]), (5L, None: Option[Long]))
      .toDF("id", "v").coalesce(1).createOrReplaceTempView("gst_nl2")
    spark.sql(s"INSERT INTO $name.ods.nl SELECT * FROM gst_nl2")
    val q = spark.sql(s"SELECT count(*) AS c, count(v) AS cv, " +
      s"min(v) AS mn, max(v) AS mx FROM $name.ods.nl")
    val r = q.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (5L, 2L, 10L, 30L))
    assert(collect(q.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }.isEmpty, "null-count aggregate should ride the manifest")
  }

  test("GROUP BY partition column rides the manifest; data-column grouping scans") {
    n += 1
    val name = s"gsta${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sta-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.auto_analyze", "true")
    spark.sql(s"CREATE NAMESPACE $name.ods")
    spark.sql(s"CREATE TABLE $name.ods.pt (id BIGINT, g STRING) " +
      "PARTITIONED BY (g)")
    (0 until 300).map(i => (i.toLong, s"p${i % 3}"))
      .toDF("id", "g").createOrReplaceTempView("gst_pt")
    spark.sql(s"INSERT INTO $name.ods.pt SELECT * FROM gst_pt")
    def isLocal(df: DataFrame): Boolean =
      collect(df.queryExecution.executedPlan) {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }.nonEmpty && collect(df.queryExecution.executedPlan) {
        case b: BatchScanExec => b
      }.isEmpty
    val q = spark.sql(s"SELECT g, count(*) AS c, count(g) AS cg, " +
      s"min(id) AS lo, max(id) AS hi FROM $name.ods.pt GROUP BY g")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq ==
      Seq(("p0", 100L, 100L, 0L, 297L), ("p1", 100L, 100L, 1L, 298L),
        ("p2", 100L, 100L, 2L, 299L)))
    assert(isLocal(q), "partition-grouped aggregate should ride the manifest")
    // min/max of the partition column itself (dir tokens are exact,
    // so strings ARE served here, unlike data-column string stats)
    val q2 = spark.sql(
      s"SELECT min(g) AS glo, max(g) AS ghi, count(*) AS c FROM $name.ods.pt")
    assert(q2.collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))) ==
      Seq(("p0", "p2", 300L)))
    assert(isLocal(q2))
    // grouping by a DATA column needs row reads -> falls back to scan
    val q3 = spark.sql(
      s"SELECT id % 2 AS par, count(*) AS c FROM $name.ods.pt GROUP BY id % 2")
    assert(q3.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .toSeq == Seq((0L, 150L), (1L, 150L)))
    assert(!isLocal(q3))
  }

  test("partition-column filters stay on the manifest fast path; data filters don't") {
    n += 1
    val name = s"gsta${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sta-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.auto_analyze", "true")
    spark.sql(s"CREATE NAMESPACE $name.ods")
    spark.sql(s"CREATE TABLE $name.ods.pf (id BIGINT, g STRING, d DATE) " +
      "PARTITIONED BY (g, d)")
    // g and d vary independently: 16 (g, d) leaf partitions of 25 rows
    (0 until 400).map(i =>
      (i.toLong, s"p${i % 4}", java.sql.Date.valueOf(f"2024-01-${i / 100 + 1}%02d")))
      .toDF("id", "g", "d").createOrReplaceTempView("gst_pf")
    spark.sql(s"INSERT INTO $name.ods.pf SELECT * FROM gst_pf")
    def isLocal(df: DataFrame): Boolean =
      collect(df.queryExecution.executedPlan) {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }.nonEmpty && collect(df.queryExecution.executedPlan) {
        case b: BatchScanExec => b
      }.isEmpty
    // equality on one partition level
    val q1 = spark.sql(s"SELECT count(*) AS c, min(id) AS lo " +
      s"FROM $name.ods.pf WHERE g = 'p1'")
    assert(q1.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((100L, 1L)))
    assert(isLocal(q1), "partition-equality aggregate should ride the manifest")
    // IN + DATE range across both levels, grouped
    val q2 = spark.sql(s"SELECT g, count(*) AS c FROM $name.ods.pf " +
      s"WHERE g IN ('p0', 'p2') AND d >= DATE'2024-01-03' GROUP BY g")
    assert(q2.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq == Seq(("p0", 50L), ("p2", 50L)))
    assert(isLocal(q2))
    // empty partition-filter result: one row, count 0 (global agg)
    val q3 = spark.sql(
      s"SELECT count(*) AS c, max(id) AS hi FROM $name.ods.pf WHERE g = 'zz'")
    val r3 = q3.head
    assert(r3.getLong(0) == 0L && r3.isNullAt(1))
    assert(isLocal(q3))
    // a data-column filter bails to the scan (values still exact)
    val q4 = spark.sql(s"SELECT count(*) AS c FROM $name.ods.pf " +
      s"WHERE g = 'p1' AND id < 100")
    assert(q4.head.getLong(0) == 25L && !isLocal(q4))
  }

  test("analyze + long-range predicate schedules exactly the covering file") {
    val (cat, root) = freshCatalog()
    seedRanged(cat)
    val eng = Catalog(spark, root)
    assert(eng.analyze("ods", "t") == 4)

    val q = spark.table(s"$cat.ods.t").where(col("id") >= 120 && col("id") <= 180)
    assert(q.count() == 61)
    assert(scannedFiles(q) == 1,
      s"expected 1 file, plan:\n${q.queryExecution.executedPlan}")

    // unfiltered scan still reads everything
    val all = spark.table(s"$cat.ods.t")
    assert(all.count() == 400)
    assert(scannedFiles(all) == 4)
  }

  test("string equality prunes to the one file holding the value") {
    val (cat, root) = freshCatalog()
    seedRanged(cat)
    Catalog(spark, root).analyze("ods", "t")
    val q = spark.table(s"$cat.ods.t").where(col("tag") === "g2")
    assert(q.count() == 100)
    assert(scannedFiles(q) == 1)
    // IN over two values → two files
    val q2 = spark.table(s"$cat.ods.t").where(col("tag").isin("g0", "g3"))
    assert(q2.count() == 200)
    assert(scannedFiles(q2) == 2)
  }

  test("IS NULL prunes null-free files; all-null file answers value predicates false") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.nn (id BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .createOrReplaceTempView("gst_nn1")
    spark.sql(s"INSERT INTO $cat.ods.nn SELECT * FROM gst_nn1")
    Seq((3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]))
      .toDF("id", "v").coalesce(1).createOrReplaceTempView("gst_nn2")
    spark.sql(s"INSERT INTO $cat.ods.nn SELECT * FROM gst_nn2")
    Catalog(spark, root).analyze("ods", "nn")

    val nulls = spark.table(s"$cat.ods.nn").where(col("v").isNull)
    assert(nulls.count() == 2)
    assert(scannedFiles(nulls) == 1) // the null-free file is skipped

    // a value predicate can't match the all-null file
    val eq = spark.table(s"$cat.ods.nn").where(col("v") === "a")
    assert(eq.count() == 1)
    assert(scannedFiles(eq) == 1)
  }

  test("files written after analyze scan unpruned (fail-safe, no loss)") {
    val (cat, root) = freshCatalog()
    seedRanged(cat)
    val eng = Catalog(spark, root)
    eng.analyze("ods", "t")
    // new generation arrives AFTER the manifest — same id range as an
    // analyzed file, so a non-fail-safe pruner would drop it
    Seq((150L, "late", 0.0)).toDF("id", "tag", "score").coalesce(1)
      .createOrReplaceTempView("gst_late")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT * FROM gst_late")

    val q = spark.table(s"$cat.ods.t").where(col("id") === 150)
    assert(q.count() == 2) // both the analyzed file's row and the late row
    assert(scannedFiles(q) == 2) // pruned to 1 known file + 1 unknown file

    // incremental analyze prices only the delta, then prunes both
    assert(eng.analyze("ods", "t") == 1)
    val q2 = spark.table(s"$cat.ods.t").where(col("id") === 350)
    assert(q2.count() == 1)
    assert(scannedFiles(q2) == 1)
  }

  test("stale manifest after a full rewrite never wrong-prunes") {
    val (cat, root) = freshCatalog()
    seedRanged(cat)
    val eng = Catalog(spark, root)
    eng.analyze("ods", "t")
    // compactByName rewrites every file under new names; the manifest
    // still describes the OLD generation
    eng.compactByName("ods", "t")
    val q = spark.table(s"$cat.ods.t").where(col("id") >= 120 && col("id") <= 180)
    assert(q.count() == 61) // correctness holds; nothing is pruned
    // and a re-analyze restores pruning on the new layout
    assert(eng.analyze("ods", "t") > 0)
    val q2 = spark.table(s"$cat.ods.t").where(col("id") === 42)
    assert(q2.count() == 1)
    assert(scannedFiles(q2) < 4)
  }

  test("double predicates never prune (NaN-safe by design)") {
    val (cat, root) = freshCatalog()
    seedRanged(cat)
    Catalog(spark, root).analyze("ods", "t")
    val q = spark.table(s"$cat.ods.t").where(col("score") > 1000.0)
    assert(q.count() == 0)
    assert(scannedFiles(q) == 4) // stats deliberately absent for double
  }

  test("estimateStatistics reports post-skip bytes and exact analyzed rows") {
    val (cat, root) = freshCatalog()
    seedRanged(cat)
    Catalog(spark, root).analyze("ods", "t")
    def scanStats(df: DataFrame) = {
      val scan = collect(df.queryExecution.sparkPlan) {
        case b: BatchScanExec => b.scan
      }.head
      scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
    }
    val whole = scanStats(spark.table(s"$cat.ods.t"))
    // filter covers exactly one 100-row file: the reported stats are
    // the SURVIVORS' (this is what lets a skipped-down fact side drop
    // under the broadcast threshold at planning time)
    val one = scanStats(
      spark.table(s"$cat.ods.t").where(col("id") >= 120 && col("id") <= 180))
    assert(one.numRows.isPresent && one.numRows.getAsLong == 100)
    assert(one.sizeInBytes.isPresent && whole.sizeInBytes.isPresent &&
      one.sizeInBytes.getAsLong < whole.sizeInBytes.getAsLong)
    // a predicate no file can hold: exact zero
    val none = scanStats(
      spark.table(s"$cat.ods.t").where(col("id") === 5000))
    assert(none.numRows.isPresent && none.numRows.getAsLong == 0)
  }

  test("COW update invalidates its files' stats entries (no wrong-prune)") {
    val (cat, root) = freshCatalog()
    seedRanged(cat)
    val eng = Catalog(spark, root)
    eng.analyze("ods", "t")
    // rewrite moves a row INTO the range the old stats say can't match
    spark.sql(s"UPDATE $cat.ods.t SET id = 9999 WHERE id = 250")
    val q = spark.table(s"$cat.ods.t").where(col("id") === 9999)
    assert(q.count() == 1) // the rewritten file has a new name → unpruned
    // untouched files still prune after re-analyze
    assert(eng.analyze("ods", "t") >= 1)
    val q2 = spark.table(s"$cat.ods.t").where(col("id") === 9999)
    assert(q2.count() == 1)
    assert(scannedFiles(q2) == 1)
  }

  /** r12 item 1 — the manifest's scale shape: one shard per partition
    * directory plus a fingerprint index. A write reconciles only its
    * own partitions' shards; a partition-pruned read opens only the
    * matching shards.
    */
  test("sharded manifest: an append to one partition rewrites only that shard") {
    n += 1
    val name = s"gsta${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sta-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.auto_analyze", "true")
    spark.sql(s"CREATE NAMESPACE $name.ods")
    spark.sql(s"CREATE TABLE $name.ods.sh (id BIGINT, g STRING) " +
      "PARTITIONED BY (g)")
    (0 until 300).map(i => (i.toLong, s"p${i % 3}"))
      .toDF("id", "g").createOrReplaceTempView("gst_sh")
    spark.sql(s"INSERT INTO $name.ods.sh SELECT * FROM gst_sh")

    import org.apache.hadoop.fs.Path
    val dirP = new Path(s"$root/ods/sh")
    val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def shardState(g: String): (Long, Long, String) = {
      val p = graft.sources.GraftStats.shardFile(dirP, s"g=$g")
      assert(fs.exists(p), s"missing shard for g=$g")
      val st = fs.getFileStatus(p)
      val in = fs.open(p)
      val md = java.security.MessageDigest.getInstance("MD5")
      try {
        val buf = new Array[Byte](65536)
        var r = in.read(buf)
        while (r >= 0) { md.update(buf, 0, r); r = in.read(buf) }
      } finally in.close()
      (st.getLen, st.getModificationTime,
        md.digest().map(b => f"$b%02x").mkString)
    }
    val before = Seq("p0", "p1", "p2").map(g => g -> shardState(g)).toMap
    Thread.sleep(5) // let a rewrite be observable via mtime
    // append lands in g=p1 only
    Seq((9999L, "p1")).toDF("id", "g").coalesce(1)
      .createOrReplaceTempView("gst_sh_late")
    spark.sql(s"INSERT INTO $name.ods.sh SELECT * FROM gst_sh_late")
    val after = Seq("p0", "p1", "p2").map(g => g -> shardState(g)).toMap
    // touched shard reconciled; siblings BYTE-IDENTICAL and not even
    // rewritten (same mtime — the index fingerprint proved them fresh)
    assert(after("p1") != before("p1"), "touched shard was not refreshed")
    assert(after("p0") == before("p0") && after("p2") == before("p2"),
      s"sibling shards were rewritten:\n$before\nvs\n$after")
    // and the fresh entry prunes immediately
    val q = spark.table(s"$name.ods.sh").where(col("id") === 9999L)
    assert(q.count() == 1)
    assert(scannedFiles(q) == 1, s"expected 1 file, got ${scannedFiles(q)}")
  }

  test("sharded manifest: a partition-pruned query opens only matching shards (zero-read proof)") {
    n += 1
    val name = s"gsta${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-sta-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.auto_analyze", "true")
    spark.sql(s"CREATE NAMESPACE $name.ods")
    spark.sql(s"CREATE TABLE $name.ods.zr (id BIGINT, g STRING) " +
      "PARTITIONED BY (g)")
    (0 until 300).map(i => (i.toLong, s"p${i % 3}"))
      .toDF("id", "g").createOrReplaceTempView("gst_zr")
    spark.sql(s"INSERT INTO $name.ods.zr SELECT * FROM gst_zr")

    import org.apache.hadoop.fs.Path
    val dirP = new Path(s"$root/ods/zr")
    val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // make the NON-matching shards unopenable: replace each file with a
    // DIRECTORY of the same name — any attempt to read it throws, so a
    // passing query PROVES the shard was never opened
    Seq("p0", "p2").foreach { g =>
      val p = graft.sources.GraftStats.shardFile(dirP, s"g=$g")
      assert(fs.exists(p))
      fs.delete(p, false)
      fs.mkdirs(p)
    }
    // partition-pruned scan with a data filter: reads only g=p1's shard
    val q = spark.table(s"$name.ods.zr")
      .where(col("g") === "p1" && col("id") === 10L)
    assert(q.count() == 1)
    assert(scannedFiles(q) >= 1)
    // partition-filtered METADATA aggregate: answered from g=p1's shard
    // alone — corrupt every g=p1 data file in place to prove no data
    // read either
    def dataFiles(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("_") || nm.startsWith(".")) Nil
        else if (st.isDirectory) dataFiles(st.getPath) else Seq(st)
      }
    dataFiles(new Path(dirP, "g=p1")).foreach { st =>
      val mt = st.getModificationTime
      val out = fs.create(st.getPath, true)
      out.write(new Array[Byte](st.getLen.toInt)); out.close()
      fs.setTimes(st.getPath, mt, -1)
    }
    val agg = spark.sql(s"SELECT count(*) AS c, max(id) AS mx " +
      s"FROM $name.ods.zr WHERE g = 'p1'")
    assert(agg.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((100L, 298L)))
    assert(collect(agg.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }.isEmpty, "filtered metadata aggregate should ride the manifest")
    // CONTROL: a query with no partition filter must consult all
    // shards — with two of them corrupted it cannot plan quietly
    intercept[Throwable] {
      spark.table(s"$name.ods.zr").where(col("id") === 10L).count()
    }
  }

  test("bucketed table: pruning inside groups keeps the exchange-free join") {
    val (cat, root) = freshCatalog()
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.dds")
      spark.sql(s"CREATE TABLE $cat.dds.f (k BIGINT, day STRING, v BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
      spark.sql(s"CREATE TABLE $cat.dds.d (k BIGINT, tag STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      // two generations of fact files per bucket with disjoint `day`s
      Seq("d1", "d2").foreach { day =>
        (1L to 200L).map(i => (i, day, i)).toDF("k", "day", "v")
          .createOrReplaceTempView("gst_f_src")
        spark.sql(s"INSERT INTO $cat.dds.f SELECT * FROM gst_f_src")
      }
      (1L to 200L).map(i => (i, s"t${i % 5}")).toDF("k", "tag")
        .createOrReplaceTempView("gst_d_src")
      spark.sql(s"INSERT INTO $cat.dds.d SELECT * FROM gst_d_src")
      val eng = Catalog(spark, root)
      assert(eng.analyze("dds", "f") > 0)

      // join WITHOUT aggregation: a same-spec storage-partitioned join
      // must stay completely exchange-free even with files pruned out
      // of some bucket groups
      val joined = spark.table(s"$cat.dds.f").where(col("day") === "d2")
        .join(spark.table(s"$cat.dds.d"), Seq("k"))
      assert(joined.count() == 200)
      assert(shuffles(joined).isEmpty,
        s"join shuffled:\n${joined.queryExecution.executedPlan}")
      // the fact side scheduled only the d2 generation: 4 files, not 8
      val factFiles = scannedFiles(joined,
        only = _.schema.fieldNames.contains("day"))
      assert(factFiles == 4, s"expected 4 of 8 fact files, got $factFiles")

      // and the values survive the pruning
      val agg = joined.groupBy("tag").agg(sum("v").as("sv"))
      assert(agg.collect().map(_.getAs[Long]("sv")).sum == (1L to 200L).sum)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None =>
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("NDV registers: per-shard and merged estimates within HLL error (r13 item 7)") {
    import graft.sources.GraftStats
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (k BIGINT, s STRING, g STRING) " +
      "PARTITIONED BY (g)")
    // p0: 500 distinct k / 500 distinct s; p1: 1000 distinct of each,
    // overlapping p0's — overall 1000 distinct; several files per dir
    (0 until 2).foreach { i =>
      spark.sql(s"INSERT INTO $cat.ods.t SELECT id % 500, " +
        s"concat('v', id % 500), 'p0' FROM range(${i * 2000}, ${(i + 1) * 2000})")
      spark.sql(s"INSERT INTO $cat.ods.t SELECT id % 1000, " +
        s"concat('v', id % 1000), 'p1' FROM range(${i * 3000}, ${(i + 1) * 3000})")
    }
    spark.sql(s"CALL $cat.system.analyze(table => 'ods.t', " +
      "ndv_columns => 'k,s')")
    val dirP = new org.apache.hadoop.fs.Path(s"$root/ods/t")
    val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def merged(keys: Set[String], col: String): Long = {
      val entries = GraftStats.readForDirs(fs, dirP, keys)
      assert(entries.nonEmpty)
      val regs = entries.values.toSeq.map { st =>
        val c = st.cols.keys.find(_.equalsIgnoreCase(col)).get
        st.cols(c).hll.getOrElse(fail(s"no registers for $col"))
      }.reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
      GraftStats.ndvEstimate(regs)
    }
    def within(est: Long, truth: Long): Unit =
      assert(math.abs(est - truth).toDouble / truth <= 0.40,
        s"estimate $est vs true $truth exceeds the m=64 HLL error budget")
    // per shard
    within(merged(Set("g=p0"), "k"), 500)
    within(merged(Set("g=p1"), "k"), 1000)
    within(merged(Set("g=p0"), "s"), 500)
    // merged across shards: overlapping domains must NOT add up
    within(merged(Set("g=p0", "g=p1"), "k"), 1000)
    within(merged(Set("g=p0", "g=p1"), "s"), 1000)
    // incremental: a second pass builds nothing
    val (built2, covered2) = GraftStats.analyzeNdv(spark, dirP,
      spark.table(s"$cat.ods.t").schema, Seq("g"), Seq("k", "s"))
    assert(built2 == 0, s"second NDV pass re-read $built2 files")
    assert(covered2 >= 4)
    // an append invalidates only ITS files: the next pass reads those
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, concat('w', id), 'p0' " +
      "FROM range(5000, 5100, 1, 1)") // one slice -> one new file
    val (built3, _) = GraftStats.analyzeNdv(spark, dirP,
      spark.table(s"$cat.ods.t").schema, Seq("g"), Seq("k", "s"))
    assert(built3 == 1,
      s"incremental NDV pass touched $built3 files for a one-file append")
    // null counts ride along: manifest nulls are exact
    val nulls = GraftStats.readForDirs(fs, dirP, Set("g=p0", "g=p1"))
      .values.map { st =>
        st.cols(st.cols.keys.find(_.equalsIgnoreCase("k")).get).nulls
      }
    assert(nulls.forall(_ == 0L))
  }

  test("writer-side NDV maintenance: commits publish registers with ZERO data re-read; shipped equals the analyze path (r13 item 4)") {
    import graft.sources.GraftStats
    n += 1
    val name = s"gstw${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-stw-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.auto_analyze", "true")
    spark.sql(s"CREATE NAMESPACE $name.ods")
    // bucketed table = the v2 hive-layout write path whose task writers
    // reduce the registers as rows stream through
    spark.sql(s"CREATE TABLE $name.ods.t (k BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('ndv_columns' = 'k,s')")
    val readsBefore = GraftStats.ndvBuildReads.sum()
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO $name.ods.t SELECT id % 700, " +
        s"concat('v', id % 700) FROM range(${i * 1000}, ${(i + 1) * 1000})")
    }
    assert(GraftStats.ndvBuildReads.sum() == readsBefore,
      "auto-NDV re-read data files at commit despite writer-shipped registers")
    val dirP = new org.apache.hadoop.fs.Path(s"$root/ods/t")
    val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mergedEstimate(tdir: org.apache.hadoop.fs.Path, col: String): Long = {
      val entries = GraftStats.read(fs, tdir)
      assert(entries.nonEmpty)
      val regs = entries.values.toSeq.map { st =>
        val c = st.cols.keys.find(_.equalsIgnoreCase(col)).getOrElse(
          fail(s"entry lacks column $col"))
        st.cols(c).hll.getOrElse(fail(s"no shipped registers for $col"))
      }.reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
      GraftStats.ndvEstimate(regs)
    }
    // the shipped registers estimate within the m=64 error budget
    val estK = mergedEstimate(dirP, "k")
    assert(math.abs(estK - 700).toDouble / 700 <= 0.40, s"estimate $estK")

    // corruption proof on the JUST-WRITTEN files: replace every data
    // file with same-identity garbage, then run the maintenance CALL —
    // covered by the shipped registers, it must read NOTHING
    fs.listStatus(dirP).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")).foreach { st =>
      val (len, mtime) = (st.getLen, st.getModificationTime)
      val out = fs.create(st.getPath, true)
      try out.write(Array.fill(len.toInt)('x'.toByte)) finally out.close()
      fs.setTimes(st.getPath, mtime, -1)
    }
    spark.sql(s"CALL $name.system.analyze(table => 'ods.t', " +
      "ndv_columns => 'k,s')").collect()
    assert(GraftStats.ndvBuildReads.sum() == readsBefore,
      "analyze opened a just-written (corrupted) data file")

    // shipped registers EQUAL the analyze path's: same rows through
    // the data-pass build on a twin table, merged registers identical
    spark.sql(s"CREATE TABLE $name.ods.twin (k BIGINT, s STRING)")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO $name.ods.twin SELECT id % 700, " +
        s"concat('v', id % 700) FROM range(${i * 1000}, ${(i + 1) * 1000})")
    }
    spark.sql(s"CALL $name.system.analyze(table => 'ods.twin', " +
      "ndv_columns => 'k,s')").collect()
    val twinDir = new org.apache.hadoop.fs.Path(s"$root/ods/twin")
    def mergedRegs(tdir: org.apache.hadoop.fs.Path, col: String): Seq[Int] =
      GraftStats.read(fs, tdir).values.toSeq.map { st =>
        val c = st.cols.keys.find(_.equalsIgnoreCase(col)).get
        st.cols(c).hll.getOrElse(fail(s"no registers for $col"))
      }.reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
    Seq("k", "s").foreach { c =>
      assert(mergedRegs(dirP, c) == mergedRegs(twinDir, c),
        s"writer-shipped registers diverge from the analyze path's for $c")
    }
  }

  test("CBO reads the NDV column stats: a grouped side shrinks below the broadcast threshold (r13 item 7)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    // fact: 50k rows, k has only 8 distinct values; dim: 50k rows —
    // both tables' raw bytes exceed the (lowered) broadcast threshold
    spark.sql(s"CREATE TABLE $cat.ods.fact (k BIGINT, v BIGINT, pad STRING)")
    spark.sql(s"INSERT INTO $cat.ods.fact SELECT id % 8, id, " +
      "repeat('x', 32) FROM range(0, 50000)")
    spark.sql(s"CREATE TABLE $cat.ods.dim (k BIGINT, w BIGINT, pad STRING)")
    spark.sql(s"INSERT INTO $cat.ods.dim SELECT id % 8, id, " +
      "repeat('y', 32) FROM range(0, 50000)")
    spark.sql(s"CALL $cat.system.analyze(table => 'ods.fact', " +
      "ndv_columns => 'k')")
    spark.sql(s"CALL $cat.system.analyze(table => 'ods.dim')")

    def planOf(): org.apache.spark.sql.execution.SparkPlan = {
      val df = spark.table(s"$cat.ods.fact")
        .groupBy("k").agg(sum("v").as("sv"))
        .join(spark.table(s"$cat.ods.dim"), "k")
      df.queryExecution.sparkPlan // pre-AQE: the CBO-estimated plan
    }
    def hasBroadcast(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty

    val keys = Seq("spark.sql.cbo.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      // without CBO: no column stats are attached and the aggregate
      // side is not provably small — the join sort-merges
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(!hasBroadcast(planOf()),
        "baseline broadcast without NDV stats — the test proves nothing")
      // with CBO: the manifest NDV says the GROUP BY emits ~8 rows,
      // the aggregate side shrinks below the threshold, and the join
      // broadcasts at PLANNING time
      spark.conf.set("spark.sql.cbo.enabled", "true")
      assert(hasBroadcast(planOf()),
        s"NDV-informed aggregate side did not broadcast:\n${planOf()}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
