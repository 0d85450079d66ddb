package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Partition SPEC EVOLUTION ([[graft.sources.GraftEvolved]], r13 item
  * 3): `CALL system.evolve_partitioning` appends a data column to the
  * spec metadata-only; old files stay valid under their own era's
  * layout (pruned by the anchor), new files land under the extended
  * spec (pruned by BOTH); row-level ops work across eras; compact
  * migrates and finalizes.
  */
class GraftEvolvedSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gev${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-ev-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def scannedFiles(df: DataFrame): Int = {
    df.collect()
    collect(df.queryExecution.executedPlan) {
      case b: BatchScanExec =>
        b.partitions.flatten.map {
          case fp: FilePartition => fp.files.length
          case _ => 0
        }.sum
    }.sum
  }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dirS: String): Map[String, (Long, Long)] = {
    def walk(p: Path): Seq[(String, (Long, Long))] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("_") || nm.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq((st.getPath.toString, (st.getLen, st.getModificationTime)))
      }
    walk(new Path(dirS)).toMap
  }

  test("evolve date -> (date, region): metadata-only; old era pruned by anchor, new era by both") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.ev (k BIGINT, region STRING, " +
      "v BIGINT, d STRING) PARTITIONED BY (d)")
    // era 1 (old spec): one file per (d) dir via single-slice ranges;
    // region deliberately decorrelated from d
    spark.sql(s"INSERT INTO $cat.ods.ev SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'na' ELSE 'eu' END, id * 10, " +
      "concat('d', id % 2 + 1) FROM range(0, 200, 1, 1)")
    val fs = fsOf(root)
    val before = dataFiles(fs, s"$root/ods/ev")
    assert(before.nonEmpty)

    // the evolution: METADATA-ONLY, not one file moves
    val res = spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.ev', add_column => 'region')").head
    assert(res.getString(0) == "d,region" && res.getString(1) == "d")
    assert(dataFiles(fs, s"$root/ods/ev") == before,
      "evolution touched data files")

    // era 2 (new spec): fresh dates d3/d4 — directories carry region too
    spark.sql(s"INSERT INTO $cat.ods.ev SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'na' ELSE 'eu' END, id * 10, " +
      "concat('d', id % 2 + 3) FROM range(200, 400, 1, 1)")
    val newDirs = fs.listStatus(new Path(s"$root/ods/ev/d=d3"))
      .map(_.getPath.getName).filter(_.startsWith("region=")).sorted
    assert(newDirs.sameElements(Array("region=eu", "region=na")),
      s"new era did not lay out the evolved spec: ${newDirs.mkString(",")}")
    // evolved column kept IN the new files' data (the cross-era
    // invariant): read one new file raw and find the column
    val newFile = dataFiles(fs, s"$root/ods/ev/d=d3").keys.head
    assert(spark.read.parquet(newFile).columns.contains("region"),
      "evolved column missing from new files' data")

    // one table, both eras
    val t = spark.table(s"$cat.ods.ev")
    assert(t.count() == 400)
    assert(t.agg(sum("v")).head.getLong(0) == (0L until 400L).map(_ * 10).sum)
    assert(t.columns.toSeq == Seq("k", "region", "v", "d"))

    // anchor pruning spans eras: d = 'd2' schedules only d=d2 files
    val totalFiles = scannedFiles(spark.table(s"$cat.ods.ev"))
    val d2Files = dataFiles(fs, s"$root/ods/ev/d=d2").size
    assert(scannedFiles(t.where(col("d") === "d2")) == d2Files,
      "anchor pruning broke across eras")
    // row correctness under the pruned read
    assert(t.where(col("d") === "d2").count() == 100)

    // evolved-column pruning: new-era files prune by chain token, old
    // era keeps its files (rows filter)
    val d3NaFiles = dataFiles(fs, s"$root/ods/ev/d=d3/region=na").size
    val d3All = dataFiles(fs, s"$root/ods/ev/d=d3").size
    assert(d3NaFiles > 0 && d3NaFiles < d3All)
    assert(scannedFiles(t.where(col("d") === "d3" &&
      col("region") === "na")) == d3NaFiles,
      "new-era chain pruning missed")
    // multiples of 6 in [200,400): 204..396
    assert(t.where(col("d") === "d3" && col("region") === "na")
      .count() == 33)
    // a pure region filter schedules ALL old-era files (row-filtered)
    // plus ONLY the matching new-era dirs
    val naFiles = scannedFiles(t.where(col("region") === "na"))
    val oldEraFiles = before.size
    val newNaFiles = dataFiles(fs, s"$root/ods/ev/d=d3/region=na").size +
      dataFiles(fs, s"$root/ods/ev/d=d4/region=na").size
    assert(naFiles == oldEraFiles + newNaFiles,
      s"region='na' should scan the old era ($oldEraFiles) plus the " +
        s"matching new dirs ($newNaFiles), got $naFiles of $totalFiles")
    assert(naFiles < totalFiles, "evolved-column pruning pruned nothing")
    // multiples of 3 in [0,400) = 134
    assert(t.where(col("region") === "na").count() == 134,
      "rows lost under evolved-column filtering")
    assert(t.where(col("region") === "eu").count() == 266)

    // row-level ops ACROSS eras: a COW DELETE touches both
    spark.sql(s"DELETE FROM $cat.ods.ev WHERE k % 100 = 7") // 7,107,207,307
    assert(spark.table(s"$cat.ods.ev").count() == 396)
    assert(spark.table(s"$cat.ods.ev").where(col("k") % 100 === 7)
      .count() == 0)
    // MERGE across eras: update one old-era and one new-era row,
    // insert a fresh one
    spark.sql(s"CREATE TABLE $cat.ods.src (k BIGINT, region STRING, " +
      "v BIGINT, d STRING)")
    spark.sql(s"INSERT INTO $cat.ods.src VALUES " +
      "(10, 'na', 999, 'd1'), (210, 'na', 888, 'd3'), " +
      "(9999, 'eu', 777, 'd9')")
    spark.sql(s"""MERGE INTO $cat.ods.ev t USING $cat.ods.src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.table(s"$cat.ods.ev")
      .where(col("k").isin(10L, 210L, 9999L))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(got == Seq((10L, 999L), (210L, 888L), (9999L, 777L)), s"$got")
    assert(spark.table(s"$cat.ods.ev").count() == 397)

    // partition-granular replacement refuses while eras are mixed
    val e = intercept[Throwable] {
      spark.sql(s"SET spark.sql.sources.partitionOverwriteMode=dynamic")
      try Seq((1L, "na", 1L, "d1")).toDF("k", "region", "v", "d")
        .writeTo(s"$cat.ods.ev").overwritePartitions()
      finally spark.sql(
        s"SET spark.sql.sources.partitionOverwriteMode=static")
    }
    def msgs(t2: Throwable): Seq[String] =
      if (t2 == null) Nil else Option(t2.getMessage).toSeq ++ msgs(t2.getCause)
    assert(msgs(e).exists(_.contains("system.compact")), s"got: ${msgs(e)}")

    // metadata-only DELETE at anchor granularity drops BOTH eras' rows
    spark.sql(s"DELETE FROM $cat.ods.ev WHERE d = 'd1'")
    assert(spark.table(s"$cat.ods.ev").where(col("d") === "d1").count() == 0)

    // compact MIGRATES and FINALIZES: everything lands under the
    // current spec, the evolution closes, dynamic overwrite re-admits
    val preCompact = spark.table(s"$cat.ods.ev").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    spark.sql(s"CALL $cat.system.compact(table => 'ods.ev')")
    val postCompact = spark.table(s"$cat.ods.ev").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    assert(postCompact == preCompact, "compact changed the table state")
    // every file now lives at (d, region) depth
    dataFiles(fs, s"$root/ods/ev").keys.foreach { f =>
      assert(f.contains("/d=") && f.contains("/region="),
        s"post-compact file not under the current spec: $f")
    }
    // finalized: partition-granular ops re-admit
    spark.sql(s"SET spark.sql.sources.partitionOverwriteMode=dynamic")
    try Seq((5000L, "na", 5L, "d3")).toDF("k", "region", "v", "d")
      .writeTo(s"$cat.ods.ev").overwritePartitions()
    finally spark.sql(s"SET spark.sql.sources.partitionOverwriteMode=static")
    assert(spark.table(s"$cat.ods.ev")
      .where(col("d") === "d3" && col("region") === "na")
      .collect().map(_.getLong(0)).toSeq == Seq(5000L),
      "post-finalize dynamic overwrite broke")
  }

  test("the spec can evolve TWICE; merge-on-read deletes work across eras") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (k BIGINT, region STRING, " +
      "lang STRING, d STRING) PARTITIONED BY (d) " +
      "TBLPROPERTIES ('delete_mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'na' ELSE 'eu' END, " +
      "CASE WHEN id % 3 = 0 THEN 'en' ELSE 'de' END, " +
      "concat('d', id % 2) FROM range(0, 120, 1, 1)")
    spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.t', add_column => 'region')").collect()
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'na' ELSE 'eu' END, " +
      "CASE WHEN id % 3 = 0 THEN 'en' ELSE 'de' END, " +
      "concat('d', id % 2 + 2) FROM range(120, 240, 1, 1)")
    // second evolution: THREE eras coexist
    spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.t', add_column => 'lang')").collect()
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'na' ELSE 'eu' END, " +
      "CASE WHEN id % 3 = 0 THEN 'en' ELSE 'de' END, " +
      "concat('d', id % 2 + 4) FROM range(240, 360, 1, 1)")
    val fs = fsOf(root)
    assert(fs.exists(new Path(s"$root/ods/t/d=d4")))
    assert(dataFiles(fs, s"$root/ods/t/d=d4").keys
      .forall(p => p.contains("/region=") && p.contains("/lang=")),
      "third era not under the twice-evolved spec")
    val t = spark.table(s"$cat.ods.t")
    assert(t.count() == 360)
    assert(t.where(col("region") === "na").count() == 180)
    assert(t.where(col("lang") === "en").count() == 120)
    // merge-on-read positional DELETE spans all three eras (vectors
    // are (file, ordinal)-addressed — era-agnostic by construction)
    spark.sql(s"DELETE FROM $cat.ods.t WHERE k % 60 = 7")
    assert(spark.table(s"$cat.ods.t").count() == 354)
    assert(spark.table(s"$cat.ods.t").where(col("k") % 60 === 7)
      .count() == 0)
    import graft.sources.GraftDv
    assert(GraftDv.list(fs, new Path(s"$root/ods/t")).nonEmpty,
      "expected live deletion vectors (MOR path)")
    // materialize + compact-migrate + finalize: one clean era
    spark.sql(s"CALL $cat.system.rewrite_deletes(table => 'ods.t')")
    spark.sql(s"CALL $cat.system.compact(table => 'ods.t')")
    assert(spark.table(s"$cat.ods.t").count() == 354)
    dataFiles(fs, s"$root/ods/t").keys.foreach { p =>
      assert(p.contains("/d=") && p.contains("/region=") &&
        p.contains("/lang="), s"post-compact stray era: $p")
    }
  }

  test("streaming reads replan each micro-batch through the era-aware index") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.s (k BIGINT, region STRING, " +
      "d STRING) PARTITIONED BY (d)")
    spark.sql(s"INSERT INTO $cat.ods.s SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'na' ELSE 'eu' END, " +
      "concat('d', id % 2) FROM range(0, 100, 1, 1)")
    spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.s', add_column => 'region')").collect()
    spark.sql(s"INSERT INTO $cat.ods.s SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'na' ELSE 'eu' END, " +
      "concat('d', id % 2 + 2) FROM range(100, 200, 1, 1)")
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]
    val q = spark.readStream.table(s"$cat.ods.s")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("gev-stream-cp"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          sink.add((r.getLong(0), r.getString(1), r.getString(2))))
      }
      .start()
    try {
      q.processAllAvailable()
      // both eras delivered, anchor values from the chain, evolved
      // values from wherever that era carries them
      assert(sink.size == 200, s"got ${sink.size} of 200 rows")
      import scala.jdk.CollectionConverters._
      val rows = sink.asScala.toSeq
      assert(rows.count(_._2 == "na") == 100)
      assert(rows.filter(_._1 == 150L).map(_._3) == Seq("d2"))
      // a post-evolution append lands in the NEW era and streams too
      spark.sql(s"INSERT INTO $cat.ods.s VALUES (1000, 'na', 'd9')")
      q.processAllAvailable()
      assert(sink.size == 201)
    } finally q.stop()
  }

  test("manifest metadata aggregates answer across mixed eras (name-based chain parse)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.m (k BIGINT, region STRING, d STRING) " +
      "PARTITIONED BY (d)")
    spark.sql(s"INSERT INTO $cat.ods.m SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'na' ELSE 'eu' END, " +
      "concat('d', id % 2 + 1) FROM range(0, 200, 1, 1)")
    spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.m', add_column => 'region')").collect()
    spark.sql(s"INSERT INTO $cat.ods.m SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'na' ELSE 'eu' END, " +
      "concat('d', id % 2 + 3) FROM range(200, 400, 1, 1)")
    spark.sql(s"CALL $cat.system.analyze(table => 'ods.m')").collect()
    // the metadata fast path must survive the MIXED DEPTHS: old-era
    // files sit at d=X/, new-era at d=X/region=Y/ — the anchor token
    // parses by NAME from each file's own chain
    def isLocal(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.collect()
      val plan = df.queryExecution.executedPlan
      collect(plan) {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }.nonEmpty && collect(plan) { case b: BatchScanExec => b }.isEmpty
    }
    val agg = spark.sql(s"SELECT d, count(*) AS n, min(k) AS mn, " +
      s"max(k) AS mx FROM $cat.ods.m GROUP BY d")
    val got = agg.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(got == Seq(("d1", 100L, 0L, 198L), ("d2", 100L, 1L, 199L),
      ("d3", 100L, 200L, 398L), ("d4", 100L, 201L, 399L)), s"$got")
    assert(isLocal(agg),
      "metadata aggregate did not plan as LocalTableScan on mixed eras")
    // with an anchor partition filter too
    val filt = spark.sql(s"SELECT count(*) AS n FROM $cat.ods.m " +
      "WHERE d = 'd3'")
    assert(filt.head.getLong(0) == 100L)
    assert(isLocal(filt))
    // the hard zero-open proof: corrupt every data file in place —
    // the manifest answer must not notice
    val fs = fsOf(root)
    dataFiles(fs, s"$root/ods/m").foreach { case (p, (len, mtime)) =>
      val out = fs.create(new Path(p), true)
      try out.write(new Array[Byte](len.toInt)) finally out.close()
      fs.setTimes(new Path(p), mtime, -1)
    }
    val agg2 = spark.sql(s"SELECT count(*) AS n FROM $cat.ods.m " +
      "WHERE d = 'd1'")
    assert(agg2.head.getLong(0) == 100L)
    assert(isLocal(agg2))
    // a grouping by the EVOLVED column declines (data column): real
    // scan, which now fails on the corrupted files — honest decline
    intercept[Throwable] {
      spark.sql(s"SELECT region, count(*) FROM $cat.ods.m GROUP BY region")
        .collect()
    }
  }

  test("evolution refusals: unknown/partition/bucket columns, non-parquet shapes") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (k BIGINT, g STRING, x DOUBLE) " +
      "PARTITIONED BY (g)")
    def refused(sqlText: String, needle: String): Unit = {
      val e = intercept[Throwable](spark.sql(sqlText).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(needle)),
        s"expected '$needle' in: ${msgs(e).mkString(" | ")}")
    }
    refused(s"CALL $cat.system.evolve_partitioning(table => 'ods.t', " +
      "add_column => 'nope')", "not in schema")
    refused(s"CALL $cat.system.evolve_partitioning(table => 'ods.t', " +
      "add_column => 'g')", "already a partition column")
    refused(s"CALL $cat.system.evolve_partitioning(table => 'ods.t', " +
      "add_column => 'x')", "ambiguous directory rendering")
    spark.sql(s"CREATE TABLE $cat.ods.b (k BIGINT, c STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    refused(s"CALL $cat.system.evolve_partitioning(table => 'ods.b', " +
      "add_column => 'c')", "bucketed")
    // the evolved column cannot be renamed/widened while eras are live
    spark.sql(s"CREATE TABLE $cat.ods.e2 (k BIGINT, r STRING, d STRING) " +
      "PARTITIONED BY (d)")
    spark.sql(s"INSERT INTO $cat.ods.e2 VALUES (1, 'a', 'x')")
    spark.sql(s"CALL $cat.system.evolve_partitioning(table => 'ods.e2', " +
      "add_column => 'r')")
    refused(s"ALTER TABLE $cat.ods.e2 RENAME COLUMN r TO r2",
      "partition column")
    // an unrelated ALTER must NOT silently finalize the evolution
    // (r14 review: the meta rewrite used to merge evolved columns into
    // the anchor and drop the evolution marker — mixed-depth reads
    // would then hit Spark's inference conflict and the mixed-era
    // refusals would vanish)
    spark.sql(s"ALTER TABLE $cat.ods.e2 ADD COLUMN note STRING")
    spark.sql(s"INSERT INTO $cat.ods.e2 VALUES (2, 'b', 'x2', 'hello')")
    assert(spark.table(s"$cat.ods.e2").count() == 2,
      "mixed-era read broke after an unrelated ALTER")
    assert(spark.table(s"$cat.ods.e2").where(col("r") === "a").count() == 1)
    val e = intercept[Throwable] {
      spark.sql(s"SET spark.sql.sources.partitionOverwriteMode=dynamic")
      try Seq((3L, "c", "x", "z")).toDF("k", "r", "d", "note")
        .writeTo(s"$cat.ods.e2").overwritePartitions()
      finally spark.sql(
        s"SET spark.sql.sources.partitionOverwriteMode=static")
    }
    def msgs2(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs2(t.getCause)
    assert(msgs2(e).exists(_.contains("system.compact")),
      s"mixed-era refusal lost after ALTER: ${msgs2(e)}")
  }

  test("DROP PARTITION FIELD: metadata-only undo, partial drop across eras, refusal matrix") {
    val (cat, root) = freshCatalog()
    val fs = fsOf(root)
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.dp (k BIGINT, r STRING, s STRING, " +
      "v BIGINT, d STRING) PARTITIONED BY (d)")
    spark.sql(s"INSERT INTO $cat.ods.dp VALUES " +
      "(1, 'r1', 's1', 10, 'p0'), (2, 'r2', 's2', 20, 'p1')")

    // metadata-only UNDO: add then drop with no writes in between —
    // not one data file touched, and the spec is back to the anchor
    val before = dataFiles(fs, s"$root/ods/dp")
    spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.dp', add_column => 'r')").collect()
    val undone = spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.dp', drop_column => 'r')").head
    assert(undone.getString(0) == "d" && undone.getString(1) == "d")
    assert(dataFiles(fs, s"$root/ods/dp") == before,
      "the add/drop round-trip touched data files")

    // partial drop across ERAS: (d) -> (d,r) -> (d,r,s) -> drop s ->
    // new writes land under (d,r); all three eras read as one table
    spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.dp', add_column => 'r')").collect()
    spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.dp', add_column => 's')").collect()
    spark.sql(s"INSERT INTO $cat.ods.dp VALUES " +
      "(3, 'r1', 's1', 30, 'p0'), (4, 'r2', 's2', 40, 'p1')")
    val dropped = spark.sql(s"CALL $cat.system.evolve_partitioning(" +
      "table => 'ods.dp', drop_column => 's')").head
    assert(dropped.getString(0) == "d,r")
    spark.sql(s"INSERT INTO $cat.ods.dp VALUES " +
      "(5, 'r1', 's1', 50, 'p0'), (6, 'r2', 's2', 60, 'p1')")
    // the post-drop era REALLY lays out (d, r) only — no s= level
    val p0r1 = new Path(s"$root/ods/dp/d=p0/r=r1")
    assert(fs.exists(p0r1))
    assert(fs.listStatus(p0r1).exists(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")),
      "post-drop era did not land directly under (d, r)")
    // all eras read as one table; filters on the dropped column stay
    // EXACT (it is a data column in every era)
    val all = spark.table(s"$cat.ods.dp")
      .select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(all == Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L),
      (5L, 50L), (6L, 60L)))
    val s1 = spark.table(s"$cat.ods.dp").where(col("s") === "s1")
      .agg(sum(col("v"))).head.getLong(0)
    assert(s1 == 90L, s"filter on the dropped column inexact: $s1")

    // refusal matrix
    def refuses(callArgs: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.evolve_partitioning($callArgs)")
          .collect()
      }
      assert(e.getMessage.contains(needle),
        s"wrong refusal for ($callArgs): ${e.getMessage}")
    }
    // anchor columns can never drop
    refuses("table => 'ods.dp', drop_column => 'd'", "ANCHOR")
    // non-evolved columns
    refuses("table => 'ods.dp', drop_column => 'v'", "not an evolved")
    // exactly one of add/drop
    refuses("table => 'ods.dp'", "exactly one")
    refuses("table => 'ods.dp', add_column => 'v', drop_column => 'r'",
      "exactly one")
    // dropping the LAST evolved column while evolved-era files live
    // would revert to plain inference over mixed depths — refuse
    refuses("table => 'ods.dp', drop_column => 'r'", "compact")

    // compact migrates every era to the current spec and finalizes;
    // the finalized column is an anchor afterwards, so dropping it
    // refuses as such — the documented one-way door
    spark.sql(s"CALL $cat.system.compact(table => 'ods.dp')").collect()
    refuses("table => 'ods.dp', drop_column => 'r'", "ANCHOR")
    val after = spark.table(s"$cat.ods.dp")
      .agg(sum(col("v"))).head.getLong(0)
    assert(after == 210L)
  }

  test("hidden-partitioning transforms: days(ts) lays out + prunes ranges; truncate/bucket prune equality; refusals") {
    val (cat, root) = freshCatalog()
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.ods")
      spark.sql(s"CREATE TABLE $cat.ods.tr (k BIGINT, ts TIMESTAMP, " +
        "v BIGINT, d STRING) PARTITIONED BY (d)")
      // era 1 (plain): 6 distinct UTC days inside each date partition
      spark.sql(s"INSERT INTO $cat.ods.tr SELECT id, " +
        "CAST(date_add(date'2026-01-01', CAST(id % 6 AS INT)) AS TIMESTAMP), " +
        "id * 10, concat('d', id % 2 + 1) FROM range(0, 120, 1, 1)")
      val fs = fsOf(root)
      val before = dataFiles(fs, s"$root/ods/tr")

      // ADD PARTITION FIELD days(ts): metadata-only
      val res = spark.sql(s"CALL $cat.system.evolve_partitioning(" +
        "table => 'ods.tr', add_column => 'days(ts)')").head
      assert(res.getString(0) == "d,days(ts)" && res.getString(1) == "d")
      assert(dataFiles(fs, s"$root/ods/tr") == before,
        "transform evolution touched data files")

      // era 2: new files gain a derived ts_day=<utc day> level; ts
      // itself stays an ordinary data column in the files
      spark.sql(s"INSERT INTO $cat.ods.tr SELECT id, " +
        "CAST(date_add(date'2026-01-01', CAST(id % 6 AS INT)) AS TIMESTAMP), " +
        "id * 10, concat('d', id % 2 + 3) FROM range(120, 240, 1, 1)")
      // d3 holds the even ids (id%2+3==3), whose id%6 hits days 1/3/5
      val dayDirs = fs.listStatus(new Path(s"$root/ods/tr/d=d3"))
        .map(_.getPath.getName).filter(_.startsWith("ts_day=")).sorted
      assert(dayDirs.sameElements(Array("ts_day=2026-01-01",
        "ts_day=2026-01-03", "ts_day=2026-01-05")),
        s"days() layout missing: ${dayDirs.mkString(",")}")
      val newFile = dataFiles(fs, s"$root/ods/tr/d=d3").keys.head
      assert(spark.read.parquet(newFile).columns.contains("ts"),
        "transform source column missing from new files' data")

      // one table, both eras, full correctness
      val t = spark.table(s"$cat.ods.tr")
      assert(t.count() == 240)
      assert(t.agg(sum("v")).head.getLong(0) ==
        (0L until 240L).map(_ * 10).sum)

      // a ts RANGE filter prunes new-era files to the matching day
      // dirs by chain token; old-era files are kept and row-filter
      val day3 = col("ts") >= lit("2026-01-03").cast("timestamp") &&
        col("ts") < lit("2026-01-04").cast("timestamp")
      val oldEraFiles = before.size
      val newDay3Files = dataFiles(fs, s"$root/ods/tr").keys
        .count(_.contains("ts_day=2026-01-03"))
      assert(scannedFiles(t.where(day3)) == oldEraFiles + newDay3Files,
        "days() chain pruning missed")
      assert(t.where(day3).count() == 40) // ids with id % 6 == 2
      // equality on the source timestamp prunes the same way
      assert(scannedFiles(t.where(col("ts") ===
          lit("2026-01-05").cast("timestamp"))) ==
        oldEraFiles + dataFiles(fs, s"$root/ods/tr").keys
          .count(_.contains("ts_day=2026-01-05")))

      // DROP PARTITION FIELD days(ts) refuses while tokened files
      // live (reverting to the plain layout would hand the ts_day
      // dirs to Spark's partition inference) — same rule as identity
      val eDrop = intercept[Exception] {
        spark.sql(s"CALL $cat.system.evolve_partitioning(" +
          "table => 'ods.tr', drop_column => 'days(ts)')").collect()
      }
      assert(eDrop.getMessage.contains("system.compact"), eDrop.getMessage)
      // on an era-free table the drop is a metadata-only undo
      spark.sql(s"CREATE TABLE $cat.ods.und (k BIGINT, ts TIMESTAMP)")
      spark.sql(s"CALL $cat.system.evolve_partitioning(" +
        "table => 'ods.und', add_column => 'days(ts)')").collect()
      spark.sql(s"CALL $cat.system.evolve_partitioning(" +
        "table => 'ods.und', drop_column => 'days(ts)')").collect()
      spark.sql(s"INSERT INTO $cat.ods.und VALUES " +
        "(999, timestamp'2026-01-01 12:00:00')")
      assert(!fs.listStatus(new Path(s"$root/ods/und"))
        .exists(_.getPath.getName.startsWith("ts_day=")))

      // truncate(s,2): string-prefix field, equality pruning
      spark.sql(s"CREATE TABLE $cat.ods.tc (k BIGINT, s STRING, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.ods.tc SELECT id, " +
        "concat(CASE WHEN id % 2 = 0 THEN 'ab' ELSE 'cd' END, id), id " +
        "FROM range(0, 100, 1, 1)")
      spark.sql(s"CALL $cat.system.evolve_partitioning(" +
        "table => 'ods.tc', add_column => 'truncate(s, 2)')").collect()
      spark.sql(s"INSERT INTO $cat.ods.tc SELECT id, " +
        "concat(CASE WHEN id % 2 = 0 THEN 'ab' ELSE 'cd' END, id), id " +
        "FROM range(100, 200, 1, 1)")
      val tc = spark.table(s"$cat.ods.tc")
      val tcOld = dataFiles(fs, s"$root/ods/tc").keys
        .count(!_.contains("s_trunc="))
      val tcAb = dataFiles(fs, s"$root/ods/tc/s_trunc=ab").size
      assert(tcAb > 0)
      assert(scannedFiles(tc.where(col("s") === "ab142")) == tcOld + tcAb,
        "truncate() chain pruning missed")
      assert(tc.where(col("s") === "ab142").count() == 1)

      // bucket(4,k): hash field, equality pruning via the planning-
      // time bucket evaluation
      spark.sql(s"CREATE TABLE $cat.ods.bk (k BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.ods.bk SELECT id, id FROM " +
        "range(0, 50, 1, 1)")
      spark.sql(s"CALL $cat.system.evolve_partitioning(" +
        "table => 'ods.bk', add_column => 'bucket(4, k)')").collect()
      spark.sql(s"INSERT INTO $cat.ods.bk SELECT id, id FROM " +
        "range(50, 150, 1, 1)")
      val bk = spark.table(s"$cat.ods.bk")
      val bkOld = dataFiles(fs, s"$root/ods/bk").keys
        .count(!_.contains("k_bucket="))
      val bkBucket = graft.sources.GraftBucket.of(77L, 4)
      val bkMatch = dataFiles(fs,
        s"$root/ods/bk/k_bucket=$bkBucket").size
      assert(scannedFiles(bk.where(col("k") === 77L)) == bkOld + bkMatch,
        "bucket() chain pruning missed")
      assert(bk.where(col("k") === 77L).count() == 1)

      // refusal matrix
      val e1 = intercept[Exception] {
        spark.sql(s"CALL $cat.system.evolve_partitioning(" +
          "table => 'ods.tc', add_column => 'days(s)')").collect()
      }
      assert(e1.getMessage.contains("timestamp or date"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"CALL $cat.system.evolve_partitioning(" +
          "table => 'ods.tc', add_column => 'truncate(s, 2)')").collect()
      }
      assert(e2.getMessage.contains("already in the spec"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql(s"CALL $cat.system.evolve_partitioning(" +
          "table => 'ods.tc', add_column => 'days(nope)')").collect()
      }
      assert(e3.getMessage.contains("not in the schema"), e3.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("transform writes cluster by the DERIVED token: one file per (anchor, token) group under forced multi-task input (r15 item 1)") {
    // Clustering by identity(source) is FINER than the token: equal
    // timestamps co-locate but one day's many timestamps hash across
    // tasks, so at cluster parallelism every task writes a file into
    // ~every day dir — tasks × day-groups slivers. AQE's single-task
    // coalescing masks it at sandbox SF, so this test pins the plan
    // shape with AQE off, 8 shuffle partitions, and an 8-partition
    // input: the write's clustered distribution must put each whole
    // (d, ts_day) group on ONE task == exactly one file per token dir.
    val (cat, root) = freshCatalog()
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevShuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.ods")
      spark.sql(s"CREATE TABLE $cat.ods.tk (k BIGINT, ts TIMESTAMP, " +
        "s STRING, d STRING) PARTITIONED BY (d)")
      spark.sql(s"CALL $cat.system.evolve_partitioning(" +
        "table => 'ods.tk', add_column => 'days(ts)')").collect()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      spark.sql(s"INSERT INTO $cat.ods.tk SELECT id, " +
        "CAST(date_add(date'2026-01-01', CAST((id DIV 2) % 6 AS INT)) " +
        "AS TIMESTAMP), " +
        "concat('s', id), concat('d', id % 2 + 1) FROM range(0, 960, 1, 8)")
      val fs = fsOf(root)
      val byDir = dataFiles(fs, s"$root/ods/tk").keys.toSeq
        .groupBy(p => p.substring(0, p.lastIndexOf('/')))
      assert(byDir.size == 12, s"expected 2 d × 6 day dirs: ${byDir.keys}")
      val slivered = byDir.filter(_._2.size > 1)
      assert(slivered.isEmpty,
        s"transform write slivered ${slivered.size} token dirs (files " +
          s"per dir: ${byDir.view.mapValues(_.size).toMap}) — the " +
          "clustered distribution is not on the derived token")
      assert(spark.table(s"$cat.ods.tk").count() == 960)

      // truncate(s,2) clusters by the prefix token the same way
      spark.sql(s"CREATE TABLE $cat.ods.tk2 (k BIGINT, s STRING)")
      spark.sql(s"CALL $cat.system.evolve_partitioning(" +
        "table => 'ods.tk2', add_column => 'truncate(s, 2)')").collect()
      spark.sql(s"INSERT INTO $cat.ods.tk2 SELECT id, " +
        "concat(CASE WHEN id % 3 = 0 THEN 'aa' WHEN id % 3 = 1 THEN 'bb' " +
        "ELSE 'cc' END, id) FROM range(0, 300, 1, 8)")
      val byDir2 = dataFiles(fs, s"$root/ods/tk2").keys.toSeq
        .groupBy(p => p.substring(0, p.lastIndexOf('/')))
      assert(byDir2.size == 3, s"expected 3 prefix dirs: ${byDir2.keys}")
      val slivered2 = byDir2.filter(_._2.size > 1)
      assert(slivered2.isEmpty,
        s"truncate write slivered: ${byDir2.view.mapValues(_.size).toMap}")
      assert(spark.table(s"$cat.ods.tk2").count() == 300)
    } finally {
      spark.conf.set("spark.sql.session.timeZone", prevTz)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevShuf)
    }
  }
}
