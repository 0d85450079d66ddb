package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EQUALITY deletes for streaming upserts ([[GraftEqDel]], r12 item 6
  * — Iceberg v2 equality deletes): `upsertMode=equality` epochs write
  * the epoch's rows plus a key sidecar and NEVER scan the target;
  * reads apply the deletes by key with epoch-floor ordering;
  * `rewrite_deletes` materializes them. The proofs below: epoch cost
  * bounded by the epoch (commits succeed with every pre-existing data
  * file corrupted), kill/restart convergence, read parity with the
  * MERGE-mode path, and the single-writer refusals.
  */
class GraftEqDelSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"geq${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-eq-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def sidecars(root: String, rel: String): Int = {
    val fs = fsOf(root)
    GraftEqDel.list(fs, new Path(s"$root/$rel")).length
  }

  private def withShuffle4[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("equality epochs never touch the target: commits succeed over corrupted pre-existing files") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.state (k BIGINT, total BIGINT)")
    spark.sql(s"INSERT INTO $cat.mart.state VALUES (1, 100), (2, 200)")
    // corrupt EVERY pre-existing data file (same length + mtime): any
    // job that opened one would crash — the MERGE-mode epoch would,
    // since it positional-scans the target
    val fs = fsOf(root)
    val dirP = new Path(s"$root/mart/state")
    fs.listStatus(dirP).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")).foreach { st =>
      val (len, mtime) = (st.getLen, st.getModificationTime)
      val out = fs.create(st.getPath, true)
      try out.write(Array.fill(len.toInt)('x'.toByte)) finally out.close()
      fs.setTimes(st.getPath, mtime, -1)
    }
    // sentinel: the positional MetaScan would overwrite this
    GraftMorRuntimeScope.lastPlannedRels.set(Seq("__sentinel__"))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    withShuffle4 {
      val q = mem.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", "equality")
        .option("checkpointLocation", tmpDir("geq-cp-cor"))
        .toTable(s"$cat.mart.state")
      try {
        mem.addData((1L, 11L), (3L, 33L))
        q.processAllAvailable()
        mem.addData((2L, 22L))
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(sidecars(root, "mart/state") >= 2,
      "equality epochs did not write their sidecars")
    assert(GraftMorRuntimeScope.lastPlannedRels.get() == Seq("__sentinel__"),
      "an epoch planned a positional scan of the target")
  }

  test("read parity with the MERGE-mode upsert; columnar scans; originals untouched; materialization") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.eq (k BIGINT, total BIGINT, cnt BIGINT)")
    spark.sql(s"CREATE TABLE $cat.mart.mg (k BIGINT, total BIGINT, cnt BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def run(table: String, mode: String): Unit = withShuffle4 {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", mode)
        .option("checkpointLocation", tmpDir(s"geq-cp-$table"))
        .toTable(s"$cat.mart.$table")
      try {
        mem.addData((1L, 10L), (2L, 20L), (3L, 30L))
        q.processAllAvailable()
        mem.addData((2L, 5L), (4L, 40L))
        q.processAllAvailable()
        mem.addData((1L, 1L), (4L, 4L))
        q.processAllAvailable()
      } finally q.stop()
    }
    run("eq", "equality")
    run("mg", "merge")

    def state(t: String) = spark.table(s"$cat.mart.$t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val eq = state("eq")
    assert(eq == state("mg"),
      s"equality-mode state diverged from the MERGE path:\n$eq\n${state("mg")}")
    assert(eq == Seq((1L, 11L, 2L), (2L, 25L, 2L), (3L, 30L, 1L),
      (4L, 44L, 2L)))

    // the equality table applied the deletes AT READ: sidecars live,
    // every epoch's files still on disk (no rewrite happened). The
    // floor-aware compaction (r13 item 5) already dropped epoch 0's
    // DEAD sidecar (nothing is older than epoch 0 on a stream-born
    // table), leaving epochs 1 and 2
    assert(sidecars(root, "mart/eq") == 2)
    // aggregates decline the metadata tiers and stay right
    assert(spark.table(s"$cat.mart.eq").count() == 4)
    // the applying scan stays COLUMNAR (r12 item 1 discipline)
    val df = spark.table(s"$cat.mart.eq")
    df.collect()
    val modes = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.supportsColumnar
    }
    assert(modes.nonEmpty && modes.forall(identity),
      "equality-delete scan de-vectorized")
    // column pruning safe: a projection WITHOUT the key column still
    // applies the deletes (keys are force-included then stripped)
    assert(spark.table(s"$cat.mart.eq").select("total").as[Long]
      .collect().sorted.toSeq == Seq(11L, 25L, 30L, 44L))

    // materialization: one call, sidecars consumed, parity preserved
    val res = spark.sql(
      s"CALL $cat.system.rewrite_deletes(table => 'mart.eq')").head
    assert(res.getInt(0) > 0, "materialization rewrote nothing")
    assert(sidecars(root, "mart/eq") == 0, "sidecars survived materialization")
    assert(state("eq") == eq, "materialization changed the state")
    // a later epoch works against the materialized table
    withShuffle4 {
      val mem2 = MemoryStream[(Long, Long)]
      val q2 = mem2.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", "equality")
        .option("checkpointLocation", tmpDir("geq-cp-post"))
        .toTable(s"$cat.mart.eq")
      try { mem2.addData((3L, 3L)); q2.processAllAvailable() }
      finally q2.stop()
    }
    assert(spark.table(s"$cat.mart.eq").where(col("k") === 3)
      .head.getLong(1) == 3L,
      "post-materialization epoch did not supersede the rewritten row")
  }

  test("kill/restart converges exactly-once (checkpoint + marker protocol)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.state (k BIGINT, total BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cp = tmpDir("geq-cp-kill")
    val mem = MemoryStream[(Long, Long)]
    def start() = mem.toDF().toDF("k", "v").groupBy("k")
      .agg(sum("v").as("total"))
      .writeStream.outputMode("update")
      .option("upsertKeys", "k")
      .option("upsertMode", "equality")
      .option("checkpointLocation", cp)
      .toTable(s"$cat.mart.state")
    withShuffle4 {
      val q1 = start()
      mem.addData((1L, 10L), (2L, 20L))
      q1.processAllAvailable()
      q1.stop() // kill between epochs
      val q2 = start()
      mem.addData((1L, 1L), (3L, 30L))
      q2.processAllAvailable()
      q2.stop()
    }
    val got = spark.table(s"$cat.mart.state").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 11L), (2L, 20L), (3L, 30L)), s"got $got")
  }

  test("single-writer contract: other writers refuse loudly while sidecars are live") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.state (k BIGINT, total BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withShuffle4 {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", "equality")
        .option("checkpointLocation", tmpDir("geq-cp-ref"))
        .toTable(s"$cat.mart.state")
      try { mem.addData((1L, 10L), (2L, 20L)); q.processAllAvailable() }
      finally q.stop()
    }
    assert(sidecars(root, "mart/state") == 1)
    def refused(body: => Unit): Unit = {
      val e = intercept[Throwable](body)
      def mentions(t: Throwable): Boolean = {
        var c: Throwable = t
        while (c != null) {
          if (c.getMessage != null &&
            c.getMessage.contains("rewrite_deletes")) return true
          c = c.getCause
        }
        false
      }
      assert(mentions(e), s"refusal does not name the fix: $e")
    }
    refused(spark.sql(s"INSERT INTO $cat.mart.state VALUES (9, 9)"))
    refused(spark.sql(s"DELETE FROM $cat.mart.state WHERE k = 1"))
    refused(spark.sql(s"UPDATE $cat.mart.state SET total = 0 WHERE k = 1"))
    // the table is intact and still right after every refusal
    assert(spark.table(s"$cat.mart.state").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    // TRUNCATE is the sanctioned full-replace: it consumes the sidecars
    spark.sql(s"TRUNCATE TABLE $cat.mart.state")
    assert(sidecars(root, "mart/state") == 0)
    assert(spark.table(s"$cat.mart.state").count() == 0)
    spark.sql(s"INSERT INTO $cat.mart.state VALUES (9, 9)") // admitted again
    assert(spark.table(s"$cat.mart.state").count() == 1)
  }

  test("eqdel.rewrite_threshold auto-materializes: a long stream NEVER hits the read refusal, across kill/restart (r13 item 1)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.st (k BIGINT, total BIGINT)")
    spark.sql(s"ALTER TABLE $cat.mart.st SET TBLPROPERTIES (" +
      "'eqdel.rewrite_threshold' = '0.5')")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // tiny cap so the policy is exercised: trigger at 0.5 * 8 = 4 live
    // keys; WITHOUT the policy five 2-key epochs (10 keys) would push
    // reads past the cap and into the loud refusal
    spark.conf.set(GraftEqDel.MaxKeysConf, "8")
    try withShuffle4 {
      val cp = tmpDir("geq-cp-policy")
      val mem = MemoryStream[(Long, Long)]
      def start() = mem.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", "equality")
        .option("checkpointLocation", cp)
        .toTable(s"$cat.mart.st")
      val dirP = new Path(s"$root/mart/st")
      val fs = fsOf(root)
      var q = start()
      val epochs = Seq(
        Seq((1L, 1L), (2L, 2L)), Seq((3L, 3L), (4L, 4L)),
        Seq((5L, 5L), (6L, 6L)))
      epochs.foreach { batch =>
        mem.addData(batch: _*)
        q.processAllAvailable()
        // the policy keeps live keys strictly below the threshold's
        // carryover: never at/above the cap, reads never refuse
        assert(GraftEqDel.countKeys(fs, dirP) < 4,
          s"policy failed to materialize: ${GraftEqDel.countKeys(fs, dirP)}")
        assert(spark.table(s"$cat.mart.st").count() > 0) // read OK
      }
      // materialization really ran: replacement files carry the floor
      // stamp, and sidecars were consumed at least once
      def floorStamped(p: Path): Int =
        fs.listStatus(p).toSeq.map(_.getPath).count(_.getName.contains("-ef"))
      assert(floorStamped(dirP) > 0, "no floor-stamped rewrites on disk")
      // kill/restart: the threshold stays respected (the policy is
      // state-driven, not checkpoint-driven)
      q.stop()
      q = start()
      Seq(Seq((7L, 7L), (8L, 8L)), Seq((9L, 9L), (10L, 10L))).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        assert(GraftEqDel.countKeys(fs, dirP) < 4,
          "threshold not respected across restart")
      }
      q.stop()
      // 10 distinct keys streamed; with no policy the key map would
      // hold 10 > cap 8 and this read would REFUSE — it must be exact
      val got = spark.table(s"$cat.mart.st").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == (1L to 10L).map(k => (k, k)), s"got $got")
    } finally spark.conf.unset(GraftEqDel.MaxKeysConf)
  }

  test("floor-aware sidecar compaction: dead sidecars GC'd, subsumed keys deduped, parity across kill/restart (r13 item 5)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.st (k BIGINT, total BIGINT)")
    spark.sql(s"CREATE TABLE $cat.mart.tw (k BIGINT, total BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fs = fsOf(root)
    val dirP = new Path(s"$root/mart/st")

    // eq-mode with heavy key overlap across epochs vs a MERGE twin.
    // The eq stream keeps ONE MemoryStream across stop/restart (the
    // checkpoint resumes its offsets); the twin replays from scratch.
    val memEq = MemoryStream[(Long, Long)]
    val cpEq = tmpDir("geq-cp-cmp")
    def runEq(batches: Seq[Seq[(Long, Long)]]): Unit = withShuffle4 {
      val q = memEq.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", "equality")
        .option("checkpointLocation", cpEq)
        .toTable(s"$cat.mart.st")
      try batches.foreach { b =>
        memEq.addData(b: _*); q.processAllAvailable()
      } finally q.stop()
    }
    def runTwin(batches: Seq[Seq[(Long, Long)]]): Unit = withShuffle4 {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", "merge")
        .option("checkpointLocation", tmpDir("geq-cp-cmptw"))
        .toTable(s"$cat.mart.tw")
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    // epoch 0 {1,2,3}; epoch 1 {2,3,4}; epoch 2 {3,4,5}
    val round1 = Seq(
      Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      Seq((2L, 20L), (3L, 30L), (4L, 4L)),
      Seq((3L, 300L), (4L, 40L), (5L, 5L)))
    runEq(round1)
    runTwin(round1)

    // epoch 0's sidecar is DEAD (no pre-stream files) — GC'd; epoch
    // 1's keys {2,3,4} lose 3 and 4 to epoch 2 — deduped to {2}
    val left = GraftEqDel.list(fs, dirP).map(GraftEqDel.read(fs, _))
    assert(left.map(_.epoch).sorted == Seq(1L, 2L),
      s"expected epochs 1,2 to survive, got ${left.map(_.epoch)}")
    assert(left.find(_.epoch == 1L).get.keys.map(_.head) == Seq(Some(2L)),
      "epoch 1 keys not deduped to the unsubsumed {2}")
    assert(left.find(_.epoch == 2L).get.keys.length == 3,
      "the newest sidecar must stay verbatim")
    assert(GraftEqDel.countKeys(fs, dirP) == 4, "map not shrunk to 4 keys")

    // read PARITY with the uncompacted semantics (the MERGE twin)
    def state(t: String) = spark.table(s"$cat.mart.$t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(state("st") == state("tw"),
      s"compaction broke parity:\n${state("st")}\n${state("tw")}")

    // kill/restart: the SAME stream resumes from its checkpoint and
    // keeps upserting; compaction keeps converging, parity holds
    val round2 = Seq(Seq((1L, 100L), (5L, 50L)), Seq((2L, 200L), (6L, 6L)))
    runEq(round2)
    spark.sql(s"TRUNCATE TABLE $cat.mart.tw")
    runTwin(round1 ++ round2)
    assert(state("st") == state("tw"),
      s"post-restart parity broke:\n${state("st")}\n${state("tw")}")
    // old epochs fully subsumed by the restart's epochs are gone
    val epochs = GraftEqDel.list(fs, dirP).map(GraftEqDel.read(fs, _))
      .map(_.epoch).sorted
    assert(epochs.last == 4L, s"restart epochs missing: $epochs")
    assert(GraftEqDel.countKeys(fs, dirP) <=
      Seq(1L, 2L, 3L, 4L, 5L, 6L).length,
      "compacted map larger than the live key domain")

    // materialization still converges over compacted sidecars
    spark.sql(s"CALL $cat.system.rewrite_deletes(table => 'mart.st')")
    assert(sidecars(root, "mart/st") == 0)
    assert(state("st") == state("tw"))
  }

  test("rewrite lookup key and file_path normalization agree on authority-carrying URIs (ADVICE r13 high)") {
    // materialize() joins a driver-built lookup against the reader's
    // _metadata.file_path: both sides must normalize one URI to ONE
    // key. The old Path.toUri.getPath key dropped the authority that
    // file_path keeps, so on HDFS/S3A the join matched zero rows and
    // every applicable file was retired with NO replacement.
    val uris = Seq(
      "hdfs://nn:8020/w/t/part-s0011aabb-e000000000001-x.parquet",
      "s3a://bucket/w/t/part-0.parquet",
      "file:/tmp/w/t/part-0.parquet",
      "file:///tmp/w/t/part-0.parquet",
      "/tmp/w/t/part-0.parquet")
    // scala-side and column-side renderings are identical for each URI
    val scalaSide = uris.map(GraftEqDel.normUri)
    val colSide = uris.toDF("u")
      .select(GraftEqDel.normUriCol(col("u"))).as[String].collect().toSeq
    assert(scalaSide == colSide,
      s"driver/data normalization diverged: $scalaSide vs $colSide")
    // the authority survives in the shared rendering...
    assert(GraftEqDel.normUri("hdfs://nn:8020/a/b") == "/nn:8020/a/b")
    // ...which is exactly where the old getPath key diverged
    assert(new Path("hdfs://nn:8020/a/b").toUri.getPath == "/a/b")
    assert(GraftEqDel.normUri("hdfs://nn:8020/a/b") !=
      new Path("hdfs://nn:8020/a/b").toUri.getPath,
      "regression guard lost its teeth: getPath no longer differs")
  }

  test("bounded materialize rewrites files an earlier bounded run floor-stamped (ADVICE r15 high: no lost deletes)") {
    // Two SUCCESSIVE bounded materializations (the changes.min_retained
    // _epochs retention-floor path). The first stamps the epoch-0 file
    // at floor 1; the second consumes the epoch-2 sidecar, whose keys
    // still retract rows INSIDE that stamped file. Excluding stamped
    // files from the second rewrite drops the sidecar without applying
    // it — the retracted row silently resurrects.
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.bd (k BIGINT, total BIGINT, cnt BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withShuffle4 {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", "equality")
        .option("checkpointLocation", tmpDir("geq-cp-bd"))
        .toTable(s"$cat.mart.bd")
      try {
        mem.addData((1L, 10L), (2L, 20L), (3L, 30L)) // epoch 0
        q.processAllAvailable()
        mem.addData((2L, 5L)) // epoch 1: retracts k=2's epoch-0 row
        q.processAllAvailable()
        mem.addData((1L, 1L)) // epoch 2: retracts k=1's epoch-0 row
        q.processAllAvailable()
        mem.addData((3L, 3L)) // epoch 3: stays live past both bounds
        q.processAllAvailable()
      } finally q.stop()
    }
    def state() = spark.table(s"$cat.mart.bd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val before = state()
    assert(before == Seq((1L, 11L, 2L), (2L, 25L, 2L), (3L, 33L, 2L)))

    val dirP = new Path(s"$root/mart/bd")
    // bounded run 1: consumes the epoch-1 sidecar, floor-stamps the
    // epoch-0 and epoch-1 files at 1
    val (rw1, dr1) = GraftEqDel.materialize(spark, dirP, Some(1L))
    assert(rw1 > 0 && dr1 == 1, s"first bounded run: ($rw1, $dr1)")
    assert(state() == before, "first bounded run changed the state")
    // bounded run 2: the epoch-2 sidecar retracts k=1 from the file
    // run 1 stamped; that file MUST rewrite again (old code skipped
    // every stamped file, losing the delete)
    val (rw2, dr2) = GraftEqDel.materialize(spark, dirP, Some(2L))
    assert(rw2 > 0 && dr2 == 1, s"second bounded run: ($rw2, $dr2)")
    assert(state() == before,
      "second bounded run resurrected a retracted row (lost delete)")
    // epoch 3's sidecar stayed live and still applies at read
    assert(sidecars(root, "mart/bd") == 1)
    // full materialization converges from here
    GraftEqDel.materialize(spark, dirP)
    assert(sidecars(root, "mart/bd") == 0)
    assert(state() == before, "full materialization changed the state")
  }
}
