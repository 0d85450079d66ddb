package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Policy-driven sidecar maintenance ([[GraftMaintenance]], r13 item 1):
  * table-property thresholds turn the manual rewrite/expiry procedures
  * into commit-time policy, and `CALL system.table_state` reports the
  * numbers each policy acts on. The eq-del threshold's long-stream case
  * lives in GraftEqDelSpec; the tombstone-expiry case in
  * GraftRetiredSpec.
  */
class GraftMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gmt${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-mt-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("dv.rewrite_threshold: merge-on-read deletes auto-materialize at the file-count trigger") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete_mode' = 'merge-on-read', " +
      "'dv.rewrite_threshold' = '2')")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, id FROM range(0, 10)")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, id FROM range(10, 20)")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, id FROM range(20, 30)")
    val fs = fsOf(root)
    val dirP = new Path(s"$root/ods/t")

    // first MOR delete: one file carries a vector — below the trigger
    spark.sql(s"DELETE FROM $cat.ods.t WHERE k = 3")
    assert(GraftDv.list(fs, dirP).size == 1,
      "expected one live vector below the threshold")
    // second file gains a vector: threshold 2 reached, the commit runs
    // rewrite_deletes itself — no vectors survive, no manual CALL
    spark.sql(s"DELETE FROM $cat.ods.t WHERE k = 13")
    assert(GraftDv.list(fs, dirP).isEmpty,
      "dv.rewrite_threshold did not materialize at the trigger")
    val got = spark.table(s"$cat.ods.t").select("k").as[Long]
      .collect().sorted.toSeq
    assert(got == (0L until 30L).filterNot(k => k == 3 || k == 13),
      s"materialized state wrong: $got")
    // the policy acted exactly like the manual procedure: the next
    // delete starts a fresh vector generation
    spark.sql(s"DELETE FROM $cat.ods.t WHERE k = 23")
    assert(GraftDv.list(fs, dirP).size == 1)
    assert(spark.table(s"$cat.ods.t").count() == 27)
  }

  test("CALL system.table_state reports the numbers the policies act on (pinned counts)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.mt (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete_mode' = 'merge-on-read')")
    // single-slice ranges pin one file per insert (the counts below
    // are exact, not shapes)
    spark.sql(s"INSERT INTO $cat.ods.mt SELECT id, id FROM range(0, 10, 1, 1)")
    spark.sql(
      s"INSERT INTO $cat.ods.mt SELECT id, id FROM range(10, 20, 1, 1)")

    def state(): (Int, Long, Int, Long, Int, Long, Long, Int, Int, Long) = {
      val r = spark.sql(
        s"CALL $cat.system.table_state(table => 'ods.mt')").head
      (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4),
        r.getLong(5), r.getLong(6), r.getInt(7), r.getInt(8), r.getLong(9))
    }
    spark.conf.set(GraftEqDel.MaxKeysConf, "123")
    try {
      // clean table: two live files, nothing else
      val s0 = state()
      assert(s0._1 == 2 && s0._2 > 0L, s"live files/bytes wrong: $s0")
      assert(s0._3 == 0 && s0._4 == 0L && s0._5 == 0 && s0._6 == 0L &&
        s0._8 == 0 && s0._9 == 0 && s0._10 == 0L, s"dirty zero-state: $s0")
      assert(s0._7 == 123L, "eqdel_key_cap must reflect the session conf")

      // two positions in ONE file gain vectors
      spark.sql(s"DELETE FROM $cat.ods.mt WHERE k IN (1, 2)")
      val s1 = state()
      assert(s1._3 == 1 && s1._4 == 2L, s"dv files/positions wrong: $s1")

      // materialization moves the cost: vectors gone, the rewritten
      // file's ORIGINAL is tombstoned as one retiring commit
      spark.sql(s"CALL $cat.system.rewrite_deletes(table => 'ods.mt')")
      val s2 = state()
      assert(s2._3 == 0 && s2._4 == 0L, s"vectors survived rewrite: $s2")
      assert(s2._1 == 2, s"live file count changed shape: $s2")
      assert(s2._8 == 1 && s2._9 == 1 && s2._10 > 0L,
        s"retired commit/file/bytes wrong: $s2")

      // live equality-delete sidecars are counted from headers
      GraftEqDel.write(fsOf(root), new Path(s"$root/ods/mt"),
        GraftEqDel.EqDel("aabbccdd", 0L, Seq("k"), Seq('l'),
          Seq(Seq(Some(1L)), Seq(Some(2L)), Seq(Some(3L)))))
      val s3 = state()
      assert(s3._5 == 1 && s3._6 == 3L, s"eqdel sidecars/keys wrong: $s3")
    } finally spark.conf.unset(GraftEqDel.MaxKeysConf)
  }

  test("policy properties validate loudly at SET time") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (k BIGINT)")
    def refused(sql: String, needle: String): Unit = {
      val e = intercept[Throwable](spark.sql(sql))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(needle)),
        s"expected '$needle' in: ${msgs(e).mkString(" | ")}")
    }
    refused(s"ALTER TABLE $cat.ods.t SET TBLPROPERTIES " +
      "('eqdel.rewrite_threshold' = '1.5')", "fraction in (0,1]")
    refused(s"ALTER TABLE $cat.ods.t SET TBLPROPERTIES " +
      "('eqdel.rewrite_threshold' = '0')", "fraction in (0,1]")
    refused(s"ALTER TABLE $cat.ods.t SET TBLPROPERTIES " +
      "('eqdel.rewrite_threshold' = 'abc')", "fraction in (0,1]")
    refused(s"ALTER TABLE $cat.ods.t SET TBLPROPERTIES " +
      "('dv.rewrite_threshold' = '0')", ">= 1")
    refused(s"ALTER TABLE $cat.ods.t SET TBLPROPERTIES " +
      "('retired.expire_ms' = '-1')", ">= 0")
    // valid values round-trip and UNSET works
    spark.sql(s"ALTER TABLE $cat.ods.t SET TBLPROPERTIES (" +
      "'eqdel.rewrite_threshold' = '0.8', 'dv.rewrite_threshold' = '64', " +
      "'retired.expire_ms' = '86400000')")
    spark.sql(s"ALTER TABLE $cat.ods.t UNSET TBLPROPERTIES (" +
      "'dv.rewrite_threshold')")
    refused(s"ALTER TABLE $cat.ods.t SET TBLPROPERTIES " +
      "('changes.min_retained_epochs' = '0')", ">= 1")
  }

  test("changes.min_retained_epochs: the armed threshold keeps the newest N epochs servable; past-floor bounds still refuse") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.mart.fl (k BIGINT, total BIGINT, " +
      "cnt BIGINT) TBLPROPERTIES ('eqdel.rewrite_threshold' = '0.01', " +
      "'changes.min_retained_epochs' = '2')")
    val prevCap = spark.conf.getOption(GraftEqDel.MaxKeysConf)
    spark.conf.set(GraftEqDel.MaxKeysConf, "100") // trigger = 1 key
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDF().toDF("k", "v").groupBy("k")
        .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
        .writeStream.outputMode("update")
        .option("upsertKeys", "k")
        .option("upsertMode", "equality")
        .option("checkpointLocation", tmpDir("gmt-cp-floor"))
        .toTable(s"$cat.mart.fl")
      try {
        mem.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
        mem.addData((1L, 1L)); q.processAllAvailable()
        mem.addData((2L, 2L)); q.processAllAvailable()
      } finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevCap match {
        case Some(v) => spark.conf.set(GraftEqDel.MaxKeysConf, v)
        case None => spark.conf.unset(GraftEqDel.MaxKeysConf)
      }
    }
    // the armed threshold fired at epoch 2's commit but the floor
    // bounded it to epochs OLDER than the newest 2: epoch 0 was
    // materialized, epochs 1 and 2 stay servable — the durable
    // consumer guarantee
    val fs = fsOf(root)
    val dirP = new Path(s"$root/mart/fl")
    assert(GraftEqDel.list(fs, dirP).nonEmpty,
      "floor-bounded materialization consumed the retained sidecars")
    val epochs = spark.table(s"$cat.mart.fl.changes")
      .select(col("_change_epoch")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(epochs == Seq(1L, 2L),
      s"retained feed epochs wrong (want newest 2): $epochs")
    // bounds reaching past the floor refuse loudly, as ever
    val e = intercept[Exception] {
      spark.table(s"$cat.mart.fl.changes")
        .where(col("_change_epoch") <= 0).collect()
    }
    assert(e.getMessage.contains("materialized by"), e.getMessage)
    // and the live table state is exact
    val live = spark.table(s"$cat.mart.fl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(live == Seq((1L, 11L), (2L, 22L)), s"live state: $live")
  }
}
