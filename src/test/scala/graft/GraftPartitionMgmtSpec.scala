package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row

/** SupportsPartitionManagement on catalog tables: `SHOW PARTITIONS`,
  * `ALTER TABLE ... ADD/DROP PARTITION` — the hive directory layout IS
  * the partition metadata, so management is directory bookkeeping.
  */
class GraftPartitionMgmtSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gpm${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-pm-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  test("SHOW PARTITIONS lists hive directories; ADD/DROP PARTITION manage them") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.ev (id BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.ods.ev VALUES (1, 'd1'), (2, 'd2')")
    val shown = spark.sql(s"SHOW PARTITIONS $cat.ods.ev")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(shown == Seq("day=d1", "day=d2"), s"got $shown")

    // ADD: an empty partition appears in the listing and on disk
    spark.sql(s"ALTER TABLE $cat.ods.ev ADD PARTITION (day='d3')")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$root/ods/ev/day=d3")))
    assert(spark.sql(s"SHOW PARTITIONS $cat.ods.ev").count() == 3)
    // adding an existing partition is refused
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.ods.ev ADD PARTITION (day='d1')"))

    // DROP removes the directory (and its data)
    spark.sql(s"ALTER TABLE $cat.ods.ev DROP PARTITION (day='d1')")
    assert(!fs.exists(new Path(s"$root/ods/ev/day=d1")))
    assert(spark.table(s"$cat.ods.ev").collect().map(_.getLong(0)).toSeq
      == Seq(2L))
    val after = spark.sql(s"SHOW PARTITIONS $cat.ods.ev")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(after == Seq("day=d2", "day=d3"), s"got $after")
  }

  test("SHOW PARTITIONS on bucketed layouts: bucket level is NOT a partition (r10 item 6)") {
    // Contract: buckets are a FILE-layout property (the `-b<id>` tag),
    // not a partition level — SHOW PARTITIONS reports only identity
    // (hive-directory) partitions, so a q197-style table never leaks
    // `bucket=` rows, and a bucket-only table reports the empty set
    // (it has no hive directories to manage).
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dds")
    spark.sql(s"CREATE TABLE $cat.dds.pb (k BIGINT, v BIGINT, day STRING) " +
      "PARTITIONED BY (day, bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.dds.pb " +
      "SELECT id, id, concat('d', id % 2) FROM range(0, 40)")
    val shown = spark.sql(s"SHOW PARTITIONS $cat.dds.pb")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(shown == Seq("day=d0", "day=d1"),
      s"bucket level leaked into SHOW PARTITIONS: $shown")
    // partial spec on the identity column still filters
    val one = spark.sql(s"SHOW PARTITIONS $cat.dds.pb PARTITION (day='d1')")
      .collect().map(_.getString(0)).toSeq
    assert(one == Seq("day=d1"), s"got $one")
    // bucket-only table: no identity partitions -> the table counts as
    // NOT PARTITIONED for partition management (Spark refuses with
    // PARTITION_SCHEMA_IS_EMPTY), and the bucket column is not
    // addressable as a partition spec
    spark.sql(s"CREATE TABLE $cat.dds.bo (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.dds.bo SELECT id, id FROM range(0, 10)")
    val notPart = intercept[Exception](
      spark.sql(s"SHOW PARTITIONS $cat.dds.bo").collect())
    assert(notPart.getMessage.contains("not partitioned"),
      s"got: ${notPart.getMessage}")
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.dds.bo ADD PARTITION (k=1)"))
  }

  test("two-level layout: partial-spec SHOW PARTITIONS filters; typed values round-trip") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.raw")
    spark.sql(s"CREATE TABLE $cat.raw.land (id BIGINT, year INT, month INT) " +
      "PARTITIONED BY (year, month)")
    spark.sql(s"INSERT INTO $cat.raw.land VALUES " +
      "(1, 2020, 1), (2, 2020, 2), (3, 2021, 1)")
    val all = spark.sql(s"SHOW PARTITIONS $cat.raw.land")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(all == Seq("year=2020/month=1", "year=2020/month=2",
      "year=2021/month=1"), s"got $all")
    val y2020 = spark.sql(s"SHOW PARTITIONS $cat.raw.land PARTITION (year=2020)")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(y2020 == Seq("year=2020/month=1", "year=2020/month=2"), s"got $y2020")
    spark.sql(s"ALTER TABLE $cat.raw.land DROP PARTITION (year=2020, month=2)")
    assert(spark.table(s"$cat.raw.land").orderBy("id").collect().toSeq ==
      Seq(Row(1L, 2020, 1), Row(3L, 2021, 1)))
  }
}
