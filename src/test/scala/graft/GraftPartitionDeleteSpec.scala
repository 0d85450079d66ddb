package graft

import org.apache.hadoop.fs.Path

/** DELETE on partitioned catalog tables ([[graft.sources.GraftCatalog]]
  * SupportsDeleteV2 + partitioned copy-on-write): partition-predicate
  * deletes drop directories (single- and multi-level layouts, partial
  * specs included) without touching any other partition's files;
  * non-partition predicates take the partitioned copy-on-write path
  * whose rewrite is runtime-group-filtered to the touched partitions;
  * TRUNCATE rides the metadata surface.
  */
class GraftPartitionDeleteSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gdel${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-del-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def dataFiles(root: String, sub: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$root/$sub")
    if (!fs.exists(p)) Nil
    else {
      def walk(q: Path): Seq[String] = fs.listStatus(q).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.toString + "@" + st.getModificationTime)
      }
      walk(p)
    }
  }

  private def mkPartitioned(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.ev (id BIGINT, v BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.ods.ev VALUES " +
      "(1, 10, 'd1'), (2, 20, 'd1'), (3, 30, 'd2'), (4, 40, 'd2'), " +
      "(5, 50, 'd3'), (6, 60, 'd3')")
  }

  test("partition-predicate DELETE drops the directory, other partitions untouched") {
    val (cat, root) = freshCatalog()
    mkPartitioned(cat)
    val before = dataFiles(root, "ods/ev/day=d2")
    assert(before.nonEmpty)
    spark.sql(s"DELETE FROM $cat.ods.ev WHERE day = 'd1'")
    val got = spark.table(s"$cat.ods.ev").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 4L, 5L, 6L))
    // metadata-only: surviving partitions' files are byte-identical
    // (same paths, same mtimes — nothing was rewritten)
    assert(dataFiles(root, "ods/ev/day=d2") == before)
    assert(dataFiles(root, "ods/ev/day=d1").isEmpty)
  }

  test("IN-list DELETE drops several partitions; re-run is a no-op") {
    val (cat, _) = freshCatalog()
    mkPartitioned(cat)
    spark.sql(s"DELETE FROM $cat.ods.ev WHERE day IN ('d1', 'd3')")
    assert(spark.table(s"$cat.ods.ev").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(3L, 4L))
    spark.sql(s"DELETE FROM $cat.ods.ev WHERE day IN ('d1', 'd3')") // idempotent
    assert(spark.table(s"$cat.ods.ev").count() == 2)
  }

  test("non-partition predicate DELETE rewrites only the touched partition (copy-on-write)") {
    val (cat, root) = freshCatalog()
    mkPartitioned(cat)
    val beforeD2 = dataFiles(root, "ods/ev/day=d2")
    val beforeD3 = dataFiles(root, "ods/ev/day=d3")
    // v = 20 lives in day=d1 only; the runtime group filter narrows the
    // rewrite to that partition
    spark.sql(s"DELETE FROM $cat.ods.ev WHERE v = 20")
    val got = spark.table(s"$cat.ods.ev").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L, 4L, 5L, 6L), s"got $got")
    assert(dataFiles(root, "ods/ev/day=d2") == beforeD2,
      "day=d2 was rewritten by a delete that never touched it")
    assert(dataFiles(root, "ods/ev/day=d3") == beforeD3,
      "day=d3 was rewritten by a delete that never touched it")
  }

  test("copy-on-write DELETE that empties a partition removes its directory") {
    val (cat, root) = freshCatalog()
    mkPartitioned(cat)
    val beforeD1 = dataFiles(root, "ods/ev/day=d1")
    // the v >= 0 conjunct forces the rewrite path (not metadata delete);
    // every d3 row matches, so the replacement writes no d3 files and
    // the commit prunes the emptied directory
    spark.sql(s"DELETE FROM $cat.ods.ev WHERE day = 'd3' AND v >= 0")
    assert(spark.table(s"$cat.ods.ev").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L, 4L))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/ods/ev/day=d3")),
      "emptied partition directory should have been pruned")
    assert(dataFiles(root, "ods/ev/day=d1") == beforeD1)
  }

  private def mkTwoLevel(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.raw")
    spark.sql(s"CREATE TABLE $cat.raw.land (id BIGINT, year INT, month INT) " +
      "PARTITIONED BY (year, month)")
    spark.sql(s"INSERT INTO $cat.raw.land VALUES " +
      "(1, 2020, 1), (2, 2020, 2), (3, 2020, 3), " +
      "(4, 2021, 1), (5, 2021, 2), (6, 2021, 3)")
  }

  test("two-level layout: partial-spec DELETE drops the whole year subtree") {
    val (cat, root) = freshCatalog()
    mkTwoLevel(cat)
    val before2021 = dataFiles(root, "raw/land/year=2021")
    spark.sql(s"DELETE FROM $cat.raw.land WHERE year = 2020")
    assert(spark.table(s"$cat.raw.land").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(4L, 5L, 6L))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/raw/land/year=2020")))
    assert(dataFiles(root, "raw/land/year=2021") == before2021)
  }

  test("two-level layout: leaf DELETE drops one month; second-level-only DELETE drops across years") {
    val (cat, root) = freshCatalog()
    mkTwoLevel(cat)
    spark.sql(s"DELETE FROM $cat.raw.land WHERE year = 2021 AND month = 2")
    assert(spark.table(s"$cat.raw.land").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L, 4L, 6L))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/raw/land/year=2021/month=2")))
    assert(fs.exists(new Path(s"$root/raw/land/year=2021/month=1")))
    // a constraint on the SECOND level alone prunes under every year
    spark.sql(s"DELETE FROM $cat.raw.land WHERE month = 1")
    assert(spark.table(s"$cat.raw.land").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(2L, 3L, 6L))
    assert(!fs.exists(new Path(s"$root/raw/land/year=2020/month=1")))
    assert(!fs.exists(new Path(s"$root/raw/land/year=2021/month=1")))
    // deleting the last month of a year prunes the hollow year shell
    spark.sql(s"DELETE FROM $cat.raw.land WHERE month IN (2, 3)")
    assert(spark.table(s"$cat.raw.land").count() == 0)
    assert(!fs.exists(new Path(s"$root/raw/land/year=2020")),
      "hollow year=2020 shell should have been pruned")
  }

  test("TRUNCATE TABLE empties a partitioned table but keeps its schema") {
    val (cat, _) = freshCatalog()
    mkPartitioned(cat)
    spark.sql(s"TRUNCATE TABLE $cat.ods.ev")
    assert(spark.table(s"$cat.ods.ev").count() == 0)
    assert(spark.table(s"$cat.ods.ev").columns.toSeq == Seq("id", "v", "day"))
    // and the table is still writable afterwards
    spark.sql(s"INSERT INTO $cat.ods.ev VALUES (9, 90, 'd9')")
    assert(spark.table(s"$cat.ods.ev").count() == 1)
  }

  test("unpartitioned tables keep the copy-on-write DELETE path") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.flat (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.ods.flat VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql(s"DELETE FROM $cat.ods.flat WHERE v >= 20") // arbitrary predicate
    assert(spark.table(s"$cat.ods.flat").collect().map(_.getLong(0)).toSeq
      == Seq(1L))
  }
}
