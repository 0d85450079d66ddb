package graft

import org.apache.hadoop.fs.Path

/** Metadata-only DELETE on partitioned catalog tables
  * ([[graft.sources.GraftCatalog]] SupportsDeleteV2): partition-
  * predicate deletes drop directories without touching any other
  * partition's files; non-partition predicates keep the copy-on-write
  * refusal; TRUNCATE rides the same surface.
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

  test("non-partition predicate on a partitioned table still refuses with the documented pointer") {
    val (cat, _) = freshCatalog()
    mkPartitioned(cat)
    val e = intercept[Exception](spark.sql(s"DELETE FROM $cat.ods.ev WHERE v = 20"))
    assert(e.getMessage.contains("Catalog.merge"),
      s"expected the copy-on-write refusal, got: ${e.getMessage}")
    assert(spark.table(s"$cat.ods.ev").count() == 6) // nothing changed
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
