package graft

import org.apache.hadoop.fs.Path

/** Leaf-level group narrowing for partitioned copy-on-write row-level
  * SQL ([[graft.sources.GraftCowLeafScope]], r10 item 1): on a
  * two-level `year=/month=` layout — the reference's landing shape
  * (covid_to_s3.py:41) — a MERGE/UPDATE/DELETE touching one
  * (year, month) must leave SIBLING MONTHS OF THE SAME YEAR
  * byte-identical, where the first-column-only runtime group filter
  * used to rewrite the whole year.
  */
class GraftCowLeafSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gleaf${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-leaf-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  /** Every data file under a table dir: rel path -> (length, md5). */
  private def fileState(root: String, layer: String,
      table: String): Map[String, (Long, String)] = {
    val base = new Path(s"$root/$layer/$table")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[Path] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("_") || nm.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath)
      }
    walk(base).map { p =>
      val in = fs.open(p)
      val md = java.security.MessageDigest.getInstance("MD5")
      try {
        val buf = new Array[Byte](65536)
        var r = in.read(buf)
        while (r >= 0) { md.update(buf, 0, r); r = in.read(buf) }
      } finally in.close()
      val rel = p.toString.stripPrefix(fs.makeQualified(base).toString + "/")
      rel -> ((fs.getFileStatus(p).getLen,
        md.digest().map(b => f"$b%02x").mkString))
    }.toMap
  }

  /** 3 years x 4 months x 10 keys; key encodes (year, month, slot). */
  private def seed(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.facts " +
      "(k BIGINT, v BIGINT, year INT, month INT) PARTITIONED BY (year, month)")
    spark.sql(s"""INSERT INTO $cat.ods.facts
      SELECT id,
             id * 10,
             CAST(2020 + id DIV 1000 AS INT),
             CAST(1 + (id DIV 100) % 10 AS INT)
      FROM range(0, 3000) WHERE (id DIV 100) % 10 < 4""")
    assert(spark.table(s"$cat.ods.facts").count() == 1200)
  }

  test("MERGE touching one (year, month) leaves sibling months byte-identical") {
    val (cat, root) = freshCatalog()
    seed(cat)
    val before = fileState(root, "ods", "facts")
    // updates hit keys 100..109 — all in (year=2020, month=2)
    spark.sql(s"""MERGE INTO $cat.ods.facts t
      USING (SELECT id AS k, id * 1000 AS v,
               CAST(2020 AS INT) AS year, CAST(2 AS INT) AS month
             FROM range(100, 110)) u
      ON t.k = u.k
      WHEN MATCHED THEN UPDATE SET t.v = u.v
      WHEN NOT MATCHED THEN INSERT (k, v, year, month)
        VALUES (u.k, u.v, u.year, u.month)""")
    val after = fileState(root, "ods", "facts")
    // the touched leaf changed
    assert(before.keys.exists(_.startsWith("year=2020/month=2/")))
    assert(after.keys.exists(_.startsWith("year=2020/month=2/")))
    assert(before.filter(_._1.startsWith("year=2020/month=2/")) !=
      after.filter(_._1.startsWith("year=2020/month=2/")),
      "touched partition was not rewritten")
    // EVERY other leaf — including months 1/3/4 of the SAME year 2020 —
    // is byte-identical (same file set, same lengths, same md5)
    val untouched = (rel: String) => !rel.startsWith("year=2020/month=2/")
    assert(before.view.filterKeys(untouched).toMap ==
      after.view.filterKeys(untouched).toMap,
      "untouched sibling partitions were rewritten:\n" +
        (before.keySet ++ after.keySet).filter(untouched)
          .filter(r => before.get(r) != after.get(r)).mkString("\n"))
    // and the data is right
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ods.facts " +
      "WHERE year = 2020 AND month = 2").head.getLong(0) ==
      (100L until 110L).map(_ * 1000).sum +
        (110L until 200L).map(_ * 10).sum)
    assert(spark.table(s"$cat.ods.facts").count() == 1200)
  }

  test("MERGE inserts into a brand-new leaf partition without touching any other") {
    val (cat, root) = freshCatalog()
    seed(cat)
    val before = fileState(root, "ods", "facts")
    spark.sql(s"""MERGE INTO $cat.ods.facts t
      USING (SELECT 999999L AS k, 1L AS v,
               CAST(2031 AS INT) AS year, CAST(7 AS INT) AS month) u
      ON t.k = u.k
      WHEN MATCHED THEN UPDATE SET t.v = u.v
      WHEN NOT MATCHED THEN INSERT (k, v, year, month)
        VALUES (u.k, u.v, u.year, u.month)""")
    val after = fileState(root, "ods", "facts")
    assert(after.keys.exists(_.startsWith("year=2031/month=7/")),
      "insert did not land in its new partition")
    assert(before == after.view.filterKeys(
      !_.startsWith("year=2031/month=7/")).toMap,
      "an insert-only merge rewrote pre-existing partitions")
    assert(spark.table(s"$cat.ods.facts").count() == 1201)
  }

  test("UPDATE moving rows across leaf partitions stays exact") {
    val (cat, root) = freshCatalog()
    seed(cat)
    val before = fileState(root, "ods", "facts")
    // move keys 200..209 from (2020, 3) into (2020, 4): source leaf is
    // matched+rewritten, destination leaf gains rows (count mismatch ->
    // publish+retire), everything else stays byte-identical
    spark.sql(s"UPDATE $cat.ods.facts SET month = 4 " +
      "WHERE k >= 200 AND k < 210")
    val after = fileState(root, "ods", "facts")
    val touched = (rel: String) => rel.startsWith("year=2020/month=3/") ||
      rel.startsWith("year=2020/month=4/")
    assert(before.view.filterKeys(r => !touched(r)).toMap ==
      after.view.filterKeys(r => !touched(r)).toMap,
      "a cross-partition move rewrote unrelated partitions")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ods.facts " +
      "WHERE year = 2020 AND month = 4").head.getLong(0) == 100 + 10)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ods.facts " +
      "WHERE year = 2020 AND month = 3").head.getLong(0) == 100 - 10)
    assert(spark.table(s"$cat.ods.facts").count() == 1200)
  }

  test("row-predicate DELETE rewrites one leaf; a fully-deleted leaf vanishes") {
    val (cat, root) = freshCatalog()
    seed(cat)
    val before = fileState(root, "ods", "facts")
    // not metadata-translatable (row predicate), hits (2021, 2) only
    spark.sql(s"DELETE FROM $cat.ods.facts WHERE k >= 1100 AND k < 1110")
    val mid = fileState(root, "ods", "facts")
    val leaf21 = (rel: String) => rel.startsWith("year=2021/month=2/")
    assert(before.view.filterKeys(r => !leaf21(r)).toMap ==
      mid.view.filterKeys(r => !leaf21(r)).toMap,
      "a one-leaf delete rewrote other partitions")
    assert(spark.table(s"$cat.ods.facts").count() == 1190)
    // delete EVERY row of (2022, 1): the leaf's replacement is empty,
    // so the directory disappears instead of lingering
    spark.sql(s"DELETE FROM $cat.ods.facts WHERE k >= 2000 AND k < 2100 AND v >= 0")
    val after = fileState(root, "ods", "facts")
    assert(!after.keys.exists(_.startsWith("year=2022/month=1/")),
      "fully-deleted leaf partition left files behind")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/ods/facts/year=2022/month=1")),
      "fully-deleted leaf directory was not pruned")
    assert(spark.table(s"$cat.ods.facts").count() == 1090)
  }

  test("cartesian over-scan drops pure-carryover staged copies; no residue anywhere") {
    val (cat, root) = freshCatalog()
    seed(cat)
    val before = fileState(root, "ods", "facts")
    // matches in (2020, month=2) AND (2021, month=3): the per-column
    // scan scope is the cartesian years{2020,2021} x months{2,3}, so
    // (2020,3) and (2021,2) are SCANNED but unmatched — their staged
    // carryover must be dropped at commit, leaving the original files.
    spark.sql(s"""MERGE INTO $cat.ods.facts t
      USING (SELECT id AS k FROM range(100, 105)
             UNION ALL SELECT id FROM range(1200, 1205)) u
      ON t.k = u.k
      WHEN MATCHED THEN DELETE""")
    val after = fileState(root, "ods", "facts")
    val touched = (rel: String) => rel.startsWith("year=2020/month=2/") ||
      rel.startsWith("year=2021/month=3/")
    // the scanned-but-unmatched cartesian corners kept ORIGINAL files
    assert(before.view.filterKeys(r => !touched(r)).toMap ==
      after.view.filterKeys(r => !touched(r)).toMap,
      "scanned-but-unmatched partitions were rewritten instead of dropped")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dotFiles(p: Path): Seq[Path] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory && !st.getPath.getName.startsWith("_"))
          dotFiles(st.getPath)
        else if (st.getPath.getName.startsWith(".")) Seq(st.getPath)
        else Nil
      }
    assert(dotFiles(new Path(s"$root/ods/facts")).isEmpty,
      "dropped staged files were not cleaned up")
    assert(spark.table(s"$cat.ods.facts").count() == 1190)
  }

  test("DATE-partitioned MERGE narrows to the matched dates (reference's report_date layout)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.daily (k BIGINT, v BIGINT, d DATE) " +
      "PARTITIONED BY (d)")
    spark.sql(s"""INSERT INTO $cat.ods.daily
      SELECT id, id * 10, date_add(DATE'2021-03-01', CAST(id DIV 50 AS INT))
      FROM range(0, 500)""")
    val before = fileState(root, "ods", "daily")
    assert(before.keys.map(_.split("/").head).toSet.size == 10) // 10 dates
    // matched keys live entirely in d=2021-03-04 (ids 150..199)
    spark.sql(s"""MERGE INTO $cat.ods.daily t
      USING (SELECT id AS k FROM range(160, 170)) u ON t.k = u.k
      WHEN MATCHED THEN UPDATE SET t.v = 0""")
    val after = fileState(root, "ods", "daily")
    val touched = (rel: String) => rel.startsWith("d=2021-03-04/")
    assert(before.view.filterKeys(r => !touched(r)).toMap ==
      after.view.filterKeys(r => !touched(r)).toMap,
      "a one-date merge rewrote sibling dates")
    assert(before.filter(t => touched(t._1)) != after.filter(t => touched(t._1)),
      "the matched date was not rewritten")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ods.daily " +
      "WHERE d = DATE'2021-03-04'").head.getLong(0) ==
      ((150L until 160L) ++ (170L until 200L)).map(_ * 10).sum)
    assert(spark.table(s"$cat.ods.daily").count() == 500)
  }

  test("NULL partition values decline the narrowing and stay correct") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.nully " +
      "(k BIGINT, v BIGINT, seg STRING) PARTITIONED BY (seg)")
    spark.sql(s"INSERT INTO $cat.ods.nully VALUES " +
      "(1, 10, 'a'), (2, 20, NULL), (3, 30, 'b'), (4, 40, NULL)")
    // a matched row lives in the NULL (__HIVE_DEFAULT_PARTITION__)
    // partition -> unrenderable tuple -> rule declines -> the r10
    // fallback path must still produce the exact result
    spark.sql(s"""MERGE INTO $cat.ods.nully t
      USING (SELECT 2L AS k, 999L AS v) u ON t.k = u.k
      WHEN MATCHED THEN UPDATE SET t.v = u.v""")
    assert(spark.table(s"$cat.ods.nully").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 999L), (3L, 30L), (4L, 40L)))
  }

  /** r11 item 7 — make the private-API contact LOUD. The rule reaches
    * RowLevelOperationTable.operation reflectively; if a Spark upgrade
    * renames either, the rule declines everywhere and every COW
    * rewrite silently re-inflates to first-column scope. These two
    * cases fail (not decline) in that world.
    */
  test("the reflective RowLevelOperationTable.operation contact still resolves") {
    // the exact class + accessor GraftCowLeafScope.operationOf reaches:
    // a rename fails HERE first, before any behavioral drift
    val cls = Class.forName(
      "org.apache.spark.sql.connector.write.RowLevelOperationTable")
    val m = cls.getMethod("operation")
    assert(m != null && classOf[
      org.apache.spark.sql.connector.write.RowLevelOperation]
      .isAssignableFrom(m.getReturnType),
      s"operation() now returns ${m.getReturnType} — update GraftCowLeafScope")
  }

  test("leaf narrowing ENGAGES on the canonical two-level MERGE (not just correct)") {
    val (cat, root) = freshCatalog()
    seed(cat)
    val before = graft.sources.GraftCowLeafScope.engagements.sum()
    spark.sql(s"""MERGE INTO $cat.ods.facts t
      USING (SELECT id AS k, id * 1000 AS v,
               CAST(2020 AS INT) AS year, CAST(2 AS INT) AS month
             FROM range(100, 110)) u
      ON t.k = u.k
      WHEN MATCHED THEN UPDATE SET t.v = u.v
      WHEN NOT MATCHED THEN INSERT (k, v, year, month)
        VALUES (u.k, u.v, u.year, u.month)""")
    val after = graft.sources.GraftCowLeafScope.engagements.sum()
    // byte-identity alone could pass through some future alternate
    // mechanism; this asserts the NARROWING RULE itself fired — if the
    // reflective operation() access stops resolving, the rule declines
    // and this count stays flat
    assert(after == before + 1,
      s"leaf narrowing did not engage (engagements $before -> $after): " +
        "the reflective RowLevelOperationTable.operation contact is broken")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ods.facts " +
      "WHERE year = 2020 AND month = 2").head.getLong(0) ==
      (100L until 110L).map(_ * 1000).sum +
        (110L until 200L).map(_ * 10).sum)
  }

  test("the narrowed scan reads only the matched leaves (write volume evidence)") {
    val (cat, root) = freshCatalog()
    seed(cat)
    // Count rows written by the rewrite via the staged files that the
    // merge PUBLISHES: with leaf narrowing, the replacement covers one
    // 100-row leaf (plus nothing else); the old first-column behavior
    // staged carryover for all four months of year 2020 (400 rows).
    // Observable aftermath: file count in the touched leaf stays small
    // and siblings keep their ORIGINAL single insert-generation file.
    val filesPerLeaf = fileState(root, "ods", "facts").keys
      .groupBy(rel => rel.split("/").take(2).mkString("/"))
      .view.mapValues(_.size).toMap
    spark.sql(s"""MERGE INTO $cat.ods.facts t
      USING (SELECT id AS k FROM range(0, 10)) u ON t.k = u.k
      WHEN MATCHED THEN UPDATE SET v = t.v + 1""")
    val afterPerLeaf = fileState(root, "ods", "facts").keys
      .groupBy(rel => rel.split("/").take(2).mkString("/"))
      .view.mapValues(_.size).toMap
    // only year=2020/month=1 may differ in file COUNT; all others equal
    assert((filesPerLeaf - "year=2020/month=1") ==
      (afterPerLeaf - "year=2020/month=1"),
      s"file layout drifted outside the touched leaf:\n$filesPerLeaf\nvs\n$afterPerLeaf")
  }
}
