package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.GraftDv

/** Merge-on-read UPDATE / MERGE / positional DELETE
  * ([[graft.sources.GraftDeltaMor]] — Spark's SupportsDelta row-level
  * operations over the deletion-vector store): the operation reads row
  * coordinates through the `_graft_file`/`_graft_pos` metadata columns
  * and writes POSITIONS plus appended rows — untouched data files stay
  * byte-identical, the property this spec pins on every path.
  */
class GraftMorDeltaSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gmd${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-md-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fileState(root: String, rel: String)
      : Map[String, (Long, Long)] = {
    val fs = fsOf(root)
    def walk(p: Path): Seq[(String, (Long, Long))] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("_") || nm.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq((st.getPath.toString, (st.getLen, st.getModificationTime)))
      }
    walk(new Path(s"$root/$rel")).toMap
  }

  private def dvCount(root: String, rel: String): Int = {
    val fs = fsOf(root)
    val d = new Path(s"$root/$rel/${GraftDv.DirName}")
    if (!fs.exists(d)) 0
    else fs.listStatus(d).count(_.getPath.getName.endsWith(".dv"))
  }

  private def mor(cat: String, ddl: String): Unit =
    spark.sql(ddl + s" TBLPROPERTIES ('${GraftDv.ModeKey}' = " +
      s"'${GraftDv.MorValue}')")

  test("row coordinates: _graft_file/_graft_pos are exact, DV-aware, per-file dense") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT)")
    (0 until 3).foreach { s =>
      spark.sql(s"INSERT INTO $cat.ods.t SELECT id, id " +
        s"FROM range(${s * 100}, ${(s + 1) * 100})")
    }
    val coords = spark.sql(s"SELECT k, _graft_file, _graft_pos " +
      s"FROM $cat.ods.t").as[(Long, String, Long)].collect()
    assert(coords.length == 300)
    // per file: positions dense 0..count-1
    coords.groupBy(_._2).foreach { case (f, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.toSeq == (0L until ps.length).toSeq,
        s"positions of $f not dense: ${ps.take(5).mkString(",")}...")
    }
    // after a vector lands, deleted rows vanish but SURVIVORS keep
    // their original (file-absolute) positions
    spark.sql(s"DELETE FROM $cat.ods.t WHERE k >= 10 AND k < 20")
    val after = spark.sql(s"SELECT k, _graft_file, _graft_pos " +
      s"FROM $cat.ods.t").as[(Long, String, Long)].collect()
    assert(after.length == 290)
    val byKey = coords.map(c => c._1 -> ((c._2, c._3))).toMap
    after.foreach { case (k, f, p) =>
      assert(byKey(k) == ((f, p)),
        s"row $k changed coordinates after an unrelated delete")
    }
  }

  test("MOR UPDATE: untouched files byte-identical; only changed rows written; vectors appear") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT)")
    (0 until 4).foreach { s =>
      spark.sql(s"INSERT INTO $cat.ods.t SELECT id, 0 " +
        s"FROM range(${s * 250}, ${(s + 1) * 250})")
    }
    val before = fileState(root, "ods/t")

    spark.sql(s"UPDATE $cat.ods.t SET v = 7 WHERE k IN (3, 501)")

    val afterFiles = fileState(root, "ods/t")
    // every ORIGINAL file untouched (no rewrite!), new file(s) appended
    before.foreach { case (f, id) =>
      assert(afterFiles.get(f).contains(id),
        s"merge-on-read UPDATE rewrote or retired $f")
    }
    val newFiles = afterFiles.keySet -- before.keySet
    assert(newFiles.nonEmpty, "no replacement rows were appended")
    assert(dvCount(root, "ods/t") > 0, "no vectors were written")
    // semantics
    val rows = spark.table(s"$cat.ods.t").as[(Long, Long)].collect().toSet
    assert(rows == (0L until 1000L).map(k =>
      (k, if (k == 3 || k == 501) 7L else 0L)).toSet)
  }

  test("MOR MERGE: matched update + not-matched insert + matched delete, no rewrite") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT, g STRING) " +
      "PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, id, " +
      "concat('p', id % 2) FROM range(0, 500)")
    spark.sql(s"CREATE TABLE $cat.ods.src (k BIGINT, v BIGINT, g STRING)")
    // updates 10..19, deletes 490..499, inserts 1000..1009
    spark.sql(s"""INSERT INTO $cat.ods.src
      SELECT id, -id, concat('p', id % 2) FROM range(10, 20)
      UNION ALL SELECT id, 0, 'x' FROM range(490, 500)
      UNION ALL SELECT id, id * 2, concat('p', id % 2)
      FROM range(1000, 1010)""")
    val before = fileState(root, "ods/t")

    spark.sql(s"""MERGE INTO $cat.ods.t t USING $cat.ods.src s ON t.k = s.k
      WHEN MATCHED AND s.g = 'x' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")

    val afterFiles = fileState(root, "ods/t")
    before.foreach { case (f, id) =>
      assert(afterFiles.get(f).contains(id),
        s"merge-on-read MERGE rewrote or retired $f")
    }
    val expect =
      (0L until 500L).filterNot(k => k >= 490).map { k =>
        (k, if (k >= 10 && k < 20) -k else k, s"p${k % 2}")
      } ++ (1000L until 1010L).map(k => (k, k * 2, s"p${k % 2}"))
    assert(spark.table(s"$cat.ods.t").as[(Long, Long, String)]
      .collect().toSet == expect.toSet)
    assert(dvCount(root, "ods/t") > 0)
  }

  test("bucketed MOR MERGE keeps tags: same-spec join exchange-free after the merge") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.a (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"CREATE TABLE $cat.ods.b (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.ods.a SELECT id, id FROM range(0, 400)")
    spark.sql(s"INSERT INTO $cat.ods.b SELECT id, id FROM range(0, 500)")
    val before = fileState(root, "ods/a")

    spark.sql(s"""MERGE INTO $cat.ods.a t
      USING (SELECT id AS k, id * 3 AS v FROM range(390, 420)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")

    before.foreach { case (f, id) =>
      assert(fileState(root, "ods/a").get(f).contains(id),
        s"bucketed merge-on-read MERGE rewrote $f")
    }
    val expect = (0L until 390L).map(k => (k, k)) ++
      (390L until 420L).map(k => (k, k * 3))
    assert(spark.table(s"$cat.ods.a").as[(Long, Long)].collect().toSet ==
      expect.toSet)
    val joined = spark.table(s"$cat.ods.a").join(spark.table(s"$cat.ods.b"), "k")
    assert(!joined.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      "inserted rows lost their bucket tags")
    assert(joined.count() == 420)
  }

  test("untranslatable DELETE goes positional; rewrite_deletes materializes the delta state") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.t (k BIGINT, tag STRING)")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, concat('t', id % 10) " +
      "FROM range(0, 300)")
    val before = fileState(root, "ods/t")

    // substring predicates don't translate to V2 filters -> the DELTA
    // path, not deleteWhere; still no rewrite
    spark.sql(s"DELETE FROM $cat.ods.t WHERE substring(tag, 2, 1) = '7'")
    before.foreach { case (f, id) =>
      assert(fileState(root, "ods/t").get(f).contains(id),
        s"positional DELETE rewrote $f")
    }
    assert(spark.table(s"$cat.ods.t").count() == 270)
    assert(dvCount(root, "ods/t") > 0)

    spark.sql(s"UPDATE $cat.ods.t SET tag = 'X' WHERE k = 5")
    val expected = spark.table(s"$cat.ods.t").as[(Long, String)]
      .collect().toSet
    val res = spark.sql(s"CALL $cat.system.rewrite_deletes(" +
      "table => 'ods.t')").head
    assert(res.getInt(0) > 0)
    assert(dvCount(root, "ods/t") == 0)
    assert(spark.table(s"$cat.ods.t").as[(Long, String)]
      .collect().toSet == expected)
  }

  test("positional scans skip: a selective UPDATE never opens files the manifest prunes") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT)")
    // four single-slice inserts -> four files with DISJOINT k ranges
    (0 until 4).foreach { s =>
      spark.sql(s"INSERT INTO $cat.ods.t SELECT id, 0 " +
        s"FROM range(${s * 250}, ${(s + 1) * 250})")
    }
    spark.sql(s"CALL $cat.system.analyze(table => 'ods.t')")

    // same-length-corrupt every file that cannot hold k = 42: the
    // manifest identity stays valid, so the positional scan must PRUNE
    // them — if it opened one, the parquet reader would explode
    val fs = fsOf(root)
    val dirP = new Path(s"$root/ods/t")
    fs.listStatus(dirP).toSeq.map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .foreach { p =>
        val rows = spark.read.parquet(p.toString).agg(min("k"), max("k"))
          .head
        // corrupt only the k >= 250 slices: provably unmatchable by the
        // UPDATE, and outside the parity read below
        if (rows.getLong(0) >= 250) {
          val st = fs.getFileStatus(p)
          val out = fs.create(p, true)
          try out.write(new Array[Byte](st.getLen.toInt))
          finally out.close()
          fs.setTimes(p, st.getModificationTime, -1)
        }
      }

    spark.sql(s"UPDATE $cat.ods.t SET v = 9 WHERE k = 42")
    // parity on the surviving slice (the normal scan prunes the
    // corrupted files for the same reason the positional scan did)
    assert(spark.table(s"$cat.ods.t").where(col("k") < 250)
      .as[(Long, Long)].collect().toSet ==
      (0L until 250L).map(k => (k, if (k == 42) 9L else 0L)).toSet,
      "selective merge-on-read UPDATE opened a pruned file or misapplied")
  }

  test("partition-moving UPDATE: the row re-homes via position + insert, no rewrite") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT, g STRING) " +
      "PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO $cat.ods.t SELECT id, id, " +
      "concat('p', id % 2) FROM range(0, 100)")
    val before = fileState(root, "ods/t")

    // assigning the PARTITION column: delete-position in the old
    // partition's file + replacement row written into the NEW dir
    spark.sql(s"UPDATE $cat.ods.t SET g = 'moved' WHERE k = 7")

    before.foreach { case (f, id) =>
      assert(fileState(root, "ods/t").get(f).contains(id),
        s"partition-moving merge-on-read UPDATE rewrote $f")
    }
    val fs = fsOf(root)
    assert(fs.exists(new Path(s"$root/ods/t/g=moved")),
      "the replacement row did not land in its new partition dir")
    assert(spark.table(s"$cat.ods.t").as[(Long, Long, String)]
      .collect().toSet ==
      (0L until 100L).map(k =>
        (k, k, if (k == 7) "moved" else s"p${k % 2}")).toSet)
  }

  test("runtime source-key narrowing: a MERGE touching one partition schedules only its files (r13 item 4)") {
    import graft.sources.GraftMorRuntimeScope
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT, g STRING) " +
      "PARTITIONED BY (g)")
    (0 until 4).foreach { p =>
      (0 until 2).foreach { s =>
        spark.sql(s"INSERT INTO $cat.ods.t SELECT id, id, 'p$p' " +
          s"FROM range(${s * 100}, ${(s + 1) * 100})")
      }
    }
    spark.sql(s"CREATE TABLE $cat.ods.src (k BIGINT, v BIGINT, g STRING)")
    spark.sql(s"INSERT INTO $cat.ods.src VALUES " +
      "(5, 555, 'p1'), (7, 777, 'p1'), (9999, 9, 'p1')")
    val before = fileState(root, "ods/t")
    val engBefore = GraftMorRuntimeScope.engagements.sum()

    // the ON condition references SOURCE attributes: nothing is
    // statically pushable, so without the runtime narrowing the
    // positional scan plans EVERY partition's files
    spark.sql(s"MERGE INTO $cat.ods.t t USING $cat.ods.src s " +
      "ON t.g = s.g AND t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (k, v, g) VALUES (s.k, s.v, s.g)")
    assert(GraftMorRuntimeScope.engagements.sum() > engBefore,
      "the runtime narrowing rule never engaged (loud tripwire)")
    val planned = GraftMorRuntimeScope.lastPlannedRels.get()
    assert(planned.nonEmpty && planned.forall(_.startsWith("g=p1/")),
      s"positional scan scheduled splits outside the source's one " +
        s"partition: $planned")

    // correctness: updates applied, insert landed, every ORIGINAL file
    // byte-identical (merge-on-read + narrowing change no write shape)
    val t = spark.table(s"$cat.ods.t")
    assert(t.where(col("k") === 5 && col("g") === "p1")
      .head.getLong(1) == 555)
    assert(t.where(col("k") === 7 && col("g") === "p1")
      .head.getLong(1) == 777)
    assert(t.where(col("k") === 9999).collect()
      .map(r => (r.getLong(1), r.getString(2))).toSeq == Seq((9L, "p1")))
    assert(t.count() == 801)
    val after = fileState(root, "ods/t")
    before.foreach { case (f, st) =>
      assert(after.get(f).contains(st), s"original file changed: $f")
    }

    // a target-preserving merge (NOT MATCHED BY SOURCE) must DECLINE —
    // filtering unmatched target rows would drop their ops
    val engMid = GraftMorRuntimeScope.engagements.sum()
    spark.sql(s"MERGE INTO $cat.ods.t t USING $cat.ods.src s " +
      "ON t.g = s.g AND t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET v = 0 " +
      "WHEN NOT MATCHED BY SOURCE AND t.g = 'p2' THEN UPDATE SET v = -1")
    assert(GraftMorRuntimeScope.engagements.sum() == engMid,
      "narrowing engaged on a target-preserving merge — unsound")
    assert(spark.table(s"$cat.ods.t").where(col("v") === -1).count() == 200,
      "the NOT MATCHED BY SOURCE update lost rows")
    assert(spark.table(s"$cat.ods.t")
      .where(col("k").isin(5L, 7L, 9999L) && col("g") === "p1")
      .agg(sum(col("v"))).head.getLong(0) == 0L)
  }

  test("delta ops equal the COW result computed on an identical table") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    mor(cat, s"CREATE TABLE $cat.ods.m (k BIGINT, v BIGINT)")
    spark.sql(s"CREATE TABLE $cat.ods.c (k BIGINT, v BIGINT)")
    Seq("m", "c").foreach { t =>
      spark.sql(s"INSERT INTO $cat.ods.$t SELECT id, id FROM range(0, 200)")
    }
    Seq("m", "c").foreach { t =>
      spark.sql(s"""MERGE INTO $cat.ods.$t t
        USING (SELECT id * 2 AS k, -1 AS v FROM range(50, 120)) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.k < 10 THEN DELETE""")
    }
    assert(spark.table(s"$cat.ods.m").as[(Long, Long)].collect().toSet ==
      spark.table(s"$cat.ods.c").as[(Long, Long)].collect().toSet,
      "merge-on-read MERGE diverged from the copy-on-write result")
  }
}
