package graft.runtime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Materialized views over the counting-IVM tier
  * ([[GraftMaterializedViews]], r15 verdict item 8): CREATE validates
  * maintainability and builds the backing aggregate; the refresh
  * procedure folds ONLY the base table's change feed above the MV's
  * recorded position — incremental must equal recompute after
  * INSERT/UPDATE/DELETE/MERGE, dead groups must disappear, and
  * non-maintainable bodies must refuse at CREATE.
  */
class GraftMaterializedViewSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gmv${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-mv-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Set[(String, Long, Long)] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental refresh equals recompute across INSERT/UPDATE/DELETE; dead groups vanish; no-op and full refresh") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.ods.bal (k BIGINT, cents BIGINT, " +
      "seg STRING)")
    spark.sql(s"INSERT INTO $cat.ods.bal VALUES " +
      "(1, 100, 'a'), (2, 200, 'a'), (3, 300, 'b'), (4, 400, 'c')")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mart.mv AS " +
      s"SELECT seg, count(*) AS n, sum(cents) AS cents_sum " +
      s"FROM $cat.ods.bal GROUP BY seg")
    def mv() = rows(spark.table(s"$cat.mart.mv")
      .select(col("seg"), col("n"), col("cents_sum")))
    def recompute() = rows(spark.sql(
      s"SELECT seg, count(*) AS n, sum(cents) AS cents_sum " +
        s"FROM $cat.ods.bal GROUP BY seg"))
    assert(mv() == recompute())
    assert(mv() == Set(("a", 2L, 300L), ("b", 1L, 300L), ("c", 1L, 400L)))

    // base DML: insert + COW update pairs + a group fully deleted
    spark.sql(s"INSERT INTO $cat.ods.bal VALUES (5, 500, 'b')")
    spark.sql(s"UPDATE $cat.ods.bal SET cents = cents + 7 WHERE k = 1")
    spark.sql(s"DELETE FROM $cat.ods.bal WHERE seg = 'c'")
    val res = spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
      "table => 'mart.mv')").head
    assert(res.getLong(0) > 0, "refresh folded nothing")
    assert(mv() == recompute(), "incremental diverged from recompute")
    assert(!mv().exists(_._1 == "c"),
      "a fully-deleted group must vanish (liveness count reached zero)")

    // a refresh with no new commits is a no-op at the same position
    val res2 = spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
      "table => 'mart.mv')").head
    assert(res2.getLong(0) == 0L && res2.getLong(1) == res.getLong(1))

    // full recompute lands on the same state
    spark.sql(s"INSERT INTO $cat.ods.bal VALUES (6, 600, 'd')")
    spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
      "table => 'mart.mv', full => true)").collect()
    assert(mv() == recompute())

    // a filtered MV folds only matching change rows
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mart.mvf AS " +
      s"SELECT seg, count(*) AS n, sum(cents) AS cents_sum " +
      s"FROM $cat.ods.bal WHERE k % 2 = 0 GROUP BY seg")
    spark.sql(s"INSERT INTO $cat.ods.bal VALUES (7, 70, 'a'), (8, 80, 'a')")
    spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
      "table => 'mart.mvf')").collect()
    assert(rows(spark.table(s"$cat.mart.mvf")
        .select(col("seg"), col("n"), col("cents_sum"))) ==
      rows(spark.sql(s"SELECT seg, count(*) AS n, sum(cents) AS " +
        s"cents_sum FROM $cat.ods.bal WHERE k % 2 = 0 GROUP BY seg")))

    // aliased group key + COUNT(col): the fold reads the SOURCE column
    // from the change feed, emits the OUTPUT alias, and maintains
    // COUNT(col) as a NULL-guarded sum (not a row count)
    spark.sql(s"CREATE TABLE $cat.ods.alz (k BIGINT, cents BIGINT, " +
      "seg STRING)")
    spark.sql(s"INSERT INTO $cat.ods.alz VALUES " +
      "(1, 5, 'a'), (2, NULL, 'a'), (3, 7, 'b')")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mart.mva AS " +
      s"SELECT seg AS segment, count(*) AS n, count(cents) AS filled " +
      s"FROM $cat.ods.alz GROUP BY seg")
    spark.sql(s"INSERT INTO $cat.ods.alz VALUES (4, NULL, 'b'), (5, 9, 'b')")
    spark.sql(s"DELETE FROM $cat.ods.alz WHERE k = 2")
    spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
      "table => 'mart.mva')").collect()
    assert(rows(spark.table(s"$cat.mart.mva")
        .select(col("segment"), col("n"), col("filled"))) ==
      rows(spark.sql(s"SELECT seg AS segment, count(*) AS n, " +
        s"count(cents) AS filled FROM $cat.ods.alz GROUP BY seg")))
    assert(rows(spark.table(s"$cat.mart.mva")
        .select(col("segment"), col("n"), col("filled"))) ==
      Set(("a", 1L, 1L), ("b", 3L, 2L)))

    // DROP MATERIALIZED VIEW drops the backing table
    spark.sql(s"DROP MATERIALIZED VIEW $cat.mart.mvf")
    assert(intercept[Exception](
      spark.table(s"$cat.mart.mvf").collect()).getMessage.nonEmpty)
  }

  test("a crashed refresh (pending marker) refuses the next incremental fold; full recomputes and clears it") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.ods.b (k BIGINT, v BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.ods.b VALUES (1, 10, 'x'), (2, 20, 'y')")
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mart.pm AS " +
      s"SELECT s, count(*) AS n, sum(v) AS sv FROM $cat.ods.b GROUP BY s")
    spark.sql(s"INSERT INTO $cat.ods.b VALUES (3, 30, 'x')")
    // simulate the crash window: the marker exists, position not updated
    val dir = new org.apache.hadoop.fs.Path(s"$root/mart/pm")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(dir, "_graft_mv.pending"),
      true).close()
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
        "table => 'mart.pm')").collect()
    }
    assert(e.getMessage.contains("full => true"), e.getMessage)
    // full recompute recovers AND clears the marker
    spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
      "table => 'mart.pm', full => true)").collect()
    assert(rows(spark.table(s"$cat.mart.pm")
        .select(col("s"), col("n"), col("sv"))) ==
      Set(("x", 2L, 40L), ("y", 1L, 20L)))
    // incremental refreshes work again
    spark.sql(s"INSERT INTO $cat.ods.b VALUES (4, 40, 'y')")
    spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
      "table => 'mart.pm')").collect()
    assert(rows(spark.table(s"$cat.mart.pm")
        .select(col("s"), col("n"), col("sv"))) ==
      Set(("x", 2L, 40L), ("y", 2L, 60L)))
  }

  test("non-maintainable bodies refuse at CREATE; refresh on a plain table refuses") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE NAMESPACE $cat.mart")
    spark.sql(s"CREATE TABLE $cat.ods.t (k BIGINT, v BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.ods.t VALUES (1, 10, 'x')")
    def refused(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(needle),
        s"wrong refusal for [$sql]: ${e.getMessage}")
    }
    // no COUNT(*) liveness counter — COUNT(col) does not qualify (it
    // skips NULLs, so it is not a row counter)
    refused(s"CREATE MATERIALIZED VIEW $cat.mart.m1 AS " +
      s"SELECT s, sum(v) AS sv FROM $cat.ods.t GROUP BY s",
      "liveness")
    refused(s"CREATE MATERIALIZED VIEW $cat.mart.m1b AS " +
      s"SELECT s, count(v) AS n FROM $cat.ods.t GROUP BY s",
      "liveness")
    // a hidden grouping column would collapse granularity on fold
    refused(s"CREATE MATERIALIZED VIEW $cat.mart.m1c AS " +
      s"SELECT s, count(*) AS n FROM $cat.ods.t GROUP BY s, k",
      "hidden")
    // non-additive aggregate
    refused(s"CREATE MATERIALIZED VIEW $cat.mart.m2 AS " +
      s"SELECT s, count(*) AS n, avg(v) AS av FROM $cat.ods.t GROUP BY s",
      "not additive")
    // joins are out of the maintainable shape
    refused(s"CREATE MATERIALIZED VIEW $cat.mart.m3 AS " +
      s"SELECT a.s, count(*) AS n FROM $cat.ods.t a " +
      s"JOIN $cat.ods.t b ON a.k = b.k GROUP BY a.s",
      "not incrementally maintainable")
    // refresh on a table that is not an MV
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_materialized_view(" +
        "table => 'ods.t')").collect()
    }
    assert(e.getMessage.contains("not a materialized view"), e.getMessage)
  }
}
