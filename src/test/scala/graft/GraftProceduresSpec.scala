package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** SQL-addressable maintenance via DSv2 stored procedures
  * ([[graft.sources.GraftProcedures]]): `CALL cat.system.analyze`,
  * `CALL cat.system.compact`, `CALL cat.system.compact_partitions` —
  * the Iceberg/Trino maintenance addressing mode, driven end-to-end
  * through `spark.sql`. Each test asserts both the returned result
  * rows (the procedure's evidence) and the on-disk/planning effect.
  */
class GraftProceduresSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gpr${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-pr-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) {
      case b: BatchScanExec =>
        b.partitions.flatten.map {
          case fp: FilePartition => fp.files.length
          case _ => 0
        }.sum
    }.sum

  test("CALL system.analyze builds the skipping manifest from SQL") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (id BIGINT, v BIGINT)")
    (0 until 3).foreach { b =>
      (b * 10 until b * 10 + 10).map(i => (i.toLong, i.toLong * 2))
        .toDF("id", "v").coalesce(1).createOrReplaceTempView("gpr_src")
      spark.sql(s"INSERT INTO $cat.ods.t SELECT * FROM gpr_src")
    }
    val r = spark.sql(s"CALL $cat.system.analyze('ods.t')").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(3))
    // and the manifest actually prunes
    val q = spark.table(s"$cat.ods.t").where(col("id") === 15)
    assert(q.count() == 1)
    assert(scannedFiles(q) == 1)
    // incremental: nothing new to analyze
    assert(spark.sql(s"CALL $cat.system.analyze('ods.t')")
      .collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("CALL system.compact collapses files and reports before/after") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.t (id BIGINT, v BIGINT)")
    (0 until 5).foreach { b =>
      Seq((b.toLong, b.toLong)).toDF("id", "v").coalesce(1)
        .createOrReplaceTempView("gpr_src2")
      spark.sql(s"INSERT INTO $cat.ods.t SELECT * FROM gpr_src2")
    }
    val r = spark.sql(s"CALL $cat.system.compact('ods.t')").collect()
    assert(r.length == 1)
    val (before, after) = (r(0).getInt(0), r(0).getInt(1))
    assert(before == 5 && after < before, s"before=$before after=$after")
    assert(spark.table(s"$cat.ods.t").count() == 5)
  }

  test("CALL system.compact_partitions rewrites only accreted partitions") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    spark.sql(s"CREATE TABLE $cat.ods.p (id BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    // day=a accretes 4 files; day=b stays at 1
    (0 until 4).foreach { i =>
      Seq((i.toLong, "a")).toDF("id", "day").coalesce(1)
        .createOrReplaceTempView("gpr_src3")
      spark.sql(s"INSERT INTO $cat.ods.p SELECT * FROM gpr_src3")
    }
    Seq((100L, "b")).toDF("id", "day").coalesce(1)
      .createOrReplaceTempView("gpr_src3")
    spark.sql(s"INSERT INTO $cat.ods.p SELECT * FROM gpr_src3")

    val r = spark.sql(
      s"CALL $cat.system.compact_partitions('ods.p', min_files => 4)")
      .collect()
    assert(r.map(_.getString(0)).toSeq == Seq("day=a"))
    assert(spark.table(s"$cat.ods.p").count() == 5)
    // default threshold, nothing left to do: zero rows
    assert(spark.sql(
      s"CALL $cat.system.compact_partitions('ods.p')").collect().isEmpty)
  }

  test("SHOW PROCEDURES lists the system namespace; DESCRIBE works") {
    val (cat, _) = freshCatalog()
    val names = spark.sql(s"SHOW PROCEDURES IN $cat.system")
      .select("procedure_name").as[String].collect().toSet
    assert(Set("analyze", "compact", "compact_partitions").subsetOf(names),
      names.toString)
    val desc = spark.sql(s"DESCRIBE PROCEDURE $cat.system.analyze")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("analyze"))
  }
}
