package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.runtime.Tables

/** Parity-tier queries: one entry per operator family from SURVEY.md §2,
  * re-expressed over the driver's TPC-H-ish testdata so each has a DuckDB
  * oracle twin.
  *
  * Float-determinism rule: any SUM over a non-integral double column goes
  * through decimal(18,2) so the aggregation is exact and order-independent
  * (Spark and DuckDB then produce bit-identical doubles). SUMs over
  * integral-valued doubles (l_quantity) are already exact in FP.
  */
object Parity {

  /** A1 — hash aggregate, multi-sum + count (process_covid_ods.py:61-69). */
  def q01Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n_rows"))
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin
}
