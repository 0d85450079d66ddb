package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.OracleIdioms.bi
import graft.runtime.{Catalog, Tables}

/** Driver-oracle coverage for the relational CATALOG components that
  * were previously spec-only (VERDICT r07 item 6): row-level MERGE,
  * schema-evolution reads, and multi-format storage round-trips. Each
  * query builds a throwaway catalog under java tmp, drives the real
  * component against testdata-derived frames, and emits a result DuckDB
  * can recompute from the raw parquet alone — so the driver's
  * correctness gate now checks these code paths end to end, not just
  * the ScalaTest specs (CatalogSpec / MergeSpec /
  * MultiFormatCatalogSpec, which keep the crash-injection and
  * edge-case coverage SQL can't express).
  */
object CatalogQueries {

  private def scratch(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** q159 — row-level MERGE (upsert + delete) through
    * [[graft.runtime.Catalog.merge]]: customers' balances are the
    * target; every 7th key is an update (of which every 21st is a
    * delete), every 13th key spawns a brand-new inserted row. The
    * emitted frame is the post-merge table — so matched-replace,
    * matched-delete, unmatched-insert, and untouched-keep all land in
    * the compare.
    *
    * Scale shape: the merge itself is the production path (anti-join
    * keep + union, safeSwapWrite); nothing here collects. Deterministic
    * arithmetic only (key modulo), so both engines agree exactly.
    */
  def q159MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val cat = Catalog(spark, scratch("graft-q159"))
    val base = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"),
        expr("cast(round(c_acctbal * 100) as long)").as("bal_cents"),
        col("c_mktsegment").as("seg"))
    cat.createOrReplace(base, "ods", "balances")
    val updates = base.filter(col("k") % 7 === 0)
      .select(col("k"), (col("k") * 100).as("bal_cents"), col("seg"),
        (col("k") % 21 === 0).as("del"))
      .unionByName(base.filter(col("k") % 13 === 0)
        .select((col("k") + 10000000L).as("k"), col("k").as("bal_cents"),
          lit("NEW").as("seg"), lit(false).as("del")))
    cat.merge(updates, "ods", "balances", keyCols = Seq("k"),
      deleteCol = Some("del"))
    cat.read("ods", "balances").select(col("k"), col("bal_cents"), col("seg"))
  }

  val q159Oracle: String =
    """WITH base AS (
      |  SELECT c_custkey AS k,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
      |    c_mktsegment AS seg
      |  FROM customer),
      |upd AS (
      |  SELECT k, CAST(k * 100 AS BIGINT) AS bal_cents, seg,
      |    (k % 21 = 0) AS del
      |  FROM base WHERE k % 7 = 0
      |  UNION ALL
      |  SELECT k + 10000000, CAST(k AS BIGINT), 'NEW', false
      |  FROM base WHERE k % 13 = 0)
      |SELECT b.k, b.bal_cents, b.seg FROM base b
      |WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.k = b.k)
      |UNION ALL
      |SELECT k, bal_cents, seg FROM upd WHERE NOT del""".stripMargin

  /** q160 — schema-evolution read through
    * [[graft.runtime.Catalog.readMerged]]: half the orders land with
    * the original two-column schema, the other half append later with
    * an extra `price_cents` column; the mergeSchema read must surface
    * the union schema with nulls for the pre-evolution files. This is
    * the storage-layer twin of the ingest tier's `Normalize` drift
    * handling.
    */
  def q160SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val cat = Catalog(spark, scratch("graft-q160"))
    val orders = Tables.load(spark, dir, "orders")
    cat.createOrReplace(
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("cust")),
      "ods", "evolved")
    cat.append(
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"),
          expr("cast(round(o_totalprice * 100) as long)").as("price_cents")),
      "ods", "evolved", partitionCols = Nil)
    cat.readMerged("ods", "evolved")
      .select(col("k"), col("cust"), col("price_cents"))
  }

  val q160Oracle: String =
    """SELECT o_orderkey AS k, o_custkey AS cust,
      |  CAST(NULL AS BIGINT) AS price_cents
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey,
      |  CAST(round(o_totalprice * 100) AS BIGINT)
      |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin

  /** q161 — multi-format storage round-trip: the same nation frame is
    * written and read back through every format the catalog supports
    * (parquet, orc, json, csv — csv via header + schema inference),
    * and each round-trip must preserve row count, key sum, and name
    * character mass exactly. Exercises the per-format reader/writer
    * option wiring that only MultiFormatCatalogSpec touched before.
    */
  def q161Multiformat(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    Catalog.Formats.toSeq.sorted.map { fmt =>
      val cat = Catalog(spark, scratch(s"graft-q161-$fmt"), format = fmt)
      cat.createOrReplace(nation, "ods", "nation")
      cat.read("ods", "nation").agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_nationkey").cast("long")).as("key_sum"),
        sum(length(col("n_name")).cast("long")).as("name_chars"))
        .withColumn("fmt", lit(fmt))
        .select(col("fmt"), col("n_rows"), col("key_sum"), col("name_chars"))
    }.reduce(_ unionByName _)
  }

  val q161Oracle: String =
    s"""SELECT f.fmt, ${bi("count(*)")} AS n_rows,
       |  ${bi("sum(n_nationkey)")} AS key_sum,
       |  ${bi("sum(length(n_name))")} AS name_chars
       |FROM nation, (VALUES ('csv'), ('json'), ('orc'), ('parquet')) f(fmt)
       |GROUP BY f.fmt""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_merge_upsert" -> (q159MergeUpsert _),
    "q160_schema_evolution" -> (q160SchemaEvolution _),
    "q161_multiformat" -> (q161Multiformat _))

  val oracles: Map[String, String] = Map(
    "q159_merge_upsert" -> q159Oracle,
    "q160_schema_evolution" -> q160Oracle,
    "q161_multiformat" -> q161Oracle)
}
