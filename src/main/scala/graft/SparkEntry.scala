package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CatalogQueries, CorpusQueries, CurationQueries, DedupQueries, EventQueries, MultimodalQueries, Parity, PipelineQueries, RelationalQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Parity.q14CteFlagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Parity.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++ EventQueries.all ++
      RelationalQueries.all ++ PipelineQueries.all ++ CorpusQueries.all ++
      CatalogQueries.all ++ CurationQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Parity.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ MultimodalQueries.oracles ++
      EventQueries.oracles ++ RelationalQueries.oracles ++
      PipelineQueries.oracles ++ CorpusQueries.oracles ++
      CatalogQueries.oracles ++ CurationQueries.oracles
}
