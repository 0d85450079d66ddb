package graft.layers

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions.col
import graft.runtime.Catalog
import graft.schema.Schemas

/** Population dimension source: conditional initial load from a
  * federated store (SURVEY §2.9 C4 + §2.1 S3).
  *
  * The reference seeds `raw.country_population` from PostgreSQL through
  * a Trino federated catalog only when the target is missing or empty
  * (population_to_s3.py:10-21,53-70). Spark-natively the federated scan
  * is a JDBC source ([[jdbcReader]]); the seed-once branch is the same
  * count-gated conditional. `source` is call-by-name so the external
  * read is not even planned on the no-op path.
  */
object PopulationLayer {
  val layer = "raw"
  val table = "country_population"

  /** Production-shaped federated reader (not executable in the sandbox —
    * no database — but this is the exact scan the seed would run).
    * Partitioning note: a population dim is small; a single-partition
    * JDBC read is correct. For large federated tables add
    * partitionColumn/lowerBound/upperBound/numPartitions.
    */
  def jdbcReader(spark: SparkSession, url: String, dbtable: String,
                 user: String, password: String): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("user", user)
      .option("password", password)

  /** C4: seed the population table only if missing or empty. Returns
    * true when the seed ran. The source is conformed to the canonical
    * column set so drift in the federated schema cannot leak downstream.
    */
  def seedIfEmpty(cat: Catalog, source: => DataFrame): Boolean = {
    val needsSeed = !cat.tableExists(layer, table) ||
      cat.table(layer, table).isEmpty
    if (needsSeed) {
      val conformed = source.select(
        Schemas.countryPopulation.fieldNames.map(col).toIndexedSeq: _*)
      cat.createOrReplaceByName(conformed, layer, table)
    }
    needsSeed
  }
}
