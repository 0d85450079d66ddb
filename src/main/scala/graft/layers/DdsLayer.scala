package graft.layers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.runtime.Catalog

/** dds layer: star schema — `dim_location` + `fact_covid`.
  *
  * Re-expresses `process_covid_dds.py:32-93`:
  *  - dim_location: deterministic sha-256 surrogate key over
  *    `upper(trim(country)) || year` (F10), `distinct()` dedup (A2),
  *    full `createOrReplace` rebuild each run (S7);
  *  - fact: ods rows for the run date (P4, C3 short-circuit), enriched
  *    with `report_year` (F11), LEFT-joined to the dim on the compound
  *    (country name, year) key (J1) — the dim is countries×years, so it
  *    is explicitly `broadcast()`: at 100 TB the fact side never
  *    shuffles for this join;
  *  - join-miss audit counting null surrogate keys (J4, P5);
  *  - idempotent dynamic partition overwrite on `report_date` (S6).
  */
object DdsLayer {
  val layer = "dds"
  val dimTable = "dim_location"
  val factTable = "fact_covid"

  /** Population source → dim_location (process_covid_dds.py:34-39). */
  def buildDim(population: DataFrame): DataFrame =
    population.select(
      graft.functions.Exprs.surrogateKey(col("country"), col("year"))
        .as("location_key"),
      col("country").as("country_name"),
      col("year").as("population_year"),
      col("population"))
      .distinct()

  /** ods slice + dim → fact rows (process_covid_dds.py:56-73). */
  def buildFact(ods: DataFrame, dim: DataFrame): DataFrame = {
    val enriched = ods.withColumn("report_year", year(col("report_date")))
    enriched.join(
        broadcast(dim),
        enriched("country_region") === dim("country_name") &&
          enriched("report_year") === dim("population_year"),
        "left")
      .select(
        col("report_date"), col("location_key"),
        col("confirmed"), col("deaths"), col("recovered"), col("active"),
        col("ingestion_ts"))
  }

  /** Returns Some(missingJoinCount) if the partition was written, None if
    * the ods slice was empty (C3).
    */
  def run(cat: Catalog, reportDate: String): Option[Long] = {
    // No population source yet (the reference's DAG guarantees its seed
    // ran first; a fresh warehouse here may not have) → nothing to
    // build, and crashing the whole day-run would block the raw/ods
    // layers that don't need the dim.
    if (!cat.tableExists(PopulationLayer.layer, PopulationLayer.table)) return None
    // Rebuilt unconditionally, matching process_covid_dds.py:41-44 (the
    // reference rebuilds the dim before its empty-ODS short-circuit).
    val dim = buildDim(cat.table(PopulationLayer.layer, PopulationLayer.table))
    cat.createOrReplaceByName(dim, layer, dimTable)

    if (!cat.tableExists(OdsLayer.layer, OdsLayer.table)) return None
    val ods = cat.table(OdsLayer.layer, OdsLayer.table)
      .filter(col("report_date") === lit(reportDate).cast("date"))
    if (ods.isEmpty) return None

    val fact = buildFact(ods, cat.table(layer, dimTable))
    val missing = fact.filter(col("location_key").isNull).count()
    cat.overwritePartitionsByName(fact, layer, factTable, Seq("report_date"))
    Some(missing)
  }
}
