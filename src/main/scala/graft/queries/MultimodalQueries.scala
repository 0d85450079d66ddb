package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.runtime.Tables

/** Extension tier — multimodal asset plumbing over `documents`.
  *
  * q27's oracle checks the relational skeleton (modality assignment,
  * binary payload sizes) that any decoder-equipped pipeline shares; the
  * stubbed feature values themselves are covered by MultimodalSpec.
  */
object MultimodalQueries {

  /** Per-modality asset inventory: counts + byte totals off the binary
    * payload column (octet lengths survive the text→binary cast
    * identically in any engine).
    */
  def q27MultimodalInventory(spark: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.assetsFromDocuments(
      Tables.load(spark, dir, "documents"))
    assets.groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("payload"))).as("total_bytes"),
        max(col("meta.nFrames")).as("max_frames"))
  }

  val q27Oracle: String =
    """SELECT
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |                  ELSE 'video' END AS modality,
      |  count(*) AS n_assets,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  max(CAST(ceil(octet_length(encode(text)) / 32.0) AS INT)) AS max_frames
      |FROM documents
      |GROUP BY 1""".stripMargin

  /** Decoded (stub) features rolled up per modality — exercises the
    * batched mapPartitions path end-to-end inside a driver-checkable
    * query (rows-only: feature math is the stub's).
    */
  def q28DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.pipeline(spark,
      Tables.load(spark, dir, "documents"))
    feats.toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_decoded"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(element_at(col("features"), 1).cast("double")).as("sum_f0"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_multimodal_inventory" -> (q27MultimodalInventory _),
    "q28_decode_features" -> (q28DecodeFeatures _))

  val oracles: Map[String, String] = Map(
    "q27_multimodal_inventory" -> q27Oracle)
}
