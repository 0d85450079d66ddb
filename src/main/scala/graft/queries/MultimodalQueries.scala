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
    * query. The stub's byte-histogram feature is deterministic byte
    * statistics, so the oracle recomputes it in SQL and the whole
    * decode path is hash-match checked. The per-row feature value is
    * QUANTIZED to integer millionths before summing: a raw float sum is
    * order-dependent across partitions, while a sum of exact integers
    * is associative — the aggregate is identical however either engine
    * schedules it. (round() is half-up in both engines for the
    * non-negative values here; DuckDB REAL arithmetic is IEEE float32,
    * verified to match the stub's Float division exactly.)
    */
  def q28DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.pipeline(spark,
      Tables.load(spark, dir, "documents"))
    feats.toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_decoded"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(round(element_at(col("features"), 1).cast("double") * 1e6)
          .cast("long")).as("sum_f0_millionths"))
  }

  /** Replays decodeBatch's first histogram bucket: count of payload
    * bytes ≡ 0 (mod 8) over max(n_bytes, 1), as float32 — then the same
    * millionths quantization as the Spark side. ascii(char) = byte for
    * this ASCII corpus (the same contract PackedNgrams documents).
    */
  val q28Oracle: String =
    """WITH f AS (
      |  SELECT
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |                    ELSE 'video' END AS modality,
      |    octet_length(encode(text)) AS n_bytes,
      |    CAST(len(list_filter(range(1, length(text)+1),
      |                         i -> ascii(text[i]) % 8 = 0)) AS REAL)
      |      / CAST(greatest(octet_length(encode(text)), 1) AS REAL) AS f0
      |  FROM documents)
      |SELECT modality, count(*) AS n_decoded,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(sum(CAST(round(CAST(f0 AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
      |    AS sum_f0_millionths
      |FROM f GROUP BY modality""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_multimodal_inventory" -> (q27MultimodalInventory _),
    "q28_decode_features" -> (q28DecodeFeatures _))

  val oracles: Map[String, String] = Map(
    "q27_multimodal_inventory" -> q27Oracle,
    "q28_decode_features" -> q28Oracle)
}
