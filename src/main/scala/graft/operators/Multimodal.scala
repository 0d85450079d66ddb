package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in batched
  * partition-local passes.
  *
  * The decode itself is a STUB (no image/audio codecs in this
  * environment): `decodeStub` derives deterministic fake features from
  * the payload bytes. Everything around it — the asset schema, the
  * binary column, the batch shape (decoders amortize model/codec setup
  * across a batch, exactly like a pandas-UDF batch), the per-modality
  * partitioning, frame sampling — is real Spark plumbing and is tested.
  *
  * Scale notes: assets never leave executors (no collect); feature
  * extraction is mapPartitions over batches, so a real codec/model
  * drop-in changes only `decodeBatch`; frame sampling is pure built-ins
  * (substr over binary + explode).
  */
object Multimodal {

  final case class AssetMeta(contentType: String, width: Int, height: Int,
                             sampleRate: Int, nFrames: Int)
  final case class Asset(doc_id: Long, modality: String,
                         payload: Array[Byte], meta: AssetMeta)
  final case class AssetFeatures(doc_id: Long, modality: String,
                                 n_bytes: Long, features: Array[Float])

  /** Deterministic synthetic assets from the documents table: payload =
    * UTF-8 text bytes standing in for encoded media; modality cycles by
    * doc_id; metadata is derived from payload size the way a real
    * probe/ffprobe step would fill it.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("modality"),
      col("text").cast("binary").as("payload"))
      .withColumn("meta", struct(
        // derive from the modality column — the doc_id→modality cycle
        // is defined in exactly one place above
        concat(lit("application/x-fake-"), col("modality")).as("contentType"),
        (length(col("payload")) % 640).cast("int").as("width"),
        (length(col("payload")) % 480).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        ceil(length(col("payload")) / 32.0).cast("int").as("nFrames")))

  /** STUB decode of one batch: in a real pipeline this is the codec /
    * model-inference call (decode JPEG, resample PCM, embed frames).
    * Here: an 8-dim deterministic byte-statistics vector. The batch
    * signature is the point — a drop-in real decoder keeps it.
    */
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
    batch.map { a =>
      val bytes = a.payload
      val n = bytes.length.max(1)
      val hist = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) % 8) += 1.0f
        i += 1
      }
      var j = 0
      while (j < 8) { hist(j) = hist(j) / n; j += 1 }
      AssetFeatures(a.doc_id, a.modality, bytes.length.toLong, hist)
    }

  /** Batched partition-local feature extraction: iterator → fixed-size
    * batches → decodeBatch → flat iterator. Nothing is collected; batch
    * size bounds decoder memory exactly like a pandas-UDF batch size.
    */
  def decodeStub(assets: Dataset[Asset], batchSize: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeBatch(b.toSeq))
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * chunk as a frame row — pure built-ins (substr on binary + explode),
    * no UDF, codegen-friendly. Only FULL frames are emitted (the index
    * bound is the last offset with frameBytes available): a fixed-size
    * frame decoder downstream must never receive a truncated tail.
    * Payloads shorter than one frame yield no rows.
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    assets.filter(col("modality") === "video")
      .filter(length(col("payload")) >= frameBytes)
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          floor((length(col("payload")) - frameBytes) / (frameBytes * stride))
            .cast("int"))))
      .select(
        col("doc_id"), col("frame_idx"),
        expr(s"substr(payload, frame_idx * $frameBytes * $stride + 1, $frameBytes)")
          .as("frame_bytes"))

  /** End-to-end: documents → assets → features. Hashing on the bare
    * 3-value modality key would cap the whole decode at 3 tasks
    * regardless of cluster size, so the shuffle key is (modality,
    * doc_id-derived salt) — every core gets work. A partition may then
    * hold several (modality, salt) cells; sortWithinPartitions keeps
    * rows modality-contiguous so decode batches stay homogeneous (codec
    * state swaps at most twice per partition, not per batch).
    */
  def pipeline(spark: SparkSession, docs: DataFrame,
               batchSize: Int = 64): Dataset[AssetFeatures] = {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val assets = assetsFromDocuments(docs)
      .repartition(col("modality"), pmod(hash(col("doc_id")), lit(p)))
      .sortWithinPartitions(col("modality"))
      .as[Asset]
    decodeStub(assets, batchSize)
  }
}
