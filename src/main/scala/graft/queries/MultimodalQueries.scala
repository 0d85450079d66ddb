package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.runtime.Tables

/** Extension tier — multimodal asset plumbing over `documents`.
  *
  * The assets are REAL encoded media (PNG / RIFF-WAVE / motion-BMP)
  * generated deterministically from `doc_id` (see
  * [[graft.operators.Multimodal]]); q28 decodes them through the JDK's
  * own codecs. The oracles never decode — they replay the generation
  * formulas in SQL and predict what a correct encode→decode round trip
  * must yield, so a hash match proves the codec path end to end.
  */
object MultimodalQueries {

  /** Per-modality asset inventory off the encode-time metadata:
    * counts, frame maxima, and width/sample-rate totals — every field
    * a pure-`doc_id` formula the oracle replays.
    */
  def q27MultimodalInventory(spark: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.assetsFromDocuments(
      Tables.load(spark, dir, "documents"))
    assets.groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_assets"),
        max(col("meta.nFrames")).as("max_frames"),
        sum(col("meta.width")).as("sum_width"),
        sum(col("meta.sampleRate")).as("sum_rate"))
  }

  val q27Oracle: String =
    """SELECT
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |                  ELSE 'video' END AS modality,
      |  count(*) AS n_assets,
      |  CAST(max(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 0
      |           ELSE 2 + doc_id % 4 END) AS INT) AS max_frames,
      |  CAST(sum(CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 17
      |           WHEN 2 THEN 8 + doc_id % 8 ELSE 0 END) AS BIGINT)
      |    AS sum_width,
      |  CAST(sum(CASE doc_id % 3 WHEN 1
      |           THEN 8000 + 4000 * ((doc_id // 3) % 3)
      |           ELSE 0 END) AS BIGINT) AS sum_rate
      |FROM documents
      |GROUP BY 1""".stripMargin

  /** Decoded features rolled up per modality — the batched
    * mapPartitions decode exercised end-to-end inside a
    * driver-checkable query. Every aggregate is an integer sum of
    * codec outputs (dimensions, frame counts, sample counts, pixel and
    * amplitude sums), so the rollup is associative and hash-exact; the
    * oracle predicts each from the `doc_id` generation formulas
    * without decoding anything. A hash match therefore certifies that
    * `javax.imageio`/`AudioSystem` recovered exactly the pixels and
    * samples that were encoded.
    */
  def q28DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.pipeline(spark,
      Tables.load(spark, dir, "documents"))
    feats.toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_decoded"),
        sum(col("width")).as("sum_width"),
        sum(col("height")).as("sum_height"),
        sum(col("n_frames")).as("sum_frames"),
        sum(col("sample_rate")).as("sum_rate"),
        sum(col("n_samples")).as("sum_samples"),
        sum(col("pix_sum")).as("pix_sum"),
        sum(col("amp_sum")).as("amp_sum"))
  }

  /** Replays Multimodal's generation formulas: image w×h grayscale
    * field (7x+13y+d)%256, audio PCM (31d+17i)%2048−1024 at rate
    * 8000+4000·((d÷3)%3), video nF frames of side 8+d%8 with field
    * (3x+5y+11f+d)%256 — summed per modality. The bounded helper
    * ranges cover the formula maxima (w≤32, h≤21, side≤15, nF≤5,
    * n≤656).
    */
  val q28Oracle: String =
    """WITH xs AS (SELECT unnest(range(0, 32)) AS v),
      |ys AS (SELECT unnest(range(0, 22)) AS v),
      |fs AS (SELECT unnest(range(0, 5)) AS v),
      |ss AS (SELECT unnest(range(0, 657)) AS v),
      |img AS (
      |  SELECT doc_id, 16 + doc_id % 17 AS w, 12 + doc_id % 11 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |img_px AS (
      |  SELECT i.doc_id, w, h,
      |    sum((7 * x.v + 13 * y.v + i.doc_id) % 256) AS pix
      |  FROM img i JOIN xs x ON x.v < i.w JOIN ys y ON y.v < i.h
      |  GROUP BY i.doc_id, w, h),
      |aud AS (
      |  SELECT doc_id, 8000 + 4000 * ((doc_id // 3) % 3) AS rate,
      |    400 + doc_id % 257 AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |aud_amp AS (
      |  SELECT a.doc_id, rate, n,
      |    sum(abs(((a.doc_id * 31 + s.v * 17) % 2048) - 1024)) AS amp
      |  FROM aud a JOIN ss s ON s.v < a.n
      |  GROUP BY a.doc_id, rate, n),
      |vid AS (
      |  SELECT doc_id, 8 + doc_id % 8 AS side, 2 + doc_id % 4 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |vid_px AS (
      |  SELECT v.doc_id, side, nf,
      |    sum((3 * x.v + 5 * y.v + 11 * f.v + v.doc_id) % 256) AS pix
      |  FROM vid v JOIN fs f ON f.v < v.nf
      |  JOIN xs x ON x.v < v.side JOIN ys y ON y.v < v.side
      |  GROUP BY v.doc_id, side, nf),
      |feats AS (
      |  SELECT 'image' AS modality, w AS width, h AS height,
      |    1 AS n_frames, 0 AS sample_rate, 0 AS n_samples, pix, 0 AS amp
      |  FROM img_px
      |  UNION ALL
      |  SELECT 'audio', 0, 0, 0, rate, n, 0, amp FROM aud_amp
      |  UNION ALL
      |  SELECT 'video', side, side, nf, 0, 0, pix, 0 FROM vid_px)
      |SELECT modality, count(*) AS n_decoded,
      |  CAST(sum(width) AS BIGINT) AS sum_width,
      |  CAST(sum(height) AS BIGINT) AS sum_height,
      |  CAST(sum(n_frames) AS BIGINT) AS sum_frames,
      |  CAST(sum(sample_rate) AS BIGINT) AS sum_rate,
      |  CAST(sum(n_samples) AS BIGINT) AS sum_samples,
      |  CAST(sum(pix) AS BIGINT) AS pix_sum,
      |  CAST(sum(amp) AS BIGINT) AS amp_sum
      |FROM feats GROUP BY modality""".stripMargin

  /** Real image resize rollup: decode every PNG, 2× area-average
    * downsample on the actual decoded pixels
    * ([[Multimodal.resizeHalfBatch]]), aggregate output dims and the
    * resized pixel mass. The oracle replays each output pixel as the
    * floor mean of its 2×2 source block over the generation field —
    * integer arithmetic end to end, so the hash match certifies the
    * decode AND the resample kernel together. Completes the
    * decode / feature-extract / RESIZE / frame-sample quartet as a
    * driver-checked query.
    */
  def q101ResizeStats(spark: SparkSession, dir: String): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    // filter to images BEFORE the encode (modalityColumn is the same
    // doc_id formula) — encoding WAV/BMP payloads just to drop them
    // would double the query's work; the salting shuffle moves bare ids
    val imageIds = Tables.load(spark, dir, "documents")
      .filter(Multimodal.modalityColumn(col("doc_id")) === "image")
      .select(col("doc_id"))
      .repartition(pmod(hash(col("doc_id")), lit(p)))
    Multimodal.resizeHalf(Multimodal.assetsFromDocuments(imageIds)).toDF()
      .agg(
        count(lit(1)).as("n_images"),
        sum(col("out_w")).as("sum_w"),
        sum(col("out_h")).as("sum_h"),
        sum(col("rpix_sum")).as("rpix_sum"))
  }

  val q101Oracle: String =
    """WITH xs AS (SELECT unnest(range(0, 16)) AS v),
      |ys AS (SELECT unnest(range(0, 11)) AS v),
      |img AS (
      |  SELECT doc_id, (16 + doc_id % 17) // 2 AS w2,
      |    (12 + doc_id % 11) // 2 AS h2
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT i.doc_id,
      |    (  (7 * (2 * x.v)     + 13 * (2 * y.v)     + i.doc_id) % 256
      |     + (7 * (2 * x.v + 1) + 13 * (2 * y.v)     + i.doc_id) % 256
      |     + (7 * (2 * x.v)     + 13 * (2 * y.v + 1) + i.doc_id) % 256
      |     + (7 * (2 * x.v + 1) + 13 * (2 * y.v + 1) + i.doc_id) % 256
      |    ) // 4 AS m
      |  FROM img i JOIN xs x ON x.v < i.w2 JOIN ys y ON y.v < i.h2)
      |SELECT a.n_images, a.sum_w, a.sum_h, b.rpix_sum
      |FROM
      |  (SELECT CAST(count(*) AS BIGINT) AS n_images,
      |          CAST(sum(w2) AS BIGINT) AS sum_w,
      |          CAST(sum(h2) AS BIGINT) AS sum_h FROM img) a,
      |  (SELECT CAST(sum(m) AS BIGINT) AS rpix_sum FROM px) b""".stripMargin

  /** q120 — brightness-histogram exposure screen over the REAL decoded
    * pixels ([[Multimodal.brightnessHistogramBatch]]): per-image 4-
    * bucket gray histograms, corpus totals, and the count of images
    * whose darkest bucket strictly dominates (the "low-light" drop
    * set an image quality filter would excise). The oracle replays
    * bucket counts over the generation field — decode fault ⇒ hash
    * break, the q101 discipline with a histogram kernel.
    */
  def q120ImageHistogram(spark: SparkSession, dir: String): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    val imageIds = Tables.load(spark, dir, "documents")
      .filter(Multimodal.modalityColumn(col("doc_id")) === "image")
      .select(col("doc_id"))
      .repartition(pmod(hash(col("doc_id")), lit(p)))
    Multimodal.brightnessHistogram(Multimodal.assetsFromDocuments(imageIds))
      .toDF()
      .agg(
        count(lit(1)).as("n_images"),
        sum(col("b0")).as("sum_b0"),
        sum(col("b1")).as("sum_b1"),
        sum(col("b2")).as("sum_b2"),
        sum(col("b3")).as("sum_b3"),
        sum((col("b0") > col("b1") && col("b0") > col("b2") &&
          col("b0") > col("b3")).cast("long")).as("n_lowlight"))
  }

  val q120Oracle: String =
    """WITH xs AS (SELECT unnest(range(0, 33)) AS v),
      |ys AS (SELECT unnest(range(0, 22)) AS v),
      |img AS (
      |  SELECT doc_id, 16 + doc_id % 17 AS w, 12 + doc_id % 11 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |pxb AS (
      |  SELECT i.doc_id, ((7 * x.v + 13 * y.v + i.doc_id) % 256) // 64 AS b
      |  FROM img i JOIN xs x ON x.v < i.w JOIN ys y ON y.v < i.h),
      |hist AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS b0,
      |    sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS b1,
      |    sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS b2,
      |    sum(CASE WHEN b = 3 THEN 1 ELSE 0 END) AS b3
      |  FROM pxb GROUP BY doc_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_images,
      |  CAST(sum(b0) AS BIGINT) AS sum_b0,
      |  CAST(sum(b1) AS BIGINT) AS sum_b1,
      |  CAST(sum(b2) AS BIGINT) AS sum_b2,
      |  CAST(sum(b3) AS BIGINT) AS sum_b3,
      |  CAST(sum(CASE WHEN b0 > b1 AND b0 > b2 AND b0 > b3
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_lowlight
      |FROM hist""".stripMargin

  /** q122 — frame-level audio activity screen over the REAL decoded
    * PCM ([[Multimodal.audioFrameStatsBatch]]): 160-sample frames,
    * energy-threshold activity counts, within-frame zero crossings —
    * the VAD-style gate an audio pipeline runs before transcription.
    * The oracle replays every sample from the generation formula
    * (window lag for the crossings); the engine reads them back
    * through `AudioSystem`.
    */
  def q122AudioFrames(spark: SparkSession, dir: String): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    val audioIds = Tables.load(spark, dir, "documents")
      .filter(Multimodal.modalityColumn(col("doc_id")) === "audio")
      .select(col("doc_id"))
      .repartition(pmod(hash(col("doc_id")), lit(p)))
    Multimodal.audioFrameStats(Multimodal.assetsFromDocuments(audioIds))
      .toDF()
      .agg(
        count(lit(1)).as("n_audio"),
        sum(col("n_frames")).as("sum_frames"),
        sum(col("n_active")).as("n_active"),
        sum(col("zcr")).as("zcr_total"))
  }

  val q122Oracle: String =
    """WITH aud AS (
      |  SELECT doc_id, 400 + doc_id % 257 AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |ss AS (SELECT unnest(range(0, 657)) AS v),
      |samp AS (
      |  SELECT a.doc_id, s.v AS i, s.v // 160 AS f,
      |    ((a.doc_id * 31 + s.v * 17) % 2048) - 1024 AS s
      |  FROM aud a JOIN ss s ON s.v < (a.n // 160) * 160),
      |lagged AS (
      |  SELECT doc_id, i, f, s,
      |    lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS ps
      |  FROM samp),
      |fr AS (
      |  SELECT doc_id, f, sum(abs(s)) AS energy,
      |    sum(CASE WHEN i % 160 > 0 AND s * ps < 0 THEN 1 ELSE 0 END) AS zcr
      |  FROM lagged GROUP BY doc_id, f)
      |SELECT CAST((SELECT count(*) FROM aud) AS BIGINT) AS n_audio,
      |  CAST(count(*) AS BIGINT) AS sum_frames,
      |  CAST(sum(CASE WHEN energy > 81920 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_active,
      |  CAST(sum(zcr) AS BIGINT) AS zcr_total
      |FROM fr""".stripMargin

  /** q178 — video frame sampling ([[Multimodal.sampleFrames]]): every
    * 2nd 256-byte window of each motion-BMP payload, full frames only.
    * The per-video audit (payload length, sampled-frame count, index
    * sum, sampled byte mass) is predicted by the oracle from the
    * container-length arithmetic alone — frames×(4-byte prefix +
    * 54-byte BMP headers + 4-padded bottom-up rows) — so the stride
    * math, the full-frame bound, AND the encoder's byte layout are all
    * on the hash path. Videos shorter than one frame must yield zero
    * sampled rows (none exist in testdata, but the right-join +
    * coalesce keeps the contract visible).
    */
  def q178FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    val ids = Tables.load(spark, dir, "documents")
      .filter(Multimodal.modalityColumn(col("doc_id")) === "video")
      .select(col("doc_id"))
      .repartition(pmod(hash(col("doc_id")), lit(p)))
    val assets = Multimodal.assetsFromDocuments(ids).toDF()
      .transform(graft.runtime.Materialize.once) // frames + length audit
    val frames = Multimodal.sampleFrames(assets, frameBytes = 256, stride = 2)
    frames.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("frame_idx").cast("long")).as("idx_sum"),
        sum(length(col("frame_bytes")).cast("long")).as("bytes_sampled"))
      .join(assets.select(col("doc_id"),
        length(col("payload")).cast("long").as("payload_len")),
        Seq("doc_id"), "right")
      .select(col("doc_id"), col("payload_len"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("idx_sum"), lit(0L)).as("idx_sum"),
        coalesce(col("bytes_sampled"), lit(0L)).as("bytes_sampled"))
  }

  val q178Oracle: String =
    """WITH v AS (
      |  SELECT doc_id, 2 + doc_id % 4 AS frames, 8 + doc_id % 8 AS side
      |  FROM documents WHERE doc_id % 3 = 2),
      |len AS (
      |  SELECT doc_id,
      |    frames * (4 + 54 + ((3 * side + 3) // 4) * 4 * side)
      |      AS payload_len
      |  FROM v),
      |samp AS (
      |  SELECT doc_id, payload_len,
      |    CASE WHEN payload_len >= 256
      |         THEN (payload_len - 256) // 512 + 1 ELSE 0 END AS n
      |  FROM len)
      |SELECT doc_id, CAST(payload_len AS BIGINT) AS payload_len,
      |  CAST(n AS BIGINT) AS n_frames,
      |  CAST(n * (n - 1) // 2 AS BIGINT) AS idx_sum,
      |  CAST(n * 256 AS BIGINT) AS bytes_sampled
      |FROM samp""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_multimodal_inventory" -> (q27MultimodalInventory _),
    "q28_decode_features" -> (q28DecodeFeatures _),
    "q101_resize_stats" -> (q101ResizeStats _),
    "q120_image_histogram" -> (q120ImageHistogram _),
    "q122_audio_frames" -> (q122AudioFrames _),
    "q178_frame_sample" -> (q178FrameSample _))

  val oracles: Map[String, String] = Map(
    "q27_multimodal_inventory" -> q27Oracle,
    "q28_decode_features" -> q28Oracle,
    "q101_resize_stats" -> q101Oracle,
    "q120_image_histogram" -> q120Oracle,
    "q122_audio_frames" -> q122Oracle,
    "q178_frame_sample" -> q178Oracle)
}
