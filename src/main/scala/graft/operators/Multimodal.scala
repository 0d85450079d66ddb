package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in batched
  * partition-local passes.
  *
  * The DECODE is real: images are genuine PNGs read back through
  * `javax.imageio`, audio is genuine RIFF/WAVE PCM read back through
  * `javax.sound.sampled.AudioSystem`, video is a motion-BMP container
  * (length-prefixed 24-bit BMP frames) whose frames decode through
  * `javax.imageio` — all JDK-native codecs, no external dependencies.
  * Only the payload SOURCE is synthetic (the environment has no media
  * files): [[assetsFromDocuments]] encodes each asset deterministically
  * from `doc_id` alone, so an independent engine can predict exactly
  * what a correct encode→decode round trip must yield. That prediction
  * IS the oracle contract: every formula below is replayed in DuckDB
  * SQL by the q27/q28 oracles, and a hash match proves the codec path
  * extracted precisely the dimensions/samples/pixels that were encoded.
  *
  * Scale notes: assets never leave executors (no collect); encode and
  * feature extraction are mapPartitions over batches, so swapping the
  * synthetic source for real object-store bytes changes only the asset
  * producer; frame sampling is pure built-ins (substr over binary +
  * explode).
  */
object Multimodal {

  final case class AssetMeta(contentType: String, width: Int, height: Int,
                             sampleRate: Int, nFrames: Int)
  final case class Asset(doc_id: Long, modality: String,
                         payload: Array[Byte], meta: AssetMeta)

  /** Decoded features. Integer-exact by construction: dimensions and
    * counts come from the codec, `pix_sum`/`amp_sum` are integer sums
    * over decoded samples — associative, so partition order can never
    * change an aggregate over them.
    */
  final case class AssetFeatures(doc_id: Long, modality: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 n_frames: Int, sample_rate: Int,
                                 n_samples: Long, pix_sum: Long,
                                 amp_sum: Long)

  // ---- deterministic generation formulas (the oracle contract) ----
  // Every value below is a pure function of doc_id; the q27/q28 DuckDB
  // oracles replay these same expressions in SQL. Change one side only
  // and the hash check fails — that coupling is deliberate.
  def modalityOf(d: Long): String = (d % 3) match {
    case 0 => "image"; case 1 => "audio"; case _ => "video"
  }
  /** Column twin of [[modalityOf]] — lets queries partition or filter
    * by modality BEFORE the (now codec-priced) encode runs, from the
    * same single definition of the cycle.
    */
  def modalityColumn(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(lit(Array("image", "audio", "video")),
      (docId % 3).cast("int") + 1)
  def imageW(d: Long): Int = 16 + (d % 17).toInt
  def imageH(d: Long): Int = 12 + (d % 11).toInt
  def imageGray(d: Long, x: Int, y: Int): Int = ((7L * x + 13L * y + d) % 256L).toInt
  def audioRate(d: Long): Int = 8000 + 4000 * ((d / 3) % 3).toInt
  def audioN(d: Long): Int = 400 + (d % 257).toInt
  def audioSample(d: Long, i: Int): Int = ((d * 31 + i.toLong * 17) % 2048L).toInt - 1024
  def videoFrames(d: Long): Int = 2 + (d % 4).toInt
  def videoSide(d: Long): Int = 8 + (d % 8).toInt
  def videoGray(d: Long, f: Int, x: Int, y: Int): Int =
    ((3L * x + 5L * y + 11L * f + d) % 256L).toInt

  // ImageIO's default disk-backed stream cache would add a temp-file
  // write per encode/decode on every executor — pure memory streams
  // don't need it
  javax.imageio.ImageIO.setUseCache(false)

  /** 8-bit grayscale PNG of the deterministic pixel field. PNG is
    * lossless and `TYPE_BYTE_GRAY` raster samples round-trip exactly,
    * so the decode can be held to equality, not tolerance.
    */
  private def encodePng(d: Long): Array[Byte] = {
    val (w, h) = (imageW(d), imageH(d))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, imageGray(d, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Canonical 44-byte-header RIFF/WAVE, PCM signed 16-bit LE mono. */
  private def encodeWav(d: Long): Array[Byte] = {
    val rate = audioRate(d)
    val n = audioN(d)
    val dataBytes = n * 2
    val bb = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) { bb.putShort(audioSample(d, i).toShort); i += 1 }
    bb.array()
  }

  /** Motion-BMP container: each frame a 24-bit BMP (lossless,
    * JDK-decodable) prefixed by its big-endian int32 byte length.
    */
  private def encodeMbmp(d: Long): Array[Byte] = {
    val side = videoSide(d)
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    var f = 0
    while (f < videoFrames(d)) {
      val img = new BufferedImage(side, side, BufferedImage.TYPE_3BYTE_BGR)
      val raster = img.getRaster
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val g = videoGray(d, f, x, y)
          raster.setSample(x, y, 0, g)
          raster.setSample(x, y, 1, g)
          raster.setSample(x, y, 2, g)
          x += 1
        }
        y += 1
      }
      val frame = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", frame)
      val bytes = frame.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** One asset per document, encoded on the executor from `doc_id`
    * alone (the only column read — column pruning keeps `text` out of
    * the scan). Metadata carries the encode-time ground truth; the
    * decode never reads it.
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { d =>
      modalityOf(d) match {
        case "image" =>
          Asset(d, "image", encodePng(d),
            AssetMeta("image/png", imageW(d), imageH(d), 0, 1))
        case "audio" =>
          Asset(d, "audio", encodeWav(d),
            AssetMeta("audio/wav", 0, 0, audioRate(d), 0))
        case _ =>
          Asset(d, "video", encodeMbmp(d),
            AssetMeta("video/x-mbmp", videoSide(d), videoSide(d), 0,
              videoFrames(d)))
      }
    })
  }

  private def sumBand0(img: BufferedImage): Long = {
    val raster = img.getRaster
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { s += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    s
  }

  /** Real decode of one asset via JDK codecs. Decode failures throw —
    * a corrupt payload must fail the job loudly, never count as a
    * zero-feature row.
    */
  def decodeOne(a: Asset): AssetFeatures = a.modality match {
    case "image" =>
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(a.payload))
      require(img != null, s"undecodable image payload for doc ${a.doc_id}")
      AssetFeatures(a.doc_id, a.modality, a.payload.length.toLong,
        img.getWidth, img.getHeight, 1, 0, 0L, sumBand0(img), 0L)
    case "audio" =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(a.payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected audio format $fmt for doc ${a.doc_id}")
      val pcm = ais.readAllBytes()
      var amp = 0L
      var i = 0
      while (i + 1 < pcm.length) {
        val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
        amp += math.abs(s.toLong)
        i += 2
      }
      AssetFeatures(a.doc_id, a.modality, a.payload.length.toLong,
        0, 0, 0, fmt.getSampleRate.toInt, ais.getFrameLength, 0L, amp)
    case _ =>
      val in = new java.io.DataInputStream(new ByteArrayInputStream(a.payload))
      var frames = 0
      var (w, h) = (0, 0)
      var pix = 0L
      while (in.available() > 0) {
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
        require(img != null, s"undecodable frame $frames for doc ${a.doc_id}")
        w = img.getWidth; h = img.getHeight
        pix += sumBand0(img)
        frames += 1
      }
      AssetFeatures(a.doc_id, a.modality, a.payload.length.toLong,
        w, h, frames, 0, 0L, pix, 0L)
  }

  /** Decode one batch — the codec/model-inference unit. The batch
    * signature is the point: a GPU model swap amortizes setup across
    * the batch exactly like a pandas-UDF batch.
    */
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] = batch.map(decodeOne)

  /** Batched partition-local feature extraction: iterator → fixed-size
    * batches → decodeBatch → flat iterator. Nothing is collected; batch
    * size bounds decoder memory exactly like a pandas-UDF batch size.
    */
  def decode(assets: Dataset[Asset], batchSize: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeBatch(b.toSeq))
    }
  }

  final case class ResizedImage(doc_id: Long, out_w: Int, out_h: Int,
                                rpix_sum: Long)

  /** Real image RESIZE: decode the PNG and 2× downsample by exact
    * 2×2-block integer area averaging (floor mean). Integer math keeps
    * the result independently predictable — the oracle replays each
    * output pixel as `(g00+g01+g10+g11) div 4` over the generation
    * field — while the pixels themselves come from the actual decoded
    * image, so a codec fault breaks the hash match. Odd trailing
    * rows/columns are cropped (floor dims), the convention fixed-ratio
    * thumbnailers use. Same batched partition-local shape as
    * [[decode]]; non-images pass through as no rows.
    */
  def resizeHalfBatch(batch: Seq[Asset]): Seq[ResizedImage] =
    batch.filter(_.modality == "image").map { a =>
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(a.payload))
      require(img != null, s"undecodable image payload for doc ${a.doc_id}")
      val raster = img.getRaster
      val (w2, h2) = (img.getWidth / 2, img.getHeight / 2)
      var s = 0L
      var by = 0
      while (by < h2) {
        var bx = 0
        while (bx < w2) {
          val m = (raster.getSample(2 * bx, 2 * by, 0) +
            raster.getSample(2 * bx + 1, 2 * by, 0) +
            raster.getSample(2 * bx, 2 * by + 1, 0) +
            raster.getSample(2 * bx + 1, 2 * by + 1, 0)) / 4
          s += m
          bx += 1
        }
        by += 1
      }
      ResizedImage(a.doc_id, w2, h2, s)
    }

  /** Batched resize over an asset dataset — the feature-extraction
    * batch shape with a resize kernel instead of a stats kernel.
    */
  def resizeHalf(assets: Dataset[Asset], batchSize: Int = 64): Dataset[ResizedImage] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => resizeHalfBatch(b.toSeq))
    }
  }

  final case class ImageHistogram(doc_id: Long, b0: Long, b1: Long,
                                  b2: Long, b3: Long)

  /** Brightness histogram over the ACTUAL decoded pixels: 4 buckets of
    * 64 gray levels (g >> 6) — the exposure-screen primitive an image
    * quality filter runs before training (all-dark / blown-out frames
    * concentrate in the extreme buckets). Integer bucketing keeps the
    * oracle replayable over the generation field while the counts come
    * from the decoder, so a codec fault breaks the hash. Same batched
    * partition-local shape as [[decode]]; non-images emit no rows.
    */
  def brightnessHistogramBatch(batch: Seq[Asset]): Seq[ImageHistogram] =
    batch.filter(_.modality == "image").map { a =>
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(a.payload))
      require(img != null, s"undecodable image payload for doc ${a.doc_id}")
      val raster = img.getRaster
      val counts = new Array[Long](4)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          counts(raster.getSample(x, y, 0) >> 6) += 1L
          x += 1
        }
        y += 1
      }
      ImageHistogram(a.doc_id, counts(0), counts(1), counts(2), counts(3))
    }

  def brightnessHistogram(assets: Dataset[Asset],
                          batchSize: Int = 64): Dataset[ImageHistogram] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => brightnessHistogramBatch(b.toSeq))
    }
  }

  final case class AudioFrames(doc_id: Long, n_frames: Long,
                               n_active: Long, zcr: Long)

  /** Frame-level audio features over the ACTUAL decoded PCM: 160-sample
    * frames (full frames only), per-frame energy Σ|s| with an activity
    * threshold of mean |s| > 512 (half the sample range — the
    * voice-activity-detection screen shape), and the within-frame
    * zero-crossing count (s·s_prev < 0). All integer, so the oracle
    * replays every frame from the generation formula while the samples
    * come from `AudioSystem` — a codec fault breaks the hash.
    */
  def audioFrameStatsBatch(batch: Seq[Asset],
                           frame: Int = 160): Seq[AudioFrames] =
    batch.filter(_.modality == "audio").map { a =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(a.payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected audio format $fmt for doc ${a.doc_id}")
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      def s(i: Int): Int = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      val nf = n / frame
      var active = 0L
      var zcr = 0L
      var f = 0
      while (f < nf) {
        var energy = 0L
        var j = f * frame
        val end = j + frame
        while (j < end) {
          energy += math.abs(s(j).toLong)
          if (j > f * frame && s(j) * s(j - 1) < 0) zcr += 1L
          j += 1
        }
        if (energy > 512L * frame) active += 1L
        f += 1
      }
      AudioFrames(a.doc_id, nf.toLong, active, zcr)
    }

  def audioFrameStats(assets: Dataset[Asset],
                      batchSize: Int = 64): Dataset[AudioFrames] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => audioFrameStatsBatch(b.toSeq))
    }
  }

  /** Frame sampling for fixed-frame-size video payloads: every
    * `stride`-th fixed-size chunk as a frame row — pure built-ins
    * (substr on binary + explode), no UDF, codegen-friendly. Only FULL
    * frames are emitted (the index bound is the last offset with
    * frameBytes available): a fixed-size frame decoder downstream must
    * never receive a truncated tail. Payloads shorter than one frame
    * yield no rows.
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

  /** End-to-end: documents → encoded assets → decoded features.
    * Hashing on the bare 3-value modality key would cap the whole
    * decode at 3 tasks regardless of cluster size, so the shuffle key
    * is (modality, doc_id-derived salt) — every core gets work. A
    * partition may then hold several (modality, salt) cells;
    * sortWithinPartitions keeps rows modality-contiguous so decode
    * batches stay homogeneous (codec state swaps at most twice per
    * partition, not per batch).
    */
  def pipeline(spark: SparkSession, docs: DataFrame,
               batchSize: Int = 64): Dataset[AssetFeatures] = {
    val p = spark.sparkContext.defaultParallelism
    // shuffle the BARE doc_ids (8 bytes/row), THEN encode: the codec
    // encode is priced work now, so it must run in the salted layout —
    // encoding before the exchange would bottleneck on the input's
    // split count and ship every encoded payload through the shuffle
    val ids = docs.select(col("doc_id"))
      .withColumn("modality", modalityColumn(col("doc_id")))
      .repartition(col("modality"), pmod(hash(col("doc_id")), lit(p)))
      .sortWithinPartitions(col("modality"))
    decode(assetsFromDocuments(ids), batchSize)
  }
}
