package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{Asset, AssetMeta}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // doc_ids 0..3 cover image (0, 3), audio (1), video (2)
  private def docs = Seq(0L, 1L, 2L, 3L).toDF("doc_id")

  test("assets: modality cycle and genuine container magic bytes") {
    val a = Multimodal.assetsFromDocuments(docs).orderBy("doc_id").collect()
    assert(a.map(_.modality).toSeq == Seq("image", "audio", "video", "image"))
    // image payloads are real PNGs
    val png = a(0).payload
    assert((png(0) & 0xff) == 0x89 &&
      new String(png.slice(1, 4), "US-ASCII") == "PNG")
    // audio payloads are real RIFF/WAVE
    val wav = a(1).payload
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    // video payloads are length-prefixed BMP frames
    val vid = a(2).payload
    val frameLen = java.nio.ByteBuffer.wrap(vid, 0, 4).getInt
    assert(frameLen > 0 && frameLen <= vid.length - 4)
    assert(new String(vid.slice(4, 6), "US-ASCII") == "BM")
    assert(a(2).meta == AssetMeta("video/x-mbmp", Multimodal.videoSide(2),
      Multimodal.videoSide(2), 0, Multimodal.videoFrames(2)))
  }

  test("decode: JDK codecs recover exactly what was encoded") {
    val feats = Multimodal.pipeline(spark, docs).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats.size == 4)
    // image: decoded dimensions match the generation formulas, and the
    // pixel sum equals an independent straight-loop evaluation of the
    // encoded field — certifying a lossless PNG round trip
    val img = feats(0L)
    assert(img.width == Multimodal.imageW(0) && img.height == Multimodal.imageH(0))
    val expectedPix = (for {
      y <- 0 until Multimodal.imageH(0)
      x <- 0 until Multimodal.imageW(0)
    } yield Multimodal.imageGray(0, x, y).toLong).sum
    assert(img.pix_sum == expectedPix)
    assert(img.n_frames == 1 && img.sample_rate == 0 && img.amp_sum == 0L)
    // audio: AudioSystem reports the encoded rate/length and the PCM
    // amplitude sum matches the sample formula
    val aud = feats(1L)
    assert(aud.sample_rate == Multimodal.audioRate(1))
    assert(aud.n_samples == Multimodal.audioN(1).toLong)
    val expectedAmp = (0 until Multimodal.audioN(1))
      .map(i => math.abs(Multimodal.audioSample(1, i).toLong)).sum
    assert(aud.amp_sum == expectedAmp)
    // video: every frame decodes, dimensions and per-frame fields sum up
    val vid = feats(2L)
    assert(vid.n_frames == Multimodal.videoFrames(2))
    assert(vid.width == Multimodal.videoSide(2) && vid.height == Multimodal.videoSide(2))
    val s = Multimodal.videoSide(2)
    val expectedVidPix = (for {
      f <- 0 until Multimodal.videoFrames(2)
      y <- 0 until s
      x <- 0 until s
    } yield Multimodal.videoGray(2, f, x, y).toLong).sum
    assert(vid.pix_sum == expectedVidPix)
  }

  test("resize: 2x area-average matches a straight-loop reference") {
    val assets = Multimodal.assetsFromDocuments(Seq(0L, 3L, 6L).toDF("doc_id"))
    val out = Multimodal.resizeHalf(assets).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out.keySet == Set(0L, 3L, 6L))
    Seq(0L, 3L, 6L).foreach { d =>
      val (w2, h2) = (Multimodal.imageW(d) / 2, Multimodal.imageH(d) / 2)
      val want = (for {
        by <- 0 until h2
        bx <- 0 until w2
      } yield ((Multimodal.imageGray(d, 2 * bx, 2 * by) +
        Multimodal.imageGray(d, 2 * bx + 1, 2 * by) +
        Multimodal.imageGray(d, 2 * bx, 2 * by + 1) +
        Multimodal.imageGray(d, 2 * bx + 1, 2 * by + 1)) / 4).toLong).sum
      assert(out(d).out_w == w2 && out(d).out_h == h2)
      assert(out(d).rpix_sum == want, s"doc $d")
    }
  }

  test("resize passes non-image assets through as no rows") {
    val assets = Multimodal.assetsFromDocuments(Seq(1L, 2L).toDF("doc_id"))
    assert(Multimodal.resizeHalf(assets).collect().isEmpty)
  }

  test("decode is deterministic across runs") {
    val a = Multimodal.pipeline(spark, docs).collect().sortBy(_.doc_id)
    val b = Multimodal.pipeline(spark, docs).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("decode batches bound the memory unit: batch size is respected") {
    val many = spark.range(100).select(col("id").as("doc_id"))
    val assets = Multimodal.assetsFromDocuments(many)
    // count how many batches decodeBatch sees via batch sizes
    val sizes = assets.repartition(2).mapPartitions { it =>
      it.grouped(16).map(_.size)
    }.collect()
    assert(sizes.forall(_ <= 16))
    assert(sizes.sum == 100)
  }

  test("frame sampling: chunk count and content, video only") {
    val assets = Seq(
      (2L, "video", ("g" * 100).getBytes("UTF-8")),
      (0L, "image", ("x" * 64).getBytes("UTF-8")))
      .toDF("doc_id", "modality", "payload")
    val frames = Multimodal.sampleFrames(assets, frameBytes = 16, stride = 2)
    val rows = frames.collect()
    // only doc 2 is video (100 bytes): full 16-byte frames at stride
    // 2*16=32 start at offsets 0/32/64 — the 4-byte tail at offset 96
    // is NOT emitted (fixed-size decoders must never see a short frame)
    assert(rows.forall(_.getAs[Long]("doc_id") == 2L))
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Array[Byte]]("frame_bytes").length == 16))
    val first = rows.find(_.getAs[Int]("frame_idx") == 0).get
    assert(new String(first.getAs[Array[Byte]]("frame_bytes"), "UTF-8") == "g" * 16)
  }

  test("frame sampling walks the real mbmp container frame-aligned") {
    val asset = Multimodal.assetsFromDocuments(Seq(2L).toDF("doc_id"))
      .collect().head
    // mbmp frames are constant-size per doc (same dims, uncompressed
    // BMP): unit = 4-byte prefix + frame bytes
    val unit = 4 + java.nio.ByteBuffer.wrap(asset.payload, 0, 4).getInt
    assert(asset.payload.length == unit * Multimodal.videoFrames(2L))
    val df = Seq((asset.doc_id, asset.modality, asset.payload))
      .toDF("doc_id", "modality", "payload")
    val rows = Multimodal.sampleFrames(df, frameBytes = unit, stride = 1)
      .collect().sortBy(_.getAs[Int]("frame_idx"))
    assert(rows.length == Multimodal.videoFrames(2L))
    // each sampled chunk is a self-contained decodable frame
    rows.zipWithIndex.foreach { case (r, i) =>
      val chunk = r.getAs[Array[Byte]]("frame_bytes")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(chunk, 4, chunk.length - 4))
      assert(img != null, s"frame $i did not decode")
      assert(img.getWidth == Multimodal.videoSide(2L))
    }
  }

  test("pipeline() output itself is salted and modality-contiguous") {
    val many = spark.range(300).select(col("id").as("doc_id"))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // observe the REAL production path: the partitions decode ran
      // in, via the features dataset itself — not a re-implementation
      // of the pipeline's layout logic
      val layout = Multimodal.pipeline(spark, many)
        .mapPartitions { it =>
          val mods = it.map(_.modality).toList
          val swaps = mods.zip(mods.drop(1)).count { case (a, b) => a != b }
          Iterator.single((mods.distinct, swaps))
        }.collect().filter(_._1.nonEmpty)
      // a bare repartition(modality) would cap the decode at 3 tasks
      assert(layout.length > 3, s"only ${layout.length} non-empty partitions")
      // batches stay modality-contiguous inside each partition
      assert(layout.forall(_._2 <= 2),
        s"codec swaps per partition: ${layout.map(_._2).toSeq}")
      Seq("image", "audio", "video").foreach { m =>
        assert(layout.count(_._1.contains(m)) > 1, s"$m not spread")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoal)
    }
  }

  test("pipeline spreads each modality over many partitions, contiguously") {
    val many = spark.range(300).select(col("id").as("doc_id"))
    // the test session runs 4 shuffle partitions + AQE coalescing (tiny
    // data collapses to 1 partition) — pin a cluster-like width so the
    // assertion exercises the key's spread, not the local coalescer
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val layout =
      try {
        Multimodal.assetsFromDocuments(many)
          .repartition(col("modality"), pmod(hash(col("doc_id")), lit(32)))
          .sortWithinPartitions(col("modality"))
          .select(col("modality"))
          .withColumn("pid", spark_partition_id())
          .collect()
          .map(r => (r.getAs[Int]("pid"), r.getAs[String]("modality")))
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoal)
      }
    // parallelism: a bare repartition(modality) would cap the decode at
    // 3 partitions; the salted key must use (well more than) 3
    val perModalityPids = layout.groupBy(_._2).map(_._2.map(_._1).toSet)
    assert(perModalityPids.forall(_.size > 3))
    // homogeneity: within a partition, rows are modality-contiguous, so
    // batched decoders swap codec state at most (nModalities-1) times
    val runs = layout.groupBy(_._1).map { case (_, rows) =>
      val ms = rows.map(_._2)
      ms.zip(ms.drop(1)).count { case (a, b) => a != b }
    }
    assert(runs.forall(_ <= 2))
  }
}
