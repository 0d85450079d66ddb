package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{Asset, AssetMeta}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "aaaa bbbb cccc dddd"),
    (1L, "eeee ffff"),
    (2L, "g" * 100),
    (3L, "hh ii jj"))
    .toDF("doc_id", "text")

  test("assets: modality cycle, binary payload, derived metadata") {
    val a = Multimodal.assetsFromDocuments(docs).orderBy("doc_id").collect()
    assert(a.map(_.getAs[String]("modality")).toSeq ==
      Seq("image", "audio", "video", "image"))
    val payload = a(0).getAs[Array[Byte]]("payload")
    assert(new String(payload, "UTF-8") == "aaaa bbbb cccc dddd")
    val meta = a(2).getStruct(a(2).fieldIndex("meta"))
    assert(meta.getAs[String]("contentType") == "application/x-fake-video")
    assert(meta.getAs[Int]("nFrames") == math.ceil(100 / 32.0).toInt)
  }

  test("decode stub: deterministic, normalized, length-preserving") {
    val feats = Multimodal.pipeline(spark, docs).collect()
    assert(feats.length == 4)
    val f0a = feats.find(_.doc_id == 0L).get
    val f0b = Multimodal.pipeline(spark, docs).collect().find(_.doc_id == 0L).get
    assert(f0a.features.toSeq == f0b.features.toSeq) // deterministic
    assert(f0a.features.length == 8)
    assert(math.abs(f0a.features.sum - 1.0f) < 1e-5) // histogram normalized
    assert(f0a.n_bytes == 19L)
  }

  test("decode batches bound the memory unit: batch size is respected") {
    val many = (0L until 100L).map(i => (i, s"doc number $i content"))
      .toDF("doc_id", "text")
    val assets = Multimodal.assetsFromDocuments(many).as[Asset]
    // count how many batches decodeBatch sees via batch sizes
    val sizes = assets.repartition(2).mapPartitions { it =>
      it.grouped(16).map(_.size)
    }.collect()
    assert(sizes.forall(_ <= 16))
    assert(sizes.sum == 100)
  }

  test("frame sampling: chunk count and content, video only") {
    val frames = Multimodal.sampleFrames(
      Multimodal.assetsFromDocuments(docs), frameBytes = 16, stride = 2)
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

  test("pipeline() output itself is salted and modality-contiguous") {
    val many = spark.range(300)
      .select(col("id").as("doc_id"),
        concat(lit("text for doc "), col("id")).as("text"))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // observe the REAL production path: the partitions decodeStub ran
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
    val many = spark.range(300)
      .select(col("id").as("doc_id"),
        concat(lit("text for doc "), col("id")).as("text"))
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
