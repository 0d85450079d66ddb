package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.CurationQueries
import graft.runtime.Tables

class CurationQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q162 epoch shuffle is a balanced deterministic permutation") {
    val out = CurationQueries.q162EpochShuffle(spark, sfDir).collect()
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total,
      "every document must land in exactly one microbatch")
    val byBatch = out.map(r =>
      r.getAs[Long]("microbatch") -> r.getAs[Long]("n_docs")).toMap
    val nFull = total / 32
    (0L until nFull).foreach { b =>
      assert(byBatch(b) == 32, s"microbatch $b must be full")
    }
    if (total % 32 != 0)
      assert(byBatch(nFull) == total % 32, "tail batch must hold the rest")
    // reproducibility: the permutation is a pure function of the seed tag
    val again = CurationQueries.q162EpochShuffle(spark, sfDir).collect()
    assert(out.sortBy(_.getAs[Long]("microbatch")).toSeq ==
      again.sortBy(_.getAs[Long]("microbatch")).toSeq,
      "epoch order must be identical across runs")
  }

  test("q163 excises exactly the >=3-document segments and rebuilds the rest") {
    val dir = tmpDir("graft-q163")
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val shared2 = (1 to 16).map(i => s"s$i").mkString(" ")
    // docs 0-2 carry the boilerplate segment (df=4 with doc 3, >= 3 →
    // removed everywhere); doc 3 is PURE boilerplate (twice — distinct-doc
    // df counts it once); docs 4-5 share a df=2 segment (kept)
    val rows = Seq(
      (0L, s"$boiler x0a x0b", "src0"),
      (1L, s"$boiler x1a", "src1"),
      (2L, boiler, "src2"),
      (3L, s"$boiler $boiler", "src3"),
      (4L, shared2, "src4"),
      (5L, shared2, "src5"))
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = CurationQueries.q163SegmentDedup(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    def f(src: String, c: String): Long = out(src).getAs[Long](c)
    assert(f("src0", "tokens_removed") == 16 && f("src0", "chars_kept") == 7,
      "doc 0 keeps only its 2-token tail")
    assert(f("src1", "tokens_removed") == 16 && f("src1", "chars_kept") == 3)
    assert(f("src2", "tokens_removed") == 16 && f("src2", "chars_kept") == 0,
      "a fully-boilerplate doc rebuilds to nothing")
    assert(f("src3", "tokens_removed") == 32 && f("src3", "chars_kept") == 0,
      "both copies of the segment are removed from the pure-boiler doc")
    assert(f("src3", "removed_ppm") == 1000000L)
    Seq("src4", "src5").foreach { s =>
      assert(f(s, "tokens_removed") == 0 &&
        f(s, "chars_kept") == shared2.length.toLong,
        s"df=2 segment in $s is below the boilerplate threshold and kept")
    }
  }

  test("q164 bootstrap band collapses to the exact mean on a constant corpus") {
    val dir = tmpDir("graft-q164")
    import spark.implicits._
    (0L until 30L).map(i => (i, "t1 t2 t3 t4", "src0"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val row = CurationQueries.q164BootstrapCi(spark, dir).collect().head
    assert(row.getAs[Long]("exact_mean_ppm") == 4000000L)
    // a resampled mean of a constant is the constant — any resample size
    assert(row.getAs[Long]("boot_lo_ppm") == 4000000L &&
      row.getAs[Long]("boot_hi_ppm") == 4000000L,
      "bootstrap band of a constant metric must be degenerate")
  }

  test("q164 bands are ordered and cover every source on real data") {
    val out = CurationQueries.q164BootstrapCi(spark, sfDir).collect()
    val nSources = Tables.load(spark, sfDir, "documents")
      .select(countDistinct(col("source"))).head.getLong(0)
    assert(out.length == nSources)
    out.foreach { r =>
      assert(r.getAs[Long]("boot_lo_ppm") <= r.getAs[Long]("boot_hi_ppm"),
        s"band inverted for ${r.getAs[String]("source")}")
    }
  }

  test("q167 never releases a group below the diversity threshold") {
    val out = CurationQueries.q167LDiversity(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("l_div") >= 3,
        s"released group ${r.getAs[String]("lang")}/${r.getAs[String]("source")} " +
          s"has l_div ${r.getAs[Long]("l_div")} < 3")
    }
  }

  test("q168 weights are exact integer square roots and allocations are capped") {
    val out = CurationQueries.q168TemperatureMix(spark, sfDir).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val w = r.getAs[Long]("weight")
      assert(w * w <= n && n < (w + 1) * (w + 1),
        s"weight $w is not the integer sqrt of $n")
      assert(r.getAs[Long]("alloc") <= n, "allocation must not exceed the source")
    }
    assert(out.map(_.getAs[Long]("alloc")).sum <= total / 2,
      "floor-rounded allocations must not exceed the target sample")
  }

  test("q169 noise is bounded, mixed, and deterministic") {
    val out = CurationQueries.q169DpCounts(spark, sfDir).collect()
    val noises = out.map(_.getAs[Long]("noise"))
    assert(noises.forall(n => n >= -8 && n <= 8), s"noise out of support: ${noises.toSeq}")
    assert(noises.distinct.length > 1,
      "every group drew identical noise — the per-key hash mixing is broken")
    out.foreach(r => assert(r.getAs[Long]("n_noisy") >= 0))
    val again = CurationQueries.q169DpCounts(spark, sfDir).collect()
    assert(out.map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq,
      "the mechanism must be reproducible")
  }

  test("q170 slices the token stream into exactly ceil(T/128) full blocks") {
    import graft.queries.OracleIdioms.wsTokensNonEmpty
    val totalTokens = Tables.load(spark, sfDir, "documents")
      .select(sum(size(wsTokensNonEmpty(col("text"))) + 1)).head.getLong(0)
    val out = CurationQueries.q170ExamplePack(spark, sfDir).collect()
    val nExamples = out.map(_.getAs[Long]("n_examples")).sum
    assert(nExamples == (totalTokens + 127) / 128,
      s"expected ceil($totalTokens/128) examples, got $nExamples")
    out.foreach { r =>
      assert(r.getAs[Long]("max_tokens") <= 128,
        "no example may exceed the block length")
      assert(r.getAs[Long]("docs_per_example") >= 1)
    }
    // at most one example (the stream tail) is shorter than the block
    val short = out.filter(_.getAs[Long]("min_tokens") < 128)
    assert(short.length <= 1,
      s"only the tail may fall short of 128 tokens: ${short.toSeq}")
  }

  test("q171 metrics are bounded and the fused system dominates the lexical arm") {
    val out = CurationQueries.q171RankEval(spark, sfDir).collect()
      .map(r => r.getAs[String]("system") -> r).toMap
    assert(out.keySet == Set("lexical", "rrf"))
    out.values.foreach { r =>
      assert(r.getAs[Long]("mrr_ppb") <= 1000000000L &&
        r.getAs[Long]("mrr_ppb") >= 0L)
      assert(r.getAs[Long]("ndcg_ppm") <= 1000000L &&
        r.getAs[Long]("ndcg_ppm") >= 0L)
      assert(r.getAs[Long]("n_queries") == 10L)
    }
    // the point of fusing: RRF contains the semantic arm, so against
    // cosine ground truth it must beat the lexical ranking alone
    assert(out("rrf").getAs[Long]("ndcg_ppm") >
      out("lexical").getAs[Long]("ndcg_ppm"),
      "fused nDCG must dominate the lexical arm")
    assert(out("rrf").getAs[Long]("mrr_ppb") >=
      out("lexical").getAs[Long]("mrr_ppb"))
  }

  test("q165 equals an independently spelled window RRF on real data") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val sem = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("id"),
        Similarity.cosineHof(col("qv"), col("embedding")).as("cos"))
      .withColumn("rank_sem", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("id"))))
      .filter(col("rank_sem") <= 10)
      .select(col("query_id"), col("id"), col("rank_sem").cast("long").as("rank_sem"))
    val dt = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), explode(array_distinct(
        graft.queries.OracleIdioms.wsTokensNonEmpty(col("text")))).as("tok"))
    val lex = dt.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("tok"))
      .join(dt, "tok")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rank_lex", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("overlap").desc, col("doc_id"))))
      .filter(col("rank_lex") <= 10)
      .select(col("query_id"), col("doc_id").as("id"),
        col("rank_lex").cast("long").as("rank_lex"))
    val expected = sem.join(lex, Seq("query_id", "id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr("1000000000L div (60 + rank_sem)"), lit(0L)) +
          coalesce(expr("1000000000L div (60 + rank_lex)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("id"), col("rrf"),
        col("rank").cast("int").as("rank"))
    val got = CurationQueries.q165RrfFusion(spark, sfDir)
      .select(col("query_id"), col("id"), col("rrf"),
        col("rank").cast("int").as("rank"))
    assert(got.count() == 50, "10 queries x top-5")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "bounded-heap RRF must equal the window spelling")
  }
}
