package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

class SynthSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(rows: Long, parts: Int = 4) =
    spark.read.format("graft-synth")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    // sparkPlan, not executedPlan: plans with an exchange come back as
    // an AdaptiveSparkPlanExec whose tree isn't visible to collect
    // until execution; the pre-adaptive plan always exposes the scan
    df.queryExecution.sparkPlan.collectFirst { case s: BatchScanExec => s }.get

  test("generates deterministic rows with the declared schema") {
    val df = read(100)
    assert(df.columns.toSeq ==
      Seq("doc_id", "source", "lang", "n_chars", "text"))
    assert(df.count() == 100)
    // pure function of doc_id: two reads agree cell-for-cell
    assert(read(100).collect().toSeq == df.collect().toSeq)
    // n_chars really is the text length
    assert(df.filter(length($"text") =!= $"n_chars").isEmpty)
  }

  test("doc_id range predicates push into the generator") {
    val df = read(1000).filter($"doc_id" >= 100 && $"doc_id" < 200)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("range=[100,200)"),
      scan.scan.description())
    assert(df.count() == 100)
    // equality prunes to a single row
    val one = read(1000).filter($"doc_id" === 7L)
    assert(scanOf(one).scan.description().contains("range=[7,8)"))
    assert(one.select($"doc_id").as[Long].collect().toSeq == Seq(7L))
  }

  test("column pruning reaches the generator; residual filters still apply") {
    val df = read(500).filter($"lang" === "en").select($"doc_id", $"lang")
    val scan = scanOf(df)
    // text (the expensive column) is not generated
    assert(!scan.scan.readSchema().fieldNames.contains("text"))
    // lang isn't pushable — Spark applies it as a residual
    assert(df.select($"lang").distinct().as[String].collect().toSeq == Seq("en"))
  }

  test("partitions split the id range without gaps or overlap") {
    val df = read(1003, parts = 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.select($"doc_id").as[Long].collect().sorted.toSeq ==
      (0L until 1003L))
  }

  test("global count/min/max push into the connector as O(1) metadata") {
    val df = read(1000).filter($"doc_id" >= 100 && $"doc_id" < 600)
      .agg(count(lit(1)).as("n"), min($"doc_id").as("lo"),
        max($"doc_id").as("hi"))
    val scan = scanOf(df)
    assert(scan.scan.description().contains("pushedAggregates="),
      scan.scan.description())
    // the scan answers from range arithmetic: one row, no generation
    assert(df.as[(Long, Long, Long)].collect().toSeq ==
      Seq((500L, 100L, 599L)))
    // an empty pushed range keeps aggregate semantics: 0 / NULL / NULL
    val empty = read(1000).filter($"doc_id" >= 900 && $"doc_id" < 900)
      .agg(count(lit(1)), min($"doc_id"), max($"doc_id"))
    assert(empty.collect().head.toSeq == Seq(0L, null, null))
  }

  test("GROUP BY the layout key pushes completely: no aggregate, no exchange, no rows") {
    val df = read(1000, parts = 4)
      .filter($"doc_id" >= 100 && $"doc_id" < 140)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), max($"doc_id").as("mx"))
    val scan = scanOf(df)
    assert(scan.scan.description().contains("pushedGroupBy=[doc_id]"),
      scan.scan.description())
    // COMPLETE pushdown: Spark plans neither an aggregate nor the
    // shuffle underneath one — the scan's finished per-group rows ARE
    // the result (the manifest-answered partition-grouped aggregate
    // shape of real warehouse connectors)
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      plan)
    assert(!plan.contains("Exchange"), plan)
    assert(df.as[(Long, Long, Long)].collect().sorted.toSeq ==
      (100L until 140L).map(id => (id, 1L, id)))
    // bucketed layout: same complete pushdown over the strided split,
    // every group exactly once
    val bucketed = spark.read.format("graft-synth")
      .option("rows", "300").option("buckets", "8").load()
      .groupBy($"doc_id").agg(count(lit(1)).as("n"), min($"doc_id").as("mn"))
    assert(scanOf(bucketed).scan.description().contains("pushedGroupBy="))
    assert(bucketed.as[(Long, Long, Long)].collect().sorted.toSeq ==
      (0L until 300L).map(id => (id, 1L, id)))
  }

  test("unsupported aggregates decline pushdown and stay correct") {
    // grouped aggregate: connector declines, Spark aggregates rows
    val grouped = read(100).groupBy($"lang").agg(count(lit(1)).as("n"))
    assert(!scanOf(grouped).scan.description().contains("pushedAggregates="))
    assert(grouped.agg(sum($"n")).as[Long].collect().head == 100L)
    // min over a non-range column: declined likewise
    val other = read(100).agg(min($"source"))
    assert(!scanOf(other).scan.description().contains("pushedAggregates="))
    assert(other.as[String].collect().head.startsWith("src"))
  }

  test("runtime IN-filter on doc_id narrows the generated range before planning") {
    import graft.sources.{SynthRange, SynthScan}
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    val scan = new SynthScan(0L, 100000L, 8, schema)
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("doc_id"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("doc_id",
        Array[Any](java.lang.Long.valueOf(1200L), java.lang.Long.valueOf(1500L),
          java.lang.Long.valueOf(1350L)))))
    val parts = scan.planInputPartitions().map(_.asInstanceOf[SynthRange])
    assert(parts.map(_.lo).min == 1200L && parts.map(_.hi).max == 1501L,
      s"range not narrowed: ${parts.toSeq}")
    // narrowing is monotone: a second (wider) filter cannot re-expand
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("doc_id",
        Array[Any](java.lang.Long.valueOf(0L), java.lang.Long.valueOf(99999L)))))
    val parts2 = scan.planInputPartitions().map(_.asInstanceOf[SynthRange])
    assert(parts2.map(_.lo).min == 1200L && parts2.map(_.hi).max == 1501L)
    // non-key filters are ignored, not fatal
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("lang", "en")))
    assert(scan.planInputPartitions().nonEmpty)
  }

  test("join results are identical with runtime filtering in the plan") {
    val dim = (1200L to 1210L).toDF("doc_id")
    val joined = read(100000).join(dim, "doc_id").select($"doc_id", $"lang")
    assert(joined.count() == 11L)
    val expected = read(100000).filter($"doc_id".between(1200, 1210))
      .select($"doc_id", $"lang").collect().toSeq
    assert(joined.collect().toSeq.sortBy(_.getLong(0)) ==
      expected.sortBy(_.getLong(0)))
  }

  test("limit and ascending top-N push into the generated range") {
    // bare LIMIT: fully pushed — the generator produces exactly k rows
    val lim = read(100000).limit(7)
    assert(lim.queryExecution.optimizedPlan.toString.contains("LocalLimit") ==
      false || lim.count() == 7) // plan detail is version-dependent; rows must be exact
    assert(lim.count() == 7)
    // ORDER BY doc_id ASC LIMIT k: fully pushed, results sorted
    val asc = read(100000).orderBy($"doc_id").limit(5)
    assert(asc.collect().map(_.getLong(0)).toSeq == (0L until 5L).toSeq)
    assert(asc.queryExecution.executedPlan.toString.contains("graft-synth"),
      "scan must survive the rewrite")
    // DESC: the range narrows to the last k ids (the scan generates
    // only k rows) but Spark keeps the sort — results still correct
    val desc = read(100000).orderBy($"doc_id".desc).limit(5)
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      (99999L to 99995L by -1).toSeq)
    // pushdown composes with filters: range narrows twice
    val both = read(100000).filter($"doc_id" >= 500).orderBy($"doc_id").limit(3)
    assert(both.collect().map(_.getLong(0)).toSeq == Seq(500L, 501L, 502L))
  }

  test("reported statistics let a small synth side auto-broadcast") {
    // without SupportsReportStatistics a DSv2 relation reports
    // defaultSizeInBytes (huge) and can never auto-broadcast; with the
    // range-exact stats a 50-row side must plan as BroadcastHashJoin
    // with no hint. Filter pushdown narrows the range BEFORE stats, so
    // a big table filtered small broadcasts too.
    val big = spark.range(0, 200000).toDF("doc_id")
    val small = read(50).select($"doc_id", $"lang")
    val joined = big.join(small, "doc_id")
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected an auto-broadcast from reported stats:\n$plan")
    assert(joined.count() == 50)
    val narrowed = read(1000000).filter($"doc_id" < 40)
      .select($"doc_id", $"source")
    val joined2 = big.join(narrowed, "doc_id")
    assert(joined2.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      "pushdown-narrowed range must report narrowed stats")
    assert(joined2.count() == 40)
  }
}
