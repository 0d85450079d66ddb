package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Key-grouped (storage-partitioned) execution over the synthetic
  * catalog: the scan reports bucket(n, doc_id) partitioning, the
  * catalog resolves the bucket function, and Spark plans doc_id
  * aggregates and self-joins WITHOUT exchanges — while producing the
  * same rows as the unbucketed format() path.
  */
class SynthBucketingSpec extends SparkSpec {

  private val Rows = 4000L

  private def bucketedTable = {
    spark.conf.set("spark.sql.catalog.synthb",
      "graft.sources.SynthCatalog")
    spark.conf.set("spark.sql.catalog.synthb.rows", Rows.toString)
    spark.conf.set("spark.sql.catalog.synthb.buckets", "8")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.table("synthb.docs")
  }

  private def flatTable =
    spark.read.format("graft-synth").option("rows", Rows.toString).load()

  private def shuffles(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }

  test("groupBy(doc_id) over the bucketed scan plans with no exchange") {
    val agg = bucketedTable.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("n_chars")).as("mx"))
    assert(shuffles(agg).isEmpty,
      s"expected exchange-free aggregate, got:\n${agg.queryExecution.executedPlan}")
    // row parity with the unbucketed path
    val flat = flatTable.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("n_chars")).as("mx"))
    assert(agg.collect().map(_.toSeq).toSet ==
      flat.collect().map(_.toSeq).toSet)
    assert(agg.count() == Rows)
  }

  test("self-join on doc_id storage-partition-joins: no exchange on either side") {
    val t = bucketedTable
    val joined = t.select(col("doc_id"), col("n_chars"))
      .join(t.select(col("doc_id"), col("lang")), Seq("doc_id"))
    assert(shuffles(joined).isEmpty,
      s"expected storage-partitioned join, got:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == Rows)
  }

  test("bucketed rows are identical to the unbucketed generation") {
    assert(bucketedTable.collect().map(_.toSeq).toSet ==
      flatTable.collect().map(_.toSeq).toSet)
  }

  test("runtime range narrowing still holds under bucketing") {
    val narrowed = bucketedTable.filter(col("doc_id") >= 3900)
    assert(narrowed.count() == 100)
    assert(narrowed.select(min(col("doc_id"))).collect()(0).getLong(0)
      == 3900L)
  }
}
