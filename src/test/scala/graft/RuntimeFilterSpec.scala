package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.QueryExecution

/** Spark's runtime bloom-filter join pruning — the 100 TB mechanism
  * that turns a selective dim-side filter into a pre-shuffle row filter
  * on the fact side (an aggregated bloom filter of the dim join keys is
  * injected as `might_contain(...)` into the fact scan side). The
  * engine relies on this at scale, so the planner behavior is pinned
  * here: if a Spark upgrade or conf drift stopped injecting the filter,
  * fact-side shuffles would silently grow by the full unfiltered
  * volume.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def executed(qe: QueryExecution): String = qe.executedPlan.toString

  test("selective dim filter injects a bloom might_contain on the fact side") {
    val dir = "/root/testdata/sf0.01"
    val confs = Seq(
      // thresholds sized for testdata: any fact scan qualifies, the
      // filtered dim side is far under the creation cap
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // disable the cheaper alternative so the bloom path is the one taken
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      // bloom injection only applies to SHUFFLE joins (a broadcast join
      // already ships the dim keys to every task); force one — at real
      // scale the fact side exceeds any broadcast threshold anyway
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      val plan = executed(joined.queryExecution)
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter (might_contain) in:\n$plan")
      // and it actually runs: result matches the un-filtered-plan count
      val expected = {
        confs.foreach { case (k, _) => spark.conf.unset(k) }
        val n = spark.read.parquet(s"$dir/lineitem.parquet")
          .join(spark.read.parquet(s"$dir/orders.parquet")
              .filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
          .count()
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        n
      }
      assert(joined.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
