package graft



/** Ad-hoc single-query timing harness (dev only):
  * runMain graft.Scratch <query> [reps] [sfDir]
  * (the sfDir ARG matters: `sbt -client` does not forward env vars, so
  * SPARK_GRAFT_SF_DIR is invisible through the thin client).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.runtime.GraftSession.local()
    // SPARK_GRAFT_SET="k=v,k=v": session-conf overrides, for A/B-ing a
    // rule or config against the same query (e.g. spark.graft.topk.rewrite)
    sys.env.get("SPARK_GRAFT_SET").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[scratch] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      // same inter-rep quiesce as Bench: drop residual localCheckpoint
      // blocks and drain the GC-triggered blocking ContextCleaner OUTSIDE
      // the timed window, so reps measure the query, not cleaner stalls
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
