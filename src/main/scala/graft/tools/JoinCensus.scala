package graft.tools

/** Dev-only executed-plan join census: runMain graft.tools.JoinCensus
  * <query>[,<query>...] [sfDir]
  *
  * Runs each declared query (one untimed warm rep, then one timed rep)
  * and prints the EXECUTED (AQE-final) plan's join operators with
  * their build sides, plus the wall time — the evidence `explain` can't
  * give (it prints isFinalPlan=false before execution). Honors
  * SPARK_GRAFT_SET conf overrides like Scratch, so a runtime-rewrite
  * claim (e.g. the AQE SMJ->SHJ conversion) can be A/B'd against the
  * plan that actually ran. Read-only diagnostics; never used by the
  * driver contract.
  */
object JoinCensus {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.runtime.GraftSession.local()
    sys.env.get("SPARK_GRAFT_SET").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).groupBy().count().collect() // warm, untimed
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(30); System.gc()
      val t0 = System.nanoTime()
      val cdf = fn(spark, sfDir).groupBy().count()
      cdf.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      // AQE's treeString prints the FINAL plan followed by an
      // "== Initial Plan ==" section — censusing both double-counts
      // pre-conversion operators (exactly the r17 fingerprint ambiguity)
      val joins = cdf.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
        .linesIterator.map(_.trim.dropWhile(c => !c.isLetter && c != '*'))
        .filter(l => l.contains("Join")).map(_.take(120)).toSeq
      println(f"[join-census] $name%-26s $sec%7.2f s  ${joins.size} joins")
      joins.foreach(j => println(s"[join-census]    $j"))
    }
    spark.stop()
  }
}
