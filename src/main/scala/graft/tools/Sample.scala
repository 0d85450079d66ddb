package graft.tools

/** Dev-only driver sampling profiler: runMain graft.tools.Sample <query> [sfDir] [topN]
  *
  * Runs one declared query once (after an untimed warm rep) while a
  * background thread samples the MAIN (driver) thread's stack at
  * ~200 Hz. Prints the hottest (method, state) frames and the hottest
  * graft.* frames — the "where does driverOnly time go" companion to
  * tools.Prof. Executor-side hotspots are NOT captured (use the Spark
  * UI's executor thread dumps for those).
  * Read-only diagnostics; never used by the driver contract.
  */
object Sample {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val topN = if (args.length > 2) args(2).toInt else 40
    val spark = graft.runtime.GraftSession.local()
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc(); Thread.sleep(30); System.gc()

    // frame -> samples, keyed by the deepest graft/spark-sql frame
    val driverCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    val graftCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    @volatile var running = true
    @volatile var nSamples = 0
    val mainThread = Thread.currentThread()
    val sampler = new Thread(() => {
      while (running) {
        val st = mainThread.getStackTrace
        if (st.nonEmpty) {
          nSamples += 1
          // deepest interesting frame on the MAIN (driver) thread
          val frames = st.map(f => f.getClassName + "." + f.getMethodName)
          val interesting = frames.find(f =>
            f.startsWith("graft.") || f.contains("sql.execution") ||
            f.contains("sql.catalyst") || f.contains("hadoop.fs") ||
            f.contains("parquet") || f.contains("sql.Dataset") ||
            f.contains("SparkContext.runJob") || f.contains("ThreadUtils"))
            .getOrElse(frames.headOption.getOrElse("?"))
          driverCounts.merge(interesting, 1, (a, b) => a + b)
          // every graft frame anywhere in the stack (calling context)
          frames.filter(_.startsWith("graft.")).distinct.take(4)
            .foreach(f => graftCounts.merge(f, 1, (a, b) => a + b))
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    running = false
    sampler.join(500)
    println(f"[sample] $name timed=$sec%.2f s rows=$n samples=$nSamples (~5ms each)")
    import scala.jdk.CollectionConverters._
    println(s"[sample] hottest driver-thread frames:")
    driverCounts.asScala.toSeq.sortBy(-_._2.intValue).take(topN).foreach {
      case (f, c) => println(f"[sample]   ${c.intValue * 100.0 / nSamples}%5.1f%% $f")
    }
    println(s"[sample] hottest graft call-context frames:")
    graftCounts.asScala.toSeq.sortBy(-_._2.intValue).take(topN).foreach {
      case (f, c) => println(f"[sample]   ${c.intValue * 100.0 / nSamples}%5.1f%% $f")
    }
    spark.stop()
  }
}
