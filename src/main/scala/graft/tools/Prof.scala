package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

/** Dev-only profiler: runMain graft.tools.Prof <query> [sfDir]
  *
  * Runs one declared query once (after an untimed warm rep) and prints
  * (a) every SQL execution's wall time with its first plan line — the
  * per-STATEMENT breakdown of a multi-statement catalog query, (b) the
  * job-interval union vs wall time — how much is driver-only work
  * (planning, file metadata, commit protocol) vs executor jobs.
  * Read-only diagnostics; never used by the driver contract.
  */
object Prof {
  private final class Track extends SparkListener {
    final case class J(id: Int, start: Long, var end: Long)
    final case class E(id: Long, desc: String, start: Long, var end: Long)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, J]
    val execs = new scala.collection.mutable.LinkedHashMap[Long, E]
    @volatile var enabled = false
    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
      if (enabled) jobs(js.jobId) = J(js.jobId, js.time, -1L)
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(je.jobId).foreach(_.end = je.time)
    }
    override def onOtherEvent(event: SparkListenerEvent): Unit = synchronized {
      event match {
        case s: SparkListenerSQLExecutionStart if enabled =>
          val d = Option(s.physicalPlanDescription)
            .getOrElse("").linesIterator.toSeq
            .find(l => l.contains("==") == false && l.trim.nonEmpty)
            .getOrElse(s.description).trim
          execs(s.executionId) = E(s.executionId, d, s.time, -1L)
        case e: SparkListenerSQLExecutionEnd =>
          execs.get(e.executionId).foreach(_.end = e.time)
        case _ => ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.runtime.GraftSession.local()
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    val lst = new Track
    spark.sparkContext.addSparkListener(lst)
    val t0w = System.nanoTime()
    fn(spark, sfDir).count()
    val warmSec = (System.nanoTime() - t0w) / 1e9
    // same inter-rep quiesce as Bench
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc(); Thread.sleep(30); System.gc()
    lst.enabled = true
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    lst.enabled = false
    Thread.sleep(500)
    val (js, es) = lst.synchronized {
      (lst.jobs.values.toVector, lst.execs.values.toVector)
    }
    val done = js.filter(_.end > 0)
    // union of job intervals = time at least one job was running
    val ivs = done.map(j => (j.start, j.end)).sortBy(_._1)
    var covered = 0L
    var curS = -1L; var curE = -1L
    ivs.foreach { case (s, e) =>
      if (s > curE) { if (curE > 0) covered += curE - curS; curS = s; curE = e }
      else if (e > curE) curE = e
    }
    if (curE > 0) covered += curE - curS
    println(f"[prof] $name warm=$warmSec%.2f s timed=$sec%.2f s rows=$n " +
      f"jobs=${done.size} jobUnion=${covered / 1e3}%.2f s " +
      f"driverOnly=${sec - covered / 1e3}%.2f s")
    println(f"[prof] ${es.size} SQL executions:")
    es.sortBy(e => -(e.end - e.start)).take(40).foreach { e =>
      val dur = if (e.end > 0) (e.end - e.start) / 1e3 else Double.NaN
      println(f"[prof]   $dur%7.3f s  exec ${e.id}%4d  ${e.desc.take(150)}")
    }
    spark.stop()
  }
}
