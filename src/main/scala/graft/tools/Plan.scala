package graft.tools

/** Dev-only plan dumper: runMain graft.tools.Plan <query>[,<query>...] <outDir> [sfDir]
  *
  * Writes `<outDir>/<query>.txt` containing `.explain("formatted")` of the
  * declared query's returned frame — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/. Read-only diagnostics;
  * never used by the driver contract.
  *
  * Note: multi-statement catalog queries run their DDL/DML while the
  * frame is BUILT (the call below), so the dumped plan is the final
  * SELECT's — the statement-level breakdown lives in tools.Prof.
  */
object Plan {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val outDir = java.nio.file.Paths.get(args(1))
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.runtime.GraftSession.local()
    // same override hook as graft.Scratch: A/B a conf against one plan
    sys.env.get("SPARK_GRAFT_SET").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plan] wrote $outDir/$name.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
