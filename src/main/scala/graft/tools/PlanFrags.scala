package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only plan dumper for INTERNAL subframes that the per-query
  * tools.Plan dump cannot show — a frame behind a Materialize.once
  * boundary appears as a LogicalRDD leaf in the final query's plan, so
  * an optimization that restructures the materialized computation is
  * invisible there. Each named fragment builds the before/after shapes
  * of one such subframe and writes explain("formatted") for both:
  * runMain graft.tools.PlanFrags <fragment> <outDir> [sfDir]
  * Read-only diagnostics; never used by the driver contract.
  */
object PlanFrags {
  def main(args: Array[String]): Unit = {
    val frag = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.runtime.GraftSession.local()
    def write(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[planfrag] wrote $outDir/$name.txt (${txt.length} chars)")
    }
    frag match {
      case "q70_edgeweights" =>
        // the pagerank degree-weighted edge frame (materialized once,
        // reused per iteration): r17 shape = count window over the
        // distinct edge list (re-shuffles + SORTS every edge by src);
        // r18 shape = partial-aggregated degree joined back map-side
        val li = graft.runtime.Tables.load(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = graft.runtime.Tables.load(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + lit(1000000L)).as("dst"))
        val eDist = edges.select(col("src"), col("dst")).distinct()
        write("q70_pagerank_edgeweights_before",
          eDist.withColumn("d",
            count(lit(1)).over(Window.partitionBy(col("src")))))
        // the real code materializes the distinct edge list once and
        // derives BOTH the degree aggregate and the join probe side
        // from the checkpointed blocks — mirror that here so the after
        // plan shows the true shape (no duplicated distinct subtree)
        val eCk = eDist.localCheckpoint(true)
        write("q70_pagerank_edgeweights_after",
          eCk.join(broadcast(
            eCk.groupBy(col("src")).agg(count(lit(1)).as("d"))),
            Seq("src")))
      case other => throw new IllegalArgumentException(
        s"unknown fragment '$other'")
    }
    spark.stop()
  }
}
