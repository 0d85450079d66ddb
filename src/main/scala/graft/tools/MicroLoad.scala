package graft.tools

/** Dev-only: time repeated spark.read.parquet schema resolution. */
object MicroLoad {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.runtime.GraftSession.local()
    spark.range(10).count()
    val tables = Seq("lineitem", "orders", "customer", "documents", "embeddings")
    val schemas = tables.map(t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet").schema).toMap
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      (1 to 20).foreach { _ =>
        tables.foreach { t =>
          spark.read.schema(schemas(t)).parquet(s"$sfDir/$t.parquet").schema
        }
      }
      println(f"[micro] rep $rep: 100 schema-provided loads: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      (1 to 20).foreach { _ =>
        tables.foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet").schema
        }
      }
      println(f"[micro] rep $rep: 100 inferred loads:       ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
