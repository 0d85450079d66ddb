package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe harness: measures how query wall-time actually scales
  * with data volume, instead of arguing from plan shape alone.
  * PlanShapeSpec proves there is no cartesian / global window; only a
  * measurement catches the quieter super-linear terms — LSH band
  * collision volume, IVF cell imbalance, bucket skew — so the probe
  * runs the heaviest queries at two scale factors and reports the
  * time ratio against the data ratio.
  *
  * `gen src dst factor` — writes a factor-× clone of the testdata
  * directory. Entity keys are shifted by a per-copy stride (so joins
  * stay consistent and keys stay unique); document text is
  * vowel-rotated per copy (shingle profiles decorrelate — a naive
  * 10-identical-copies clone would square LSH candidate volume and
  * measure the GENERATOR's artifact, not the engine); embeddings get
  * a per-copy deterministic sign-flip pattern (a reflection: norms
  * and intra-copy geometry preserved, copies decorrelated so ANN
  * bucket sizes scale like a real corpus). Copies i and i+5 share a
  * text rotation and differ only by an id tag — a deliberate,
  * linear-rate near-duplicate family, the realistic crawl profile.
  *
  * `probe smallDir bigDir out.json q1,q2,...` — two full sweeps per
  * scale (min taken, same ambient-noise protocol as Bench), one JSON
  * line per run plus a summary with time ratios.
  */
object ScaleProbe {
  // > any entity key at any generated sf, and far above the synthetic
  // key offsets some queries add (q159 inserts at k + 1e7 — a 1e7
  // stride made clone-1's keys collide with clone-0's synthetic rows)
  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: src :: dst :: factor :: Nil =>
      val spark = graft.runtime.GraftSession.local()
      gen(spark, src, dst, factor.toInt)
    case "probe" :: small :: big :: out :: qs :: Nil =>
      val spark = graft.runtime.GraftSession.local()
      probe(spark, small, big, out, qs.split(",").toSeq)
    case other =>
      System.err.println(
        s"usage: gen <src> <dst> <factor> | probe <small> <big> <out.json> <q,...> (got $other)")
      sys.exit(2)
  }

  /** One scaled copy of a table: shift the entity keys, perturb the
    * content columns per the table's role.
    */
  private def copyOf(t: String, df: DataFrame, i: Int): DataFrame = {
    val s = i * Stride
    def shift(cols: String*) =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(s)))
    t match {
      case "region" | "nation" => df // fixed dims: never scaled
      case "customer" => shift("c_custkey")
      case "supplier" => shift("s_suppkey")
      case "part" => shift("p_partkey")
      case "orders" => shift("o_orderkey", "o_custkey")
      case "lineitem" => shift("l_orderkey", "l_partkey", "l_suppkey")
      case "events" => shift("event_id", "user_id")
      case "documents" =>
        // vowel rotation i%5 decorrelates shingles; the id tag keeps
        // exact hashes distinct between the two copies that share a
        // rotation (i, i+5) — those become the corpus's linear-rate
        // near-dup families
        val rot = "aeiouaeiou".substring(i % 5, i % 5 + 5)
        val txt =
          if (i == 0) col("text")
          else concat(translate(col("text"), "aeiou", rot), lit(s" ~v$i"))
        shift("doc_id")
          .withColumn("text", txt)
          .withColumn("n_chars", length(txt))
      case "embeddings" =>
        // deterministic per-copy reflection: component j keeps its
        // magnitude, flips sign when pmod(i*73 + j*37, 7) >= 4 —
        // distinct patterns per copy (mod-7 cycle), identical for
        // i ≡ i' (mod 7): the embedding-space duplicate families
        val flipped =
          if (i == 0) col("embedding")
          else transform(col("embedding"), (x, j) =>
            when(pmod(lit(i * 73) + j * 37, lit(7)) >= 4, -x).otherwise(x))
        shift("vec_id").withColumn("embedding", flipped)
      case other => sys.error(s"unknown table $other")
    }
  }

  def gen(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    require(factor >= 1)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out =
        if (t == "region" || t == "nation") df
        else (0 until factor).map(copyOf(t, df, _)).reduce(_.unionAll(_))
      // file sizing: keep per-file volume in the same regime as the
      // source (factor× rows → factor× files), so the probe measures
      // query scaling, not degenerate single-file parallelism
      val parts = math.max(df.rdd.getNumPartitions,
        spark.sparkContext.defaultParallelism min (factor * 4))
      out.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
      System.err.println(s"[gen] $t x$factor -> $dst/$t.parquet")
    }
  }

  def probe(spark: SparkSession, small: String, big: String,
            out: String, queries: Seq[String]): Unit = {
    val fns = queries.map(q => q -> graft.SparkEntry.queries(q))
    // warmup (same rationale as Bench)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$small/region.parquet").count()
    // the same inter-query quiesce protocol as Bench (r10): BLOCKING
    // unpersist — with blocking=false a pair-miner's large materialized
    // frame can still hold executor storage when the next query's
    // timing window opens — plus a double GC with a settle so the
    // blocking ContextCleaner drains OUTSIDE the timing windows. The
    // r16 probe caught exactly the documented failure: q90's sf1
    // passes read 55.9/135.5 s mid-suite vs 3.4-4.6 s warm standalone.
    def quiesce(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(30)
      System.gc()
    }
    def sweep(dir: String): Map[String, Double] = fns.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, dir).count() catch {
        case e: Throwable =>
          System.err.println(s"[probe] $name FAILED at $dir: $e")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      quiesce()
      System.err.println(f"[probe] ${dir.split('/').last}/$name%-26s $sec%8.2f s")
      name -> sec
    }.toMap
    // interleave scales across the two passes so a sustained ambient
    // stall cannot inflate only one scale's numbers
    val s1 = sweep(small); val b1 = sweep(big)
    val s2 = sweep(small); val b2 = sweep(big)
    val rows = queries.map { q =>
      val sSec = math.min(s1(q), s2(q)); val bSec = math.min(b1(q), b2(q))
      f""""$q":{"small_sec":$sSec%.3f,"big_sec":$bSec%.3f,"ratio":${bSec / sSec}%.2f}"""
    }
    val json = rows.mkString(
      s"""{"small":"$small","big":"$big","queries":{""", ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
  }
}
