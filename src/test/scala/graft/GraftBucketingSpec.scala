package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed (`PARTITIONED BY (bucket(n, col))`) warehouse tables in the
  * session catalog (r09 item 6): the bucket spec persists in the
  * `_graft_meta` sidecar, writes route rows into bucket-tagged files
  * (one file per bucket per write via the clustered distribution), and
  * scans report KeyGroupedPartitioning — so a same-spec join of two
  * REAL catalog tables storage-partition-joins with no Exchange on
  * either side, the fact-fact join shape that previously shuffled both
  * sides.
  */
class GraftBucketingSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val name = s"gbk${n}_${System.nanoTime()}"
    val root = tmpDir(s"graft-bk-$name")
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    (name, root)
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }

  private def seedTwo(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.dds")
    spark.sql(s"CREATE TABLE $cat.dds.facts (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $cat.dds.dims (k BIGINT, tag STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    (1L to 400L).map(i => (i, i * 10)).toDF("k", "v")
      .createOrReplaceTempView("gbk_facts_src")
    (1L to 400L).map(i => (i, s"t${i % 7}")).toDF("k", "tag")
      .createOrReplaceTempView("gbk_dims_src")
    spark.sql(s"INSERT INTO $cat.dds.facts SELECT * FROM gbk_facts_src")
    spark.sql(s"INSERT INTO $cat.dds.dims SELECT * FROM gbk_dims_src")
  }

  test("same-bucket-spec join of two catalog tables: no Exchange on either side") {
    val (cat, _) = freshCatalog()
    seedTwo(cat)
    val joined = spark.table(s"$cat.dds.facts")
      .join(spark.table(s"$cat.dds.dims"), Seq("k"))
    assert(shuffles(joined).isEmpty,
      s"expected a storage-partitioned join, got:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 400)
    // and the join is CORRECT, not just exchange-free
    val row = joined.where(col("k") === 42).collect()
    assert(row.length == 1 && row(0).getAs[Long]("v") == 420L)
  }

  test("groupBy the bucket key plans with no exchange") {
    val (cat, _) = freshCatalog()
    seedTwo(cat)
    val agg = spark.table(s"$cat.dds.facts").groupBy("k")
      .agg(sum("v").as("s"))
    assert(shuffles(agg).isEmpty,
      s"expected exchange-free aggregate, got:\n${agg.queryExecution.executedPlan}")
    assert(agg.count() == 400)
  }

  test("appends keep the bucket layout; rows match an unbucketed write") {
    val (cat, root) = freshCatalog()
    seedTwo(cat)
    spark.sql(s"INSERT INTO $cat.dds.facts VALUES (401, 4010), (402, 4020)")
    // still exchange-free after the second generation of files
    val joined = spark.table(s"$cat.dds.facts")
      .join(spark.table(s"$cat.dds.dims"), Seq("k"))
    assert(shuffles(joined).isEmpty)
    assert(spark.table(s"$cat.dds.facts").count() == 402)
    // every data file carries a bucket tag
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/dds/facts"))
      .filterNot(st => st.getPath.getName.startsWith("_"))
    assert(files.nonEmpty && files.forall(_.getPath.getName.matches(".*-b\\d{5}\\..*")),
      s"untagged bucket files: ${files.map(_.getPath.getName).mkString(", ")}")
  }

  test("ALTER TABLE schema evolution preserves the bucket spec") {
    val (cat, _) = freshCatalog()
    seedTwo(cat)
    spark.sql(s"ALTER TABLE $cat.dds.facts ADD COLUMN note STRING")
    spark.sql(s"INSERT INTO $cat.dds.facts VALUES (500, 5000, 'x')")
    // the spec survived the sidecar rewrite: still exchange-free
    val joined = spark.table(s"$cat.dds.facts")
      .join(spark.table(s"$cat.dds.dims"), Seq("k"))
    assert(shuffles(joined).isEmpty,
      s"ALTER TABLE dropped the bucket spec:\n${joined.queryExecution.executedPlan}")
    assert(spark.table(s"$cat.dds.facts").count() == 401)
    // dropping the bucket column itself is refused
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.dds.facts DROP COLUMN k"))
    assert(e.getMessage.contains("bucket column"), e.getMessage)
  }

  test("a foreign untagged file fails safe: fallback to normal scan, never a wrong grouping") {
    val (cat, root) = freshCatalog()
    seedTwo(cat)
    // an object-API write drops an untagged file into the table dir
    graft.runtime.Catalog(spark, root)
      .append(Seq((500L, 5000L)).toDF("k", "v"), "dds", "facts", Nil)
    val joined = spark.table(s"$cat.dds.facts")
      .join(spark.table(s"$cat.dds.dims"), Seq("k"))
    // correctness holds; the exchange is allowed to come back
    assert(joined.count() == 400)
    assert(spark.table(s"$cat.dds.facts").count() == 401)
  }

  test("partitioned + bucketed: runtime pruning coexists with the bucket layout") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dds")
    spark.sql(s"CREATE TABLE $cat.dds.pb (k BIGINT, v BIGINT, day STRING) " +
      "PARTITIONED BY (day, bucket(8, k))")
    val days = Seq("d1", "d2", "d3", "d4", "d5", "d6")
    val rows = days.zipWithIndex.flatMap { case (d, i) =>
      (1L to 50L).map(j => (i * 100L + j, j, d))
    }
    rows.toDF("k", "v", "day").createOrReplaceTempView("gbk_pb_src")
    spark.sql(s"INSERT INTO $cat.dds.pb SELECT * FROM gbk_pb_src")

    // DPP: a filtered date-dim join on the hive partition column prunes
    // the bucketed fact scan at runtime — the bucket layout must not
    // trade away the dynamic-pruning tier
    val dimPath = tmpDir("gbk-date-dim")
    days.zipWithIndex.map { case (d, i) =>
      (d, if (i % 3 == 0) "audit" else "regular")
    }.toDF("day", "kind").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = spark.table(s"$cat.dds.pb")
      .join(dim.where(col("kind") === "audit"), Seq("day"))
      .groupBy("day").agg(sum("v").as("s"))
    val plan = q.queryExecution.sparkPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no runtime pruning on the bucketed fact scan:\n$plan")
    assert(q.count() == 2) // d1 and d4
    // execution-level proof: only the pruned days' files were read
    val files = spark.table(s"$cat.dds.pb")
      .join(dim.where(col("kind") === "audit"), Seq("day"))
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty &&
      files.forall(f => f.contains("day=d1") || f.contains("day=d4")),
      s"scan read outside the pruned days: ${files.mkString(", ")}")
    // and the bucket grouping is still live on the same table
    val agg = spark.table(s"$cat.dds.pb").groupBy("k").agg(sum("v").as("s"))
    assert(shuffles(agg).isEmpty,
      s"bucket grouping lost under hive partitioning:\n${agg.queryExecution.executedPlan}")
  }

  test("short/byte bucket keys are creatable AND writable (r10 ADVICE)") {
    // keyType admits Short/Byte at CREATE TABLE, so the function catalog
    // must bind them too — previously bind() threw, leaving the table
    // creatable but never writable.
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dds")
    spark.sql(s"CREATE TABLE $cat.dds.sfacts (k SMALLINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"CREATE TABLE $cat.dds.sdims (k SMALLINT, tag STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.dds.sfacts " +
      "SELECT CAST(id AS SMALLINT), id * 10 FROM range(1, 101)")
    spark.sql(s"INSERT INTO $cat.dds.sdims " +
      "SELECT CAST(id AS SMALLINT), concat('t', id % 5) FROM range(1, 101)")
    val joined = spark.table(s"$cat.dds.sfacts")
      .join(spark.table(s"$cat.dds.sdims"), Seq("k"))
    assert(joined.count() == 100)
    assert(shuffles(joined).isEmpty,
      s"short-keyed bucket join shuffled:\n${joined.queryExecution.executedPlan}")
    spark.sql(s"CREATE TABLE $cat.dds.bfacts (k TINYINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.dds.bfacts " +
      "SELECT CAST(id AS TINYINT), id FROM range(1, 51)")
    assert(spark.table(s"$cat.dds.bfacts").count() == 50)
  }

  test("MERGE INTO a bucketed table preserves bucket tags and the exchange-free join (r10 item 2)") {
    val (cat, root) = freshCatalog()
    seedTwo(cat)
    // row-level rewrite: update every 5th key, delete every 20th,
    // insert a new key — the copy-on-write replacement must route rows
    // back into bucket-tagged files or every future join silently
    // downgrades to the fail-safe shuffle path
    spark.sql(s"""MERGE INTO $cat.dds.facts t
      USING (SELECT id AS k, id * 1000 AS v, (id % 20 = 0) AS del
             FROM range(5, 401, 5)
             UNION ALL SELECT 401L, 401000L, false) u
      ON t.k = u.k
      WHEN MATCHED AND u.del THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.v = u.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (u.k, u.v)""")
    // contents: 400 - 20 deleted + 1 inserted
    assert(spark.table(s"$cat.dds.facts").count() == 381)
    val r = spark.table(s"$cat.dds.facts").where(col("k") === 25).collect()
    assert(r.length == 1 && r(0).getAs[Long]("v") == 25000L)
    assert(spark.table(s"$cat.dds.facts").where(col("k") === 20).isEmpty)
    assert(spark.table(s"$cat.dds.facts").where(col("k") === 401)
      .collect()(0).getAs[Long]("v") == 401000L)
    // every post-rewrite data file still carries a bucket tag
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/dds/facts"))
      .filterNot(st => st.getPath.getName.startsWith("_"))
    assert(files.nonEmpty && files.forall(_.getPath.getName.matches(".*-b\\d{5}\\..*")),
      s"merge rewrite dropped bucket tags: ${files.map(_.getPath.getName).mkString(", ")}")
    // and the same-spec join still plans with ZERO ShuffleExchange
    val joined = spark.table(s"$cat.dds.facts")
      .join(spark.table(s"$cat.dds.dims"), Seq("k"))
    assert(shuffles(joined).isEmpty,
      s"merge rewrite lost the storage-partitioned join:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 380) // 381 minus the inserted 401 (no dim row)
    // a row-level DELETE rides the same bucket-preserving rewrite
    spark.sql(s"DELETE FROM $cat.dds.facts WHERE k % 2 = 1 AND v < 100000")
    val joined2 = spark.table(s"$cat.dds.facts")
      .join(spark.table(s"$cat.dds.dims"), Seq("k"))
    assert(shuffles(joined2).isEmpty,
      s"delete rewrite lost the storage-partitioned join:\n${joined2.queryExecution.executedPlan}")
  }

  /** r11 item 2 — hash-exact bucket pruning: an equality/IN probe on
    * the bucket key evaluates the bucket transform over the literals
    * at planning time and schedules files from EXACTLY the matching
    * buckets (min/max skipping can't help a hashed layout). All n
    * groups are still emitted (empty for non-matching buckets) so the
    * reported KeyGroupedPartitioning stays truthful.
    */
  private def filesPerBucket(df: org.apache.spark.sql.DataFrame)
      : Map[Int, Int] = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.length == 1, s"expected one scan, got ${scans.length}")
    scans.head.partitions.flatten.collect {
      case fp: FilePartition => fp.index -> fp.files.length
    }.toMap
  }

  test("hash-exact bucket pruning: equality probes schedule only matching buckets (r11 item 2)") {
    val (cat, root) = freshCatalog()
    seedTwo(cat)
    import graft.sources.GraftBucket

    // equality: files from exactly ONE bucket, values exact
    val q1 = spark.table(s"$cat.dds.facts").where(col("k") === 42L)
    val r1 = q1.collect()
    assert(r1.length == 1 && r1(0).getAs[Long]("v") == 420L)
    val per1 = filesPerBucket(q1)
    assert(per1.size == 8, s"expected all 8 groups emitted, got ${per1.size}")
    val nonEmpty1 = per1.filter(_._2 > 0).keySet
    assert(nonEmpty1 == Set(GraftBucket.ofLong(42L, 8)),
      s"equality probe scheduled buckets $nonEmpty1")

    // IN over two keys in DIFFERENT buckets: exactly two groups
    val k2 = (1L to 400L).find(k =>
      GraftBucket.ofLong(k, 8) != GraftBucket.ofLong(42L, 8)).get
    val q2 = spark.table(s"$cat.dds.facts")
      .where(col("k").isin(42L, k2))
    assert(q2.collect().map(_.getAs[Long]("v")).sorted.toSeq ==
      Seq(420L, k2 * 10).sorted)
    val nonEmpty2 = filesPerBucket(q2).filter(_._2 > 0).keySet
    assert(nonEmpty2 ==
      Set(GraftBucket.ofLong(42L, 8), GraftBucket.ofLong(k2, 8)),
      s"IN probe scheduled buckets $nonEmpty2")

    // row parity with the unpruned path: same rows as a post-scan filter
    val all = spark.table(s"$cat.dds.facts").collect()
      .filter(r => r.getAs[Long]("k") == 42L || r.getAs[Long]("k") == k2)
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"))).sorted.toSeq
    assert(q2.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[Long]("v"))).sorted.toSeq == all)

    // a RANGE predicate constrains nothing: every bucket stays scheduled
    val q3 = spark.table(s"$cat.dds.facts").where(col("k") >= 100L)
    assert(filesPerBucket(q3).count(_._2 > 0) == 8)
    assert(q3.count() == 301)

    // composition with file-level data skipping: a second generation
    // of files with a disjoint v-range; the bucket keeps only its
    // matching bucket AND the manifest drops the generation the v
    // filter can't match
    spark.sql(s"INSERT INTO $cat.dds.facts " +
      "SELECT k, v + 1000000 FROM gbk_facts_src")
    graft.runtime.Catalog(spark, root).analyze("dds", "facts")
    val q4 = spark.table(s"$cat.dds.facts")
      .where(col("k") === 42L && col("v") < 100000L)
    val r4 = q4.collect()
    assert(r4.length == 1 && r4(0).getAs[Long]("v") == 420L)
    val per4 = filesPerBucket(q4)
    assert(per4.filter(_._2 > 0).keySet == Set(GraftBucket.ofLong(42L, 8)))
    assert(per4.values.sum == 1,
      s"skipping should drop the new generation inside the bucket: $per4")

    // and the equality probe leaves the storage-partitioned join intact
    val joined = spark.table(s"$cat.dds.facts").where(col("k") === 42L)
      .join(spark.table(s"$cat.dds.dims"), Seq("k"))
    assert(shuffles(joined).isEmpty,
      s"bucket pruning broke the exchange-free join:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 2) // both generations of k=42
  }

  test("bucket pruning composes with DPP on a partitioned+bucketed table") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dds")
    spark.sql(s"CREATE TABLE $cat.dds.pbk (k BIGINT, v BIGINT, day STRING) " +
      "PARTITIONED BY (day, bucket(8, k))")
    val days = Seq("d1", "d2", "d3")
    days.flatMap(d => (1L to 100L).map(j => (j, j * 2, d)))
      .toDF("k", "v", "day").createOrReplaceTempView("gbk_pbk_src")
    spark.sql(s"INSERT INTO $cat.dds.pbk SELECT * FROM gbk_pbk_src")
    import graft.sources.GraftBucket
    val q = spark.table(s"$cat.dds.pbk")
      .where(col("day") === "d2" && col("k") === 7L)
    val r = q.collect()
    assert(r.length == 1 && r(0).getAs[Long]("v") == 14L)
    val per = filesPerBucket(q)
    assert(per.filter(_._2 > 0).keySet == Set(GraftBucket.ofLong(7L, 8)),
      s"scheduled buckets ${per.filter(_._2 > 0).keySet}")
    // the scheduled files all come from the day=d2 subtree
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val files = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.partitions.flatten.collect {
        case fp: FilePartition => fp.files.map(_.toPath.toString).toSeq
      }.flatten
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("day=d2")),
      s"bucket pruning broke partition pruning: $files")
  }

  test("INSERT OVERWRITE replaces a bucketed table and keeps the layout") {
    val (cat, _) = freshCatalog()
    seedTwo(cat)
    spark.sql(s"INSERT OVERWRITE $cat.dds.facts " +
      "SELECT k, v * 2 FROM gbk_facts_src WHERE k <= 100")
    assert(spark.table(s"$cat.dds.facts").count() == 100)
    val joined = spark.table(s"$cat.dds.facts")
      .join(spark.table(s"$cat.dds.dims"), Seq("k"))
    assert(shuffles(joined).isEmpty,
      s"overwrite lost the bucket layout:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 100)
  }
}
