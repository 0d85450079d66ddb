package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Path-based lakehouse catalog: `<root>/<layer>/<table>` parquet
  * directories, hive-style partitioning.
  *
  * Reproduces the reference's Iceberg-on-metastore table semantics
  * (`iceberg.raw.daily_reports` etc.) without a metastore service:
  *  - namespaces = directory prefixes (SURVEY §1.1);
  *  - `overwritePartitions` = dynamic partition overwrite via a
  *    temp-dir write + per-partition rename swap, replacing
  *    exactly the partitions present in the incoming DataFrame and
  *    preserving all others — the core idempotency semantic of
  *    `process_covid_ods.py:79-91` / `process_covid_dds.py:81-93` /
  *    `process_covid_data_mart.py:123-126`;
  *  - `createOrReplace` = full overwrite (`process_covid_dds.py:41-44`);
  *  - `append` = partitioned append (`process_covid_raw.py:102-113`);
  *  - `versions > 0` retains each full-replace's previous state as an
  *    Iceberg-snapshot-style version (the crash-safety protocol
  *    already produces it as a complete directory — versioning keeps
  *    it instead of deleting): `history` / `readVersion` (time
  *    travel) / `restoreVersion` (rollback-as-a-version), pruned to
  *    the newest `versions`. Applies to the safeSwapWrite paths
  *    (createOrReplace, writeClustered, compact, unpartitioned
  *    merge); partitioned overwrites stay partition-scoped.
  *
  * Scale note: every write is a straight distributed parquet write — no
  * driver-side collection; partition columns become hive directories so
  * reads get partition pruning for free.
  */
final case class Catalog(spark: SparkSession, root: String,
                         format: String = "parquet",
                         versions: Int = 0) {
  require(Catalog.Formats.contains(format),
    s"unsupported storage format '$format' (one of ${Catalog.Formats.mkString(", ")})")
  require(versions >= 0, "versions must be >= 0 (0 = versioning off)")

  def path(layer: String, table: String): String = s"$root/$layer/$table"

  /** Per-format reader/writer options: columnar formats need none;
    * CSV round-trips through an explicit header (type inference on
    * read restores numeric/date columns — lossy for exotic types, per
    * the format itself, not this catalog).
    */
  private def readOptions: Map[String, String] = format match {
    case "csv" => Map("header" -> "true", "inferSchema" -> "true")
    case _ => Map.empty
  }
  private def writeOptions: Map[String, String] = format match {
    case "csv" => Map("header" -> "true", "compression" -> "gzip")
    case "json" => Map("compression" -> "gzip")
    case _ => Map("compression" -> "snappy")
  }

  /** S4 — table existence probe (`spark.catalog.tableExists` equivalent). */
  def tableExists(layer: String, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(layer, table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** S2 — catalog table scan (partition columns inferred from layout).
    * Applies any merge-on-read deletion vectors ([[graft.sources.GraftDv]])
    * the SQL-catalog surface recorded for the same warehouse dir — the
    * object API and the name path read one table state.
    */
  def read(layer: String, table: String): DataFrame = {
    val df = spark.read.format(format).options(readOptions)
      .load(path(layer, table))
    graft.sources.GraftEqDel.applyToPathRead(spark,
      graft.sources.GraftDv.applyToPathRead(spark, df,
        new org.apache.hadoop.fs.Path(path(layer, table))),
      new org.apache.hadoop.fs.Path(path(layer, table)))
  }

  // ---- name-based addressing (session-catalog binding) -----------------
  // The reference addresses every table by CATALOG NAME
  // (`spark.table("iceberg.raw.daily_reports")`,
  // /root/reference/airflow/dags/scripts/process_covid_ods.py:30); the
  // medallion layers do the same through these helpers, which bind this
  // warehouse root to a `graft.sources.GraftCatalog` session catalog and
  // resolve `<catalog>.<layer>.<table>` identifiers through Spark's
  // catalog manager. Reads keep every DSv2 scan tier (pushdown, static
  // + runtime partition pruning via the catalog's
  // SupportsRuntimeV2Filtering wrapper); writes resolve to the SAME
  // crash-safe engine protocols (the catalog's V1Write delegates back
  // here; dynamic partition overwrite is the catalog's staged-invisible
  // hive-layout v2 write) — one warehouse, two addressing modes, one
  // publish-safety story.

  /** Session-catalog name bound to this root: `graft` when free (or
    * already bound to this root+format), otherwise a deterministic
    * per-root fallback — Spark's CatalogManager caches instances by
    * name, so a name can never be re-pointed at a second root within a
    * session (tests spin up many warehouses).
    */
  lazy val sqlName: String = {
    def tryBind(name: String): Boolean = {
      val rootKey = s"spark.sql.catalog.$name.root"
      val implKey = s"spark.sql.catalog.$name"
      spark.conf.getOption(implKey) match {
        case Some(impl) =>
          impl == "graft.sources.GraftCatalog" &&
            spark.conf.getOption(rootKey).contains(root) &&
            spark.conf.getOption(s"spark.sql.catalog.$name.format")
              .getOrElse("parquet") == format
        case None =>
          spark.conf.set(implKey, "graft.sources.GraftCatalog")
          spark.conf.set(rootKey, root)
          spark.conf.set(s"spark.sql.catalog.$name.format", format)
          if (versions > 0)
            spark.conf.set(s"spark.sql.catalog.$name.versions", versions.toString)
          true
      }
    }
    if (tryBind("graft")) "graft"
    else {
      val suffix = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s"$root|$format|$versions")
          .toLong & 0xffffffffL)
      val unique = s"graft_$suffix"
      require(tryBind(unique),
        s"session catalog $unique is bound to a different root")
      unique
    }
  }

  /** Fully-qualified SQL identifier for a table of this warehouse. */
  def sqlIdent(layer: String, table: String): String =
    s"$sqlName.`$layer`.`$table`"

  /** Name-based read: resolves through the session catalog — the
    * reference's addressing mode. Scan tiers are the DSv2 delegate's
    * (pushdown, partition pruning, DPP via the runtime-filter wrapper).
    */
  def table(layer: String, table: String): DataFrame =
    spark.table(sqlIdent(layer, table))

  /** Name-based partitioned append (S5 by name): clusters within write
    * partitions like [[append]], then routes through the session
    * catalog — CTAS on first write (which persists the schema + spec in
    * the table sidecar), by-name-resolved append after.
    */
  def appendByName(df: DataFrame, layer: String, table: String,
                   partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val clustered =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      else df
    val w = clustered.writeTo(sqlIdent(layer, table))
    if (tableExists(layer, table)) w.append()
    else {
      ensureNamespace(layer)
      if (partitionCols.nonEmpty)
        w.partitionedBy(org.apache.spark.sql.functions.col(partitionCols.head),
          partitionCols.tail.map(org.apache.spark.sql.functions.col): _*).create()
      else w.create()
    }
  }

  /** Name-based dynamic partition overwrite (S6 by name): resolves to
    * the catalog's staged-invisible hive-layout v2 write
    * ([[graft.sources.GraftPartitionedCow]] DynamicOverwriteWrite),
    * replacing exactly the partitions present in `df`.
    */
  def overwritePartitionsByName(df: DataFrame, layer: String, table: String,
                                partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty,
      "overwritePartitionsByName needs partition columns")
    val w = df.writeTo(sqlIdent(layer, table))
    if (tableExists(layer, table)) w.overwritePartitions()
    else {
      ensureNamespace(layer)
      w.partitionedBy(org.apache.spark.sql.functions.col(partitionCols.head),
        partitionCols.tail.map(org.apache.spark.sql.functions.col): _*).create()
    }
  }

  /** Name-based full replace (S7 by name): `overwrite(true)` resolves
    * to the catalog's truncate write, which IS [[createOrReplace]]'s
    * crash-safe swap (not a drop+recreate RTAS — the table identity and
    * version history survive).
    */
  def createOrReplaceByName(df: DataFrame, layer: String, table: String,
                            partitionCols: Seq[String] = Nil): Unit = {
    val w = df.writeTo(sqlIdent(layer, table))
    if (tableExists(layer, table))
      w.overwrite(org.apache.spark.sql.functions.lit(true))
    else {
      ensureNamespace(layer)
      if (partitionCols.nonEmpty)
        w.partitionedBy(org.apache.spark.sql.functions.col(partitionCols.head),
          partitionCols.tail.map(org.apache.spark.sql.functions.col): _*).create()
      else w.create()
    }
  }

  /** CTAS needs the namespace (layer directory) to exist. */
  private def ensureNamespace(layer: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$layer")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.mkdirs(p)
  }

  /** S5 — partitioned append, clustered within partitions. */
  def append(df: DataFrame, layer: String, table: String,
             partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    // appended files carry no equality-delete epoch floor (-1): rows
    // whose keys live in any sidecar would silently vanish on read
    graft.sources.GraftEqDel.requireNone(
      new org.apache.hadoop.fs.Path(path(layer, table)).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(path(layer, table)), "a batch append")
    // write-time CHECK constraints (graft.sources.GraftCheck): a
    // constrained table enforces on the object API too — the guard is
    // a throwing Filter on the write's own row pass
    val guarded = graft.sources.GraftCheck.guard(df,
      graft.sources.GraftCheck.constraintsAt(
        spark.sparkContext.hadoopConfiguration, path(layer, table)))
    val clustered =
      if (sortCols.nonEmpty)
        guarded.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      else guarded
    val base = new org.apache.hadoop.fs.Path(path(layer, table))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // commit journal (graft.sources.GraftCommits): the V1 append does
    // not know its final file names — claim them as the visible delta
    // across the save. The pre-listing costs what the save's own
    // committer already pays; the record write is one tiny file under
    // the table commit lock.
    val before = graft.sources.GraftCommits.universe(fs, base)
    clustered.write
      .partitionBy(partitionCols: _*)
      .options(writeOptions)
      .mode("append")
      .format(format)
      .save(path(layer, table))
    graft.sources.GraftCommitLock.withLock(fs, base,
        s"append-journal:$layer.$table") {
      graft.sources.GraftCommits.tryRecordClaiming(
        fs, base, "append", before)
    }
  }

  /** S6 — idempotent dynamic partition overwrite: replaces only the
    * partitions present in `df`, preserves everything else.
    *
    * Publication is crash-safe, matching the spirit of the reference's
    * Iceberg `overwritePartitions()` commit
    * (process_covid_ods.py:87, format-version=2): the whole incoming
    * frame lands in a sibling temp directory first, then each touched
    * partition directory is swapped in by rename. A failure anywhere
    * during the (distributed, arbitrarily long) write phase leaves the
    * live table byte-identical; the publish phase is one cheap rename
    * pair per TOUCHED partition, each individually atomic, so no
    * reader ever sees a half-written partition. (Cross-partition
    * all-or-nothing would need a metadata pointer à la Iceberg —
    * per-partition atomicity + idempotent re-run is the plain-directory
    * equivalent: a crash between renames re-converges on retry.)
    */
  def overwritePartitions(df: DataFrame, layer: String, table: String,
                          partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty,
      "overwritePartitions needs partition columns; use createOrReplace for full rewrites")
    val p = path(layer, table)
    val base = new org.apache.hadoop.fs.Path(p)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // replacement files carry no equality-delete epoch floor (-1):
    // their rows would be wrongly subject to live sidecars — refuse
    graft.sources.GraftEqDel.requireNone(fs, base,
      "a dynamic partition overwrite")
    // mixed-era refusal (r13 item 3): a directory-granular replacement
    // would strand old-era rows of the same logical partition
    require(graft.sources.GraftEvolved.evolvedColsOf(fs, base).isEmpty,
      s"$layer.$table has an un-materialized partition-spec evolution " +
        "(file eras at mixed depths): partition overwrites are refused " +
        "until CALL system.compact migrates the table to its current spec")
    // CHECK constraints hold on the object-API overwrite too
    val df1 = graft.sources.GraftCheck.guard(df,
      graft.sources.GraftCheck.constraintsAt(
        spark.sparkContext.hadoopConfiguration, p))
    val tmp = new org.apache.hadoop.fs.Path(s"$p.__pubtmp")
    val oldRoot = new org.apache.hadoop.fs.Path(s"$p.__pubold")
    // enumerate the leaf partition directories under a root
    // (depth = partition columns; names are hive col=val)
    def leaves(root: org.apache.hadoop.fs.Path): Seq[String] = {
      def walk(dir: org.apache.hadoop.fs.Path, level: Int,
               rel: String): Seq[String] =
        if (level == partitionCols.length) Seq(rel)
        else fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith(partitionCols(level) + "="))
          .flatMap { st =>
            val name = st.getPath.getName
            walk(st.getPath, level + 1,
              if (rel.isEmpty) name else s"$rel/$name")
          }
      walk(root, 0, "")
    }
    // recovery — a previous publish may have crashed between its two
    // renames, leaving a partition's ONLY copy under __pubold. Restore
    // any such orphan into the (missing) live slot BEFORE clearing the
    // backup root: deleting it first would destroy that only copy, and
    // the docstring's 'a crash re-converges on retry' would only hold
    // when the retry's write phase succeeds.
    import graft.sources.GraftCommitLock
    GraftCommitLock.withLock(fs, base, s"publish-recovery:$layer.$table") {
      if (fs.exists(oldRoot)) {
        leaves(oldRoot).foreach { rel =>
          val live = new org.apache.hadoop.fs.Path(base, rel)
          if (!fs.exists(live)) {
            fs.mkdirs(live.getParent)
            require(fs.rename(new org.apache.hadoop.fs.Path(oldRoot, rel), live),
              s"publish recovery: could not restore $live from $oldRoot")
          }
        }
        fs.delete(oldRoot, true)
      }
      fs.delete(tmp, true)
    }
    // interference fingerprint BEFORE the (long, unlocked) write: the
    // swap below retires the touched partitions' current contents, so
    // a commit landing in one of them mid-write would be erased — the
    // optimistic check makes this writer abort cleanly instead
    val before = visibleFileState(fs, base)
    // phase 1 — the only phase that can fail for data reasons runs
    // entirely against the temp dir; the live table is not involved
    df1.write
      .partitionBy(partitionCols: _*)
      .options(writeOptions)
      .mode("overwrite")
      .format(format)
      .save(tmp.toString)
    if (!fs.exists(base)) {
      // first publish: the temp dir IS the table
      fs.mkdirs(base.getParent)
      require(fs.rename(tmp, base), s"publish: could not install $base")
      GraftCommitLock.withLock(fs, base, s"publish-journal:$layer.$table") {
        graft.sources.GraftCommits.tryRecordClaiming(
          fs, base, "overwrite", Set.empty)
      }
    } else {
      // phase 2 — per-partition swap: live aside, new in, old dropped.
      // Each rename is atomic on a real filesystem, so a partition is
      // always either its complete old or complete new contents. The
      // whole swap loop is one commit critical section; interference
      // is checked only for the TOUCHED partitions (a concurrent
      // append elsewhere is untouched by this publish and survives).
      GraftCommitLock.withLock(fs, base, s"publish:$layer.$table") {
        onBeforeSwapCheck()
        val touched = leaves(tmp)
        // an entry belongs to a touched partition if its rel path (or,
        // for deletion-vector sidecars keyed "_graft_dv/<rel>", the
        // data file's rel path) is under it — a merge-on-read DELETE
        // landing mid-write changes ONLY the sidecar, and the swap
        // would otherwise resurrect the deleted rows
        def inTouched(rel: String): Boolean = {
          val dataRel =
            if (rel.startsWith(graft.sources.GraftDv.DirName + "/"))
              rel.stripPrefix(graft.sources.GraftDv.DirName + "/")
            else rel
          touched.exists(t => dataRel.startsWith(t + "/"))
        }
        val nowTouched = visibleFileState(fs, base).filter {
          case (rel, _) => inTouched(rel)
        }
        val beforeTouched = before.filter { case (rel, _) => inTouched(rel) }
        if (nowTouched != beforeTouched) {
          fs.delete(tmp, true)
          throw new GraftCommitLock.ConcurrentCommitException(
            s"$layer.$table: partitions ${touched.mkString(", ")} changed " +
              "while this overwrite computed its replacement; the " +
              "overwrite was DISCARDED and the live table is untouched " +
              "— re-run it against the new state")
        }
        touched.foreach { rel =>
          swapDirIn(fs,
            newDir = new org.apache.hadoop.fs.Path(tmp, rel),
            live = new org.apache.hadoop.fs.Path(base, rel),
            aside = new org.apache.hadoop.fs.Path(oldRoot, rel))
        }
        fs.delete(tmp, true)
        // tombstone the swapped-aside partitions (reader snapshot
        // isolation, r12 item 2) — relative layout preserved, GC'd by
        // remove_orphans after the grace window
        val tomb = graft.sources.GraftRetired.retireRoot(fs, base, oldRoot)
        // commit journal: the overwrite's adds are the touched
        // partitions' new files; removes are their previous generation,
        // preimages resolvable under the tombstoned aside root
        graft.sources.GraftCommits.tryRecord(fs, base, "overwrite",
          adds = visibleFileState(fs, base).keys.toSeq
            .filter(r => inTouched(r) &&
              !r.startsWith(graft.sources.GraftDv.DirName + "/")),
          removes = beforeTouched.keys.toSeq
            .filter(!_.startsWith(graft.sources.GraftDv.DirName + "/"))
            .map(graft.sources.GraftCommits.Remove(_, tomb.getOrElse(""))))
      }
    }
    // maintenance policy outside the lock: this commit grew the
    // tombstone area (retired.expire_ms GC — r14 review finding)
    graft.sources.GraftMaintenance.afterCommit(spark, fs, base)
  }

  /** One atomic-per-step directory swap: move `live` aside (when it
    * exists), rename `newDir` in, restore on failure. Shared by the
    * per-partition publish loop and [[safeSwapWrite]] so the
    * crash-safety protocol lives in exactly one place.
    */
  private def swapDirIn(fs: org.apache.hadoop.fs.FileSystem,
                        newDir: org.apache.hadoop.fs.Path,
                        live: org.apache.hadoop.fs.Path,
                        aside: org.apache.hadoop.fs.Path): Unit = {
    val hadLive = fs.exists(live)
    if (hadLive) {
      fs.mkdirs(aside.getParent)
      require(fs.rename(live, aside), s"swap: could not move $live aside")
    } else fs.mkdirs(live.getParent)
    if (!fs.rename(newDir, live)) {
      val restored = hadLive && fs.rename(aside, live)
      throw new IllegalStateException(
        if (restored) s"swap failed for $live; original restored, new data left at $newDir"
        else if (hadLive) s"swap failed for $live AND restore failed — original is at $aside"
        else s"swap failed for $live; new data left at $newDir")
    }
  }

  /** S7 — full-replace (dimension rebuild). Crash-safe like the
    * reference's Iceberg `createOrReplace()`: the rebuild lands in a
    * sibling temp dir and swaps in by rename, so a failed rebuild
    * leaves the previous version intact — a plain in-place overwrite
    * clears the target before the new files are committed.
    */
  def createOrReplace(df: DataFrame, layer: String, table: String): Unit =
    createOrReplace(df, layer, table, Nil)

  /** Full-replace preserving a hive-partitioned layout: the whole new
    * state lands partitioned in the sibling temp dir, then swaps in —
    * the static INSERT OVERWRITE semantic (every partition replaced,
    * absent partitions dropped), unlike [[overwritePartitions]] which
    * scopes the replace to the partitions present in `df`.
    */
  def createOrReplace(df: DataFrame, layer: String, table: String,
                      partitionCols: Seq[String]): Unit =
    safeSwapWrite(layer, table) { tmp =>
      // CHECK constraints hold across full replaces too
      val guarded = graft.sources.GraftCheck.guard(df,
        graft.sources.GraftCheck.constraintsAt(
          spark.sparkContext.hadoopConfiguration, path(layer, table)))
      val w = guarded.write
        .options(writeOptions)
        .mode("overwrite")
        .format(format)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .save(tmp)
    }

  /** Incremental materialized-aggregate maintenance: fold a DELTA of
    * rows into a stored keyed aggregate without rescanning history.
    * The delta is partially aggregated, unioned with the STORED
    * aggregate (group-cardinality-sized, not history-sized), and
    * re-aggregated — sound for additive measures (count/sum; an avg is
    * maintained as its (sum, count) partials), which is exactly the
    * algebra Spark's own partial aggregation relies on. The swap runs
    * through [[createOrReplace]], so the refresh is crash-safe and
    * every refresh is a snapshot version — a double-applied delta is
    * repaired by `restoreVersion`, the same recovery story as the CDC
    * sink. At 100 TB: cost per refresh = delta scan + aggregate-table
    * scan; the raw history is never touched.
    *
    * `measures` are columns of `delta` to be sum-maintained (pass a
    * `lit(1)` column for a count).
    */
  def refreshAggregate(delta: DataFrame, layer: String, table: String,
                       keys: Seq[String], measures: Seq[String]): Unit = {
    require(keys.nonEmpty, "refreshAggregate needs at least one key column")
    require(measures.nonEmpty, "refreshAggregate needs at least one measure")
    import org.apache.spark.sql.functions.{col, sum}
    def rollup(df: DataFrame): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(sum(col(measures.head)).as(measures.head),
          measures.tail.map(m => sum(col(m)).as(m)): _*)
        .select((keys ++ measures).map(col): _*)
    val partial = rollup(delta)
    val merged =
      if (tableExists(layer, table))
        rollup(read(layer, table).select((keys ++ measures).map(col): _*)
          .unionByName(partial))
      else partial
    createOrReplace(merged, layer, table)
  }

  /** Incremental materialized JOIN-view maintenance, append-only: keep
    * `view` = left ⨝ right (inner equi-join on `joinKeys`) current
    * under appends WITHOUT recomputing the join, via the classic IVM
    * delta rule
    *
    *   Δ(A ⨝ B) = ΔA ⨝ B_old  ∪  A_old ⨝ ΔB  ∪  ΔA ⨝ ΔB
    *
    * appended to the stored view while the base tables absorb their
    * deltas. Per-refresh cost is DELTA-proportional — every term joins
    * a delta against a base or another delta; the full A ⨝ B is never
    * re-touched, which at 100 TB is the difference between a minutes
    * refresh and an hours one. Retractions (updates/deletes) need
    * counting-IVM and are out of scope — append-only is the lakehouse
    * fact-stream case (and what `append` itself supports).
    *
    * The delta terms are materialized BEFORE the bases absorb their
    * deltas: parquet directory reads are lazy, so joining against
    * `read(base)` after appending would silently see the delta twice.
    * Non-key columns of the two sides must not collide (the join
    * output carries both).
    *
    * Crash window: view append and base appends are separate commits —
    * a crash between them leaves the view one delta AHEAD of its
    * bases. Re-running the same delta heals the bases but double-joins
    * the view rows; callers needing exactly-once across a crash should
    * version the view (`versions > 0`) and roll back before retrying,
    * the same recovery contract as refreshAggregate.
    */
  def refreshJoin(deltaLeft: Option[DataFrame], deltaRight: Option[DataFrame],
                  layer: String, view: String,
                  leftTable: String, rightTable: String,
                  joinKeys: Seq[String]): Unit = {
    require(joinKeys.nonEmpty, "refreshJoin needs at least one join key")
    require(deltaLeft.nonEmpty || deltaRight.nonEmpty,
      "refreshJoin needs at least one delta")
    val hasL = tableExists(layer, leftTable)
    val hasR = tableExists(layer, rightTable)
    require((hasL || deltaLeft.nonEmpty) && (hasR || deltaRight.nonEmpty),
      "first refresh must supply the bootstrap delta for each side")
    val dl = deltaLeft.map(Materialize.once)  // used in up to two terms
    val dr = deltaRight.map(Materialize.once)
    val aOld = if (hasL) Some(read(layer, leftTable)) else None
    val bOld = if (hasR) Some(read(layer, rightTable)) else None
    val viewExists = tableExists(layer, view)
    val terms = Seq(
      // first refresh over pre-existing bases = initial materialization
      if (!viewExists) for (a <- aOld; b <- bOld) yield a.join(b, joinKeys)
      else None,
      for (d <- dl; b <- bOld) yield d.join(b, joinKeys),
      for (a <- aOld; d <- dr) yield a.join(d, joinKeys),
      for (d1 <- dl; d2 <- dr) yield d1.join(d2, joinKeys)).flatten
    val newRows = terms
      .reduceOption(_ unionByName _)
      // pin the delta rows NOW — the base reads below must not observe
      // the appends that follow
      .map(Materialize.once)
    newRows.foreach { rows =>
      if (viewExists) append(rows, layer, view, Nil)
      else createOrReplace(rows, layer, view)
    }
    dl.foreach(d => if (hasL) append(d, layer, leftTable, Nil)
                    else createOrReplace(d, layer, leftTable))
    dr.foreach(d => if (hasR) append(d, layer, rightTable, Nil)
                    else createOrReplace(d, layer, rightTable))
  }

  /** Bucketed external table at this catalog's path: rows are hashed
    * into `buckets` files per partition by `bucketCols` and sorted
    * within each bucket. Two tables bucketed the SAME way on the join
    * key sort-merge join with NO exchange on either side — the shuffle
    * is paid once at write time and amortized over every subsequent
    * join/aggregation on that key. This is the 100 TB co-location
    * story: fact and dimension-fact joins on a pre-bucketed key touch
    * no network at read time.
    *
    * Bucketing metadata lives in the session catalog (saveAsTable), so
    * readers must use [[readBucketed]] (spark.table), not raw paths —
    * a path read still sees the data but loses the bucket guarantee.
    */
  /** Session-catalog name for a bucketed table, scoped to this
    * Catalog's root — two Catalog instances over different roots must
    * not alias each other's bucketed tables the way a bare
    * `layer_table` name would. The suffix is the first 16 hex chars of
    * sha-256 of the root: a 32-bit String.hashCode collides between
    * real-world path pairs often enough that one warehouse could
    * silently read another's buckets.
    */
  private def bucketedName(layer: String, table: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(root.getBytes("UTF-8"))
    val hex = digest.take(8).map(b => f"$b%02x").mkString
    s"graft_${hex}_${layer}_$table"
  }

  def writeBucketed(df: DataFrame, layer: String, table: String,
                    buckets: Int, bucketCols: Seq[String]): Unit = {
    val name = bucketedName(layer, table)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path(layer, table))
      .options(writeOptions)
      .mode("overwrite")
      .format(format)
      .saveAsTable(name)
  }

  /** Scan of a bucketed table with its bucket metadata intact. */
  def readBucketed(layer: String, table: String): DataFrame =
    spark.table(bucketedName(layer, table))

  /** Scan that unions the schemas of all files (columns added by later
    * appends come back null for older files) — parquet/orc only, where
    * per-file footers carry schemas. The schema-drift counterpart of
    * `Normalize` at the storage layer.
    */
  def readMerged(layer: String, table: String): DataFrame = {
    require(format == "parquet" || format == "orc",
      s"mergeSchema needs per-file schema footers; format '$format' has none")
    val df = spark.read.option("mergeSchema", "true").format(format)
      .load(path(layer, table))
    graft.sources.GraftEqDel.applyToPathRead(spark,
      graft.sources.GraftDv.applyToPathRead(spark, df,
        new org.apache.hadoop.fs.Path(path(layer, table))),
      new org.apache.hadoop.fs.Path(path(layer, table)))
  }

  /** Collect file-level column min/max statistics for a table into its
    * `_graft_stats` sidecar — the data-skipping tier
    * ([[graft.sources.GraftStats]]): subsequent scans (path or name
    * addressed; plain or bucketed) prune whole FILES whose stats prove
    * a pushed data filter can't match, before any footer is opened.
    * Incremental: only files not yet covered get a (distributed)
    * footer read; entries for rewritten or vanished files drop out.
    * Fail-safe by construction — files written after the last analyze
    * simply scan unpruned. Returns the number of files newly analyzed.
    */
  def analyze(layer: String, table: String): Int =
    graft.sources.GraftStats.analyze(spark, path(layer, table), format)

  /** Small-files compaction: rewrite the table into
    * ceil(bytes / targetFileBytes) files (per partition directory when
    * `partitionCols` is given). Streaming/incremental appends
    * accumulate thousands of small files; at 100 TB small files are a
    * NameNode/listing/scheduler tax AND a scan tax (each file is a
    * split floor). The rewrite goes through a sibling temp directory,
    * then a two-step rename swap (live dir aside, new dir in) so every
    * failure mode leaves a complete copy of the data on disk; the
    * brief no-path window between the renames is the price of not
    * deleting before the new data is proven in place. Returns the
    * write-task count (≈ files per partition directory).
    */
  def compact(layer: String, table: String,
              partitionCols: Seq[String] = Nil,
              targetFileBytes: Long = 128L << 20): Int = {
    import org.apache.spark.sql.functions.col
    val p = path(layer, table)
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hp).getLength
    val tasks = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    // read with schema merge where the format supports it — a plain
    // read resolves ONE file's footer and would silently drop columns
    // only newer files carry, making compaction lossy on evolved tables
    val source =
      if (format == "parquet" || format == "orc") readMerged(layer, table)
      else read(layer, table)
    // partitioned tables must repartition BY the partition columns:
    // round-robin would scatter every hive partition across all tasks,
    // producing tasks×partitions small files instead of ~1 per dir
    val balanced =
      if (partitionCols.nonEmpty)
        source.repartition(tasks, partitionCols.map(col): _*)
      else source.repartition(tasks)
    safeSwapWrite(layer, table) { tmp =>
      val writer = balanced.write
        .options(writeOptions)
        .mode("overwrite")
        .format(format)
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .save(tmp)
    }
    tasks
  }

  /** LAYOUT-PRESERVING compaction by catalog NAME: a self
    * `INSERT OVERWRITE` through the session catalog's write path.
    * [[compact]] rewrites through a plain DataFrame write, which cannot
    * tag bucket files — running it on a `bucket(n, col)` table would
    * silently downgrade every future same-spec join to the fail-safe
    * shuffle path. This variant resolves the table by name, so the
    * catalog's own truncate write runs instead: bucketed tables take
    * [[graft.sources.GraftPartitionedCow.TruncateReplaceWrite]]
    * (replacement rows re-clustered by the partition+bucket transforms
    * → ~one tagged file per (partition, bucket); staged-invisible,
    * old generation retired — or version-archived — in the driver
    * commit), plain tables the V1 versioned swap-replace.
    *
    * Streaming appends (one file per epoch per bucket) are the
    * motivating accretion: N epochs × n buckets collapse to ~n files
    * with the layout — and therefore the exchange-free join — intact.
    *
    * Safe to read-and-replace in one statement: the scan reads the old
    * generation while tasks stage dot-invisible files beside it;
    * nothing is retired until the driver commit, and a crash
    * mid-anything leaves the old generation complete.
    *
    * Scale note: this compacts the WHOLE table (one distributed
    * rewrite). For a 100 TB table, compact incrementally instead:
    * dynamic-overwrite the specific partitions whose file counts
    * accreted (`overwritePartitionsByName` of a re-coalesced slice) —
    * same machinery, partition-bounded cost.
    */
  def compactByName(layer: String, table: String): Unit = {
    require(tableExists(layer, table), s"$layer.$table does not exist")
    spark.table(sqlIdent(layer, table))
      .writeTo(sqlIdent(layer, table))
      .overwrite(org.apache.spark.sql.functions.lit(true))
  }

  /** RANGE-CLUSTERING rewrite by catalog name: reorder the whole table
    * so consecutive `sortCols` ranges land in the same files — the sort
    * strategy of Iceberg's `rewrite_data_files` / Delta `OPTIMIZE`.
    * Compaction fixes file COUNT; clustering fixes file STATS: after
    * arbitrary insert order, every file's min/max spans the whole key
    * domain and the [[analyze]] data-skipping manifest can prove
    * nothing. `repartitionByRange` (sampled range boundaries, so skew
    * balances across tasks) + an intra-task sort makes each rewritten
    * file cover a TIGHT, disjoint slice of the leading sort column —
    * a selective predicate then schedules O(1) files instead of all of
    * them, which at 100 TB is the difference between a point lookup
    * and a full scan. File sizing reuses [[compact]]'s
    * bytes/targetFileBytes heuristic. Plain (non-hive-partitioned,
    * non-bucketed) tables only: those layouts impose their own write
    * clustering, which would override this one — their per-partition
    * ordering lever is [[appendByName]]'s sortCols. Pair with
    * [[analyze]] (or let `CALL system.cluster` do both). Returns the
    * task (≈ file) count of the rewrite.
    *
    * `strategy = "zorder"` (exactly two integral columns) orders by
    * the [[mortonKey]] Morton interleave instead of lexicographically:
    * every file becomes tight in BOTH dimensions, so the skipping
    * manifest prunes predicates on EITHER column — a lexicographic
    * (x, y) sort serves only the leading one. The Delta
    * `OPTIMIZE ... ZORDER BY` semantic; the curve key is dropped
    * before writing, clustering survives as physical row order.
    */
  def clusterByName(layer: String, table: String, sortCols: Seq[String],
      targetFileBytes: Long = 128L << 20,
      strategy: String = "range"): Int = {
    require(tableExists(layer, table), s"$layer.$table does not exist")
    require(sortCols.nonEmpty, "clusterByName needs at least one sort column")
    require(strategy == "range" || strategy == "zorder",
      s"strategy must be 'range' or 'zorder', got '$strategy'")
    require(strategy != "zorder" || sortCols.length >= 2,
      "zorder clustering takes two or more columns")
    // partitioned/bucketed writes impose their own clustering, which
    // would silently override the range layout — refuse, don't no-op
    val transforms = spark.sessionState.catalogManager.catalog(sqlName)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array(layer), table))
      .partitioning().toSeq
    require(transforms.isEmpty,
      s"$layer.$table declares ${transforms.mkString(", ")}: partitioned/" +
        "bucketed layouts own their write clustering; range-cluster " +
        "applies to plain tables (per-partition ordering is appendByName's " +
        "sortCols)")
    val hp = new org.apache.hadoop.fs.Path(path(layer, table))
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hp).getLength
    val tasks =
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val cols = sortCols.map(org.apache.spark.sql.functions.col)
    val base = spark.table(sqlIdent(layer, table))
    val ordered =
      if (strategy == "zorder") {
        require(!base.columns.contains("__z"),
          "zorder clustering reserves the column name __z")
        base.withColumn("__z", curveKey(base, sortCols))
          .repartitionByRange(tasks, org.apache.spark.sql.functions.col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
      } else base
        .repartitionByRange(tasks, cols: _*)
        .sortWithinPartitions(cols: _*)
    ordered
      .writeTo(sqlIdent(layer, table))
      .overwrite(org.apache.spark.sql.functions.lit(true))
    tasks
  }

  /** INCREMENTAL compaction by catalog name: compact ONLY the hive
    * partitions whose visible file count reached `minFiles` — the
    * 100 TB path [[compactByName]]'s scale note promises. Streaming
    * appends and per-trigger epochs accrete files partition by
    * partition; rewriting the whole table to fix a handful of hot
    * partitions is the thing that does not survive scale.
    *
    * Mechanics: list leaf partition directories (driver-side NAME
    * walk, no row data), pick the accreted ones, read exactly those
    * partitions back (typed equality filters → static partition
    * pruning at the listing), re-cluster one task per partition, and
    * DYNAMIC-OVERWRITE them — the catalog's staged-invisible
    * [[graft.sources.GraftPartitionedCow.DynamicOverwriteWrite]]
    * replaces exactly the partitions present in the frame and retires
    * their superseded files at commit; untouched partitions are never
    * read, written, or listed twice. Bucket specs survive (the
    * hive-layout writer tags per (partition, bucket) as always).
    *
    * Cost: scan + rewrite of the accreted partitions only. One task
    * per compacted partition (that IS the compaction); a partition too
    * large for one task has outgrown file-count compaction and wants
    * a split of its own.
    *
    * Returns the compacted partitions' rel dirs (empty = nothing to
    * do, and nothing was read or written).
    */
  def compactPartitionsByName(layer: String, table: String,
      minFiles: Int = 4): Seq[String] = {
    require(minFiles >= 2, "minFiles < 2 would rewrite every partition")
    require(tableExists(layer, table), s"$layer.$table does not exist")
    import org.apache.spark.sql.functions.col
    val df0 = spark.table(sqlIdent(layer, table))
    // partition columns in LAYOUT order, from the catalog's own spec
    val partCols = spark.sessionState.catalogManager.catalog(sqlName)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array(layer), table))
      .partitioning().toSeq.collect {
        case t if t.name == "identity" =>
          t.references().head.fieldNames.mkString(".")
      }
    require(partCols.nonEmpty,
      s"$layer.$table has no hive partitions; use compactByName")
    val types = partCols.map { c =>
      c -> df0.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"partition column $c not in schema"))
        .dataType
    }.toMap
    val base = new org.apache.hadoop.fs.Path(path(layer, table))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // leaf dirs carrying >= minFiles visible data files
    def walk(dir: org.apache.hadoop.fs.Path, level: Int,
             rel: String): Seq[(String, Seq[String])] =
      if (level == partCols.length) {
        val files = fs.listStatus(dir).toSeq
          .filter(st => !st.isDirectory &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
        if (files.size >= minFiles) Seq((rel, rel.split("/").toSeq)) else Nil
      } else fs.listStatus(dir).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(partCols(level) + "="))
        .flatMap { st =>
          val nm = st.getPath.getName
          walk(st.getPath, level + 1, if (rel.isEmpty) nm else s"$rel/$nm")
        }
    val accreted = walk(base, 0, "")
    if (accreted.isEmpty) return Nil
    // typed per-leaf equality conjunctions, OR'd — static partition
    // pruning keeps the scan on exactly the accreted leaves. NULL
    // (__HIVE_DEFAULT_PARTITION__) leaves use isNull.
    val leafPreds = accreted.map { case (_, segs) =>
      segs.zip(partCols).map { case (seg, c) =>
        val tok = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(seg.drop(c.length + 1))
        if (tok == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .DEFAULT_PARTITION_NAME) col(c).isNull
        else col(c) === org.apache.spark.sql.functions.lit(
          graft.sources.GraftPartitionedCow.externalToken(tok, types(c)))
      }.reduce(_ && _)
    }.reduce(_ || _)
    df0.where(leafPreds)
      .repartition(partCols.map(col): _*)
      .writeTo(sqlIdent(layer, table))
      .overwritePartitions()
    accreted.map(_._1)
  }

  /** ORPHAN-FILE cleanup by catalog name — the `remove_orphan_files`
    * maintenance op every staged-commit protocol eventually needs. All
    * writers here stage DOT-PREFIXED files beside the data and publish
    * by rename; a crash mid-job leaves the staged files behind,
    * invisible to every reader but occupying storage forever. At 100 TB
    * with thousands of jobs, abandoned stages are real capacity.
    *
    * Deletes, under the table directory only:
    *  - dot-prefixed files older than `olderThanMs` (abandoned stages,
    *    `._graft_stats.tmp` leftovers) — EXCEPT checksum sidecars of
    *    live visible files (`.name.crc` where `name` exists and is
    *    itself visible);
    *  - `_temporary` committer scratch directories older than the
    *    grace (only a crashed V1 job leaves one behind).
    *
    * Never touched: visible data files, `_graft_meta` / `_graft_stats`
    * sidecars, `_graft_stream_commits` (epoch markers and crash-retry
    * manifests ARE the exactly-once state), and the `.__versions` /
    * `.__swap*` SIBLING directories (time-travel store and swap-crash
    * recovery state live outside the table dir and are managed by
    * their own protocols). The grace period is the correctness lever:
    * an in-flight job's stage is younger than any sane grace, so
    * cleanup can run concurrently with writers.
    *
    * Returns (files deleted, bytes reclaimed).
    */
  def removeOrphansByName(layer: String, table: String,
      olderThanMs: Long = 3L * 24 * 3600 * 1000): (Int, Long) = {
    require(tableExists(layer, table), s"$layer.$table does not exist")
    require(olderThanMs >= 0, "olderThanMs must be >= 0")
    val base = new org.apache.hadoop.fs.Path(path(layer, table))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - olderThanMs
    var files = 0
    var bytes = 0L
    def walk(dir: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) {
          if (n == "_temporary") {
            if (st.getModificationTime < cutoff) {
              // count through the same (checksum-filtered) listing view
              // the rest of the walk uses — getContentSummary delegates
              // to the raw FS and would count .crc sidecars
              def sub(p: org.apache.hadoop.fs.Path): Unit =
                fs.listStatus(p).foreach { c =>
                  if (c.isDirectory) sub(c.getPath)
                  else { files += 1; bytes += c.getLen }
                }
              sub(st.getPath)
              fs.delete(st.getPath, true)
            }
          } else if (!n.startsWith("_") && !n.startsWith("."))
            walk(st.getPath) // hive partition subtree
        } else if (n.startsWith(".")) {
          // `.name.crc` guarding a still-visible `name` is live metadata
          val liveCrc = n.endsWith(".crc") && {
            val guarded = n.stripPrefix(".").stripSuffix(".crc")
            !guarded.startsWith(".") && !guarded.isEmpty &&
              fs.exists(new org.apache.hadoop.fs.Path(dir, guarded))
          }
          if (!liveCrc && st.getModificationTime < cutoff) {
            files += 1
            bytes += st.getLen
            fs.delete(st.getPath, false)
          }
        }
      }
    walk(base)
    // deletion-vector sidecars whose data file is gone are inert
    // garbage from rewrites/compactions — sweep them here too
    graft.sources.GraftDv.sweepStale(fs, base)
    // tombstoned generations (reader snapshot isolation) past the
    // grace window — Iceberg's expire_snapshots role
    val (rf, rb) = graft.sources.GraftRetired.expire(fs, base, olderThanMs)
    (files + rf, bytes + rb)
  }

  /** Full-replace through a sibling temp dir and a two-step rename
    * swap: live dir aside, new dir in. Every failure mode leaves a
    * complete copy of the data on disk — a plain mode("overwrite")
    * clears the target BEFORE the new files are committed, so a failed
    * write loses the table. Shared by compact() and merge().
    */
  /** Test seam: invoked immediately before the swap-time interference
    * check, under the commit lock. Lets a spec inject a racing commit
    * into the exact window the optimistic check guards.
    */
  private[graft] var onBeforeSwapCheck: () => Unit = () => ()

  /** Visible data files as (relPath -> (size, mtime)) — the
    * interference fingerprint for full-rewrite swaps.
    */
  private def visibleFileState(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Map[String, (Long, Long)] = {
    val baseUri = base.toUri.getPath
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, (Long, Long))] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq((st.getPath.toUri.getPath.stripPrefix(baseUri)
          .stripPrefix("/"), (st.getLen, st.getModificationTime)))
      }
    // deletion-vector sidecars are part of the generation's ROW state:
    // a merge-on-read DELETE landing mid-rewrite must fail the swap
    // exactly like a data-file commit would (the rewrite read
    // pre-delete rows)
    walk(base).toMap ++ graft.sources.GraftDv.fingerprint(fs, base)
      .map { case (k, v) => (graft.sources.GraftDv.DirName + "/" + k, v) }
  }

  private def safeSwapWrite(layer: String, table: String)
                           (writeTo: String => Unit): Unit = {
    import graft.sources.GraftCommitLock
    val p = path(layer, table)
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$p.__swapnew")
    val old = new org.apache.hadoop.fs.Path(s"$p.__swapold")
    // recovery — a previous swap may have crashed between its two
    // renames, leaving the table's ONLY copy at __swapold with the
    // live slot missing. Restore it BEFORE the deletes below: clearing
    // __swapold first would destroy that only copy, and a subsequent
    // write failure would then lose the previous table version
    // entirely (mirrors overwritePartitions' publish recovery).
    // Recovery mutates the live slot, so it runs under the commit lock.
    GraftCommitLock.withLock(fs, hp, s"swap-recovery:$layer.$table") {
      if (!fs.exists(hp) && fs.exists(old)) {
        fs.mkdirs(hp.getParent)
        require(fs.rename(old, hp),
          s"swap recovery: could not restore $hp from $old")
      } else if (fs.exists(old) && versions > 0) {
        // a crash fell between the swap and the archive below — the
        // orphan IS a complete previous version: finish archiving it
        archiveVersion(fs, layer, table, old)
      }
      fs.delete(tmp, true)
      fs.delete(old, true)
    }
    // OPTIMISTIC concurrency for the (long) rewrite itself (r11 item
    // 6): fingerprint the live generation, write the replacement
    // UNLOCKED, then verify under the lock that nothing committed in
    // between — a full rewrite that swapped in over a concurrent
    // commit would silently erase it. The maintenance job is the
    // designated LOSER: it aborts cleanly (tmp discarded, live table
    // untouched) and can simply re-run — the Iceberg retry contract.
    val before = visibleFileState(fs, hp)
    writeTo(tmp.toString)
    GraftCommitLock.withLock(fs, hp, s"swap-commit:$layer.$table") {
      onBeforeSwapCheck()
      val now = visibleFileState(fs, hp)
      if (now != before) {
        fs.delete(tmp, true)
        throw new GraftCommitLock.ConcurrentCommitException(
          s"$layer.$table changed while its full rewrite ran " +
            s"(${before.size} -> ${now.size} files); the rewrite was " +
            "DISCARDED and the live table is untouched — re-run it")
      }
      swapDirIn(fs, newDir = tmp, live = hp, aside = old)
    }
    // snapshot retention (the Iceberg-snapshot semantic the reference
    // relies on): the crash-safety protocol already produced the
    // previous version as a complete directory — RETAIN it as
    // v<N> instead of deleting, pruned to the newest `versions`
    if (fs.exists(old)) {
      if (versions > 0) archiveVersion(fs, layer, table, old)
      else
        // reader snapshot isolation (r12 item 2): the swapped-aside
        // generation is TOMBSTONED, not deleted — an in-flight reader
        // that planned before this swap re-points its vanished splits
        // at the tombstone ([[graft.sources.GraftRetired]]); GC via
        // remove_orphans
        graft.sources.GraftRetired.retireRoot(fs, hp, old)
    }
    // maintenance policy outside the lock (retired.expire_ms GC)
    graft.sources.GraftMaintenance.afterCommit(spark, fs, hp)
  }

  private def versionsDir(layer: String, table: String) =
    new org.apache.hadoop.fs.Path(s"${path(layer, table)}.__versions")

  /** Move a complete previous table copy into the version store as
    * the next v<N> and prune beyond the retention window.
    */
  private def archiveVersion(fs: org.apache.hadoop.fs.FileSystem,
                             layer: String, table: String,
                             from: org.apache.hadoop.fs.Path): Unit = {
    val dir = versionsDir(layer, table)
    fs.mkdirs(dir)
    val next = history(layer, table).lastOption.getOrElse(0) + 1
    require(fs.rename(from, new org.apache.hadoop.fs.Path(dir, f"v$next%06d")),
      s"version archive: could not retain $from as v$next")
    history(layer, table).dropRight(versions).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, f"v$v%06d"), true)
    }
  }

  /** Retained version numbers for a versioned table, oldest first.
    * Version N is the table as it was BEFORE the (N+1)-th retained
    * replace — Iceberg-snapshot-style history without a metastore.
    */
  def history(layer: String, table: String): Seq[Int] = {
    val dir = versionsDir(layer, table)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{6}")).map(_.drop(1).toInt).sorted
  }

  /** Expire retained time-travel versions beyond the newest `keep` —
    * Iceberg's `expire_snapshots` for the directory version store.
    * Storage-only maintenance: the LIVE table is untouched, and the
    * write-time retention window (`versions`) keeps pruning on its
    * own; this is the manual lever for reclaiming an over-retained
    * store (e.g. after lowering the retention policy). Returns
    * (versions expired, bytes reclaimed). A concurrent `VERSION AS
    * OF` of an expired version fails on its next file read — the
    * same contract as Iceberg expiring a snapshot a reader holds.
    */
  def expireVersionsByName(layer: String, table: String,
      keep: Int): (Int, Long) = {
    require(keep >= 0, s"keep must be >= 0, got $keep")
    val dir = versionsDir(layer, table)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gone = history(layer, table).dropRight(keep)
    var bytes = 0L
    gone.foreach { v =>
      val p = new org.apache.hadoop.fs.Path(dir, f"v$v%06d")
      bytes += fs.getContentSummary(p).getLength
      fs.delete(p, true)
    }
    (gone.size, bytes)
  }

  /** Time-travel read of a retained version. */
  def readVersion(layer: String, table: String, version: Int): DataFrame = {
    require(history(layer, table).contains(version),
      s"$layer.$table has no retained version $version " +
        s"(history: ${history(layer, table).mkString(", ")})")
    val vDir = new org.apache.hadoop.fs.Path(
      versionsDir(layer, table), f"v$version%06d")
    val df = spark.read.format(format).options(readOptions)
      .load(vDir.toString)
    // archived generations carry their deletion-vector and
    // equality-delete sidecars
    graft.sources.GraftEqDel.applyToPathRead(spark,
      graft.sources.GraftDv.applyToPathRead(spark, df, vDir), vDir)
  }

  /** Roll the live table back to a retained version. The replaced
    * current state is itself archived first (rollback is one more
    * version, never a deletion), so a rollback can be rolled back.
    */
  def restoreVersion(layer: String, table: String, version: Int): Unit =
    createOrReplace(readVersion(layer, table, version), layer, table)

  /** [[restoreVersion]] through the session catalog's OWN write path:
    * the truncate-replace write re-clusters rows by the table's
    * declared transforms, so a bucketed/partitioned table keeps its
    * layout (and its exchange-free joins) across a rollback — the
    * path-addressed [[restoreVersion]] writes a plain frame and would
    * drop bucket tags. Same never-a-deletion contract: the catalog
    * write archives the replaced current state as one more version.
    */
  def restoreVersionByName(layer: String, table: String,
      version: Int): Unit =
    readVersion(layer, table, version)
      .writeTo(sqlIdent(layer, table))
      .overwrite(org.apache.spark.sql.functions.lit(true))

  /** Incremental read between two retained versions (`to` = None
    * reads the live table): the row-level changes as an `__op`-tagged
    * frame ("insert" rows appeared, "delete" rows vanished; an update
    * is a delete+insert pair — exactly the shape
    * [[graft.streaming.Streaming.mergeSink]]-style appliers consume).
    * Multiset semantics via exceptAll, so duplicate rows diff by
    * count. A snapshot diff is inherently a two-table scan + shuffle;
    * use it at the cadence snapshots are taken, not per query.
    */
  def changesBetween(layer: String, table: String, from: Int,
                     to: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = readVersion(layer, table, from)
    val b = to.map(readVersion(layer, table, _)).getOrElse(read(layer, table))
    b.exceptAll(a).withColumn("__op", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("__op", lit("delete")))
  }

  /** Z-order-clustered write: range-partition and sort by the Morton
    * interleave of two columns so every output file is tight in BOTH
    * dimensions — parquet min/max row-group skipping then prunes scans
    * filtered on EITHER column, where a lexicographic (x, y) sort only
    * serves the leading one. The curve key is dropped before writing;
    * clustering survives as physical row order.
    */
  /** The Z-order curve key for N ≥ 2 integral columns, each rescaled
    * to the interleave's per-column bit domain from the frame's actual
    * min/max ([[graft.functions.ZOrderHelper.bitsFor]]: 16 bits up to
    * 3 columns, shrinking so the code always fits 63 bits). The
    * interleave consumes LOW bits — raw keys beyond the domain (or
    * negative) would silently degrade clustering to hashing, so each
    * column rescales to [0, 2^bits − 1] (one extra 1-row aggregate at
    * write time; double rounding is fine — the curve key orders data,
    * it never answers queries). Two columns produce bit-identical
    * codes to the original Morton pair.
    */
  private def curveKey(df: DataFrame,
      cols: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, greatest, least, lit, max, min}
    val bits = graft.functions.ZOrderHelper.bitsFor(cols.length)
    val lim = (1L << bits) - 1
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val Array(r) = df.agg(aggs.head, aggs.tail: _*).collect()
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val lo = r.getLong(2 * i)
      val range = math.max(1L, r.getLong(2 * i + 1) - lo)
      least(greatest(
        ((col(c) - lit(lo)).cast("double") * lim.toDouble / range)
          .cast("long"),
        lit(0L)), lit(lim))
    }
    graft.functions.ZOrderCode.of(scaled, bits)
  }

  def writeClustered(df: DataFrame, layer: String, table: String,
                     zCols: (String, String), files: Int): Unit =
    writeClustered(df, layer, table, Seq(zCols._1, zCols._2), files)

  /** N-column form (r11 item 5): interleaves every column, so a
    * three-predicate workload prunes on any of them.
    */
  def writeClustered(df: DataFrame, layer: String, table: String,
                     zCols: Seq[String], files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(zCols.length >= 2, "writeClustered needs two or more columns")
    require(!df.columns.contains("__z"),
      "writeClustered reserves the column name __z")
    val z = curveKey(df, zCols)
    // temp-dir + rename swap: a re-cluster that fails mid-write must
    // not have cleared the live table first
    safeSwapWrite(layer, table) { tmp =>
      df.withColumn("__z", z)
        .repartitionByRange(files, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write
        .options(writeOptions)
        .mode("overwrite")
        .format(format)
        .save(tmp)
    }
  }

  /** Row-level MERGE (upsert + delete) without a table format that
    * supports it natively: matched target rows are replaced by the
    * update (or dropped when the update's `deleteCol` is true),
    * unmatched updates are inserted. When `partitionCols` is given the
    * rewrite is SCOPED — only the hive partitions present in `updates`
    * are read, merged, and dynamically overwritten; every other
    * partition's files are untouched. That scoping is what makes
    * row-level merge affordable at 100 TB: cost is proportional to the
    * touched partitions, not the table. (The id join is a shuffle or
    * broadcast equi-join; nothing ever collects to the driver.)
    *
    * `updates` must carry the target's full schema (plus `deleteCol`
    * if deletions are wanted). PRECONDITION of the partition-scoped
    * form: a key's partition value is STABLE — an update row must
    * carry the same partition value as the target row it matches,
    * or the old copy (living in an untouched partition) survives
    * beside the new one. Rows that MOVE partitions need the
    * unpartitioned full-rewrite form (partitionCols = Nil). Returns
    * inserted/updated/deleted counts.
    */
  def merge(updates: DataFrame, layer: String, table: String,
            keyCols: Seq[String], partitionCols: Seq[String] = Nil,
            deleteCol: Option[String] = None): MergeStats = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val target = read(layer, table)
    val dataCols = target.columns.toSeq
    // NULL flags must not slip between filter(!del) and filter(del) —
    // that would silently delete the row while counting it as updated
    val del = deleteCol
      .map(c => coalesce(col(c).cast("boolean"), lit(false)))
      .getOrElse(lit(false))
    val ups = updates.transform(Materialize.once)
    require(
      ups.count() == ups.select(keyCols.map(col): _*).distinct().count(),
      "merge updates must be unique per key (ambiguous upsert/delete otherwise)")
    // scope the rewrite to the partitions the updates touch; the
    // touched target slice feeds three consumers below — one scan
    val scoped = (
      if (partitionCols.nonEmpty)
        target.join(ups.select(partitionCols.map(col): _*).distinct(),
          partitionCols, "left_semi")
      else target
    ).transform(Materialize.once)
    val scopedKeys = scoped.select(keyCols.map(col): _*).distinct()
      .transform(Materialize.once)
    val upsKeys = ups.select(keyCols.map(col): _*).distinct()
    val keep = scoped.join(upsKeys, keyCols, "left_anti")
    val applied = ups.filter(!del).select(dataCols.map(col): _*)
    val matchedKeys = scopedKeys.join(upsKeys, keyCols, "left_semi").count()
    val deleted = ups.filter(del).select(keyCols.map(col): _*).distinct()
      .join(scopedKeys, keyCols, "left_semi").count()
    val merged = keep.select(dataCols.map(col): _*).union(applied)
      // the union reads `scoped`/`keep` lazily while the write below
      // replaces the same files — materialize before overwriting
      .transform(Materialize.once)
    merged.count() // force materialization before the paths are replaced
    if (partitionCols.nonEmpty) {
      overwritePartitions(merged, layer, table, partitionCols)
      // dynamic overwrite cannot DELETE a partition: a touched
      // partition whose every row was removed writes no files and the
      // stale directory would resurrect the deleted rows — drop those
      // directories explicitly (touched minus surviving; both sets are
      // delta-bounded)
      val touched = ups.select(partitionCols.map(col): _*).distinct()
        .collect().map(_.toSeq).toSet
      val surviving = merged.select(partitionCols.map(col): _*).distinct()
        .collect().map(_.toSeq).toSet
      val base = new org.apache.hadoop.fs.Path(path(layer, table))
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (touched -- surviving).foreach { values =>
        val dir = partitionCols.zip(values)
          .map { case (c, v) => s"$c=$v" }.mkString("/")
        fs.delete(new org.apache.hadoop.fs.Path(base, dir), true)
      }
    } else {
      safeSwapWrite(layer, table) { tmp =>
        merged.write.options(writeOptions).mode("overwrite")
          .format(format).save(tmp)
      }
    }
    MergeStats(
      inserted = ups.filter(!del).count() - (matchedKeys - deleted),
      updated = matchedKeys - deleted,
      deleted = deleted)
  }
}

final case class MergeStats(inserted: Long, updated: Long, deleted: Long)

object Catalog {
  /** Storage formats this catalog round-trips. Parquet is the scale
    * default (columnar, pushdown, pruning); ORC is the columnar
    * alternative with the same properties; JSON/CSV exist for
    * interchange layers — row-oriented, schema-on-read, no pushdown —
    * and should stay at the ingest edge of a 100 TB pipeline.
    */
  val Formats: Set[String] = Set("parquet", "orc", "json", "csv")
}
