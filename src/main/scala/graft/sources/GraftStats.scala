package graft.sources

import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level data skipping for warehouse tables — the pruning tier
  * BETWEEN hive partition directories and parquet row-group filters.
  *
  * Why it exists at 100 TB: partition pruning only helps predicates on
  * the partition columns, and parquet's own row-group statistics only
  * help AFTER every file's footer has been opened — at millions of
  * files the footer reads ARE the bottleneck (each is a remote
  * round-trip before a single row is skipped). The lakehouse answer
  * (Delta's stats in the transaction log, Iceberg's manifest metrics)
  * is a driver-side manifest of per-file column min/max collected ONCE,
  * consulted at planning time: a selective scan then never lists, opens
  * or schedules the files that cannot match. This is that manifest for
  * the graft warehouse, mirroring the role of the metastore metrics
  * behind the reference's Iceberg tables
  * (/root/reference/airflow/dags/scripts/process_covid_ods.py:87 —
  * `overwritePartitions` commits rewrite Iceberg manifest metrics the
  * same way).
  *
  * Manifest LAYOUT (r11 verdict item 1 — the scale shape): the
  * manifest is SHARDED BY PARTITION DIRECTORY under
  * `_graft_stats.d/` — one shard file per hive partition directory
  * (one for the table root when unpartitioned), plus a tiny `_index`
  * manifest-list (one fingerprint line per partition). This is
  * Iceberg's manifest-list design, and it is what bounds metadata work
  * by the DELTA instead of the table:
  *  - a WRITE touching one partition reconciles and rewrites only that
  *    partition's shard (the index fingerprint proves every other
  *    shard fresh without opening it) — sibling shards stay
  *    byte-identical;
  *  - a partition-pruned QUERY loads only the shards of the
  *    directories its surviving files live in — the manifest read is
  *    proportional to the partitions scanned, not the table.
  * A legacy single-file `_graft_stats` manifest (pre-r12) is still
  * read (shards win) and is migrated into shards by the next full
  * [[analyze]].
  *
  * Contract (fail-safe by construction — pruning may only ever SKIP a
  * file that provably holds no matching row):
  *  - stats are collected by [[analyze]] from parquet FOOTERS only
  *    (distributed, no data rows read) and keyed by (relative path,
  *    file length, mtime); a file with no valid entry is always read;
  *  - writers never need to maintain the manifest: appends, COW
  *    rewrites and compactions produce new (name, length) keys, so
  *    their files simply scan unpruned until the next [[analyze]];
  *  - only types whose parquet statistics ordering provably matches
  *    catalyst's are collected: signed integers, DATE (epoch-day int),
  *    TIMESTAMP micros (catalyst-internal long), UTF8 strings (both
  *    orders are unsigned byte-wise) and booleans. Float/double are
  *    deliberately NOT collected — parquet min/max excludes NaN while
  *    Spark orders NaN greater than every value, so a max-based bound
  *    could wrongly skip a NaN-holding file. Truncated binary stats
  *    stay valid bounds (the writer rounds the max up), so they prune
  *    less, never wrongly.
  */
object GraftStats {

  private val LegacyFileName = "_graft_stats"
  private[graft] val ShardDirName = "_graft_stats.d"
  private val IndexFileName = "_index"

  /** Per-column file statistics, values in CATALYST-INTERNAL form:
    * kind 'l' = integer-like held as Long (byte/short/int/long/
    * date-days/timestamp-micros), 's' = string (UTF8 ordering),
    * 'b' = boolean. `nulls` is -1 when the footer did not record a
    * null count. min/max are None when every value in the file is
    * null — distinct from the column being absent (no usable stats).
    */
  final case class ColStats(kind: Char, nulls: Long,
      min: Option[Any], max: Option[Any],
      // mergeable HyperLogLog register set (r12 item 7 — the
      // graft.functions.HllAgg algebra, 64 registers): per-file NDV
      // that merges across files/shards by elementwise max. Seq (not
      // Array) so structural equality keeps unchanged shards
      // byte-identical. None until `analyze(..., ndv_columns)` runs.
      hll: Option[Seq[Int]] = None)

  final case class FileStats(size: Long, mtime: Long, rows: Long,
      cols: Map[String, ColStats])

  /** HLL cardinality estimate from a (merged) register set — the
    * Flajolet alpha_64 raw estimate with the small-range
    * linear-counting branch.
    */
  def ndvEstimate(regs: Seq[Int]): Long = {
    val m = graft.functions.HllAgg.M
    val denom = regs.iterator.map(r => 1.0 / (1L << r)).sum
    val raw = 0.709 * m * m / denom
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0)
      math.round(m * math.log(m.toDouble / zeros))
    else math.round(raw)
  }

  // ---- manifest codec (line-based, like _graft_meta) ------------------
  // line:  relPathB64 \t size \t mtime \t rows \t col(col)*
  // col:   nameB64:kind:nulls:minEnc:maxEnc   ('' = absent; strings b64)

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), "UTF-8")

  private def encVal(kind: Char, v: Any): String = kind match {
    case 'l' => v.toString
    case 's' => b64(v.asInstanceOf[String])
    case 'b' => if (v.asInstanceOf[Boolean]) "1" else "0"
  }

  private def decVal(kind: Char, s: String): Any = kind match {
    case 'l' => s.toLong
    case 's' => unb64(s)
    case 'b' => s == "1"
  }

  private def encodeLines(m: Map[String, FileStats]): String = {
    val sb = new StringBuilder
    // deterministic order: a shard reconciled to the same content is
    // byte-identical, whatever map iteration produced it
    m.toSeq.sortBy(_._1).foreach { case (rel, st) =>
      sb.append(b64(rel)).append('\t').append(st.size).append('\t')
        .append(st.mtime).append('\t').append(st.rows).append('\t')
      sb.append(st.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
        s"${b64(c)}:${cs.kind}:${cs.nulls}:" +
          s"${cs.min.map(encVal(cs.kind, _)).getOrElse("")}:" +
          s"${cs.max.map(encVal(cs.kind, _)).getOrElse("")}" +
          cs.hll.map(r => ":" + r.map(v => f"$v%02x").mkString)
            .getOrElse("")
      }.mkString(""))
      sb.append('\n')
    }
    sb.toString
  }

  private def parseLines(lines: Seq[String]): Map[String, FileStats] =
    lines.filter(_.nonEmpty).flatMap { line =>
      try {
        val p = line.split('\t')
        val cols =
          if (p.length < 5 || p(4).isEmpty) Map.empty[String, ColStats]
          else p(4).split('').map { ce =>
            // values may contain ':' only in b64 padding-free alphabet
            // (they can't: b64 uses [A-Za-z0-9+/=]); split is safe
            val q = ce.split(':')
            val kind = q(1).charAt(0)
            val mn = if (q.length > 3 && q(3).nonEmpty)
              Some(decVal(kind, q(3))) else None
            val mx = if (q.length > 4 && q(4).nonEmpty)
              Some(decVal(kind, q(4))) else None
            val hll = if (q.length > 5 && q(5).nonEmpty)
              Some(q(5).grouped(2).map(Integer.parseInt(_, 16)).toSeq)
            else None
            unb64(q(0)) -> ColStats(kind, q(2).toLong, mn, mx, hll)
          }.toMap
        Some(unb64(p(0)) -> FileStats(p(1).toLong, p(2).toLong,
          p(3).toLong, cols))
      } catch { case scala.util.control.NonFatal(_) => None }
    }.toMap

  /** One manifest file's entries. OPEN/READ failures propagate —
    * manifest files are published by atomic tmp+rename, so an
    * unopenable shard is external interference, not a normal state
    * (and the zero-read proofs in GraftStatsSpec rely on an unread
    * shard never being opened at all). Individual unparseable LINES
    * are dropped (fail-safe: their files simply scan unpruned).
    */
  private def readFileEntries(fs: FileSystem,
      f: Path): Map[String, FileStats] =
    if (!fs.exists(f)) Map.empty
    else {
      val in = fs.open(f)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      parseLines(lines)
    }

  /** Shard key of a table-relative file path: its directory chain
    * (`year=2020/month=03`), "" for root-level files. One shard per
    * hive partition directory.
    */
  def shardKeyOf(rel: String): String = {
    val i = rel.lastIndexOf('/')
    if (i < 0) "" else rel.substring(0, i)
  }

  private def b64url(s: String): String =
    Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes("UTF-8"))
  private def unb64url(s: String): String =
    new String(Base64.getUrlDecoder.decode(s), "UTF-8")

  private def shardDir(tableDir: Path): Path =
    new Path(tableDir, ShardDirName)
  private[graft] def shardFile(tableDir: Path, key: String): Path =
    new Path(shardDir(tableDir), "s-" + b64url(key))

  /** ALL entries: every shard plus any legacy flat manifest (shard
    * entries win). Diagnostic/spec surface; planning uses the scoped
    * reads below.
    */
  def read(fs: FileSystem, tableDir: Path): Map[String, FileStats] = {
    val legacy = readFileEntries(fs, new Path(tableDir, LegacyFileName))
    val sd = shardDir(tableDir)
    val shards =
      if (!fs.exists(sd)) Map.empty[String, FileStats]
      else fs.listStatus(sd).toSeq
        .filter(st => !st.isDirectory && st.getPath.getName.startsWith("s-"))
        .flatMap(st => readFileEntries(fs, st.getPath)).toMap
    legacy ++ shards
  }

  /** Entries for files living under the given shard keys ONLY — the
    * planning-time read. A partition-pruned query therefore parses
    * only the shards of directories it actually touches; every other
    * shard file is never opened.
    */
  def readForDirs(fs: FileSystem, tableDir: Path,
      keys: Set[String]): Map[String, FileStats] = {
    val legacy = readFileEntries(fs, new Path(tableDir, LegacyFileName))
    val shards = keys.toSeq
      .flatMap(k => readFileEntries(fs, shardFile(tableDir, k))).toMap
    legacy ++ shards
  }

  /** Caching shard-scoped reader held by one scan: each partition
    * directory's shard is opened AT MOST ONCE per scan, and only the
    * directories of files actually planned are ever opened. Thread-safe
    * (planning and statistics estimation may interleave).
    */
  final class ScopedReader(fs: FileSystem, tableDir: Path) {
    private val dirUri = tableDir.toUri.getPath
    private val cache =
      scala.collection.mutable.HashMap.empty[String, Map[String, FileStats]]
    private lazy val legacy: Map[String, FileStats] =
      readFileEntries(fs, new Path(tableDir, LegacyFileName))

    private def relOf(p: String): Option[String] =
      if (p.startsWith(dirUri)) Some(p.stripPrefix(dirUri).stripPrefix("/"))
      else None

    /** Entries covering (at least) the given planned files. */
    def forFiles(files: Seq[PartitionedFile]): Map[String, FileStats] =
      synchronized {
        val keys = files.iterator
          .flatMap(f => relOf(f.toPath.toUri.getPath).map(shardKeyOf))
          .toSet
        keys.foreach { k =>
          if (!cache.contains(k))
            cache(k) = readFileEntries(fs, shardFile(tableDir, k))
        }
        legacy ++ keys.iterator.flatMap(cache(_))
      }
  }

  private def writeManifestFile(fs: FileSystem, dst: Path,
      content: String): Unit = {
    fs.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    // FileContext rename with OVERWRITE — no window where the shard
    // does not exist. Auto-analyze runs after every commit (each
    // streaming epoch), so a delete-then-rename here could fail a scan
    // that passed the exists() check and lost the race to the delete.
    GraftDv.replaceAtomic(fs, tmp, dst)
  }

  // ---- manifest-list index ---------------------------------------------
  // `_graft_stats.d/_index`: one line per partition directory —
  // b64(shardKey) \t fingerprint-of-its-(name,size,mtime)-file-set.
  // Lets analyze prove a shard FRESH without opening it: O(#partitions)
  // driver work to decide, O(changed partitions) to reconcile. Purely
  // advisory — absent/stale index just means shards get re-read (and
  // rewritten only if their content actually changed).

  private def readIndex(fs: FileSystem, tableDir: Path)
      : Map[String, String] =
    try {
      val f = new Path(shardDir(tableDir), IndexFileName)
      if (!fs.exists(f)) Map.empty
      else {
        val in = fs.open(f)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList finally in.close()
        lines.filter(_.nonEmpty).flatMap { l =>
          try {
            val p = l.split('\t')
            Some(unb64url(p(0)) -> p(1))
          } catch { case scala.util.control.NonFatal(_) => None }
        }.toMap
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  private def writeIndex(fs: FileSystem, tableDir: Path,
      idx: Map[String, String]): Unit = {
    val content = idx.toSeq.sortBy(_._1)
      .map { case (k, fp) => s"${b64url(k)}\t$fp" }.mkString("", "\n", "\n")
    writeManifestFile(fs, new Path(shardDir(tableDir), IndexFileName),
      content)
  }

  /** Deterministic fingerprint of one directory's (name, size, mtime)
    * file set — equality means the shard reconciled against exactly
    * this listing is already current.
    */
  private def fingerprint(files: Seq[(String, Long, Long)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    files.sortBy(_._1).foreach { case (rel, len, mt) =>
      md.update(rel.getBytes("UTF-8"))
      md.update(0.toByte) // unambiguous field separator
      md.update(s"$len:$mt".getBytes("UTF-8"))
      md.update(10.toByte)
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  // ---- collection (distributed parquet footer reads) ------------------

  /** Hadoop conf carrier for the executor-side footer reads; the same
    * write/readFields round-trip [[GraftPartitionedCow]] uses.
    */
  private final class SerConf(@transient var value: Configuration)
    extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false); value.readFields(in)
    }
  }

  def analyze(spark: SparkSession, tableDir: String, format: String): Int =
    analyze(spark, tableDir, format, None)

  /** Collect (incrementally) per-file stats for parquet data files
    * under `tableDir` into the per-partition shards.
    *
    * `scope = Some(dirKeys)`: reconcile ONLY those partition
    * directories (the auto-analyze path — a committed write passes the
    * directories it just published into, so the refresh lists, reads
    * and rewrites metadata proportional to the WRITE, not the table).
    * `scope = None`: full reconciliation — walks the whole tree,
    * deletes shards of vanished directories, migrates any legacy flat
    * manifest, and trusts the `_index` fingerprints to skip opening
    * shards of unchanged directories.
    *
    * Per shard: entries whose (length, mtime) still match are kept,
    * entries for vanished files drop, and only NEW files get a footer
    * read — priced as ONE distributed job across all dirty shards.
    * A shard whose reconciled content is unchanged is NOT rewritten
    * (byte-identical siblings). Returns the number of files newly
    * analyzed. Non-parquet formats are not collected (their scans
    * simply never prune — same fail-safe as no manifest).
    */
  def analyze(spark: SparkSession, tableDir: String, format: String,
      scope: Option[Set[String]]): Int = {
    if (format != "parquet") return 0
    val dir = new Path(tableDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return 0
    val dirUri = dir.toUri.getPath

    // census for manifest-served scan planning
    // ([[GraftManifestListing]]): directory mtimes captured during the
    // SAME walk, analyze-time stamped before it starts (guard-band
    // conservative)
    // the sidecar dir must pre-exist or its creation at publish time
    // would bump the ROOT mtime after the walk recorded it (the census
    // therefore arms from the SECOND analyze on a fresh stats dir)
    if (scope.isEmpty) fs.mkdirs(shardDir(dir))
    val censusStartedAt = System.currentTimeMillis()
    val censusDirs = Seq.newBuilder[(String, Long)]
    def walk(p: Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) {
          censusDirs += ((st.getPath.toUri.getPath.stripPrefix(dirUri)
            .stripPrefix("/"), st.getModificationTime))
          walk(st.getPath)
        }
        else Seq((st.getPath.toUri.getPath.stripPrefix(dirUri)
          .stripPrefix("/"), st.getLen, st.getModificationTime))
      }
    /** Files directly inside one partition directory (non-recursive —
      * nested directories belong to other shards).
      */
    def listDir(key: String): Seq[(String, Long, Long)] = {
      val p = if (key.isEmpty) dir else new Path(dir, key)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (st.isDirectory || n.startsWith("_") || n.startsWith(".")) Nil
        else Seq((st.getPath.toUri.getPath.stripPrefix(dirUri)
          .stripPrefix("/"), st.getLen, st.getModificationTime))
      }
    }

    val legacyPath = new Path(dir, LegacyFileName)
    val legacy = readFileEntries(fs, legacyPath)
    val legacyByDir = legacy.groupBy { case (rel, _) => shardKeyOf(rel) }

    val walkedFiles: Option[Seq[(String, Long, Long)]] = scope match {
      case None =>
        censusDirs += (("", fs.getFileStatus(dir).getModificationTime))
        Some(walk(dir))
      case Some(_) => None
    }
    val byDir: Map[String, Seq[(String, Long, Long)]] = scope match {
      case None => walkedFiles.get
        .groupBy { case (rel, _, _) => shardKeyOf(rel) }
      case Some(keys) =>
        keys.map(k => k -> listDir(k)).filter(_._2.nonEmpty).toMap
    }
    val index = readIndex(fs, dir)
    val existingShardKeys: Set[String] = scope match {
      case Some(keys) => keys
      case None =>
        val sd = shardDir(dir)
        if (!fs.exists(sd)) Set.empty
        else fs.listStatus(sd).toSeq
          .filter(st => !st.isDirectory && st.getPath.getName.startsWith("s-"))
          .flatMap { st =>
            try Some(unb64url(st.getPath.getName.stripPrefix("s-")))
            catch { case scala.util.control.NonFatal(_) => None }
          }.toSet
    }
    val allKeys: Set[String] = scope.getOrElse(
      byDir.keySet ++ existingShardKeys ++ legacyByDir.keySet)

    final case class Dirty(key: String, fp: String,
        kept: Map[String, FileStats], todo: Seq[(String, Long, Long)],
        shardEntries: Map[String, FileStats])
    val dirty = Seq.newBuilder[Dirty]
    var indexChanged = legacy.nonEmpty // migration always rewrites it
    var newIndex = index
    allKeys.foreach { key =>
      val cur = byDir.getOrElse(key, Nil)
      if (cur.isEmpty) {
        // vanished directory: retire its shard + index entry
        val sf = shardFile(dir, key)
        if (fs.exists(sf)) fs.delete(sf, false)
        if (newIndex.contains(key)) { newIndex -= key; indexChanged = true }
      } else {
        val fp = fingerprint(cur)
        // index fingerprint match proves the shard current without
        // opening it — UNLESS a legacy manifest is still being
        // migrated (its entries may not have reached the shard yet)
        if (!(legacy.isEmpty && index.get(key).contains(fp))) {
          val shardEntries = readFileEntries(fs, shardFile(dir, key))
          val prior = legacyByDir.getOrElse(key,
            Map.empty[String, FileStats]) ++ shardEntries
          val kept = cur.flatMap { case (rel, len, mt) =>
            prior.get(rel).filter(st => st.size == len && st.mtime == mt)
              .map(rel -> _)
          }.toMap
          val todo = cur.filterNot { case (rel, _, _) => kept.contains(rel) }
          dirty += Dirty(key, fp, kept, todo, shardEntries)
          if (!newIndex.get(key).contains(fp)) {
            newIndex += key -> fp; indexChanged = true
          }
        }
      }
    }
    // full mode: drop index entries for keys outside the live tree
    // (scope mode leaves them — other partitions are out of scope)
    if (scope.isEmpty) {
      val drop = newIndex.keySet -- byDir.keySet
      if (drop.nonEmpty) { newIndex = newIndex -- drop; indexChanged = true }
    }

    val pend = dirty.result()
    val todoAll = pend.flatMap(p => p.todo.map { case (rel, len, mt) =>
      (rel, s"$dirUri/$rel", len, mt)
    })
    // ONE distributed footer job across every dirty shard's new files
    val sc = new SerConf(conf)
    val fresh: Map[String, FileStats] =
      if (todoAll.isEmpty) Map.empty
      else {
        val slices = math.max(1, math.min(todoAll.size,
          spark.sparkContext.defaultParallelism))
        spark.sparkContext.parallelize(todoAll, slices)
          .map { case (rel, abs, len, mt) =>
            rel -> footerStats(sc.value, abs, len, mt)
          }
          .collect().toMap
      }
    pend.foreach { p =>
      val entries = p.kept ++ p.todo.map { case (rel, _, _) =>
        rel -> fresh(rel)
      }
      // rewrite only when the reconciled content differs — untouched
      // sibling shards stay byte-identical
      if (entries != p.shardEntries)
        writeManifestFile(fs, shardFile(dir, p.key), encodeLines(entries))
    }
    if (indexChanged) writeIndex(fs, dir, newIndex)
    // legacy migration completes on a FULL analyze only (a scoped one
    // may not have visited every directory the flat file covers)
    if (scope.isEmpty && legacy.nonEmpty) fs.delete(legacyPath, false)
    // FULL analyze refreshes the listing census ([[GraftManifestListing]]
    // — manifest-served scan planning); scoped analyzes leave it, and
    // the freshness proof simply declines until the next full pass
    walkedFiles.foreach(files => GraftManifestListing.writeCensus(
      fs, dir, censusStartedAt, censusDirs.result(), files))
    todoAll.size
  }

  /** Data-pass counter for the NDV build (test seam mirroring
    * [[GraftBloom.buildReads]]): incremented by the number of files
    * the incremental build actually re-reads.
    */
  private[graft] val ndvBuildReads = new java.util.concurrent.atomic.LongAdder

  /** Publish WRITER-ACCUMULATED NDV registers (r13 item 4 — the
    * writer-side bloom pattern applied to HLL): the hive-layout
    * DataWriter reduces each open file's registers as rows stream
    * through and ships them in its commit message; this merges them
    * into the manifest entries keyed by the PUBLISHED file's live
    * identity, with zero data re-read. Runs post-commit in the
    * advisory auto-analyze hook, AFTER the footer analyze has created
    * the entries. Files whose entries are missing or identity-stale
    * are skipped — the analyze backstop owns them.
    */
  def publishShippedNdv(spark: SparkSession, tableDir: Path,
      shipped: Map[String, Seq[(String, Char, Array[Int])]]): Int = {
    if (shipped.isEmpty) return 0
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirUri = tableDir.toUri.getPath
    val byRel: Map[String, Seq[(String, Char, Array[Int])]] =
      shipped.toSeq.flatMap { case (finalPath, cols) =>
        val up = new Path(finalPath).toUri.getPath
        if (!up.startsWith(dirUri)) None
        else {
          val rel = up.stripPrefix(dirUri).stripPrefix("/")
          if (rel.split('/').exists(s =>
              s.startsWith("_") || s.startsWith("."))) None
          else Some(rel -> cols)
        }
      }.toMap
    if (byRel.isEmpty) return 0
    var published = 0
    byRel.groupBy { case (rel, _) => shardKeyOf(rel) }.foreach {
      case (key, rels) =>
        val sf = shardFile(tableDir, key)
        val entries = readFileEntries(fs, sf)
        val updated = rels.foldLeft(entries) { case (m, (rel, cols)) =>
          m.get(rel) match {
            case Some(st) =>
              val live =
                try {
                  val s = fs.getFileStatus(new Path(tableDir, rel))
                  s.getLen == st.size && s.getModificationTime == st.mtime
                } catch { case scala.util.control.NonFatal(_) => false }
              if (!live) m // stale or gone: the backstop's job
              else {
                published += 1
                val cols2 = cols.foldLeft(st.cols) {
                  case (cm, (nm, kind, regs)) =>
                    val k = cm.keys.find(_.equalsIgnoreCase(nm))
                      .getOrElse(nm.toLowerCase)
                    val cs = cm.getOrElse(k, ColStats(kind, -1L, None, None))
                    cm.updated(k, cs.copy(hll = Some(regs.toSeq)))
                }
                m.updated(rel, st.copy(cols = cols2))
              }
            case None => m // no footer entry yet: backstop
          }
        }
        if (updated != entries)
          writeManifestFile(fs, sf, encodeLines(updated))
    }
    published
  }

  /** NDV statistics (r12 item 7): attach a mergeable HyperLogLog
    * register set ([[graft.functions.HllAgg]], 64 registers) to each
    * file's manifest entry for the named columns. INCREMENTAL like the
    * bloom build: a file whose identity-valid entry already carries
    * registers for every requested column is never re-read; the rest
    * pay ONE distributed data pass (per-split partial registers,
    * elementwise-max-merged per file). Values hash as their rendered
    * token (`toString` for integer-family, the string itself for
    * strings) — deterministic, so per-shard and merged estimates are
    * reproducible. Returns (files built, files covered).
    */
  def analyzeNdv(spark: SparkSession, tableDir: Path,
      tableSchema: StructType, partitionCols: Seq[String],
      columns: Seq[String], scope: Option[Set[String]] = None): (Int, Int) = {
    require(columns.nonEmpty, "analyze ndv_columns: no columns named")
    val resolved: Seq[String] = columns.map { c =>
      val f = tableSchema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"analyze ndv_columns: column $c not in schema"))
      require(!partitionCols.exists(_.equalsIgnoreCase(c)),
        s"analyze ndv_columns: $c is a partition column — its distinct " +
          "values are the partition directories themselves")
      require(f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType |
             TimestampType | StringType | BooleanType => true
        case _ => false
      }, s"analyze ndv_columns: $c type ${f.dataType.simpleString} " +
        "unsupported (integer-family, string, boolean)")
      f.name
    }
    // footer entries first: NDV registers attach to existing rows
    analyze(spark, tableDir.toString, "parquet", scope)
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirUri = tableDir.toUri.getPath
    def listData(p: Path): Seq[(String, (Long, Long))] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("_") || nm.startsWith(".")) Nil
        else if (st.isDirectory) listData(st.getPath)
        else Seq((st.getPath.toUri.getPath.stripPrefix(dirUri)
          .stripPrefix("/"), (st.getLen, st.getModificationTime)))
      }
    val live = (scope match {
      case None => listData(tableDir)
      case Some(keys) => keys.toSeq.flatMap { k =>
        listData(if (k.isEmpty) tableDir else new Path(tableDir, k))
          .filter { case (rel, _) => shardKeyOf(rel) == k }
      }
    }).toMap
    val wanted = resolved.map(_.toLowerCase)
    val prior: Map[String, FileStats] = scope match {
      case None => read(fs, tableDir)
      case Some(keys) => readForDirs(fs, tableDir, keys)
    }
    val identityValid = prior.filter { case (rel, st) =>
      live.get(rel).contains((st.size, st.mtime))
    }
    val covered = identityValid.filter { case (_, st) =>
      wanted.forall(c => st.cols.get(c).exists(_.hll.isDefined) ||
        st.cols.keys.exists(k => k.equalsIgnoreCase(c) &&
          st.cols(k).hll.isDefined))
    }
    val toBuild = live.keySet.intersect(identityValid.keySet) -- covered.keySet
    if (toBuild.isEmpty) return (0, covered.size)
    ndvBuildReads.add(toBuild.size)

    val buildSchema = StructType(resolved.map(nm =>
      tableSchema.fields.find(_.name.equalsIgnoreCase(nm)).get))
    import org.apache.spark.sql.functions.col
    val dfBuild = spark.read.schema(buildSchema)
      .parquet(toBuild.toSeq.sorted.map(rel =>
        new Path(tableDir, rel).toString): _*)
      .select(col("_metadata.file_path").as("__f") +:
        resolved.map(col): _*)
    val theDirUri = dirUri
    val nCols = resolved.length
    val partials = dfBuild.rdd.mapPartitions { it =>
      val agg = new graft.functions.HllAgg
      val acc = scala.collection.mutable.Map.empty[String, Array[Array[Int]]]
      it.foreach { row =>
        val p0 = new Path(row.getString(0)).toUri.getPath
        val rel = if (p0.startsWith(theDirUri))
          p0.stripPrefix(theDirUri).stripPrefix("/") else p0
        val regs = acc.getOrElseUpdate(rel,
          Array.fill(nCols)(new Array[Int](graft.functions.HllAgg.M)))
        var i = 0
        while (i < nCols) {
          if (!row.isNullAt(i + 1))
            agg.reduce(regs(i), row.get(i + 1).toString)
          i += 1
        }
      }
      acc.iterator
    }.reduceByKey { (a, b) =>
      a.zip(b).map { case (x, y) =>
        var i = 0
        while (i < x.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
        x
      }
    }.collect().toMap // file-count-sized: 64 ints per column per file

    // merge registers into the entries (kept min/max/nulls intact) and
    // reconcile only the touched shards, byte-identical otherwise
    val kindOfCol: Map[String, Char] = resolved.map { nm =>
      nm.toLowerCase -> (buildSchema.fields
        .find(_.name.equalsIgnoreCase(nm)).get.dataType match {
        case StringType => 's'
        case BooleanType => 'b'
        case _ => 'l'
      })
    }.toMap
    var built = 0
    toBuild.groupBy(shardKeyOf).foreach { case (key, rels) =>
      val sf = shardFile(tableDir, key)
      val entries = readFileEntries(fs, sf)
      val updated = rels.foldLeft(entries) { (m, rel) =>
        (m.get(rel), partials.get(rel)) match {
          case (Some(st), Some(regs)) =>
            built += 1
            val cols2 = resolved.zipWithIndex.foldLeft(st.cols) {
              case (cm, (nm, i)) =>
                val k = cm.keys.find(_.equalsIgnoreCase(nm))
                  .getOrElse(nm.toLowerCase)
                val cs = cm.getOrElse(k,
                  ColStats(kindOfCol(nm.toLowerCase), -1L, None, None))
                cm.updated(k, cs.copy(hll = Some(regs(i).toSeq)))
            }
            m.updated(rel, st.copy(cols = cols2))
          case (Some(st), None) =>
            // a zero-row file produces no partials: trivially-empty
            // registers so coverage converges (the bloom lesson)
            built += 1
            val cols2 = resolved.foldLeft(st.cols) { (cm, nm) =>
              val k = cm.keys.find(_.equalsIgnoreCase(nm))
                .getOrElse(nm.toLowerCase)
              val cs = cm.getOrElse(k,
                ColStats(kindOfCol(nm.toLowerCase), -1L, None, None))
              cm.updated(k, cs.copy(hll =
                Some(Seq.fill(graft.functions.HllAgg.M)(0))))
            }
            m.updated(rel, st.copy(cols = cols2))
          case _ => m
        }
      }
      if (updated != entries)
        writeManifestFile(fs, sf, encodeLines(updated))
    }
    (built, covered.size + built)
  }

  /** One file's footer → FileStats. Column chunks aggregate across row
    * groups; a column drops out of the summary the moment any chunk
    * lacks trustworthy stats for it.
    */
  private def footerStats(conf: Configuration, abs: String,
      len: Long, mtime: Long): FileStats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, IntLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}

    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(abs), conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks
      var rows = 0L
      // col -> (kind, nulls, min, max); removed once untrustworthy
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, ColStats]
      val dead = scala.collection.mutable.Set.empty[String]
      val it = blocks.iterator()
      var first = true
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val cit = b.getColumns.iterator()
        while (cit.hasNext) {
          val c = cit.next()
          val name = c.getPath.toDotString
          if (!name.contains('.') && !dead.contains(name)) {
            val pt = c.getPrimitiveType
            val ann = pt.getLogicalTypeAnnotation
            // kind + a converter from the parquet generic value
            val kindConv: Option[(Char, Any => Any)] =
              (pt.getPrimitiveTypeName, ann) match {
                case (PrimitiveTypeName.INT32, a)
                  if a == null || a.isInstanceOf[DateLogicalTypeAnnotation] ||
                    (a.isInstanceOf[IntLogicalTypeAnnotation] &&
                      a.asInstanceOf[IntLogicalTypeAnnotation].isSigned) =>
                  Some(('l', v => v.asInstanceOf[Number].longValue()))
                case (PrimitiveTypeName.INT64, a) =>
                  a match {
                    case null => Some(('l',
                      v => v.asInstanceOf[Number].longValue()))
                    case t: TimestampLogicalTypeAnnotation =>
                      t.getUnit match {
                        case TimeUnit.MICROS => Some(('l',
                          v => v.asInstanceOf[Number].longValue()))
                        case TimeUnit.MILLIS => Some(('l',
                          v => v.asInstanceOf[Number].longValue() * 1000L))
                        case _ => None
                      }
                    case i: IntLogicalTypeAnnotation if i.isSigned =>
                      Some(('l', v => v.asInstanceOf[Number].longValue()))
                    case _ => None
                  }
                case (PrimitiveTypeName.BINARY,
                    _: StringLogicalTypeAnnotation) =>
                  Some(('s', v => new String(
                    v.asInstanceOf[org.apache.parquet.io.api.Binary]
                      .getBytes, "UTF-8")))
                case (PrimitiveTypeName.BOOLEAN, _) =>
                  Some(('b', v => v.asInstanceOf[Boolean]))
                case _ => None
              }
            val st = c.getStatistics
            kindConv match {
              case Some((kind, conv))
                if st != null && !st.isEmpty && st.isNumNullsSet =>
                val chunkNulls = st.getNumNulls
                val vals: Option[(Any, Any)] =
                  if (st.hasNonNullValue)
                    Some((conv(st.genericGetMin), conv(st.genericGetMax)))
                  else None
                val merged = acc.get(name) match {
                  case None if first =>
                    Some(ColStats(kind, chunkNulls,
                      vals.map(_._1), vals.map(_._2)))
                  case Some(prev) =>
                    val mn = (prev.min, vals.map(_._1)) match {
                      case (Some(a), Some(x)) => Some(minOf(kind, a, x))
                      case (a, x) => a.orElse(x)
                    }
                    val mx = (prev.max, vals.map(_._2)) match {
                      case (Some(a), Some(x)) => Some(maxOf(kind, a, x))
                      case (a, x) => a.orElse(x)
                    }
                    Some(ColStats(kind, prev.nulls + chunkNulls, mn, mx))
                  case None => None // column appeared mid-file: distrust
                }
                merged match {
                  case Some(m) => acc(name) = m
                  case None => dead += name; acc.remove(name)
                }
              case _ =>
                dead += name; acc.remove(name)
            }
          }
        }
        first = false
      }
      FileStats(len, mtime, rows, acc.toMap)
    } finally reader.close()
  }

  private def minOf(kind: Char, a: Any, b: Any): Any =
    if (cmp(kind, a, b) <= 0) a else b
  private def maxOf(kind: Char, a: Any, b: Any): Any =
    if (cmp(kind, a, b) >= 0) a else b

  // ---- evaluation -----------------------------------------------------

  /** Catalyst data types this tier can compare against 'l'/'s'/'b'
    * stats; anything else (incl. float/double by design) never prunes.
    */
  private def kindOf(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType => Some('l')
    case StringType => Some('s')
    case BooleanType => Some('b')
    case _ => None
  }

  /** Catalyst-internal literal value → the manifest's comparison form. */
  private def norm(kind: Char, v: Any): Option[Any] = (kind, v) match {
    case ('l', x: Byte) => Some(x.toLong)
    case ('l', x: Short) => Some(x.toLong)
    case ('l', x: Int) => Some(x.toLong)
    case ('l', x: Long) => Some(x)
    case ('s', x: UTF8String) => Some(x.toString)
    case ('s', x: String) => Some(x)
    case ('b', x: Boolean) => Some(x)
    case _ => None
  }

  private def cmp(kind: Char, a: Any, b: Any): Int = kind match {
    case 'l' => java.lang.Long.compare(a.asInstanceOf[Long],
      b.asInstanceOf[Long])
    case 's' =>
      // UTF8String ordering is unsigned byte-wise — identical to
      // parquet's UNSIGNED BINARY sort order for STRING columns
      UTF8String.fromString(a.asInstanceOf[String])
        .compareTo(UTF8String.fromString(b.asInstanceOf[String]))
    case 'b' => java.lang.Boolean.compare(a.asInstanceOf[Boolean],
      b.asInstanceOf[Boolean])
  }

  /** Conservative three-way collapse: true = the file MAY hold a
    * matching row, false = provably cannot. Any shape/type this tier
    * doesn't understand answers true.
    */
  def mayMatch(e: Expression, st: FileStats): Boolean = e match {
    case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
    case Or(l, r) => mayMatch(l, st) || mayMatch(r, st)
    case EqualTo(a: AttributeReference, l: Literal) => cmpLeaf(a, l, st, "=")
    case EqualTo(l: Literal, a: AttributeReference) => cmpLeaf(a, l, st, "=")
    case EqualNullSafe(a: AttributeReference, l: Literal) =>
      if (l.value == null) mayMatch(IsNull(a), st) else cmpLeaf(a, l, st, "=")
    case EqualNullSafe(l: Literal, a: AttributeReference) =>
      if (l.value == null) mayMatch(IsNull(a), st) else cmpLeaf(a, l, st, "=")
    case LessThan(a: AttributeReference, l: Literal) => cmpLeaf(a, l, st, "<")
    case LessThan(l: Literal, a: AttributeReference) => cmpLeaf(a, l, st, ">")
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      cmpLeaf(a, l, st, "<=")
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      cmpLeaf(a, l, st, ">=")
    case GreaterThan(a: AttributeReference, l: Literal) =>
      cmpLeaf(a, l, st, ">")
    case GreaterThan(l: Literal, a: AttributeReference) =>
      cmpLeaf(a, l, st, "<")
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      cmpLeaf(a, l, st, ">=")
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      cmpLeaf(a, l, st, "<=")
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => cmpLeaf(a, v.asInstanceOf[Literal], st, "="))
    case InSet(a: AttributeReference, vs) =>
      kindOf(a.dataType) match {
        case Some(k) =>
          vs.exists(v => v != null && leafCheck(a.name, k,
            norm(k, v), st, "="))
        case None => true
      }
    case IsNull(a: AttributeReference) =>
      st.cols.get(a.name) match {
        case Some(cs) => cs.nulls != 0 // -1 (unknown) and >0 both keep
        case None => true
      }
    case IsNotNull(a: AttributeReference) =>
      st.cols.get(a.name) match {
        case Some(cs) => !(cs.nulls >= 0 && cs.nulls == st.rows)
        case None => true
      }
    case _ => true
  }

  private def cmpLeaf(a: AttributeReference, l: Literal, st: FileStats,
      op: String): Boolean =
    if (l.value == null) true // null comparison never matches, but
      // pruning on it is the optimizer's job, not this tier's
    else kindOf(a.dataType) match {
      case Some(k) if kindOf(l.dataType) == Some(k) =>
        leafCheck(a.name, k, norm(k, l.value), st, op)
      case _ => true
    }

  /** Range check of `col op v` against a single file's stats. */
  private def leafCheck(col: String, kind: Char, vOpt: Option[Any],
      st: FileStats, op: String): Boolean = vOpt match {
    case None => true
    case Some(v) => st.cols.get(col) match {
      case None => true
      case Some(cs) if cs.kind != kind => true
      case Some(cs) => (cs.min, cs.max) match {
        case (Some(mn), Some(mx)) => op match {
          case "=" => cmp(kind, mn, v) <= 0 && cmp(kind, v, mx) <= 0
          case "<" => cmp(kind, mn, v) < 0
          case "<=" => cmp(kind, mn, v) <= 0
          case ">" => cmp(kind, v, mx) < 0
          case ">=" => cmp(kind, v, mx) <= 0
          case _ => true
        }
        // min/max absent with a recorded null count covering every
        // row: the file is all-NULL — no value predicate can match
        case _ => !(cs.nulls >= 0 && cs.nulls == st.rows)
      }
    }
  }

  // ---- planning-time pruning ------------------------------------------

  /** Filter a planned split list: a [[PartitionedFile]] is dropped only
    * when a VALID manifest entry (length AND mtime match) proves no
    * pushed data filter can match. Emitted [[FilePartition]]s are
    * re-indexed densely; empty ones are dropped.
    */
  def prune(parts: Array[InputPartition], filters: Seq[Expression],
      manifest: Map[String, FileStats], tableDir: Path)
      : Array[InputPartition] = {
    if (filters.isEmpty || manifest.isEmpty) return parts
    val dirUri = tableDir.toUri.getPath
    def keep(f: PartitionedFile): Boolean = {
      val p = f.toPath.toUri.getPath
      if (!p.startsWith(dirUri)) true
      else {
        val rel = p.stripPrefix(dirUri).stripPrefix("/")
        manifest.get(rel) match {
          case Some(st)
            if st.size == f.fileSize && st.mtime == f.modificationTime =>
            filters.forall(mayMatch(_, st))
          case _ => true
        }
      }
    }
    // only all-FilePartition plans are pruned (the plain file scan's
    // Batch yields nothing else); anything unexpected passes through
    if (!parts.forall(_.isInstanceOf[FilePartition])) return parts
    val fps = parts.map(_.asInstanceOf[FilePartition])
    val pruned = fps.map(fp => fp.files.filter(keep))
    if (pruned.iterator.zip(fps.iterator)
      .forall { case (ks, fp) => ks.length == fp.files.length }) parts
    else pruned.filter(_.nonEmpty).zipWithIndex
      .map { case (fs, i) => FilePartition(i, fs): InputPartition }
  }

  /** Same fail-safe keep-test for callers that manage their own
    * grouping (the bucketed scan prunes within bucket groups so all
    * `n` key groups still get emitted).
    */
  def keepFile(f: PartitionedFile, filters: Seq[Expression],
      manifest: Map[String, FileStats], tableDir: Path): Boolean = {
    val dirUri = tableDir.toUri.getPath
    val p = f.toPath.toUri.getPath
    if (!p.startsWith(dirUri)) true
    else {
      val rel = p.stripPrefix(dirUri).stripPrefix("/")
      manifest.get(rel) match {
        case Some(st)
          if st.size == f.fileSize && st.mtime == f.modificationTime =>
          filters.forall(mayMatch(_, st))
        case _ => true
      }
    }
  }

  // ---- metadata-only aggregation --------------------------------------

  /** SQL three-valued logic for evaluating a pushed filter against a
    * file's PARTITION values (dir tokens) — exact, not conservative:
    * every row of the file has exactly these partition values, so a
    * file-granularity verdict IS the row-granularity verdict. `None`
    * = the expression is not a pure partition predicate (references a
    * data column, an unsupported shape, a non-literal) — the caller
    * must bail to the real scan.
    */
  private sealed trait Tri
  private case object TTrue extends Tri
  private case object TFalse extends Tri
  private case object TNull extends Tri

  private def evalPartition(e: Expression, partitionSchema: StructType,
      pvals: Array[Any]): Option[Tri] = {
    def attrIdx(a: AttributeReference): Option[Int] = {
      val is = partitionSchema.fields.indices
        .filter(i => partitionSchema.fields(i).name.equalsIgnoreCase(a.name))
      if (is.length == 1) Some(is.head) else None
    }
    def bool(b: Boolean): Tri = if (b) TTrue else TFalse
    // catalyst-internal partition value and literal, compared in the
    // manifest's normalized forms
    def cmpLeafP(a: AttributeReference, l: Literal, op: String)
        : Option[Tri] =
      attrIdx(a).flatMap { i =>
        kindOf(partitionSchema.fields(i).dataType).flatMap { k =>
          if (l.value == null) Some(TNull)
          else if (pvals(i) == null) Some(TNull)
          else (norm(k, pvals(i)), norm(k, l.value)) match {
            case (Some(v), Some(lv)) =>
              val c = cmp(k, v, lv)
              Some(op match {
                case "=" => bool(c == 0)
                case "<" => bool(c < 0)
                case "<=" => bool(c <= 0)
                case ">" => bool(c > 0)
                case ">=" => bool(c >= 0)
              })
            case _ => None
          }
        }
      }
    e match {
      case Literal(null, _) => Some(TNull)
      case Literal(b: Boolean, BooleanType) => Some(bool(b))
      case And(l, r) =>
        for (a <- evalPartition(l, partitionSchema, pvals);
             b <- evalPartition(r, partitionSchema, pvals)) yield (a, b) match {
          case (TFalse, _) | (_, TFalse) => TFalse
          case (TTrue, TTrue) => TTrue
          case _ => TNull
        }
      case Or(l, r) =>
        for (a <- evalPartition(l, partitionSchema, pvals);
             b <- evalPartition(r, partitionSchema, pvals)) yield (a, b) match {
          case (TTrue, _) | (_, TTrue) => TTrue
          case (TFalse, TFalse) => TFalse
          case _ => TNull
        }
      case org.apache.spark.sql.catalyst.expressions.Not(c) =>
        evalPartition(c, partitionSchema, pvals).map {
          case TTrue => TFalse
          case TFalse => TTrue
          case TNull => TNull
        }
      case EqualTo(a: AttributeReference, l: Literal) => cmpLeafP(a, l, "=")
      case EqualTo(l: Literal, a: AttributeReference) => cmpLeafP(a, l, "=")
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        attrIdx(a).flatMap { i =>
          if (l.value == null) Some(bool(pvals(i) == null))
          else if (pvals(i) == null) Some(TFalse)
          else cmpLeafP(a, l, "=")
        }
      case EqualNullSafe(l: Literal, a: AttributeReference) =>
        evalPartition(EqualNullSafe(a, l), partitionSchema, pvals)
      case LessThan(a: AttributeReference, l: Literal) => cmpLeafP(a, l, "<")
      case LessThan(l: Literal, a: AttributeReference) => cmpLeafP(a, l, ">")
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cmpLeafP(a, l, "<=")
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cmpLeafP(a, l, ">=")
      case GreaterThan(a: AttributeReference, l: Literal) =>
        cmpLeafP(a, l, ">")
      case GreaterThan(l: Literal, a: AttributeReference) =>
        cmpLeafP(a, l, "<")
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cmpLeafP(a, l, ">=")
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cmpLeafP(a, l, "<=")
      case In(a: AttributeReference, vs)
          if vs.forall(_.isInstanceOf[Literal]) =>
        val per = vs.map(v =>
          cmpLeafP(a, v.asInstanceOf[Literal], "="))
        if (per.exists(_.isEmpty)) None
        else {
          val ts = per.flatten
          if (ts.contains(TTrue)) Some(TTrue)
          else if (ts.contains(TNull) || ts.isEmpty) Some(TNull)
          else Some(TFalse)
        }
      case InSet(a: AttributeReference, vs) =>
        attrIdx(a).flatMap { i =>
          kindOf(partitionSchema.fields(i).dataType).flatMap { k =>
            if (pvals(i) == null) Some(TNull)
            else norm(k, pvals(i)).map { v =>
              if (vs.exists(x => x != null &&
                norm(k, x).exists(cmp(k, v, _) == 0))) TTrue
              else if (vs.exists(_ == null)) TNull
              else TFalse
            }
          }
        }
      case IsNull(a: AttributeReference) =>
        attrIdx(a).map(i => bool(pvals(i) == null))
      case IsNotNull(a: AttributeReference) =>
        attrIdx(a).map(i => bool(pvals(i) != null))
      case _ => None
    }
  }

  /** Complete aggregate pushdown from the manifest: answers
    * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` — ungrouped,
    * GROUP BY partition columns, with at-most-partition-column filters
    * — without scheduling a single task or opening a single file —
    * the lakehouse "metadata query" tier (Iceberg answers these from
    * manifest metrics, Delta from the stats in its log). At 100 TB a
    * `SELECT count(*), max(event_date) FROM fact` freshness probe is a
    * pure driver-side manifest fold instead of a million-file scan;
    * with `auto_analyze` every committed write keeps the manifest
    * complete, so the fast path stays available. Partition filters are
    * applied BEFORE the manifest is consulted, so only the SURVIVING
    * directories' shards are ever opened (and only surviving files
    * need coverage — a stale entry in a filtered-out partition cannot
    * block the fast path).
    *
    * Returns the result rows (catalyst-internal values) and their
    * schema, or None when the manifest cannot answer EXACTLY —
    * fail-safe conditions, each falling back to the normal scan:
    *  - every SURVIVING data file must carry a VALID manifest entry
    *    (size+mtime match): one un-analyzed file → None;
    *  - `COUNT(col)` needs a recorded null count in every file;
    *  - `MIN`/`MAX` are served for integer-like ('l') and boolean
    *    columns only. STRING stats are deliberately refused: parquet
    *    writers may TRUNCATE binary min/max (a rounded-up max is a
    *    valid PRUNING bound but not the actual value) — skipping may
    *    prune on them, answering may not;
    *  - any other aggregate (SUM/AVG/DISTINCT/UDAF) → None.
    */
  def completeAggregate(spark: SparkSession, tableDir: Path,
      tableSchema: StructType, partitionSchema: StructType,
      pushedFilters: Seq[Expression],
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType,
        Seq[org.apache.spark.sql.catalyst.InternalRow])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}

    def named(c: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = c match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head)
      case _ => None
    }
    def partIdx(name: String): Option[Int] = {
      val is = partitionSchema.fields.indices
        .filter(i => partitionSchema.fields(i).name.equalsIgnoreCase(name))
      if (is.length == 1) Some(is.head) else None
    }
    // GROUP BY is answerable ONLY over partition columns (their values
    // live in the directory names; everything else needs row reads)
    val groupIdx: Seq[Int] = agg.groupByExpressions.toSeq.map { g =>
      named(g).flatMap(partIdx) match {
        case Some(i) => i
        case None => return None
      }
    }

    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tableDir)) return None
    // merge-on-read deletion vectors make every file-derived count an
    // over-claim (deleted rows are still in the files): decline — the
    // distributed scan, which applies the vectors, answers instead.
    // (The scan builder already declines earlier; this guards direct
    // callers.)
    if (GraftDv.hasAny(fs, tableDir) ||
      GraftEqDel.hasAny(fs, tableDir)) return None

    def visible(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) visible(st.getPath) else Seq(st)
      }
    // the aggregate's coverage walk serves from the listing census when
    // it is provably current ([[GraftManifestListing]]) — the count(*)
    // fast path then touches NO data directory at all
    def visibleAll(): Seq[org.apache.hadoop.fs.FileStatus] =
      GraftManifestListing.serveListing(fs, tableDir)
        .getOrElse(visible(tableDir))
    val dirUri = tableDir.toUri.getPath
    // 1. every visible file parses to its partition values first (a
    //    hive-partitioned table needs a clean `col=value` dir chain —
    //    catalyst-internal values, what scans would produce); no
    //    manifest is consulted yet
    val parsed: Seq[(org.apache.hadoop.fs.FileStatus, String, Array[Any])] =
      visibleAll().map { st =>
        val rel = st.getPath.toUri.getPath
          .stripPrefix(dirUri).stripPrefix("/")
        val pvals: Array[Any] =
          if (partitionSchema.isEmpty) Array.empty[Any]
          else {
            // NAME-based chain parse (depth-agnostic): every partition
            // column must appear as a `col=value` segment of the
            // file's own chain, wherever it sits — which holds across
            // the mixed-depth eras of an EVOLVED spec (the anchor is a
            // prefix of every era; extra evolved segments are data
            // columns and ignored here). A file missing any partition
            // token bails the whole fast path, as before.
            val toks = GraftEvolved.chainTokens(rel).toMap
            partitionSchema.fields.map { f =>
              val tok = toks.getOrElse(f.name.toLowerCase, return None)
              try GraftPartitionedCow.parseToken(tok, f.dataType)
              catch { case scala.util.control.NonFatal(_) => return None }
            }.toArray
          }
        (st, rel, pvals)
      }
    // 2. pushed filters must be pure PARTITION predicates — then they
    //    are EXACT at file granularity (every row of a file shares its
    //    dir tokens), so filtering the file list IS filtering the rows;
    //    any data-column reference or unsupported shape bails
    val survivors = parsed.filter { case (_, _, pv) =>
      pushedFilters.forall { f =>
        evalPartition(f, partitionSchema, pv) match {
          case Some(TTrue) => true
          case Some(_) => false // FALSE and NULL both drop the file
          case None => return None
        }
      }
    }
    // 3. shard-scoped manifest read: only the surviving directories'
    //    shards are opened
    val manifest = readForDirs(fs, tableDir,
      survivors.map { case (_, rel, _) => shardKeyOf(rel) }.toSet)
    // 4. every SURVIVOR needs a VALID entry (size+mtime match)
    val allFiles: Seq[(FileStats, Array[Any])] =
      survivors.map { case (st, rel, pv) =>
        manifest.get(rel)
          .filter(m => m.size == st.getLen &&
            m.mtime == st.getModificationTime) match {
          case Some(m) => (m, pv)
          case None => return None // uncovered surviving file: bail
        }
      }

    def resolveData(name: String): Option[StructField] = {
      val cands = tableSchema.fields.filter(_.name.equalsIgnoreCase(name))
      if (cands.length == 1) Some(cands.head) else None
    }
    def internalOf(dt: DataType, v: Any): Any = dt match {
      case ByteType => v.asInstanceOf[Long].toByte
      case ShortType => v.asInstanceOf[Long].toShort
      case IntegerType | DateType => v.asInstanceOf[Long].toInt
      case _ => v // Long/Timestamp(NTZ) hold Long; Boolean holds Boolean
    }
    // partition-value ordering for min/max over dir tokens: catalyst-
    // internal values of the dirRenderable types are all Comparable
    // (UTF8String included), and dir tokens are EXACT — no truncation
    // caveat, so partition-column min/max serves strings too
    def cmpInternal(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)

    /** One group's aggregate values, or None if any function is not
      * derivable from the manifest for this table.
      */
    def aggValues(files: Seq[(FileStats, Array[Any])])
        : Option[Seq[(StructField, Any)]] = {
      val stats = files.map(_._1)
      def colStats(f: StructField): Option[Seq[ColStats]] =
        kindOf(f.dataType).flatMap { k =>
          val per = stats.map(_.cols.get(f.name).filter(_.kind == k))
          if (per.exists(_.isEmpty)) None else Some(per.flatten)
        }
      // rows>0 files only: a 0-row file's dir token is not a value
      def pvals(i: Int): Seq[(Any, Long)] =
        files.filter(_._1.rows > 0).map(f => (f._2(i), f._1.rows))
      val out = agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          Some((StructField("count(*)", LongType, nullable = false),
            stats.map(_.rows).sum: Any))
        case c: Count if !c.isDistinct =>
          named(c.column).flatMap { nm =>
            partIdx(nm) match {
              case Some(i) => // partition col: null only in the default dir
                Some((StructField(s"count($nm)", LongType, nullable = false),
                  pvals(i).collect { case (v, r) if v != null => r }.sum: Any))
              case None => resolveData(nm).flatMap { f =>
                colStats(f).flatMap { per =>
                  if (per.exists(_.nulls < 0)) None
                  else Some((StructField(s"count(${f.name})", LongType,
                    nullable = false),
                    (stats.map(_.rows).sum - per.map(_.nulls).sum): Any))
                }
              }
            }
          }
        case m: Min =>
          named(m.column).flatMap { nm =>
            partIdx(nm) match {
              case Some(i) =>
                val f = partitionSchema.fields(i)
                val v = pvals(i).map(_._1).filter(_ != null)
                  .reduceOption((a, b) => if (cmpInternal(a, b) <= 0) a else b)
                  .orNull
                Some((StructField(s"min(${f.name})", f.dataType,
                  nullable = true), v: Any))
              case None => resolveData(nm).flatMap { f =>
                if (kindOf(f.dataType).contains('s')) None // truncation risk
                else colStats(f).map { per =>
                  val k = kindOf(f.dataType).get
                  val v = per.flatMap(_.min)
                    .reduceOption((a, b) => minOf(k, a, b))
                    .map(internalOf(f.dataType, _)).orNull
                  (StructField(s"min(${f.name})", f.dataType,
                    nullable = true), v: Any)
                }
              }
            }
          }
        case m: Max =>
          named(m.column).flatMap { nm =>
            partIdx(nm) match {
              case Some(i) =>
                val f = partitionSchema.fields(i)
                val v = pvals(i).map(_._1).filter(_ != null)
                  .reduceOption((a, b) => if (cmpInternal(a, b) >= 0) a else b)
                  .orNull
                Some((StructField(s"max(${f.name})", f.dataType,
                  nullable = true), v: Any))
              case None => resolveData(nm).flatMap { f =>
                if (kindOf(f.dataType).contains('s')) None
                else colStats(f).map { per =>
                  val k = kindOf(f.dataType).get
                  val v = per.flatMap(_.max)
                    .reduceOption((a, b) => maxOf(k, a, b))
                    .map(internalOf(f.dataType, _)).orNull
                  (StructField(s"max(${f.name})", f.dataType,
                    nullable = true), v: Any)
                }
              }
            }
          }
        case _ => None // SUM/AVG/DISTINCT/UDAF: not derivable
      }
      if (out.exists(_.isEmpty)) None else Some(out.flatten)
    }

    if (groupIdx.isEmpty) {
      // ungrouped: exactly one row — including count(*)=0 on an empty
      // table (the planner's global-aggregate contract)
      aggValues(allFiles).map { vs =>
        (StructType(vs.map(_._1)),
          Seq(new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(vs.map(_._2).toArray)))
      }
    } else {
      // grouped: one row per distinct partition tuple that holds at
      // least one ROW (a group of only 0-row files must not surface —
      // a real scan would emit no group for it)
      val groups = allFiles.groupBy(f => groupIdx.map(f._2(_)).toList)
        .toSeq.filter(_._2.exists(_._1.rows > 0))
      val gFields = groupIdx.map { i =>
        val f = partitionSchema.fields(i)
        StructField(f.name, f.dataType, nullable = true)
      }
      val rows = groups.map { case (key, files) =>
        aggValues(files) match {
          case Some(vs) =>
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow((key ++ vs.map(_._2)).toArray)
          case None => return None
        }
      }
      val aggFields = groups.headOption.flatMap(g => aggValues(g._2))
        .map(_.map(_._1)).getOrElse {
          // no non-empty groups: derive the schema from an empty fold
          aggValues(Nil) match {
            case Some(vs) => vs.map(_._1)
            case None => return None
          }
        }
      Some((StructType(gFields ++ aggFields), rows))
    }
  }
}
