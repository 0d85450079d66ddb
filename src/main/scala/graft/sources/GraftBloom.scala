package graft.sources

import java.util.Base64

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, In, InSet, Literal, Or}
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter skipping for POINT LOOKUPS — the pruning tier
  * min/max cannot provide.
  *
  * [[GraftStats]] prunes by per-file min/max, which works when the
  * layout clusters the column (partitions, range/Z-order). On a
  * high-cardinality UNSORTED column — a document fingerprint, a user
  * id, a surrogate key — every file's [min, max] spans the whole
  * domain and min/max proves nothing: an equality probe scans all
  * files. A per-file Bloom filter answers "does this file possibly
  * contain value v" probabilistically-no-false-negatives, so an
  * equality/IN probe schedules only the files whose filter admits the
  * value — the Delta bloom-filter-index / Iceberg puffin blob design.
  * At 100 TB this is the difference between a point lookup opening 3
  * files and opening 30,000.
  *
  * Opt-in per column (`CALL system.analyze_bloom(table, columns,
  * fpp)`): filters cost bits per row (~1.2 MB per million rows at 1%
  * fpp), so the operator names the lookup columns. The build is one
  * distributed pass — partial filters per split, OR-merged per file,
  * grouped into the same per-partition-directory shard layout as the
  * stats manifest (`_graft_bloom.d/`), each shard published by atomic
  * tmp+rename. Cost and metadata volume are file-count-, not
  * table-, shaped.
  *
  * Fail-safe like every skipping tier: entries are keyed by
  * (relative path, length, mtime) — a rewritten or new file simply
  * has no valid entry and is KEPT; a filter can only prune, never
  * lose a row (false negatives are impossible by construction; the
  * spec pins parity). Deleted-row vectors ([[GraftDv]]) only make
  * filters conservative (they admit values whose rows are deleted).
  * Capture-mode COW scans never bloom-prune — a rewrite must read
  * every surviving row of its groups.
  */
private[graft] object GraftBloom {

  private[graft] val ShardDirName = "_graft_bloom.d"
  val DefaultFpp = 0.01

  /** kind 'l' = integer-family (put/might as Long), 's' = string
    * (UTF8 bytes) — matching [[GraftStats]]' normalization so the
    * read side normalizes predicate literals identically.
    */
  def kindOf(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some('l')
    case StringType => Some('s')
    case _ => None
  }

  final case class FileBlooms(size: Long, mtime: Long,
      cols: Map[String, (Char, BloomFilter)])

  // ---- shard codec -------------------------------------------------------
  // line: relB64 \t size \t mtime \t col(-joined)
  // col:  nameLowerB64:kind:b64(bloomBytes)

  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  private def b64s(s: String): String = b64(s.getBytes("UTF-8"))
  private def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)
  private def unb64s(s: String): String = new String(unb64(s), "UTF-8")

  private def bloomBytes(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
  private def bloomOf(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  private def encodeShard(entries: Map[String, FileBlooms]): String = {
    val sb = new StringBuilder
    entries.toSeq.sortBy(_._1).foreach { case (rel, fb) =>
      sb.append(b64s(rel)).append('\t').append(fb.size).append('\t')
        .append(fb.mtime).append('\t')
      sb.append(fb.cols.toSeq.sortBy(_._1).map { case (c, (k, bf)) =>
        s"${b64s(c)}:$k:${b64(bloomBytes(bf))}"
      }.mkString(""))
      sb.append('\n')
    }
    sb.toString
  }

  private def parseShard(lines: Seq[String]): Map[String, FileBlooms] =
    lines.filter(_.nonEmpty).flatMap { line =>
      try {
        val p = line.split('\t')
        val cols =
          if (p.length < 4 || p(3).isEmpty) Map.empty[String, (Char, BloomFilter)]
          else p(3).split('').map { ce =>
            val q = ce.split(':')
            unb64s(q(0)) -> (q(1).charAt(0), bloomOf(unb64(q(2))))
          }.toMap
        Some(unb64s(p(0)) -> FileBlooms(p(1).toLong, p(2).toLong, cols))
      } catch { case NonFatal(_) => None } // fail-safe: unpruned
    }.toMap

  /** Test seam: count of data files whose CONTENT an [[analyze]] call
    * actually (re-)read. The writer-side maintenance contract (r12
    * item 5) is that a commit with shipped filters leaves this at 0.
    */
  private[graft] val buildReads = new java.util.concurrent.atomic.LongAdder

  /** Publish WRITER-ACCUMULATED filters (r12 item 5): the hive-layout
    * DataWriter builds each file's filters as rows stream through and
    * ships them in its commit message — this merges them into the
    * shard store keyed by the PUBLISHED file's live identity, with
    * zero data re-read. Runs post-commit in the advisory auto-analyze
    * slot; any failure just leaves files for the re-read backstop.
    * Returns the number of file entries published.
    */
  def publishShipped(spark: SparkSession, tableDir: Path,
      shipped: Map[String, Seq[(String, Char, Array[Byte])]]): Int = {
    if (shipped.isEmpty) return 0
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirUri = tableDir.toUri.getPath
    val entries = shipped.toSeq.flatMap { case (finalPath, cols) =>
      val up = new Path(finalPath).toUri.getPath
      if (!up.startsWith(dirUri)) None
      else {
        val rel = up.stripPrefix(dirUri).stripPrefix("/")
        // hidden dirs (upsert staging) are not table data
        if (rel.split('/').exists(s => s.startsWith("_") || s.startsWith(".")))
          None
        else
          try {
            val st = fs.getFileStatus(new Path(finalPath))
            Some(rel -> FileBlooms(st.getLen, st.getModificationTime,
              cols.map { case (n, k, b) =>
                n.toLowerCase -> (k, bloomOf(b))
              }.toMap))
          } catch { case NonFatal(_) => None } // gone already: backstop's job
      }
    }.toMap
    if (entries.isEmpty) return 0
    val keys = entries.keySet.map(GraftStats.shardKeyOf)
    val prior = readShards(fs, tableDir, keys)
    reconcileShards(fs, tableDir, prior ++ entries, Some(keys))
    entries.size
  }

  private def shardDir(tableDir: Path) = new Path(tableDir, ShardDirName)
  private def shardFile(tableDir: Path, shardKey: String): Path =
    new Path(shardDir(tableDir),
      if (shardKey.isEmpty) "root" else b64s(shardKey).replace('/', '-'))

  // ---- build (CALL system.analyze_bloom) ---------------------------------

  /** Build per-file Bloom filters for `columns` — INCREMENTALLY: a
    * file whose existing entry is identity-valid (length+mtime) and
    * already covers every requested column is never re-read, so a
    * repeat call after a daily append pays for the appended files
    * only (the same write-proportional discipline as the stats
    * manifest). Two distributed passes over the files that DO need
    * building: per-file row counts (sizes the filters — merge
    * compatibility requires identical creation parameters per file),
    * then partial filters per split OR-merged per file. Returns
    * (files built, files covered, columns); entries for vanished
    * files fall out of the rewritten shards, and shards whose content
    * did not change are left byte-identical.
    */
  def analyze(spark: SparkSession, tableDir: Path, tableSchema: StructType,
      partitionCols: Seq[String], columns: Seq[String],
      fpp: Double,
      // write-scoped refresh (auto-bloom): only these partition-dir
      // shard keys are listed, reconciled, and eligible to build — the
      // per-commit metadata cost tracks the WRITE, not the table
      scope: Option[Set[String]] = None): (Int, Int, Int) = {
    require(columns.nonEmpty, "analyze_bloom: no columns named")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val resolved = columns.map { c =>
      val f = tableSchema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"analyze_bloom: column $c not in schema"))
      require(!partitionCols.exists(_.equalsIgnoreCase(c)),
        s"analyze_bloom: $c is a partition column — partition values " +
          "prune via directory tokens already")
      val kind = kindOf(f.dataType).getOrElse(
        throw new IllegalArgumentException(
          s"analyze_bloom: column $c type ${f.dataType.simpleString} " +
            "unsupported (integral and string columns only)"))
      (f.name, kind)
    }
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirUri = tableDir.toUri.getPath

    // current data files (rel -> (len, mtime)) — driver listing, the
    // same cost class as the batch file index
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
      case Some(keys) =>
        // scoped: list only the write's partition dirs
        keys.toSeq.flatMap { k =>
          listData(if (k.isEmpty) tableDir else new Path(tableDir, k))
            // root-scoped listing must not descend into other shards'
            // dirs twice; listData on the root recurses, so filter to
            // the exact shard key
            .filter { case (rel, _) => GraftStats.shardKeyOf(rel) == k }
        }
    }).toMap

    // identity-valid entries survive; only those ALSO covering every
    // requested column skip the build — but a rebuilt file MERGES its
    // new filters into the identity-valid entry's existing columns, so
    // analyze_bloom(t, 'b') after analyze_bloom(t, 'a') covers BOTH
    val wanted = resolved.map(_._1.toLowerCase).toSet
    val prior = scope match {
      case None => readAll(fs, tableDir)
      case Some(keys) => readShards(fs, tableDir, keys)
    }
    val identityValid = prior.filter { case (rel, fb) =>
      live.get(rel).contains((fb.size, fb.mtime))
    }
    val valid = identityValid.filter { case (_, fb) =>
      wanted.subsetOf(fb.cols.keySet)
    }
    val toBuild = live.keySet -- valid.keySet

    def relOfPath(s: String): String = {
      val p = new Path(s).toUri.getPath
      if (p.startsWith(dirUri)) p.stripPrefix(dirUri).stripPrefix("/") else p
    }

    if (toBuild.isEmpty) {
      reconcileShards(fs, tableDir, valid, scope)
      return (0, valid.size, resolved.size)
    }
    buildReads.add(toBuild.size)
    // read ONLY the files that need building, directly by path — the
    // exact file set by construction (no filter-representation games),
    // projected to the bloom columns (all non-partition, so they live
    // in the files themselves)
    val buildSchema = StructType(resolved.map { case (nm, _) =>
      tableSchema.fields.find(_.name.equalsIgnoreCase(nm)).get
    })
    val dfBuild = spark.read.schema(buildSchema)
      .parquet(toBuild.toSeq.sorted.map(rel =>
        new Path(tableDir, rel).toString): _*)
      .select(col("_metadata.file_path").as("__f") +:
        resolved.map { case (nm, _) => col(nm) }: _*)

    // pass 1: per-file row counts (file-count-sized result)
    val counts = dfBuild.groupBy(col("__f")).count().collect()
      .map(r => relOfPath(r.getString(0)) -> r.getLong(1)).toMap
    val bCounts = spark.sparkContext.broadcast(counts)
    val kinds = resolved.map(_._2).toArray
    val nCols = kinds.length
    val theFpp = fpp
    val theDirUri = dirUri

    // pass 2: partial filters per split, OR-merged per file. Merge
    // compatibility: created with the file's row count + fpp on every
    // split of that file. Skipped entirely when pass 1 saw no rows
    // (all toBuild files empty) — they still get entries below.
    val partials = if (counts.isEmpty)
      Array.empty[(String, Array[Array[Byte]])]
    else dfBuild.rdd.mapPartitions { it =>
      val acc = scala.collection.mutable.Map.empty[String, Array[BloomFilter]]
      it.foreach { row =>
        val p0 = new Path(row.getString(0)).toUri.getPath
        val rel = if (p0.startsWith(theDirUri))
          p0.stripPrefix(theDirUri).stripPrefix("/") else p0
        val blooms = acc.getOrElseUpdate(rel, {
          val n = math.max(1L, bCounts.value.getOrElse(rel, 1L))
          Array.fill(nCols)(BloomFilter.create(n, theFpp))
        })
        var i = 0
        while (i < nCols) {
          if (!row.isNullAt(i + 1)) kinds(i) match {
            case 'l' => blooms(i).putLong(row.get(i + 1) match {
              case b: Byte => b.toLong
              case s: Short => s.toLong
              case n: Int => n.toLong
              case l: Long => l
              case other => other.toString.toLong
            })
            case 's' => blooms(i).putString(row.getString(i + 1))
          }
          i += 1
        }
      }
      acc.iterator.map { case (rel, bs) => (rel, bs.map(bloomBytes)) }
    }.reduceByKey { (a, b) =>
      a.zip(b).map { case (x, y) =>
        val bx = bloomOf(x); bx.mergeInPlace(bloomOf(y)); bloomBytes(bx)
      }
    }.collect() // file-count-sized: one blob set per data file

    // driver: attach identities (the LISTED identity, snapshotted
    // before the read — a file rewritten mid-build self-invalidates),
    // merge with the carried-over valid entries, reconcile shards.
    // Iterate toBuild (not partials): a ZERO-ROW file produces no
    // groupBy/partials entry, but it still needs a shard entry with
    // trivially-empty filters — otherwise reconcile drops its prior
    // entry, a point lookup can never skip it, and every subsequent
    // analyze re-lists and re-reads it (coverage never converges).
    val partialMap = partials.toMap
    val built = toBuild.toSeq.flatMap { rel =>
      live.get(rel).map { case (len, mtime) =>
        val blobs = partialMap.get(rel)
        rel -> FileBlooms(len, mtime,
          (identityValid.get(rel).map(_.cols).getOrElse(Map.empty)) ++
            resolved.indices.map(i => resolved(i)._1.toLowerCase ->
              (kinds(i), blobs.map(b => bloomOf(b(i)))
                .getOrElse(BloomFilter.create(1, theFpp)))).toMap)
      }
    }.toMap
    val entries = valid ++ built
    reconcileShards(fs, tableDir, entries, scope)
    (built.size, entries.size, resolved.size)
  }

  /** Entries of a specific shard-key set (the scoped maintenance read). */
  private def readShards(fs: FileSystem, tableDir: Path,
      keys: Set[String]): Map[String, FileBlooms] =
    keys.toSeq.flatMap { k =>
      val f = shardFile(tableDir, k)
      if (!fs.exists(f)) Nil
      else {
        try {
          val in = fs.open(f)
          val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toList finally in.close()
          parseShard(lines)
        } catch { case NonFatal(_) => Nil }
      }
    }.toMap

  /** All existing entries across every shard (file-count-bounded
    * metadata — this is the per-table maintenance path, not planning).
    */
  private def readAll(fs: FileSystem, tableDir: Path)
      : Map[String, FileBlooms] = {
    val d = shardDir(tableDir)
    if (!fs.exists(d)) Map.empty
    else fs.listStatus(d).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .flatMap { st =>
        try {
          val in = fs.open(st.getPath)
          val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toList finally in.close()
          parseShard(lines)
        } catch { case NonFatal(_) => Nil }
      }.toMap
  }

  /** Bring the shard files to exactly `entries`: shards whose content
    * is unchanged are left byte-identical (mtime included), vanished
    * shards are dropped, changed ones published by atomic tmp+rename.
    * With a `scope`, only the scoped shard keys are touched — foreign
    * shards (and their files) are not this write's business.
    */
  private def reconcileShards(fs: FileSystem, tableDir: Path,
      entries: Map[String, FileBlooms],
      scope: Option[Set[String]] = None): Unit = {
    val byShard = entries.groupBy { case (rel, _) =>
      GraftStats.shardKeyOf(rel)
    }
    fs.mkdirs(shardDir(tableDir))
    fs.listStatus(shardDir(tableDir)).foreach { st =>
      val inScope = scope.forall(_.exists(k =>
        shardFile(tableDir, k).getName == st.getPath.getName))
      val keep = byShard.keys.exists(k =>
        shardFile(tableDir, k).getName == st.getPath.getName)
      if (inScope && !keep && !st.getPath.getName.startsWith("."))
        fs.delete(st.getPath, false)
    }
    byShard.foreach { case (key, m) =>
      val fin = shardFile(tableDir, key)
      val bytes = encodeShard(m.toMap).getBytes("UTF-8")
      val same = fs.exists(fin) && fs.getFileStatus(fin).getLen ==
        bytes.length && {
          val in = fs.open(fin)
          val old = try {
            val buf = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
            buf.toByteArray
          } finally in.close()
          java.util.Arrays.equals(old, bytes)
        }
      if (!same) {
        val tmp = new Path(fin.getParent, "." + fin.getName + ".tmp")
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        GraftDv.replaceAtomic(fs, tmp, fin)
      }
    }
  }

  // ---- read-side pruning --------------------------------------------------

  /** Scoped loader: opens only the shards of directories holding
    * PLANNED files (same discipline as [[GraftStats.ScopedReader]]).
    */
  final class ScopedReader(fs: FileSystem, tableDir: Path) {
    private val cache =
      scala.collection.mutable.Map.empty[String, Map[String, FileBlooms]]
    private lazy val present: Boolean =
      try fs.exists(shardDir(tableDir))
      catch { case NonFatal(_) => false }

    def forFiles(planned: Seq[PartitionedFile]): Map[String, FileBlooms] =
      if (!present) Map.empty
      else {
        val dirUri = tableDir.toUri.getPath
        val keys = planned.flatMap { f =>
          val p = f.toPath.toUri.getPath
          if (!p.startsWith(dirUri)) None
          else Some(GraftStats.shardKeyOf(
            p.stripPrefix(dirUri).stripPrefix("/")))
        }.distinct
        keys.flatMap { k =>
          cache.getOrElseUpdate(k, {
            // fail-safe: filters are advisory — a transient shard IO
            // race (concurrent reconcile) must cost pruning, never a
            // query
            try {
              val f = shardFile(tableDir, k)
              if (!fs.exists(f)) Map.empty
              else {
                val in = fs.open(f)
                val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
                  .getLines().toList finally in.close()
                parseShard(lines)
              }
            } catch { case NonFatal(_) => Map.empty[String, FileBlooms] }
          })
        }.toMap
      }
  }

  /** Three-valued: true = the file MAY hold a matching row. Only
    * equality shapes consult the filter — that is all a Bloom filter
    * can answer. Unknown shapes/columns/kinds answer true.
    */
  def mayMatch(e: Expression, fb: FileBlooms): Boolean = e match {
    case And(l, r) => mayMatch(l, fb) && mayMatch(r, fb)
    case Or(l, r) => mayMatch(l, fb) || mayMatch(r, fb)
    case EqualTo(a: AttributeReference, l: Literal) => leaf(a, l.value, fb)
    case EqualTo(l: Literal, a: AttributeReference) => leaf(a, l.value, fb)
    case EqualNullSafe(a: AttributeReference, l: Literal)
        if l.value != null => leaf(a, l.value, fb)
    case EqualNullSafe(l: Literal, a: AttributeReference)
        if l.value != null => leaf(a, l.value, fb)
    case In(a: AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => leaf(a, v.asInstanceOf[Literal].value, fb))
    case InSet(a: AttributeReference, vs) if vs.nonEmpty =>
      vs.exists(v => leaf(a, v, fb))
    case _ => true
  }

  private def leaf(a: AttributeReference, v: Any, fb: FileBlooms): Boolean =
    fb.cols.get(a.name.toLowerCase) match {
      case None => true
      case Some((kind, bf)) => v match {
        case null => true // null equality never matches, not our tier
        case _ => (kind, v) match {
          case ('l', b: Byte) => bf.mightContainLong(b.toLong)
          case ('l', s: Short) => bf.mightContainLong(s.toLong)
          case ('l', i: Int) => bf.mightContainLong(i.toLong)
          case ('l', l: Long) => bf.mightContainLong(l)
          case ('s', u: UTF8String) => bf.mightContainString(u.toString)
          case ('s', s: String) => bf.mightContainString(s)
          case _ => true // kind/value mismatch: no claim
        }
      }
    }

  /** Whether a planned file survives the bloom tier: a VALID entry
    * (length+mtime match) whose filters prove every conjunct
    * impossible drops the file; anything else keeps it.
    */
  def keepFile(f: PartitionedFile, filters: Seq[Expression],
      m: Map[String, FileBlooms], tableDir: Path): Boolean = {
    val dirUri = tableDir.toUri.getPath
    val p = f.toPath.toUri.getPath
    if (!p.startsWith(dirUri)) return true
    val rel = p.stripPrefix(dirUri).stripPrefix("/")
    m.get(rel) match {
      case Some(fb) if fb.size == f.fileSize &&
          fb.mtime == f.modificationTime =>
        filters.forall(mayMatch(_, fb))
      case _ => true
    }
  }

  /** Prune planned splits through the bloom tier (post stats-prune;
    * composes — both are conjunctive keeps).
    */
  def prune(parts: Array[InputPartition], filters: Seq[Expression],
      m: Map[String, FileBlooms], tableDir: Path): Array[InputPartition] = {
    if (filters.isEmpty || m.isEmpty) return parts
    var changed = false
    val rebuilt = parts.flatMap {
      case fp: FilePartition =>
        val kept = fp.files.filter(keepFile(_, filters, m, tableDir))
        if (kept.length == fp.files.length) Some(fp)
        else {
          changed = true
          if (kept.isEmpty) None else Some(FilePartition(fp.index, kept))
        }
      case other => Some(other)
    }
    if (!changed) parts
    else rebuilt.zipWithIndex.map { case (p, i) =>
      p match {
        case fp: FilePartition if fp.index != i => FilePartition(i, fp.files)
        case ok => ok
      }
    }
  }
}
