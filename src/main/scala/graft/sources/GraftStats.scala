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

  private val FileName = "_graft_stats"

  /** Per-column file statistics, values in CATALYST-INTERNAL form:
    * kind 'l' = integer-like held as Long (byte/short/int/long/
    * date-days/timestamp-micros), 's' = string (UTF8 ordering),
    * 'b' = boolean. `nulls` is -1 when the footer did not record a
    * null count. min/max are None when every value in the file is
    * null — distinct from the column being absent (no usable stats).
    */
  final case class ColStats(kind: Char, nulls: Long,
      min: Option[Any], max: Option[Any])

  final case class FileStats(size: Long, mtime: Long, rows: Long,
      cols: Map[String, ColStats])

  // ---- manifest codec (line-based, like _graft_meta) ------------------
  // line:  relPathB64 \t size \t mtime \t rows \t col(col)*
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

  def write(fs: FileSystem, tableDir: Path,
      m: Map[String, FileStats]): Unit = {
    val tmp = new Path(tableDir, s".$FileName.tmp")
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder
      m.foreach { case (rel, st) =>
        sb.append(b64(rel)).append('\t').append(st.size).append('\t')
          .append(st.mtime).append('\t').append(st.rows).append('\t')
        sb.append(st.cols.map { case (c, cs) =>
          s"${b64(c)}:${cs.kind}:${cs.nulls}:" +
            s"${cs.min.map(encVal(cs.kind, _)).getOrElse("")}:" +
            s"${cs.max.map(encVal(cs.kind, _)).getOrElse("")}"
        }.mkString("\u0001"))
        sb.append('\n')
      }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
    // rename-over-existing fails on both local FS and HDFS: retire the
    // prior manifest first. The window where neither exists is safe —
    // a scan that finds no manifest simply doesn't prune.
    val dst = new Path(tableDir, FileName)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }

  def read(fs: FileSystem, tableDir: Path): Map[String, FileStats] = {
    val f = new Path(tableDir, FileName)
    if (!fs.exists(f)) Map.empty
    else {
      val in = fs.open(f)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      lines.filter(_.nonEmpty).flatMap { line =>
        try {
          val p = line.split('\t')
          val cols =
            if (p.length < 5 || p(4).isEmpty) Map.empty[String, ColStats]
            else p(4).split('\u0001').map { ce =>
              // values may contain ':' only in b64 padding-free alphabet
              // (they can't: b64 uses [A-Za-z0-9+/=]); split is safe
              val q = ce.split(':')
              val kind = q(1).charAt(0)
              val mn = if (q.length > 3 && q(3).nonEmpty)
                Some(decVal(kind, q(3))) else None
              val mx = if (q.length > 4 && q(4).nonEmpty)
                Some(decVal(kind, q(4))) else None
              unb64(q(0)) -> ColStats(kind, q(2).toLong, mn, mx)
            }.toMap
          Some(unb64(p(0)) -> FileStats(p(1).toLong, p(2).toLong,
            p(3).toLong, cols))
        } catch { case scala.util.control.NonFatal(_) => None }
      }.toMap
    }
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

  /** Collect (incrementally) per-file stats for every parquet data file
    * under `tableDir`: entries whose (length, mtime) already match are
    * kept, entries for vanished files are dropped, and only NEW files
    * get a footer read — so re-running after an append prices the
    * delta, not the table. Footer reads run on EXECUTORS
    * (one task per slice of the new-file list); the driver only merges
    * the per-file summaries and writes the manifest. Returns the number
    * of files newly analyzed. Non-parquet formats are not collected
    * (their scans simply never prune — same fail-safe as no manifest).
    */
  def analyze(spark: SparkSession, tableDir: String, format: String): Int = {
    if (format != "parquet") return 0
    val dir = new Path(tableDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return 0

    def files(p: Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) files(st.getPath)
        else Seq((st.getPath.toUri.getPath, st.getLen,
          st.getModificationTime))
      }

    val dirUri = dir.toUri.getPath
    val current = files(dir).map { case (abs, len, mt) =>
      (abs.stripPrefix(dirUri).stripPrefix("/"), len, mt)
    }
    val prior = read(fs, dir)
    val kept = current.flatMap { case (rel, len, mt) =>
      prior.get(rel).filter(st => st.size == len && st.mtime == mt)
        .map(rel -> _)
    }.toMap
    val todo = current.filterNot { case (rel, _, _) => kept.contains(rel) }
    if (todo.isEmpty && kept.size == prior.size) return 0

    val sc = new SerConf(conf)
    val slices = math.max(1, math.min(todo.size,
      spark.sparkContext.defaultParallelism))
    val fresh: Seq[(String, FileStats)] =
      if (todo.isEmpty) Nil
      else spark.sparkContext
        .parallelize(todo.map { case (rel, len, mt) =>
          (rel, s"$dirUri/$rel", len, mt)
        }, slices)
        .map { case (rel, abs, len, mt) =>
          rel -> footerStats(sc.value, abs, len, mt)
        }
        .collect().toSeq
    write(fs, dir, kept ++ fresh)
    fresh.size
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
    import org.apache.parquet.schema.LogicalTypeAnnotation
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
    * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` (no GROUP BY,
    * no filters) without scheduling a single task or opening a single
    * file — the lakehouse "metadata query" tier (Iceberg answers these
    * from manifest metrics, Delta from the stats in its log). At
    * 100 TB a `SELECT count(*), max(event_date) FROM fact` freshness
    * probe is a pure driver-side manifest fold instead of a
    * million-file scan; with `auto_analyze` every committed write
    * keeps the manifest complete, so the fast path stays available.
    *
    * Returns the one result row (catalyst-internal values) and its
    * schema, or None when the manifest cannot answer EXACTLY —
    * fail-safe conditions, each falling back to the normal scan:
    *  - every visible data file must carry a VALID manifest entry
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
    val manifest = read(fs, tableDir)

    def visible(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) visible(st.getPath) else Seq(st)
      }
    val dirUri = tableDir.toUri.getPath
    // every visible file needs a VALID manifest entry and, when the
    // table is hive-partitioned, a parseable `col=value` dir chain
    // (catalyst-internal values — what scans would produce)
    val perFile: Seq[Option[(FileStats, Array[Any])]] =
      visible(tableDir).map { st =>
        val rel = st.getPath.toUri.getPath
          .stripPrefix(dirUri).stripPrefix("/")
        manifest.get(rel)
          .filter(m => m.size == st.getLen && m.mtime == st.getModificationTime)
          .flatMap { m =>
            if (partitionSchema.isEmpty) Some((m, Array.empty[Any]))
            else {
              val segs = rel.split('/')
              if (segs.length != partitionSchema.length + 1) None
              else {
                val vals = partitionSchema.fields.zip(segs).map {
                  case (f, seg) =>
                    val eq = seg.indexOf('=')
                    if (eq < 0) return None
                    val nm = org.apache.spark.sql.catalyst.catalog
                      .ExternalCatalogUtils.unescapePathName(seg.take(eq))
                    if (!nm.equalsIgnoreCase(f.name)) return None
                    try GraftPartitionedCow.parseToken(seg.drop(eq + 1),
                      f.dataType)
                    catch { case scala.util.control.NonFatal(_) => return None }
                }
                Some((m, vals.toArray))
              }
            }
          }
      }
    if (perFile.exists(_.isEmpty)) return None // uncovered file: bail
    // pushed filters must be pure PARTITION predicates — then they are
    // EXACT at file granularity (every row of a file shares its dir
    // tokens), so filtering the file list IS filtering the rows; any
    // data-column reference or unsupported shape bails to the scan
    val allFiles = perFile.flatten.filter { case (_, pv) =>
      pushedFilters.forall { f =>
        evalPartition(f, partitionSchema, pv) match {
          case Some(TTrue) => true
          case Some(_) => false // FALSE and NULL both drop the file
          case None => return None
        }
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
