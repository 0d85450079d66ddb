package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.FileScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** PER-COMMIT TIME TRAVEL — `SELECT ... FROM cat.ns.t VERSION AS OF
  * 'c<id>'` (r14 verdict item 2; Iceberg's snapshot reads, Delta's
  * `VERSION AS OF`, re-expressed over the commit journal
  * [[GraftCommits]] + the tombstone store [[GraftRetired]]).
  *
  * The snapshot's file set is a pure journal replay
  * ([[GraftCommits.stateAt]]): every `adds` up to the commit minus
  * every `removes`. Each file instance resolves to its CURRENT
  * location — still live, or parked byte-identical under the removing
  * commit's tombstone (relative hive layout preserved, so partition
  * values parse exactly as on the live table). Deletion-vector state
  * replays the same way: the per-commit ordinal DELTAS recorded by
  * merge-on-read deletes reconstruct exactly which rows were deleted
  * as of the commit, applied here as a sequential ordinal skip over
  * whole-file splits.
  *
  * Read-only by construction (BATCH_READ only). Column pruning
  * forwards to the parquet delegate; filters stay post-scan (snapshot
  * reads are an occasional audit surface, not a hot path — the LIVE
  * table keeps the full pushdown machinery). A snapshot whose
  * preimages were GC'd (`remove_orphans` expired the tombstones)
  * refuses loudly at planning, never serves a partial state.
  */
private[sources] final class GraftCommitSnapshotTable(
    spark: SparkSession, baseName: String, dir: String, format: String,
    meta: GraftTableMeta, commitId: Long)
  extends Table with SupportsRead {

  require(format == "parquet",
    s"$baseName: per-commit time travel is defined over parquet tables")

  private def delegate =
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      name(), spark, CaseInsensitiveStringMap.empty(), Seq(dir), meta.schema,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])

  override def name(): String = s"$baseName@c$commitId"

  override def schema(): StructType = meta.schema.getOrElse(delegate.schema)

  override def partitioning(): Array[Transform] = Array.empty

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    delegate.newScanBuilder(options) match {
      case fsb: org.apache.spark.sql.execution.datasources.v2.FileScanBuilder =>
        new ScanBuilder with SupportsPushDownRequiredColumns {
          override def pruneColumns(requiredSchema: StructType): Unit =
            fsb.pruneColumns(requiredSchema)
          override def build(): Scan = fsb.build() match {
            case fscan: FileScan =>
              new GraftCommitSnapshotScan(fscan, new Path(dir),
                meta.renameAliases, commitId)
            case other => throw new IllegalStateException(
              s"unreachable: parquet delegate built $other")
          }
        }
      case other => throw new IllegalStateException(
        s"unreachable: parquet delegate returned $other")
    }
}

/** One snapshot partition: whole-file splits read through the inner
  * reader, skipping the ordinals deleted as of the snapshot's commit.
  */
private[sources] final case class SnapshotPartition(
    files: Array[PartitionedFile], skipOrds: Map[String, Array[Long]])
  extends InputPartition

private[sources] final class GraftCommitSnapshotScan(
    fileScan: FileScan, tableDir: Path,
    renameAliases: Map[String, Seq[String]], commitId: Long)
  extends Scan with Batch {

  override def readSchema(): StructType = fileScan.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCommitSnapshotScan(${tableDir.getName}@c$commitId)"

  private def fs = tableDir.getFileSystem(
    SparkSession.active.sparkContext.hadoopConfiguration)

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    // journaled stream epochs make snapshots addressable on mixed
    // tables, but live equality-delete sidecars retract rows this
    // whole-file replay would serve back — refuse, never over-serve
    GraftEqDel.requireNone(fs, tableDir, "a per-commit snapshot read")
    // checkpoint-aware (r15 item 3): state replays from the latest
    // checkpoint + tail (≤ tail-length record reads), with the full
    // prefix only for pre-checkpoint commits; expired prefixes refuse
    val (recs, files, dv) = GraftCommits.stateAndRecs(fs, tableDir,
      commitId)
    // resolve every instance, grouped by its current base directory
    val resolved: Seq[(Path, String)] = files.toSeq.map { case (rel, addId) =>
      val p = GraftCommits.resolveInstance(fs, tableDir, recs, rel, addId)
        .getOrElse(throw new IllegalArgumentException(
          s"$tableDir: commit $commitId is no longer servable — the " +
            s"tombstone preserving $rel was expired by remove_orphans"))
      (new Path(p.toString.stripSuffix("/" + rel)), rel)
    }
    val out = Array.newBuilder[InputPartition]
    resolved.groupBy(_._1).foreach { case (base, entries) =>
      val idx = new org.apache.spark.sql.execution.datasources
        .InMemoryFileIndex(
          spark, entries.map(e => new Path(base, e._2)),
          Map("basePath" -> base.toString),
          Some(StructType(fileScan.dataSchema.fields ++
            fileScan.fileIndex.partitionSchema.fields)))
      val planned = GraftScanFilters.withFileIndex(fileScan, idx)
        .toBatch.planInputPartitions().flatMap {
          case fp: FilePartition => fp.files
          case _ => Array.empty[PartitionedFile]
        }
      val relOf = entries.map(e =>
        (fs.makeQualified(new Path(base, e._2)).toUri.getPath, e._2)).toMap
      val (withDv, plain) = planned.partition(f =>
        relOf.get(f.toPath.toUri.getPath).exists(dv.contains))
      if (plain.nonEmpty)
        out += SnapshotPartition(plain, Map.empty)
      if (withDv.nonEmpty) {
        // whole-file splits: the ordinal skip counts rows sequentially
        val whole = withDv.groupBy(_.filePath.toString).values.map { ps =>
          ps.head.copy(start = 0, length = ps.head.fileSize)
        }.toArray
        val skip = whole.map { f =>
          val uri = f.toPath.toUri.getPath
          (uri, dv(relOf(uri)).sorted)
        }.toMap
        out += SnapshotPartition(whole, skip)
      }
    }
    out.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new GraftPartitionedCow.SerializableHadoopConf(
      SparkSession.active.sparkContext.hadoopConfiguration)
    def iso(f: PartitionReaderFactory): PartitionReaderFactory =
      new GraftRetired.FallbackReaderFactory(f, tableDir.toString, conf)
    val inner = GraftRename.factoryFor(fileScan, renameAliases, iso)
      .getOrElse(iso(fileScan.toBatch.createReaderFactory()))
    new SnapshotReaderFactory(inner)
  }
}

private[sources] final class SnapshotReaderFactory(
    inner: PartitionReaderFactory) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case sp: SnapshotPartition => new SnapshotReader(sp)
    case other => inner.createReader(other)
  }

  private final class SnapshotReader(sp: SnapshotPartition)
    extends PartitionReader[InternalRow] {
    private var fi = -1
    private var cur: PartitionReader[InternalRow] = _
    private var skip: Array[Long] = _
    private var skipIdx = 0
    private var rowIdx = -1L

    private def advance(): Boolean = {
      if (cur != null) { cur.close(); cur = null }
      fi += 1
      if (fi >= sp.files.length) false
      else {
        val f = sp.files(fi)
        skip = sp.skipOrds.getOrElse(f.toPath.toUri.getPath, null)
        skipIdx = 0
        rowIdx = -1L
        cur = inner.createReader(FilePartition(0, Array(f)))
        true
      }
    }

    override def next(): Boolean = {
      while (true) {
        if (cur == null && !advance()) return false
        if (cur.next()) {
          if (skip == null) return true
          rowIdx += 1
          if (skipIdx < skip.length && skip(skipIdx) == rowIdx) skipIdx += 1
          else return true
        } else { cur.close(); cur = null }
      }
      false
    }

    override def get(): InternalRow = cur.get()
    override def close(): Unit = if (cur != null) { cur.close(); cur = null }
  }
}
