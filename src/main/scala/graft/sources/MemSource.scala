package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path, exercised end to end: an in-memory table
  * (`format("graft-mem").option("name", ...)`) implementing the full
  * batch-write protocol —
  *
  *  - each task buffers its partition's rows in a [[DataWriter]] and
  *    ships them to the driver as its [[WriterCommitMessage]];
  *  - NOTHING becomes visible until the driver's `BatchWrite.commit`
  *    installs all messages atomically — a failed/aborted job leaves
  *    the table exactly as it was (the task-commit/driver-commit
  *    split that gives V2 writes all-or-nothing semantics);
  *  - `SupportsTruncate` distinguishes overwrite from append;
  *  - reads serve the last committed state, partitioned as committed.
  *
  * Deliberately single-process (a `TrieMap` keyed by table name): the
  * point is the PROTOCOL — the same surface a real warehouse connector
  * implements against object storage — in a form specs can fault-inject
  * (abort paths, partial task sets, concurrent appends). The
  * production write path remains the parquet [[graft.runtime.Catalog]];
  * Spark's own DSv2 test harness uses exactly this in-memory shape.
  */
class MemSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-mem"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val name = MemSource.nameFrom(options.get("name"))
    MemSource.schemaOf(name).getOrElse(throw new IllegalArgumentException(
      s"graft-mem table '$name' has no committed data to infer a schema from; " +
        "write to it first or supply a schema"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MemTable(MemSource.nameFrom(properties.get("name")), schema)
}

object MemSource {
  /** Committed state per table: (schema, partitions of row values). */
  private val store =
    TrieMap.empty[String, (StructType, Seq[Array[InternalRow]])]

  private[sources] def nameFrom(raw: String): String = {
    require(raw != null && raw.nonEmpty,
      "graft-mem requires .option(\"name\", <table>)")
    raw
  }

  def schemaOf(name: String): Option[StructType] = store.get(name).map(_._1)

  private[sources] def read(name: String): Seq[Array[InternalRow]] =
    store.get(name).map(_._2).getOrElse(Seq.empty)

  private[sources] def install(name: String, schema: StructType,
                               parts: Seq[Array[InternalRow]],
                               truncate: Boolean): Unit =
    store.synchronized { // append must read+replace atomically
      // appends must match the committed layout: supportsExternalMetadata
      // makes AppendData's analysis check trivially true (the table echoes
      // the writer's schema), so an unchecked append could commit
      // mixed-layout InternalRow partitions that readers then
      // misinterpret ordinally. Name + type must agree positionally;
      // nullability may narrow (a non-null write into a nullable slot).
      if (!truncate) store.get(name).map(_._1).foreach { stored =>
        val compatible = stored.length == schema.length &&
          stored.fields.zip(schema.fields).forall { case (s, w) =>
            s.name == w.name && s.dataType == w.dataType
          }
        require(compatible,
          s"graft-mem append to '$name': incoming schema ${schema.simpleString} " +
            s"is incompatible with committed schema ${stored.simpleString}")
      }
      val prev =
        if (truncate) Seq.empty
        else store.get(name).map(_._2).getOrElse(Seq.empty)
      store.put(name, (schema, prev ++ parts))
    }

  def drop(name: String): Unit = store.remove(name)

  def rowCount(name: String): Long = read(name).map(_.length.toLong).sum
}

private[sources] class MemTable(name: String, schema0: StructType)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-mem($name)"
  override def schema(): StructType =
    if (schema0 != null && schema0.nonEmpty) schema0
    else MemSource.schemaOf(name).getOrElse(new StructType())
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MemScan(name, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(name, info.schema())
}

private class MemScan(name: String, val readSchema: StructType)
  extends Scan with Batch {
  override def toBatch: Batch = this
  override def description(): String = s"graft-mem scan $name"
  /** Rows are SNAPSHOTTED into the partitions at planning time: a scan
    * is pinned to the committed state it was planned against, so a
    * truncate/overwrite that commits between planInputPartitions and
    * task execution can neither throw (index drift) nor serve mixed
    * state — and the rows travel with the partition, the shape that
    * survives multi-JVM shipping (the committed UnsafeRows serialize).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val parts = MemSource.read(name)
    if (parts.isEmpty) Array(MemPartition(name, Array.empty))
    else parts.map(rows => MemPartition(name, rows): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val MemPartition(_, rows) = p: @unchecked
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = rows(i)
          override def close(): Unit = ()
        }
      }
    }
}

private case class MemPartition(name: String, rows: Array[InternalRow])
  extends InputPartition

private class MemWriteBuilder(name: String, schema: StructType)
  extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(name, schema, doTruncate)
  }
}

/** Task-side buffered rows, shipped to the driver at task commit. */
private case class MemCommit(rows: Array[InternalRow]) extends WriterCommitMessage

private class MemBatchWrite(name: String, schema: StructType,
                            truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          override def write(record: InternalRow): Unit =
            buf += record.copy() // unsafe rows are reused by the caller
          override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
          override def abort(): Unit = buf.clear() // nothing escaped the task
          override def close(): Unit = ()
        }
    }

  /** All-or-nothing: messages from every successful task install in
    * one synchronized step; a job that never reaches here (task
    * failure → abort) changes nothing.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemSource.install(name, schema,
      messages.toSeq.map(_.asInstanceOf[MemCommit].rows), truncate)

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
