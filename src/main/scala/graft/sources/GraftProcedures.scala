package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.runtime.Catalog

/** SQL-addressable maintenance for [[GraftCatalog]] warehouses via
  * Spark 4's DSv2 stored procedures — `CALL cat.system.<proc>(...)`,
  * the addressing mode Iceberg/Trino use for table maintenance (the
  * reference's warehouse is Iceberg behind Trino, where compaction and
  * stats collection are `CALL system.*` procedures; an operator of a
  * 1000-executor cluster drives maintenance from SQL, not from a JVM
  * with library access). Each procedure resolves `table` as
  * `<layer>.<table>` inside the owning catalog and returns its effect
  * as rows, so orchestration can assert on the result set:
  *
  *  - `analyze(table)` — collect the [[GraftStats]] file-skipping
  *    manifest; returns the incremental footer-read count.
  *  - `compact(table)` — whole-table layout-preserving rewrite
  *    ([[Catalog.compactByName]]); returns visible data-file counts
  *    before/after.
  *  - `compact_partitions(table, min_files)` — incremental: rewrite
  *    only the hive partitions that accreted >= min_files files
  *    ([[Catalog.compactPartitionsByName]]); one row per compacted
  *    partition, zero rows = nothing touched (and nothing read).
  *
  * `SHOW PROCEDURES` / `DESCRIBE PROCEDURE` come free from the
  * catalog's listProcedures/description.
  */
object GraftProcedures {

  val Namespace = "system"

  def names: Array[String] = Array("analyze", "compact", "compact_partitions")

  def load(procName: String, engine: () => Catalog): UnboundProcedure =
    procName match {
      case "analyze" => new AnalyzeProc(engine)
      case "compact" => new CompactProc(engine)
      case "compact_partitions" => new CompactPartitionsProc(engine)
      case other => throw new IllegalArgumentException(
        s"unknown procedure system.$other (one of ${names.mkString(", ")})")
    }

  private def splitIdent(tableArg: UTF8String): (String, String) = {
    val s = String.valueOf(tableArg)
    s.split('.') match {
      case Array(layer, table) => (layer, table)
      case _ => throw new IllegalArgumentException(
        s"table must be '<layer>.<table>', got '$s'")
    }
  }

  /** Visible data files under a table dir (recursive, underscore/dot
    * sidecars excluded) — the before/after evidence compact returns.
    */
  private def dataFileCount(engine: Catalog, layer: String,
      table: String): Int = {
    val dir = new Path(engine.path(layer, table))
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    def walk(p: Path): Int = fs.listStatus(p).map { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) 0
      else if (st.isDirectory) walk(st.getPath)
      else 1
    }.sum
    if (fs.exists(dir)) walk(dir) else 0
  }

  private final class ResultScan(schema: StructType,
      result: Array[InternalRow]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = result
  }

  private def one(schema: StructType, row: InternalRow): JIterator[Scan] =
    Collections.singletonList(
      new ResultScan(schema, Array(row)): Scan).iterator()

  private abstract class MaintenanceProc(procName: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    // side-effecting by design: never constant-folded or re-invoked
    override def isDeterministic: Boolean = false
  }

  private final class AnalyzeProc(engine: () => Catalog)
    extends MaintenanceProc("analyze") {
    override def description(): String =
      "collect the per-file min/max data-skipping manifest " +
        "(incremental; returns files newly analyzed)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("<layer>.<table>").build())
    private val out = StructType(Seq(
      StructField("files_analyzed", IntegerType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val (layer, table) = splitIdent(input.getUTF8String(0))
      one(out, InternalRow(engine().analyze(layer, table)))
    }
  }

  private final class CompactProc(engine: () => Catalog)
    extends MaintenanceProc("compact") {
    override def description(): String =
      "whole-table layout-preserving compaction (bucket tags and " +
        "partition dirs survive); returns file counts before/after"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("<layer>.<table>").build())
    private val out = StructType(Seq(
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val (layer, table) = splitIdent(input.getUTF8String(0))
      val eng = engine()
      val before = dataFileCount(eng, layer, table)
      eng.compactByName(layer, table)
      one(out, InternalRow(before, dataFileCount(eng, layer, table)))
    }
  }

  private final class CompactPartitionsProc(engine: () => Catalog)
    extends MaintenanceProc("compact_partitions") {
    override def description(): String =
      "incremental compaction: rewrite only hive partitions with >= " +
        "min_files visible files; one row per compacted partition"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("<layer>.<table>").build(),
      ProcedureParameter.in("min_files", IntegerType)
        .defaultValue("4").comment("rewrite threshold").build())
    private val out = StructType(Seq(
      StructField("partition", StringType, nullable = false)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val (layer, table) = splitIdent(input.getUTF8String(0))
      val minFiles = input.getInt(1)
      val dirs = engine().compactPartitionsByName(layer, table, minFiles)
      Collections.singletonList(new ResultScan(out,
        dirs.map(d => InternalRow(UTF8String.fromString(d))).toArray)
        : Scan).iterator()
    }
  }
}
