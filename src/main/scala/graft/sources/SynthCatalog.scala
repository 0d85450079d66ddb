package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 catalog for the synthetic source — the piece that upgrades
  * [[SynthSource]]'s bucketed scans from "reported" to "usable".
  *
  * Spark only reasons about a connector's `bucket(n, col)` transform
  * when it can resolve the bucket FUNCTION through the table's
  * catalog, so key-grouped execution (aggregates without an exchange,
  * storage-partitioned joins — the Iceberg-style scan-aligned
  * plans) needs the table to come from a `TableCatalog` +
  * `FunctionCatalog` pair, not a bare `format()` read. Register as
  *
  * {{{
  *   spark.sql.catalog.synth = graft.sources.SynthCatalog
  *   spark.sql.catalog.synth.rows = 100000
  *   spark.sql.catalog.synth.buckets = 32
  * }}}
  *
  * and read `spark.table("synth.docs")`. With
  * `spark.sql.sources.v2.bucketing.enabled=true`, a groupBy(doc_id)
  * over the table plans with NO shuffle (partitions already cluster
  * the key), and a self-join on doc_id storage-partition-joins —
  * SynthBucketingSpec pins both plan shapes plus row parity against
  * the unbucketed path.
  *
  * Read-only by design: mutations belong to the file catalog
  * (`graft.runtime.Catalog`); every write method throws.
  */
class SynthCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = "synth"
  private var rows: Long = 1000L
  private var partitions: Int = 4
  private var buckets: Int = 0

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rows = Option(options.get("rows")).map(_.toLong).getOrElse(1000L)
    partitions = Option(options.get("partitions")).map(_.toInt).getOrElse(4)
    buckets = Option(options.get("buckets")).map(_.toInt).getOrElse(0)
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "docs"))

  override def loadTable(ident: Identifier): Table =
    if (ident.name == "docs") new SynthTable(rows, partitions, buckets)
    else throw new NoSuchTableException(ident)

  override def createTable(ident: Identifier, schema: StructType,
                           transforms: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("synth catalog is read-only")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException("synth catalog is read-only")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("synth catalog is read-only")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name == "bucket") SynthBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** The bucket transform's function: bucket(n, doc_id) = doc_id % n —
  * the SAME assignment [[SynthBucket]] readers generate by striding,
  * which is the contract that makes the reported partition keys
  * truthful. Spark resolves this to validate/compare the transform;
  * partition VALUES still come from `HasPartitionKey`.
  */
object SynthBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String = "bucket(n, doc_id): doc_id % n"
  override def bind(inputType: StructType): BoundFunction = Bound

  object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.synth.bucket"
    override def produceResult(input: InternalRow): Integer =
      (input.getLong(1) % input.getInt(0)).toInt
  }
}
