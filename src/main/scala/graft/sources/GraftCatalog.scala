package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{And => CatalystAnd, AttributeReference, EqualNullSafe, EqualTo, In, InSet, Literal, Or => CatalystOr, Expression => CatalystExpr}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, SupportsReportStatistics, SupportsRuntimeV2Filtering, VariantExtraction}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDynamicOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.v2.{FileScan, FileScanBuilder, FileTable}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.runtime.Catalog

/** Session-catalog plugin over the engine's path-based warehouse —
  * the piece that makes [[graft.runtime.Catalog]] tables addressable
  * by NAME through Spark SQL, the way the reference addresses every
  * table through its metastore catalog
  * (`spark.table("iceberg.raw.daily_reports")` at
  * /root/reference/airflow/dags/scripts/process_covid_ods.py:30,
  * `CREATE NAMESPACE IF NOT EXISTS` at process_covid_raw.py:100).
  *
  * Register:
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse/path
  *   spark.sql.catalog.graft.format = parquet   (optional)
  * }}}
  * then `CREATE NAMESPACE graft.ods`, `CREATE TABLE graft.ods.t (...)
  * PARTITIONED BY (...)`, `INSERT INTO graft.ods.t ...`,
  * `SELECT ... FROM graft.ods.t`, `MERGE INTO graft.ods.t ...`,
  * `UPDATE` / `DELETE`, `DESCRIBE`, `SHOW TABLES` all resolve here.
  *
  * Layout contract is exactly the object API's: namespace = first-level
  * directory (layer), table = `<root>/<layer>/<table>` in one of the
  * catalog's storage formats, hive-style partition directories. Tables
  * written through `graft.runtime.Catalog` are therefore readable by
  * name with NO registration step (schema inferred from footers /
  * partition layout), and tables created via SQL DDL are readable by
  * the object API — one warehouse, two addressing modes.
  *
  * Division of labor per surface:
  *  - READS delegate to Spark's own file tables (ParquetTable & co), so
  *    the scans keep every DSv2 tier: filter/column pushdown, partition
  *    pruning, runtime (dynamic) pruning, footer statistics;
  *  - INSERT INTO / INSERT OVERWRITE build a [[V1Write]] routed through
  *    [[graft.runtime.Catalog]]'s crash-safe write protocols
  *    (partitioned append; temp-dir + rename-swap full replace) — the
  *    same paths the object API uses, so SQL writes inherit the
  *    publish-safety story instead of reimplementing it;
  *  - MERGE / UPDATE / DELETE implement [[SupportsRowLevelOperations]]
  *    as group-based copy-on-write (see [[GraftTable]] docs).
  *
  * SQL-created tables persist their schema + partition spec in a
  * `_graft_meta` sidecar inside the table directory (underscore prefix
  * ⇒ invisible to file indexes), standing in for the metastore entry; a
  * table without a sidecar is served schema-by-inference.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
  with FunctionCatalog with ProcedureCatalog
  with org.apache.spark.sql.connector.catalog.ViewCatalog {

  /** Column DEFAULT values (r14 verdict item 8 — the reference's alert
    * store declares `created_at DEFAULT CURRENT_TIMESTAMP`,
    * covid_alerts_dag.py:26): declaring the capability makes Spark
    * store each default's SQL in the column metadata (the schema
    * sidecar round-trips it) and resolve it on every SQL ingest — an
    * INSERT omitting the column, the DEFAULT keyword, and ALTER
    * TABLE ADD COLUMN ... DEFAULT all fill through
    * ResolveDefaultColumns against the stored expression.
    */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private var catalogName: String = "graft"
  private var root: String = _
  private var format: String = "parquet"
  private var versions: Int = 0
  private var autoAnalyze: Boolean = false

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name needs spark.sql.catalog.$name.root=<warehouse path>"))
    format = Option(options.get("format")).getOrElse("parquet")
    require(Catalog.Formats.contains(format),
      s"unsupported format '$format' (one of ${Catalog.Formats.mkString(", ")})")
    // spark.sql.catalog.<name>.versions = N retains each full replace
    // as an Iceberg-snapshot-style version — the store VERSION AS OF /
    // TIMESTAMP AS OF resolve against
    versions = Option(options.get("versions")).map(_.toInt).getOrElse(0)
    require(versions >= 0, "versions must be >= 0")
    // spark.sql.catalog.<name>.auto_analyze = true refreshes the
    // _graft_stats skipping manifest incrementally after every
    // committed write (only the write's own new files pay a footer
    // read) — Delta's stats-in-the-log freshness without an operator
    // CALL; default off, CALL system.analyze remains the manual lever
    autoAnalyze = Option(options.get("auto_analyze")).exists(_.toBoolean)
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def engine: Catalog = Catalog(spark, root, format, versions)
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def layerOf(ns: Array[String]): String = {
    require(ns.length == 1,
      s"graft namespaces are single-level layers, got ${ns.mkString(".")}")
    ns.head
  }

  /** Internal publish/version/staging siblings must never surface as
    * tables or namespaces.
    */
  private def isInternal(dirName: String): Boolean =
    dirName.contains(".__") || dirName.startsWith("_") || dirName.startsWith(".")

  // ---- namespaces -------------------------------------------------------

  private def isFnNamespace(ns: Array[String]): Boolean =
    ns.length == 1 && ns.head.equalsIgnoreCase(GraftFunctions.Namespace)

  override def listNamespaces(): Array[Array[String]] = {
    val r = new Path(root)
    val stored =
      if (!fs.exists(r)) Array.empty[String]
      else fs.listStatus(r).filter(_.isDirectory)
        .map(_.getPath.getName).filterNot(isInternal)
    // the virtual function namespace is always present (and wins over
    // an unluckily-named data directory)
    (stored.filterNot(_ == GraftFunctions.Namespace) :+ GraftFunctions.Namespace)
      .sorted.map(Array(_))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // single-level: no children
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    isFnNamespace(namespace) ||
      (namespace.length == 1 && fs.exists(new Path(s"$root/${namespace.head}")))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    Map("location" -> s"$root/${layerOf(namespace)}").asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    require(!isFnNamespace(namespace),
      s"'${GraftFunctions.Namespace}' is the reserved function namespace")
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException((catalogName +: namespace.toSeq).toArray)
    fs.mkdirs(new Path(s"$root/${layerOf(namespace)}"))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    require(!isFnNamespace(namespace),
      s"'${GraftFunctions.Namespace}' is the reserved function namespace")
    if (!namespaceExists(namespace)) false
    else {
      if (!cascade && listTables(namespace).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(new Path(s"$root/${layerOf(namespace)}"), true)
    }
  }

  // ---- tables -----------------------------------------------------------

  private def tableDir(ident: Identifier): Path =
    new Path(s"$root/${layerOf(ident.namespace)}/${ident.name}")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    val dir = new Path(s"$root/${layerOf(namespace)}")
    if (!fs.exists(dir)) Array.empty // the virtual fn namespace holds no tables
    else fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(isInternal)
      .sorted.map(Identifier.of(namespace, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 && fs.exists(tableDir(ident))

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style nested-identifier metadata relations:
    // `cat.<ns>.<table>.files|history|changes` resolve against the base
    // table — possible only because graft namespaces are single-level,
    // so a 2-level namespace is unambiguous
    if (ident.namespace.length == 2) {
      val base = Identifier.of(ident.namespace.take(1), ident.namespace.apply(1))
      if (!tableExists(base)) throw new NoSuchTableException(ident)
      val dir = tableDir(base)
      val baseName = s"$catalogName.${ident.namespace.mkString(".")}"
      return ident.name.toLowerCase match {
        case "files" =>
          new GraftMetaTable(s"$baseName.files", GraftMetaTables.FilesSchema,
            () => GraftMetaTables.filesRows(spark, dir))
        case "partitions" =>
          new GraftMetaTable(s"$baseName.partitions",
            GraftMetaTables.PartitionsSchema,
            () => GraftMetaTables.partitionsRows(spark, dir))
        case "history" =>
          val layer = layerOf(base.namespace)
          new GraftMetaTable(s"$baseName.history",
            GraftMetaTables.HistorySchema,
            () => GraftMetaTables.historyRows(spark, fs, root, layer,
              base.name, engine.history(layer, base.name)))
        case "changes" =>
          new GraftChangesTable(spark, baseName, dir.toString, format,
            GraftTableMeta.read(fs, dir))
        case "commits" =>
          new GraftMetaTable(s"$baseName.commits",
            GraftMetaTables.CommitsSchema,
            () => GraftMetaTables.commitsRows(spark, dir))
        case _ => throw new NoSuchTableException(ident)
      }
    }
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val meta = GraftTableMeta.read(fs, tableDir(ident))
    new GraftTable(spark, catalogName, root, format,
      layerOf(ident.namespace), ident.name, meta, versions,
      autoAnalyze = autoAnalyze)
  }

  /** `SELECT ... FROM cat.ns.t VERSION AS OF n` — serves the retained
    * version directory ([[graft.runtime.Catalog.readVersion]]'s store)
    * as a read-only snapshot table. Version n is the table as it was
    * BEFORE the (n+1)-th retained full replace, matching the object
    * API's `history` numbering exactly.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // `VERSION AS OF 'c<id>'` — PER-COMMIT time travel against the
    // commit journal ([[GraftCommits]], r14 item 2): any batch commit
    // (append, overwrite, rewrite, delete, mor-delete) is addressable,
    // not only retained full replaces
    if (version.matches("[cC]\\d+")) {
      val dir = tableDir(ident)
      val meta = GraftTableMeta.read(fs, dir)
      return new GraftCommitSnapshotTable(spark,
        s"$catalogName.${ident.namespace.mkString(".")}.${ident.name}",
        dir.toString, format, meta, version.drop(1).toLong)
    }
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft versions are integers (history numbering) or 'c<commit>' " +
          s"(commit-journal snapshots), got '$version'")
    }
    val hist = engine.history(layerOf(ident.namespace), ident.name)
    require(hist.contains(v),
      s"$ident has no retained version $v (history: ${hist.mkString(", ")})")
    snapshotTable(ident, v)
  }

  /** `SELECT ... FROM cat.ns.t TIMESTAMP AS OF ts` — resolves against
    * each state's PUBLISH time, which the directory store carries for
    * free: a directory's mtime is when its files were written, and the
    * archive rename (like the publish swap) preserves it. The state at
    * ts is therefore the latest state (retained version or the live
    * table) whose publish mtime is at-or-before ts — Iceberg's
    * snapshot-as-of rule over a directory store. A ts before the
    * earliest retained publish is refused (that history is pruned,
    * same as Iceberg before the first snapshot).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val layer = layerOf(ident.namespace)
    val tsMillis = timestamp / 1000L // Spark passes microseconds
    def publishedAt(p: Path): Long = fs.getFileStatus(p).getModificationTime
    val states: Seq[(Option[Int], Long)] =
      engine.history(layer, ident.name).map { v =>
        (Some(v), publishedAt(new Path(
          s"$root/$layer/${ident.name}.__versions/" + f"v$v%06d")))
      } :+ ((None, publishedAt(tableDir(ident))))
    val atOrBefore = states.filter(_._2 <= tsMillis)
    require(atOrBefore.nonEmpty,
      s"$ident: timestamp predates the retained history (earliest " +
        s"publish ${new java.sql.Timestamp(states.map(_._2).min)})")
    atOrBefore.maxBy(_._2)._1 match {
      case Some(v) => snapshotTable(ident, v)
      case None => loadTable(ident) // live state is the match
    }
  }

  private def snapshotTable(ident: Identifier, v: Int): Table = {
    val layer = layerOf(ident.namespace)
    new GraftTable(spark, catalogName, root, format, layer,
      s"${ident.name}@v$v", GraftTableMeta(None, Nil), versions,
      dataDirOverride =
        Some(s"$root/$layer/${ident.name}.__versions/" + f"v$v%06d"))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // the virtual function namespace satisfies namespaceExists but must
    // hold no tables: a data directory materialized under it would be
    // unreachable (dropNamespace refuses the reserved name)
    require(!isFnNamespace(ident.namespace),
      s"'${GraftFunctions.Namespace}' is the reserved function namespace: " +
        "tables cannot be created in it")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(!viewExists(ident), s"$ident already exists as a VIEW")
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(catalogName +: ident.namespace.toSeq)
    var bucketSpec: Option[(Int, String)] = None
    val partitionCols = partitions.toSeq.flatMap {
      case t if t.name == "identity" =>
        Seq(t.references().head.fieldNames.mkString("."))
      case t if t.name == "bucket" =>
        // `PARTITIONED BY (bucket(n, col))` / `CLUSTERED BY` — stored in
        // the sidecar; writes route rows into bucket-tagged files and
        // scans report KeyGroupedPartitioning (storage-partitioned join)
        require(bucketSpec.isEmpty, "at most one bucket transform")
        val refs = t.references().map(_.fieldNames.mkString("."))
        require(refs.length == 1,
          s"graft buckets cover exactly one column, got ${refs.mkString(", ")}")
        val n = t.arguments().collectFirst {
          case l: V2Literal[_] if l.value != null => l.value.toString.toInt
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform without a bucket count: $t"))
        require(n > 0, s"bucket count must be positive, got $n")
        bucketSpec = Some((n, refs.head))
        Nil
      case other => throw new UnsupportedOperationException(
        s"graft tables support identity (hive-style) partitioning and " +
          s"bucket(n, col) clustering only, got $other")
    }
    val unknown = partitionCols.filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty, s"partition columns not in schema: $unknown")
    bucketSpec.foreach { case (_, c) =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"bucket column $c not in schema"))
      require(GraftBucket.keyType(f.dataType),
        s"bucket column $c: type ${f.dataType} unsupported " +
          "(long/int/short/byte/string)")
      require(!partitionCols.exists(_.equalsIgnoreCase(c)),
        s"column $c cannot be both a partition and a bucket column")
    }
    // durable table properties: delete_mode selects the row-level
    // DELETE strategy (copy-on-write rewrites files — the default;
    // merge-on-read records positions in [[GraftDv]] deletion vectors);
    // bloom_columns/bloom_fpp keep [[GraftBloom]] point-lookup filters
    // maintained at write time under auto_analyze catalogs. Unknown
    // keys are ignored (Spark passes reserved props through).
    val checkProps = properties.asScala.toMap.filter { case (k, _) =>
      GraftCheck.isCheckKey(k)
    } ++
      // NOT NULL column declarations become INTERNAL check constraints
      // so every writer path enforces them ([[GraftCheck]]) — Spark's
      // analyzer-level null checks don't run for streaming toTable or
      // the object API
      schema.fields.filterNot(_.nullable).map { f =>
        (GraftCheck.PropPrefix + s"__not_null_${f.name.toLowerCase}") ->
          s"`${f.name}` IS NOT NULL"
      }.toMap
    val durableProps =
      durableKeys.flatMap { k =>
        Option(properties.get(k)).map { v =>
          validateDurableProp(k, v, format, Some(schema), partitionCols)
          k -> v
        }
      }.toMap ++ checkProps.map { case (k, v) =>
        validateDurableProp(k, v, format, Some(schema), partitionCols)
        k -> v
      }
    val dir = tableDir(ident)
    fs.mkdirs(dir)
    val meta = GraftTableMeta(Some(schema), partitionCols, bucketSpec,
      durableProps)
    GraftTableMeta.write(fs, dir, meta)
    new GraftTable(spark, catalogName, root, format,
      layerOf(ident.namespace), ident.name, meta,
      autoAnalyze = autoAnalyze)
  }

  /** Schema evolution through SQL DDL — the metadata-only subset that
    * is safe over immutable data files:
    *  - ADD COLUMN (nullable, no default): appended to the sidecar
    *    schema; files written before the change simply lack the column
    *    and every format here null-fills a requested-but-absent field,
    *    so old rows read as NULL with zero rewrites — Iceberg's add-
    *    column semantics;
    *  - DROP COLUMN: removed from the sidecar schema; readers stop
    *    projecting it (the bytes stay in old files, unreachable) —
    *    again metadata-only.
    * RENAME COLUMN is refused: files resolve columns BY NAME, so a
    * rename would silently disconnect every existing file's data from
    * the renamed field (Iceberg survives this via field IDs; a plain
    * directory store has none). Type changes and defaults are refused
    * for the same read-path reasons. A table created by the object API
    * (no sidecar) gets its inferred schema materialized first, then
    * altered.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // property toggles are metadata-only and format-agnostic: split
    // them out before the csv schema-change refusal below
    val (propChanges, schemaChanges) = changes.partition {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => true
      case _ => false
    }
    if (schemaChanges.isEmpty && propChanges.nonEmpty)
      return alterProperties(ident, propChanges)
    require(propChanges.isEmpty,
      "mix of property and schema changes in one ALTER: run them separately")
    require(format != "csv",
      "csv files resolve columns by POSITION: any schema change would " +
        "mis-map existing files' columns — rewrite via CTAS instead")
    val dir = tableDir(ident)
    val meta0 = GraftTableMeta.read(fs, dir)
    val table0 = new GraftTable(spark, catalogName, root, format,
      layerOf(ident.namespace), ident.name, meta0, versions)
    val base = meta0.schema.getOrElse(table0.schema())
    // evolved spec columns are partition columns for every refusal
    // below: their values are directory names in the new era
    val partCols =
      (if (meta0.partitionCols.nonEmpty) meta0.partitionCols
      else table0.partitioning().toSeq.collect {
        case t if t.name == "identity" =>
          t.references().head.fieldNames.mkString(".")
      }) ++ meta0.evolvedCols
    // RENAME COLUMN (r12 item 8): metadata-only via field ids. The
    // sidecar assigns each column a stable id at the first rename and
    // logs the retired name as an ALIAS of that id; reads resolve a
    // renamed column in pre-rename files through the alias merge
    // ([[GraftRename]]). No file is rewritten.
    var fieldIds = meta0.fieldIds
    var aliases = meta0.aliases
    var props1 = meta0.props
    val newSchema = changes.foldLeft(base) { (s, ch) =>
      ch match {
        case rn: TableChange.RenameColumn =>
          require(format == "parquet",
            s"RENAME COLUMN needs parquet (alias resolution reads " +
              s"per-file schemas); format is $format")
          require(rn.fieldNames.length == 1,
            s"graft tables support top-level columns only, got " +
              rn.fieldNames.mkString("."))
          val old = rn.fieldNames.head
          val nw = rn.newName
          require(s.fieldNames.exists(_.equalsIgnoreCase(old)),
            s"column $old does not exist")
          locally {
            // the INTERNAL not-null constraint follows its column; any
            // OTHER referencing constraint refuses (it would stop
            // resolving and silently un-enforce)
            val nnKey = GraftCheck.PropPrefix + s"__not_null_${old.toLowerCase}"
            require(!GraftCheck.constraintsOf(meta0.props - nnKey).exists(c =>
                GraftCheck.referencedCols(spark, s, c).contains(
                  old.toLowerCase)),
              s"cannot rename column $old: a CHECK constraint references " +
                "it by name (the constraint would stop resolving and " +
                "silently un-enforce) — UNSET the constraint first")
            if (props1.contains(nnKey)) {
              props1 -= nnKey
              props1 += (GraftCheck.PropPrefix +
                s"__not_null_${nw.toLowerCase}" -> s"`$nw` IS NOT NULL")
            }
          }
          require(!partCols.exists(_.equalsIgnoreCase(old)),
            s"cannot rename partition column $old: its values are " +
              "directory names")
          require(!meta0.bucketSpec.exists(_._2.equalsIgnoreCase(old)),
            s"cannot rename bucket column $old")
          require(!s.fieldNames.exists(_.equalsIgnoreCase(nw)),
            s"column $nw already exists")
          require(!aliases.exists(_._2.equalsIgnoreCase(nw)),
            s"$nw was a previous name of another column — resolution " +
              "would be ambiguous; compact the table first")
          // positional/equality delete machinery is name/position-
          // coupled: materialize before renaming
          require(!GraftDv.hasAny(fs, dir) && !GraftEqDel.hasAny(fs, dir),
            s"cannot RENAME COLUMN while deletion vectors or equality " +
              "deletes are live — CALL system.rewrite_deletes first")
          // a bloom build of the renamed column would DATA-READ old
          // files under the new name (all null — parquet resolves by
          // name) and publish empty filters that silently prune their
          // real rows: refuse rather than poison
          require(!props1.get("bloom_columns").exists(
              _.split(',').map(_.trim).exists(_.equalsIgnoreCase(old))),
            s"cannot RENAME COLUMN $old while bloom_columns covers it — " +
              "UNSET the property (or drop the column from it), rename, " +
              "compact, then re-set")
          // fresh ids must clear BOTH the live ids and every RETIRED
          // alias id: a dropped column's id stays in the alias log, and
          // reusing it would silently merge the dropped column's
          // physical data into the new holder (rename b->b2, drop b2,
          // add c, rename c->d would map d -> [b])
          def nextId: Int =
            ((fieldIds.values ++ aliases.map(_._1)).foldLeft(-1)(math.max)) + 1
          if (fieldIds.isEmpty)
            fieldIds = s.fieldNames.zipWithIndex.map {
              case (n, i) => n -> (i + nextId)
            }.toMap
          val canonical = s.fieldNames.find(_.equalsIgnoreCase(old)).get
          val id = fieldIds.getOrElse(canonical,
            fieldIds.collectFirst {
              case (n, i) if n.equalsIgnoreCase(canonical) => i
            }.getOrElse(nextId))
          fieldIds = (fieldIds - canonical).filterNot(
            _._1.equalsIgnoreCase(canonical)) + (nw -> id)
          aliases = aliases :+ (id, canonical)
          StructType(s.fields.map(f =>
            if (f.name.equalsIgnoreCase(canonical)) f.copy(name = nw) else f))
        case add: TableChange.AddColumn =>
          require(add.fieldNames.length == 1,
            s"graft tables support top-level columns only, got ${add.fieldNames.mkString(".")}")
          val name = add.fieldNames.head
          require(!s.fieldNames.exists(_.equalsIgnoreCase(name)),
            s"column $name already exists")
          require(!aliases.exists(_._2.equalsIgnoreCase(name)),
            s"$name is a retired name of a renamed column — old files " +
              "still carry that physical column and would resurrect " +
              "the WRONG data; compact the table first")
          require(add.isNullable || add.defaultValue != null,
            s"ADD COLUMN $name must be nullable: rows written before the " +
              "change have no value for it")
          // ADD COLUMN ... DEFAULT (r14 item 8): the CURRENT default
          // fills future inserts; the EXISTS default — the expression
          // constant-folded NOW — serves the column for every file
          // written BEFORE the change (Spark's readers fill absent
          // columns from the exists-default metadata), so no backfill
          // rewrite is ever needed
          val newField = {
            val f0 = org.apache.spark.sql.types.StructField(
              name, add.dataType, nullable = true)
            Option(add.defaultValue) match {
              case None => f0
              case Some(dv) =>
                val rd = org.apache.spark.sql.catalyst.util
                  .ResolveDefaultColumns
                val folded = org.apache.spark.sql.catalyst.expressions
                  .Literal(dv.getValue.value, dv.getValue.dataType).sql
                val cur = Option(dv.getSql).getOrElse(folded)
                f0.copy(metadata =
                  new org.apache.spark.sql.types.MetadataBuilder()
                    .withMetadata(f0.metadata)
                    .putString(rd.CURRENT_DEFAULT_COLUMN_METADATA_KEY, cur)
                    .putString(rd.EXISTS_DEFAULT_COLUMN_METADATA_KEY, folded)
                    .build())
            }
          }
          StructType(s.fields :+ newField)
        case del: TableChange.DeleteColumn =>
          require(del.fieldNames.length == 1,
            s"graft tables support top-level columns only, got ${del.fieldNames.mkString(".")}")
          val name = del.fieldNames.head
          require(!partCols.exists(_.equalsIgnoreCase(name)),
            s"cannot drop partition column $name")
          require(!meta0.bucketSpec.exists(_._2.equalsIgnoreCase(name)),
            s"cannot drop bucket column $name")
          locally {
            val nnKey = GraftCheck.PropPrefix + s"__not_null_${name.toLowerCase}"
            require(!GraftCheck.constraintsOf(meta0.props - nnKey).exists(c =>
                GraftCheck.referencedCols(spark, s, c).contains(
                  name.toLowerCase)),
              s"cannot drop column $name: a CHECK constraint references " +
                "it (dropping would silently un-enforce the constraint) " +
                "— UNSET the constraint first")
            props1 -= nnKey // the internal not-null dies with its column
          }
          if (!s.fieldNames.exists(_.equalsIgnoreCase(name))) {
            require(del.ifExists, s"column $name does not exist"); s
          } else {
            val remaining = s.fields.filterNot(_.name.equalsIgnoreCase(name))
            require(remaining.nonEmpty, "cannot drop the last column")
            // a dropped column's field id retires with it (its aliases
            // become unreachable and can never mis-apply to a future
            // same-named column)
            fieldIds = fieldIds.filterNot(_._1.equalsIgnoreCase(name))
            StructType(remaining)
          }
        case un: TableChange.UpdateColumnNullability =>
          // NOT NULL as metadata + the CHECK machinery ([[GraftCheck]]):
          // SET NOT NULL validates existing rows (Delta's rule) and
          // registers an INTERNAL `<col> IS NOT NULL` constraint so
          // every writer path enforces it — including streaming
          // toTable and the object API, where Spark's analyzer-level
          // null checks never run. DROP NOT NULL removes both.
          require(un.fieldNames.length == 1,
            s"graft tables support top-level columns only, got " +
              un.fieldNames.mkString("."))
          val name = un.fieldNames.head
          val f = s.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
            throw new IllegalArgumentException(
              s"column $name does not exist"))
          val propKey =
            GraftCheck.PropPrefix + s"__not_null_${f.name.toLowerCase}"
          if (!un.nullable) {
            require(!meta0.renameAliases.contains(f.name.toLowerCase),
              s"SET NOT NULL: ${f.name} was renamed and pre-rename " +
                "files are not yet materialized — CALL system.compact " +
                "first (their rows resolve by alias and must be probed)")
            GraftCheck.validateExisting(
              spark.table(s"`$catalogName`.`${ident.namespace.head}`" +
                s".`${ident.name}`"),
              GraftCheck.Constraint(s"__not_null_${f.name.toLowerCase}",
                s"`${f.name}` IS NOT NULL"))
            props1 += (propKey -> s"`${f.name}` IS NOT NULL")
          } else props1 -= propKey
          StructType(s.fields.map(fd =>
            if (fd.name.equalsIgnoreCase(name))
              fd.copy(nullable = un.nullable)
            else fd))
        case up: TableChange.UpdateColumnType =>
          // type WIDENING (r13 verdict item 2 — Iceberg's metadata-only
          // schema evolution for safe promotions): the table schema
          // takes the wide type, not one data file is rewritten, and
          // reads promote old files' narrower PHYSICAL type inside the
          // parquet readers themselves (Spark's widening updaters:
          // IntegerToLong, FloatToDouble, *ToDecimal). Every engine
          // tier is already widening-proof because values canonicalize
          // before they are stored or compared: stats/bloom/eq-del
          // keys hold the integral family as LONG and floats never
          // prune, so a literal probed after the widening hashes and
          // compares identically to one stored before it.
          require(format == "parquet",
            s"ALTER COLUMN TYPE needs parquet (the readers' widening " +
              s"promotion is a parquet capability); format is $format")
          require(up.fieldNames.length == 1,
            s"graft tables support top-level columns only, got " +
              up.fieldNames.mkString("."))
          val name = up.fieldNames.head
          val f = s.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
            throw new IllegalArgumentException(s"column $name does not exist"))
          require(!partCols.exists(_.equalsIgnoreCase(name)),
            s"cannot change the type of partition column $name: its " +
              "values are directory names parsed under the declared type")
          require(!meta0.bucketSpec.exists(_._2.equalsIgnoreCase(name)),
            s"cannot change the type of bucket column $name: the bucket " +
              "hash is computed over the declared type")
          val safe = (f.dataType, up.newDataType) match {
            case (IntegerType, LongType) => true
            case (FloatType, DoubleType) => true
            case (d1: DecimalType, d2: DecimalType) =>
              d1.scale == d2.scale && d2.precision > d1.precision
            case _ => false
          }
          require(safe,
            s"unsupported type change ${f.dataType.simpleString} -> " +
              s"${up.newDataType.simpleString} for $name: only metadata-" +
              "safe widenings are supported (int -> bigint, float -> " +
              "double, decimal(p,s) -> decimal(p',s) with p' > p); " +
              "narrowing or cross-family changes would disconnect " +
              "existing files — rewrite via CTAS instead")
          StructType(s.fields.map(fd =>
            if (fd.name.equalsIgnoreCase(name))
              fd.copy(dataType = up.newDataType)
            else fd))
        case other => throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change $other: only metadata-safe " +
            "ADD COLUMN / DROP COLUMN / RENAME COLUMN / widening " +
            "ALTER COLUMN TYPE are supported (other type changes would " +
            "disconnect existing files, which resolve columns by name " +
            "or field-id alias)")
      }
    }
    // copy() from meta0, never a rebuilt literal: partCols above MERGES
    // the evolved columns for the refusal checks — writing it back as
    // partitionCols would silently FINALIZE an un-materialized spec
    // evolution (mixed-depth eras would then hit Spark's inference and
    // bypass the mixed-era refusals), and any future meta field would
    // be dropped the same way
    GraftTableMeta.write(fs, dir,
      meta0.copy(schema = Some(newSchema), props = props1,
        fieldIds = fieldIds, aliases = aliases))
    loadTable(ident)
  }

  private val durableKeys =
    Seq(GraftDv.ModeKey, "bloom_columns", "bloom_fpp", "ndv_columns",
      GraftManifestListing.Prop) ++
      GraftMaintenance.Keys

  /** Validate one durable table property (CREATE and ALTER share it). */
  private def validateDurableProp(key: String, value: String,
      format: String, schema: Option[StructType],
      partitionCols: Seq[String] = Nil): Unit = key match {
    case GraftManifestListing.Prop =>
      require(value == "true" || value == "false",
        s"${GraftManifestListing.Prop} must be true or false, got '$value'")
      require(value != "true" || format == "parquet",
        s"${GraftManifestListing.Prop} needs parquet; format is $format")
    case GraftDv.ModeKey =>
      require(value == GraftDv.CowValue || value == GraftDv.MorValue,
        s"${GraftDv.ModeKey} must be '${GraftDv.CowValue}' or " +
          s"'${GraftDv.MorValue}', got '$value'")
      require(value != GraftDv.MorValue || format == "parquet",
        s"${GraftDv.ModeKey}=${GraftDv.MorValue} requires parquet " +
          "(positional deletes ride the parquet row index); " +
          s"format is $format")
    case "bloom_columns" =>
      require(format == "parquet",
        s"bloom_columns requires parquet; format is $format")
      val cols = value.split(',').map(_.trim).filter(_.nonEmpty)
      require(cols.nonEmpty, "bloom_columns names no columns")
      schema.foreach { s =>
        cols.foreach { c =>
          val f = s.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
            throw new IllegalArgumentException(
              s"bloom_columns: column $c not in schema"))
          require(GraftBloom.kindOf(f.dataType).isDefined,
            s"bloom_columns: column $c type ${f.dataType.simpleString} " +
              "unsupported (integral and string columns only)")
        }
      }
    case "bloom_fpp" =>
      val f = try value.toDouble catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"bloom_fpp must be a number in (0,1), got '$value'")
      }
      require(f > 0 && f < 1, s"bloom_fpp must be in (0,1), got $value")
    case "ndv_columns" =>
      // writer/analyze-maintained HLL NDV registers (r13 item 4)
      require(format == "parquet",
        s"ndv_columns requires parquet; format is $format")
      val cols = value.split(',').map(_.trim).filter(_.nonEmpty)
      require(cols.nonEmpty, "ndv_columns names no columns")
      schema.foreach { s =>
        cols.foreach { c =>
          val f = s.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
            throw new IllegalArgumentException(
              s"ndv_columns: column $c not in schema"))
          require(!partitionCols.exists(_.equalsIgnoreCase(c)),
            s"ndv_columns: $c is a partition column — its distinct " +
              "values are the partition directories themselves")
          require(f.dataType match {
            case org.apache.spark.sql.types.ByteType |
                 org.apache.spark.sql.types.ShortType |
                 IntegerType | LongType |
                 org.apache.spark.sql.types.DateType |
                 org.apache.spark.sql.types.TimestampType |
                 org.apache.spark.sql.types.StringType |
                 org.apache.spark.sql.types.BooleanType => true
            case _ => false
          }, s"ndv_columns: column $c type ${f.dataType.simpleString} " +
            "unsupported (integer-family, string, boolean)")
        }
      }
    case k if GraftMaintenance.Keys.contains(k) =>
      GraftMaintenance.validate(k, value)
    case k if GraftCheck.isCheckKey(k) =>
      // write-time CHECK constraint ([[GraftCheck]]): the expression
      // must parse, resolve against the schema, be boolean and
      // deterministic, and carry no subquery — validated HERE so a
      // broken constraint can never park in the sidecar and fail (or
      // skip) every subsequent write
      schema.foreach { sch =>
        GraftCheck.resolve(SparkSession.active, sch,
          GraftCheck.Constraint(k.stripPrefix(GraftCheck.PropPrefix), value))
      }
    case other => throw new IllegalArgumentException(
      s"unsupported table property '$other' " +
        s"(durable properties: ${durableKeys.mkString(", ")})")
  }

  /** `ALTER TABLE ... SET/UNSET TBLPROPERTIES` for the durable keys the
    * engine understands: `delete_mode` lets an EXISTING table opt into
    * (or out of) merge-on-read row-level ops — switching back to
    * copy-on-write leaves already-written deletion vectors in force on
    * the read path until `CALL system.rewrite_deletes` materializes
    * them (a mode is a WRITE strategy, never a license to resurrect) —
    * and `bloom_columns`/`bloom_fpp` turn on write-time Bloom-filter
    * maintenance under auto_analyze catalogs.
    */
  private def alterProperties(ident: Identifier,
      changes: Seq[TableChange]): Table = {
    val dir = tableDir(ident)
    val meta0 = GraftTableMeta.read(fs, dir)
    val table0Schema = meta0.schema
    val props = changes.foldLeft(meta0.props) { (ps, ch) =>
      ch match {
        case s: TableChange.SetProperty =>
          validateDurableProp(s.property, s.value, format, table0Schema,
            meta0.partitionCols ++ meta0.evolvedCols)
          // a bloom build over an alias-carrying (renamed) column
          // would read pre-rename files as all-null and publish
          // silently-pruning empty filters — refuse until compact
          if (s.property == "bloom_columns")
            s.value.split(',').map(_.trim).foreach { c =>
              require(!meta0.renameAliases.contains(c.toLowerCase),
                s"bloom_columns: $c was renamed and its pre-rename files " +
                  "are not yet materialized — CALL system.compact first")
            }
          // Delta's ADD CONSTRAINT rule: adding a CHECK to a table
          // with data scans the existing rows and refuses on any
          // violation — one bounded probe at DDL time
          if (GraftCheck.isCheckKey(s.property))
            GraftCheck.validateExisting(
              spark.table(s"`$catalogName`.`${ident.namespace.head}`" +
                s".`${ident.name}`"),
              GraftCheck.Constraint(
                s.property.stripPrefix(GraftCheck.PropPrefix), s.value))
          ps + (s.property -> s.value)
        case r: TableChange.RemoveProperty =>
          require(durableKeys.contains(r.property) ||
            GraftCheck.isCheckKey(r.property),
            s"unsupported table property '${r.property}' " +
              s"(durable properties: ${durableKeys.mkString(", ")})")
          // the __not_null_* props back a schema-level NOT NULL flag:
          // unsetting the prop alone would leave the schema declaring
          // non-nullable with enforcement gone (IsNull folding would
          // then return wrong results once a null lands)
          require(!GraftCheck.isNotNullKey(r.property),
            s"'${r.property}' enforces a NOT NULL column constraint and " +
              "cannot be unset directly — use ALTER TABLE ... ALTER " +
              "COLUMN <col> DROP NOT NULL, which relaxes the schema and " +
              "removes the constraint together")
          ps - r.property
        case other => throw new IllegalStateException(s"unreachable $other")
      }
    }
    GraftTableMeta.write(fs, dir, meta0.copy(props = props))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && {
      val dir = tableDir(ident)
      // internal siblings (versions, staging) die with the table
      val siblings = fs.listStatus(dir.getParent)
        .map(_.getPath)
        .filter(_.getName.startsWith(ident.name + ".__"))
      siblings.foreach(fs.delete(_, true))
      fs.delete(dir, true)
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    require(!isFnNamespace(newIdent.namespace),
      s"'${GraftFunctions.Namespace}' is the reserved function namespace: " +
        "tables cannot be moved into it")
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!namespaceExists(newIdent.namespace))
      throw new NoSuchNamespaceException(catalogName +: newIdent.namespace.toSeq)
    require(fs.rename(tableDir(oldIdent), tableDir(newIdent)),
      s"rename failed: $oldIdent -> $newIdent")
  }

  // ---- views (r14 verdict item 7: CREATE VIEW through ViewCatalog) ------
  // A view is a NAMED QUERY persisted as a tiny sidecar file
  // (`<ns>/<name>.__viewdef`, TSV+base64 like every other sidecar) —
  // the dashboard-shaped consumption layer the reference's Superset
  // path implies (compose.yaml: Superset reads Trino views). Spark's
  // analyzer resolves view identifiers against ViewCatalog BEFORE
  // tables, re-parsing the stored SQL under the view's captured
  // catalog/namespace context, so a view over an evolved or
  // time-traveling table reads through the full scan machinery.

  private def viewPath(ident: Identifier): Path =
    new Path(s"$root/${layerOf(ident.namespace)}/${ident.name}.__viewdef")

  override def viewExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 && !isFnNamespace(ident.namespace) &&
      fs.exists(viewPath(ident))

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    if (!namespaceExists(ns))
      throw new NoSuchNamespaceException(catalogName +: ns.toSeq)
    val d = new Path(s"$root/${layerOf(ns)}")
    if (!fs.exists(d)) Array.empty
    else fs.listStatus(d).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".__viewdef"))
      .map(st => Identifier.of(ns,
        st.getPath.getName.stripSuffix(".__viewdef")))
      .sortBy(_.name).toArray
  }

  private def writeView(ident: Identifier, sql: String,
      currentCatalog: String, currentNamespace: Array[String],
      schema: StructType, queryColumnNames: Array[String],
      columnAliases: Array[String], columnComments: Array[String],
      properties: java.util.Map[String, String], overwrite: Boolean): Unit = {
    def enc(x: String) = java.util.Base64.getEncoder
      .encodeToString(x.getBytes("UTF-8"))
    import scala.jdk.CollectionConverters._
    val body = Seq(
      enc(sql), enc(currentCatalog),
      currentNamespace.map(enc).mkString(","),
      enc(schema.json),
      queryColumnNames.map(enc).mkString(","),
      columnAliases.map(enc).mkString(","),
      columnComments.map(c => enc(Option(c).getOrElse(""))).mkString(","),
      properties.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${enc(k)}:${enc(v)}" }.mkString(",")
    ).mkString("\n")
    val out = fs.create(viewPath(ident), overwrite)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  override def loadView(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.View = {
    if (!viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        ident)
    val in = fs.open(viewPath(ident))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toArray finally in.close()
    def dec(x: String) =
      new String(java.util.Base64.getDecoder.decode(x), "UTF-8")
    def arr(i: Int): Array[String] =
      if (i >= lines.length || lines(i).isEmpty) Array.empty
      else lines(i).split(",").map(dec)
    new org.apache.spark.sql.connector.catalog.View {
      override def name(): String =
        s"$catalogName.${ident.namespace.mkString(".")}.${ident.name}"
      override def query(): String = dec(lines(0))
      override def currentCatalog(): String = dec(lines(1))
      override def currentNamespace(): Array[String] = arr(2)
      override def schema(): StructType =
        org.apache.spark.sql.types.DataType.fromJson(dec(lines(3)))
          .asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] = arr(4)
      override def columnAliases(): Array[String] = arr(5)
      override def columnComments(): Array[String] = arr(6)
      override def properties(): java.util.Map[String, String] = {
        val m = new java.util.HashMap[String, String]()
        if (lines.length > 7 && lines(7).nonEmpty)
          lines(7).split(",").foreach { kv =>
            val Array(k, v) = kv.split(":")
            m.put(dec(k), dec(v))
          }
        m
      }
    }
  }

  override def createView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    val ident = info.ident
    require(!isFnNamespace(ident.namespace),
      s"'${GraftFunctions.Namespace}' is the reserved function namespace")
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(
        catalogName +: ident.namespace.toSeq)
    require(!tableExists(ident),
      s"$ident already exists as a TABLE")
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    writeView(ident, info.sql, info.currentCatalog, info.currentNamespace,
      info.schema, info.queryColumnNames, info.columnAliases,
      info.columnComments, info.properties, overwrite = false)
    loadView(ident)
  }

  override def replaceView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo,
      orCreate: Boolean): org.apache.spark.sql.connector.catalog.View = {
    val ident = info.ident
    require(!tableExists(ident), s"$ident already exists as a TABLE")
    if (!viewExists(ident) && !orCreate)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        ident)
    writeView(ident, info.sql, info.currentCatalog, info.currentNamespace,
      info.schema, info.queryColumnNames, info.columnAliases,
      info.columnComments, info.properties, overwrite = true)
    loadView(ident)
  }

  override def alterView(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.ViewChange*)
      : org.apache.spark.sql.connector.catalog.View = {
    val v = loadView(ident)
    val props = new java.util.HashMap[String, String](v.properties())
    changes.foreach {
      case sp: org.apache.spark.sql.connector.catalog
          .ViewChange.SetProperty => props.put(sp.property, sp.value)
      case rp: org.apache.spark.sql.connector.catalog
          .ViewChange.RemoveProperty => props.remove(rp.property)
      case other => throw new IllegalArgumentException(
        s"unsupported view change $other")
    }
    writeView(ident, v.query, v.currentCatalog, v.currentNamespace,
      v.schema, v.queryColumnNames, v.columnAliases, v.columnComments,
      props, overwrite = true)
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    viewExists(ident) && fs.delete(viewPath(ident), false)

  override def renameView(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!viewExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        oldIdent)
    if (viewExists(newIdent) || tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    if (!namespaceExists(newIdent.namespace))
      throw new NoSuchNamespaceException(
        catalogName +: newIdent.namespace.toSeq)
    require(fs.rename(viewPath(oldIdent), viewPath(newIdent)),
      s"rename failed: $oldIdent -> $newIdent")
  }

  // ---- functions --------------------------------------------------------
  // Catalog-scoped SQL functions (`SELECT <cat>.fn.token_count(x)`) —
  // see [[GraftFunctions]]. They live in the reserved virtual namespace
  // `fn`, so they never collide with table namespaces and need no
  // storage. Spark also probes the bare-catalog spelling
  // (`<cat>.token_count(x)` ⇒ empty namespace); both resolve.

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || isFnNamespace(namespace))
      GraftFunctions.all.keys.toArray.sorted
        .map(Identifier.of(Array(GraftFunctions.Namespace), _))
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def loadFunction(
      ident: Identifier): org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    if (!(ident.namespace.isEmpty || isFnNamespace(ident.namespace)))
      throw new NoSuchFunctionException(ident)
    GraftFunctions.all.getOrElse(ident.name.toLowerCase(java.util.Locale.ROOT),
      throw new NoSuchFunctionException(ident))
  }

  // ---- ProcedureCatalog: CALL <cat>.system.<proc>(...) --------------
  // SQL-addressable maintenance (analyze / compact / compact_partitions)
  // — the Iceberg/Trino `CALL system.*` shape; see [[GraftProcedures]].

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty ||
        (namespace.length == 1 &&
          namespace(0).equalsIgnoreCase(GraftProcedures.Namespace)))
      GraftProcedures.names.map(
        Identifier.of(Array(GraftProcedures.Namespace), _))
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.length == 1 &&
      ident.namespace.head.equalsIgnoreCase(GraftProcedures.Namespace),
      s"procedures live in the '${GraftProcedures.Namespace}' namespace " +
        s"(got ${ident.namespace.mkString(".")}.${ident.name})")
    GraftProcedures.load(
      ident.name.toLowerCase(java.util.Locale.ROOT), () => engine,
      () => catalogName)
  }
}

/** Sidecar metadata for SQL-created tables: schema JSON + partition
  * columns, one `_graft_meta` file inside the table directory. Tables
  * created by the object API have none — their schema is inferred from
  * data files and partition directories, like any external table.
  */
private[sources] final case class GraftTableMeta(
    schema: Option[StructType], partitionCols: Seq[String],
    bucketSpec: Option[(Int, String)] = None,
    props: Map[String, String] = Map.empty,
    // Iceberg-style FIELD IDS (r12 item 8): stable per-column identity
    // that survives renames. Assigned lazily at the first RENAME
    // (by position); `aliases` records each id's RETIRED names, so a
    // read can resolve a renamed column in files written before the
    // rename. Metadata-only — no file is rewritten.
    fieldIds: Map[String, Int] = Map.empty,
    aliases: Seq[(Int, String)] = Nil,
    // Partition SPEC EVOLUTION (r13 item 3 — Iceberg's spec-id
    // history for a directory layout): columns APPENDED to the
    // partition spec after data existed. `partitionCols` stays the
    // ANCHOR every file era shares (prefix of every chain; what reads
    // expose as the partition schema); `evolvedCols` extend the
    // layout for NEW writes only — and are kept IN the data files
    // too, so pre-evolution files (which carry them as data) and
    // post-evolution files read identically. Metadata-only: no file
    // moves at evolution time.
    evolvedCols: Seq[String] = Nil) {

  /** current-name (lower) -> old names still resolvable in live files. */
  def renameAliases: Map[String, Seq[String]] =
    if (aliases.isEmpty) Map.empty
    else {
      val byId = aliases.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      fieldIds.flatMap { case (cur, id) =>
        byId.get(id).map(olds => cur.toLowerCase -> olds)
      }
    }
}

private[sources] object GraftTableMeta {
  private val FileName = "_graft_meta"

  def read(fs: FileSystem, dir: Path): GraftTableMeta = {
    val f = new Path(dir, FileName)
    if (!fs.exists(f)) GraftTableMeta(None, Nil)
    else {
      val in = fs.open(f)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      val schema = lines.headOption.filter(_.nonEmpty)
        .map(DataType.fromJson(_).asInstanceOf[StructType])
      val parts = lines.drop(1).headOption.filter(_.nonEmpty)
        .map(_.split(",").toSeq).getOrElse(Nil)
      // line 3 (absent in pre-bucketing sidecars): "<n>:<col>"
      val buckets = lines.drop(2).headOption.filter(_.nonEmpty).map { s =>
        val i = s.indexOf(':')
        (s.take(i).toInt, s.drop(i + 1))
      }
      // line 4 (absent in older sidecars): url-encoded k=v pairs, ';'
      // joined — durable table properties (delete_mode)
      val props = lines.drop(3).headOption.filter(_.nonEmpty)
        .map(_.split(";").toSeq.flatMap { kv =>
          val i = kv.indexOf('=')
          if (i <= 0) None
          else Some(java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
            java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8"))
        }.toMap).getOrElse(Map.empty[String, String])
      def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
      // line 5 (absent pre-rename): field ids, "<id>:<nameEnc>" ';'-joined
      val ids = lines.drop(4).headOption.filter(_.nonEmpty)
        .map(_.split(";").toSeq.flatMap { e =>
          val i = e.indexOf(':')
          if (i <= 0) None else Some(dec(e.drop(i + 1)) -> e.take(i).toInt)
        }.toMap).getOrElse(Map.empty[String, Int])
      // line 6: alias log, "<id>:<oldNameEnc>" ';'-joined, append order
      val als = lines.drop(5).headOption.filter(_.nonEmpty)
        .map(_.split(";").toSeq.flatMap { e =>
          val i = e.indexOf(':')
          if (i <= 0) None else Some((e.take(i).toInt, dec(e.drop(i + 1))))
        }).getOrElse(Nil)
      // line 7 (absent pre-evolution): evolved partition columns /
      // transform specs, url-encoded (a transform like truncate(s,2)
      // carries a comma)
      val evolved = lines.drop(6).headOption.filter(_.nonEmpty)
        .map(_.split(",").toSeq.map(dec)).getOrElse(Nil)
      GraftTableMeta(schema, parts, buckets, props, ids, als, evolved)
    }
  }

  def write(fs: FileSystem, dir: Path, meta: GraftTableMeta): Unit = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val out = fs.create(new Path(dir, FileName), true)
    try out.write(
      (meta.schema.map(_.json).getOrElse("") + "\n" +
        meta.partitionCols.mkString(",") + "\n" +
        meta.bucketSpec.map { case (n, c) => s"$n:$c" }.getOrElse("") + "\n" +
        meta.props.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString(";") +
        "\n" +
        meta.fieldIds.toSeq.sortBy(_._2)
          .map { case (nm, id) => s"$id:${enc(nm)}" }.mkString(";") +
        "\n" +
        meta.aliases.map { case (id, nm) => s"$id:${enc(nm)}" }
          .mkString(";") +
        "\n" +
        meta.evolvedCols.map(enc).mkString(",") +
        "\n").getBytes("UTF-8"))
    finally out.close()
  }
}

/** One table of the [[GraftCatalog]]: reads delegate to Spark's file
  * table for the format (full DSv2 pushdown/pruning tiers), DML writes
  * route through [[graft.runtime.Catalog]]'s crash-safe protocols, and
  * MERGE/UPDATE/DELETE implement group-based copy-on-write row-level
  * operations:
  *
  *  - unpartitioned tables: the operation's scan is the table's
  *    ordinary scan (the "group" is the whole table) and the write
  *    delegates to the file format's v2 batch write (tasks stage under
  *    `_temporary`, nothing visible until job commit), then retires the
  *    PRE-EXISTING data files, snapshotted at write-build time, in the
  *    same driver-side commit step;
  *  - PARTITIONED tables: the "groups" are partitions. The operation's
  *    scan participates in Spark's runtime group filtering
  *    (RowLevelOperationRuntimeGroupFiltering + the scan's
  *    [[SupportsRuntimeV2Filtering]]), so only the TOUCHED partitions
  *    are read; the replacement write re-partitions rows into the hive
  *    layout itself ([[GraftPartitionedCow]], clustered by partition
  *    columns via RequiresDistributionAndOrdering), staging dot-prefixed
  *    invisible files inside the target partition directories; commit
  *    publishes them by atomic rename and retires superseded files ONLY
  *    within the scanned partitions — `MERGE INTO` cost bounded by
  *    touched partitions, the reference's incremental unit
  *    (`overwritePartitions()`, process_covid_ods.py:87), now as SQL.
  *    A crash between publish and retirement leaves duplicate rows —
  *    visible, repairable (delete the old-generation files), never
  *    silent data loss — the same contract as the unpartitioned path.
  *
  * Scale: every path is a distributed job; the only driver-side work is
  * directory bookkeeping (file listing, renames) — never row data.
  */
private[sources] class GraftTable(
    spark: SparkSession, catalogName: String, root: String, format: String,
    layer: String, table: String, meta: GraftTableMeta,
    versions: Int = 0,
    // catalog option auto_analyze: committed writes refresh the
    // _graft_stats skipping manifest incrementally
    autoAnalyze: Boolean = false,
    // time-travel reads serve an archived version directory instead of
    // the live table dir, and are strictly read-only
    dataDirOverride: Option[String] = None)
  extends Table with SupportsRead with SupportsWrite
  with SupportsRowLevelOperations with SupportsDeleteV2
  with SupportsPartitionManagement
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** Row coordinates for the merge-on-read delta tier
    * ([[GraftDeltaMor]]): `_graft_file` (table-relative path) and
    * `_graft_pos` (file-absolute ordinal) — Iceberg's `_file`/`_pos` —
    * plus the `_graft_pre_<col>` preimage mirrors the delta write
    * requests for commit-time preimage capture. Hidden unless
    * selected; scans that project them read row-based through per-file
    * chains so positions are exact.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    GraftDeltaMor.metadataColumns(schema())

  private val dir = dataDirOverride.getOrElse(s"$root/$layer/$table")
  private def readOnly: Boolean = dataDirOverride.isDefined

  private def engine: Catalog = Catalog(spark, root, format, versions)

  /** Per-format reader options mirroring [[Catalog.readOptions]]; the
    * sidecar schema (when present) replaces csv inference.
    */
  private def readOptions: Map[String, String] = (format match {
    case "csv" =>
      Map("header" -> "true") ++
        (if (meta.schema.isEmpty) Map("inferSchema" -> "true") else Map.empty)
    case _ => Map.empty[String, String]
  }) ++ (
    // evolved partition spec (r13 item 3): file eras live at DIFFERENT
    // directory depths, which Spark's partition inference refuses
    // ("conflicting directory structures"). Skip inference entirely —
    // the scan builder swaps in [[GraftEvolved.EvolvedFileIndex]],
    // which derives each file's ANCHOR values from its own chain and
    // prunes evolved columns by their chain tokens where present.
    if (meta.evolvedCols.nonEmpty) Map("recursiveFileLookup" -> "true")
    else Map.empty[String, String])

  /** Fresh delegate per call: file listings must see the current
    * directory state, not the state at table-load time.
    */
  private def delegate: FileTable = {
    val opts = new CaseInsensitiveStringMap(readOptions.asJava)
    val paths = Seq(dir)
    format match {
      case "parquet" =>
        org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
          name(), spark, opts, paths, meta.schema,
          classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      case "orc" =>
        org.apache.spark.sql.execution.datasources.v2.orc.OrcTable(
          name(), spark, opts, paths, meta.schema,
          classOf[org.apache.spark.sql.execution.datasources.orc.OrcFileFormat])
      case "csv" =>
        org.apache.spark.sql.execution.datasources.v2.csv.CSVTable(
          name(), spark, opts, paths, meta.schema,
          classOf[org.apache.spark.sql.execution.datasources.csv.CSVFileFormat])
      case "json" =>
        org.apache.spark.sql.execution.datasources.v2.json.JsonTable(
          name(), spark, opts, paths, meta.schema,
          classOf[org.apache.spark.sql.execution.datasources.json.JsonFileFormat])
      case other => throw new IllegalStateException(s"unreachable format $other")
    }
  }

  override def name(): String = s"$catalogName.$layer.$table"

  override def schema(): StructType =
    meta.schema.getOrElse(delegate.schema)

  /** ANCHOR partition columns: the spec prefix EVERY file era shares —
    * what reads expose as the partition schema and prune directories
    * by. Equal to the full spec unless the spec evolved (r13 item 3).
    */
  private def anchorPartitionCols: Seq[String] =
    if (meta.partitionCols.nonEmpty) meta.partitionCols
    else delegate.partitioning().toSeq.collect {
      case t if t.name == "identity" =>
        t.references().head.fieldNames.mkString(".")
    }

  /** Columns appended to the spec by `CALL system.evolve_partitioning`
    * — directory-laid-out for NEW files, kept in the data for all eras.
    */
  private def evolvedCols: Seq[String] = meta.evolvedCols

  override def partitioning(): Array[Transform] = {
    val cols = anchorPartitionCols ++ evolvedCols
    cols.map { c =>
      (GraftTransforms.parseOpt(c) match {
        case Some(GraftTransforms.Days(src)) => Expressions.days(src)
        case Some(GraftTransforms.Bucket(src, n)) =>
          Expressions.bucket(n, src)
        case Some(GraftTransforms.Trunc(src, n)) => Expressions.apply(
          "truncate", Expressions.literal(n), Expressions.column(src))
        case None => Expressions.identity(c)
      }): Transform
    }.toArray ++
      meta.bucketSpec.map { case (n, c) =>
        Expressions.bucket(n, c): Transform
      }.toArray[Transform]
  }

  /** The CURRENT partition spec — where new writes lay out their
    * directories. == anchor unless the spec evolved.
    */
  private def effectivePartitionCols: Seq[String] =
    anchorPartitionCols ++ evolvedCols

  // ---- partition management (SHOW PARTITIONS / ADD / DROP PARTITION) ----
  // The hive directory layout IS the partition metadata, so management
  // is directory bookkeeping: list = walk the `col=value` tree (tokens
  // parsed back to typed values, the default partition as NULL),
  // create = mkdir, drop = recursive directory delete — the same
  // operation the metadata-only DELETE performs, addressable as
  // `ALTER TABLE ... DROP PARTITION` SQL. No per-partition properties
  // (a directory store has nowhere durable to put them).

  override def partitionSchema(): StructType = {
    val s = schema()
    // ANCHOR columns only: partition identity must hold across every
    // file era; evolved columns are data columns in pre-evolution
    // files, so their directory tokens are a per-era pruning hint
    // ([[GraftEvolved]]), not a partition schema
    StructType(anchorPartitionCols.map { c =>
      s.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalStateException(s"partition column $c not in schema"))
    })
  }

  private def partitionDirOf(
      ident: org.apache.spark.sql.catalyst.InternalRow): Path = {
    val ps = partitionSchema()
    require(ident.numFields == ps.length,
      s"partition spec has ${ident.numFields} values for ${ps.length} columns")
    val rel = ps.fields.zipWithIndex.map { case (f, i) =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(f.name, GraftPartitionedCow.renderRaw(
          if (ident.isNullAt(i)) null else ident.get(i, f.dataType),
          f.dataType))
    }.mkString("/")
    new Path(dir, rel)
  }

  private def pmFs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def createPartition(ident: org.apache.spark.sql.catalyst.InternalRow,
      properties: util.Map[String, String]): Unit = {
    require(!readOnly, s"${name()} is a time-travel snapshot: read-only")
    require(properties.isEmpty,
      "graft partitions carry no properties (directory store)")
    val p = partitionDirOf(ident)
    if (pmFs.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis
        .PartitionsAlreadyExistException(name(), ident, partitionSchema())
    pmFs.mkdirs(p)
  }

  override def dropPartition(
      ident: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    !readOnly && {
      val p = partitionDirOf(ident)
      pmFs.exists(p) && {
        // tombstoned + journaled like every retiring commit: reader
        // snapshot isolation holds, and the changes feed / per-commit
        // time travel see the drop instead of a silent file vanish
        GraftCommitLock.withLock(pmFs, new Path(dir), "drop-partition") {
          val rels = listDataFiles(pmFs, p)
            .map(GraftCommits.relOf(pmFs, new Path(dir), _))
          val tomb = GraftRetired.retireFiles(pmFs, new Path(dir), Seq(p))
          if (rels.nonEmpty)
            GraftCommits.tryRecord(pmFs, new Path(dir), "delete",
              adds = Nil,
              removes = rels.map(
                GraftCommits.Remove(_, tomb.getOrElse(""))))
        }
        true
      }
    }

  override def replacePartitionMetadata(
      ident: org.apache.spark.sql.catalyst.InternalRow,
      properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft partitions carry no mutable metadata")

  override def loadPartitionMetadata(
      ident: org.apache.spark.sql.catalyst.InternalRow)
      : util.Map[String, String] = util.Collections.emptyMap()

  override def listPartitionIdentifiers(names: Array[String],
      ident: org.apache.spark.sql.catalyst.InternalRow)
      : Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val ps = partitionSchema()
    require(names.length == ident.numFields,
      s"${names.length} names for ${ident.numFields} constraint values")
    val constraintIdx = names.map { n =>
      val i = ps.fields.indexWhere(_.name.equalsIgnoreCase(n))
      require(i >= 0, s"$n is not a partition column of ${name()}")
      i
    }
    val fs = pmFs
    def walk(d: Path, level: Int, acc: List[Any]): Seq[Seq[Any]] =
      if (level == ps.length) Seq(acc.reverse)
      else if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(ps.fields(level).name + "="))
        .flatMap { st =>
          val tok = st.getPath.getName.drop(ps.fields(level).name.length + 1)
          walk(st.getPath, level + 1,
            GraftPartitionedCow.parseToken(tok, ps.fields(level).dataType) :: acc)
        }
    walk(new Path(dir), 0, Nil)
      .filter { values =>
        constraintIdx.zipWithIndex.forall { case (pi, ci) =>
          val want = if (ident.isNullAt(ci)) null
            else ident.get(ci, ps.fields(pi).dataType)
          java.util.Objects.equals(values(pi), want)
        }
      }
      .map(v => org.apache.spark.sql.catalyst.InternalRow.fromSeq(v))
      .toArray
  }

  /** Merge-on-read DELETE mode ([[GraftDv]]): opted in per table via
    * `TBLPROPERTIES ('delete_mode' = 'merge-on-read')`.
    */
  private def morEnabled: Boolean =
    meta.props.get(GraftDv.ModeKey).contains(GraftDv.MorValue)

  override def properties(): util.Map[String, String] =
    (Map("format" -> format, "location" -> dir) ++
      meta.props ++
      meta.bucketSpec.map { case (nb, c) => "buckets" -> s"$nb ($c)" }).asJava

  override def capabilities(): util.Set[TableCapability] =
    if (readOnly) util.EnumSet.of(TableCapability.BATCH_READ)
    else if (meta.bucketSpec.isDefined || meta.evolvedCols.nonEmpty)
      // bucketed tables write through the v2 hive-layout path only —
      // declaring V1_BATCH_WRITE would make Spark REQUIRE a V1Write.
      // Evolved-spec tables too: the V1 append cannot keep evolved
      // columns in the data files while laying out their directories
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.OVERWRITE_DYNAMIC,
        TableCapability.STREAMING_WRITE)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_DYNAMIC, TableCapability.STREAMING_WRITE)

  /** Scans wrap the delegate builder to add what Spark's own V2 file
    * scans are missing: `SupportsRuntimeV2Filtering`. Without it, a
    * join against a filtered dimension on the partition key
    * full-scans history — V1 file reads get dynamic partition pruning
    * from `FileSourceScanExec`, but `FileScan` never implemented the
    * V2 runtime-filtering contract, so a DSv2 catalog table silently
    * loses the whole DPP tier (the reason Spark keeps built-in file
    * sources on the V1 path by default). The wrapper forwards every
    * pushdown surface and translates runtime IN-predicates on
    * partition columns back into catalyst partition filters on a
    * rebuilt delegate scan. PartitionPruningSpec pins the behavior.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // manifest-served scan planning (r14 item 4, opt-in): when the
    // listing census proves current, the delegate scan builder plans
    // over synthesized statuses — zero data-directory listings
    val manifestFsb: Option[FileScanBuilder] =
      if (format == "parquet" && !readOnly && meta.evolvedCols.isEmpty &&
          meta.schema.isDefined &&
          meta.props.get(GraftManifestListing.Prop).contains("true"))
        GraftManifestListing.scanBuilder(spark, new Path(dir),
          meta.schema.get, anchorPartitionCols, options)
      else None
    manifestFsb.getOrElse(delegate.newScanBuilder(options)) match {
      case fsb: FileScanBuilder =>
        // data-skipping tier: planned splits are pruned against the
        // _graft_stats manifest (when one exists) — see [[GraftStats]]
        val stats = Some(new Path(dir))
        val pSchema =
          if (effectivePartitionCols.isEmpty) new StructType()
          else partitionSchema()
        // streaming admission limits (readStream.option) — batch scans
        // ignore them
        val mft = Option(options.get("maxFilesPerTrigger")).map(_.toInt)
        val mbt = Option(options.get("maxBytesPerTrigger")).map(_.toLong)
        val ignoreDel = options.getBoolean("ignoreDeletes", false)
        meta.bucketSpec match {
          case Some((n, c)) =>
            new GraftScanBuilder(fsb, bucket = Some((n, c)),
              statsDir = stats, tableSchema = schema(),
              partitionSchema = pSchema, maxFilesPerTrigger = mft,
              maxBytesPerTrigger = mbt, ignoreDeletes = ignoreDel,
              renameAliases = meta.renameAliases,
              evolvedCols = meta.evolvedCols,
              pinToJournal = !readOnly)
          case None =>
            new GraftScanBuilder(fsb, statsDir = stats,
              tableSchema = schema(), partitionSchema = pSchema,
              ignoreDeletes = ignoreDel,
              maxFilesPerTrigger = mft, maxBytesPerTrigger = mbt,
              renameAliases = meta.renameAliases,
              evolvedCols = meta.evolvedCols,
              pinToJournal = !readOnly)
        }
      case other => other
    }
  }

  /** INSERT INTO (append) / INSERT OVERWRITE (truncate): a V1 write
    * whose insert() routes through the engine's partitioned append and
    * swap-replace — SQL writes get the identical crash-safety contract
    * as the object API, because they ARE the object API. Dynamic
    * partition overwrite (`INSERT OVERWRITE` under
    * partitionOverwriteMode=dynamic, `df.writeTo(t)
    * .overwritePartitions()`) has no V1 fallback in Spark, so it is a
    * real v2 batch write: [[GraftPartitionedCow.DynamicOverwriteWrite]]
    * stages hive-layout files invisibly and replaces exactly the
    * partitions that received data — the engine's
    * `overwritePartitions` semantics on the DSv2 surface, and the
    * reference's incremental unit (`overwritePartitions()`,
    * process_covid_ods.py:87) addressable purely by table NAME.
    */
  /** `auto_analyze = true`: after a committed write (batch insert,
    * overwrite, row-level rewrite, or streaming epoch), refresh the
    * [[GraftStats]] skipping manifest incrementally — only the files
    * this write just published pay a footer read, so the cost scales
    * with the delta, not the table, and scans prune fresh data without
    * an operator `CALL system.analyze`. The refresh is ADVISORY: the
    * data is already committed when it runs, so a failed refresh must
    * not fail the write — affected files simply scan unpruned, the
    * same fail-safe as having no manifest entry. The wrapper preserves
    * the inner write's planning contracts ([[V1Write]]-ness for the
    * V1_BATCH_WRITE capability check; `RequiresDistributionAndOrdering`
    * for the hive-layout/bucketed clustering).
    */
  private def withAutoAnalyze(w: Write): Write = {
    import org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering
    import org.apache.spark.sql.connector.write.streaming.StreamingWrite
    if (!autoAnalyze || readOnly) return w
    // writer-side bloom maintenance (r12 item 5): hand the hive-layout
    // write its bloom spec so task writers accumulate filters as rows
    // stream through — the commit then PUBLISHES them with zero data
    // re-read; the analyze below degrades to a covered no-op
    lazy val writerBloomSpec: Option[GraftPartitionedCow.WriterBloomSpec] =
      meta.props.get("bloom_columns").flatMap { cols =>
        val s = schema()
        val resolved = cols.split(',').map(_.trim).filter(_.nonEmpty)
          .toSeq.flatMap { c =>
            s.fields.find(_.name.equalsIgnoreCase(c)).flatMap(f =>
              GraftBloom.kindOf(f.dataType).map(k =>
                (f.name.toLowerCase, k)))
          }
        if (resolved.isEmpty) None
        else Some(GraftPartitionedCow.WriterBloomSpec(resolved,
          meta.props.get("bloom_fpp").map(_.toDouble)
            .getOrElse(GraftBloom.DefaultFpp),
          spark.conf.getOption("spark.graft.bloom.writer.expectedRows")
            .map(_.toLong).getOrElse(250000L)))
      }
    // writer-side NDV maintenance (r13 item 4): same chokepoint — the
    // task writers reduce per-file HLL registers as rows stream
    lazy val writerNdvSpec: Option[GraftPartitionedCow.WriterNdvSpec] =
      meta.props.get("ndv_columns").flatMap { cols =>
        val s = schema()
        val resolved = cols.split(',').map(_.trim).filter(_.nonEmpty)
          .toSeq.flatMap(c =>
            s.fields.find(_.name.equalsIgnoreCase(c)).map(_.name))
        if (resolved.isEmpty) None
        else Some(GraftPartitionedCow.WriterNdvSpec(resolved))
      }
    w match {
      case h: GraftPartitionedCow.HiveLayoutWrite =>
        h.writerBloom = writerBloomSpec
        h.writerNdv = writerNdvSpec
      case _ => ()
    }
    def refresh(scope: Option[Set[String]],
        ms: Array[WriterCommitMessage] = Array.empty): Unit = {
      try GraftStats.analyze(spark, dir, format, scope)
      catch { case scala.util.control.NonFatal(_) => () }
      // auto-bloom: a table that declares `bloom_columns` keeps its
      // point-lookup filters fresh at every commit too. Writer-shipped
      // filters publish FIRST (zero data re-read); the analyze after
      // is the fail-safe backstop for files without shipped filters
      // (V1 appends, delta delete-only rows) — it finds shipped files
      // covered and reads nothing for them. Advisory like the stats
      // refresh.
      meta.props.get("bloom_columns").foreach { cols =>
        try {
          val shipped = ms.toSeq.flatMap {
            case GraftPartitionedCow.CowTaskFiles(_, bl, _) => bl.toSeq
            case _ => Nil
          }.toMap
          if (shipped.nonEmpty)
            GraftBloom.publishShipped(spark, new Path(dir), shipped)
          GraftBloom.analyze(spark, new Path(dir), schema(),
            effectivePartitionCols,
            cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
            meta.props.get("bloom_fpp").map(_.toDouble)
              .getOrElse(GraftBloom.DefaultFpp),
            scope)
        }
        catch { case scala.util.control.NonFatal(_) => () }
      }
      // auto-NDV (r13 item 4): writer-shipped registers publish FIRST
      // (zero data re-read — after the footer analyze above created
      // the entries they attach to), then the incremental analyzeNdv
      // backstop covers files without shipped registers (V1 appends,
      // timestamp columns, over-cap task fan-outs). Advisory like the
      // other refreshes.
      meta.props.get("ndv_columns").foreach { cols =>
        try {
          val shippedNdv = ms.toSeq.flatMap {
            case c: GraftPartitionedCow.CowTaskFiles => c.ndvs.toSeq
            case _ => Nil
          }.toMap
          if (shippedNdv.nonEmpty)
            GraftStats.publishShippedNdv(spark, new Path(dir), shippedNdv)
          GraftStats.analyzeNdv(spark, new Path(dir), schema(),
            effectivePartitionCols,
            cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq, scope)
        }
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    // SCOPED refresh (r11 item 1): the commit messages carry the final
    // paths this write just published, so the refresh can reconcile
    // ONLY those partitions' manifest shards — metadata work
    // proportional to the write, not the table. Full-replace writes
    // (truncate / complete-mode refresh) fall back to a full
    // reconciliation (they also retire files everywhere); so does any
    // message shape without final paths. A delete-only partition
    // (retired without publishing) leaves a stale shard behind —
    // harmless by the (size, mtime) keying, garbage-collected by the
    // next full analyze.
    def scopeOf(ms: Array[WriterCommitMessage],
        full: Boolean): Option[Set[String]] =
      if (full) None
      else {
        val dirUri = new Path(dir).toUri.getPath
        val rels = ms.toSeq.flatMap {
          case GraftPartitionedCow.CowTaskFiles(files, _, _) => files.map(_._2)
          case _ => Seq.empty[String]
        }.map(f => new Path(f).toUri.getPath)
        if (rels.isEmpty || rels.exists(!_.startsWith(dirUri))) None
        else Some(rels.map(p =>
          p.stripPrefix(dirUri).stripPrefix("/"))
          // files under hidden directories (the upsert stage) are not
          // table data — their "partitions" need no stats refresh
          .filter(!_.split('/').exists(s =>
            s.startsWith("_") || s.startsWith(".")))
          .map(GraftStats.shardKeyOf).toSet)
      }
    val fullReplace = w.isInstanceOf[GraftPartitionedCow.TruncateReplaceWrite] ||
      w.isInstanceOf[ReplaceFilesWrite]
    def batch(b: BatchWrite): BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        b.createBatchWriterFactory(info)
      override def useCommitCoordinator(): Boolean = b.useCommitCoordinator()
      override def onDataWriterCommit(m: WriterCommitMessage): Unit =
        b.onDataWriterCommit(m)
      override def commit(ms: Array[WriterCommitMessage]): Unit = {
        b.commit(ms); refresh(scopeOf(ms, fullReplace), ms)
      }
      override def abort(ms: Array[WriterCommitMessage]): Unit = b.abort(ms)
    }
    def stream(s: StreamingWrite): StreamingWrite = new StreamingWrite {
      private val fullEpoch =
        s.isInstanceOf[GraftPartitionedCow.StreamingReplaceWrite]
      override def createStreamingWriterFactory(
          info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.streaming
            .StreamingDataWriterFactory =
        s.createStreamingWriterFactory(info)
      override def useCommitCoordinator(): Boolean = s.useCommitCoordinator()
      override def commit(e: Long, ms: Array[WriterCommitMessage]): Unit = {
        s.commit(e, ms); refresh(scopeOf(ms, fullEpoch), ms)
      }
      override def abort(e: Long, ms: Array[WriterCommitMessage]): Unit =
        s.abort(e, ms)
    }
    w match {
      case v1: V1Write => new V1Write {
        override def toInsertableRelation: InsertableRelation = {
          val inner = v1.toInsertableRelation
          (data, overwrite) => { inner.insert(data, overwrite); refresh(None) }
        }
        override def toStreaming: StreamingWrite = stream(v1.toStreaming)
        override def description(): String = v1.description()
      }
      case rdo: RequiresDistributionAndOrdering =>
        new Write with RequiresDistributionAndOrdering {
          override def requiredDistribution = rdo.requiredDistribution()
          override def distributionStrictlyRequired: Boolean =
            rdo.distributionStrictlyRequired()
          override def requiredNumPartitions: Int = rdo.requiredNumPartitions()
          override def advisoryPartitionSizeInBytes: Long =
            rdo.advisoryPartitionSizeInBytes()
          override def requiredOrdering = rdo.requiredOrdering()
          override def toBatch: BatchWrite = batch(w.toBatch)
          override def toStreaming: StreamingWrite = stream(w.toStreaming)
          override def description(): String = w.description()
        }
      case other => new Write {
        override def toBatch: BatchWrite = batch(other.toBatch)
        override def toStreaming: StreamingWrite = stream(other.toStreaming)
        override def description(): String = other.description()
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!readOnly, s"${name()} is a time-travel snapshot: read-only")
    // `upsertKeys` write option (r11 item 4): the STREAMING face of
    // this write becomes a per-epoch keyed upsert
    // ([[GraftPartitionedCow.StreamingUpsertWrite]]), and the builder
    // additionally declares SupportsStreamingUpdateAsAppend — the
    // marker Spark requires before admitting outputMode("update") into
    // a v2 sink. Without the option, Update mode stays refused at
    // query start (appending update rows silently would duplicate
    // every re-emitted group).
    val upsertKeys: Seq[String] =
      Option(info.options.get("upsertKeys")).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    class GraftWriteBuilder extends WriteBuilder
        with SupportsTruncate with SupportsDynamicOverwrite {
      private var mode: String = "append"
      override def truncate(): WriteBuilder = { mode = "truncate"; this }
      override def overwriteDynamicPartitions(): WriteBuilder = {
        mode = "dynamic"; this
      }

      private def upsertWrite()
          : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
        require(meta.renameAliases.isEmpty,
          s"${name()} has renamed columns with un-materialized aliases: " +
            "streaming upserts are refused until CALL system.compact")
        // upsertMode=equality (r12 item 6): epochs write equality-
        // delete sidecars + appended rows, never scanning the target;
        // default (merge) keeps the per-epoch MERGE INTO machinery
        if (Option(info.options.get("upsertMode"))
            .exists(_.equalsIgnoreCase("equality")))
          new GraftPartitionedCow.StreamingEqUpsertWrite(spark, format,
            info.schema(), dir, effectivePartitionCols, meta.bucketSpec,
            upsertKeys, info.queryId())
        else new GraftPartitionedCow.StreamingUpsertWrite(spark, format,
          info.schema(), dir, quotedIdent, upsertKeys, info.queryId())
      }

      private def withUpsert(base: Write): Write =
        if (upsertKeys.isEmpty) base else asUpsert(base)

      /** Reroute ONLY the streaming face to the upsert sink; the batch
        * face (and its V1Write-ness / distribution requirements) stays
        * exactly what the mode produced.
        */
      private def asUpsert(base: Write): Write = base match {
        case v1: V1Write => new V1Write {
          override def toInsertableRelation: InsertableRelation =
            v1.toInsertableRelation
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            upsertWrite()
          override def description(): String =
            s"graft-upsert ${v1.description()}"
        }
        case rdo: org.apache.spark.sql.connector.write
            .RequiresDistributionAndOrdering => new Write
            with org.apache.spark.sql.connector.write
              .RequiresDistributionAndOrdering {
          override def requiredDistribution = rdo.requiredDistribution()
          override def distributionStrictlyRequired: Boolean =
            rdo.distributionStrictlyRequired()
          override def requiredNumPartitions: Int =
            rdo.requiredNumPartitions()
          override def advisoryPartitionSizeInBytes: Long =
            rdo.advisoryPartitionSizeInBytes()
          override def requiredOrdering = rdo.requiredOrdering()
          override def toBatch: BatchWrite = base.toBatch
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            upsertWrite()
          override def description(): String =
            s"graft-upsert ${base.description()}"
        }
        case other => new Write {
          override def toBatch: BatchWrite = other.toBatch
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            upsertWrite()
          override def description(): String =
            s"graft-upsert ${other.description()}"
        }
      }

      override def build(): Write = withAutoAnalyze(withUpsert(mode match {
        // OVERWRITE_DYNAMIC is declared unconditionally in capabilities,
        // so with partitionOverwriteMode=dynamic set SESSION-WIDE Spark
        // plans OverwritePartitionsDynamic for ANY insert-overwrite —
        // including unpartitioned tables, where "replace the partitions
        // that received data" degenerates to a full replace. Route that
        // case to the truncate semantics instead of refusing (r10
        // ADVICE): bucketed tables take the bucket-tagging v2 full
        // replace, plain ones the V1 versioned swap-replace.
        case "dynamic" if effectivePartitionCols.isEmpty =>
          // OverwritePartitionsDynamicExec has NO V1 fallback, so this
          // must be a real v2 write even for plain tables
          buildV2Replace(info.schema())
        case "dynamic" =>
          // mixed-era refusal: "replace the partitions that received
          // data" is directory-granular, but an old-era file of the
          // same LOGICAL partition lives in a parent directory the
          // replacement never touches — its rows would survive a
          // replace that should supersede them
          require(evolvedCols.isEmpty,
            s"${name()}: dynamic partition overwrite is refused while " +
              "the partition spec evolution is un-materialized (file " +
              "eras at mixed depths) — CALL system.compact to migrate " +
              "the table to its current spec first")
          val parts = effectivePartitionCols
          val schema = info.schema()
          val bad = parts.filter { c =>
            schema.fields.find(_.name.equalsIgnoreCase(c))
              .forall(f => !GraftPartitionedCow.dirRenderable(f.dataType))
          }
          require(bad.isEmpty,
            s"${name()}: partition columns ${bad.mkString(", ")} have types " +
              "whose directory rendering is ambiguous (supported: string, " +
              "integral, boolean, date)")
          val fs = new Path(dir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val old = listDataFiles(fs, new Path(dir))
          new GraftPartitionedCow.DynamicOverwriteWrite(
            spark, format, schema, dir, parts, old, meta.bucketSpec)
        case m => buildBatch(replace = m == "truncate")
      }))

      /** Staged-invisible v2 full replace (with version retention when
        * configured) — the truncate path for bucketed tables and the
        * dynamic-overwrite degenerate case above.
        */
      private def buildV2Replace(schema: StructType): Write = {
        val fs = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val old = listDataFiles(fs, new Path(dir))
        new GraftPartitionedCow.TruncateReplaceWrite(spark, format,
          schema, dir, effectivePartitionCols, old, meta.bucketSpec,
          if (versions > 0) Some((s"$dir.__versions", versions)) else None,
          info.queryId())
      }

      private def buildBatch(replace: Boolean): Write =
        if (meta.bucketSpec.isDefined || evolvedCols.nonEmpty) {
          // bucketed tables write through the v2 hive-layout path — the
          // V1 append cannot tag bucket files. Evolved-spec tables too:
          // the hive-layout writers keep evolved columns IN the data
          // (prepare's keepInData) while laying out the current spec
          if (replace) buildV2Replace(info.schema())
          else
            new GraftPartitionedCow.BucketedAppendWrite(spark, format,
              info.schema(), dir, effectivePartitionCols, meta.bucketSpec,
              info.queryId())
        } else
          new V1Write {
            override def toInsertableRelation: InsertableRelation =
              (data, overwriteFlag) => {
                val parts = effectivePartitionCols
                // write-time CHECK constraints ride inside
                // engine.append / engine.createOrReplace (the object
                // API guards THERE, so this path inherits it without
                // a second filter)
                if (replace || overwriteFlag)
                  // a full replace supersedes every row — the dir swap
                  // carries the eq sidecars away with the old generation
                  engine.createOrReplace(data, layer, table, parts)
                else {
                  // appended rows would be wrongly subject to LIVE
                  // equality deletes (their floor is -1) — refuse
                  GraftEqDel.requireNone(
                    new Path(dir).getFileSystem(
                      spark.sparkContext.hadoopConfiguration),
                    new Path(dir), "a batch append")
                  engine.append(data, layer, table, parts)
                }
              }
            /** `df.writeStream.toTable("<cat>.<layer>.<table>")` —
              * exactly-once-per-epoch streaming: Append output mode
              * lands each epoch as an append
              * ([[GraftPartitionedCow.StreamingAppendWrite]]); Complete
              * output mode (`replace` here — Spark calls `truncate()`
              * before `toStreaming` for it) lands each epoch as a full
              * refresh ([[GraftPartitionedCow.StreamingReplaceWrite]]).
              */
            override def toStreaming
                : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
              val parts = effectivePartitionCols
              val schema = info.schema()
              // `writeStream.toTable` hands the QUERY's schema straight
              // through (no ResolveOutputRelation cast pass on this
              // path), so a type drift — e.g. a DOUBLE landing in a
              // BIGINT column — would write files the table's declared
              // schema can never read back. Fail the mismatch at query
              // START, not at first read.
              meta.schema.foreach { declared =>
                schema.fields.foreach { f =>
                  declared.fields.find(_.name.equalsIgnoreCase(f.name))
                    .foreach { d =>
                      require(d.dataType == f.dataType,
                        s"${name()}: streaming query writes ${f.name}: " +
                          s"${f.dataType.simpleString} but the table " +
                          s"declares ${d.dataType.simpleString} — cast in " +
                          "the query (files would be unreadable)")
                    }
                }
              }
              val bad = parts.filter { c =>
                schema.fields.find(_.name.equalsIgnoreCase(c))
                  .forall(f => !GraftPartitionedCow.dirRenderable(f.dataType))
              }
              require(bad.isEmpty,
                s"${name()}: partition columns ${bad.mkString(", ")} have " +
                  "types whose directory rendering is ambiguous")
              if (replace)
                new GraftPartitionedCow.StreamingReplaceWrite(
                  spark, format, schema, dir, parts, info.queryId())
              else
                new GraftPartitionedCow.StreamingAppendWrite(
                  spark, format, schema, dir, parts, info.queryId())
            }
          }
    }
    if (upsertKeys.nonEmpty)
      new GraftWriteBuilder
        with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend
    else new GraftWriteBuilder
  }

  /** Fully-quoted SQL identifier of this table (for re-reads through
    * the session catalog from driver-side commit logic).
    */
  private def quotedIdent: String = s"`$catalogName`.`$layer`.`$table`"

  /** Pre-write row counts per hive partition rel-dir within a
    * per-column value scope — the commit-time carryover-equality check
    * of the leaf-narrowed copy-on-write ([[GraftCowLeafScope]]). Runs
    * as one distributed zero-data-column aggregate over the scoped
    * partitions (partition-pruned via the typed isin filters); only the
    * per-partition counts — touched-scope-bounded — reach the driver.
    */
  private[sources] def countRowsByPartition(
      scope: Map[String, Set[String]]): Map[String, Long] = {
    import org.apache.spark.sql.functions.col
    val parts = effectivePartitionCols
    val s = schema()
    def dtOf(c: String): DataType =
      s.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalStateException(s"partition column $c not in schema"))
        .dataType
    val scoped = scope.foldLeft(spark.table(quotedIdent)) {
      case (df, (c, toks)) =>
        df.where(col(c).isin(
          toks.toSeq.map(GraftPartitionedCow.externalToken(_, dtOf(c))): _*))
    }
    scoped.groupBy(parts.map(col): _*).count().collect().map { row =>
      val rel = parts.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(c,
            GraftPartitionedCow.renderRaw(row.get(i), dtOf(c)))
      }.mkString("/")
      rel -> row.getLong(parts.length)
    }.toMap
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(!readOnly, s"${name()} is a time-travel snapshot: read-only")
    // row-level operation scans (COW capture, MOR positional) bypass
    // the alias-merging read wrapper — a rewrite would null renamed
    // columns in pre-rename files. Compact first (it reads through the
    // aliased scan and rewrites every row under the current names).
    require(meta.renameAliases.isEmpty,
      s"${name()} has renamed columns with un-materialized aliases: " +
        "row-level operations are refused until CALL system.compact " +
        "rewrites the old files under their current names")
    // merge-on-read tables run UPDATE/MERGE (and untranslatable
    // DELETEs — translatable ones stay on the deleteWhere vector path,
    // partition predicates on the directory-drop path) as DELTA
    // operations ([[GraftDeltaMor]]): positions + appended rows,
    // untouched files byte-identical. Copy-on-write tables keep the
    // group-based rewrite below.
    if (morEnabled && format == "parquet")
      return () => new RowLevelOperation
          with org.apache.spark.sql.connector.write.SupportsDelta
          with GraftMorRuntimeScope.GraftMorOperation {
        override def command(): RowLevelOperation.Command = info.command
        override def description(): String =
          s"graft merge-on-read ${info.command}"
        override def rowId(): Array[NamedReference] = Array(
          Expressions.column(GraftDeltaMor.FileCol),
          Expressions.column(GraftDeltaMor.PosCol))
        // preimage capture (Delta CDF's `_change_data`): requesting the
        // `_graft_pre_*` MIRRORS as metadata attributes hands the
        // writer each deleted/updated row's FULL pre-image. Mirrors,
        // not the data columns themselves, because Spark's delta
        // projections bind by NAME and an UPDATE's new values are
        // aliases named after the data columns — a metadata request
        // for `v` would read the POST-image; `_graft_pre_v` cannot
        // collide and carries the preserve-on-delete/update markers.
        // The positional scan already decodes every touched row for
        // ordinal integrity, so capture costs column decode + a
        // ~matched-rows write, and the changes feed then serves
        // delete/update_preimage rows exactly instead of re-reading
        // whole data files (GraftCommits.preRoot).
        override def requiredMetadataAttributes(): Array[NamedReference] =
          if (!GraftDeltaMor.captureEnabled(spark) ||
            GraftTable.this.schema().fieldNames
              .exists(GraftDeltaMor.isEngineMetaField)) Array.empty
          else GraftTable.this.schema().fields.map(f =>
            Expressions.column(GraftDeltaMor.preColName(f.name)))
        override def newScanBuilder(
            options: CaseInsensitiveStringMap): ScanBuilder =
          GraftTable.this.newScanBuilder(options)
        override def newWriteBuilder(writeInfo: LogicalWriteInfo)
            : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
          new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
            override def build()
                : org.apache.spark.sql.connector.write.DeltaWrite =
              new GraftDeltaMor.GraftMorDeltaWrite(spark, format,
                writeInfo.schema(), dir, effectivePartitionCols,
                meta.bucketSpec, writeInfo, autoAnalyze,
                command = info.command.toString.toLowerCase)
          }
      }
    () => new RowLevelOperation with GraftCowOperation {
      override def command(): RowLevelOperation.Command = info.command
      override def description(): String = s"graft copy-on-write ${info.command}"

      /** Leaf-scope channel ([[GraftCowLeafScope]]): None = undecided,
        * Some(None) = declined (fall back to the first-column runtime
        * capture), Some(Some(ls)) = exact leaf narrowing active.
        */
      @volatile private var leafState
          : Option[Option[GraftCowLeafScope.LeafScope]] = None
      override def cowPartitionCols: Seq[String] = anchorPartitionCols
      override def cowCountRowsWithin(
          scope: Map[String, Set[String]]): Map[String, Long] =
        countRowsByPartition(scope)
      override def leafScopeDecided: Boolean = leafState.isDefined
      override def leafScope: Option[GraftCowLeafScope.LeafScope] =
        leafState.flatten
      override def offerLeafScope(ls: GraftCowLeafScope.LeafScope): Unit =
        synchronized {
          if (leafState.isEmpty)
            // mixed file eras break the leaf scope's rel-granular
            // carryover accounting — decline; the capture-based
            // retirement stays exact at anchor granularity
            leafState = Some(if (evolvedCols.nonEmpty) None else Some(ls))
        }
      override def declineLeafScope(): Unit =
        synchronized { if (leafState.isEmpty) leafState = Some(None) }

      /** Partition constraints the runtime group filter narrowed this
        * operation's SCAN to (per-column allowed directory tokens,
        * conjunction). The scan and the write are built from this same
        * operation instance, which is exactly how the connector API
        * intends scan→write state to flow: the scan records what it
        * read, the commit retires only files inside those partitions.
        * None = the group filter never fired — the scan read every
        * partition, so the commit must retire every pre-existing file
        * (whole-table rewrite: correct, just not partition-bounded).
        */
      @volatile private var scanned: Option[Map[String, Set[String]]] = None
      private def recordScanned(ts: Map[String, Set[String]]): Unit =
        synchronized {
          val prev = scanned.getOrElse(Map.empty[String, Set[String]])
          scanned = Some((prev.keySet ++ ts.keySet).map { k =>
            (prev.get(k), ts.get(k)) match {
              case (Some(a), Some(b)) => k -> (a intersect b)
              case (Some(a), None) => k -> a
              case (None, Some(b)) => k -> b
              case _ => k -> Set.empty[String]
            }
          }.toMap)
        }

      /** The replaced "group" is a PARTITION (or, unpartitioned, the
        * whole table), so the operation's scan must produce every row
        * of every group the write supersedes. The wrapper therefore
        * exposes NO static pushdown surface: letting Spark push the
        * command condition into the parquet scan would row-group-skip
        * rows that don't match — exactly the carryover rows the
        * replacement must keep — while the write still retires their
        * files (verified: an unwrapped builder loses non-matching rows
        * on `DELETE WHERE k = 1`). What IS sound is group-granular
        * runtime pruning: for partitioned tables the scan implements
        * [[SupportsRuntimeV2Filtering]], so Spark's
        * RowLevelOperationRuntimeGroupFiltering rule plans a subquery
        * over the command condition, delivers the matching partition
        * values as runtime IN-predicates, and the scan reads ONLY the
        * touched partitions — the Iceberg copy-on-write shape, and the
        * piece that bounds a 100 TB merge by its touched partitions.
        * The applied constraint set is recorded on the operation so
        * the commit retires exactly the files the scan superseded
        * (capture mode keeps the applied and reported sets identical
        * by construction — see [[GraftRuntimeFilterScan.filter]]).
        */
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
        val inner = delegate.newScanBuilder(options)
        // The ONE static pushdown this scan accepts: filters whose
        // references are ALL partition columns. Those drop whole GROUPS
        // (a partition-column predicate can never split a partition),
        // which is exactly the granularity a group-based rewrite may
        // prune at — and it is how [[GraftCowLeafScope]]'s injected
        // per-column IN reaches the FILE LISTING instead of being
        // row-filtered after a full read. Anything referencing a data
        // column stays un-pushed (returned as post-scan) for the
        // reasons in the class doc above.
        new ScanBuilder
          with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {
          // ANCHOR columns only: a predicate on them can never split a
          // file of ANY era (every era carries the anchor as directory
          // tokens); an evolved column CAN split an old-era file, so
          // its predicates must stay row-level for carryover safety
          private var pureAnchor: Seq[CatalystExpr] = Nil
          override def pushFilters(filters: Seq[CatalystExpr]): Seq[CatalystExpr] = {
            val parts = anchorPartitionCols
            val (pure, rest) = filters.partition { f =>
              f.deterministic && f.references.nonEmpty &&
                f.references.forall(a =>
                  parts.exists(_.equalsIgnoreCase(a.name)))
            }
            pureAnchor = pureAnchor ++ pure
            val residual = inner match {
              case fsb: FileScanBuilder if pure.nonEmpty => fsb.pushFilters(pure)
              case _ => pure
            }
            rest ++ residual
          }
          override def pushedFilters: Array[Predicate] = inner match {
            case fsb: FileScanBuilder => fsb.pushedFilters
            case _ => Array.empty
          }
          private def evolveOp(fs: FileScan): FileScan =
            if (evolvedCols.isEmpty) fs
            else GraftEvolved.rebuildScan(fs, spark, new Path(dir),
              schema(), anchorPartitionCols, evolvedCols, pureAnchor)
          override def build(): org.apache.spark.sql.connector.read.Scan =
            inner.build() match {
              // wrap when partitioned (runtime group filtering) AND
              // whenever deletion vectors exist — the operation scan
              // must read THROUGH them or a rewrite's carryover would
              // resurrect deleted rows into the new generation
              case fsn0: FileScan if anchorPartitionCols.nonEmpty =>
                new GraftRuntimeFilterScan(evolveOp(fsn0),
                  captureTokens = Some(recordScanned),
                  dvTableDir = Some(new Path(dir)))
              case fsn0: FileScan
                  if GraftDv.hasAny(new Path(dir).getFileSystem(
                    spark.sparkContext.hadoopConfiguration), new Path(dir)) =>
                new GraftRuntimeFilterScan(evolveOp(fsn0),
                  dvTableDir = Some(new Path(dir)))
              case fsn0: FileScan if evolvedCols.nonEmpty =>
                evolveOp(fsn0)
              case other => other
            }
        }
      }

      override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder = {
        val parts = effectivePartitionCols
        // a BUCKETED (even unpartitioned) table must keep bucket-tagged
        // files through a rewrite, so it takes the hive-layout path too
        if (parts.isEmpty && meta.bucketSpec.isEmpty)
          new WriteBuilder { override def build(): Write = {
            // snapshot the current generation's data files NOW (driver,
            // pre-job): these are exactly the files the replacement
            // supersedes and retires at commit
            val fs = new Path(dir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            val old = listDataFiles(fs, new Path(dir))
            val fileWrite = delegate.newWriteBuilder(writeInfo).build()
            withAutoAnalyze(
              new ReplaceFilesWrite(fileWrite, writeInfo.schema(), dir, old,
                GraftCheck.boundFor(spark,
                  spark.sparkContext.hadoopConfiguration, dir,
                  writeInfo.schema()),
                command = info.command.toString.toLowerCase))
          } }
        else {
          // partitioned copy-on-write: the replacement write lays rows
          // out in the hive directory structure itself (the piece the
          // flat v2 file write lacks). Partition values become
          // directory names, so they must render identically to the
          // dynamic-partition writer's tokens — restrict to the types
          // whose rendering is unambiguous.
          val schema = writeInfo.schema()
          val bad = parts.filter { c =>
            schema.fields.find(_.name.equalsIgnoreCase(c))
              .forall(f => !GraftPartitionedCow.dirRenderable(f.dataType))
          }
          require(bad.isEmpty,
            s"${info.command}: partition columns ${bad.mkString(", ")} have " +
              "types whose directory rendering is ambiguous (supported: " +
              "string, integral, boolean, date); use graft.runtime.Catalog.merge")
          require(parts.size < schema.fields.length,
            s"${info.command}: every column is a partition column — no " +
              "data columns to write")
          new WriteBuilder { override def build(): Write = {
            val fs = new Path(dir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            val old = listDataFiles(fs, new Path(dir))
            withAutoAnalyze(new GraftPartitionedCow.PartitionedReplaceWrite(
              spark, format, schema, dir, parts, old, () => scanned,
              meta.bucketSpec, () => leafScope,
              command = info.command.toString.toLowerCase))
          } }
        }
      }
    }
  }

  // ---- metadata-only DELETE --------------------------------------------
  // `DELETE FROM t WHERE <partition-col predicate>` on a partitioned
  // table never rewrites data: matching hive partition DIRECTORIES are
  // dropped, the Iceberg/Hive metadata-delete shape whose cost is
  // bounded by the number of touched partitions, not table size. Spark
  // wires this through OptimizeMetadataOnlyDeleteFromTable: the
  // row-level rewrite plan is replaced by a deleteWhere call when every
  // conjunct translates and canDeleteWhere accepts. Non-partition
  // predicates keep the copy-on-write path: a whole-table rewrite on
  // unpartitioned tables, the partitioned COW rewrite (group-filtered
  // to the touched partitions) on partitioned ones
  // (GraftPartitionDeleteSpec pins both).
  // TRUNCATE TABLE rides the same surface (ALWAYS_TRUE).

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    // TRUNCATE (all conjuncts ALWAYS_TRUE) is supported on EVERY
    // table — the unconditional branch of deleteWhere needs no
    // partitioning and consumes DV + equality-delete sidecars
    (!readOnly && predicates.nonEmpty &&
      predicates.forall(_.name == "ALWAYS_TRUE")) ||
    !readOnly && {
      // ANCHOR columns only: a directory drop at anchor granularity
      // takes BOTH eras' files of the logical partition with it; an
      // evolved-column constraint cannot be a directory drop for
      // old-era rows (they live inside files) — those decline to the
      // row-level paths below
      val parts = anchorPartitionCols
      // every conjunct must be a =/IN over SOME partition column (any
      // level of a multi-level year=/month= layout — the reference's
      // landing shape, covid_to_s3.py:41); a partial spec (WHERE
      // year = 2020 alone) is fine: it drops a directory SUBTREE
      parts.nonEmpty && predicates.forall { p =>
        p.name == "ALWAYS_TRUE" ||
          parts.exists(c => predicatePartitionValues(p, c).isDefined)
      }
    } || (
      // merge-on-read tier ([[GraftDv]]): ARBITRARY translatable
      // predicates delete by recording row positions — no rewrite. The
      // partition-directory path above stays preferred when it applies
      // (deleteWhere dispatches in the same order). Evolved-spec tables
      // decline this shortcut: its direct parquet read cannot resolve
      // mixed-depth eras (and anchor values live in dirs) — Spark then
      // plans the positional DELTA path, which reads through the
      // catalog's era-aware scan and is correct across eras.
      !readOnly && morEnabled && evolvedCols.isEmpty &&
        GraftDv.translate(predicates, schema()).isDefined)

  private def partitionDeletable(predicates: Array[Predicate]): Boolean = {
    val parts = anchorPartitionCols
    parts.nonEmpty && predicates.forall { p =>
      p.name == "ALWAYS_TRUE" ||
        parts.exists(c => predicatePartitionValues(p, c).isDefined)
    }
  }

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    require(!readOnly, s"${name()} is a time-travel snapshot: read-only")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (predicates.forall(_.name == "ALWAYS_TRUE")) {
      // TRUNCATE / unconditional DELETE: every data child is TOMBSTONED
      // (never deleted at commit — an in-flight reader that planned
      // before this commit re-resolves its files from the tombstone
      // area, the same snapshot-isolation contract every other retiring
      // commit honors); the metadata sidecar stays (the table keeps its
      // schema). Deletion vectors die with the rows they were deleting —
      // in-flight readers captured their DV filters at planning time.
      GraftCommitLock.withLock(fs, new Path(dir), "truncate-delete") {
        if (fs.exists(new Path(dir))) {
          val tops = fs.listStatus(new Path(dir)).map(_.getPath)
            .filterNot(p =>
              p.getName.startsWith("_") || p.getName.startsWith("."))
            .toSeq
          // journal needs FILE-granular removes; enumerate before the
          // directory renames move them (rel layout is preserved)
          val goneRels = tops.flatMap(listDataFiles(fs, _))
            .map(GraftCommits.relOf(fs, new Path(dir), _))
          val tomb = GraftRetired.retireFiles(fs, new Path(dir), tops)
          GraftCommits.tryRecord(fs, new Path(dir), "delete",
            adds = Nil,
            removes = goneRels.map(
              GraftCommits.Remove(_, tomb.getOrElse(""))))
        }
        GraftDv.dropAll(fs, new Path(dir))
        GraftEqDel.clearAll(fs, new Path(dir)) // rows gone = deletes moot
      }
    } else if (!partitionDeletable(predicates)) {
      // merge-on-read positional delete (canDeleteWhere accepted, so
      // the condition translates)
      GraftEqDel.requireNone(fs, new Path(dir), "a positional DELETE")
      require(meta.renameAliases.isEmpty,
        s"${name()} has renamed columns with un-materialized aliases: " +
          "positional deletes are refused until CALL system.compact")
      val cond = GraftDv.translate(predicates, schema()).getOrElse(
        throw new IllegalStateException(
          s"${name()}: deleteWhere on untranslatable predicates " +
            predicates.mkString(", ")))
      GraftDv.morDelete(spark, new Path(dir), schema(), cond,
        effectivePartitionCols)
    } else {
      GraftEqDel.requireNone(fs, new Path(dir), "a partition-drop DELETE")
      val parts = anchorPartitionCols
      // the predicate array is a conjunction: build a per-column
      // constraint map, intersecting same-column value sets. An
      // ALWAYS_TRUE conjunct constrains nothing — drop it rather than
      // letting its empty token list poison the intersection.
      val constraints = predicates.toSeq.filterNot(_.name == "ALWAYS_TRUE")
        .map { p =>
          parts.iterator
            .map(c => c -> predicatePartitionValues(p, c))
            .collectFirst { case (c, Some(vs)) => c -> vs.toSet }
            .getOrElse(throw new IllegalArgumentException(
              s"${name()}: cannot delete-where on predicate $p"))
        }
        .groupMapReduce(_._1)(_._2)(_ intersect _)
      require(constraints.nonEmpty,
        s"${name()}: delete-where resolved no partition constraints")
      // walk the hive tree level by level: constrained levels descend
      // only into matching directories; once no constraint remains at
      // or below a level, the whole matching SUBTREE is dropped — a
      // partial spec on a two-level layout drops one directory, not
      // one directory per leaf. Dropped subtrees are TOMBSTONED
      // ([[GraftRetired]]), never deleted at commit: an in-flight
      // reader that planned before this DELETE re-resolves its files
      // under the retired copy's preserved relative layout. Absent
      // directories are already-satisfied deletes (idempotent); each
      // drop is one atomic rename, so a crash mid-way leaves a prefix
      // retired and a re-run converges.
      // ONE tombstone commit dir for the whole walk, so the journal
      // record's removes all resolve under a single preserved layout
      lazy val tombDir = GraftRetired.newCommitDir(new Path(dir))
      var tombUsed = false
      val goneRels = Seq.newBuilder[String]
      def walk(d: Path, level: Int): Unit = {
        if (!parts.drop(level).exists(constraints.contains)) {
          if (fs.exists(d)) {
            goneRels ++= listDataFiles(fs, d)
              .map(GraftCommits.relOf(fs, new Path(dir), _))
            GraftRetired.retireFilesInto(fs, new Path(dir), Seq(d), tombDir)
            tombUsed = true
          }
        } else if (level < parts.length) {
          val col = parts(level)
          val children = constraints.get(col) match {
            case Some(toks) => toks.toSeq.map(t => new Path(d,
              org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .getPartitionPathString(col, t))).filter(fs.exists)
            case None =>
              if (!fs.exists(d)) Nil
              else fs.listStatus(d).toSeq
                .filter(st => st.isDirectory &&
                  st.getPath.getName.startsWith(col + "="))
                .map(_.getPath)
          }
          children.foreach(walk(_, level + 1))
          // a parent emptied by its children's deletion goes too, so
          // the layout never accumulates hollow year=/month= shells
          if (level > 0 && fs.exists(d) && fs.listStatus(d).isEmpty)
            fs.delete(d, false)
        }
      }
      GraftCommitLock.withLock(fs, new Path(dir), "partition-drop-delete") {
        walk(new Path(dir), 0)
        val rels = goneRels.result()
        if (rels.nonEmpty)
          GraftCommits.tryRecord(fs, new Path(dir), "delete",
            adds = Nil,
            removes = rels.map(GraftCommits.Remove(_,
              if (tombUsed) tombDir.getName else "")))
      }
      // sidecar hygiene: vectors of files that died with their
      // partition directories are inert — sweep them
      GraftDv.sweepStale(fs, new Path(dir))
    }
    // maintenance policy (outside any lock): the MOR branch grew the
    // DV area, the others grew the tombstone area
    GraftMaintenance.afterCommit(spark, fs, new Path(dir))
  }

  /** `=` / `IN` on THE partition column with string/integral literals →
    * the matching partition directory value tokens (rendered exactly as
    * the hive-style writer names directories); anything else → None.
    */
  private def predicatePartitionValues(p: Predicate,
                                       partCol: String): Option[Seq[String]] = {
    def isPartRef(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case r: NamedReference =>
          r.fieldNames.length == 1 && r.fieldNames.head.equalsIgnoreCase(partCol)
        case _ => false
      }
    // NULL and empty-string literals (DELETE ... WHERE pri IN ('a',
    // NULL)) decline the metadata path cleanly — both fold into
    // __HIVE_DEFAULT_PARTITION__ on the write side, so a directory drop
    // would take other rows with it; timestamps/decimals decline for
    // rendering ambiguity ([[GraftPartitionedCow.dirToken]])
    def token(l: V2Literal[_]): Option[String] =
      GraftPartitionedCow.dirToken(l.value, l.dataType)
    p.children().toSeq match {
      case _ if p.name == "ALWAYS_TRUE" => Some(Nil)
      case Seq(ref, l: V2Literal[_]) if p.name == "=" && isPartRef(ref) =>
        token(l).map(Seq(_))
      case Seq(l: V2Literal[_], ref) if p.name == "=" && isPartRef(ref) =>
        token(l).map(Seq(_))
      case ref +: values if p.name == "IN" && isPartRef(ref) &&
          values.nonEmpty && values.forall(_.isInstanceOf[V2Literal[_]]) =>
        val toks = values.map { case l: V2Literal[_] => token(l) }
        if (toks.forall(_.isDefined)) Some(toks.map(_.get)) else None
      case _ => None
    }
  }

  private def listDataFiles(fs: FileSystem, p: Path): Seq[Path] =
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (st.isDirectory) listDataFiles(fs, st.getPath)
      else Seq(st.getPath)
    }

  /** The copy-on-write replacement write: delegate the distributed
    * write (staged invisibly by the file commit protocol), then retire
    * the superseded generation in the same driver commit.
    *
    * Row layout note: group-based ReplaceData rows arrive prefixed with
    * Spark's `__row_operation` int column; the runtime only projects it
    * away when the operation declares metadata attributes (the
    * [[org.apache.spark.sql.execution.datasources.v2.ReplaceDataExec]]
    * writingTask dispatch), so with none declared the raw
    * `[op, data...]` rows would hit the format writer and overflow its
    * schema. [[StripOperationFactory]] applies the data projection the
    * engine would otherwise skip.
    */
  private class ReplaceFilesWrite(inner: Write, dataSchema: StructType,
                                  dir: String,
                                  oldFiles: Seq[Path],
                                  checks: Seq[GraftCheck.Bound] = Nil,
                                  command: String = "")
    extends Write {
    override def description(): String = s"graft replace-data $dir"
    // deletion-vector conflict guard (see PartitionedReplaceWrite):
    // snapshot at write build, re-check under the commit lock
    private val dvBefore = GraftDv.fingerprint(new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration), new Path(dir))
    override def toBatch: BatchWrite = new BatchWrite {
      private val innerBatch = inner.toBatch
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory = {
        val stripped = StripOperationFactory(
          innerBatch.createBatchWriterFactory(info), dataSchema)
        // write-time CHECK constraints ([[GraftCheck]]): the stripped
        // rows match dataSchema exactly, so the guard binds at offset 0
        if (checks.isEmpty) stripped
        else CheckingWriterFactory(stripped, checks, dataSchema)
      }
      override def useCommitCoordinator(): Boolean =
        innerBatch.useCommitCoordinator()
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val fs = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // publish + retire are one commit critical section: a racing
        // committer fails cleanly instead of interleaving (r11 item 6)
        GraftCommitLock.withLock(fs, new Path(dir), "replace-files") {
          GraftEqDel.requireNone(fs, new Path(dir), "a copy-on-write rewrite")
          if (GraftDv.fingerprint(fs, new Path(dir)) != dvBefore)
            throw new GraftCommitLock.ConcurrentCommitException(
              s"$dir: deletion vectors changed while this rewrite ran; " +
                "the rewrite read pre-delete rows and was DISCARDED — re-run")
          // pre-commit universe snapshot inside the critical section:
          // the journal record claims the delegated write's new files
          // as everything that appears across the commit
          val before = GraftCommits.universe(fs, new Path(dir))
          innerBatch.commit(messages) // new generation becomes visible
          // old generation retires — TOMBSTONED, not deleted, so an
          // in-flight reader that planned before this commit completes
          // against its snapshot (r12 item 2; GC via remove_orphans)
          val tomb = GraftRetired.retireFiles(fs, new Path(dir), oldFiles)
          GraftDv.dropFor(fs, new Path(dir), oldFiles)
          GraftCommits.tryRecordClaiming(fs, new Path(dir), "rewrite",
            before = before,
            removes = oldFiles.map(g => GraftCommits.Remove(
              GraftCommits.relOf(fs, new Path(dir), g),
              tomb.getOrElse(""))),
            note = command)
        }
        // maintenance policy outside the lock: this commit grew the
        // tombstone area (retired.expire_ms GC)
        GraftMaintenance.afterCommit(spark, fs, new Path(dir))
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        innerBatch.abort(messages) // old generation untouched
    }
  }
}

/** Task-side adapter for the [[GraftTable]] row-level write: strips the
  * leading `__row_operation` column off group-based replacement rows
  * (the rewrites emit `[op] ++ dataColumns` in table-column order, per
  * `RewriteRowLevelCommand.buildReplaceDataProjections`) so the
  * delegated file writer sees exactly its declared schema. Rows that
  * already match the data schema pass through untouched, which keeps
  * the adapter correct if a future Spark applies its own projection.
  */
/** Task-side CHECK-constraint decorator for delegated file writes
  * ([[GraftCheck]]): every row is checked before the inner writer sees
  * it. The hive-layout writers enforce inline instead (they own the
  * row loop); this wrapper covers the paths that delegate to Spark's
  * own file writers.
  */
private case class CheckingWriterFactory(
    inner: org.apache.spark.sql.connector.write.DataWriterFactory,
    checks: Seq[GraftCheck.Bound], dataSchema: StructType)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val innerW = inner.createWriter(partitionId, taskId)
    // rows may arrive prefixed with Spark's __row_operation column
    // (row-level rewrites emit [op] ++ data); the guard binds per
    // observed layout, exactly like the hive-layout writer
    val guards = new Array[GraftCheck.RowGuard](2)
    new org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] {
      override def write(
          row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        val offset = row.numFields - dataSchema.length
        require(offset == 0 || offset == 1,
          s"row has ${row.numFields} fields for a " +
            s"${dataSchema.length}-column table")
        if (guards(offset) == null)
          guards(offset) = new GraftCheck.RowGuard(
            GraftCheck.shift(checks, offset), dataSchema, offset)
        guards(offset).check(row)
        innerW.write(row)
      }
      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage =
        innerW.commit()
      override def abort(): Unit = innerW.abort()
      override def close(): Unit = innerW.close()
    }
  }
}

private case class StripOperationFactory(
    inner: org.apache.spark.sql.connector.write.DataWriterFactory,
    dataSchema: StructType)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val delegate = inner.createWriter(partitionId, taskId)
    val n = dataSchema.length
    val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
      dataSchema, (1 to n).toIndexedSeq)
    new org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] {
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (row.numFields == n) delegate.write(row)
        else {
          require(row.numFields == n + 1,
            s"replacement row has ${row.numFields} fields for a $n-column table")
          proj.project(row)
          delegate.write(proj)
        }
      override def commit(): WriterCommitMessage = delegate.commit()
      override def abort(): Unit = delegate.abort()
      override def close(): Unit = delegate.close()
    }
  }
}

/** Forwarding scan builder: preserves every pushdown tier of the
  * delegate file builder (column pruning, catalyst filter pushdown,
  * aggregate pushdown, variant extraction) and wraps the built scan in
  * [[GraftRuntimeFilterScan]] so catalog tables participate in dynamic
  * partition pruning — the one scan tier Spark's V2 file scans lack.
  * For bucketed tables the built scan is instead wrapped in
  * [[GraftBucketedScan]], which regroups the file splits by bucket id
  * and reports KeyGroupedPartitioning (storage-partitioned joins /
  * exchange-free aggregation); the two wrappers are alternatives — a
  * bucketed scan trades the runtime-pruning tier for the key grouping.
  */
private[sources] final class GraftScanBuilder(delegate: FileScanBuilder,
    bucket: Option[(Int, String)] = None,
    statsDir: Option[Path] = None,
    tableSchema: StructType = new StructType(),
    partitionSchema: StructType = new StructType(),
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    ignoreDeletes: Boolean = false,
    renameAliases: Map[String, Seq[String]] = Map.empty,
    evolvedCols: Seq[String] = Nil,
    pinToJournal: Boolean = true)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  // requested row-coordinate metadata columns ([[GraftDeltaMor]]):
  // split off before delegating (the file builder doesn't know them);
  // their presence routes build() to the positional MetaScan
  private var metaFields: Seq[org.apache.spark.sql.types.StructField] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val (meta, data) = requiredSchema.fields.partition(f =>
      GraftDeltaMor.isEngineMetaField(f.name))
    metaFields = meta.toSeq
    // preimage mirrors copy their SOURCE column's value per row — the
    // source must be in the delegate read even when the query itself
    // does not project it (a DELETE's required columns are rowId +
    // mirrors only)
    val have = data.map(_.name.toLowerCase).toSet
    val extra = meta.toSeq.collect {
      case f if GraftDeltaMor.isPreField(f.name) =>
        GraftDeltaMor.preSourceOf(f.name)
    }.distinct.filterNot(n => have.contains(n.toLowerCase)).map { n =>
      val i = tableSchema.fieldNames.indexWhere(_.equalsIgnoreCase(n))
      require(i >= 0,
        s"preimage mirror source column $n is not in the table schema")
      tableSchema.fields(i)
    }
    delegate.pruneColumns(StructType(data ++ extra))
  }

  // recorded for the manifest aggregate fast path: PARTITION-column
  // predicates are exact at file granularity (dir tokens), so the
  // aggregate can apply them to the file list; anything else bails
  private var pushedCatalyst: Seq[CatalystExpr] = Nil

  override def pushFilters(filters: Seq[CatalystExpr]): Seq[CatalystExpr] = {
    pushedCatalyst = pushedCatalyst ++ filters
    if (evolvedCols.isEmpty) delegate.pushFilters(filters)
    else {
      // evolved tables list recursively, so the delegate sees anchor
      // columns as DATA columns and would report their filters as
      // residual — which blocks aggregate pushdown and re-evaluates
      // them per row. They are EXACT at directory granularity in
      // EVERY era (the anchor prefix holds table-wide) and the
      // rebuilt scan applies them as partition filters
      // ([[GraftEvolved.rebuildScan]] from pushedCatalyst): claim
      // them handled and push only the rest through the delegate.
      val anchorLower =
        partitionSchema.fieldNames.map(_.toLowerCase).toSet
      val (_, rest) = filters.partition { f =>
        f.deterministic && f.references.nonEmpty &&
          f.references.forall(a => anchorLower.contains(a.name.toLowerCase))
      }
      delegate.pushFilters(rest)
    }
  }

  override def pushedFilters: Array[Predicate] = delegate.pushedFilters

  /** COUNT/MIN/MAX — ungrouped or GROUP BY partition columns, with
    * at most partition-column filters — answered from the
    * [[GraftStats]] manifest: COMPLETE pushdown delivering a
    * [[GraftStatsLocalAggScan]] (plans as a LocalTableScan: zero
    * files opened, zero tasks). Computed once and cached: Spark calls
    * supportCompletePushDown then pushAggregation with the same
    * Aggregation. Fail-safe per [[GraftStats.completeAggregate]] —
    * any uncovered file, data-column filter, or unsupported aggregate
    * falls back to the delegate (parquet footer pushdown, off by
    * default) and the ordinary distributed scan.
    */
  private var manifestAggCache: Option[(Aggregation,
    Option[(StructType,
      Seq[org.apache.spark.sql.catalyst.InternalRow])])] = None
  private var stashedAgg:
    Option[(StructType,
      Seq[org.apache.spark.sql.catalyst.InternalRow])] = None

  /** Merge-on-read deletion vectors poison every file-count-derived
    * answer: parquet footer row counts and manifest COUNT/MIN/MAX all
    * include deleted rows. Any live vector declines BOTH aggregate
    * tiers — the ordinary distributed scan (which applies the vectors)
    * answers instead.
    */
  private lazy val dvPresent: Boolean = statsDir.exists { td =>
    val fs = td.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    // equality deletes poison count-derived answers identically
    GraftDv.hasAny(fs, td) || GraftEqDel.hasAny(fs, td)
  }

  private def manifestAgg(aggregation: Aggregation)
      : Option[(StructType,
        Seq[org.apache.spark.sql.catalyst.InternalRow])] = {
    manifestAggCache match {
      case Some((a, r)) if a eq aggregation => r
      case _ =>
        val r =
          if (tableSchema.isEmpty || dvPresent) None
          else statsDir.flatMap(d => GraftStats.completeAggregate(
            SparkSession.active, d, tableSchema, partitionSchema,
            pushedCatalyst, aggregation))
        manifestAggCache = Some((aggregation, r))
        r
    }
  }

  override def pushAggregation(aggregation: Aggregation): Boolean =
    manifestAgg(aggregation) match {
      case some @ Some(_) => stashedAgg = some; true
      case None => delegate match {
        // renamed columns decline footer pushdown too: pre-rename
        // files lack the current name, and footer aggregates resolve
        // strictly by name. Evolved partition specs likewise — anchor
        // columns live in NO file's footers (directory tokens only),
        // so a footer MIN/MAX/COUNT over them would be null-wrong.
        case a: SupportsPushDownAggregates
          if !dvPresent && renameAliases.isEmpty && evolvedCols.isEmpty =>
          a.pushAggregation(aggregation)
        case _ => false
      }
    }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    manifestAgg(aggregation).isDefined || (delegate match {
      case a: SupportsPushDownAggregates
        if !dvPresent && renameAliases.isEmpty && evolvedCols.isEmpty =>
        a.supportCompletePushDown(aggregation)
      case _ => false
    })

  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    delegate match {
      case v: SupportsPushDownVariantExtractions =>
        v.pushVariantExtractions(extractions)
      case _ => new Array[Boolean](extractions.length)
    }

  /** Evolved partition spec (r13 item 3): the delegate listed with
    * recursiveFileLookup (no inference over mixed-depth eras) — swap
    * in the era-aware index and re-home anchor columns/filters.
    */
  private def evolve(fs: FileScan): FileScan =
    if (evolvedCols.isEmpty) fs
    else GraftEvolved.rebuildScan(fs, SparkSession.active,
      statsDir.getOrElse(throw new IllegalStateException(
        "an evolved table scan needs its table dir")),
      tableSchema, partitionSchema.fieldNames.toSeq, evolvedCols,
      pushedCatalyst)

  override def build(): Scan = stashedAgg match {
    case Some((aggSchema, rows)) =>
      new GraftStatsLocalAggScan(aggSchema, rows,
        s"graft-stats-agg(${aggSchema.fieldNames.mkString(", ")})")
    case None if metaFields.nonEmpty =>
      // positional scan: per-file ordered chains, filter-stripped
      // readers, deletion vectors applied — exact `_graft_pos`
      delegate.build() match {
        case fs: FileScan =>
          new GraftDeltaMor.MetaScan(evolve(fs), statsDir.getOrElse(
            throw new IllegalStateException(
              "metadata columns need a table dir")), metaFields)
        case other => throw new IllegalStateException(
          s"metadata columns over non-file scan $other")
      }
    case None => delegate.build() match {
      case fs0: FileScan => val fs = evolve(fs0); bucket match {
        case Some((n, c)) =>
          new GraftBucketedScan(fs, n, c, statsDir,
            maxFilesPerTrigger = maxFilesPerTrigger,
            maxBytesPerTrigger = maxBytesPerTrigger,
            ignoreDeletes = ignoreDeletes,
            renameAliases = renameAliases,
            pinToJournal = pinToJournal)
        case None => new GraftRuntimeFilterScan(fs, statsDir = statsDir,
          maxFilesPerTrigger = maxFilesPerTrigger,
          maxBytesPerTrigger = maxBytesPerTrigger,
          dvTableDir = statsDir, ignoreDeletes = ignoreDeletes,
          renameAliases = renameAliases,
          pinToJournal = pinToJournal)
      }
      case other => other
    }
  }
}

/** The one-row result of a manifest-answered aggregate ([[GraftStats
  * .completeAggregate]]). Implementing [[LocalScan]] makes Spark plan
  * it as a `LocalTableScanExec`: the 100 TB `count(*)`/`max(ts)`
  * freshness probe executes with NO input partitions, NO tasks and NO
  * file opens — the same contract as Iceberg answering from manifest
  * metrics.
  */
private[sources] final class GraftStatsLocalAggScan(aggSchema: StructType,
    resultRows: Seq[org.apache.spark.sql.catalyst.InternalRow],
    desc: String)
  extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = aggSchema
  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
    resultRows.toArray
  override def description(): String = desc
}

/** Key-grouped scan over a bucketed warehouse table: the delegate file
  * scan's planned splits are regrouped into exactly `n` input
  * partitions by the bucket id parsed from each file's name (the
  * bucket-respecting writers tag files `-b<.....>`), each carrying its
  * key via [[HasPartitionKey]]. With the `bucket` function resolvable
  * through the catalog ([[GraftBucketFn]]) and
  * `spark.sql.sources.v2.bucketing.enabled`, Spark then satisfies
  * clustered distributions on the bucket key without an Exchange and
  * storage-partition-joins two same-spec tables — at 100 TB that is
  * the fact-fact join with NO shuffle on either side, the tier the r09
  * verdict flagged as missing from real warehouse tables.
  *
  * Fail-safe: if ANY data file lacks a bucket tag (object-API writes,
  * files predating the spec), the scan falls back to the delegate's
  * split plan and reports unknown partitioning — never a wrong
  * grouping. All `n` groups are always emitted (empty ones included)
  * so two scans' key sets align regardless of data skew.
  */
private[sources] final class GraftBucketedScan(initial: FileScan,
    n: Int, col: String,
    // data-skipping manifest location ([[GraftStats]]); pruning happens
    // WITHIN bucket groups, so all `n` key groups are still emitted and
    // the reported KeyGroupedPartitioning stays truthful
    statsDir: Option[Path] = None,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    ignoreDeletes: Boolean = false,
    // RENAME COLUMN alias map (current lower name -> retired names);
    // see [[GraftRename]]
    renameAliases: Map[String, Seq[String]] = Map.empty,
    // journal-pinned snapshot reads ([[GraftPinnedScan]], r16 item 1)
    pinToJournal: Boolean = true)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning
  with SupportsRuntimeV2Filtering
  with SupportsReportStatistics {

  import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}

  @volatile private var current: FileScan = initial

  // shard-scoped manifest reads ([[GraftStats.ScopedReader]]): only the
  // shards of directories holding PLANNED files are ever opened — a
  // partition-pruned bucketed scan never parses foreign partitions'
  // manifest entries
  private lazy val scopedReader: Option[GraftStats.ScopedReader] =
    statsDir.map(d => new GraftStats.ScopedReader(
      d.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration), d))

  // ---- merge-on-read deletion vectors (statsDir IS the table dir) ------
  private lazy val dvFs: Option[FileSystem] = statsDir.map(td =>
    td.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration))
  private lazy val dvIndex: Map[String, Path] = (statsDir, dvFs) match {
    case (Some(td), Some(fs)) => GraftDv.list(fs, td)
    case _ => Map.empty
  }
  private lazy val eqIndex: Option[GraftEqDel.Index] =
    (statsDir, dvFs) match {
      case (Some(td), Some(fs)) =>
        GraftEqDel.load(SparkSession.active, fs, td)
      case _ => None
    }

  private lazy val bloomReaderB: Option[GraftBloom.ScopedReader] =
    (statsDir, dvFs) match {
      case (Some(td), Some(fs)) => Some(new GraftBloom.ScopedReader(fs, td))
      case _ => None
    }

  override def readSchema(): StructType = current.readSchema()
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftTableMicroBatchStream(initial, checkpointLocation,
      maxFilesPerTrigger, maxBytesPerTrigger, ignoreDeletes,
      renameAliases)
  override def description(): String =
    s"graft-bucketed(n=$n, key=$col) ${current.description()}"
  override def estimateStatistics(): Statistics = current.estimateStatistics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    // live vectors / equality deletes now keep the scan COLUMNAR (r12
    // items 1 and 6): batches without deletions pass through zero-copy
    // and affected batches are rebuilt by survivor compaction. Only
    // non-copyable (nested) schemas fall back to the row path.
    if ((dvIndex.nonEmpty || eqIndex.nonEmpty) &&
        !GraftDv.columnarApplicable(readSchema()))
      Scan.ColumnarSupportMode.UNSUPPORTED
    else if (renameAliases.nonEmpty &&
        !GraftRename.columnarApplicable(readSchema(), renameAliases))
      Scan.ColumnarSupportMode.UNSUPPORTED
    else current.columnarSupportMode()

  private val BucketTag = "-b(\\d{5})\\.".r

  /** files per bucket id, or None if any split is untagged/foreign. */
  private def bucketsOf(
      parts: Array[org.apache.spark.sql.connector.read.InputPartition])
      : Option[Map[Int, Seq[PartitionedFile]]] = {
    val fps = parts.toSeq.map {
      case fp: FilePartition => Some(fp)
      case _ => None
    }
    if (fps.contains(None)) None
    else {
      val files = fps.flatten.flatMap(_.files.toSeq)
      val tagged = files.map { f =>
        (BucketTag.findFirstMatchIn(f.toPath.getName)
          .map(_.group(1).toInt).filter(_ < n), f)
      }
      if (tagged.exists(_._1.isEmpty)) None
      else Some(tagged.map { case (b, f) => (b.get, f) }
        .groupMap(_._1)(_._2))
    }
  }

  /** Groupability is decided ONCE, on the unfiltered file set at
    * planning time (outputPartitioning must be stable); runtime
    * filters only SHRINK the set, and a subset of tagged files stays
    * tagged, so the decision cannot be invalidated later.
    */
  private lazy val initialPlan = initial.toBatch.planInputPartitions()
  private lazy val groupable: Boolean = bucketsOf(initialPlan).isDefined

  /** HASH-EXACT bucket pruning (r11 item 2): the set of bucket ids
    * that MAY hold rows matching a pushed data filter, or None when no
    * usable shape constrains the bucket key. Min/max skipping is
    * useless on a hashed layout, but `bucket(n, k)` is deterministic:
    * a `k = 42` probe can only find rows in bucket
    * [[GraftBucket.of]](42, n) — evaluating the transform over the
    * literals at PLANNING time keeps exactly the matching buckets'
    * file groups, the Iceberg bucket-transform pruning mode. Exact by
    * construction (the writers route every row — NULL keys included —
    * through the same function), so a file in another bucket provably
    * holds no match.
    *
    * Shapes: =/<=> /IN/InSet over the bucket column with same-type
    * literals; AND intersects, OR unions (both sides must be known).
    * A non-null equality can't match NULL-key rows, so the NULL bucket
    * is NOT added; `<=> NULL` keys to the NULL image. Anything else —
    * casts, ranges, other columns — answers None (no pruning).
    */
  private def allowedBuckets(filters: Seq[CatalystExpr]): Option[Set[Int]] = {
    def isKey(a: AttributeReference): Boolean = a.name.equalsIgnoreCase(col)
    def one(a: AttributeReference, v: Any): Option[Set[Int]] =
      try Some(Set(GraftBucket.of(v, n)))
      catch { case scala.util.control.NonFatal(_) => None }
    def lit(a: AttributeReference, l: Literal): Option[Set[Int]] =
      if (l.dataType != a.dataType) None
      else if (l.value == null) Some(Set.empty) // = NULL matches nothing
      else one(a, l.value)
    def walk(e: CatalystExpr): Option[Set[Int]] = e match {
      case CatalystAnd(l, r) => (walk(l), walk(r)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
      case CatalystOr(l, r) =>
        for (a <- walk(l); b <- walk(r)) yield a union b
      case EqualTo(a: AttributeReference, l: Literal) if isKey(a) => lit(a, l)
      case EqualTo(l: Literal, a: AttributeReference) if isKey(a) => lit(a, l)
      case EqualNullSafe(a: AttributeReference, l: Literal) if isKey(a) =>
        if (l.dataType != a.dataType) None
        else if (l.value == null) one(a, null) // NULL keys' bucket image
        else one(a, l.value)
      case EqualNullSafe(l: Literal, a: AttributeReference) if isKey(a) =>
        walk(EqualNullSafe(a, l))
      case In(a: AttributeReference, vs)
          if isKey(a) && vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val per = vs.map(v => lit(a, v.asInstanceOf[Literal]))
        if (per.exists(_.isEmpty)) None
        else Some(per.flatten.reduce(_ union _))
      case InSet(a: AttributeReference, vs) if isKey(a) =>
        val per = vs.toSeq.map {
          case null => Some(Set.empty[Int]) // IN-list NULL matches nothing
          case v => one(a, v)
        }
        if (per.exists(_.isEmpty)) None
        else Some(per.flatten.foldLeft(Set.empty[Int])(_ union _))
      case _ => None
    }
    // the filter list is a conjunction: intersect every known verdict
    val per = filters.map(walk)
    if (per.forall(_.isEmpty)) None
    else Some(per.flatten.reduce(_ intersect _))
  }

  /** Journal-pinned keep-test over the planned batch files (r16 item
    * 1) — None = nothing to pin (the common case).
    */
  private def pinKeep(planned: Seq[PartitionedFile])
      : Option[PartitionedFile => Boolean] =
    (statsDir, dvFs) match {
      case (Some(td), Some(fs)) if pinToJournal =>
        GraftPinnedScan.keepTest(fs, td, current, planned)
      case _ => None
    }

  override def planInputPartitions(): Array[
      org.apache.spark.sql.connector.read.InputPartition] =
    if (!groupable) {
      // fallback (untagged/foreign files): delegate plan, but deletion
      // vectors must still apply — regroup exactly as the plain scan
      val parts0 = current.toBatch.planInputPartitions()
      val parts = pinKeep(parts0.toSeq.collect {
          case fp: FilePartition => fp.files.toSeq
        }.flatten) match {
        case Some(keepP) => parts0.map {
          case fp: FilePartition =>
            FilePartition(fp.index, fp.files.filter(keepP))
              : org.apache.spark.sql.connector.read.InputPartition
          case other => other
        }
        case None => parts0
      }
      (statsDir, dvFs) match {
        case (Some(td), Some(fs)) if dvIndex.nonEmpty =>
          val planned = parts.toSeq.collect {
            case fp: FilePartition => fp.files.toSeq
          }.flatten
          val dvs = GraftDv.forFiles(fs, td, planned, dvIndex)
          if (dvs.isEmpty) parts
          else {
            GraftDv.verifyLive(fs, td, dvs, planned)
            GraftDv.regroup(parts, td, dvs)
          }
        case _ => parts
      }
    } else {
      val by0 = bucketsOf(current.toBatch.planInputPartitions())
        .getOrElse(Map.empty[Int, Seq[PartitionedFile]])
      // pin WITHIN bucket groups: all n key groups still emit
      val by = pinKeep(by0.values.flatten.toSeq) match {
        case Some(keepP) =>
          by0.map { case (b, fl) => (b, fl.filter(keepP)) }
        case None => by0
      }
      val filters = current.dataFilters
      // hash-exact bucket pruning: non-matching buckets keep their
      // (empty) groups so the reported KeyGroupedPartitioning stays
      // truthful, but schedule NO files
      val allowed = allowedBuckets(filters)
      // file-level data skipping inside each surviving group
      // (fail-safe: a file without a valid manifest entry is kept);
      // the bloom tier composes conjunctively for point lookups
      val skip: PartitionedFile => Boolean = statsDir match {
        case Some(d) if filters.nonEmpty =>
          val scoped = allowed match {
            case Some(ok) => by.view.filterKeys(ok).values.flatten.toSeq
            case None => by.values.flatten.toSeq
          }
          val m = scopedReader.map(_.forFiles(scoped)).getOrElse(Map.empty)
          val blooms = bloomReaderB.map(_.forFiles(scoped))
            .getOrElse(Map.empty)
          f => (m.isEmpty || GraftStats.keepFile(f, filters, m, d)) &&
            (blooms.isEmpty || GraftBloom.keepFile(f, filters, blooms, d))
        case _ => _ => true
      }
      // ALWAYS all n groups (empty ones included): two scans' key sets
      // must align for the storage-partitioned join regardless of skew
      // or runtime pruning
      val scheduled = (0 until n).map { b =>
        b -> (if (allowed.forall(_.contains(b)))
          by.getOrElse(b, Nil).filter(skip)
        else Nil)
      }
      // merge-on-read deletion vectors: a bucket whose files carry
      // vectors becomes an ORDERED per-file chain (same partition
      // index and key — KeyGroupedPartitioning stays truthful, the
      // storage-partitioned join unaffected); clean buckets keep the
      // plain keyed partition and the columnar readers
      val dvs = (statsDir, dvFs) match {
        case (Some(td), Some(fs)) if dvIndex.nonEmpty =>
          val planned = scheduled.flatMap(_._2)
          val m = GraftDv.forFiles(fs, td, planned, dvIndex)
          if (m.nonEmpty) GraftDv.verifyLive(fs, td, m, planned)
          m
        case _ => Map.empty[String, GraftDv.Dv]
      }
      scheduled.map { case (b, files) =>
        statsDir.flatMap(td =>
            GraftDv.regroupBucket(b, files, td, dvs))
          .getOrElse(new KeyedFilePartition(b, files.toArray))
          : org.apache.spark.sql.connector.read.InputPartition
      }.toArray
    }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    // snapshot-isolation fallback (r12 item 2): a split whose file was
    // tombstoned by a commit racing this scan re-points at the
    // `.__retired` copy instead of failing the query
    def iso(f: org.apache.spark.sql.connector.read.PartitionReaderFactory) =
      statsDir match {
        case Some(td) => new GraftRetired.FallbackReaderFactory(f,
          td.toString, new GraftPartitionedCow.SerializableHadoopConf(
            SparkSession.active.sparkContext.hadoopConfiguration))
        case None => f
      }
    eqIndex match {
      case Some(ix) =>
        require(dvIndex.isEmpty,
          s"$statsDir has both positional deletion vectors and equality " +
            "deletes — CALL system.rewrite_deletes first")
        GraftEqDel.factoryFor(current, ix, iso)
      case None =>
        GraftRename.factoryFor(current, renameAliases, iso) match {
          case Some(f) => f
          case None =>
            val cleanF = iso(current.toBatch.createReaderFactory())
            if (dvIndex.isEmpty) cleanF
            else new GraftDv.DvReaderFactory(cleanF,
              iso(GraftScanFilters.withoutDataFilters(current)
                .toBatch.createReaderFactory()), current.readSchema())
        }
    }
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (groupable)
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(Array(Expressions.bucket(n, col)), n)
    else
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(initialPlan.length)

  // ---- runtime (dynamic) partition pruning ------------------------------
  // A bucketed table can ALSO be hive-partitioned; without this the
  // bucket layout would trade away the DPP tier. Runtime IN/= on the
  // hive partition columns narrows the file listing BEFORE buckets are
  // regrouped — the partition count stays n (some buckets just hold
  // fewer files), so the reported KeyGroupedPartitioning stays truthful.

  override def filterAttributes(): Array[NamedReference] =
    current.readPartitionSchema.fieldNames.map(Expressions.column)

  override def filter(predicates: Array[Predicate]): Unit = {
    val partSchema = current.readPartitionSchema
    val extra = predicates.toSeq
      .flatMap(GraftScanFilters.toPartitionFilter(_, partSchema))
    if (extra.nonEmpty)
      current = GraftScanFilters.withPartitionFilters(current, extra)
  }
}

/** A [[FilePartition]] that knows its bucket key — what lets Spark
  * line partitions up across two bucketed scans. The delegate's reader
  * factory matches on FilePartition, so the subclass reads unchanged.
  */
private[sources] final class KeyedFilePartition(bucket: Int,
    bucketFiles: Array[org.apache.spark.sql.execution.datasources.PartitionedFile])
  extends org.apache.spark.sql.execution.datasources.FilePartition(
    bucket, bucketFiles)
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow =
    org.apache.spark.sql.catalyst.InternalRow(bucket)
}

/** Runtime-filterable file scan: declares the partition columns as
  * filter attributes, and on `filter(...)` translates the IN
  * predicates Spark's DPP machinery delivers (see
  * `DataSourceV2Strategy.translateRuntimeFilterV2`: `Predicate("IN",
  * FieldReference +: LiteralValue*)` with catalyst-internal values)
  * into catalyst partition filters on a rebuilt delegate — partition
  * directories outside the dimension's filtered key set are never
  * listed, let alone read. Predicates that aren't partition-column IN/=
  * shapes are ignored, which is always safe: runtime filters are an
  * optimization, the join above still applies the full condition.
  */
private[sources] final class GraftRuntimeFilterScan(
    initial: FileScan,
    // row-level (copy-on-write) capture mode: report the applied
    // partition constraints (per-column directory-renderable tokens) to
    // the owning RowLevelOperation so the commit retires exactly the
    // files the scan superseded. In this mode a predicate is applied
    // ONLY IF it is also token-renderable — the applied and reported
    // constraint sets must be identical, or the scanned and retired
    // partition sets diverge (retire ⊄ scanned = data loss; scanned ⊄
    // retired = resurrected duplicates).
    captureTokens: Option[Map[String, Set[String]] => Unit] = None,
    // data-skipping manifest location ([[GraftStats]]); None (and any
    // capture-mode scan — a COW rewrite must read every surviving row
    // of its groups) reads the delegate's plan unchanged
    statsDir: Option[Path] = None,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    ignoreDeletes: Boolean = false,
    // table dir for merge-on-read deletion vectors ([[GraftDv]]):
    // set on EVERY catalog scan — including capture-mode COW scans,
    // where skipping is off but deleted rows must still not resurrect
    // into a rewrite's carryover
    dvTableDir: Option[Path] = None,
    // RENAME COLUMN alias map; see [[GraftRename]]
    renameAliases: Map[String, Seq[String]] = Map.empty,
    // journal-pinned snapshot reads ([[GraftPinnedScan]], r16 item 1):
    // off for read-only time-travel dirs (their journal is an archived
    // copy, not a live commit axis)
    pinToJournal: Boolean = true)
  extends Scan with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  @volatile private var current: FileScan = initial

  // ---- merge-on-read deletion vectors ------------------------------------
  private lazy val dvFs: Option[FileSystem] = dvTableDir.map(td =>
    td.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration))
  /** Sidecar index (rel path -> sidecar file), loaded once per scan —
    * one listing of `_graft_dv/`, proportional to files WITH deletions.
    */
  private lazy val dvIndex: Map[String, Path] = (dvTableDir, dvFs) match {
    case (Some(td), Some(fs)) => GraftDv.list(fs, td)
    case _ => Map.empty
  }
  /** Equality-delete index ([[GraftEqDel]], r12 item 6) — loaded once
    * per scan; loud on caps/mixed streams.
    */
  private lazy val eqIndex: Option[GraftEqDel.Index] =
    (dvTableDir, dvFs) match {
      case (Some(td), Some(fs)) =>
        GraftEqDel.load(SparkSession.active, fs, td)
      case _ => None
    }
  /** Rebuild planned partitions so deleted positions are skipped at
    * read time; verifies every planned DV against its live file first
    * (LOUD mismatch — a stale vector must never silently resurrect).
    */
  private def applyDvs(
      parts: Array[org.apache.spark.sql.connector.read.InputPartition])
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    if (dvIndex.isEmpty) parts
    else {
      val td = dvTableDir.get
      val fs = dvFs.get
      val planned = plannedFiles(parts)
      val dvs = GraftDv.forFiles(fs, td, planned, dvIndex)
      if (dvs.isEmpty) parts
      else {
        GraftDv.verifyLive(fs, td, dvs, planned)
        GraftDv.regroup(parts, td, dvs)
      }
    }

  // shard-scoped manifest reads ([[GraftStats.ScopedReader]]): only the
  // shards of directories holding PLANNED files are ever opened — a
  // partition-pruned (static or DPP) scan never parses foreign
  // partitions' manifest entries, so the planning-time metadata read is
  // proportional to the partitions scanned, not the table
  private lazy val scopedReader: Option[GraftStats.ScopedReader] =
    statsDir.map(d => new GraftStats.ScopedReader(
      d.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration), d))

  private lazy val bloomReader: Option[GraftBloom.ScopedReader] =
    statsDir.map(d => new GraftBloom.ScopedReader(
      d.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration), d))

  private def plannedFiles(
      parts: Array[org.apache.spark.sql.connector.read.InputPartition])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionedFile] =
    parts.toSeq.collect {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.toSeq
    }.flatten

  /** Batch view that prunes planned splits through the stats manifest
    * (non-capture scans) and then applies merge-on-read deletion
    * vectors. Delegation happens per CALL (not at construction) so
    * runtime partition filters applied to `current` after `toBatch`
    * are still honored, exactly as the unwrapped path behaves.
    */
  private final class GraftBatch extends Batch {
    override def planInputPartitions()
        : Array[org.apache.spark.sql.connector.read.InputPartition] = {
      val parts0 = current.toBatch.planInputPartitions()
      // journal-pinned snapshot (r16 item 1): a commit stalled between
      // publish and retirement must not double-serve its partitions —
      // capture-mode scans are excluded at toBatch (a COW rewrite reads
      // its own groups under the very lock the pin would consult)
      val parts = (dvTableDir, dvFs) match {
        case (Some(td), Some(fs)) if pinToJournal =>
          GraftPinnedScan.pin(fs, td, current, parts0)
        case _ => parts0
      }
      val filters = current.dataFilters
      val pruned = statsDir match {
        case Some(d) if captureTokens.isEmpty && filters.nonEmpty =>
          val m = scopedReader.map(_.forFiles(plannedFiles(parts)))
            .getOrElse(Map.empty)
          val afterStats =
            if (m.isEmpty) parts else GraftStats.prune(parts, filters, m, d)
          // bloom tier ([[GraftBloom]]): point-lookup pruning where
          // min/max proves nothing; composes conjunctively. Never in
          // capture mode — a COW rewrite reads all of its groups.
          val blooms = bloomReader.map(_.forFiles(plannedFiles(afterStats)))
            .getOrElse(Map.empty)
          if (blooms.isEmpty) afterStats
          else GraftBloom.prune(afterStats, filters, blooms, d)
        case _ => parts
      }
      applyDvs(pruned)
    }
    override def createReaderFactory()
        : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
      // snapshot-isolation fallback (r12 item 2) — see GraftRetired
      def iso(f: org.apache.spark.sql.connector.read.PartitionReaderFactory) =
        dvTableDir match {
          case Some(td) => new GraftRetired.FallbackReaderFactory(f,
            td.toString, new GraftPartitionedCow.SerializableHadoopConf(
              SparkSession.active.sparkContext.hadoopConfiguration))
          case None => f
        }
      eqIndex match {
        case Some(ix) =>
          // equality deletes (r12 item 6): value-keyed, epoch-floored
          require(dvIndex.isEmpty,
            s"$dvTableDir has both positional deletion vectors and " +
              "equality deletes — CALL system.rewrite_deletes first")
          GraftEqDel.factoryFor(current, ix, iso)
        case None =>
          // RENAME COLUMN alias merge (r12 item 8): aliases imply no
          // live DVs/eq deletes (the ALTER refuses over them and the
          // ops refuse over aliases)
          GraftRename.factoryFor(current, renameAliases, iso) match {
            case Some(f) => f
            case None =>
              val cleanF = iso(current.toBatch.createReaderFactory())
              if (dvIndex.isEmpty) cleanF
              else new GraftDv.DvReaderFactory(cleanF,
                // DV'd files read through a FILTER-STRIPPED reader:
                // parquet pushdown skips row groups, which would shift
                // the counted ordinals; the Filter above re-applies
                iso(GraftScanFilters.withoutDataFilters(current)
                  .toBatch.createReaderFactory()), current.readSchema())
          }
      }
    }
  }

  private def renameRelevant: Boolean =
    renameAliases.nonEmpty && current.readDataSchema.fields.exists(f =>
      renameAliases.contains(f.name.toLowerCase))

  override def readSchema(): StructType = current.readSchema()
  override def toBatch: Batch =
    if ((statsDir.isEmpty || captureTokens.isDefined) && dvIndex.isEmpty &&
        eqIndex.isEmpty && !renameRelevant)
      current.toBatch
    else new GraftBatch
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftTableMicroBatchStream(current, checkpointLocation,
      maxFilesPerTrigger, maxBytesPerTrigger, ignoreDeletes,
      renameAliases)
  override def description(): String = current.description()

  /** Planning-time statistics AFTER data skipping: when a manifest
    * covers the surviving files, report their byte sum (and, when every
    * survivor is covered, their exact analyze-time row sum) instead of
    * the delegate's whole-listing estimate. This is where skipping
    * compounds: a selectively-filtered fact side shrinks below the
    * broadcast threshold at PLANNING time, turning a 100 TB shuffle
    * join into a broadcast join — the same reason Delta/Iceberg feed
    * their manifest metrics to the optimizer. Fail-safe like the
    * pruning itself: any uncovered file falls back to its listed size
    * with no row claim.
    */
  /** NDV + null-count column statistics for CBO (r12 item 7): when the
    * session runs with `spark.sql.cbo.enabled` and every PLANNED file
    * carries identity-valid manifest registers for a column, report
    * its merged HLL distinct count (+ null count) through the DSv2
    * column-statistics surface — `DataSourceV2Relation.transformV2Stats`
    * turns these into catalyst attributeStats, which is what lets
    * aggregate/join estimation shrink a GROUP-BY side below the
    * broadcast threshold at PLANNING time. Computed only under CBO
    * (nobody else reads them) and declined under live deletes (counts
    * would over-claim).
    */
  /** Planned partitions for STATISTICS consumers only, memoized per
    * delegate instance — Catalyst may ask for estimates repeatedly and
    * (under CBO) two consumers read them per call; the listing/skipping
    * pipeline should run once. Execution's own planInputPartitions path
    * is untouched.
    */
  private var statsPlanCache
      : (FileScan, Array[org.apache.spark.sql.connector.read.InputPartition]) =
    null
  private def plannedForStats()
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    synchronized {
      if (statsPlanCache == null || !(statsPlanCache._1 eq current))
        statsPlanCache = (current, toBatch.planInputPartitions())
      statsPlanCache._2
    }

  private def withColumnStats(res: Statistics): Statistics = {
    val d = statsDir.get
    val parts = plannedForStats()
    val files = plannedFiles(parts)
    if (files.isEmpty) return res
    val m = scopedReader.map(_.forFiles(files)).getOrElse(Map.empty)
    if (m.isEmpty) return res
    val dirUri = d.toUri.getPath
    val entries: Seq[Option[GraftStats.FileStats]] = files.map { f =>
      val p = f.toPath.toUri.getPath
      val rel =
        if (p.startsWith(dirUri)) p.stripPrefix(dirUri).stripPrefix("/")
        else p
      m.get(rel).filter(st =>
        st.size == f.fileSize && st.mtime == f.modificationTime)
    }
    if (entries.exists(_.isEmpty)) return res // any uncovered file: decline
    val sts = entries.map(_.get)
    val rows = sts.map(_.rows).sum
    // columns where EVERY planned file has registers
    val colNames = sts.headOption.map(_.cols.keySet).getOrElse(Set.empty)
      .filter(c => sts.forall(_.cols.get(c).exists(_.hll.isDefined)))
    if (colNames.isEmpty) return res
    val out = new java.util.HashMap[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    colNames.foreach { c =>
      val regs = sts.map(_.cols(c).hll.get)
        .reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
      val ndv = GraftStats.ndvEstimate(regs)
      val nullsAll = sts.map(_.cols(c).nulls)
      val nulls =
        if (nullsAll.forall(_ >= 0)) java.util.OptionalLong.of(nullsAll.sum)
        else java.util.OptionalLong.empty()
      out.put(Expressions.column(c),
        new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
          override def distinctCount(): java.util.OptionalLong =
            java.util.OptionalLong.of(math.max(1L, ndv))
          override def nullCount(): java.util.OptionalLong = nulls
        })
    }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = res.sizeInBytes()
      override def numRows(): java.util.OptionalLong =
        if (res.numRows().isPresent) res.numRows()
        else java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = out
    }
  }

  override def estimateStatistics(): Statistics = {
    val base = current.estimateStatistics()
    val res = estimateStatistics0(base)
    val cboOn = SparkSession.active.conf
      .getOption("spark.sql.cbo.enabled").contains("true")
    if (!cboOn || captureTokens.isDefined || statsDir.isEmpty ||
        dvIndex.nonEmpty || eqIndex.isDefined) res
    else
      try withColumnStats(res)
      catch { case scala.util.control.NonFatal(_) => res } // advisory
  }

  private def estimateStatistics0(base: Statistics): Statistics = {
    statsDir match {
      case Some(d) if captureTokens.isEmpty && current.dataFilters.nonEmpty =>
        val parts = plannedForStats()
        val files = plannedFiles(parts)
        // an empty post-skip plan is EXACTLY zero rows (the manifest
        // proved every file filterable) — no shard read needed
        if (parts.isEmpty) new Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            java.util.OptionalLong.of(0L)
          override def numRows(): java.util.OptionalLong =
            java.util.OptionalLong.of(0L)
        }
        else {
        val m = scopedReader.map(_.forFiles(files)).getOrElse(Map.empty)
        if (m.isEmpty) base
        else {
          val dirUri = d.toUri.getPath
          val entries = files.map { f =>
            val p = f.toPath.toUri.getPath
            val rel =
              if (p.startsWith(dirUri)) p.stripPrefix(dirUri).stripPrefix("/")
              else p
            (f, m.get(rel).filter(st =>
              st.size == f.fileSize && st.mtime == f.modificationTime))
          }
          val bytes = entries.map(_._1.fileSize).sum
          val rows =
            // deletion vectors / equality deletes make manifest row
            // counts over-claims — no exact row estimate while live
            if (entries.forall(_._2.isDefined) && dvIndex.isEmpty &&
                eqIndex.isEmpty)
              java.util.OptionalLong.of(entries.map(_._2.get.rows).sum)
            else java.util.OptionalLong.empty()
          new Statistics {
            override def sizeInBytes(): java.util.OptionalLong =
              java.util.OptionalLong.of(bytes)
            override def numRows(): java.util.OptionalLong = rows
          }
        }
        }
      case _ => base
    }
  }
  override def supportedCustomMetrics(): Array[CustomMetric] =
    current.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    current.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    // live vectors / equality deletes keep the scan COLUMNAR (r12
    // items 1 and 6) via survivor-compacted batch rebuilds; nested
    // schemas fall back
    if ((dvIndex.nonEmpty || eqIndex.nonEmpty) &&
        !GraftDv.columnarApplicable(readSchema()))
      Scan.ColumnarSupportMode.UNSUPPORTED
    else if (renameAliases.nonEmpty &&
        !GraftRename.columnarApplicable(readSchema(), renameAliases))
      Scan.ColumnarSupportMode.UNSUPPORTED
    else current.columnarSupportMode()

  override def filterAttributes(): Array[NamedReference] = {
    val all = current.readPartitionSchema.fieldNames
    // capture (row-level) mode: RowLevelOperationRuntimeGroupFiltering
    // builds ONE dynamic-pruning subquery over ALL declared attributes;
    // with more than one it keys the IN on a named_struct, which
    // DataSourceV2Strategy's runtime-filter translation cannot deliver
    // to a V2 scan — the filter silently evaporates and the rewrite
    // goes unbounded. Declaring only the FIRST (top-level) partition
    // column keeps the subquery single-attribute — translatable,
    // delivered, and pruning at the dominant axis of a hierarchical
    // layout (year of year=/month=). Join-DPP (non-capture mode) plans
    // per-key subqueries instead, so it keeps every column.
    val names = if (captureTokens.isDefined) all.take(1) else all
    names.map(Expressions.column)
  }

  override def filter(predicates: Array[Predicate]): Unit = captureTokens match {
    case None =>
      val partSchema = current.readPartitionSchema
      val extra = predicates.toSeq.flatMap(toPartitionFilter(_, partSchema))
      if (extra.nonEmpty) current = withPartitionFilters(current, extra)
    case Some(report) =>
      val partSchema = current.readPartitionSchema
      // apply ∧ report only the predicates that BOTH translate to a
      // catalyst partition filter AND render to directory tokens; a
      // predicate failing either test is skipped entirely (the scan
      // reads more, the commit retires more — consistently)
      val usable = predicates.toSeq.flatMap { p =>
        for {
          f <- toPartitionFilter(p, partSchema)
          ct <- predicateTokens(p, partSchema)
        } yield (f, ct)
      }
      if (usable.nonEmpty) {
        current = withPartitionFilters(current, usable.map(_._1))
        report(usable.map(_._2)
          .groupMapReduce(_._1)(_._2)(_ intersect _))
      }
  }

  /** Capture-mode twin of [[toPartitionFilter]]: the same IN/= shapes,
    * but rendered to hive directory-name tokens. Values arrive
    * catalyst-internal (UTF8String for strings). NULL and
    * empty-string values are unrenderable — both fold into
    * `__HIVE_DEFAULT_PARTITION__` on the write side, which a runtime
    * equality filter can never match — as are non-string/integral/
    * boolean types, whose directory rendering differs from
    * `String.valueOf`; any unrenderable value rejects the whole
    * predicate (consistency over partial pruning).
    */
  private def predicateTokens(p: Predicate,
      partSchema: StructType): Option[(String, Set[String])] = {
    def colOf(ref: NamedReference): Option[String] = {
      val name = ref.fieldNames.mkString(".")
      partSchema.fields.find(_.name.equalsIgnoreCase(name)).map(_.name)
    }
    def render(value: Any, dt: DataType): Option[String] =
      GraftPartitionedCow.dirToken(value, dt)
    p.children().toSeq match {
      case (ref: NamedReference) +: values
        if p.name == "IN" && values.nonEmpty &&
          values.forall(_.isInstanceOf[V2Literal[_]]) =>
        colOf(ref).flatMap { c =>
          val toks = values.map { case l: V2Literal[_] =>
            render(l.value, l.dataType)
          }
          if (toks.forall(_.isDefined)) Some(c -> toks.flatten.toSet) else None
        }
      case Seq(ref: NamedReference, l: V2Literal[_]) if p.name == "=" =>
        colOf(ref).flatMap(c => render(l.value, l.dataType).map(t => c -> Set(t)))
      case _ => None
    }
  }

  private def toPartitionFilter(p: Predicate,
      partSchema: StructType): Option[CatalystExpr] =
    GraftScanFilters.toPartitionFilter(p, partSchema)

  private def withPartitionFilters(scan: FileScan,
      extra: Seq[CatalystExpr]): FileScan =
    GraftScanFilters.withPartitionFilters(scan, extra)
}

/** Runtime-predicate → partition-filter translation shared by the
  * DPP wrapper ([[GraftRuntimeFilterScan]]) and the bucketed scan
  * ([[GraftBucketedScan]]).
  */
private[sources] object GraftScanFilters {

  /** IN/= on a partition column → catalyst expression bound (by name —
    * `PartitioningAwareFileIndex` resolves partition-filter attributes
    * by name) to the partition schema; anything else → None.
    */
  def toPartitionFilter(p: Predicate,
                        partSchema: StructType): Option[CatalystExpr] = {
    def attrOf(ref: NamedReference): Option[AttributeReference] = {
      val name = ref.fieldNames.mkString(".")
      partSchema.fields.find(f => f.name.equalsIgnoreCase(name))
        .map(f => AttributeReference(f.name, f.dataType, nullable = true)())
    }
    p.children().toSeq match {
      case (ref: NamedReference) +: values
        if p.name == "IN" && values.nonEmpty &&
          values.forall(_.isInstanceOf[V2Literal[_]]) =>
        attrOf(ref).map { a =>
          In(a, values.map { case l: V2Literal[_] =>
            Literal(l.value, l.dataType)
          })
        }
      case Seq(ref: NamedReference, l: V2Literal[_]) if p.name == "=" =>
        attrOf(ref).map(a => EqualTo(a, Literal(l.value, l.dataType)))
      case _ => None
    }
  }

  /** Rebuild the delegate with extra partition filters — each concrete
    * file scan is a case class carrying `partitionFilters`, applied by
    * the shared file index at listing time.
    */
  def withPartitionFilters(scan: FileScan,
                           extra: Seq[CatalystExpr]): FileScan =
    scan match {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.copy(partitionFilters = p.partitionFilters ++ extra)
      case o: org.apache.spark.sql.execution.datasources.v2.orc.OrcScan =>
        o.copy(partitionFilters = o.partitionFilters ++ extra)
      case c: org.apache.spark.sql.execution.datasources.v2.csv.CSVScan =>
        c.copy(partitionFilters = c.partitionFilters ++ extra)
      case j: org.apache.spark.sql.execution.datasources.v2.json.JsonScan =>
        j.copy(partitionFilters = j.partitionFilters ++ extra)
      case other => other // unknown scan type: skip pruning, stay correct
    }

  /** Rebuild the delegate with NO data filters (schemas and partition
    * filters intact): the reader for a file with a deletion vector —
    * pushed-down parquet predicates skip row groups, which would shift
    * counted row ordinals; positions are only meaningful over the
    * unfiltered file. Parquet-only by construction ([[GraftDv]] is
    * parquet-only); any other scan type answers itself unchanged and
    * the caller's planning-time verification fails loudly instead.
    */
  def withoutDataFilters(scan: FileScan): FileScan =
    scan match {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.copy(pushedFilters = Array.empty, dataFilters = Nil,
          pushedAggregate = None)
      case other => other
    }

  /** Rebuild the delegate with an extended READ DATA SCHEMA — how the
    * equality-delete reader force-includes key columns the query
    * pruned away (parquet-only; [[GraftEqDel]] is parquet-only).
    */
  def withReadDataSchema(scan: FileScan, s: StructType): FileScan =
    scan match {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.copy(readDataSchema = s)
      case other => other
    }

  /** Rebuild the delegate over a different FILE set (same pruned
    * schemas, same filters) — how the micro-batch stream plans one
    * batch's files with the ordinary batch reader.
    */
  def withFileIndex(scan: FileScan,
      idx: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex)
      : FileScan =
    scan match {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.copy(fileIndex = idx)
      case o: org.apache.spark.sql.execution.datasources.v2.orc.OrcScan =>
        o.copy(fileIndex = idx)
      case c: org.apache.spark.sql.execution.datasources.v2.csv.CSVScan =>
        c.copy(fileIndex = idx)
      case j: org.apache.spark.sql.execution.datasources.v2.json.JsonScan =>
        j.copy(fileIndex = idx)
      case other => other
    }
}

/** Micro-batch streaming READ over a catalog table
  * (`spark.readStream.table("<cat>.<ns>.<t>")`): each trigger lists the
  * table's data files, diffs against the files already delivered, and
  * makes the NEW files the next batch — appends (batch INSERT INTO,
  * the streaming sink's epochs, engine appends) flow through as they
  * land, the FileStreamSource contract on the DSv2 surface.
  *
  * Exactly-once replay: the discovered file set per batch is persisted
  * in a per-source log under the query CHECKPOINT
  * (`<checkpoint>/graft-file-log/<batchId>`, one path per line) BEFORE
  * the offset is returned, so a batch re-executed after a crash
  * re-reads exactly the same files — deterministic replay, which is
  * what sinks build exactly-once on. A logged-but-uncommitted batch is
  * simply re-delivered on restart.
  *
  * Contract: APPEND-ONLY streaming. A copy-on-write rewrite
  * (MERGE/UPDATE/DELETE) produces new files whose rows would re-deliver
  * — the same caveat as every file-stream source; stream from tables
  * maintained by append/dynamic-overwrite-of-new-partitions.
  *
  * Scale: the driver handles file NAMES only (listing + set diff —
  * same cost class as the batch file index); all row work is the
  * ordinary pruned batch reader over the batch's file subset.
  */
private[sources] final class GraftTableMicroBatchStream(
    template: FileScan, checkpointLocation: String,
    // readStream.option("maxFilesPerTrigger"/"maxBytesPerTrigger"):
    // the source's default admission limits — without one, a backfill
    // of a 100 TB table would arrive as ONE micro-batch
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    // the source is APPEND-ONLY: merge-on-read deletion vectors are
    // invisible to it (deleted rows in already-delivered files cannot
    // be retracted, and rows of a vectored file discovered later would
    // deliver undeleted). A table with live vectors therefore REFUSES
    // to stream unless the operator opts in with
    // readStream.option("ignoreDeletes", true) — the Delta contract.
    ignoreDeletes: Boolean = false,
    // RENAME COLUMN aliases: the raw per-batch reads bypass the alias
    // merge, so a renamed projection would null pre-rename files
    renameAliases: Map[String, Seq[String]] = Map.empty)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset, ReadLimit, ReadMaxFiles}

  private def spark: SparkSession = SparkSession.active
  private val tableRoot: Path = template.fileIndex match {
    // an evolved index's roots are its leaf FILES — the table dir is
    // carried explicitly (r13 item 3)
    case ev: GraftEvolved.EvolvedFileIndex => ev.tableDir
    case other => other.rootPaths.head
  }
  private val fs: FileSystem =
    tableRoot.getFileSystem(spark.sessionState.newHadoopConf())
  private val logDir = new Path(checkpointLocation, "graft-file-log")

  private case class FileBatchOffset(batchId: Long) extends Offset {
    override def json(): String = s"""{"batchId":$batchId}"""
  }

  private var loaded = false
  private val entries = scala.collection.mutable.TreeMap[Long, Seq[String]]()
  private val seen = scala.collection.mutable.HashSet[String]()

  private def loadLog(): Unit = if (!loaded) {
    if (fs.exists(logDir)) fs.listStatus(logDir).foreach { st =>
      val id = try st.getPath.getName.toLong catch {
        case _: NumberFormatException => -1L
      }
      if (id >= 0) {
        val in = fs.open(st.getPath)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList finally in.close()
        val files = lines.filter(_.nonEmpty)
        entries(id) = files
        seen ++= files
      }
    }
    loaded = true
  }

  private def maxBatch: Long = entries.keySet.lastOption.getOrElse(-1L)

  private def listDataFiles(p: Path): Seq[String] =
    listDataFilesWithLen(p).map(_._1)

  private def listDataFilesWithLen(p: Path): Seq[(String, Long)] =
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (st.isDirectory) listDataFilesWithLen(st.getPath)
      else Seq((fs.makeQualified(st.getPath).toString, st.getLen))
    }

  override def initialOffset(): Offset = FileBatchOffset(-1L)

  override def deserializeOffset(json: String): Offset =
    FileBatchOffset(""""batchId"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")))

  // ---- admission control (maxFilesPerTrigger / Trigger.AvailableNow) ----
  // Scale rationale: micro-batch size must be an OPERATOR choice, not
  // a function of how far behind the stream is — catching up on a year
  // of appends (or bootstrapping from a full table) proceeds in
  // bounded batches instead of one cluster-melting mega-batch. This is
  // FileStreamSource's admission contract on the catalog source.

  /** AvailableNow: the run is bounded to files visible at start —
    * files appended DURING the run are excluded, so the query drains
    * and stops (Spark keeps triggering until the offset stops moving).
    */
  @volatile private var availableNowSnapshot: Option[Set[String]] = None

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    loadLog()
    availableNowSnapshot =
      Some(seen.toSet ++ listDataFiles(tableRoot))
  }

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Nil => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  private def maxFilesOf(limit: ReadLimit): Option[Int] = limit match {
    case mf: ReadMaxFiles => Some(mf.maxFiles())
    case c: CompositeReadLimit =>
      val ns = c.getReadLimits.toSeq.flatMap(maxFilesOf)
      if (ns.isEmpty) None else Some(ns.min)
    case _ => None
  }

  private def maxBytesOf(limit: ReadLimit): Option[Long] = limit match {
    case mb: org.apache.spark.sql.connector.read.streaming.ReadMaxBytes =>
      Some(mb.maxBytes())
    case c: CompositeReadLimit =>
      val ns = c.getReadLimits.toSeq.flatMap(maxBytesOf)
      if (ns.isEmpty) None else Some(ns.min)
    case _ => None
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    synchronized {
      loadLog()
      require(renameAliases.isEmpty ||
        !template.readDataSchema.fields.exists(f =>
          renameAliases.contains(f.name.toLowerCase)),
        s"$tableRoot streams a RENAMED column whose pre-rename files " +
          "are not yet materialized — CALL system.compact first")
      // per-trigger, so a vector landing MID-stream is caught too
      if (!ignoreDeletes &&
          (GraftDv.hasAny(fs, tableRoot) || GraftEqDel.hasAny(fs, tableRoot)))
        throw new IllegalStateException(
          s"$tableRoot has live merge-on-read deletion vectors or " +
            "equality deletes: this append-only stream cannot retract " +
            "deleted rows. Either materialize them (CALL " +
            "system.rewrite_deletes) or opt in with " +
            "readStream.option(\"ignoreDeletes\", true)")
      var freshSized = listDataFilesWithLen(tableRoot)
        .filterNot { case (p, _) => seen(p) }
      availableNowSnapshot.foreach(snap =>
        freshSized = freshSized.filter { case (p, _) => snap.contains(p) })
      val fresh: Seq[String] =
        (maxFilesOf(limit), maxBytesOf(limit)) match {
          case (None, None) => freshSized.map(_._1)
          case (mf, mb) =>
            // FileStreamSource semantics: stop once either budget is
            // spent, but always admit at least one file (a single file
            // over the byte budget must not livelock the stream)
            var bytes = 0L
            var cnt = 0
            freshSized.takeWhile { case (_, len) =>
              val admit = cnt == 0 ||
                (mf.forall(cnt < _) && mb.forall(bytes + len <= _))
              if (admit) { cnt += 1; bytes += len }
              admit
            }.map(_._1)
        }
      if (fresh.nonEmpty) {
        val next = maxBatch + 1
        fs.mkdirs(logDir)
        val out = fs.create(new Path(logDir, next.toString), true)
        try out.write((fresh.mkString("\n") + "\n").getBytes("UTF-8"))
        finally out.close()
        entries(next) = fresh
        seen ++= fresh
      }
      FileBatchOffset(maxBatch)
    }

  /** Informational (progress reporting): the newest BATCHED offset —
    * must not admit new files, so it cannot list-and-log.
    */
  override def reportLatestOffset(): Offset = synchronized {
    loadLog(); FileBatchOffset(maxBatch)
  }

  override def latestOffset(): Offset =
    latestOffset(initialOffset(), ReadLimit.allAvailable())

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[org.apache.spark.sql.connector.read.InputPartition] = synchronized {
    loadLog()
    val s = start.asInstanceOf[FileBatchOffset].batchId
    val e = end.asInstanceOf[FileBatchOffset].batchId
    val files = entries.range(s + 1, e + 1).values.flatten.toSeq
    if (files.isEmpty) Array.empty
    else {
      // the batch's files behind a fresh index (basePath keeps hive
      // partition inference rooted at the TABLE, not the file dirs);
      // everything else — pruned schemas, pushed filters — is the
      // template scan's, so the shared reader factory applies
      val idx = template.fileIndex match {
        case ev: GraftEvolved.EvolvedFileIndex =>
          // evolved tables replan with the era-aware index (plain
          // inference refuses the mixed depths)
          GraftEvolved.buildIndex(spark, ev.tableDir, ev.anchorSchema,
            ev.evolvedSchema,
            Some(files.map(f => fs.getFileStatus(new Path(f)))))
        case _ =>
          new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
            spark, files.map(new Path(_)),
            Map("basePath" -> tableRoot.toString),
            Some(StructType(template.dataSchema.fields ++
              template.fileIndex.partitionSchema.fields)))
      }
      GraftScanFilters.withFileIndex(template, idx)
        .toBatch.planInputPartitions()
    }
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    // snapshot-isolation fallback (r12 item 2): an exactly-once replay
    // of a LOGGED batch whose files a compaction tombstoned in between
    // re-reads the same bytes from the `.__retired` area instead of
    // failing the restarted query
    new GraftRetired.FallbackReaderFactory(
      template.toBatch.createReaderFactory(), tableRoot.toString,
      new GraftPartitionedCow.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Partitioned copy-on-write replacement write: the distributed write
  * that Spark's v2 file writes lack — rows land in the hive directory
  * layout (partition values become directories, partition columns are
  * NOT stored in the files, matching the dynamic-partition writer), so
  * a partitioned catalog table's SQL `MERGE INTO` / `UPDATE` / `DELETE`
  * rewrites only its touched partitions.
  *
  * Protocol (same crash contract as the flat [[GraftTable]] path):
  *  1. tasks write DOT-PREFIXED files directly inside the target
  *     partition directories — invisible to every reader (file indexes
  *     skip `.`/`_` names), so a crash mid-job leaves the live table
  *     byte-identical;
  *  2. driver commit renames each staged file to its visible name
  *     (atomic per file, same directory), then deletes the superseded
  *     generation's files WITHIN THE SCANNED PARTITIONS only, then
  *     prunes partition directories the deletion emptied (a fully-
  *     deleted partition disappears instead of resurrecting as an
  *     empty dir);
  *  3. abort deletes the staged files.
  * A crash between publish and retirement leaves duplicate rows —
  * visible, repairable, never silent loss.
  *
  * Scale: the write declares `RequiresDistributionAndOrdering`
  * clustering on the partition columns, so Spark shuffles replacement
  * rows once and each task holds a handful of open writers instead of
  * every task writing a sliver of every partition — the small-files
  * story at 1000 executors. All row work is task-side; the driver
  * does rename/delete bookkeeping proportional to file count in the
  * touched partitions.
  */
private[graft] object GraftPartitionedCow {

  /** Test seam: invoked inside the commit critical section, after the
    * new generation published and before the superseded one retires —
    * the exact window a concurrent reader used to double-count (the
    * journal-pinned scan spec stalls here while a reader plans).
    */
  private[graft] var onBetweenPublishAndRetire: String => Unit = _ => ()

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.SortOrder
  import org.apache.spark.sql.connector.write.{DataWriter, RequiresDistributionAndOrdering}
  import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
  import org.apache.spark.sql.types.{BooleanType, ByteType, IntegerType, LongType, ShortType, StringType}

  /** Partition-value types whose directory rendering is unambiguous and
    * identical to the dynamic-partition writer's (`String.valueOf` for
    * integrals/booleans, ISO `yyyy-MM-dd` for dates, the raw string
    * otherwise — escaping applied by `getPartitionPathString`).
    */
  def dirRenderable(dt: DataType): Boolean = dt match {
    case _: StringType | IntegerType | LongType | ShortType | ByteType |
         BooleanType | org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  /** Raw directory-value rendering for a (possibly catalyst-internal)
    * partition value of a [[dirRenderable]] type. Dates arrive as epoch
    * days internally (Integer) or `java.sql.Date` externally — both
    * render to the ISO form Spark's dynamic-partition writer uses.
    * NULL stays null (getPartitionPathString maps it to the hive
    * default partition).
    */
  def renderRaw(value: Any, dt: DataType): String = value match {
    case null => null
    case i: java.lang.Integer
      if dt == org.apache.spark.sql.types.DateType =>
      java.time.LocalDate.ofEpochDay(i.longValue()).toString
    case d: java.sql.Date => d.toLocalDate.toString
    case v => v.toString
  }

  /** Directory token for predicate translation: None when the value
    * cannot prune/retire safely — NULL and empty strings fold into
    * `__HIVE_DEFAULT_PARTITION__` on the write side (a directory shared
    * with other values, so an equality can never own it), and
    * non-[[dirRenderable]] types render ambiguously.
    */
  def dirToken(value: Any, dt: DataType): Option[String] =
    if (!dirRenderable(dt)) None
    else Option(renderRaw(value, dt)).filter(_.nonEmpty)

  /** A raw directory token back to the EXTERNAL (Row-API) value — for
    * typed `isin` filters built through the public DataFrame API, where
    * catalyst-internal values (UTF8String, epoch-day ints) don't apply.
    */
  def externalToken(tok: String, dt: DataType): Any = {
    import org.apache.spark.sql.types._
    dt match {
      case _: StringType => tok
      case IntegerType => tok.toInt
      case LongType => tok.toLong
      case ShortType => tok.toShort
      case ByteType => tok.toByte
      case BooleanType => tok.toBoolean
      case DateType => java.sql.Date.valueOf(tok)
      case other => throw new IllegalArgumentException(
        s"unfilterable partition type $other")
    }
  }

  /** Inverse of the directory rendering: a `col=token` directory-name
    * token back to the catalyst-internal partition value (the hive
    * default partition reads as NULL).
    */
  def parseToken(tok: String, dt: DataType): Any = {
    import org.apache.spark.sql.types._
    if (tok == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .DEFAULT_PARTITION_NAME) null
    else {
      val un = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(tok)
      dt match {
        case _: StringType =>
          org.apache.spark.unsafe.types.UTF8String.fromString(un)
        case IntegerType => un.toInt
        case LongType => un.toLong
        case ShortType => un.toShort
        case ByteType => un.toByte
        case BooleanType => un.toBoolean
        case DateType => java.time.LocalDate.parse(un).toEpochDay.toInt
        case other => throw new IllegalArgumentException(
          s"unparseable partition type $other")
      }
    }
  }

  /** Mirrors [[graft.runtime.Catalog]]'s writeOptions so COW-written
    * files are indistinguishable from engine-appended ones.
    */
  private def writeOptions(format: String): Map[String, String] = format match {
    case "csv" => Map("header" -> "true", "compression" -> "gzip")
    case "json" => Map("compression" -> "gzip")
    case _ => Map("compression" -> "snappy")
  }

  private def fileFormat(format: String)
      : org.apache.spark.sql.execution.datasources.FileFormat = format match {
    case "parquet" =>
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
    case "orc" => new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat()
    case "csv" => new org.apache.spark.sql.execution.datasources.csv.CSVFileFormat()
    case "json" => new org.apache.spark.sql.execution.datasources.json.JsonFileFormat()
    case other => throw new IllegalStateException(s"unreachable format $other")
  }

  /** Hadoop Configuration is not Serializable; ship it the way Spark
    * does internally (write/readFields), without reaching into
    * private[spark] helpers.
    */
  private[sources] final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  private[sources] final case class CowTaskFiles(
      files: Seq[(String, String, Long)],
      // writer-accumulated per-file Bloom filters (r12 item 5), keyed
      // by FINAL path: (column lower-name, kind, serialized filter).
      // Empty when the table declares no bloom_columns.
      blooms: Map[String, Seq[(String, Char, Array[Byte])]] = Map.empty,
      // writer-accumulated per-file NDV HLL registers (r13 item 4),
      // keyed by FINAL path: (column lower-name, kind, registers).
      // Empty when the table declares no ndv_columns.
      ndvs: Map[String, Seq[(String, Char, Array[Int])]] = Map.empty)
    extends WriterCommitMessage // (staged dot-path, final path, row count)

  /** What the task writer needs to maintain filters as rows stream
    * through: bloom column (lower-name, kind) pairs, the fpp, and the
    * per-file expected-row sizing (writer-side filters are sized by
    * this estimate, not the exact count the re-read path uses —
    * over-sizing only lowers the fpp, under-sizing only raises it;
    * correctness is unconditional).
    */
  private[sources] final case class WriterBloomSpec(
      cols: Seq[(String, Char)], fpp: Double, expectedRows: Long)

  /** Writer-side NDV maintenance (r13 item 4): the columns whose HLL
    * registers the task writers accumulate as rows stream through.
    * Values hash as the SAME rendered token the analyze data pass
    * produces (external-Row `toString`), so shipped and rebuilt
    * registers are byte-identical.
    */
  private[sources] final case class WriterNdvSpec(cols: Seq[String])

  /** Driver-side write preparation shared by the batch and streaming
    * factories: the format's OutputWriterFactory over the FILE schema
    * (data columns minus partition columns — hive layout stores
    * partition values in directory names only), plus the serialized
    * hadoop conf and the partition-field extraction plan.
    */
  private[sources] final case class Prepared(
      owf: OutputWriterFactory, conf: SerializableHadoopConf,
      fileSchema: StructType, fileFieldIdx: Seq[Int],
      partFields: Seq[(String, Int, DataType)],
      bucketField: Option[(Int, Int)]) // (numBuckets, index in dataSchema)

  /** Table-dir-aware prepare: reads the sidecar's evolved partition
    * columns (r13 item 3) so they stay IN the data files while still
    * driving directory layout — the invariant that lets pre-evolution
    * files (which carry them as data) and post-evolution files read
    * identically. Non-evolved tables behave exactly as before.
    */
  private[sources] def prepare(spark: SparkSession, format: String,
      dataSchema: StructType, partitionCols: Seq[String],
      bucketSpec: Option[(Int, String)], dir: String): Prepared = {
    val dirP = new Path(dir)
    val keep = GraftTableMeta
      .read(dirP.getFileSystem(spark.sparkContext.hadoopConfiguration), dirP)
      .evolvedCols.map(_.toLowerCase).toSet
    prepare(spark, format, dataSchema, partitionCols, bucketSpec, keep)
  }

  private[sources] def prepare(spark: SparkSession, format: String,
      dataSchema: StructType, partitionCols: Seq[String],
      bucketSpec: Option[(Int, String)] = None,
      keepInData: Set[String] = Set.empty): Prepared = {
    val fileFields = dataSchema.fields.zipWithIndex.filterNot {
      case (f, _) => partitionCols.exists(_.equalsIgnoreCase(f.name)) &&
        !keepInData.contains(f.name.toLowerCase)
    }
    val fileSchema = StructType(fileFields.map(_._1))
    val partFields = partitionCols.map { c =>
      // a hidden-partitioning transform ([[GraftTransforms]]) indexes
      // its SOURCE column; the writer derives the directory token
      val src = GraftTransforms.parseOpt(c).map(_.source).getOrElse(c)
      val i = dataSchema.fields.indexWhere(_.name.equalsIgnoreCase(src))
      require(i >= 0, s"partition column $c not in write schema")
      (c, i, dataSchema.fields(i).dataType)
    }
    // the bucket column stays a DATA column (stored in files, unlike
    // partition columns) — only its index is needed for assignment
    val bucketField = bucketSpec.map { case (nb, c) =>
      val i = dataSchema.fields.indexWhere(_.name.equalsIgnoreCase(c))
      require(i >= 0, s"bucket column $c not in write schema")
      require(GraftBucket.keyType(dataSchema.fields(i).dataType),
        s"bucket column $c: unsupported key type")
      (nb, i)
    }
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(spark.sessionState.newHadoopConf())
    val owf = fileFormat(format)
      .prepareWrite(spark, job, writeOptions(format), fileSchema)
    Prepared(owf, new SerializableHadoopConf(job.getConfiguration),
      fileSchema, fileFields.map(_._2).toSeq, partFields, bucketField)
  }

  /** Exactly-once streaming append (`df.writeStream.toTable(...)`):
    * tasks stage invisibly like every write here; `commit(epochId)` is
    * idempotent at two levels:
    *  1. an EPOCH MARKER (`_graft_stream_commits/<query>/<epoch>`,
    *     underscore-invisible to scans, created after publish) makes a
    *     re-delivered epoch a declared no-op — Spark re-runs an epoch
    *     whose sink committed but whose checkpoint log write was lost,
    *     the classic at-least-once window;
    *  2. inside the publish itself, final file names are DETERMINISTIC
    *     per (query, epoch, task partition, partition dir), so a crash
    *     BETWEEN renames re-converges file-by-file on re-execution — a
    *     staged file whose final name already exists is dropped, not
    *     published twice. The two levels together close both duplicate
    *     windows a directory store has (no atomic multi-file commit).
    *
    * The re-planned-epoch window (r10 ADVICE) is CLOSED by a per-epoch
    * MANIFEST: before the first publish rename, the commit writes the
    * complete list of final names this attempt will make visible
    * (`_graft_stream_commits/<query>/<epoch>.manifest`). A re-executed
    * epoch that finds a manifest but no marker is retrying after a
    * mid-publish crash: it first deletes every file the crashed
    * attempt may have published (the manifest IS that set — written
    * before any rename, so it is always complete), then publishes its
    * own files. A restart that re-plans the epoch with different
    * parallelism or row routing therefore converges to exactly the new
    * attempt's rows — no orphaned cells from the old shape survive.
    * The marker supersedes the manifest (deleted after the marker
    * lands); a crash between marker and manifest-delete is harmless —
    * the next delivery sees the marker first and declines.
    *
    * Scale: manifest + marker are two tiny driver writes per epoch;
    * publish is one rename per written file; no row ever touches the
    * driver.
    */
  final class StreamingAppendWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, partitionCols: Seq[String], queryId: String,
      bucketSpec: Option[(Int, String)] = None)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

    private val queryTag =
      f"${scala.util.hashing.MurmurHash3.stringHash(queryId)}%08x"
    private def markerDir = new Path(dir, s"_graft_stream_commits/$queryTag")
    private def marker(epochId: Long) = new Path(markerDir, epochId.toString)
    private def manifest(epochId: Long) =
      new Path(markerDir, s"$epochId.manifest")

    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
      val p = prepare(spark, format, dataSchema, partitionCols, bucketSpec, dir)
      StreamingHiveWriterFactory(p.owf, p.conf, dir, dataSchema,
        p.fileSchema, p.fileFieldIdx, p.partFields, p.bucketField, queryTag,
        checks = GraftCheck.boundFor(spark,
          spark.sparkContext.hadoopConfiguration, dir, dataSchema))
    }

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(marker(epochId))) {
        // duplicate epoch delivery: the data is already live — drop the
        // re-execution's staged files and decline
        abort(epochId, messages)
      } else GraftCommitLock.withLock(fs, new Path(dir),
          s"stream-append:$queryTag:e$epochId") {
        GraftEqDel.requireNone(fs, new Path(dir), "an append-mode stream epoch")
        // a manifest without a marker = a prior attempt of THIS epoch
        // crashed mid-publish; retract whatever it made visible (the
        // manifest is complete by construction — written before its
        // first rename) so a re-planned attempt can't leave duplicates
        val mf = manifest(epochId)
        if (fs.exists(mf)) {
          val in = fs.open(mf)
          val prior = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toList finally in.close()
          prior.filter(_.nonEmpty).foreach { p =>
            try fs.delete(new Path(p), false)
            catch { case scala.util.control.NonFatal(_) => () }
          }
        }
        // manifest BEFORE the first rename
        val finals = messages.collect {
          case CowTaskFiles(files, _, _) => files.map(_._2)
        }.flatten
        fs.mkdirs(markerDir)
        val out = fs.create(mf, true)
        try out.write(finals.mkString("\n").getBytes("UTF-8"))
        finally out.close()
        messages.foreach {
          case CowTaskFiles(files, _, _) => files.foreach { case (staged, fin, _) =>
            val finP = new Path(fin)
            if (fs.exists(finP)) fs.delete(new Path(staged), false)
            else require(fs.rename(new Path(staged), finP),
              s"stream commit: could not publish $staged -> $fin")
          }
          case _ => ()
        }
        val mk = fs.create(marker(epochId), true)
        mk.close()
        fs.delete(mf, false) // superseded by the marker
        // one monotonic feed axis with batch DML (r15 item 2): the
        // epoch journals as a stream_epoch record under this same
        // lock, AFTER the marker (the commit point) so a crashed
        // attempt never journals — a crash between marker and record
        // degrades to the loud unjournaled-emission feed refusal
        GraftCommits.tryRecord(fs, new Path(dir),
          GraftCommits.StreamEpochKind,
          adds = finals.map(f =>
            GraftCommits.relOf(fs, new Path(dir), new Path(f))),
          note = s"$queryTag:$epochId")
      }
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      messages.foreach {
        case CowTaskFiles(files, _, _) => files.foreach { case (staged, _, _) =>
          try fs.delete(new Path(staged), false)
          catch { case _: Throwable => () }
        }
        case _ => ()
      }
    }
  }

  /** Data files under a table/partition root (dot/underscore names and
    * internal directories excluded) — the commit-time listing the
    * streaming replace retires against.
    */
  private def listVisibleFiles(fs: FileSystem, p: Path): Seq[Path] =
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (st.isDirectory) listVisibleFiles(fs, st.getPath)
      else Seq(st.getPath)
    }

  /** COMPLETE-output-mode streaming sink (`writeStream.outputMode
    * ("complete").toTable(...)`): each epoch's emitted state REPLACES
    * the whole table — the continuously-refreshed mart/dimension shape
    * (a streaming aggregate without watermark re-emits every group per
    * epoch; landing it as a full refresh is exactly Iceberg's
    * replace-per-commit). Round 10 refused this mode with a
    * foreachBatch pointer; this closes the gap engine-side.
    *
    * Per-epoch protocol (one write instance lives across ALL epochs, so
    * the superseded generation is listed at COMMIT time, never cached):
    *  1. tasks stage dot-prefixed files with the deterministic
    *     streaming names (`part-s<query>-e<epoch>-...`);
    *  2. `commit(e)`: a pre-existing epoch marker declares a duplicate
    *     delivery a no-op. Otherwise: list the CURRENT visible files,
    *     EXCLUDING any that already carry this (query, epoch) name tag
    *     — those are a crashed prior attempt's partial publish, which
    *     the deterministic names let this attempt complete rather than
    *     duplicate or destroy; publish the staged files (an
    *     already-present final name drops its staged copy); retire the
    *     listing; prune emptied partition directories (a group absent
    *     from the new state disappears); write the marker.
    * A crash between publish and retire leaves duplicate rows —
    * visible, repairable, never silent loss: the same contract as every
    * write here. Version retention does NOT apply (a per-epoch archive
    * would churn the whole retention window every trigger; snapshot via
    * batch INSERT OVERWRITE when a durable version is wanted).
    */
  final class StreamingReplaceWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, partitionCols: Seq[String], queryId: String,
      bucketSpec: Option[(Int, String)] = None)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

    private val queryTag =
      f"${scala.util.hashing.MurmurHash3.stringHash(queryId)}%08x"
    private def markerDir = new Path(dir, s"_graft_stream_commits/$queryTag")
    private def marker(epochId: Long) = new Path(markerDir, s"r$epochId")

    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
      val p = prepare(spark, format, dataSchema, partitionCols, bucketSpec, dir)
      StreamingHiveWriterFactory(p.owf, p.conf, dir, dataSchema,
        p.fileSchema, p.fileFieldIdx, p.partFields, p.bucketField, queryTag,
        checks = GraftCheck.boundFor(spark,
          spark.sparkContext.hadoopConfiguration, dir, dataSchema))
    }

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(marker(epochId))) {
        abort(epochId, messages)
      } else GraftCommitLock.withLock(fs, new Path(dir),
          s"stream-replace:$queryTag:e$epochId") {
        val thisEpochTag = s"-s$queryTag-e$epochId-"
        val old = listVisibleFiles(fs, new Path(dir))
          .filterNot(_.getName.contains(thisEpochTag))
        messages.foreach {
          case CowTaskFiles(files, _, _) => files.foreach { case (staged, fin, _) =>
            val finP = new Path(fin)
            if (fs.exists(finP)) fs.delete(new Path(staged), false)
            else require(fs.rename(new Path(staged), finP),
              s"stream replace commit: could not publish $staged -> $fin")
          }
          case _ => ()
        }
        old.foreach(fs.delete(_, false))
        // a complete refresh replaces every row: deletion vectors and
        // equality deletes of the retired generation are inert
        GraftDv.dropAll(fs, new Path(dir))
        GraftEqDel.clearAll(fs, new Path(dir))
        // prune partition dirs the refresh emptied
        val base = new Path(dir)
        old.map(_.getParent).distinct.foreach { p0 =>
          var d = p0
          while (d != null && d != base && d.getName.contains("=") &&
              fs.exists(d) && fs.listStatus(d).isEmpty) {
            fs.delete(d, false)
            d = d.getParent
          }
        }
        fs.mkdirs(markerDir)
        val out = fs.create(marker(epochId), true)
        out.close()
      }
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      messages.foreach {
        case CowTaskFiles(files, _, _) => files.foreach { case (staged, _, _) =>
          try fs.delete(new Path(staged), false)
          catch { case _: Throwable => () }
        }
        case _ => ()
      }
    }
  }

  /** UPDATE-output-mode streaming sink (r11 item 4): per-epoch KEYED
    * UPSERT into a catalog table — the streaming face of the engine's
    * MERGE/copy-on-write machinery, and the shape a continuously
    * maintained mart table actually wants (Append accretes rows,
    * Complete rebuilds the world; Update lands exactly the CHANGED
    * keys). Activated by the `upsertKeys` writeStream option (the
    * builder then also declares SupportsStreamingUpdateAsAppend, which
    * is what lets Spark admit `outputMode("update")` into a v2 sink);
    * without the option, Update mode stays refused at query start.
    *
    * Per-epoch protocol:
    *  1. tasks stage the epoch's rows as ordinary files in a HIDDEN
    *     side directory (`_graft_stream_commits/<query>/upsert-stage`)
    *     — invisible to every table scan, deterministic per-epoch
    *     final names (same crash re-convergence as the append sink);
    *  2. `commit(e)`: a pre-existing epoch marker declares a duplicate
    *     delivery a no-op. Otherwise the staged files converge to
    *     their final names, and ONE SQL `MERGE INTO target USING
    *     stage ON <null-safe key equality> WHEN MATCHED UPDATE SET *
    *     WHEN NOT MATCHED INSERT *` applies the epoch — the exact
    *     batch MERGE path (COW rewrite, leaf narrowing, bucket
    *     preservation, commit lock), so streaming and batch upserts
    *     cannot disagree; then the stage files are deleted and the
    *     marker lands.
    * A re-delivered epoch after a crash BEFORE the marker re-runs the
    * same MERGE with the same rows — convergent (matched rows update
    * to identical values). A crash in the middle of the MERGE's own
    * commit inherits the house publish/retire contract (duplicates
    * possible, visible, repairable, never silent loss).
    *
    * Requirements: at most one row per key per epoch (a streaming
    * aggregate in Update mode emits each changed group once — the
    * intended producer); the query schema must cover the target's
    * columns (UPDATE SET * / INSERT *).
    *
    * Scale: the epoch's rows are a distributed stage write + one
    * key-joined COW rewrite bounded by the touched partitions; the
    * driver handles file names and the marker only.
    */
  final class StreamingUpsertWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, targetIdent: String, keys: Seq[String], queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

    require(keys.nonEmpty, "streaming upsert needs upsertKeys")
    keys.foreach(k => require(
      dataSchema.fields.exists(_.name.equalsIgnoreCase(k)),
      s"upsert key $k is not in the streaming query's schema " +
        s"(${dataSchema.fieldNames.mkString(", ")})"))

    private val queryTag =
      f"${scala.util.hashing.MurmurHash3.stringHash(queryId)}%08x"
    private def markerDir = new Path(dir, s"_graft_stream_commits/$queryTag")
    private def marker(epochId: Long) = new Path(markerDir, s"u$epochId")
    private def stageDir = new Path(markerDir, "upsert-stage")

    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
      val p = prepare(spark, format, dataSchema, Nil)
      StreamingHiveWriterFactory(p.owf, p.conf, stageDir.toString,
        dataSchema, p.fileSchema, p.fileFieldIdx, p.partFields,
        p.bucketField, queryTag)
    }

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(marker(epochId))) {
        abort(epochId, messages)
      } else {
        GraftEqDel.requireNone(fs, new Path(dir),
          "a merge-mode streaming upsert epoch")
        // converge staged → deterministic final names inside the stage
        // (an already-present final from a crashed attempt wins)
        messages.foreach {
          case CowTaskFiles(files, _, _) => files.foreach { case (staged, fin, _) =>
            val finP = new Path(fin)
            if (fs.exists(finP)) fs.delete(new Path(staged), false)
            else require(fs.rename(new Path(staged), finP),
              s"stream upsert commit: could not stage $staged -> $fin")
          }
          case _ => ()
        }
        // THIS epoch's final stage files (a crashed prior attempt's
        // finals are included — deterministic names make this exact)
        val tag = s"-s$queryTag-e$epochId-"
        val finals =
          if (!fs.exists(stageDir)) Nil
          else fs.listStatus(stageDir).toSeq.map(_.getPath)
            .filter(p => !p.getName.startsWith(".") &&
              p.getName.contains(tag))
        if (finals.nonEmpty) {
          val src = spark.read.format(format).schema(dataSchema)
            .load(finals.map(_.toString): _*)
          val view = s"g_upsert_${queryTag}_src"
          src.createOrReplaceTempView(view)
          try {
            val cond = keys.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
            spark.sql(s"MERGE INTO $targetIdent t USING $view s ON $cond " +
              "WHEN MATCHED THEN UPDATE SET * " +
              "WHEN NOT MATCHED THEN INSERT *")
          } finally spark.catalog.dropTempView(view)
        }
        finals.foreach(fs.delete(_, false))
        fs.mkdirs(markerDir)
        fs.create(marker(epochId), true).close()
      }
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      messages.foreach {
        case CowTaskFiles(files, _, _) => files.foreach { case (staged, _, _) =>
          try fs.delete(new Path(staged), false)
          catch { case _: Throwable => () }
        }
        case _ => ()
      }
    }
  }

  /** EQUALITY-delete streaming upsert (r12 item 6 — Iceberg v2
    * equality deletes; see [[GraftEqDel]]): the
    * `upsertMode=equality` face of the Update-output-mode sink. Where
    * [[StreamingUpsertWrite]] lands each epoch as a real `MERGE INTO`
    * (paying a positional scan of the TARGET per epoch), this sink's
    * epoch writes only (a) the epoch's rows as ordinary appended files
    * with the deterministic streaming names — their `-e<epoch>-` tag
    * IS their equality-delete epoch floor — and (b) one sidecar
    * holding the epoch's distinct key tuples. NO job ever touches the
    * table: per-epoch cost is the epoch, not the table.
    *
    * Idempotence mirrors [[StreamingAppendWrite]]: epoch marker,
    * retraction manifest written before the first publish, and
    * deterministic final names — a kill/restart re-delivers the epoch,
    * retracts any partial publish, and converges (the sidecar write is
    * an atomic overwrite keyed by (query, epoch), so it converges
    * too). The sidecar lands AFTER the rows: the worst crash window
    * shows a key's old AND new row (visible duplicate, repaired by
    * re-delivery) — never a silently lost row.
    */
  final class StreamingEqUpsertWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, partitionCols: Seq[String],
      bucketSpec: Option[(Int, String)], keys: Seq[String], queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

    require(format == "parquet",
      s"equality-mode upsert requires parquet; format is $format")
    require(keys.nonEmpty, "streaming upsert needs upsertKeys")
    private val keyFields = keys.map { k =>
      val f = dataSchema.fields.find(_.name.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"upsert key $k is not in the streaming query's schema " +
            s"(${dataSchema.fieldNames.mkString(", ")})"))
      require(!partitionCols.exists(_.equalsIgnoreCase(k)),
        s"equality-mode upsert key $k is a partition column — keys must " +
          "be data columns (their values live in the files the deletes " +
          "are tested against)")
      val kind = GraftBloom.kindOf(f.dataType).getOrElse(
        throw new IllegalArgumentException(
          s"equality-mode upsert key $k: type ${f.dataType.simpleString} " +
            "unsupported (integral and string keys only)"))
      (f.name, kind)
    }

    private val queryTag =
      f"${scala.util.hashing.MurmurHash3.stringHash(queryId)}%08x"
    private def markerDir = new Path(dir, s"_graft_stream_commits/$queryTag")
    private def marker(epochId: Long) = new Path(markerDir, s"q$epochId")
    private def manifest(epochId: Long) =
      new Path(markerDir, s"q$epochId.manifest")

    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
      val p = prepare(spark, format, dataSchema, partitionCols, bucketSpec, dir)
      StreamingHiveWriterFactory(p.owf, p.conf, dir, dataSchema,
        p.fileSchema, p.fileFieldIdx, p.partFields, p.bucketField, queryTag,
        checks = GraftCheck.boundFor(spark,
          spark.sparkContext.hadoopConfiguration, dir, dataSchema))
    }

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(marker(epochId))) {
        abort(epochId, messages)
        // a crash AFTER the marker but BEFORE the policy check must
        // still honor the rewrite threshold on re-delivery — the
        // policy is state-driven, so re-checking here converges
        GraftMaintenance.afterCommit(spark, fs, new Path(dir))
        return
      }
      // single-writer contract: refuse over positional vectors or a
      // DIFFERENT stream's sidecars — epoch floors only order within
      // one query tag
      require(!GraftDv.hasAny(fs, new Path(dir)),
        s"$dir has live merge-on-read deletion vectors: CALL " +
          "system.rewrite_deletes before running an equality-mode upsert")
      val foreign = GraftEqDel.list(fs, new Path(dir))
        .map(GraftEqDel.read(fs, _)).find(_.tag != queryTag)
      require(foreign.isEmpty,
        s"$dir carries equality deletes from another stream " +
          s"(${foreign.map(_.tag).getOrElse("")}): CALL " +
          "system.rewrite_deletes before starting a new upsert stream")
      GraftCommitLock.withLock(fs, new Path(dir),
          s"stream-equpsert:$queryTag:e$epochId") {
        // retraction manifest (see StreamingAppendWrite): a prior
        // crashed attempt's partial publish is undone first
        val mf = manifest(epochId)
        if (fs.exists(mf)) {
          val in = fs.open(mf)
          val prior = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toList finally in.close()
          prior.filter(_.nonEmpty).foreach { p =>
            try fs.delete(new Path(p), false)
            catch { case scala.util.control.NonFatal(_) => () }
          }
        }
        val staged = messages.toSeq.flatMap {
          case CowTaskFiles(files, _, _) => files
          case _ => Nil
        }
        // manifest BEFORE the first publish
        fs.mkdirs(markerDir)
        val out = fs.create(mf, true)
        try out.write(staged.map(_._2).mkString("\n").getBytes("UTF-8"))
        finally out.close()
        staged.foreach { case (st, fin, _) =>
          val finP = new Path(fin)
          if (fs.exists(finP)) fs.delete(new Path(st), false)
          else require(fs.rename(new Path(st), finP),
            s"equality upsert commit: could not publish $st -> $fin")
        }
        // the epoch's DISTINCT keys, read from ITS OWN just-published
        // files — one epoch-bounded job; the table is never scanned.
        // (A crash before the sidecar lands is retracted by the
        // manifest on re-delivery, so reading post-publish is safe.)
        val keyTuples: Seq[Seq[Option[Any]]] =
          if (staged.isEmpty) Nil
          else {
            val p = prepare(spark, format, dataSchema, partitionCols,
              bucketSpec, dir)
            val src = spark.read.schema(p.fileSchema)
              .parquet(staged.map(_._2): _*)
            val maxKeys = spark.conf.getOption(GraftEqDel.MaxKeysConf)
              .map(_.toLong).getOrElse(GraftEqDel.MaxKeysDefault)
            val rows = src.select(keyFields.map(f =>
                org.apache.spark.sql.functions.col(f._1)): _*)
              .distinct().limit((maxKeys + 1).toInt).collect()
            require(rows.length <= maxKeys,
              s"epoch $epochId carries more than $maxKeys distinct keys " +
                s"(${GraftEqDel.MaxKeysConf}) — use upsertMode=merge")
            rows.toSeq.map { r =>
              keyFields.zipWithIndex.map { case ((_, kind), i) =>
                if (r.isNullAt(i)) None
                else Some(kind match {
                  case 'l' => r.get(i) match {
                    case b: Byte => b.toLong
                    case s: Short => s.toLong
                    case n: Int => n.toLong
                    case l: Long => l
                    case other => other.toString.toLong
                  }
                  case 's' => r.get(i).toString
                })
              }
            }
          }
        // the sidecar: older rows with these keys are now deleted
        GraftEqDel.write(fs, new Path(dir), GraftEqDel.EqDel(
          queryTag, epochId, keyFields.map(_._1), keyFields.map(_._2),
          keyTuples))
        fs.create(marker(epochId), true).close()
        fs.delete(mf, false)
        // one monotonic feed axis with batch DML (r15 item 2): see
        // [[StreamingAppendWrite]] — journaled after the marker under
        // this same lock
        GraftCommits.tryRecord(fs, new Path(dir),
          GraftCommits.StreamEpochKind,
          adds = staged.map(f =>
            GraftCommits.relOf(fs, new Path(dir), new Path(f._2))),
          note = s"$queryTag:$epochId")
        // floor-aware sidecar compaction (r13 item 5): dead sidecars
        // and subsumed keys shrink the read map at zero data cost —
        // still under this epoch's lock, so readers see an atomic
        // parity-preserving state
        GraftEqDel.compactSidecars(fs, new Path(dir))
      }
      // policy check OUTSIDE the epoch's lock (materialization locks
      // per published file itself): a table with
      // eqdel.rewrite_threshold set auto-materializes here, so the
      // stream never drives reads into the key-cap refusal
      GraftMaintenance.afterCommit(spark, fs, new Path(dir))
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      messages.foreach {
        case CowTaskFiles(files, _, _) => files.foreach { case (staged, _, _) =>
          try fs.delete(new Path(staged), false)
          catch { case _: Throwable => () }
        }
        case _ => ()
      }
    }
  }

  /** Shared hive-layout batch write: tasks stage dot-prefixed files in
    * the target partition directories, commit publishes by rename and
    * retires whatever [[retired]] selects. Subclasses choose the
    * retirement policy — that is the entire difference between a
    * copy-on-write replacement and a dynamic partition overwrite.
    */
  sealed abstract class HiveLayoutWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, partitionCols: Seq[String], oldFiles: Seq[Path],
      bucketSpec: Option[(Int, String)] = None)
    extends Write {

    /** Pre-existing files superseded by this write, given the final
      * (published) paths of the new generation's files. Both the
      * published paths and [[oldFiles]] arrive fully FileSystem-
      * qualified (`file:/...`), so parent/prefix comparisons are exact.
      */
    protected def retired(published: Seq[Path], fs: FileSystem): Seq[Path]
    /** Whether to prune partition directories the retirement emptied. */
    protected def pruneEmptied: Boolean
    /** How retired files leave the live table: TOMBSTONED by default —
      * renamed into the sibling `.__retired/<commit>/` area so a reader
      * that planned before this commit still finds its snapshot's bytes
      * ([[GraftRetired]], r12 item 2: never delete at commit). Physical
      * deletion is deferred to `CALL system.remove_orphans`. Full-replace
      * writes with version retention override this to MOVE files into
      * the version store instead (same reader-isolation property).
      */
    protected def retire(gone: Seq[Path], fs: FileSystem): Option[String] =
      GraftRetired.retireFiles(fs, new Path(dir), gone)
    /** Commit-journal kind recorded for this write ([[GraftCommits]]):
      * the feed position + file accounting batch change capture and
      * per-commit time travel derive from.
      */
    protected def journalKind: String
    /** Record annotation ([[GraftCommits.Rec.note]]): row-level writes
      * carry their originating command so the feed labels update pairs.
      */
    protected def journalNote: String = ""
    /** True when the write declared [[orderingOf]]: rows arrive grouped
      * by key, so the task writer runs in close-on-key-change mode (one
      * open columnar writer at a time).
      */
    protected def sortedInput: Boolean
    /** Copy-on-write replaces override this with the deletion-vector
      * fingerprint taken at write BUILD ([[GraftDv.fingerprint]]): a
      * merge-on-read DELETE landing between the operation's scan and
      * this commit changed rows the rewrite has already read — the
      * commit re-checks under the lock and the rewrite loses cleanly
      * rather than silently erasing the delete.
      */
    protected def dvConflictGuard: Option[Map[String, (Long, Long)]] = None

    /** Whether this write may commit while equality-delete sidecars
      * ([[GraftEqDel]]) are live. Only the full replace is — it
      * supersedes every row, so it clears (or version-archives) the
      * sidecars. Everything else cannot reason about epoch floors and
      * REFUSES with a pointer to rewrite_deletes.
      */
    protected def eqDeleteSafe: Boolean = false

    /** Writer-side bloom maintenance spec (r12 item 5): set by
      * [[GraftTable.withAutoAnalyze]] from the table's `bloom_columns`
      * properties before the write plans — the single chokepoint every
      * write passes through. None = no accumulation (the re-read
      * backstop maintains filters for such commits).
      */
    private[sources] var writerBloom: Option[WriterBloomSpec] = None

    /** Writer-side NDV maintenance spec (r13 item 4): same chokepoint,
      * HLL registers accumulated per open file.
      */
    private[sources] var writerNdv: Option[WriterNdvSpec] = None

    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory = {
        val p = prepare(spark, format, dataSchema, partitionCols, bucketSpec, dir)
        PartitionedCowWriterFactory(p.owf, p.conf, dir,
          dataSchema, p.fileSchema, p.fileFieldIdx, p.partFields,
          p.bucketField, sortedInput, writerBloom, writerNdv,
          checks = GraftCheck.boundFor(spark,
            spark.sparkContext.hadoopConfiguration, dir, dataSchema))
      }

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val fs = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // the whole publish/retire sequence is one commit critical
        // section under the table's commit lock: a second writer
        // (another replace, a streaming epoch) landing mid-commit
        // fails cleanly instead of interleaving (r11 item 6)
        GraftCommitLock.withLock(fs, new Path(dir), "hive-layout-write") {
        if (!eqDeleteSafe)
          GraftEqDel.requireNone(fs, new Path(dir), description())
        dvConflictGuard.foreach { before =>
          val now = GraftDv.fingerprint(fs, new Path(dir))
          if (now != before)
            throw new GraftCommitLock.ConcurrentCommitException(
              s"$dir: deletion vectors changed while this rewrite ran " +
                "(a merge-on-read DELETE committed in between); the " +
                "rewrite read pre-delete rows and was DISCARDED — re-run")
        }
        val staged = messages.toSeq.flatMap {
          case CowTaskFiles(files, _, _) => files
          case _ => Nil
        }
        // phase 0 — the publish policy may DROP staged files instead of
        // publishing them (leaf-narrowed replace: a partition proven
        // pure-carryover keeps its ORIGINAL files and discards the
        // staged copies — byte-identical untouched partitions)
        val (toPublish, toDrop) = partitionPublish(staged, fs)
        toDrop.foreach(p => fs.delete(new Path(p), false))
        // phase 1 — publish the new generation (atomic per-file rename)
        val published = toPublish.map { case (staged0, fin) =>
          require(fs.rename(new Path(staged0), new Path(fin)),
            s"commit: could not publish $staged0 -> $fin")
          fs.makeQualified(new Path(fin))
        }
        // phase 2 — retire the superseded generation per the policy;
        // deletion vectors of retired files are inert — drop them
        // (version-archiving retires MOVE the sidecars first)
        GraftPartitionedCow.onBetweenPublishAndRetire(dir)
        val gone = retired(published, fs)
        val tomb = retire(gone, fs)
        GraftDv.dropFor(fs, new Path(dir), gone)
        // commit journal ([[GraftCommits]]): one record inside this
        // critical section — feed position, adds, and tombstone-
        // resolvable removes for the batch changelog and time travel
        GraftCommits.tryRecord(fs, new Path(dir), journalKind,
          adds = published.map(p =>
            GraftCommits.relOf(fs, new Path(dir), p)),
          removes = gone.map(g => GraftCommits.Remove(
            GraftCommits.relOf(fs, new Path(dir), g),
            tomb.getOrElse(""))),
          note = journalNote)
        // phase 3 — prune partition directories the retirement emptied
        // (fully-deleted partitions vanish rather than lingering as
        // empty dirs the next scan lists for nothing)
        if (pruneEmptied) {
          val base = new Path(dir)
          gone.map(_.getParent).distinct.foreach { p =>
            var d = p
            while (d != null && d != base && d.getName.contains("=") &&
                fs.exists(d) && fs.listStatus(d).isEmpty) {
              fs.delete(d, false)
              d = d.getParent
            }
          }
        }
        }
        // maintenance policy outside the lock (tombstone-age GC)
        GraftMaintenance.afterCommit(spark, fs, new Path(dir))
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit = {
        val fs = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        messages.foreach {
          case CowTaskFiles(files, _, _) => files.foreach { case (staged, _, _) =>
            try fs.delete(new Path(staged), false)
            catch { case _: Throwable => () }
          }
          case _ => ()
        }
      }
    }

    /** Which staged files become visible: (publish pairs, staged paths
      * to drop). Default: publish everything.
      */
    protected def partitionPublish(staged: Seq[(String, String, Long)],
        fs: FileSystem): (Seq[(String, String)], Seq[String]) =
      (staged.map(t => (t._1, t._2)), Nil)
  }

  /** Copy-on-write replacement (row-level MERGE/UPDATE/DELETE): retires
    * the old generation inside the partitions the operation's SCAN was
    * runtime-group-filtered to (None = the filter never fired = the
    * scan read everything, whole-table rewrite). Declares a clustered
    * distribution on the partition columns: replacement rows for a
    * partition arrive at one task, so a 1000-executor merge writes a
    * handful of files per touched partition instead of
    * tasks × partitions slivers.
    */
  /** Clustering for a hive-layout write: identity partitions plus the
    * bucket transform when present — one shuffle, then each task owns
    * whole (partition, bucket) groups. Declared NON-strict
    * ([[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering
    * .distributionStrictlyRequired]] = false in the ordered writes):
    * correctness never depends on co-location here (several files per
    * group are fine), so AQE may plan a REBALANCE instead of a strict
    * hash exchange and split a skewed group — one giant date partition
    * stops being one giant task.
    */
  /** Clustering/ordering key for one partition-spec field: the DERIVED
    * TOKEN for a hidden-partitioning transform (resolved through the
    * catalog's own FunctionCatalog — [[GraftDaysFn]] /
    * [[GraftTruncateFn]] / [[GraftBucketFn]]), identity otherwise.
    * Clustering by `identity(source)` instead would be FINER than the
    * token — equal source values co-locate but one day's many
    * timestamps hash across tasks, and at cluster parallelism the
    * write sprays tasks × token-groups file slivers (the r15 verdict's
    * one weak component).
    */
  private def fieldKeyOf(c: String)
      : org.apache.spark.sql.connector.expressions.Expression =
    GraftTransforms.parseOpt(c) match {
      case Some(GraftTransforms.Days(src)) => Expressions.days(src)
      case Some(GraftTransforms.Trunc(src, n)) => Expressions.apply(
        "truncate", Expressions.literal(n), Expressions.column(src))
      case Some(GraftTransforms.Bucket(src, n)) =>
        Expressions.bucket(n, src)
      case None => Expressions.identity(c)
    }

  private[sources] def clusteringOf(partitionCols: Seq[String],
      bucketSpec: Option[(Int, String)]): Distribution =
    Distributions.clustered(
      (partitionCols.map(fieldKeyOf) ++
        bucketSpec.map { case (nb, c) => Expressions.bucket(nb, c)
          : org.apache.spark.sql.connector.expressions.Expression })
        .toArray)

  /** Within-task ordering on the same keys: lets the task writer hold
    * ONE open file writer at a time (close-on-key-change) instead of
    * one per group it touches — columnar writers buffer O(100 MB)
    * each, so concurrent-per-group writers are the classic dynamic-
    * partition-write OOM at cluster scale. Spark's own
    * FileFormatWriter sorts for exactly this reason.
    */
  private[sources] def orderingOf(partitionCols: Seq[String],
      bucketSpec: Option[(Int, String)])
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    (partitionCols.map(fieldKeyOf) ++
      bucketSpec.map { case (nb, c) => Expressions.bucket(nb, c)
        : org.apache.spark.sql.connector.expressions.Expression })
      .map(e => Expressions.sort(e,
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      .toArray

  final class PartitionedReplaceWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, partitionCols: Seq[String], oldFiles: Seq[Path],
      scanned: () => Option[Map[String, Set[String]]],
      bucketSpec: Option[(Int, String)] = None,
      leafScope: () => Option[GraftCowLeafScope.LeafScope] = () => None,
      command: String = "")
    extends HiveLayoutWrite(spark, format, dataSchema, dir, partitionCols,
      oldFiles, bucketSpec) with RequiresDistributionAndOrdering {

    override def description(): String = s"graft partitioned replace-data $dir"
    override protected def journalKind: String = "rewrite"
    override protected def journalNote: String = command

    /** Deletion-vector state at write build: a merge-on-read DELETE
      * committing while this rewrite runs invalidates the rows already
      * read — the commit re-checks under the lock and loses cleanly.
      */
    override protected val dvConflictGuard
        : Option[Map[String, (Long, Long)]] =
      Some(GraftDv.fingerprint(new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration), new Path(dir)))

    override def requiredDistribution(): Distribution =
      clusteringOf(partitionCols, bucketSpec)
    override def requiredOrdering(): Array[SortOrder] =
      orderingOf(partitionCols, bucketSpec)
    override def distributionStrictlyRequired(): Boolean = false
    override protected def sortedInput: Boolean = true

    override protected def pruneEmptied: Boolean = true

    /** Partition rel-dir of a table file path ("" for the table root). */
    private def relOf(p: String, fs: FileSystem): String = {
      val base = fs.makeQualified(new Path(dir)).toString
      val parent = fs.makeQualified(new Path(p)).getParent.toString
      if (parent == base) "" else parent.stripPrefix(base + "/")
    }

    private def inScope(rel: String,
        scope: Map[String, Set[String]]): Boolean = {
      val segments = rel.split("/").toSeq
      scope.forall { case (colName, toks) =>
        val allowed = toks.map(t =>
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(colName, t))
        segments.exists(allowed.contains)
      }
    }

    // leaf mode state threaded from partitionPublish (phase 0) to
    // retired (phase 2) within the single driver-side commit call
    private var leafActive: Option[GraftCowLeafScope.LeafScope] = None
    private var mismatchRels: Set[String] = Set.empty

    /** Leaf-narrowed publish ([[GraftCowLeafScope]]): per staged
      * partition Q —
      *  - Q ∈ matched: publish (its old generation retires below);
      *  - Q ∈ scan scope, not matched: Q's carryover was fully read, so
      *    staged rows = pre-write rows ⟺ nothing moved in or was
      *    inserted there ⟹ DROP the staged copies, keep the original
      *    files byte-identical. A count mismatch means rows moved into
      *    Q (a partition-changing UPDATE/MERGE) riding on the full
      *    carryover ⟹ publish AND retire Q's old generation;
      *  - Q outside the scan scope: only NEW rows (inserts landing in
      *    untouched partitions) can stage there — publish, and never
      *    retire (no carryover was read, the old files stay).
      * Without a leaf scope (rule declined / extensions absent) every
      * staged file publishes, as before.
      */
    override protected def partitionPublish(
        staged: Seq[(String, String, Long)],
        fs: FileSystem): (Seq[(String, String)], Seq[String]) =
      leafScope() match {
        case None => super.partitionPublish(staged, fs)
        case some @ Some(ls) =>
          leafActive = some
          lazy val pre: Map[String, Long] = ls.preCounts()
          val publish = Seq.newBuilder[(String, String)]
          val drop = Seq.newBuilder[String]
          staged.groupBy(t => relOf(t._2, fs)).foreach { case (rel, files) =>
            if (ls.matchedRels.contains(rel))
              publish ++= files.map(t => (t._1, t._2))
            else if (inScope(rel, ls.scopeTokens)) {
              val stagedRows = files.map(_._3).sum
              if (pre.get(rel).contains(stagedRows))
                drop ++= files.map(_._1)
              else {
                publish ++= files.map(t => (t._1, t._2))
                mismatchRels += rel
              }
            } else publish ++= files.map(t => (t._1, t._2))
          }
          (publish.result(), drop.result())
      }

    /** A pre-existing file is superseded iff its partition-directory
      * path satisfies EVERY recorded constraint. A file missing a
      * constrained column's `col=value` segment is kept (conservative:
      * never delete what the scan may not have read). In leaf mode the
      * retired set is exact: the matched partitions plus the in-scope
      * partitions whose staged state proved to differ.
      */
    override protected def retired(published: Seq[Path],
        fs: FileSystem): Seq[Path] =
      leafActive match {
        case Some(ls) =>
          val gone = ls.matchedRels ++ mismatchRels
          oldFiles.filter(f => gone.contains(relOf(f.toString, fs)))
        case None => scanned() match {
          case None => oldFiles
          case Some(m) => oldFiles.filter { file =>
            val segments = file.toString
              .stripPrefix(fs.makeQualified(new Path(dir)).toString)
              .split("/").toSeq
            m.forall { case (col, toks) =>
              val allowed = toks.map(t =>
                org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                  .getPartitionPathString(col, t))
              segments.exists(s => s.startsWith(col + "=") && allowed.contains(s))
            }
          }
        }
      }
  }

  /** Dynamic partition overwrite (`INSERT OVERWRITE` under dynamic
    * mode, `df.writeTo(t).overwritePartitions()`): retires the old
    * generation exactly in the partitions that RECEIVED new files —
    * the engine's `overwritePartitions` contract
    * ([[graft.runtime.Catalog.overwritePartitions]]) on the DSv2
    * surface. No distribution requirement: the incoming partitioning
    * is preserved, so a single-date daily refresh (the reference's
    * incremental unit) keeps its full write parallelism instead of
    * funneling the day through one task; the many-partitions case
    * writes tasks×partitions files, the same trade Spark's own
    * dynamic-partition writer makes absent an explicit repartition.
    */
  final class DynamicOverwriteWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, partitionCols: Seq[String], oldFiles: Seq[Path],
      bucketSpec: Option[(Int, String)] = None)
    extends HiveLayoutWrite(spark, format, dataSchema, dir, partitionCols,
      oldFiles, bucketSpec) {

    override def description(): String = s"graft dynamic-overwrite $dir"
    override protected def journalKind: String = "overwrite"
    override protected def pruneEmptied: Boolean = false
    override protected def sortedInput: Boolean = false
    override protected def retired(published: Seq[Path],
        fs: FileSystem): Seq[Path] = {
      val touched = published.map(_.getParent).toSet
      oldFiles.filter(f => touched.contains(fs.makeQualified(f).getParent))
    }
  }

  /** Append to a BUCKETED table: a v2 hive-layout write (the V1 append
    * cannot tag buckets) that retires nothing; the clustered
    * distribution on the bucket transform means each task owns whole
    * buckets — one new file per bucket per append.
    */
  final class BucketedAppendWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, partitionCols: Seq[String],
      bucketSpec: Option[(Int, String)], queryId: String)
    extends HiveLayoutWrite(spark, format, dataSchema, dir, partitionCols,
      Nil, bucketSpec) with RequiresDistributionAndOrdering {
    override def description(): String = s"graft bucketed-append $dir"
    override protected def journalKind: String = "append"
    override def requiredDistribution(): Distribution =
      clusteringOf(partitionCols, bucketSpec)
    override def requiredOrdering(): Array[SortOrder] =
      orderingOf(partitionCols, bucketSpec)
    override def distributionStrictlyRequired(): Boolean = false
    override protected def sortedInput: Boolean = true
    override protected def pruneEmptied: Boolean = false
    override protected def retired(published: Seq[Path],
        fs: FileSystem): Seq[Path] = Nil
    /** Streaming appends keep the bucket layout too — the epoch-deduped
      * streaming write with the bucket spec threaded through.
      */
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new StreamingAppendWrite(spark, format, dataSchema, dir,
        partitionCols, queryId, bucketSpec)
  }

  /** INSERT OVERWRITE through the v2 path: staged-invisible full
    * replace — publish the new generation (bucket-tagged when the table
    * has a bucket spec), retire every pre-existing data file in the
    * same commit. Used by bucketed tables (whose files the V1 swap
    * cannot tag) and by `INSERT OVERWRITE` of an unpartitioned table
    * planned as OverwritePartitionsDynamic (session-wide dynamic mode;
    * no V1 fallback exists for that plan — r10 ADVICE).
    *
    * `versionStore = Some((versionsDir, retain))` preserves the
    * version-retention contract of the V1 swap path: the retired
    * generation is a COMPLETE previous table state (this is a full
    * replace), so instead of deleting it the commit MOVES each retired
    * file — relative hive path preserved — into the next `v<N>`
    * directory of the store that `VERSION AS OF` / `readVersion`
    * resolve against, pruned to the newest `retain`. One rename per
    * retired file: same cost class as the deletes it replaces.
    */
  final class TruncateReplaceWrite(
      spark: SparkSession, format: String, dataSchema: StructType,
      dir: String, partitionCols: Seq[String], oldFiles: Seq[Path],
      bucketSpec: Option[(Int, String)],
      versionStore: Option[(String, Int)] = None,
      queryId: String = "")
    extends HiveLayoutWrite(spark, format, dataSchema, dir, partitionCols,
      oldFiles, bucketSpec) with RequiresDistributionAndOrdering {
    override def description(): String = s"graft truncate-replace $dir"
    override protected def journalKind: String = "replace"
    /** Complete-output-mode streaming on a BUCKETED table: per-epoch
      * full refresh that keeps the bucket-tagged layout (versioning
      * does not apply per-epoch — see [[StreamingReplaceWrite]]).
      */
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new StreamingReplaceWrite(spark, format, dataSchema, dir,
        partitionCols, queryId, bucketSpec)
    override def requiredDistribution(): Distribution =
      clusteringOf(partitionCols, bucketSpec)
    override def requiredOrdering(): Array[SortOrder] =
      orderingOf(partitionCols, bucketSpec)
    override def distributionStrictlyRequired(): Boolean = false
    override protected def sortedInput: Boolean = true
    override protected def pruneEmptied: Boolean = true
    // a full replace supersedes every row: live equality-delete
    // sidecars are cleared (or archived with the retained version
    // below) rather than refusing — this IS a materialization path
    override protected def eqDeleteSafe: Boolean = true
    override protected def retired(published: Seq[Path],
        fs: FileSystem): Seq[Path] = oldFiles
    override protected def retire(gone: Seq[Path], fs: FileSystem)
        : Option[String] = {
      val tomb: Option[String] = versionStore match {
        case Some((store, retain)) if gone.nonEmpty =>
          val storeP = new Path(store)
          val existing: Seq[Int] =
            if (!fs.exists(storeP)) Nil
            else fs.listStatus(storeP).toSeq.map(_.getPath.getName)
              .filter(_.matches("v\\d{6}")).map(_.drop(1).toInt).sorted
          val vDir = new Path(storeP,
            f"v${existing.lastOption.getOrElse(0) + 1}%06d")
          val qualBase = fs.makeQualified(new Path(dir)).toString
          gone.foreach { f =>
            val rel = f.toString.stripPrefix(qualBase).stripPrefix("/")
            // an archived file's deletion vector travels WITH it: a
            // VERSION AS OF read of the snapshot must apply the same
            // deletes it had live (rename preserves the file mtime the
            // vector is keyed by)
            val dv = GraftDv.dvPath(new Path(dir), rel)
            if (fs.exists(dv)) {
              val dvDest = GraftDv.dvPath(vDir, rel)
              fs.mkdirs(dvDest.getParent)
              require(fs.rename(dv, dvDest),
                s"version archive: could not retain deletion vector $dv")
            }
            val dest = new Path(vDir, rel)
            fs.mkdirs(dest.getParent)
            require(fs.rename(f, dest),
              s"version archive: could not retain $f as $dest")
          }
          // equality-delete sidecars travel with the snapshot too —
          // the archived generation must read with its deletes applied
          GraftEqDel.archiveInto(fs, new Path(dir), vDir)
          existing.dropRight(retain - 1).foreach { v =>
            fs.delete(new Path(storeP, f"v$v%06d"), true)
          }
          None // preserved in the version store, not the tombstone area
        case _ =>
          val t = super.retire(gone, fs)
          // the replace superseded every row: live equality deletes
          // are consumed by it (this commit IS their materialization)
          GraftEqDel.clearAll(fs, new Path(dir))
          t
      }
      // every surviving row was rewritten under the CURRENT column
      // names: rename aliases are materialized by this replace
      val m = GraftTableMeta.read(fs, new Path(dir))
      if (m.aliases.nonEmpty)
        GraftTableMeta.write(fs, new Path(dir), m.copy(aliases = Nil))
      tomb
    }
  }

  private[sources] final case class PartitionedCowWriterFactory(
      owf: OutputWriterFactory, conf: SerializableHadoopConf,
      tableDir: String, dataSchema: StructType, fileSchema: StructType,
      fileFieldIdx: Seq[Int], partFields: Seq[(String, Int, DataType)],
      bucketField: Option[(Int, Int)], sorted: Boolean,
      bloom: Option[WriterBloomSpec] = None,
      ndv: Option[WriterNdvSpec] = None,
      checks: Seq[GraftCheck.Bound] = Nil)
    extends DataWriterFactory {
    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] =
      new PartitionedCowWriter(owf, conf.value, tableDir, dataSchema,
        fileSchema, fileFieldIdx, partFields, bucketField, partitionId, None,
        sorted, bloom, ndv, checks)
  }

  /** Streaming twin of the factory: final file names are DETERMINISTIC
    * per (queryId, epochId, partitionId, partition-dir), so an epoch
    * re-executed after a crash mid-publish converges file-by-file
    * instead of duplicating — see [[StreamingAppendWrite.commit]].
    */
  private final case class StreamingHiveWriterFactory(
      owf: OutputWriterFactory, conf: SerializableHadoopConf,
      tableDir: String, dataSchema: StructType, fileSchema: StructType,
      fileFieldIdx: Seq[Int], partFields: Seq[(String, Int, DataType)],
      bucketField: Option[(Int, Int)], queryTag: String,
      bloom: Option[WriterBloomSpec] = None,
      checks: Seq[GraftCheck.Bound] = Nil)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] =
      new PartitionedCowWriter(owf, conf.value, tableDir, dataSchema,
        fileSchema, fileFieldIdx, partFields, bucketField, partitionId,
        Some((queryTag, epochId)), sorted = false, bloom, checks = checks)
  }

  /** Task-side dynamic-partition writer. Replacement rows may arrive
    * prefixed with Spark's `__row_operation` int column (see
    * [[StripOperationFactory]]) — the offset is detected per row and
    * both the partition-value reads and the file projection shift by
    * it. One open OutputWriter per partition value encountered; with
    * the clustered distribution above that is a handful per task.
    *
    * `epoch = Some((queryTag, epochId))` switches to streaming naming:
    * the FINAL name is a pure function of (queryTag, epoch, partitionId,
    * partition dir) — no uuid, no taskId — so every re-execution of an
    * epoch produces the same final names and a crashed publish can be
    * completed idempotently; the STAGED name keeps a per-attempt uuid so
    * concurrent task attempts never write the same file.
    */
  private[sources] final class PartitionedCowWriter(
      owf: OutputWriterFactory, conf: org.apache.hadoop.conf.Configuration,
      tableDir: String, dataSchema: StructType, fileSchema: StructType,
      fileFieldIdx: Seq[Int], partFields: Seq[(String, Int, DataType)],
      bucketField: Option[(Int, Int)],
      partitionId: Int, epoch: Option[(String, Long)],
      // sorted = the write declared orderingOf, so rows arrive grouped
      // by (partition, bucket) key: ONE columnar writer open at a time
      // (close-on-key-change) — bounded task memory however many groups
      // the task owns. Unsorted mode keeps a writer per key encountered.
      sorted: Boolean,
      // writer-side bloom maintenance (r12 item 5): accumulate each
      // open file's filters as rows stream through and ship them in
      // the commit message — zero post-commit data re-read
      bloom: Option[WriterBloomSpec] = None,
      // writer-side NDV maintenance (r13 item 4): same pattern, HLL
      // registers per open file
      ndv: Option[WriterNdvSpec] = None,
      // write-time CHECK constraints ([[GraftCheck]]): driver-bound
      // expressions, compiled once per task; every row this writer
      // accepts is checked BEFORE it reaches an output file
      checks: Seq[GraftCheck.Bound] = Nil)
    extends DataWriter[InternalRow] {

    // hidden-partitioning transforms resolved once per task, not per
    // row (the directory token derives from the source column's value)
    private val partSpecs: Array[Option[GraftTransforms.Spec]] =
      partFields.map(f => GraftTransforms.parseOpt(f._1)).toArray

    // one guard per row layout: replacement rows may carry a leading
    // __row_operation column, shifting every data ordinal by one
    private val checkGuards = new Array[GraftCheck.RowGuard](2)
    private def checkRow(row: InternalRow, offset: Int): Unit =
      if (checks.nonEmpty) {
        if (checkGuards(offset) == null)
          checkGuards(offset) = new GraftCheck.RowGuard(
            GraftCheck.shift(checks, offset), dataSchema, offset)
        checkGuards(offset).check(row)
      }

    import org.apache.spark.sql.types.{BooleanType, DateType, StringType}

    // bloom columns resolved against THIS write's row schema; a column
    // absent from it (delete-only delta rows) is skipped — the re-read
    // backstop covers such files
    private val bloomCols: Seq[(Int, Char)] = bloom.toSeq.flatMap { spec =>
      spec.cols.flatMap { case (nm, kind) =>
        val i = dataSchema.fields.indexWhere(_.name.equalsIgnoreCase(nm))
        if (i < 0) None else Some((i, kind))
      }
    }
    // per-file filters, index-parallel to `files`; a task fanning out
    // to very many files stops accumulating past the cap (null slots)
    // and leaves those files to the analyze backstop — bounded task
    // memory whatever the fan-out
    private val MaxBloomFilesPerTask = 64
    private val fileBlooms = scala.collection.mutable.ArrayBuffer[
      Array[org.apache.spark.util.sketch.BloomFilter]]()

    // NDV columns resolved against this write's row schema. Timestamps
    // are deliberately absent (their analyze-pass rendering is
    // session-timezone-coupled — the backstop owns them); every other
    // supported type's internal rendering below equals the external
    // Row's `toString`, which keeps shipped and analyze-built
    // registers byte-identical.
    private val ndvCols: Seq[(Int, DataType)] = ndv.toSeq.flatMap { spec =>
      spec.cols.flatMap { nm =>
        val i = dataSchema.fields.indexWhere(_.name.equalsIgnoreCase(nm))
        if (i < 0) None
        else dataSchema.fields(i).dataType match {
          case ByteType | ShortType | IntegerType | LongType | DateType |
               StringType | BooleanType =>
            Some((i, dataSchema.fields(i).dataType))
          case _ => None
        }
      }
    }
    // 64 ints per column per file: cheap enough for a high cap; past
    // it the analyze backstop owns the files (bounded task memory)
    private val MaxNdvFilesPerTask = 4096
    private val fileNdvs =
      scala.collection.mutable.ArrayBuffer[Array[Array[Int]]]()
    private val hllAgg = new graft.functions.HllAgg

    private val ctx = {
      import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
      new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(conf,
        new TaskAttemptID(new TaskID(new JobID("graftcow", 0),
          TaskType.MAP, partitionId), 0))
    }
    private val ext = owf.getFileExtension(ctx)
    private val uuid = java.util.UUID.randomUUID().toString.take(8)

    /** `-b<id>` tag: the bucket-respecting layout's contract with
      * [[GraftBucketedScan]] — the scan regroups files by this tag.
      */
    private def bTag(bucketId: Int): String =
      if (bucketId < 0) "" else f"-b$bucketId%05d"

    private def finalName(rel: String, bucketId: Int): String = epoch match {
      case None => s"part-$uuid-p$partitionId-$fileSeq${bTag(bucketId)}$ext"
      case Some((tag, e)) =>
        val relHash = f"${scala.util.hashing.MurmurHash3.stringHash(rel)}%08x"
        s"part-s$tag-e$e-p$partitionId-r$relHash${bTag(bucketId)}$ext"
    }
    private def stagedName(fin: String): String = epoch match {
      case None => s".$fin"
      case Some(_) => s".stg-$uuid-$fin"
    }
    private def projection(offset: Int) =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
        fileFieldIdx.map { i =>
          val f = dataSchema.fields(i)
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i + offset, f.dataType, f.nullable)
        })
    private lazy val proj0 = projection(0)
    private lazy val proj1 = projection(1)
    // every file this task created: (stagedPath, finalPath) with a
    // parallel per-file ROW COUNT (the leaf-narrowed commit's
    // carryover-equality evidence) — closed files included, so
    // commit/abort see the full set in both modes
    private val files =
      scala.collection.mutable.ArrayBuffer[(String, String)]()
    private val rowCounts = scala.collection.mutable.ArrayBuffer[Long]()
    private var fileSeq = 0
    // unsorted mode: key -> (open writer, file idx); sorted mode: one
    private val open =
      scala.collection.mutable.LinkedHashMap[String, (OutputWriter, Int)]()
    private var curKey: String = null
    private var curWriter: OutputWriter = null
    private var curIdx: Int = -1

    private def newFile(rel: String, bucketId: Int): (OutputWriter, Int) = {
      val name = finalName(rel, bucketId)
      val prefix = if (rel.isEmpty) tableDir else s"$tableDir/$rel"
      val staged = s"$prefix/${stagedName(name)}"
      files += ((staged, s"$prefix/$name"))
      rowCounts += 0L
      if (bloomCols.nonEmpty)
        fileBlooms += (if (files.length > MaxBloomFilesPerTask) null
        else bloomCols.map { _ =>
          org.apache.spark.util.sketch.BloomFilter.create(
            bloom.get.expectedRows, bloom.get.fpp)
        }.toArray)
      if (ndvCols.nonEmpty)
        fileNdvs += (if (files.length > MaxNdvFilesPerTask) null
        else Array.fill(ndvCols.length)(
          new Array[Int](graft.functions.HllAgg.M)))
      fileSeq += 1
      (owf.newInstance(staged, fileSchema, ctx), files.length - 1)
    }

    override def write(row: InternalRow): Unit = {
      val offset = row.numFields - dataSchema.length
      require(offset == 0 || offset == 1,
        s"replacement row has ${row.numFields} fields for a " +
          s"${dataSchema.length}-column table")
      checkRow(row, offset)
      val rel = partFields.zipWithIndex.map { case ((c, i, dt), fi) =>
        val v = if (row.isNullAt(i + offset)) null else row.get(i + offset, dt)
        partSpecs(fi) match {
          case Some(sp) => ExternalCatalogUtils.getPartitionPathString(
            sp.fieldName, GraftTransforms.token(sp, v, dt))
          case None => ExternalCatalogUtils.getPartitionPathString(c,
            GraftPartitionedCow.renderRaw(v, dt))
        }
      }.mkString("/")
      val bucketId = bucketField.map { case (nb, i) =>
        GraftBucket.of(
          if (row.isNullAt(i + offset)) null
          else row.get(i + offset, dataSchema.fields(i).dataType), nb)
      }.getOrElse(-1)
      val key = s"$rel|$bucketId"
      val (w, idx) =
        if (sorted) {
          if (curKey != key) {
            // close-on-key-change; a recurring key (possible only if
            // the ordering guarantee broke) just opens a fresh file —
            // correct either way, fileSeq keeps names distinct
            if (curWriter != null) curWriter.close()
            val (nw, ni) = newFile(rel, bucketId)
            curWriter = nw; curIdx = ni
            curKey = key
          }
          (curWriter, curIdx)
        } else open.getOrElseUpdate(key, newFile(rel, bucketId))
      rowCounts(idx) += 1
      if (bloomCols.nonEmpty && fileBlooms(idx) != null) {
        val filters = fileBlooms(idx)
        var bi = 0
        while (bi < bloomCols.length) {
          val (ci, kind) = bloomCols(bi)
          if (!row.isNullAt(ci + offset)) kind match {
            // same value normalization as GraftBloom's build pass
            case 'l' => filters(bi).putLong(
              dataSchema.fields(ci).dataType match {
                case ByteType => row.getByte(ci + offset).toLong
                case ShortType => row.getShort(ci + offset).toLong
                case IntegerType => row.getInt(ci + offset).toLong
                case _ => row.getLong(ci + offset)
              })
            case 's' => filters(bi).putString(
              row.getUTF8String(ci + offset).toString)
          }
          bi += 1
        }
      }
      if (ndvCols.nonEmpty && fileNdvs(idx) != null) {
        val regs = fileNdvs(idx)
        var ni = 0
        while (ni < ndvCols.length) {
          val (ci, dt) = ndvCols(ni)
          if (!row.isNullAt(ci + offset)) {
            // rendered EXACTLY as the analyze pass renders the
            // external Row value — register byte-identity depends on it
            val token = dt match {
              case ByteType => row.getByte(ci + offset).toString
              case ShortType => row.getShort(ci + offset).toString
              case IntegerType => row.getInt(ci + offset).toString
              case LongType => row.getLong(ci + offset).toString
              case BooleanType => row.getBoolean(ci + offset).toString
              case DateType => java.time.LocalDate
                .ofEpochDay(row.getInt(ci + offset).toLong).toString
              case _ => row.getUTF8String(ci + offset).toString
            }
            hllAgg.reduce(regs(ni), token)
          }
          ni += 1
        }
      }
      w.write(if (offset == 0) proj0(row) else proj1(row))
    }

    override def commit(): WriterCommitMessage = {
      if (curWriter != null) { curWriter.close(); curWriter = null }
      open.values.foreach(_._1.close())
      open.clear()
      val shipped: Map[String, Seq[(String, Char, Array[Byte])]] =
        if (bloomCols.isEmpty) Map.empty
        else files.toSeq.zip(fileBlooms.toSeq).collect {
          case ((_, fin), bfs) if bfs != null =>
            fin -> bloomCols.zip(bfs.toSeq).map { case ((ci, kind), bf) =>
              val out = new java.io.ByteArrayOutputStream()
              bf.writeTo(out)
              (dataSchema.fields(ci).name.toLowerCase, kind, out.toByteArray)
            }
        }.toMap
      val shippedNdv: Map[String, Seq[(String, Char, Array[Int])]] =
        if (ndvCols.isEmpty) Map.empty
        else files.toSeq.zip(fileNdvs.toSeq).collect {
          case ((_, fin), regs) if regs != null =>
            fin -> ndvCols.zip(regs.toSeq).map { case ((ci, dt), r) =>
              val kind = dt match {
                case StringType => 's'
                case BooleanType => 'b'
                case _ => 'l'
              }
              (dataSchema.fields(ci).name.toLowerCase, kind, r)
            }
        }.toMap
      CowTaskFiles(files.toSeq.zip(rowCounts.toSeq).map {
        case ((s, f), n) => (s, f, n)
      }, shipped, shippedNdv)
    }

    override def abort(): Unit = {
      if (curWriter != null) {
        try curWriter.close() catch { case _: Throwable => () }
        curWriter = null
      }
      open.values.foreach(w => try w._1.close() catch { case _: Throwable => () })
      open.clear()
      files.foreach { case (staged, _) =>
        try {
          val p = new Path(staged)
          p.getFileSystem(conf).delete(p, false)
        } catch { case _: Throwable => () }
      }
    }

    override def close(): Unit = ()
  }
}
