package graft.runtime

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, expr, lit, max => fmax, sum => fsum, when}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.sources.GraftCatalog

/** MATERIALIZED VIEWS over the incremental-maintenance tier (r15
  * verdict item 8 — Delta's materialized views / Iceberg-Trino MVs,
  * wired through the same parser seam as the V2 views
  * ([[GraftViewRules]]); the incremental fold is the q174 counting-IVM
  * shape driven by the table's OWN change feed):
  *
  *  - `CREATE MATERIALIZED VIEW cat.ns.mv AS <agg query>` validates
  *    the body is INCREMENTALLY MAINTAINABLE — one graft base table,
  *    optional deterministic row filter, GROUP BY plain columns,
  *    SUM(<integral expr>) / COUNT(*) measures with at least one
  *    COUNT(*) (the group-liveness counter every counting-IVM scheme
  *    needs) — then builds the backing table and records the
  *    definition + the base table's current commit position in a
  *    `_graft_mv` sidecar.
  *  - `CALL system.refresh_materialized_view(table => 'ns.mv')` reads
  *    ONLY the base table's changes above the recorded position
  *    (`.changes` with an exact `_change_epoch` pushdown — the refresh
  *    costs the CHANGE, never the base table), folds the signed delta
  *    (insert/update_postimage +1, delete/update_preimage −1) into the
  *    backing aggregate, drops groups whose liveness count reached
  *    zero, and advances the position. `full => true` recomputes from
  *    the stored SQL (the re-bootstrap path when the feed's retention
  *    horizon passed the MV's position — that read refuses loudly).
  *
  * Equality-upsert feed rows (`upsert`) are KEYED, not additive — the
  * fold refuses them at read time (`raise_error` in the sign column)
  * rather than folding a wrong count.
  */
object GraftMaterializedViews {

  private val SidecarName = "_graft_mv"

  // Spark's parser has no MATERIALIZED VIEW productions at all — the
  // DDL is intercepted on the RAW SQL before delegation, the same
  // parser seam the V2 view DDL rides ([[GraftViewRules
  // .GraftViewAwareParser]]).
  private val CreateRe =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+([`\w.]+)\s+AS\s+(.+)""".r
  private val DropRe =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+((?:IF\s+EXISTS\s+)?)([`\w.]+)\s*;?\s*""".r

  /** MATERIALIZED VIEW DDL on a graft catalog target, or None =
    * delegate (non-MV statements; MV syntax on a foreign catalog also
    * falls through and fails in the stock parser — loud, not silent).
    */
  def parseDdl(session: SparkSession, sqlText: String,
      delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    sqlText match {
      case CreateRe(orReplace, ident, body) =>
        delegate.parseMultipartIdentifier(ident) match {
          case Seq(cat, ns, name)
              if GraftViewRules.graftCatalog(session, cat).isDefined =>
            Some(GraftCreateMaterializedViewCommand(cat, ns, name,
              body.trim, orReplace != null))
          case _ => None
        }
      case DropRe(ifExists, ident) =>
        delegate.parseMultipartIdentifier(ident) match {
          case Seq(cat, _, _)
              if GraftViewRules.graftCatalog(session, cat).isDefined =>
            // the MV IS its backing table (+ the definition sidecar
            // inside the table dir, dropped with it)
            Some(delegate.parsePlan(s"DROP TABLE $ifExists $ident"))
          case _ => None
        }
      case _ => None
    }

  final case class GraftCreateMaterializedViewCommand(cat: String,
      ns: String, name: String, bodySql: String, replace: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
      create(spark, cat, ns, name, bodySql, replace)
      Nil
    }
  }

  /** (output name, kind: "sum" | "count", measure-input SQL). */
  final case class Measure(out: String, kind: String, exprSql: String)

  /** A group key: the OUTPUT column name (the backing table's column)
    * and the SOURCE column name (what the change feed carries) — they
    * differ when the body aliases a group column.
    */
  final case class Key(out: String, src: String)

  final case class MvMeta(sql: String, source: String, keys: Seq[Key],
      measures: Seq[Measure], filter: Option[String], lastCommit: Long)

  private def b64(s: String): String = java.util.Base64.getEncoder
    .encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  def writeMeta(fs: FileSystem, dir: Path, m: MvMeta): Unit = {
    val sb = new StringBuilder
    sb.append(s"v1\t${b64(m.sql)}\t${b64(m.source)}\t${m.lastCommit}\n")
    m.keys.foreach(k => sb.append(s"K\t${b64(k.out)}\t${b64(k.src)}\n"))
    m.measures.foreach(ms =>
      sb.append(s"M\t${b64(ms.out)}\t${ms.kind}\t${b64(ms.exprSql)}\n"))
    m.filter.foreach(f => sb.append(s"W\t${b64(f)}\n"))
    // atomic replace (the journal-checkpoint pattern): a crash
    // mid-write must never leave a truncated sidecar — the definition
    // IS the view's recoverability
    val fin = new Path(dir, SidecarName)
    val tmp = new Path(dir, "." + SidecarName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    graft.sources.GraftDv.replaceAtomic(fs, tmp, fin)
  }

  def readMeta(fs: FileSystem, dir: Path): Option[MvMeta] = {
    val p = new Path(dir, SidecarName)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val hdr = lines.head.split('\t')
    require(hdr.length >= 4 && hdr(0) == "v1", s"bad MV sidecar at $p")
    val keys = Seq.newBuilder[Key]
    val measures = Seq.newBuilder[Measure]
    var filter: Option[String] = None
    lines.tail.foreach { ln =>
      val f = ln.split('\t')
      f(0) match {
        case "K" =>
          val out = unb64(f(1))
          keys += Key(out, if (f.length > 2) unb64(f(2)) else out)
        case "M" => measures += Measure(unb64(f(1)), f(2), unb64(f(3)))
        case "W" => filter = Some(unb64(f(1)))
        case other =>
          throw new IllegalStateException(s"bad MV sidecar tag '$other'")
      }
    }
    Some(MvMeta(unb64(hdr(1)), unb64(hdr(2)), keys.result(),
      measures.result(), filter, hdr(3).toLong))
  }

  // ---- maintainability extraction ----------------------------------------

  private def refuse(why: String): Nothing =
    throw new IllegalArgumentException(
      s"CREATE MATERIALIZED VIEW: the query is not incrementally " +
        s"maintainable — $why. Maintainable shape: SELECT <group " +
        "columns>, COUNT(*), SUM(<integral expr>)... FROM <one graft " +
        "table> [WHERE <row filter>] GROUP BY <group columns>, with at " +
        "least one COUNT(*) (the group-liveness counter)")

  /** Extract (source ident, keys, measures, filter) from the ANALYZED
    * body, refusing loudly on any shape the counting-IVM fold cannot
    * maintain.
    */
  def extract(spark: SparkSession, analyzed: LogicalPlan)
      : (String, Seq[Key], Seq[Measure], Option[String]) = {
    val agg = analyzed match {
      case a: Aggregate => a
      case Project(_, a: Aggregate) => a
      case _ => refuse("the top-level operator is not a GROUP BY " +
        "aggregate")
    }
    // re-rendered expressions must resolve against the CHANGES
    // relation later — bare column names, no table qualifiers
    def bareSql(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : String =
      e.transform {
        case a: AttributeReference => a.withQualifier(Seq.empty)
      }.sql
    // walk to the single base relation, collecting the row filter
    var filter: Option[String] = None
    def leaf(p: LogicalPlan): DataSourceV2Relation = p match {
      case SubqueryAlias(_, c) => leaf(c)
      case Filter(cond, c) =>
        if (!cond.deterministic) refuse("the WHERE clause is " +
          "nondeterministic")
        if (filter.isDefined) refuse("multiple filter layers")
        filter = Some(bareSql(cond))
        leaf(c)
      case Project(exprs, c) if exprs.forall(_.isInstanceOf[Attribute]) =>
        leaf(c)
      case r: DataSourceV2Relation => r
      case other => refuse(s"operator ${other.nodeName} between the " +
        "aggregate and the base table")
    }
    val rel = leaf(agg.child)
    val srcIdent = (rel.catalog, rel.identifier) match {
      case (Some(c: GraftCatalog), Some(id)) =>
        (c.name +: id.namespace.toSeq :+ id.name)
          .map(p => s"`$p`").mkString(".")
      case _ => refuse("the base relation is not a graft catalog table")
    }
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case other => refuse(s"GROUP BY expression `${other.sql}` is not " +
        "a plain column")
    }
    val keys = Seq.newBuilder[Key]
    val measures = Seq.newBuilder[Measure]
    agg.aggregateExpressions.foreach {
      case a: AttributeReference
          if groupAttrs.exists(_.exprId == a.exprId) =>
        keys += Key(a.name, a.name)
      case Alias(a: AttributeReference, nm)
          if groupAttrs.exists(_.exprId == a.exprId) =>
        // aliased group column: the delta select reads the SOURCE name
        // from the change feed and emits it under the OUTPUT name
        keys += Key(nm, a.name)
      case Alias(ae: AggregateExpression, nm) =>
        if (ae.isDistinct) refuse("DISTINCT aggregates are not additive")
        if (ae.filter.isDefined) refuse("FILTER'd aggregates are unsupported")
        ae.aggregateFunction match {
          case Sum(e, _) =>
            e.dataType match {
              case LongType | IntegerType | ShortType | ByteType => ()
              case other => refuse(s"SUM over ${other.simpleString} " +
                "(integral types only — the engine's exact-arithmetic " +
                "convention)")
            }
            measures += Measure(nm, "sum", bareSql(e))
          case Count(children) if children.forall(_.foldable) =>
            // COUNT(*) / COUNT(1): the row counter — liveness-eligible
            measures += Measure(nm, "count", "1")
          case Count(Seq(e)) =>
            // COUNT(col) skips NULLs — it is NOT a row count and must
            // not fold as one (the liveness counter stays COUNT(*));
            // additively it is SUM(col IS NOT NULL)
            measures += Measure(nm, "sum",
              s"(CASE WHEN (${bareSql(e)}) IS NOT NULL THEN 1 ELSE 0 END)")
          case _: Count =>
            refuse("multi-argument COUNT is unsupported")
          case other => refuse(s"aggregate ${other.prettyName} is not " +
            "additive under deletes (supported: SUM, COUNT)")
        }
      case other => refuse(s"output `${other.sql}` is neither a group " +
        "column nor a supported aggregate")
    }
    val ks = keys.result()
    // EVERY grouping column must be selected: a hidden grouping column
    // would make the incremental fold re-group the backing table at a
    // coarser granularity than the stored SQL
    if (ks.size != groupAttrs.size) refuse(
      "every GROUP BY column must appear in the SELECT list (a hidden " +
        "grouping column would collapse the view's granularity on fold)")
    val ms = measures.result()
    if (!ms.exists(_.kind == "count")) refuse(
      "no COUNT(*) measure — counting-IVM needs the liveness counter")
    (srcIdent, ks, ms, filter)
  }

  // ---- create / refresh ---------------------------------------------------

  /** The base table's newest journal commit id, via its `.commits`
    * relation (−1 on an empty journal).
    */
  private def lastCommitOf(spark: SparkSession, source: String): Long = {
    val rows = spark.table(s"$source.commits")
      .agg(fmax(col("commit_id"))).collect()
    if (rows.isEmpty || rows.head.isNullAt(0)) -1L else rows.head.getLong(0)
  }

  private def backingDir(spark: SparkSession, cat: String, ns: String,
      name: String): Path = {
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    new Path(s"$root/$ns/$name")
  }

  /** Build (or rebuild) the backing table at an EXACT base position:
    * read the position, run the build, re-read — if the base moved in
    * between, the build's snapshot is ambiguous (the scan may or may
    * not contain the new commit) and the attempt retries; persistent
    * concurrent writes refuse loudly rather than record a position the
    * incremental fold would then skip or double-apply.
    */
  private def buildAtStablePosition(spark: SparkSession, source: String,
      build: Int => Unit): Long = {
    var attempts = 0
    while (attempts < 3) {
      val before = lastCommitOf(spark, source)
      build(attempts)
      if (lastCommitOf(spark, source) == before) return before
      attempts += 1
    }
    throw new IllegalStateException(
      s"materialized view build: $source is being committed to " +
        "concurrently (3 attempts) — quiesce the writer or retry")
  }

  def create(spark: SparkSession, cat: String, ns: String, name: String,
      bodySql: String, replace: Boolean): Unit = {
    val analyzed = spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(bodySql)).analyzed
    val (source, keys, measures, filter) = extract(spark, analyzed)
    val backing = s"`$cat`.`$ns`.`$name`"
    val pos = buildAtStablePosition(spark, source, attempt => {
      // a retried build has already created the table: replace it
      val orReplace = if (replace || attempt > 0) "OR REPLACE " else ""
      spark.sql(s"CREATE ${orReplace}TABLE $backing AS $bodySql")
      ()
    })
    val dir = backingDir(spark, cat, ns, name)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeMeta(fs, dir, MvMeta(bodySql, source, keys, measures, filter, pos))
  }

  /** Incremental (or `full`) refresh. Returns (change rows folded — −1
    * for a full recompute, the new position).
    *
    * Crash/concurrency posture: the incremental fold is NOT
    * idempotent (re-folding a delta double-counts), so the whole
    * refresh runs under the backing table's commit lock and brackets
    * the replace with a PENDING marker — a crash between the backing
    * rewrite and the position update leaves the marker, and the next
    * incremental refresh REFUSES loudly (full => true recomputes and
    * clears it). Never a silent double-fold, never a silent gap.
    */
  def refresh(spark: SparkSession, cat: String, ns: String, name: String,
      full: Boolean): (Long, Long) = {
    val dir = backingDir(spark, cat, ns, name)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var out: (Long, Long) = (0L, -1L)
    // a DISTINCT lock path (sibling `<name>.__mv.__lock`), not the
    // table's own commit lock: the backing replace takes the table
    // lock itself inside this section, and GraftCommitLock is not
    // reentrant — this mutex serializes REFRESHES against each other
    graft.sources.GraftCommitLock.withLock(fs,
      new Path(dir.getParent, dir.getName + ".__mv"),
      s"mv-refresh:$name") {
      out = refreshLocked(spark, fs, dir, cat, ns, name, full)
    }
    out
  }

  private def pendingPath(dir: Path): Path =
    new Path(dir, SidecarName + ".pending")

  private def refreshLocked(spark: SparkSession, fs: FileSystem,
      dir: Path, cat: String, ns: String, name: String,
      full: Boolean): (Long, Long) = {
    val meta = readMeta(fs, dir).getOrElse(throw new IllegalArgumentException(
      s"$ns.$name is not a materialized view (no MV definition sidecar)"))
    val backing = s"`$cat`.`$ns`.`$name`"
    if (full) {
      val cur = buildAtStablePosition(spark, meta.source, _ => {
        spark.sql(s"CREATE OR REPLACE TABLE $backing AS ${meta.sql}")
        ()
      })
      // the swap dropped the sidecar with the old directory — rewrite
      // it (and thereby clear any pending marker) at the new position
      writeMeta(fs, dir, meta.copy(lastCommit = cur))
      fs.delete(pendingPath(dir), false)
      return (-1L, cur)
    }
    require(!fs.exists(pendingPath(dir)),
      s"$ns.$name: a previous refresh crashed between the backing " +
        "rewrite and its position update — the incremental fold " +
        "cannot tell what was applied; re-run with full => true")
    val cur = lastCommitOf(spark, meta.source)
    if (cur <= meta.lastCommit) return (0L, meta.lastCommit)
    // the signed delta: the refresh reads ONLY commits in
    // (position, cur] — BOTH bounds pushed exactly. The upper bound
    // matters: a base commit landing mid-refresh must not fold now
    // (the recorded position would then skip past it) nor be seen by
    // only one of the two feed passes below.
    // Keyed `upsert` rows are not additive: refuse mid-read.
    val changes = spark.table(s"${meta.source}.changes")
      .where(col("_change_epoch") > meta.lastCommit &&
        col("_change_epoch") <= cur)
    val sign = when(col("_change_type")
        .isin("delete", "update_preimage"), lit(-1L))
      .when(col("_change_type")
        .isin("insert", "update_postimage"), lit(1L))
      .otherwise(expr("CAST(raise_error('materialized-view refresh: " +
        "the change feed served a keyed upsert row — equality-upsert " +
        "history is not additive; use full => true') AS BIGINT)"))
    val filtered = meta.filter.map(f => changes.where(expr(f)))
      .getOrElse(changes)
    // keys read the SOURCE column from the change feed and emit the
    // OUTPUT column (they differ when the body aliases a group column)
    val delta = filtered.select(
      meta.keys.map(k => col(k.src).as(k.out)) ++ meta.measures.map { m =>
        (m.kind match {
          case "count" => sign
          case "sum" => sign * expr(m.exprSql).cast(LongType)
        }).as(m.out)
      }: _*)
    val cols = meta.keys.map(_.out) ++ meta.measures.map(_.out)
    val liveness = meta.measures.find(_.kind == "count").get.out
    val folded = spark.table(backing).select(cols.map(col): _*)
      .unionByName(delta)
      .groupBy(meta.keys.map(k => col(k.out)): _*)
      .agg(fsum(col(meta.measures.head.out)).as(meta.measures.head.out),
        meta.measures.tail.map(m => fsum(col(m.out)).as(m.out)): _*)
      .where(col(liveness) =!= 0L)
      .select(cols.map(col): _*)
    // the fold reads the backing table it replaces: MATERIALIZE the
    // result BEFORE the replace (the RTAS's query would otherwise plan
    // over the already-truncated target)
    val pinned = Materialize.once(folded)
    val nRows = filtered.count()
    pinned.count() // eager: blocks hold the folded state
    val tv = s"g_mv_refresh_${System.nanoTime()}"
    pinned.createOrReplaceTempView(tv)
    // pending marker BEFORE the replace: a crash in between refuses
    // the next incremental fold instead of silently re-applying
    fs.create(pendingPath(dir), true).close()
    try spark.sql(s"CREATE OR REPLACE TABLE $backing AS SELECT * FROM $tv")
    finally {
      spark.catalog.dropTempView(tv)
      Materialize.free(pinned)
    }
    writeMeta(fs, dir, meta.copy(lastCommit = cur))
    fs.delete(pendingPath(dir), false)
    (nRows, cur)
  }
}
