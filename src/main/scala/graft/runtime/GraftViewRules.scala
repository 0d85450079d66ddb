package graft.runtime

import scala.util.control.NonFatal

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.sources.GraftCatalog

/** V2 VIEW support for [[GraftCatalog]] warehouses (r14 verdict item 7
  * — the dashboard-shaped named-relation layer the reference's
  * Superset path implies, compose.yaml: Superset queries Trino views).
  *
  * Spark 4.1 ships the [[org.apache.spark.sql.connector.catalog
  * .ViewCatalog]] INTERFACE but wires nothing to it: the analyzer's
  * ResolveSessionCatalog hard-errors `CREATE VIEW` against any v2
  * catalog (MISSING_CATALOG_ABILITY — verified against the 4.1.2
  * bytecode: no sql/catalyst class references ViewCatalog). The
  * engine therefore wires it itself, the way Iceberg's Spark
  * extensions do:
  *
  *  - a PARSER wrapper intercepts the view DDL plans (CreateView,
  *    DropView, ShowViews, AlterViewAs, Set/UnsetViewProperties,
  *    RenameTable(isView)) whose target identifier names a
  *    [[GraftCatalog]], BEFORE the analyzer can reject them, and
  *    plans them as runnable commands against the catalog's
  *    ViewCatalog implementation;
  *  - a RESOLUTION rule expands reads: an [[UnresolvedRelation]]
  *    naming a stored view re-parses its SQL with relation references
  *    qualified under the view's CAPTURED catalog/namespace context
  *    (views mean what they meant where they were defined), applies
  *    the positional column aliases, and lets the fixed point resolve
  *    the expansion — a view over an evolved or time-traveling table
  *    reads through the full scan machinery for free.
  *
  * View DEFINITIONS are validated at CREATE (the query is analyzed;
  * a broken reference refuses immediately) and resolved fresh at
  * every read (schema-binding semantics: the view tracks its tables).
  */
object GraftViewRules {

  private[runtime] def graftCatalog(spark: SparkSession, name: String)
      : Option[GraftCatalog] =
    try spark.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case NonFatal(_) => None }

  /** (catalog plugin name, namespace, view name) when the identifier
    * names a graft catalog 2-level target.
    */
  private def target(spark: SparkSession, parts: Seq[String])
      : Option[(String, String, String)] = parts match {
    case Seq(cat, ns, name) if graftCatalog(spark, cat).isDefined =>
      Some((cat, ns, name))
    case _ => None
  }

  private def identOf(child: LogicalPlan): Option[Seq[String]] =
    child match {
      case u: UnresolvedIdentifier => Some(u.nameParts)
      case u: UnresolvedRelation => Some(u.multipartIdentifier)
      case u: UnresolvedNamespace => Some(u.multipartIdentifier)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedView =>
        Some(u.multipartIdentifier)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
        Some(u.multipartIdentifier)
      case _ => None
    }

  /** Qualify 1-/2-part relation references inside a view body under
    * its captured definition context.
    */
  private[runtime] def qualified(plan: LogicalPlan, currentCatalog: String,
      currentNamespace: Array[String]): LogicalPlan =
    plan.transformDownWithSubqueries {
      case u: UnresolvedRelation if u.multipartIdentifier.length < 3 =>
        val q = u.multipartIdentifier match {
          case Seq(one) if currentNamespace.length == 1 =>
            Seq(currentCatalog, currentNamespace.head, one)
          case Seq(ns, nm) => Seq(currentCatalog, ns, nm)
          case other => other
        }
        u.copy(multipartIdentifier = q)
    }

  def install(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) =>
      new GraftViewAwareParser(session, delegate))
    ext.injectResolutionRule(session => new GraftViewResolution(session))
  }

  /** Parser wrapper: delegates everything, rewrites view DDL whose
    * target lives in a graft catalog into runnable commands.
    */
  final class GraftViewAwareParser(session: SparkSession,
      delegate: ParserInterface) extends ParserInterface {

    override def parsePlan(sqlText: String): LogicalPlan =
      // MATERIALIZED VIEW DDL first: Spark's grammar has no such
      // production, so it must divert BEFORE delegation
      GraftMaterializedViews.parseDdl(session, sqlText, delegate)
        .getOrElse(rewrite(delegate.parsePlan(sqlText)))

    private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
      case cv: CreateView =>
        identOf(cv.child).flatMap(target(session, _)) match {
          case Some((cat, ns, name)) =>
            GraftCreateViewCommand(cat, ns, name,
              cv.userSpecifiedColumns.map(_._1),
              cv.comment, cv.properties,
              cv.originalText.getOrElse(throw new IllegalArgumentException(
                "CREATE VIEW needs a SQL body")),
              cv.allowExisting, cv.replace)
          case None => cv
        }
      case dv @ DropView(child, ifExists) =>
        identOf(child).flatMap(target(session, _)) match {
          case Some((cat, ns, name)) =>
            GraftDropViewCommand(cat, ns, name, ifExists)
          case None => dv
        }
      case sv @ ShowViews(ns0, pattern, output) =>
        identOf(ns0) match {
          case Some(Seq(cat, ns)) if graftCatalog(session, cat).isDefined =>
            GraftShowViewsCommand(cat, ns, pattern, output)
          case _ => sv
        }
      case av @ AlterViewAs(child, originalText, _) =>
        identOf(child).flatMap(target(session, _)) match {
          case Some((cat, ns, name)) =>
            GraftAlterViewAsCommand(cat, ns, name, originalText)
          case None => av
        }
      case sp @ SetViewProperties(child, props) =>
        identOf(child).flatMap(target(session, _)) match {
          case Some((cat, ns, name)) =>
            GraftViewPropsCommand(cat, ns, name, props, Nil)
          case None => sp
        }
      case up @ UnsetViewProperties(child, keys, _) =>
        identOf(child).flatMap(target(session, _)) match {
          case Some((cat, ns, name)) =>
            GraftViewPropsCommand(cat, ns, name, Map.empty, keys)
          case None => up
        }
      case rt @ RenameTable(child, newName, true) =>
        identOf(child).flatMap(target(session, _)) match {
          case Some((cat, ns, name)) =>
            GraftRenameViewCommand(cat, ns, name, newName)
          case None => rt
        }
      case other => other
    }

    override def parsePlanWithParameters(sqlText: String,
        ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
        : LogicalPlan =
      GraftMaterializedViews.parseDdl(session, sqlText, delegate)
        .getOrElse(rewrite(delegate.parsePlanWithParameters(sqlText, ctx)))
    override def parseExpression(s: String): Expression =
      delegate.parseExpression(s)
    override def parseTableIdentifier(s: String): TableIdentifier =
      delegate.parseTableIdentifier(s)
    override def parseFunctionIdentifier(s: String): FunctionIdentifier =
      delegate.parseFunctionIdentifier(s)
    override def parseMultipartIdentifier(s: String): Seq[String] =
      delegate.parseMultipartIdentifier(s)
    override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
    override def parseRoutineParam(s: String): StructType =
      delegate.parseRoutineParam(s)
    override def parseDataType(s: String)
        : org.apache.spark.sql.types.DataType = delegate.parseDataType(s)
    override def parseTableSchema(s: String): StructType =
      delegate.parseTableSchema(s)
  }

  /** Read-side view expansion (schema-binding: re-resolved fresh). */
  final class GraftViewResolution(session: SparkSession)
    extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      // tree-pattern pruned: the analyzer fixed point re-runs every
      // resolution rule per iteration — without the guard this rule
      // would re-probe viewExists (a filesystem call) for plans that
      // hold no unresolved relation at all
      plan.resolveOperatorsUpWithPruning(
        _.containsPattern(org.apache.spark.sql.catalyst.trees
          .TreePattern.UNRESOLVED_RELATION)) {
        case u: UnresolvedRelation if !u.isStreaming =>
          expandIfView(u).getOrElse(u)
      }

    private def expandIfView(u: UnresolvedRelation): Option[LogicalPlan] = {
      val parts = u.multipartIdentifier match {
        case p @ Seq(_, _, _) => p
        case Seq(ns, nm) =>
          Seq(session.sessionState.catalogManager.currentCatalog.name(),
            ns, nm)
        case _ => return None
      }
      val g = graftCatalog(session, parts.head).getOrElse(return None)
      val ident = Identifier.of(Array(parts(1)), parts(2))
      if (!g.viewExists(ident)) return None
      val v = g.loadView(ident)
      val parsed = session.sessionState.sqlParser.parsePlan(v.query)
      val ctxed = qualified(parsed, v.currentCatalog, v.currentNamespace)
      val aliased =
        if (v.columnAliases.isEmpty) ctxed
        else UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq, ctxed)
      SubqueryAlias(parts(2), aliased) match {
        case sa => Some(sa)
      }
    }
  }

  private def catalogOf(spark: SparkSession, cat: String): GraftCatalog =
    graftCatalog(spark, cat).getOrElse(
      throw new IllegalStateException(s"$cat is not a graft catalog"))

  final case class GraftCreateViewCommand(cat: String, ns: String,
      name: String, columnAliases: Seq[String], comment: Option[String],
      properties: Map[String, String], sql: String,
      allowExisting: Boolean, replace: Boolean)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val g = catalogOf(spark, cat)
      val ident = Identifier.of(Array(ns), name)
      if (allowExisting && g.viewExists(ident)) return Nil
      // validate the body NOW: analysis failures refuse at CREATE,
      // exactly like session-catalog views
      val analyzed = spark.sessionState
        .executePlan(spark.sessionState.sqlParser.parsePlan(sql)).analyzed
      require(columnAliases.isEmpty ||
        columnAliases.length == analyzed.schema.length,
        s"CREATE VIEW $name: ${columnAliases.length} column aliases for " +
          s"a ${analyzed.schema.length}-column query")
      val props = new java.util.HashMap[String, String]()
      properties.foreach { case (k, vv) => props.put(k, vv) }
      comment.foreach(c => props.put(
        org.apache.spark.sql.connector.catalog.ViewCatalog.PROP_COMMENT, c))
      val mgr = spark.sessionState.catalogManager
      val info = new ViewInfo(ident, sql, mgr.currentCatalog.name(),
        mgr.currentNamespace, analyzed.schema,
        analyzed.schema.fieldNames, columnAliases.toArray,
        new Array[String](columnAliases.length), props)
      if (replace) g.replaceView(info, true) else g.createView(info)
      Nil
    }
  }

  final case class GraftDropViewCommand(cat: String, ns: String,
      name: String, ifExists: Boolean) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val dropped = catalogOf(spark, cat)
        .dropView(Identifier.of(Array(ns), name))
      if (!dropped && !ifExists)
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchViewException(Identifier.of(Array(ns), name))
      Nil
    }
  }

  final case class GraftShowViewsCommand(cat: String, ns: String,
      pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val views = catalogOf(spark, cat).listViews(ns)
      views.toSeq
        .filter(v => pattern.forall(p =>
          org.apache.spark.sql.catalyst.util.StringUtils
            .filterPattern(Seq(v.name), p).nonEmpty))
        .map(v => Row(ns, v.name, false))
    }
  }

  final case class GraftAlterViewAsCommand(cat: String, ns: String,
      name: String, sql: String) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val g = catalogOf(spark, cat)
      val ident = Identifier.of(Array(ns), name)
      val old = g.loadView(ident)
      val analyzed = spark.sessionState
        .executePlan(spark.sessionState.sqlParser.parsePlan(sql)).analyzed
      val mgr = spark.sessionState.catalogManager
      g.replaceView(new ViewInfo(ident, sql, mgr.currentCatalog.name(),
        mgr.currentNamespace, analyzed.schema, analyzed.schema.fieldNames,
        Array.empty, Array.empty, old.properties), false)
      Nil
    }
  }

  final case class GraftViewPropsCommand(cat: String, ns: String,
      name: String, set: Map[String, String], unset: Seq[String])
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.connector.catalog.ViewChange
      val changes: Seq[ViewChange] =
        set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
          unset.map(ViewChange.removeProperty)
      catalogOf(spark, cat)
        .alterView(Identifier.of(Array(ns), name), changes: _*)
      Nil
    }
  }

  final case class GraftRenameViewCommand(cat: String, ns: String,
      name: String, newName: Seq[String]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val (nns, nn) = newName match {
        case Seq(n) => (ns, n)
        case Seq(n1, n2) => (n1, n2)
        case other => throw new IllegalArgumentException(
          s"rename target must be [ns.]name, got ${other.mkString(".")}")
      }
      catalogOf(spark, cat).renameView(Identifier.of(Array(ns), name),
        Identifier.of(Array(nns), nn))
      Nil
    }
  }
}
