package graft.sources

import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HIDDEN-PARTITIONING TRANSFORMS for evolved partition specs (r14
  * verdict item 3 — Iceberg's `days(ts)` / `truncate(col, n)` /
  * `bucket(n, col)` partition transforms, re-expressed over the
  * directory-era machinery of [[GraftEvolved]]).
  *
  * `CALL system.evolve_partitioning(table, add_column => 'days(ts)')`
  * appends a DERIVED field to the spec: new files gain a
  * `ts_day=<utc day>` directory level computed from the row's `ts`,
  * while `ts` itself stays an ordinary DATA column in every era (a
  * transform's source is never directory-only, so reads and row
  * filters are untouched — the one thing the transform adds is
  * planning-time FILE PRUNING). Old-era files simply lack the token
  * and keep row-level filtering, exactly like identity evolution.
  *
  * Pruning is conservative-exact: a pushed predicate on the SOURCE
  * column prunes a tokened file only when the transform's value range
  * provably cannot satisfy it —
  *
  *  - `days(ts)`: the token bounds the file's timestamps to one UTC
  *    day (the same `floorDiv(micros, 86,400e6)` the writer stamped),
  *    so range/equality/IN predicates compare against the day's
  *    closed micro-interval;
  *  - `truncate(col, n)`: every value shares the token prefix —
  *    equality/IN prune when the literal's prefix differs;
  *  - `bucket(n, col)`: equality/IN prune by hashing the literal
  *    (the [[GraftBucket]] planning-time evaluation, the r13 template).
  *
  * Anything else stays unpruned and row-filters — never a wrong drop.
  */
private[graft] object GraftTransforms {

  sealed trait Spec {
    def raw: String
    def source: String
    /** Directory field name the token is laid out under. */
    def fieldName: String
  }
  final case class Days(source: String) extends Spec {
    val raw = s"days($source)"
    val fieldName = s"${source}_day"
  }
  final case class Trunc(source: String, n: Int) extends Spec {
    val raw = s"truncate($source,$n)"
    val fieldName = s"${source}_trunc"
  }
  final case class Bucket(source: String, n: Int) extends Spec {
    val raw = s"bucket($n,$source)"
    val fieldName = s"${source}_bucket"
  }

  private val DaysRe = """(?i)days\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val TruncRe =
    """(?i)truncate\(\s*([A-Za-z0-9_]+)\s*,\s*(\d+)\s*\)""".r
  private val BucketRe =
    """(?i)bucket\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r

  /** None = a plain identity column, not a transform. */
  def parseOpt(s: String): Option[Spec] = s.trim match {
    case DaysRe(c) => Some(Days(c))
    case TruncRe(c, n) => Some(Trunc(c, n.toInt))
    case BucketRe(n, c) => Some(Bucket(c, n.toInt))
    case _ => None
  }

  def isTransform(s: String): Boolean = parseOpt(s).isDefined

  private val MicrosPerDay = 86400000000L

  /** Validate the transform against its source column's type; returns
    * the source field or throws with the operator-facing message.
    */
  def validate(spec: Spec, schema: StructType): StructField = {
    val f = schema.fields.find(_.name.equalsIgnoreCase(spec.source))
      .getOrElse(throw new IllegalArgumentException(
        s"${spec.raw}: source column ${spec.source} is not in the schema"))
    spec match {
      case _: Days => require(
        f.dataType == TimestampType || f.dataType == DateType,
        s"${spec.raw}: days() needs a timestamp or date source, " +
          s"${spec.source} is ${f.dataType.simpleString}")
      case _: Trunc => require(f.dataType == StringType,
        s"${spec.raw}: truncate() needs a string source, " +
          s"${spec.source} is ${f.dataType.simpleString}")
      case b: Bucket =>
        require(b.n > 0, s"${spec.raw}: bucket count must be positive")
        require(GraftBucket.keyType(f.dataType),
          s"${spec.raw}: unsupported bucket key type " +
            f.dataType.simpleString)
    }
    f
  }

  /** Directory token of a catalyst-internal SOURCE value (null stays
    * null — the hive default partition, never pruned).
    */
  def token(spec: Spec, v: Any, dt: DataType): String =
    if (v == null) null
    else spec match {
      case _: Days =>
        val epochDay = dt match {
          case TimestampType => Math.floorDiv(v.asInstanceOf[Long],
            MicrosPerDay)
          case DateType => v.asInstanceOf[Int].toLong
          case other => throw new IllegalStateException(
            s"days() over ${other.simpleString}")
        }
        java.time.LocalDate.ofEpochDay(epochDay).toString
      case t: Trunc =>
        val s = v.toString
        if (s.length <= t.n) s else s.substring(0, t.n)
      case b: Bucket => GraftBucket.of(v, b.n).toString
    }

  // ---- planning-time pruning ---------------------------------------------

  /** The closed micro/day interval a Days token bounds its file to. */
  private def dayBounds(tok: String, dt: DataType)
      : Option[(Long, Long)] =
    try {
      val d = java.time.LocalDate.parse(tok).toEpochDay
      dt match {
        case TimestampType =>
          Some((d * MicrosPerDay, (d + 1) * MicrosPerDay - 1))
        case DateType => Some((d, d))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def litLong(l: Literal): Option[Long] = l.value match {
    case x: java.lang.Long => Some(x.longValue)
    case x: java.lang.Integer => Some(x.longValue)
    case _ => None
  }

  /** Could a file whose transform token is `tok` hold a row satisfying
    * `filter` (a predicate referencing ONLY the source column)? True =
    * keep (never a wrong drop); false = prune, proven impossible.
    */
  def admits(spec: Spec, tok: String, filter: Expression,
      srcType: DataType): Boolean = {
    if (tok == null) return true // default partition: nulls, unprovable
    val unescaped = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.unescapePathName(tok)
    spec match {
      case _: Days =>
        dayBounds(unescaped, srcType) match {
          case None => true
          case Some((lo, hi)) =>
            def ok(e: Expression): Boolean = e match {
              case EqualTo(_: Attribute, l: Literal) =>
                litLong(l).forall(v => v >= lo && v <= hi)
              case EqualTo(l: Literal, _: Attribute) =>
                litLong(l).forall(v => v >= lo && v <= hi)
              case GreaterThan(_: Attribute, l: Literal) =>
                litLong(l).forall(v => hi > v)
              case GreaterThanOrEqual(_: Attribute, l: Literal) =>
                litLong(l).forall(v => hi >= v)
              case LessThan(_: Attribute, l: Literal) =>
                litLong(l).forall(v => lo < v)
              case LessThanOrEqual(_: Attribute, l: Literal) =>
                litLong(l).forall(v => lo <= v)
              case GreaterThan(l: Literal, _: Attribute) =>
                litLong(l).forall(v => lo < v) // v > attr
              case GreaterThanOrEqual(l: Literal, _: Attribute) =>
                litLong(l).forall(v => lo <= v)
              case LessThan(l: Literal, _: Attribute) =>
                litLong(l).forall(v => hi > v)
              case LessThanOrEqual(l: Literal, _: Attribute) =>
                litLong(l).forall(v => hi >= v)
              case In(_: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
                vs.exists(l => litLong(l.asInstanceOf[Literal])
                  .forall(v => v >= lo && v <= hi))
              case _ => true
            }
            ok(filter)
        }
      case t: Trunc =>
        def pfx(l: Literal): Option[String] = l.value match {
          case s: UTF8String =>
            val str = s.toString
            Some(if (str.length <= t.n) str else str.substring(0, t.n))
          case _ => None
        }
        filter match {
          case EqualTo(_: Attribute, l: Literal) =>
            pfx(l).forall(_ == unescaped)
          case EqualTo(l: Literal, _: Attribute) =>
            pfx(l).forall(_ == unescaped)
          case In(_: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
            vs.exists(l => pfx(l.asInstanceOf[Literal])
              .forall(_ == unescaped))
          case _ => true
        }
      case b: Bucket =>
        def bucketOf(l: Literal): Option[String] = l.value match {
          case null => None
          case v => Some(GraftBucket.of(v, b.n).toString)
        }
        filter match {
          case EqualTo(_: Attribute, l: Literal) =>
            bucketOf(l).forall(_ == unescaped)
          case EqualTo(l: Literal, _: Attribute) =>
            bucketOf(l).forall(_ == unescaped)
          case In(_: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
            vs.exists(l => bucketOf(l.asInstanceOf[Literal])
              .forall(_ == unescaped))
          case _ => true
        }
    }
  }
}
