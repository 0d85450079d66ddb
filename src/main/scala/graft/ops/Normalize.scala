package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift-tolerant conformance to a fixed target schema.
  *
  * Re-expresses `process_covid_raw.py:23-59`:
  *  1. clean column names (strip; `/`, ` `, `-` → `_`);
  *  2. resolve known aliases (Latitude→Lat, Longitude→Long_,
  *     Province/State→Province_State);
  *  3. timestamp fields parse through a multi-format coalesce;
  *  4. found columns cast to the target type;
  *  5. missing columns materialize as typed nulls;
  *  6. positional select guarantees the exact target schema.
  *
  * Pure `DataFrame => DataFrame`; all built-in expressions, fully
  * codegen-friendly, no shuffle — safe at any scale (it's a projection).
  */
object Normalize {

  /** Header-name cleanup (process_covid_raw.py:24-27). */
  def cleanName(c: String): String =
    c.trim.replace("/", "_").replace(" ", "_").replace("-", "_")

  /** Alias resolution map: target column -> accepted source names, in
    * priority order (process_covid_raw.py:36-43). The cleaned name is
    * always tried first.
    */
  val aliases: Map[String, Seq[String]] = Map(
    "Lat" -> Seq("Latitude"),
    "Long_" -> Seq("Longitude"),
    "Province_State" -> Seq("Province_State") // Province/State cleans to this
  )

  /** Multi-format timestamp parse (process_covid_raw.py:47-51).
    *
    * `try_to_timestamp` (not `to_timestamp`): Spark 4 defaults to ANSI
    * mode, where a malformed string is an error; the reference ran
    * non-ANSI Spark 3.5 where it nulls. The drift-tolerance contract is
    * null-on-unparseable, so the try-variant is the faithful mapping.
    */
  def parseTimestamp(c: Column): Column = coalesce(
    try_to_timestamp(c),
    try_to_timestamp(c, lit("M/d/yyyy H:mm")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")))

  /** Conform `df` to `target`: one narrow projection, exact output
    * schema — plus any `keep` columns appended as-is (lineage columns a
    * caller needs to carry through, e.g. a streaming file path).
    */
  def apply(df: DataFrame, target: StructType,
            keep: Seq[String] = Nil): DataFrame = {
    val cleaned = df.toDF(df.columns.map(cleanName).toIndexedSeq: _*)
    val have = cleaned.columns.toSet
    val projected = target.fields.map { field =>
      val source: Option[Column] =
        if (have.contains(field.name)) Some(col(field.name))
        else aliases.getOrElse(field.name, Nil).collectFirst {
          case a if have.contains(a) => col(a)
        }
      val value = source match {
        case Some(c) =>
          field.dataType match {
            case TimestampType => parseTimestamp(c)
            case dt => c.try_cast(dt) // null, not ANSI error, on bad input
          }
        case None => lit(null).cast(field.dataType)
      }
      value.as(field.name)
    }
    cleaned.select((projected.toIndexedSeq ++ keep.map(col)): _*)
  }
}
