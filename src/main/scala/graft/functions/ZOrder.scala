package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving — the space-filling-curve key behind
  * multi-column data clustering (Delta/Iceberg OPTIMIZE ZORDER, public
  * literature: Morton 1966). Sorting or range-partitioning by the
  * interleaved code makes files tight in BOTH dimensions at once, so
  * min/max row-group skipping prunes scans filtered on either column —
  * a total sort by (x, y) only prunes the leading one.
  *
  * The bit spread is the classic magic-number doubling; each step is
  * published constants, SQL-portable (`&`, `|`, `<<` on BIGINT), so an
  * oracle can replay codes exactly ([[ZOrderHelper.spreadSqlSteps]]).
  */
object ZOrderHelper {
  /** Spread the low 16 bits of v to even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit Morton code of two 16-bit values (inputs masked). */
  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** The SAME spread as SQL text over column expression `v` — one
    * nested expression, generated from the identical constants so the
    * oracle can never drift from the JVM implementation.
    */
  def spreadSql(v: String): String = {
    val s0 = s"(($v) & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}

/** Codegen'd Morton-code expression over two long columns. */
case class MortonCode(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "morton_code"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderHelper.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderHelper.morton($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}

object MortonCode {
  def apply(x: org.apache.spark.sql.Column,
            y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MortonCode(
        org.apache.spark.sql.graft.ColumnBridge.expression(x),
        org.apache.spark.sql.graft.ColumnBridge.expression(y)))
}
