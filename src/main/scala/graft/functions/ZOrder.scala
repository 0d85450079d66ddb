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

  /** Generalized N-way bit interleave (r11 item 5): result bit
    * `i*k + j` is bit `i` of `vals(j)` — for k = 2 bit-identical to
    * [[morton]] (spread puts x's bit i at 2i, y's at 2i+1). `bits`
    * low bits per column are consumed; `bits * k` must stay ≤ 63 so
    * the code is a non-negative Long and Long ordering IS curve
    * ordering. Inputs are masked to `bits` (callers rescale to the
    * domain first — see the Catalog's curve key).
    */
  def interleave(vals: Array[Long], bits: Int): Long = {
    require(vals.length >= 1 && bits >= 1 && bits * vals.length <= 63,
      s"interleave(${vals.length} cols, $bits bits): need 1..63 total bits")
    val k = vals.length
    var out = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < k) {
        out |= ((vals(j) >>> i) & 1L) << (i * k + j)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Per-column bit budget for a k-way interleave: 16 bits (the
    * rescaled domain) when they fit, else the largest equal share of
    * the 63 usable bits — 3 cols keep 16, 4 cols get 15, 6 get 10.
    */
  def bitsFor(k: Int): Int = math.min(16, 63 / math.max(1, k))
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

/** Codegen'd N-column curve code over long columns
  * ([[ZOrderHelper.interleave]]): the clustering key behind
  * `CALL system.cluster(strategy => 'zorder')` for 3+ columns. NULL
  * in any input yields NULL (clustering sorts NULLs together at the
  * front — harmless for a layout key).
  */
case class ZOrderCode(children: Seq[Expression], bits: Int)
  extends Expression with ImplicitCastInputTypes {
  require(children.nonEmpty && bits * children.length <= 63,
    s"zorder_code(${children.length} cols, $bits bits): over 63 bits")
  override def inputTypes: Seq[DataType] =
    Seq.fill(children.length)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_code"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderHelper.interleave(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    if (nullable) {
      val fill = evals.zipWithIndex.map { case (e, i) =>
        s"""
           |${e.code}
           |if (${e.isNull}) { ${ev.isNull} = true; }
           |else { $arr[$i] = ${e.value}; }
         """.stripMargin
      }.mkString("\n")
      ev.copy(code =
        code"""
          boolean ${ev.isNull} = false;
          long[] $arr = new long[${children.length}];
          $fill
          long ${ev.value} = 0L;
          if (!${ev.isNull}) {
            ${ev.value} =
              graft.functions.ZOrderHelper.interleave($arr, $bits);
          }
        """)
    } else {
      // ev.isNull is the FalseLiteral here — no null plumbing at all
      val fill = evals.zipWithIndex.map { case (e, i) =>
        s"""
           |${e.code}
           |$arr[$i] = ${e.value};
         """.stripMargin
      }.mkString("\n")
      ev.copy(code =
        code"""
          long[] $arr = new long[${children.length}];
          $fill
          long ${ev.value} =
            graft.functions.ZOrderHelper.interleave($arr, $bits);
        """)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCode =
    copy(children = newChildren)
}

object ZOrderCode {
  def of(cols: Seq[org.apache.spark.sql.Column],
         bits: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ZOrderCode(
        cols.map(org.apache.spark.sql.graft.ColumnBridge.expression), bits))
}
