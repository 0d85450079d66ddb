package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the Column ⇄ Expression conversions `private[sql]`
  * (columnNodeSupport.scala); libraries that ship native Catalyst
  * expressions expose them through a shim inside the sql package
  * namespace. This is the only internal surface graft touches.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
