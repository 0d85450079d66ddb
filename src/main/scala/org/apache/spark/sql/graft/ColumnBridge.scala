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

  /** Eagerly CONVERTED Catalyst expression for a Column. `expression`
    * returns a lazy ColumnNodeExpression wrapper, which only classic
    * Dataset API entry points unwrap — embedded directly in a custom
    * LogicalPlan it would reach execution unconverted (Unevaluable).
    * Custom plan builders must use this instead.
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** DataFrame over a custom LogicalPlan (Dataset.ofRows is
    * private[sql]) — the entry point for whole-operator extensions
    * like graft.plans.TopKPerGroup.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
