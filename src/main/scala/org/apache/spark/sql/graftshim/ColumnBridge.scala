package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API bridge for custom Catalyst expressions: Spark 4 made
  * Column↔Expression conversion `private[sql]`
  * (classic/columnNodeSupport.scala), so the engine's native
  * expressions ([[graft.functions.VectorExprs]]) reach it through this
  * in-package shim — the standard extension-library interop shape. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
