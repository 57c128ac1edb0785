package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Lives in the o.a.s.sql namespace to reach the private[sql] Column ↔
  * Expression converters (Spark 4 Columns wrap ColumnNodes, not
  * Expressions). This is the one place the engine touches Spark
  * internals; everything else goes through graft.functions.Bridge.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
