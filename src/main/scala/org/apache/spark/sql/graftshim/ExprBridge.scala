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

  /** DataFrame over a raw logical plan (plan surgery like merge's
    * redundant-branch-sort elimination needs to rebuild a frame).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
