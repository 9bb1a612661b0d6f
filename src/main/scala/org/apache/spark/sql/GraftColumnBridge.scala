package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column⇄Expression conversions, needed
  * to register custom Catalyst aggregates (graft.functions.HllSketchAgg) as
  * user-facing Columns on Spark 4's split Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
