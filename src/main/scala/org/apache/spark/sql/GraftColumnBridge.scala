package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression conversion so
  * graft's native Catalyst expressions (e.g. graft.functions.DotProduct)
  * can be exposed as Columns. Spark 4 split the public Column API from
  * the classic implementation; ExpressionUtils is private[sql], so this
  * one-file shim lives in the org.apache.spark.sql package. No other
  * Spark internals are touched.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
