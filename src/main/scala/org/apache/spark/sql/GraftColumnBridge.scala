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

  /** Wrap a hand-built logical plan as a DataFrame, and expose a
    * DataFrame's analyzed plan (both private[sql] in Spark 4). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Register an expression-builder function under a SQL name (the
    * FunctionRegistry lives behind private[sql] sessionState). The
    * builder must return a fully-constructed Catalyst expression —
    * Column-API trees contain unresolved ColumnNode wrappers that the
    * analyzer won't resolve inside registry functions. */
  def registerExprFunction(spark: SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
