package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters, so
  * graft's custom Catalyst expressions (e.g. FloatDotProduct) can be
  * exposed as ordinary `Column`s. Standard extension-package pattern:
  * Spark 4 routes Column construction through
  * `classic.ExpressionUtils` (columnNodeSupport.scala) and no longer
  * offers a public constructor.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a custom expression under a SQL-callable name in an
    * existing session (for sessions not built with GraftExtensions).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
