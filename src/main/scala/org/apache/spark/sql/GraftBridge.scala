package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters that
  * Spark 4 moved behind `org.apache.spark.sql.classic.ExpressionUtils`.
  * Lets graft expose custom Catalyst expressions as user-facing Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder on an EXISTING session (the
    * FunctionRegistry lives behind `private[sql] sessionState`; new
    * sessions should prefer `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
