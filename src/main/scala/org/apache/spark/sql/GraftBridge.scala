package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters that
  * Spark 4 moved behind `org.apache.spark.sql.classic.ExpressionUtils`.
  * Lets graft expose custom Catalyst expressions as user-facing Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** CAUTION: converting a Column to its Catalyst expression and then
    * REUSING the original Column can poison it — observed concretely
    * with sort-order columns (`col.desc`): after an `expression()` probe
    * the Column no longer pattern-matches as a SortOrder node in
    * `WindowSpec.orderBy`, gets double-wrapped, and the job dies with
    * "Cannot evaluate expression: ... DESC NULLS LAST" at runtime.
    * Treat the conversion as CONSUMING: either use only the returned
    * Expression (wrapped back via [[column]]), or don't convert at all.
    */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A scalar-subquery expression over a 1-row/1-column Dataset — the
    * shape the optimizer's runtime-filter injection uses to hand a
    * Bloom-filter binary to `might_contain` (which rejects plain joined
    * columns). The subquery executes once and its result is shared.
    */
  def scalarSubquery(df: Dataset[_]): Expression =
    catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed)

  /** The analyzed logical plan behind a Dataset — the resolved-attribute
    * tree custom logical operators (graft.plans) build on.
    */
  def analyzed(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame — the
    * constructor for custom logical operators.
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a function builder on an EXISTING session (the
    * FunctionRegistry lives behind `private[sql] sessionState`; new
    * sessions should prefer `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
