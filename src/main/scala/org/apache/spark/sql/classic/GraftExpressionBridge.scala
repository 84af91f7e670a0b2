package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Catalyst-Expression converters.
  *
  * Spark 4 made `Column` carry an abstract `ColumnNode` (connect/classic
  * split) and hid the classic converters behind `private[sql]`; a library
  * shipping a native [[graft.functions.expr.DotLong]]-style expression
  * needs exactly these two hooks and nothing else from the internals.
  * Confined to this one file so the rest of graft stays on public API.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]` in the classic module) — the whole-operator hook
    * [[graft.plans.AsOf]] rides: build a [[graft.plans.AsOfJoinPlan]]
    * from analyzed children, hand it here, let the injected strategy
    * plan it. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
