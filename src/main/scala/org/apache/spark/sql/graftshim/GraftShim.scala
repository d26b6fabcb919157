package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` bridge the custom-operator tier needs: turn a
  * hand-built LogicalPlan into a DataFrame. Lives under
  * `org.apache.spark.sql` for qualified-private access — the standard
  * pattern used by public Spark extension libraries; everything else in
  * graft stays on public API.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column → catalyst Expression, EAGERLY converted (Spark 4 hides
    * `Column.expr` behind the Connect-compatible ColumnNode API, and the
    * lazy `ExpressionUtils.expression` wrapper keeps a non-serializable
    * ColumnNode inside until the analyzer converts it — which never
    * happens for expressions embedded in a custom logical node's params).
    */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** The inverse bridge: wrap a catalyst Expression as a Column, so
    * function builders can be DERIVED from the Column-API definitions
    * instead of duplicating the expression tree by hand.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
