package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column ⇄ Expression converters.
  *
  * Spark 4 hides the Catalyst `Expression` behind a `ColumnNode`; custom
  * native expressions (e.g. [[graft.functions.JsonFlattenExpr]]) need this
  * two-way mapping to be exposed as user-facing `Column`s. Lives under
  * `org.apache.spark.sql` solely for access — the standard technique for
  * third-party Catalyst extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A Column's full Catalyst expression tree. `expression` returns a
    * lazy `ColumnNodeExpression` wrapper (fine inside plans Spark
    * converts itself, but unserializable and opaque to pattern matches);
    * the converter walks the node into the real tree — needed when the
    * expression feeds a CUSTOM logical plan (e.g. the sort keys of
    * [[graft.plans.GlobalRankPlan]]). */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Render a Column's full Catalyst tree as SQL. */
  def sql(c: Column): String = catalystExpression(c).sql

  /** Drain the listener bus so SparkListener-collected task metrics are
    * complete before reading them (listenerBus is private[spark]). */
  def drainListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Wrap a custom logical plan as a DataFrame (classic.Dataset.ofRows is
    * private[sql]) — the entry point for whole-operator custom plans like
    * [[graft.plans.GlobalRankPlan]]. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame's analyzed logical plan (private[sql] on classic.Dataset). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .logicalPlan
}
