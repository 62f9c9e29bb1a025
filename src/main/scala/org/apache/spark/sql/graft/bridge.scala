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

  /** Render a Column's full Catalyst tree as SQL. `expression` returns a
    * lazy `ColumnNodeExpression` wrapper (whose `.sql` is just the wrapper
    * name); the converter walks the node into the real expression tree. */
  def sql(c: Column): String =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node).sql

  /** Drain the listener bus so SparkListener-collected task metrics are
    * complete before reading them (listenerBus is private[spark]). */
  def drainListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
