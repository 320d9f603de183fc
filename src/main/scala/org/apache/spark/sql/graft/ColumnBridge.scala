package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the classic-session Column factory (`private[sql]` in
  * Spark 4) for expressions that cannot route through the function
  * registry — e.g. [[graft.plans.NearestCentroid]], which carries a
  * driver-built broadcast kernel no SQL literal can encode. The
  * standard ecosystem pattern for Catalyst-extension libraries: one
  * tiny object inside the `org.apache.spark.sql` namespace, nothing
  * else of Spark's internals re-exported.
  */
object ColumnBridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
