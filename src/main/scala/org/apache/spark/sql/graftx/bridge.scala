/** Minimal bridge into Spark's `private[sql]` surface.
  *
  * Spark 4 made `Column` implementation-agnostic; wrapping a custom Catalyst
  * `Expression` into a `Column` goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * This file lives in the `org.apache.spark.sql` namespace solely to expose
  * those two conversions to the graft engine — the standard pattern used by
  * open-source Spark extension libraries. Nothing else from internals leaks.
  */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
