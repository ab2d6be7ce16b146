/** Minimal bridge into Spark's `private[sql]` surface.
  *
  * Spark 4 made `Column` implementation-agnostic; wrapping a custom Catalyst
  * `Expression` into a `Column` goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * This file lives in the `org.apache.spark.sql` namespace solely to expose
  * those conversions (plus the converter-free InternalRow→DataFrame
  * constructor) to the graft engine — the standard pattern used by
  * open-source Spark extension libraries. Nothing else from internals leaks.
  */
package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `createDataFrame` without the Row↔InternalRow converter round-trip:
    * per-partition operators (dense-key zipWithIndex) read InternalRows
    * straight off the physical plan and hand them back with zero per-row
    * conversion (`internalCreateDataFrame` is `private[sql]`).
    */
  def fromInternalRows(spark: org.apache.spark.sql.SparkSession,
                       rows: RDD[InternalRow], schema: StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema)
}
