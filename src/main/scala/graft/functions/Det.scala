package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic aggregation helpers.
  *
  * Floating-point SUM/AVG depend on accumulation order, which differs between
  * Spark partial/final aggregation and any single-threaded oracle — and even
  * between two Spark runs with different partitioning. At 100 TB that
  * nondeterminism is guaranteed. We aggregate money-like doubles through
  * DecimalType (exact, associative, order-independent) and cast the final
  * result back to double. Decimal partial aggregation stays inside
  * whole-stage codegen, so the cost is a few percent over double sums.
  */
object Det {

  /** Exact sum of a 2-decimal money column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum for computed per-row doubles (e.g. price*(1-discount)):
    * 6 fractional digits preserved before the order-independent sum.
    */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast(DoubleType)

  /** Order-independent mean: exact decimal sum divided by count, in doubles. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Two-level exact sum, for aggregate-then-join rewrites that re-aggregate
    * a pre-aggregated frame: the partial KEEPS the decimal (casting to
    * double between levels would reintroduce order-dependent rounding), the
    * merge sums the decimals and converts once at the end. Exactness makes
    * the two-level total bit-equal to the one-pass [[dsum]].
    */
  def dsumPartial(c: Column): Column = sum(c.cast(DecimalType(18, 2)))
  def dsum6Partial(c: Column): Column = sum(c.cast(DecimalType(24, 6)))
  def dsumMerge(c: Column): Column = sum(c).cast(DoubleType)

  /** SQL fragments for the DuckDB oracle mirroring the above. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDsum6(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(24,6))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"(${sqlDsum(expr)} / COUNT(*))"
}
