package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) multi-dimensional clustering — warehouse scale
  * layout #3, complementing date partitioning (#1, listing-time pruning on
  * ONE time dimension) and bucketing (#2, exchange-free joins on ONE key):
  * interleaving the bits of TWO scaled column ranks orders rows along a
  * space-filling curve, so every written file holds a spatially-local
  * rectangle of (A, B) space and its parquet min/max footer stats are
  * tight on BOTH columns. Range predicates on EITHER dimension then skip
  * most row groups at read — the property a linear `ORDER BY a, b` layout
  * only gives its leading column (the Delta/Iceberg `OPTIMIZE ZORDER`
  * mechanism, built here from plain codegen'd bit arithmetic).
  *
  * The curve key is layout-only metadata: it never reaches query results,
  * so double-precision lane scaling needs no cross-engine determinism
  * treatment (unlike every value an oracle compares).
  */
object ZOrder {

  /** 32-bit Morton code over two 16-bit lanes (bit i of `a` at position
    * 2i+1, of `b` at 2i) — 64 codegen'd shift/mask/or ops, no UDF.
    */
  def interleave16(aLane: Column, bLane: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(aLane, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(bLane, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Min/max-scale a numeric column into the 16-bit lane [0, 65535];
    * a degenerate (constant) range collapses to lane 0.
    */
  def lane16(c: Column, lo: Double, hi: Double): Column =
    if (!(hi > lo)) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      ((c.cast("double") - lo) / (hi - lo) * 65535.0).cast("long")))

  /** Temporal columns become epoch numbers before lane scaling (timestamp
    * and NTZ → microseconds, date → days); everything else casts straight
    * to double. NTZ reinterprets through session-TZ timestamp — fine for a
    * layout key, where only ORDER matters, not the absolute value.
    */
  private def asNumeric(df: DataFrame, c: Column): Column = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    df.select(c).schema.head.dataType match {
      case TimestampType => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case DateType => unix_date(c)
      case _ => c
    }
  }

  /** The Morton key for `df`'s (colA, colB). NOTE: runs ONE EAGER min/max
    * aggregation over `df` at call time (four doubles to the driver —
    * metadata, but a full scan); callers re-keying the same table or
    * using known domain bounds should compute bounds once and use
    * [[zValueWith]]. Lanes and interleave are pure codegen'd
    * expressions. Columns may be numeric, date, or timestamp (see
    * [[asNumeric]]).
    */
  def zValue(df: DataFrame, colA: Column, colB: Column): Column = {
    val (na, nb) = (asNumeric(df, colA), asNumeric(df, colB))
    val b = df.agg(
      min(na.cast("double")), max(na.cast("double")),
      min(nb.cast("double")), max(nb.cast("double"))).head()
    interleave16(
      lane16(na, b.getDouble(0), b.getDouble(1)),
      lane16(nb, b.getDouble(2), b.getDouble(3)))
  }

  /** [[zValue]] with caller-supplied lane bounds — no corpus action at
    * construction time; use for repeated re-keying or fixed domains
    * (values outside the bounds clamp to the lane edges).
    */
  def zValueWith(df: DataFrame, colA: Column, colB: Column,
                 boundsA: (Double, Double), boundsB: (Double, Double)): Column =
    interleave16(
      lane16(asNumeric(df, colA), boundsA._1, boundsA._2),
      lane16(asNumeric(df, colB), boundsB._1, boundsB._2))

  /** Write `df` Z-ordered by (colA, colB) into ~`numFiles` files: range-
    * partition on the Morton key (each partition owns a contiguous curve
    * segment = a local rectangle of (A, B) space), sort within partitions,
    * drop the key (a projection after the sort keeps intra-partition
    * order), write. Reads back as an ordinary parquet table whose row
    * groups skip on range predicates over EITHER column.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: Column, colB: Column,
                    numFiles: Int = 32): Unit = {
    require(numFiles > 0, s"numFiles $numFiles must be positive")
    df.withColumn("_zorder", zValue(df, colA, colB))
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
      .write.mode("overwrite").parquet(path)
  }
}
