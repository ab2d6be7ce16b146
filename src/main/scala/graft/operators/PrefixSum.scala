package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed GLOBAL prefix sum — the scale-safe form of
  * `SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`, whose window
  * formulation funnels every row through ONE task (empty partition spec).
  *
  * Same decomposition as the dense-key operator (TxnPipeline.withDenseKey):
  * range-partition by the order column (partitions hold disjoint ordered key
  * ranges), sort within partitions, then two passes over the shuffled data —
  * (1) per-partition value totals, collected to the driver (ONE long per
  * partition — metadata, not data) and scanned into per-partition offsets;
  * (2) each partition emits offset + local running sum. Both passes share
  * the range shuffle's files. Exact for integral values (long arithmetic).
  *
  * `orderCol` must be duplicate-free, else prefix values among equal keys
  * are partition-placement-dependent. `valueCol` must not contain nulls:
  * the output column is declared non-nullable, and InternalRow.getLong on a
  * null slot would silently read 0 — a null value row fails fast instead
  * (the window formulation this replaces would yield null running sums, a
  * semantics no caller of an exact prefix sum wants silently) (ADVICE r3).
  */
object PrefixSum {

  def withRunningSum(df: DataFrame, orderCol: String, valueCol: String,
                     outCol: String = "running_sum"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val schema = sorted.schema
    val vIdx = schema.fieldIndex(valueCol)
    val vIsLong = schema.fields(vIdx).dataType match {
      case LongType => true
      case IntegerType => false
      case other => throw new IllegalArgumentException(
        s"withRunningSum needs an int/long value column, got ${other.catalogString}")
    }
    val fieldTypes = schema.fields.map(_.dataType)
    val outSchema = StructType(schema.fields.toSeq :+ StructField(outCol, LongType, nullable = false))
    // the two jobs share this RDD instance, so the range shuffle runs once
    val rdd = sorted.queryExecution.toRdd
    def valueOf(r: org.apache.spark.sql.catalyst.InternalRow): Long = {
      if (r.isNullAt(vIdx))
        throw new IllegalArgumentException(
          s"withRunningSum: null in value column '$valueCol' — an exact prefix " +
            "sum over nulls is undefined; filter or coalesce them first")
      if (vIsLong) r.getLong(vIdx) else r.getInt(vIdx).toLong
    }
    val partSums = rdd
      .mapPartitions(it => Iterator.single(it.foldLeft(0L)((acc, r) => acc + valueOf(r))))
      .collect()
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { row =>
        val r = row.copy()
        acc += valueOf(r)
        val o = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          fieldTypes.length + 1)
        var i = 0
        while (i < fieldTypes.length) { o.update(i, r.get(i, fieldTypes(i))); i += 1 }
        o.update(fieldTypes.length, acc)
        (o: org.apache.spark.sql.catalyst.InternalRow)
      }
    }
    org.apache.spark.sql.graftx.Bridge.fromInternalRows(spark, out, outSchema)
  }
}
