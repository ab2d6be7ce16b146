package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Distributed GROUPED prefix sum — the scale-safe form of
    * `SUM(v) OVER (PARTITION BY g ORDER BY k ROWS UNBOUNDED PRECEDING)`
    * when the partition key is LOW-CARDINALITY: the window formulation
    * hash-exchanges the whole input onto |g| tasks (3 order statuses = 3
    * tasks sorting a third of a 100 TB table each — VERDICT r10 #1); this
    * operator range-partitions on (group ++ order) instead, so every task
    * holds a bounded contiguous slice and groups spanning partitions are
    * stitched by driver-side offsets:
    *
    *   1. range-shuffle by (group ++ order), sort within partitions — a
    *      group's rows are contiguous ACROSS partition boundaries;
    *   2. per partition, one total per contained group, collected to the
    *      driver and scanned in partition order into per-(partition, group)
    *      offsets — contiguity bounds the collect at |groups| +
    *      |partitions| − 1 rows (each partition boundary splits at most
    *      one group), metadata, not data;
    *   3. each partition emits offset + local running sum per group.
    *
    * Both passes share the range shuffle's files. Values may be int/long
    * (exact long arithmetic, output long) or DECIMAL with precision ≤ 18
    * (exact unscaled-long arithmetic, output DECIMAL(38, s) — so
    * `SUM(decimal)` window semantics carry over bit-for-bit); either way
    * overflow fails fast via Math.addExact rather than wrapping.
    *
    * `groupCols ++ orderCols` must be duplicate-free (else prefix values
    * among equal keys are partition-placement-dependent) and `valueCol`
    * null-free, as in [[withRunningSum]]. Group columns may be any atomic
    * type (string/integral/date/decimal); null group values form their own
    * group, as SQL's PARTITION BY does.
    */
  def withGroupedRunningSum(df: DataFrame, groupCols: Seq[String],
                            orderCols: Seq[String], valueCol: String,
                            outCol: String = "running_sum"): DataFrame = {
    require(groupCols.nonEmpty,
      "withGroupedRunningSum needs group columns; use withRunningSum for the global form")
    val spark = df.sparkSession
    val keyCols = (groupCols ++ orderCols).map(col)
    val sorted = df.repartitionByRange(keyCols: _*).sortWithinPartitions(keyCols: _*)
    val schema = sorted.schema
    val vIdx = schema.fieldIndex(valueCol)
    val gIdxs = groupCols.map(schema.fieldIndex).toArray
    val gTypes = gIdxs.map(schema.fields(_).dataType)
    // value codec: how to read a row's value as an exact long, and how the
    // accumulated long maps back to an output column type
    val (decScale, outType) = schema.fields(vIdx).dataType match {
      case LongType | IntegerType => (-1, LongType: DataType)
      case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
        (d.scale, DecimalType(DecimalType.MAX_PRECISION, d.scale): DataType)
      case other => throw new IllegalArgumentException(
        s"withGroupedRunningSum needs an int/long/decimal(p<=18) value column, " +
          s"got ${other.catalogString}")
    }
    val decPrecision = schema.fields(vIdx).dataType match {
      case d: DecimalType => d.precision
      case _ => -1
    }
    val vIsLong = schema.fields(vIdx).dataType == LongType
    val fieldTypes = schema.fields.map(_.dataType)
    val outSchema = StructType(
      schema.fields.toSeq :+ StructField(outCol, outType, nullable = false))
    def valueOf(r: InternalRow): Long = {
      if (r.isNullAt(vIdx))
        throw new IllegalArgumentException(
          s"withGroupedRunningSum: null in value column '$valueCol' — an exact " +
            "prefix sum over nulls is undefined; filter or coalesce them first")
      if (decScale >= 0) r.getDecimal(vIdx, decPrecision, decScale).toUnscaledLong
      else if (vIsLong) r.getLong(vIdx)
      else r.getInt(vIdx).toLong
    }
    // the two jobs share this RDD instance, so the range shuffle runs once
    val rdd = sorted.queryExecution.toRdd
    // pass 1: one (group, total) per contained group per partition, in
    // partition-sort order (groups are contiguous runs after the sort)
    val partials: Array[(Int, Array[(List[Any], Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(List[Any], Long)]
        var curKey: List[Any] = null
        var acc = 0L
        var has = false
        it.foreach { r =>
          val k = groupKeyOf(r, gIdxs, gTypes)
          if (!has || k != curKey) {
            if (has) buf += ((curKey, acc))
            curKey = k; acc = 0L; has = true
          }
          acc = Math.addExact(acc, valueOf(r))
        }
        if (has) buf += ((curKey, acc))
        Iterator.single((pid, buf.toArray))
      }.collect()
    // driver scan in partition order: offset(pid, g) = sum of g's partials
    // in partitions < pid (range partitioning makes each group contiguous,
    // so every per-pid key list is duplicate-free)
    val perPid = Array.fill(rdd.getNumPartitions)(Array.empty[(List[Any], Long)])
    partials.foreach { case (pid, arr) => perPid(pid) = arr }
    val running = scala.collection.mutable.HashMap.empty[List[Any], Long]
    val offsets: Array[Map[List[Any], Long]] = perPid.map { arr =>
      val snapshot = arr.map { case (k, _) => k -> running.getOrElse(k, 0L) }.toMap
      arr.foreach { case (k, s) =>
        running(k) = Math.addExact(running.getOrElse(k, 0L), s)
      }
      snapshot
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: per-partition running sums seeded from the offsets
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bcOffsets.value(pid)
      var curKey: List[Any] = null
      var acc = 0L
      var has = false
      it.map { row =>
        val r = row.copy()
        val k = groupKeyOf(r, gIdxs, gTypes)
        if (!has || k != curKey) {
          curKey = k; acc = off.getOrElse(k, 0L); has = true
        }
        acc = Math.addExact(acc, valueOf(r))
        val o = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          fieldTypes.length + 1)
        var i = 0
        while (i < fieldTypes.length) { o.update(i, r.get(i, fieldTypes(i))); i += 1 }
        o.update(fieldTypes.length,
          if (decScale >= 0) Decimal(acc, DecimalType.MAX_PRECISION, decScale)
          else java.lang.Long.valueOf(acc))
        (o: InternalRow)
      }
    }
    org.apache.spark.sql.graftx.Bridge.fromInternalRows(spark, out, outSchema)
  }

  /** Canonical, serialization-stable group key for one row: internal values
    * normalized to JVM-equality-safe forms (UTF8String buffers are reused
    * row to row, so strings copy out; Decimal normalizes to BigDecimal).
    */
  private def groupKeyOf(r: InternalRow, idxs: Array[Int],
                         types: Array[DataType]): List[Any] = {
    var out = List.empty[Any]
    var i = idxs.length - 1
    while (i >= 0) {
      val v =
        if (r.isNullAt(idxs(i))) null
        else r.get(idxs(i), types(i)) match {
          case s: UTF8String => s.toString
          case d: Decimal => d.toJavaBigDecimal
          case other => other
        }
      out = v :: out
      i -= 1
    }
    out
  }
}
