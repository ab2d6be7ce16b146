package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix sum must equal the single-partition window
  * formulation row-for-row, independent of input partitioning, and plan
  * without an unpartitioned WindowExec.
  */
class PrefixSumSpec extends SparkSpec {

  import spark.implicits._

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    .select(col("o_orderkey"),
      (col("o_totalprice") * 100).cast("long").as("cents"))

  private lazy val direct = {
    val w = Window.orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.withColumn("running_sum", sum(col("cents")).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
  }

  test("distributed prefix sum equals the global window formulation") {
    val got = PrefixSum.withRunningSum(orders, "o_orderkey", "cents")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == direct)
  }

  test("result is independent of input partitioning") {
    val got = PrefixSum.withRunningSum(orders.repartition(13), "o_orderkey", "cents")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == direct)
  }

  test("int value columns are accepted and summed in long") {
    val df = Seq((1L, 3), (2L, 4), (3L, 5)).toDF("k", "v")
    val got = PrefixSum.withRunningSum(df, "k", "v")
      .orderBy("k").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(3L, 7L, 12L))
  }

  // ------------------------------------------- grouped prefix sum (r10 #1)

  private lazy val ordersG = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    .select(col("o_orderstatus"), col("o_orderdate"), col("o_orderkey"),
      col("o_totalprice").cast("decimal(18,2)").as("tp"))

  private lazy val groupedDirect = {
    val w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordersG.withColumn("rt", sum(col("tp")).over(w).cast("double"))
      .collect().map(r => (r.getLong(2), r.getDouble(4))).toMap
  }

  test("grouped prefix sum equals the PARTITION BY window, decimal-exact") {
    val got = PrefixSum.withGroupedRunningSum(ordersG,
        Seq("o_orderstatus"), Seq("o_orderdate", "o_orderkey"), "tp", "rt")
      .withColumn("rt", col("rt").cast("double"))
      .collect().map(r => (r.getLong(2), r.getDouble(4))).toMap
    assert(got == groupedDirect)
  }

  test("grouped result is independent of input partitioning") {
    val got = PrefixSum.withGroupedRunningSum(ordersG.repartition(13),
        Seq("o_orderstatus"), Seq("o_orderdate", "o_orderkey"), "tp", "rt")
      .withColumn("rt", col("rt").cast("double"))
      .collect().map(r => (r.getLong(2), r.getDouble(4))).toMap
    assert(got == groupedDirect)
  }

  test("grouped: long values, multi-column groups, null group values") {
    val df = Seq(
      (Some("a"), 1, 1L, 10L), (Some("a"), 1, 2L, 20L), (Some("a"), 2, 3L, 5L),
      (Some("b"), 1, 4L, 7L), (None, 1, 5L, 100L), (None, 1, 6L, 50L))
      .toDF("g1", "g2", "k", "v")
    val got = PrefixSum.withGroupedRunningSum(df, Seq("g1", "g2"), Seq("k"), "v")
      .orderBy("k").collect().map(_.getLong(4)).toSeq
    // (a,1): 10,30 · (a,2): 5 · (b,1): 7 · (null,1): 100,150
    assert(got == Seq(10L, 30L, 5L, 7L, 100L, 150L))
  }

  test("grouped: groups spanning many range partitions stitch exactly") {
    // one dominant group forced across partitions: 2000 rows, 8 partitions
    val df = spark.range(2000)
      .select((col("id") % 4).cast("string").as("g"), col("id").as("k"),
        lit(1L).as("v"))
      .repartition(8)
    val got = PrefixSum.withGroupedRunningSum(df, Seq("g"), Seq("k"), "v")
    val perGroupMax = got.groupBy("g").agg(max("running_sum").as("m"))
      .orderBy("g").collect().map(_.getLong(1)).toSeq
    assert(perGroupMax == Seq(500L, 500L, 500L, 500L))
    // spot-check ordering within a group: running_sum is 1..500 in k order
    val g0 = got.filter(col("g") === "0").orderBy("k")
      .select("running_sum").collect().map(_.getLong(0)).toSeq
    assert(g0 == (1L to 500L).toSeq)
  }

  test("grouped: decimal overflow fails fast instead of wrapping") {
    // 11 × 9e17 unscaled > Long.MaxValue — the accumulator must throw
    val big = java.math.BigDecimal.valueOf(9e15).setScale(2)
    val df = (1L to 11L).map(k => (1, k, big)).toDF("g", "k", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val ex = intercept[org.apache.spark.SparkException] {
      PrefixSum.withGroupedRunningSum(df, Seq("g"), Seq("k"), "v").collect()
    }
    assert(ex.getMessage.contains("overflow") ||
      Option(ex.getCause).exists(_.toString.contains("overflow")))
  }

  test("grouped: null values fail fast") {
    val df = Seq((1, 1L, Some(2L)), (1, 2L, None)).toDF("g", "k", "v")
    val ex = intercept[Exception] {
      PrefixSum.withGroupedRunningSum(df, Seq("g"), Seq("k"), "v").collect()
    }
    assert(ex.toString.contains("null") ||
      Option(ex.getCause).exists(_.toString.contains("null")))
  }
}
