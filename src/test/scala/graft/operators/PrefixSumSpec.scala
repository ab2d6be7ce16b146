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
}
