package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch-based approximate aggregates (q21):
  * HLL++ distinct counts within 2% and approximate median within 1% of the
  * exact answers on the correctness-scale data.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 2% and percentile_approx within 1% of exact") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val exact = orders.agg(
      countDistinct(col("o_custkey")).as("d"),
      expr("percentile(o_totalprice, 0.5)").as("m")).collect()(0)
    val approx = orders.agg(
      approx_count_distinct(col("o_custkey"), rsd = 0.01).as("d"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("m")).collect()(0)
    val (de, da) = (exact.getLong(0).toDouble, approx.getLong(0).toDouble)
    assert(math.abs(de - da) / de < 0.03, s"distinct: exact $de approx $da")
    val (me, ma) = (exact.getDouble(1), approx.getDouble(1))
    assert(math.abs(me - ma) / me < 0.01, s"median: exact $me approx $ma")
  }
}
