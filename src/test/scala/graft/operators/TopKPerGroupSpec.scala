package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The salted two-phase ranking must be row-for-row identical to the
  * single-window formulation, for any fanout and input partitioning.
  */
class TopKPerGroupSpec extends SparkSpec {

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private lazy val spend = orders.groupBy("o_orderpriority", "o_custkey")
    .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))

  private def direct(k: Int) = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("total").desc, col("o_custkey"))
    spend.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("o_orderpriority", "rank", "o_custkey", "total")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
  }

  private def twoPhase(k: Int, fanout: Int, repartitioned: Boolean = false) = {
    val in = if (repartitioned) spend.repartition(13) else spend
    TopKPerGroup.topKPerGroup(in, Seq("o_orderpriority"), "o_custkey",
      Seq(col("total").desc, col("o_custkey").asc), k, fanout)
      .select("o_orderpriority", "rank", "o_custkey", "total")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
  }

  test("two-phase top-k equals the single-window ranking (several k and fanouts)") {
    for (k <- Seq(1, 3, 10); fanout <- Seq(1, 4, 64))
      assert(twoPhase(k, fanout) == direct(k), s"mismatch at k=$k fanout=$fanout")
  }

  test("result is independent of input partitioning") {
    assert(twoPhase(3, 8, repartitioned = true) == direct(3))
  }

  test("every window in the two-phase plan is partitioned") {
    val plan = TopKPerGroup.topKPerGroup(spend, Seq("o_orderpriority"), "o_custkey",
      Seq(col("total").desc, col("o_custkey").asc), 3).queryExecution.sparkPlan
    val bad = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty)
  }
}
