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
    // targetPartitionRows = 1 forces the effective fanout to the cap, so the
    // salted two-phase path (not the small-input single-window collapse) is
    // what these equality tests exercise
    TopKPerGroup.topKPerGroup(in, Seq("o_orderpriority"), "o_custkey",
      Seq(col("total").desc, col("o_custkey").asc), k, fanout,
      targetPartitionRows = 1L)
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

  test("seeded property: equivalence holds on random data with heavy value ties") {
    import spark.implicits._
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    for (seed <- Seq(1L, 7L, 42L)) {
      val rnd = new scala.util.Random(seed)
      // few groups, many ties (values drawn from just 5 distinct levels) —
      // the regime where an incomplete total order would surface
      val rows = Seq.tabulate(500)(i => (s"g${rnd.nextInt(3)}", i.toLong, rnd.nextInt(5).toDouble))
      val df = rows.toDF("g", "id", "v").repartition(7)
      val direct = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("g", "rank", "id", "v")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val two = TopKPerGroup.topKPerGroup(df, Seq("g"), "id",
        Seq(col("v").desc, col("id").asc), 5, fanout = 16, targetPartitionRows = 1L)
        .select("g", "rank", "id", "v")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(two == direct, s"seed=$seed")
    }
  }

  test("fanout adapts to input size: small input → one window, forced → two") {
    def windows(targetPartitionRows: Long) =
      TopKPerGroup.topKPerGroup(spend, Seq("o_orderpriority"), "o_custkey",
        Seq(col("total").desc, col("o_custkey").asc), 3,
        targetPartitionRows = targetPartitionRows)
        .queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
    // sf0.001's post-agg frame is far below the default 4M-row target:
    // the adaptive path must collapse to a single window (no salt shuffle)
    assert(windows(4L << 20).size == 1)
    // a 1-row target saturates the cap: the salted two-phase plan engages
    assert(windows(1L).size == 2)
  }

  test("every window in the two-phase plan is partitioned") {
    val plan = TopKPerGroup.topKPerGroup(spend, Seq("o_orderpriority"), "o_custkey",
      Seq(col("total").desc, col("o_custkey").asc), 3,
      targetPartitionRows = 1L).queryExecution.sparkPlan
    val bad = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty)
  }

  test("reserved column collisions are rejected, and rankCol is configurable (ADVICE r3)") {
    // an input that already carries the output rank name would be silently
    // overwritten by withColumn — must throw instead
    val withRank = spend.withColumn("rank", col("total"))
    val e = intercept[IllegalArgumentException] {
      TopKPerGroup.topKPerGroup(withRank, Seq("o_orderpriority"), "o_custkey",
        Seq(col("total").desc, col("o_custkey").asc), 3)
    }
    assert(e.getMessage.contains("rank"))
    // same data ranks fine under a caller-chosen output column
    val renamed = TopKPerGroup.topKPerGroup(withRank, Seq("o_orderpriority"), "o_custkey",
      Seq(col("total").desc, col("o_custkey").asc), 3, rankCol = "topk_rank")
    assert(renamed.columns.contains("topk_rank") && renamed.columns.count(_ == "rank") == 1)
    assert(renamed.filter(col("topk_rank") <= 3).count() == renamed.count())
  }
}
