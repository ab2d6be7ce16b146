package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Z-order clustering: the Morton key must be a correct interleave, the
  * re-layout must lose nothing, and — the point of the layout — range
  * predicates on EITHER dimension must skip most row groups where a
  * linear sort only skips on its leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave16 computes the Morton code (hand-checked bits)") {
    val df = Seq((3L, 5L)).toDF("a", "b")
    // a=0b011 → bits at odd positions 1,3 ; b=0b101 → bits at even 0,4
    // z = (1<<1)|(1<<3)|(1<<0)|(1<<4) = 2+8+1+16 = 27
    val z = df.select(ZOrder.interleave16(col("a"), col("b"))).head.getLong(0)
    assert(z == 27L)
  }

  test("lane16 scales bounds to [0, 65535] and collapses degenerate ranges") {
    val df = Seq(0L, 50L, 100L).toDF("v")
    val lanes = df.select(ZOrder.lane16(col("v"), 0.0, 100.0)).collect().map(_.getLong(0))
    assert(lanes(0) == 0L && lanes(2) == 65535L && lanes(1) == 32767L)
    assert(df.select(ZOrder.lane16(col("v"), 5.0, 5.0)).head.getLong(0) == 0L)
  }

  test("zValueWith uses caller bounds, clamps outliers, and runs no eager action") {
    val df = Seq((0L, -5L), (100L, 500L)).toDF("a", "b")
    val z = df.select(ZOrder.zValueWith(df, col("a"), col("b"),
      (0.0, 100.0), (0.0, 100.0)).as("z")).orderBy("z").collect().map(_.getLong(0))
    // row1: lanes (0, 0) → z 0; row2: lanes (65535, 65535) → all 32 bits set
    assert(z.toSeq == Seq(0L, (1L << 32) - 1))
  }

  // the time dimension rides a derived day-grain DATE key: parquet stats
  // skipping works for date/numeric columns but NOT for timestamp_ntz —
  // filters push (plan-verified) yet the Spark 4.1 reader skips no row
  // groups on ntz stats (measured: 1500/1500 rows scanned on a 6-month
  // predicate over a date-bounded layout; 657/1500 the moment the same
  // column is day-grain DATE). ZOrder.writeZOrdered stays type-agnostic;
  // callers carry the derived day column, as warehouses do anyway.
  private lazy val orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .select(col("o_orderkey"), col("o_custkey"),
      to_date(col("o_orderdate")).as("o_date"), col("o_totalprice"))

  test("z-ordered write round-trips every row exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z-rt").toString
    ZOrder.writeZOrdered(orders, dir, col("o_custkey"), col("o_date"), 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      orders.orderBy("o_orderkey").collect().toSeq)
  }

  /** Rows the scan node actually materialized for `df` (post row-group
    * skipping, pre the residual Filter) — AQE disabled so the scan and
    * its metrics sit in the plain executed plan.
    */
  private def scanRows(df: DataFrame): (Long, Long) = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    (scan.metrics("numOutputRows").value, scan.metrics("numFiles").value)
  }

  test("row groups skip on BOTH dimensions; linear layout only on its leading one") {
    withConf("spark.sql.adaptive.enabled", "false") {
      val total = orders.count()
      val zDir = java.nio.file.Files.createTempDirectory("graft-z-skip").toString
      val linDir = java.nio.file.Files.createTempDirectory("graft-lin-skip").toString
      ZOrder.writeZOrdered(orders, zDir, col("o_custkey"), col("o_date"), 16)
      // the contrast layout: same file count, linear sort leading on custkey
      orders.repartitionByRange(16, col("o_custkey"), col("o_date"))
        .sortWithinPartitions("o_custkey", "o_date")
        .write.mode("overwrite").parquet(linDir)
      def custPred(df: DataFrame) = df.filter(col("o_custkey").between(10, 20))
      def datePred(df: DataFrame) = df.filter(
        col("o_date").between(
          lit("1996-01-01").cast("date"), lit("1996-06-30").cast("date")))
      val z = spark.read.parquet(zDir)
      val lin = spark.read.parquet(linDir)
      val (zCust, _) = scanRows(custPred(z))
      val (zDate, _) = scanRows(datePred(z))
      val (linCust, _) = scanRows(custPred(lin))
      val (linDate, _) = scanRows(datePred(lin))
      // leading-dimension skipping: both layouts prune custkey ranges hard
      assert(linCust < total / 2, s"linear layout should skip on its sort key ($linCust/$total)")
      assert(zCust < total / 2, s"z-order should skip on custkey ($zCust/$total)")
      // the z-order claim: the SECOND dimension also skips; linear reads ~all
      assert(zDate < (total * 3) / 4,
        s"z-order should skip on the date dimension too ($zDate/$total)")
      assert(linDate > (total * 3) / 4,
        s"contrast invalid: linear layout unexpectedly skipped on its trailing dim ($linDate/$total)")
      assert(zDate < linDate,
        s"z-order ($zDate) must beat linear ($linDate) on the non-leading dimension")
    }
  }
}
