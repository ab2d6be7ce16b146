package graft.queries

import graft.SparkSpec
import graft.functions.Det._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pivot/unpivot semantics the q30/q31 defs rely on — pinned on hand data
  * because the driver corpus has every (priority, status) combination, so
  * the oracle gate alone would never exercise an EMPTY pivot cell.
  */
class PivotSpec extends SparkSpec {
  import spark.implicits._

  test("pivot: absent cells are null; q30's coalesce restores COUNT-FILTER's 0") {
    // status P never occurs with priority 'b'
    val orders = Seq(
      ("a", "F", 10.0), ("a", "P", 20.0), ("b", "F", 30.0), ("b", "O", 40.0)
    ).toDF("priority", "status", "price")
    val wide = orders.groupBy("priority")
      .pivot("status", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), dsum(col("price")).as("spend"))
    // raw pivot leaves the empty (b, P) cell null — count included
    val rawB = wide.filter(col("priority") === "b").head()
    assert(rawB.isNullAt(rawB.fieldIndex("P_n")), "empty pivot count cell should be null")
    assert(rawB.isNullAt(rawB.fieldIndex("P_spend")))
    // the def's treatment: counts → 0 (COUNT FILTER semantics), spend stays null
    val fixed = wide.select(col("priority"),
      coalesce(col("P_n"), lit(0L)).as("p_n"), col("P_spend").as("p_spend"))
      .orderBy("priority").collect()
    assert(fixed(1).getLong(1) == 0L && fixed(1).isNullAt(2))
    assert(fixed(0).getLong(1) == 1L && fixed(0).getDouble(2) == 20.0)
  }

  test("pivot with explicit values plans no distinct-discovery job (stays lazy)") {
    // an implicit pivot materializes the distinct pivot values EAGERLY at
    // DataFrame-construction time — on a poisoned frame, that eager scan
    // throws; the explicit list must construct without running anything
    val poisoned = Seq(("a", "F", 1.0)).toDF("priority", "status", "price")
      .filter(assert_true(lit(false)).isNull)
    poisoned.groupBy("priority").pivot("status", Seq("F", "O")).agg(count(lit(1)))
    intercept[Throwable] {
      poisoned.groupBy("priority").pivot("status").agg(count(lit(1)))
    }
  }

  test("unpivot: wide-to-long rotation preserves every measure value exactly") {
    val row = Seq((1L, 2.5, 7.0)).toDF("id", "m1", "m2")
      .select(col("id"),
        col("m1").cast(DecimalType(18, 6)).as("m1"),
        col("m2").cast(DecimalType(18, 6)).as("m2"))
    val long = row.unpivot(Array(col("id")), Array(col("m1"), col("m2")), "measure", "v")
      .orderBy("measure")
      .select(col("measure"), col("v").cast("double"))
      .as[(String, Double)].collect().toSeq
    assert(long == Seq(("m1", 2.5), ("m2", 7.0)))
  }
}
