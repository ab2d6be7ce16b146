package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The grain-binned interval join's contract: exactly the closed-interval
  * overlap pairs, each exactly once, at any grain — against the naive
  * inequality join as ground truth — and never via a cartesian plan.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // intervals engineered for the edge cases: touching endpoints (closed
  // semantics ⇒ overlap), multi-grain spans (dup suppression), intervals
  // inside one grain, overlaps straddling a grain boundary, disjoint pairs
  private lazy val left = Seq(
    (1L, 0L, 250L),      // spans grains 0-2 at grain=100
    (2L, 100L, 199L),    // exactly grain 1
    (3L, 300L, 300L),    // point interval
    (4L, 500L, 600L)     // isolated
  ).toDF("lid", "ls", "le")

  private lazy val right = Seq(
    (10L, 250L, 400L),   // touches lid=1 at 250 (closed ⇒ overlap); covers 3
    (11L, 0L, 99L),      // grain 0 only; overlaps 1, not 2
    (12L, 150L, 260L),   // overlaps 1 and 2 across the grain-1/2 boundary
    (13L, 700L, 800L)    // disjoint from everything
  ).toDF("rid", "rs", "re")

  private def naive(): Set[(Long, Long)] =
    left.join(right, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exactly the overlap pairs, each exactly once, at several grains") {
    val expect = naive()
    assert(expect == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L), (3L, 10L)))
    for (grain <- Seq(1L, 50L, 100L, 1000L)) {
      val rows = RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", grain)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.toSet.size, s"duplicate pairs at grain $grain")
      assert(rows.toSet == expect, s"wrong pair set at grain $grain")
    }
  }

  test("plans as an equi-join on the grain, never a cartesian/BNLJ") {
    val plan = RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to all-pairs:\n$plan")
  }

  test("column collisions and bad grains fail fast") {
    intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(left, left, "ls", "le", "ls", "le", 100L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", 0L)
    }
  }
}
