package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ScdDimSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = java.sql.Date.valueOf("2026-01-01")
  private val d2 = java.sql.Date.valueOf("2026-02-01")
  private val d3 = java.sql.Date.valueOf("2026-03-01")

  private def dim0 = ScdDim.initial(
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("bk", "seg", "bal"),
    lit("2026-01-01"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("bk", "effective_from").collect().toSeq

  test("initial: every row current with an open interval") {
    assert(rows(dim0) === Seq(
      Row(1L, "a", 10.0, d1, null, true),
      Row(2L, "b", 20.0, d1, null, true),
      Row(3L, "c", 30.0, d1, null, true)))
  }

  test("changed attribute closes the old row and opens a new current one") {
    val upd = Seq((1L, "a2", 10.0)).toDF("bk", "seg", "bal")
    val out = ScdDim.applyBatch(dim0, upd, Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    assert(rows(out) === Seq(
      Row(1L, "a", 10.0, d1, d2, false),
      Row(1L, "a2", 10.0, d2, null, true),
      Row(2L, "b", 20.0, d1, null, true),
      Row(3L, "c", 30.0, d1, null, true)))
  }

  test("no-op re-delivery and key absence create zero versions") {
    val upd = Seq((1L, "a", 10.0)).toDF("bk", "seg", "bal") // identical attrs
    val out = ScdDim.applyBatch(dim0, upd, Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    assert(rows(out) === rows(dim0))
  }

  test("null-safe change detection: null -> value and value -> null both version") {
    val base = ScdDim.initial(
      Seq((1L, Option.empty[String], 10.0), (2L, Some("b"), 20.0)).toDF("bk", "seg", "bal"),
      lit("2026-01-01"))
    val upd = Seq((1L, Some("x"), 10.0), (2L, Option.empty[String], 20.0))
      .toDF("bk", "seg", "bal")
    val out = ScdDim.applyBatch(base, upd, Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    assert(out.filter(col("is_current")).count() === 2)
    assert(out.count() === 4) // both keys versioned
    // and a null == null no-op does NOT version
    val noop = ScdDim.applyBatch(out, Seq((1L, Some("x"), 10.0)).toDF("bk", "seg", "bal"),
      Seq("bk"), Seq("seg", "bal"), lit("2026-03-01"))
    assert(noop.count() === 4)
  }

  test("brand-new key inserts as the first current row") {
    val upd = Seq((9L, "z", 90.0)).toDF("bk", "seg", "bal")
    val out = ScdDim.applyBatch(dim0, upd, Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    assert(rows(out).last === Row(9L, "z", 90.0, d2, null, true))
    assert(out.count() === 4)
  }

  test("two batches chain abutting half-open intervals; asOf resolves each") {
    val out1 = ScdDim.applyBatch(dim0, Seq((1L, "a2", 10.0)).toDF("bk", "seg", "bal"),
      Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    val out2 = ScdDim.applyBatch(out1, Seq((1L, "a3", 10.0)).toDF("bk", "seg", "bal"),
      Seq("bk"), Seq("seg", "bal"), lit("2026-03-01"))
    assert(rows(out2.filter(col("bk") === 1)) === Seq(
      Row(1L, "a", 10.0, d1, d2, false),
      Row(1L, "a2", 10.0, d2, d3, false),
      Row(1L, "a3", 10.0, d3, null, true)))
    def segAt(day: String): String =
      ScdDim.asOf(out2.filter(col("bk") === 1), lit(day)).select("seg").as[String].head()
    assert(segAt("2026-01-15") === "a")
    // boundary day belongs to the NEW version (half-open intervals)
    assert(segAt("2026-02-01") === "a2")
    assert(segAt("2026-02-28") === "a2")
    assert(segAt("2026-03-01") === "a3")
    assert(ScdDim.asOf(out2.filter(col("bk") === 1), lit("2025-12-31")).count() === 0)
  }

  test("pointInTimeJoin: each fact sees the version valid at its own date") {
    val dim1 = ScdDim.applyBatch(dim0, Seq((1L, "a2", 10.0)).toDF("bk", "seg", "bal"),
      Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    val facts = Seq(
      (1L, "2026-01-15", 100.0), // before the change: must see "a"
      (1L, "2026-02-01", 200.0), // boundary day: the NEW version (half-open)
      (2L, "2026-03-01", 300.0)) // untouched key
      .toDF("fk", "fdate", "amount")
    val out = ScdDim.pointInTimeJoin(facts, dim1, "fk", "bk", facts("fdate"))
      .orderBy("fdate").select("fk", "amount", "seg")
      .as[(Long, Double, String)].collect().toSeq
    assert(out === Seq((1L, 100.0, "a"), (1L, 200.0, "a2"), (2L, 300.0, "b")))
    // a pre-history fact matches NO version (inner join drops it)
    val early = Seq((1L, "2025-06-01", 1.0)).toDF("fk", "fdate", "amount")
    assert(ScdDim.pointInTimeJoin(early, dim1, "fk", "bk", early("fdate")).count() === 0)
  }

  test("pointInTimeJoin plan: hash join on the key, never nested-loop") {
    val facts = Seq((1L, "2026-01-15", 1.0)).toDF("fk", "fdate", "amount")
    val plan = ScdDim.pointInTimeJoin(facts, dim0, "fk", "bk", facts("fdate"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval predicate must ride the equi-join, got:\n$plan")
  }

  test("duplicate business keys in a batch are refused at action time") {
    // the guard is lazy (VERDICT r13 #5): plan construction runs no jobs,
    // the refusal surfaces when the merge executes
    val dup = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("bk", "seg", "bal")
    val out = ScdDim.applyBatch(dim0, dup, Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    val e = intercept[Exception] { out.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate business keys")),
      s"expected the batch-uniqueness refusal, got: ${messages(e).mkString(" | ")}")
    // duplicates among BRAND-NEW keys must also trip it (they bypass the
    // kept/closed branches, so a prunable guard column would miss them)
    val dupNew = Seq((99L, "x", 1.0), (99L, "y", 2.0)).toDF("bk", "seg", "bal")
    val out2 = ScdDim.applyBatch(dim0, dupNew, Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    val e2 = intercept[Exception] { out2.count() }
    assert(messages(e2).exists(_.contains("duplicate business keys")))
  }

  test("applyBatch composes plans with ZERO eager jobs") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    var dim = dim0
    (1 to 3).foreach { i =>
      dim = ScdDim.applyBatch(dim, Seq((i.toLong, s"a$i", i * 1.0)).toDF("bk", "seg", "bal"),
        Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    }
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, s"plan construction scheduled ${after - before} jobs")
  }

  test("plan: the only window is key-partitioned — no single-partition funnel") {
    val out = ScdDim.applyBatch(dim0, Seq((1L, "a2", 10.0)).toDF("bk", "seg", "bal"),
      Seq("bk"), Seq("seg", "bal"), lit("2026-02-01"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"SCD2 merge must never funnel to one partition:\n$plan")
  }
}
