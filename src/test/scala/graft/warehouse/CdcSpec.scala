package graft.warehouse

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "status", "price")

  private def log(rows: (Long, String, Double, String, Long)*) =
    rows.toDF("k", "status", "price", "op", "seq")
      .selectExpr("k", "CASE WHEN op = 'D' THEN NULL ELSE status END AS status",
        "CASE WHEN op = 'D' THEN NULL ELSE price END AS price", "op", "seq")

  private def applied(changes: org.apache.spark.sql.DataFrame) =
    Cdc.applyChangeLog(base, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq

  test("netting: latest seq wins per key; I-then-D nets to absent; D-then-I resurrects") {
    val changes = log(
      (2L, "b", 21.0, "U", 1L), (2L, "b2", 22.0, "U", 2L), // two updates: seq 2 wins
      (4L, "d", 40.0, "I", 1L), (4L, "d", 0.0, "D", 2L),   // insert-then-delete: absent
      (3L, "c", 0.0, "D", 1L), (3L, "c9", 39.0, "I", 2L))  // delete-then-insert: present
    assert(applied(changes) === Seq(
      (1L, "a", 10.0),      // untouched base row survives
      (2L, "b2", 22.0),     // latest after-image
      (3L, "c9", 39.0)))    // resurrection wins over the earlier delete
  }

  test("I on an existing key replaces it (mid-stream first-seen semantics)") {
    assert(applied(log((1L, "a9", 11.0, "I", 1L))) ===
      Seq((1L, "a9", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("replay safety: re-applying the netted batch to its own output is a no-op") {
    val changes = log(
      (1L, "a", 0.0, "D", 1L), (2L, "bx", 25.0, "U", 1L), (5L, "e", 50.0, "I", 1L))
    val once = Cdc.applyChangeLog(base, changes, Seq("k"), "seq", "op")
    val twice = Cdc.applyChangeLog(once, changes, Seq("k"), "seq", "op")
    assert(twice.orderBy("k").collect().toSeq === once.orderBy("k").collect().toSeq)
  }

  test("duplicate (key, seq) is refused at action time") {
    // guard is lazy (VERDICT r13 #5): no job at plan construction, the
    // refusal surfaces when the netting executes
    val dup = log((2L, "x", 1.0, "U", 1L), (2L, "y", 2.0, "U", 1L))
    val out = Cdc.applyChangeLog(base, dup, Seq("k"), "seq", "op")
    val e = intercept[Exception] { out.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("totally order")),
      s"expected the changelog-order refusal, got: ${messages(e).mkString(" | ")}")
  }

  test("partition-layout independence (1 vs 7 partitions)") {
    val bigBase = (1L to 200L).map(i => (i, s"s$i", i * 1.0)).toDF("k", "status", "price")
    val changes = log((1L to 60L).flatMap(i => Seq(
      (i * 3, s"u$i", i * 2.0, "U", 1L),
      (i * 3, s"u$i-2", i * 4.0, "U", 2L),
      (i * 5 + 200, s"n$i", 1.0, "I", 1L))): _*)
    val one = Cdc.applyChangeLog(bigBase.coalesce(1), changes.coalesce(1),
      Seq("k"), "seq", "op").orderBy("k").collect().toSeq
    val many = Cdc.applyChangeLog(bigBase.repartition(7), changes.repartition(7),
      Seq("k"), "seq", "op").orderBy("k").collect().toSeq
    assert(one === many)
  }
}
