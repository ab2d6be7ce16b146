package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Materialize.cut — the durability-posture switch behind every eager
  * lineage cut in the engine (VERDICT r10 #2): reliable `checkpoint` when
  * the SparkContext has a checkpoint dir, `localCheckpoint` otherwise, with
  * identical results either way.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def frame() =
    (1 to 100).toDF("n").withColumn("sq", col("n") * col("n"))

  test("no checkpoint dir: localCheckpoint path, lineage-free, same rows") {
    val prior = spark.sparkContext.getCheckpointDir.orNull
    spark.sparkContext.setCheckpointDir(null) // force the local posture
    try {
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
      runCutAssertions()
    } finally spark.sparkContext.setCheckpointDir(prior)
  }

  private def runCutAssertions(): Unit = {
    val cutDf = Materialize.cut(frame())
    assert(cutDf.queryExecution.optimizedPlan.collectLeaves().nonEmpty)
    // a cut frame's plan is a bare scan of materialized rows — no Project
    // over a Range upstream of it
    assert(!cutDf.queryExecution.optimizedPlan.toString.contains("Range"),
      s"expected lineage cut, got:\n${cutDf.queryExecution.optimizedPlan}")
    assert(cutDf.orderBy("n").collect().toSeq ===
      frame().orderBy("n").collect().toSeq)
  }

  test("checkpoint dir set: reliable-checkpoint path, same rows, files on disk") {
    val prior = spark.sparkContext.getCheckpointDir.orNull
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      runCutAssertions()
      // the reliable path really wrote block files under the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally spark.sparkContext.setCheckpointDir(prior)
  }

  test("x22 bigram surprisal is identical under either posture") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox naps under the old tree"),
      (3L, "a slow green turtle walks past the brown fox")).toDF("doc_id", "text")
    val sc = spark.sparkContext
    val prior = sc.getCheckpointDir.orNull
    sc.setCheckpointDir(null)
    try {
      val local = TextAnalysis.bigramSurprisal(docs).orderBy("doc_id").collect().toSeq
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-x22").toString
      sc.setCheckpointDir(dir)
      val reliable = TextAnalysis.bigramSurprisal(docs).orderBy("doc_id").collect().toSeq
      assert(reliable === local)
    } finally sc.setCheckpointDir(prior)
  }

  test("cutFresh: same rows as cut, stats reset to a plan-independent constant") {
    val cut = Materialize.cut(frame())
    val fresh = Materialize.cutFresh(frame())
    assert(fresh.orderBy("n").collect().toSeq === cut.orderBy("n").collect().toSeq)
    // the reset: a cut preserves the origin's computed sizeInBytes, so two
    // cuts of different-sized plans differ; cutFresh's leaves carry the
    // session default regardless of what produced them
    val freshSmall = Materialize.cutFresh(frame().limit(3))
    assert(freshSmall.queryExecution.optimizedPlan.stats.sizeInBytes ===
      fresh.queryExecution.optimizedPlan.stats.sizeInBytes,
      "cutFresh stats must not depend on the origin plan")
  }

  test("cutFresh: twice-referenced iterative state keeps stats bit-width bounded") {
    // the r15 g09 hazard in miniature: per round the next state references
    // the previous state TWICE (join stats multiply for every non-semi join
    // type), so plain cut() squares sizeInBytes per round — digit count
    // doubles and planning grinds. cutFresh must hold it constant.
    var state = Materialize.cutFresh(
      (1L to 50L).toDF("node").withColumn("r", col("node") * 10))
    val dims = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (round <- 1 to 6) {
      val contrib = state.groupBy((col("node") % 7).as("node"))
        .agg(sum(col("r")).as("contrib"))
      val next = Materialize.cutFresh(
        state.select(col("node"), col("r").as("old_r"))
          .join(contrib, Seq("node"), "left")
          .join(state, Seq("node"), "left")
          .select(col("node"),
            (coalesce(col("contrib"), lit(0L)) + col("r")).as("r")))
      dims += next.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      state = next
    }
    // constant leaf stats → constant state bit-width; squaring growth
    // would double the bit-length every round (≥ 2^6× by round 6)
    assert(dims.distinct.size === 1,
      s"state stats bit-widths must stay constant, got $dims")
  }
}
