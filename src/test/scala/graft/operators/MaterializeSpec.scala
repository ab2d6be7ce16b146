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
}
