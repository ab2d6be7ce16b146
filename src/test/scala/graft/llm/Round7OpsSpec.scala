package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the round-7 scale work: the ANN final ranking routed
  * through the salted TopKPerGroup operator (VERDICT r6 #4) — identical
  * rankings under a forced high-fanout plan, and the forced plan actually
  * salts (no single-task-per-query window).
  */
class Round7OpsSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def scoredCandidates() = {
    val q = embs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("q_emb"), col("c_emb")).as("cos"))
  }

  test("rankTopK: forced salted two-phase ranking is row-identical to the collapsed form") {
    val scored = scoredCandidates()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val collapsed = rows(Similarity.rankTopK(scored, "cos", 10))
    val salted = rows(Similarity.rankTopK(scored, "cos", 10, targetPartitionRows = 1L))
    assert(collapsed.nonEmpty)
    assert(salted == collapsed, "salted ranking diverged from the single-window ranking")
  }

  test("rankTopK: the forced plan salts the per-query window (no query-cardinality task funnel)") {
    val forced = Similarity.rankTopK(scoredCandidates(), "cos", 10, targetPartitionRows = 1L)
    val windowPartitionWidths = forced.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.length
    }
    // phase 1 partitions by (query_id, salt); phase 2's window sees only
    // the <= queries x fanout x k survivors
    assert(windowPartitionWidths.contains(2),
      s"no salted window in forced plan (partition widths: $windowPartitionWidths)")
  }

  test("bruteForceTopK output is unchanged by the TopKPerGroup routing (vs direct window SQL shape)") {
    // the s01 oracle covers cross-engine exactness; this guards the Spark
    // side against ranking drift at any fanout the stats estimator picks
    val topk = Similarity.bruteForceTopK(embs, col("vec_id") % 100 === 0, 10)
    val perQuery = topk.groupBy("query_id").agg(count("*").as("n"), max("rank").as("mx"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      assert(r.getLong(1) == 10L && r.getInt(2) == 10, s"bad rank set for ${r.getLong(0)}")
    }
  }
}
