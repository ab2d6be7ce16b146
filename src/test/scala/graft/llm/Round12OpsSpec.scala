package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 operators: blocklist screening (x40) and friends. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- blocklistScreen

  private def docs = Seq(
    (1L, "the slow scan ran"),      // "slow scan" hits
    (2L, "scan slow the"),          // adjacency matters: reversed pair = no hit
    (3L, "Hash and BIG Table here"),// case-folds: "hash" + "big table"
    (4L, "clean words only"),       // zero hits
    (5L, "big"),                    // shorter than the 2-gram phrase: no hit
    (6L, "hash hash hash")          // DISTINCT phrases: repeated hit counts once
  ).toDF("doc_id", "text")

  test("blocklistScreen: word-boundary matches, distinct-phrase count, keep flag") {
    val got = TextAnalysis.blocklistScreen(docs,
      Seq("  HASH ", "big   table", "slow scan", "absent phrase"))
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, false), (2L, 0L, true), (3L, 2L, false),
      (4L, 0L, true), (5L, 0L, true), (6L, 1L, false)))
  }

  test("blocklistScreen plans zero exchanges (one narrow map per phrase length)") {
    val plan = TextAnalysis.blocklistScreen(docs, Seq("hash", "big table"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"blocklist screen plans a shuffle:\n$plan")
  }

  test("blocklistScreen rejects an empty or all-whitespace blocklist") {
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistScreen(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistScreen(docs, Seq("   ", ""))
    }
  }
}
