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

  // --------------------------------------------------------------- urlDedup

  test("canonicalUrl: case-folds scheme+host ONLY, strips query/fragment and trailing slash") {
    val cases = Seq(
      ("https://Example.COM/Page/5/?utm_source=x", "https://example.com/Page/5"),
      ("https://example.com/Page/5", "https://example.com/Page/5"),
      ("http://HOST.net/A/B#frag", "http://host.net/A/B"),
      ("https://example.com/", "https://example.com"),
      ("https://example.com", "https://example.com"))
    val got = cases.map(_._1).toDF("u")
      .select(Dedup.canonicalUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("urlDedup: keep-first per canonical URL; URL-less documents always kept") {
    val docs = Seq(
      (1L, "see https://Example.COM/a/?q=1 now"), // group a, first
      (2L, "see https://example.com/a now"),      // group a, dup
      (3L, "see https://example.com/B/ now"),     // group B, first
      (4L, "no url at all"),                      // null key → kept
      (5L, "see https://example.com/a/ now")      // group a, dup
    ).toDF("doc_id", "text")
    val got = Dedup.urlDedup(docs).orderBy("doc_id")
      .as[(Long, Option[String], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, Some("https://example.com/a"), true),
      (2L, Some("https://example.com/a"), false),
      (3L, Some("https://example.com/B"), true),
      (4L, None, true),
      (5L, Some("https://example.com/a"), false)))
  }

  // ------------------------------------------------------ ORC source/sink

  test("ORC round-trip preserves rows and prunes on the partition column") {
    val df = Seq(
      (1L, "F", 10.5), (2L, "O", 20.0), (3L, "F", 30.25), (4L, "P", 5.0)
    ).toDF("k", "status", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-spec").toString
    df.write.mode("overwrite").partitionBy("status").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == 4)
    assert(back.select("k", "v").orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.5), (2L, 20.0), (3L, 30.25), (4L, 5.0)))
    val pruned = back.filter(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("status")),
      s"ORC scan not partition-pruned:\n$plan")
    assert(pruned.count() == 2)
  }
}
