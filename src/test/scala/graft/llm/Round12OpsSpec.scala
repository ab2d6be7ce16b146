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

  // ------------------------------------------------- interleavedOrder

  test("interleavedOrder: round-robin across sources, permutation positions, repartition-invariant") {
    val docs = (1L to 17L).map(i => (i, s"src${(i % 3)}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.interleavedOrder(docs)
      .orderBy("pos").as[(Long, String, Long, Long)].collect().toSeq
    // positions are exactly 1..n
    assert(out.map(_._4) == (1L to 17L))
    // ordered by pos ⇔ ordered by (rn, source)
    assert(out.map(r => (r._3, r._2)) == out.map(r => (r._3, r._2)).sorted)
    // within each source, rn is exactly 1..|source|
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.length))
    }
    // the first |S| positions hold one document from EACH source (all
    // sources still have rank-1 docs): the round-robin guarantee
    assert(out.take(3).map(_._2).toSet == Set("src0", "src1", "src2"))
    // deterministic under physical layout changes
    val again = Sampling.interleavedOrder(docs.repartition(7))
      .orderBy("pos").as[(Long, String, Long, Long)].collect().toSeq
    assert(again == out)
  }

  test("interleavedOrder plans no Window operator (prefix sums, not windows)") {
    val docs = (1L to 10L).map(i => (i, s"s${i % 2}", "t")).toDF("doc_id", "source", "text")
    val plan = Sampling.interleavedOrder(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"interleavedOrder plans a window:\n$plan")
  }

  // ------------------------------------------------------------- mipsTopK

  test("mipsTopK ranks by inner product: a longer vector beats a better-aligned short one") {
    val emb = Seq(
      (0L, Array(1f, 0f)),     // query
      (1L, Array(0.9f, 0f)),   // well-aligned, short: ip 0.9, cosine 1.0
      (2L, Array(3f, 3f)),     // poorly aligned, long: ip 3.0, cosine ~0.707
      (3L, Array(0.1f, 0.9f))  // worst on both
    ).toDF("vec_id", "embedding")
    val mips = Similarity.mipsTopK(emb, col("vec_id") === 0, k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(mips == Seq(2L, 1L, 3L), "MIPS must rank the long vector first")
    val cos = Similarity.bruteForceTopK(emb, col("vec_id") === 0, k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(cos == Seq(1L, 2L, 3L), "cosine must rank the aligned vector first")
  }

  // ------------------------------------------------- simhashNearDupPairs

  test("simhashNearDupPairs: identical docs at Hamming 0, radius respected, no self/dup pairs") {
    val docs = Seq(
      (1L, "spark merge window table scan filter join group"),
      (2L, "spark merge window table scan filter join group"),   // exact twin → 0
      (3L, "spark merge window table scan filter join order"),   // near twin
      (4L, "completely different words entirely here now today") // far
    ).toDF("doc_id", "text")
    val got = Dedup.simhashNearDupPairs(docs, maxHamming = 3)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got.contains((1L, 2L, 0)), "exact twins must pair at Hamming 0")
    assert(got.forall { case (a, b, h) => a < b && h <= 3 },
      "ordered pairs inside the radius only")
    assert(got.map(p => (p._1, p._2)).distinct.size == got.size, "no duplicate pairs")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L),
      "an unrelated document must not pair at radius 3")
  }

  // ------------------------------------------------------- corpusDrift

  test("corpusDrift: TV = 0 on identical distributions, 1 on disjoint vocab, null for one-sided sources") {
    val oldDocs = Seq(
      (1L, "srcA", "a a b"),
      (2L, "srcB", "x y"),
      (3L, "srcC", "only old")
    ).toDF("doc_id", "source", "text")
    val newDocs = Seq(
      (4L, "srcA", "a a b"),   // identical distribution → TV 0
      (5L, "srcB", "p q q")    // disjoint vocabulary → TV 1
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.corpusDrift(oldDocs, newDocs).orderBy("source")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("srcA", 1L, 1L, 3L, 3L, Some(0.0)),
      ("srcB", 1L, 1L, 2L, 3L, Some(1.0)),
      ("srcC", 1L, 0L, 2L, 0L, None)))
  }

  test("corpusDrift: a half-shifted distribution lands at the hand-computed TV") {
    // old: a,a,b,b (p = .5/.5); new: a,b,b,b (q = .25/.75) → TV = .25
    val oldDocs = Seq((1L, "s", "a a b b")).toDF("doc_id", "source", "text")
    val newDocs = Seq((2L, "s", "a b b b")).toDF("doc_id", "source", "text")
    val tv = TextAnalysis.corpusDrift(oldDocs, newDocs)
      .select("tv_unigram").as[Double].collect().head
    assert(tv == 0.25)
  }

  // ------------------------------------------- multiTouchAttribution

  test("multiTouchAttribution: every credit arm + window exclusion (hand-computed)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // columns: (event_id, ts, user_id, event_type)
    val events = Seq(
      // user 1: purchase 1 at 12:00 with 3 in-window touches + 1 stale
      (1L, ts("2024-01-01 12:00:00"), 1L, "purchase"),
      (2L, ts("2024-01-01 09:00:00"), 1L, "view"),   // first  → 0.4
      (3L, ts("2024-01-01 10:00:00"), 1L, "click"),  // middle → 0.2
      (4L, ts("2024-01-01 11:00:00"), 1L, "view"),   // last   → 0.4
      (5L, ts("2023-12-29 11:00:00"), 1L, "view"),   // outside 48h → excluded
      // user 2: single touch takes 100%
      (6L, ts("2024-01-01 12:00:00"), 2L, "purchase"),
      (7L, ts("2024-01-01 11:00:00"), 2L, "view"),
      // user 3: two touches split 50/50
      (8L, ts("2024-01-01 12:00:00"), 3L, "purchase"),
      (9L, ts("2024-01-01 10:00:00"), 3L, "view"),
      (10L, ts("2024-01-01 11:00:00"), 3L, "click"),
      // user 4: error events never earn credit
      (11L, ts("2024-01-01 12:00:00"), 4L, "purchase"),
      (12L, ts("2024-01-01 11:00:00"), 4L, "error")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.multiTouchAttribution(events)
      .orderBy("purchase_id", "position")
      .select("purchase_id", "touch_id", "position", "n_touches", "credit")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 3L, 0.4), (1L, 3L, 2L, 3L, 0.2), (1L, 4L, 3L, 3L, 0.4),
      (6L, 7L, 1L, 1L, 1.0),
      (8L, 9L, 1L, 2L, 0.5), (8L, 10L, 2L, 2L, 0.5)))
  }

  // --------------------------------------------------------- sampleFrames

  test("sampleFrames: exact indices, timestamps, luminance sums, gradient hash (hand-computed)") {
    // 2×2 at 5 fps, 3 frames; everyK=2 samples frames 0 and 2.
    val f0 = Array[Byte](10, 20, 30, 40)   // rows (10,20) (30,40): no descending pair
    val f1 = Array[Byte](0, 0, 0, 0)
    val f2 = Array[Byte](9, 5, 5, 9)       // (9>5) bit0 set, (5<9) bit1 clear
    val payload = Multimodal.videoBytes(2, 2, 5, Array(f0, f1, f2))
    val assets = Seq(Asset(7L, "video/x-gvid", payload.length, payload)).toDS()
    val got = Multimodal.sampleFrames(assets, everyK = 2)
      .orderBy("frame_idx")
      .as[(Long, Int, Long, Int, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (7L, 0, 0L, 2, 2, 100L, 0L),
      (7L, 2, 400L, 2, 2, 28L, 1L)))
  }

  test("sampleFrames: corrupt containers degrade row-locally to zero rows") {
    val good = Multimodal.videoBytes(2, 2, 5, Array(Array[Byte](1, 2, 3, 4)))
    val truncated = good.take(good.length - 2)
    val notVideo = "not a container".getBytes("US-ASCII")
    val assets = Seq(
      Asset(1L, "video/x-gvid", good.length, good),
      Asset(2L, "video/x-gvid", truncated.length, truncated),
      Asset(3L, "video/x-gvid", notVideo.length, notVideo)).toDS()
    val got = Multimodal.sampleFrames(assets, everyK = 1)
      .select("asset_id").as[Long].collect().toSeq
    assert(got == Seq(1L), "only the intact container contributes rows")
  }

  test("sampleFrames is deterministic under repartitioning") {
    val ids = (1L to 60L).toDS()
    val a = Multimodal.sampleFrames(Multimodal.syntheticVideoAssets(ids))
      .orderBy("asset_id", "frame_idx").collect().toSeq
    val b = Multimodal.sampleFrames(Multimodal.syntheticVideoAssets(ids.repartition(7)))
      .orderBy("asset_id", "frame_idx").collect().toSeq
    assert(a == b)
    // the truncated id-50 asset is present in the corpus but absent from samples
    assert(!a.exists(_.getLong(0) == 50L))
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
