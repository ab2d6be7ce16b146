package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Inverted text index (llm/Search): postings correctness, serve ≡ direct
  * corpus compute, driver/executor bucket agreement (the pruning contract),
  * and the partition-pruned serve plan.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark merge window spark"),
    (2L, "window merge"),
    (3L, "SPARK window merge merge"),
    (4L, "spark spark spark"),
    (5L, " window  spark merge ")
  ).toDF("doc_id", "text")

  test("postings: exact (term, doc_id, tf) rows, case-folded, empties dropped") {
    val got = Search.postings(corpus)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("spark", 1L, 2L), ("merge", 1L, 1L), ("window", 1L, 1L),
      ("window", 2L, 1L), ("merge", 2L, 1L),
      ("spark", 3L, 1L), ("window", 3L, 1L), ("merge", 3L, 2L),
      ("spark", 4L, 3L),
      ("spark", 5L, 1L), ("window", 5L, 1L), ("merge", 5L, 1L)))
  }

  test("searchAll: conjunctive match with exact tf ranking, query case-folded") {
    val idx = java.nio.file.Files.createTempDirectory("graft-search").toString
    Search.writeIndex(corpus, idx, buckets = 8)
    val got = Search.searchAll(spark, idx, Seq("Spark", "WINDOW", "merge"), buckets = 8)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // doc 2 lacks spark, doc 4 lacks window+merge
    assert(got == Seq((1L, 4L), (3L, 4L), (5L, 3L)))
  }

  test("searchAll ≡ searchAllDirect on every subset of query terms") {
    val idx = java.nio.file.Files.createTempDirectory("graft-search").toString
    Search.writeIndex(corpus, idx, buckets = 8)
    for (terms <- Seq(Seq("spark"), Seq("merge", "window"), Seq("spark", "merge", "window"))) {
      val served = Search.searchAll(spark, idx, terms, buckets = 8)
        .orderBy("doc_id").collect().toSeq
      val direct = Search.searchAllDirect(corpus, terms)
        .orderBy("doc_id").collect().toSeq
      assert(served == direct, s"terms=$terms")
    }
  }

  test("driver and executor term buckets agree (the pruning correctness contract)") {
    val terms = Seq("spark", "window", "merge", "the", "a", "Zsh", "émigré", "")
    val fromSpark = terms.toDF("t")
      .select(col("t"), Search.termBucket(col("t"), 64).as("b"))
      .as[(String, Int)].collect().toMap
    terms.foreach { t =>
      assert(Search.termBucketLocal(t, 64) == fromSpark(t), s"term '$t'")
    }
  }

  test("serve plan prunes to the query terms' bucket partitions") {
    withConf("spark.sql.adaptive.enabled", "false") {
    val idx = java.nio.file.Files.createTempDirectory("graft-search").toString
    Search.writeIndex(corpus, idx, buckets = 16)
    val df = Search.searchAll(spark, idx, Seq("spark", "merge"), buckets = 16)
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.headOption.getOrElse(fail("no file scan in serve plan"))
    assert(scan.partitionFilters.nonEmpty, "serve scan has no partition filters")
    // repartition(bucket) lays out one file per bucket dir, so files read ==
    // bucket partitions selected
    val expected = Seq("spark", "merge").map(Search.termBucketLocal(_, 16)).distinct
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead == expected.length,
      s"read $filesRead bucket files, expected ${expected.length} of 16")
    // the term equality also reaches the parquet scan
    assert(scan.dataFilters.exists(_.toString.contains("term")),
      "term predicate not pushed to the scan")
    }
  }

  test("versioned index: init + append over doc halves ≡ one-shot build") {
    val oneShot = java.nio.file.Files.createTempDirectory("graft-search-1s").toString
    val inc = java.nio.file.Files.createTempDirectory("graft-search-inc").toString
    Search.writeIndex(corpus, oneShot, buckets = 8)
    Search.initIndex(corpus.filter(col("doc_id") % 2 === 0), inc, buckets = 8)
    Search.appendToIndex(corpus.filter(col("doc_id") % 2 === 1), inc, buckets = 8)
    for (terms <- Seq(Seq("spark"), Seq("spark", "window", "merge"))) {
      val a = Search.searchAll(spark, oneShot, terms, buckets = 8)
        .orderBy("doc_id").collect().toSeq
      val b = Search.searchAllIndexed(spark, inc, terms, buckets = 8)
        .orderBy("doc_id").collect().toSeq
      assert(a == b, s"terms=$terms")
    }
  }

  test("versioned index: a document whose text is split across appends sums tf additively") {
    val inc = java.nio.file.Files.createTempDirectory("graft-search-split").toString
    Search.initIndex(Seq((1L, "spark spark window")).toDF("doc_id", "text"), inc, buckets = 8)
    Search.appendToIndex(Seq((1L, "spark merge")).toDF("doc_id", "text"), inc, buckets = 8)
    val got = Search.searchAllIndexed(spark, inc, Seq("spark", "window", "merge"), buckets = 8)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L)))
  }

  test("serve fails fast on a bucket-count mismatch (silent mis-pruning guard)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-search-bk").toString
    Search.writeIndex(corpus, idx, buckets = 8)
    intercept[IllegalArgumentException] {
      Search.searchAll(spark, idx, Seq("spark"), buckets = 16)
    }
    val inc = java.nio.file.Files.createTempDirectory("graft-search-bk2").toString
    Search.initIndex(corpus, inc, buckets = 8)
    intercept[IllegalArgumentException] {
      Search.appendToIndex(corpus, inc, buckets = 16)
    }
    intercept[IllegalArgumentException] {
      Search.searchAllIndexed(spark, inc, Seq("spark"), buckets = 16)
    }
  }

  test("versioned index: serve fails fast on an uninitialized store") {
    val empty = java.nio.file.Files.createTempDirectory("graft-search-empty").toString
    intercept[IllegalArgumentException] {
      Search.searchAllIndexed(spark, empty, Seq("spark"), buckets = 8)
    }
  }

  test("searchRanked ≡ bm25Score on matching docs, bit-for-bit; zero-match docs absent") {
    val withMiss = corpus.union(Seq((6L, "nothing relevant here")).toDF("doc_id", "text"))
    val idx = java.nio.file.Files.createTempDirectory("graft-ranked").toString
    Search.writeRankedIndex(withMiss, idx, buckets = 8)
    val terms = Seq("spark", "merge", "absentterm")
    val served = Search.searchRanked(spark, idx, terms, k = 10, buckets = 8)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val direct = TextAnalysis.bm25Score(withMiss, terms)
      .filter(col("bm25") > 0.0)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(served == direct)
    assert(!served.exists(_._1 == 6L), "zero-match doc leaked into the ranked serve")
  }

  test("searchRanked top-k boundary: total order (score desc, doc_id) decides ties") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ranked-k").toString
    Search.writeRankedIndex(corpus, idx, buckets = 8)
    val all = Search.searchRanked(spark, idx, Seq("spark", "window"), k = 100, buckets = 8)
      .as[(Long, Double)].collect().toSeq
    val expectedTop2 = all.sortBy { case (id, s) => (-s, id) }.take(2).toSet
    val top2 = Search.searchRanked(spark, idx, Seq("spark", "window"), k = 2, buckets = 8)
      .as[(Long, Double)].collect().toSet
    assert(top2 == expectedTop2)
  }

  test("searchRanked plan prunes to the query terms' bucket partitions") {
    withConf("spark.sql.adaptive.enabled", "false") {
      val idx = java.nio.file.Files.createTempDirectory("graft-ranked-pr").toString
      Search.writeRankedIndex(corpus, idx, buckets = 16)
      val df = Search.searchRanked(spark, idx, Seq("spark", "merge"), k = 10, buckets = 16)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no file scan in ranked serve plan")
      val expected = Seq("spark", "merge").map(Search.termBucketLocal(_, 16)).distinct
      scans.foreach { scan =>
        assert(scan.partitionFilters.nonEmpty, "ranked serve scan has no partition filters")
        assert(scan.metrics("numFiles").value == expected.length,
          s"read ${scan.metrics("numFiles").value} bucket files, expected ${expected.length} of 16")
      }
    }
  }

  test("versioned ranked index: init + append over doc halves ≡ one-shot ranked build") {
    val oneShot = java.nio.file.Files.createTempDirectory("graft-ranked-1s").toString
    val inc = java.nio.file.Files.createTempDirectory("graft-ranked-inc").toString
    Search.writeRankedIndex(corpus, oneShot, buckets = 8)
    Search.initRankedIndex(corpus.filter(col("doc_id") % 2 === 0), inc, buckets = 8)
    Search.appendToRankedIndex(corpus.filter(col("doc_id") % 2 === 1), inc, buckets = 8)
    val terms = Seq("spark", "window")
    val one = Search.searchRanked(spark, oneShot, terms, k = 10, buckets = 8)
      .orderBy("doc_id").collect().toSeq
    val merged = Search.searchRankedIndexed(spark, inc, terms, k = 10, buckets = 8)
      .orderBy("doc_id").collect().toSeq
    assert(one == merged, "incremental ranked serve must match the one-shot build bit-for-bit")
  }

  test("searchRankedIndexed fails fast on a version without the stats sidecar") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ranked-nost").toString
    Search.initIndex(corpus, idx, buckets = 8) // conjunctive init: no STATS
    intercept[RuntimeException] {
      Search.searchRankedIndexed(spark, idx, Seq("spark"), k = 5, buckets = 8)
    }
  }

  test("searchRanked fails fast on a store without the stats sidecar") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ranked-ns").toString
    Search.writeIndex(corpus, idx, buckets = 8)
    intercept[RuntimeException] {
      Search.searchRanked(spark, idx, Seq("spark"), k = 5, buckets = 8)
    }
  }

  test("writeIndex overwrite is idempotent: rebuild serves identical results") {
    val idx = java.nio.file.Files.createTempDirectory("graft-search").toString
    Search.writeIndex(corpus, idx, buckets = 8)
    val first = Search.searchAll(spark, idx, Seq("spark"), buckets = 8)
      .orderBy("doc_id").collect().toSeq
    Search.writeIndex(corpus, idx, buckets = 8)
    val second = Search.searchAll(spark, idx, Seq("spark"), buckets = 8)
      .orderBy("doc_id").collect().toSeq
    assert(first == second)
  }
}
