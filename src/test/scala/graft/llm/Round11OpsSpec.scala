package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 pins: the kmeans-trained PQ codebooks are the REGISTERED
  * serving config for s08/s09/s10 (VERDICT r10 #3) — so training must be
  * reproducible, bounded, and flow through the persisted index unchanged.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private val TwinOffset = 1000000L

  private lazy val corpus =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pqCodebooksKMeans is deterministic: two fits yield identical books") {
    val a = Similarity.pqCodebooksKMeans(corpus, kCent = 8, maxIter = 5)
    val b = Similarity.pqCodebooksKMeans(corpus, kCent = 8, maxIter = 5)
    assert(a == b, "trained codebooks must be bit-reproducible (fixed seed + sample)")
  }

  test("fit sample is bounded: training cost independent of corpus size") {
    // a 64-row cap must train valid rectangular books on the same corpus
    val books = Similarity.pqCodebooksKMeans(corpus, kCent = 8, maxIter = 3,
      fitSampleRows = 64)
    assert(books.length == Similarity.PqSubspaces)
    assert(books.forall(_.length == 8))
    val dsub = books.head.head.length
    assert(books.forall(_.forall(_.length == dsub)))
  }

  test("trained books round-trip the persisted IVF-PQ index byte-exactly") {
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val trained = Similarity.pqCodebooksKMeans(corpus, kCent = 8, maxIter = 5)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-trained")
    try {
      Similarity.writeIvfPqIndex(corpus, idxDir.toString, kCent = 8,
        booksIn = Some(trained))
      val handle = new Similarity.IvfPqIndexHandle(spark, idxDir.toString)
      assert(handle.books == trained, "stored codebooks must equal the trained ones")
      val served = Similarity.ivfPqTopKFromIndex(
        corpus.filter(pred), idxDir.toString, k = 10, nProbe = 8,
        rerankAgainst = Some(corpus))
        .orderBy("query_id", "rank").collect()
      val inMem = Similarity.ivfPqTopKWith(corpus,
        Similarity.ivfCentroids(corpus), trained, pred, k = 10, nProbe = 8)
        .orderBy("query_id", "rank").collect()
      assert(served.toSeq == inMem.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  // --------------------------------------------- gopherLineRules (x23)

  test("gopherLineRules: bullet/ellipsis fractions and verdicts, hand-computed") {
    val docs = Seq(
      (1L, "plain one\nplain two"),                        // 2 lines, clean
      (2L, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"), // 10/10 bullets
      (3L, "head\n- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i"), // 9/10 = 0.9 boundary
      (4L, "x...\ny...\nz...\nw...\na\nb\nc\nd\ne\nf"),    // 4/10 ellipsis > 0.3
      (5L, "x...\ny...\nz...\na\nb\nc\nd\ne\nf\ng"),       // 3/10 = 0.3 boundary
      (6L, "  • indented\n\t- tabbed\nends…\n* star\nplain"), // unicode forms
      (7L, "trailing newline\n"),                          // empty last line counts
      (8L, "-nospace\nmid - dash\ntwo dots ..\ndots ... middle"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherLineRules(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getBoolean(6), r.getBoolean(7), r.getBoolean(8))).toSeq
    assert(out == Seq(
      (1L, 2, 0, 0, true, true, true),
      (2L, 10, 10, 0, false, true, false),   // 1.0 > 0.9 → removed
      (3L, 10, 9, 0, true, true, true),      // exactly 0.9 → kept
      (4L, 10, 0, 4, true, false, false),    // 0.4 > 0.3 → removed
      (5L, 10, 0, 3, true, true, true),      // exactly 0.3 → kept
      (6L, 5, 3, 1, true, true, true),       // •/tab/−/* markers, … ending
      (7L, 2, 0, 0, true, true, true),       // split keeps the trailing empty
      (8L, 4, 0, 0, true, true, true)))      // near-miss markers don't count
  }

  test("gopherLineRules plans as a narrow map: no exchange, no window") {
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = TextAnalysis.gopherLineRules(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line rules must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"line rules must not window:\n$plan")
  }

  test("trained books recover planted twins at rank 1 through the re-rank") {
    val base = corpus.select("vec_id", "embedding")
    val twins = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + TwinOffset).as("vec_id"), col("embedding"))
    val planted = base.unionByName(twins)
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val books = Similarity.pqCodebooksKMeans(planted, kCent = 8, maxIter = 5)
    val top1 = Similarity.pqTopKRerankedWith(planted, books, pred, k = 10)
      .filter(col("rank") === 1)
    val hits = top1.filter(col("neighbor_id") === col("query_id") + TwinOffset).count()
    assert(hits == top1.count(),
      "every query's exact twin must surface at rank 1 after the exact re-rank")
  }
}
