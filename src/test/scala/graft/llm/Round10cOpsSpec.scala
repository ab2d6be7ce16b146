package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 continuation operators: exact sparse-Jaccard pair join (d11),
  * unigram-LM surprisal scoring (x16), temperature-resampled language
  * mix (p04).
  */
class Round10cOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------- exactJaccardPairs

  /** Planted corpus: {1, 2} differ by one word (high Jaccard), {3} shares a
    * few shingles with 1 (low Jaccard), {4} is disjoint.
    */
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy cat again and again"),
    (3L, "the quick brown fox went home early yesterday evening quietly alone"),
    (4L, "completely different text with no overlap whatsoever in any shingle")
  ).toDF("doc_id", "text")

  test("exactJaccardPairs finds exactly the pairs over threshold, with exact scores") {
    val out = Dedup.exactJaccardPairs(docs, threshold = 0.5)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)), "only the planted near-pair")
    // 12 tokens → 10 distinct 3-shingles each; one word differs at position
    // 9 (0-based 8), breaking shingles starting at 6, 7, 8 → 7 shared
    val j = out.head._3
    assert(j == 7.0 / 13.0, s"exact Jaccard 7/(10+10-7), got $j")
  }

  test("exactJaccardPairs agrees with the LSH path on every verified pair") {
    // the gold path and the banded-LSH path must produce the identical pair
    // set + scores at the d02 operating point on a corpus where LSH recall
    // is ~certain (near-identical docs)
    val lsh = Dedup.nearDupPairs(docs, threshold = 0.5)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
    val exact = Dedup.exactJaccardPairs(docs, threshold = 0.5)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
    assert(lsh == exact)
  }

  test("exactJaccardPairs is partition-layout independent") {
    val a = Dedup.exactJaccardPairs(docs.repartition(1), threshold = 0.5)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
    val b = Dedup.exactJaccardPairs(docs.repartition(7), threshold = 0.5)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  // ------------------------------------------------------ unigramSurprisal

  test("unigramSurprisal scores rare-token documents above common-token ones") {
    val corpus = Seq(
      (1L, "common common common common"),
      (2L, "common common common common"),
      (3L, "rare words appear here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(corpus)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), "one row per doc")
    assert(out.forall(_._2 == 4L), "token counts")
    val byId = out.map(r => r._1 -> r._3).toMap
    assert(byId(1L) == byId(2L), "identical docs score identically")
    assert(byId(3L) > byId(1L), "hapax-token doc has higher surprisal")
    // doc 3: four tokens each appearing once in 12 total → ln(12) each
    assert(math.abs(byId(3L) - math.log(12.0)) < 1e-3)
    // doc 1: 'common' appears 8 times in 12 → ln(12/8)
    assert(math.abs(byId(1L) - math.log(1.5)) < 1e-3)
  }

  test("unigramSurprisal is partition-layout independent (decimal-quantized sums)") {
    val corpus = (1L to 200L).map(i =>
      (i, s"tok${i % 17} tok${i % 5} tok${i % 29} filler word number $i"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.unigramSurprisal(corpus.repartition(1))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val b = TextAnalysis.unigramSurprisal(corpus.repartition(13))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  // -------------------------------------------------------- temperatureMix

  /** Skewed bilingual corpus: many English docs, few Spanish. */
  private def langCorpus = {
    val en = (1L to 90L).map(i => (i, "the quick fox and the lazy dog of the day"))
    val es = (101L to 110L).map(i => (i, "el perro y el gato de la casa en la calle"))
    (en ++ es).toDF("doc_id", "text")
  }

  test("temperatureMix keeps low-resource languages whole and thins dominant ones") {
    val n = langCorpus.count()
    // budget below the corpus: es (110 tokens, target ≈111) keeps everything
    // (rate 1), en (900 tokens, target ≈209) must thin
    val out = Sampling.temperatureMix(langCorpus, alpha = 0.3, budgetTokens = 320L)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.getOrElse("es", 0L) == 10L, "under-budget language passes whole")
    assert(byLang.getOrElse("en", 0L) > 0L && byLang("en") < 90L, "dominant language thinned")
    assert(out.count() < n)
    // flattening: the kept en:es TOKEN ratio must sit far below the 9:1 corpus
    // ratio (alpha=0.3 pushes weights toward uniform)
    assert(byLang("en").toDouble / byLang("es") < 5.0)
  }

  test("temperatureMix keeps everything when the budget covers the corpus") {
    val out = Sampling.temperatureMix(langCorpus, alpha = 0.3, budgetTokens = 100000L)
    assert(out.count() == langCorpus.count())
    assert(out.select("thresh").distinct().as[String].collect().toSet == Set("g000"))
  }

  test("temperatureMix is deterministic across partitionings") {
    val a = Sampling.temperatureMix(langCorpus.repartition(1), alpha = 0.3, budgetTokens = 300L)
      .orderBy("doc_id").collect().toSeq
    val b = Sampling.temperatureMix(langCorpus.repartition(11), alpha = 0.3, budgetTokens = 300L)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("temperatureMix rejects out-of-range parameters") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(langCorpus, alpha = 0.0, budgetTokens = 100L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(langCorpus, alpha = 1.5, budgetTokens = 100L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(langCorpus, alpha = 0.3, budgetTokens = 0L)
    }
  }
}
