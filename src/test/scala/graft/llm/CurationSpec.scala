package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the curation composition (end-to-end values are oracled by
  * p01; these are the structural properties).
  */
class CurationSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("curation keeps exactly the quality-passing, lang-matching cluster representatives") {
    val curated = Curation.curate(docs, minQuality = 0.53, lang = Some("en")).collect()
    assert(curated.nonEmpty && curated.length < docs.count())
    assert(curated.forall(_.getAs[Double]("quality") >= 0.53))
    assert(curated.forall(_.getAs[String]("predicted_lang") == "en"))
    // no near-dup non-representative survives
    val nonReps = Dedup.nearDupClusters(docs, 0.8)
      .filter(col("doc_id") =!= col("rep"))
      .collect().map(_.getLong(0)).toSet
    val kept = curated.map(_.getLong(0)).toSet
    assert(kept.intersect(nonReps).isEmpty)
  }

  test("soft-dedup weights: every doc weighted, clusters sum to one doc of mass") {
    val w = Curation.softDedupWeights(docs, threshold = 0.8).persist()
    try {
      // one row per document, nothing dropped
      assert(w.count() == docs.count())
      assert(w.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)
      // the cluster members carry the cluster size; singletons weigh 1.0
      val clustered = Dedup.nearDupClusters(docs, 0.8).persist()
      try {
        val members = clustered.select("doc_id").collect().map(_.getLong(0)).toSet
        val singles = w.filter(!col("doc_id").isin(members.toSeq: _*)).collect()
        assert(singles.forall(r =>
          r.getAs[Long]("cluster_size") == 1L && r.getAs[Double]("weight") == 1.0))
        // each cluster's weights sum to exactly one document of mass
        val sums = w.join(clustered, "doc_id").groupBy("rep")
          .agg(sum("weight").as("mass")).collect()
        assert(sums.nonEmpty && sums.forall(r =>
          math.abs(r.getAs[Double]("mass") - 1.0) < 1e-9))
      } finally { clustered.unpersist(); () }
    } finally { w.unpersist(); () }
  }

  test("full CLI recipe: cap, split, epochs, order compose with their invariants intact") {
    val out = graft.cli.CuratePipeline.recipe(docs,
      minQuality = 0.0, lang = None, threshold = 0.8,
      split = true, sourceCap = Some(150L),
      epochs = Map("src0" -> 2.0), order = true)
      .persist()
    try {
      assert(out.count() > 0)
      // epochs: every src0 survivor appears exactly twice, others once
      val copies = out.groupBy("doc_id", "source").count().collect()
      assert(copies.forall { r =>
        val expect = if (r.getAs[String]("source") == "src0") 2L else 1L
        r.getAs[Long]("count") == expect
      })
      // copies inherit their doc's split: one split per doc_id
      assert(out.groupBy("doc_id").agg(countDistinct("split").as("n"))
        .filter(col("n") > 1).count() == 0)
      // order: dense 1..N over physical rows
      val pos = out.select("position").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      assert(pos.toSeq == (1L to out.count()).toSeq)
      // source cap: no source exceeds ~cap tokens per copy tier
      val srcTokens = out.filter(col("copy_idx") === 1L)
        .select(col("source"), size(split(lower(col("text")), "\\s+")).as("t"))
        .groupBy("source").agg(sum("t").as("tok")).collect()
      assert(srcTokens.forall(_.getAs[Long]("tok") <= 400L),
        "capped sources stay near the budget")
    } finally out.unpersist()
  }

  test("lang = None disables the language filter") {
    val anyLang = Curation.curate(docs, minQuality = 0.0, lang = None).count()
    val nonReps = Dedup.nearDupClusters(docs, 0.8)
      .filter(col("doc_id") =!= col("rep")).count()
    assert(anyLang == docs.count() - nonReps)
  }

  test("buildTrainingCorpus: no contaminated or benchmark doc survives; every row is split-labeled") {
    val benchmark = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val out = Curation.buildTrainingCorpus(corpus, benchmark).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    val contaminated = Dedup.contaminationReport(corpus, benchmark)
      .collect().map(_.getLong(0)).toSet
    assert(ids.intersect(contaminated).isEmpty, "contaminated docs must be dropped")
    assert(ids.forall(_ % 50 != 0), "benchmark ids never enter the corpus")
    assert(out.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
    assert(out.forall(_.getAs[Double]("quality") >= 0.53))
  }
}
