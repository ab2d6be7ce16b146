package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the round-3 corpus operators: repetition signals,
  * PII scrubbing, deterministic sampling/splits, and benchmark
  * decontamination. (Their cross-engine exactness is covered by the
  * x08-x11/d06 DuckDB oracles; these tests pin the SEMANTICS on hand-built
  * inputs where the expected values are computable by eye.)
  */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("boilerplateProfile: shared shingles count as boilerplate, unique ones don't") {
    // docs 1-3 share the exact phrase "terms of service apply" (3 shingles,
    // df=3 ≥ minDocs); each doc also has unique tail words → unique shingles
    val fixture = Seq(
      (1L, "terms of service apply alpha beta gamma"),
      (2L, "terms of service apply delta epsilon zeta"),
      (3L, "terms of service apply eta theta iota"),
      (4L, "completely unrelated text with no shared phrases at all")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateProfile(fixture, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 7 words → 5 shingles/doc; "terms of service", "of service apply" have
    // df=3; "service apply alpha|delta|eta" and the tails are unique
    assert(out(0) == (1L, 5L, 2L, 0.4))
    assert(out(1) == (2L, 5L, 2L, 0.4))
    assert(out(2) == (3L, 5L, 2L, 0.4))
    val d4 = out(3)
    assert(d4._1 == 4L && d4._3 == 0L && d4._4 == 0.0, s"doc 4 must have zero boilerplate: $d4")
  }

  test("repetition: dup fractions match hand-computed values") {
    val df = Seq(
      (1L, "a a a a"),        // 2-grams: 3 total, 1 distinct; 3-grams: 2 total, 1 distinct
      (2L, "a b c d"),        // all distinct
      (3L, "x")               // too short: fractions 0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(df).orderBy("doc_id")
      .select("dup_2gram_frac", "dup_3gram_frac").as[(Double, Double)].collect()
    assert(math.abs(r(0)._1 - 2.0 / 3.0) < 1e-12 && math.abs(r(0)._2 - 0.5) < 1e-12)
    assert(r(1) == ((0.0, 0.0)))
    assert(r(2) == ((0.0, 0.0)))
  }

  test("piiScrub: redacts emails, urls, digit runs; counts per class") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.io and see https://a.b/c?d=1 code 12345678"),
      (2L, "clean text 123")  // short digits survive
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_emails") == 1 && out(0).getAs[Int]("n_urls") == 1
      && out(0).getAs[Int]("n_longnums") == 1)
    assert(out(0).getAs[String]("scrubbed") == "mail <EMAIL> and see <URL> code <NUM>")
    assert(out(1).getAs[String]("scrubbed") == "clean text 123")
  }

  test("sampling is deterministic and hits the target rate within tolerance") {
    val once = Sampling.hashSample(docs, "doc_id", 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    val twice = Sampling.hashSample(docs.repartition(7), "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == twice, "sample must not depend on partitioning")
    val n = docs.count().toDouble
    assert(math.abs(once.size / n - 0.5) < 0.1, s"rate ${once.size / n} far from 0.5")
  }

  test("rate boundaries: 1.0 keeps everything, 0.0 keeps nothing") {
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == docs.count())
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0)
  }

  test("per-mille rates keep a nonzero fraction; out-of-range rates throw (ADVICE r3)") {
    // 0.004 × 65536 buckets ≈ 262 — far from the 256-bucket floor that
    // silently kept nothing below ~0.2%; 20k ids make expected≈80, and the
    // md5 bucketing is deterministic so this is a fixed, not flaky, count
    val ids = spark.range(0, 20000).toDF("doc_id")
    val kept = Sampling.hashSample(ids, "doc_id", 0.004).count()
    assert(kept > 0, "sub-percent rate must not quantize to zero")
    assert(kept < 1000, s"rate 0.004 kept $kept of 20000")
    assertThrows[IllegalArgumentException] { Sampling.hashSample(ids, "doc_id", -0.1).count() }
    assertThrows[IllegalArgumentException] { Sampling.hashSample(ids, "doc_id", 1.5).count() }
  }

  test("weighted sample: per-row rates gate correctly at both boundaries and mid-range") {
    val rows = spark.range(0, 20000).toDF("doc_id")
      .withColumn("w",
        when(col("doc_id") % 3 === 0, lit(1.0))       // keep all
          .when(col("doc_id") % 3 === 1, lit(0.0))    // keep none
          .otherwise(lit(0.5)))                       // keep ~half
    val kept = Sampling.weightedSample(rows, "doc_id", "w").persist()
    try {
      assert(kept.filter(col("w") === 1.0).count() == rows.filter(col("w") === 1.0).count(),
        "weight 1.0 must keep unconditionally (the g000 sentinel)")
      assert(kept.filter(col("w") === 0.0).count() == 0, "weight 0.0 must keep nothing")
      // out-of-contract NEGATIVE weights clamp to keep-nothing — unclamped,
      // floor(w*65536) is a negative long whose hex truncates to 'ffff'
      // and keeps nearly everything (ADVICE r11)
      val neg = Sampling.weightedSample(
        rows.withColumn("w", lit(-0.25)), "doc_id", "w")
      assert(neg.count() == 0, "negative weight must keep nothing, not everything")
      val half = kept.filter(col("w") === 0.5).count().toDouble /
        rows.filter(col("w") === 0.5).count().toDouble
      assert(math.abs(half - 0.5) < 0.05, s"mid-rate kept $half, expected ~0.5")
      // deterministic in (id, salt): independent of partitioning
      val again = Sampling.weightedSample(rows.repartition(7), "doc_id", "w")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(again == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
      // agrees with the constant-rate gate at the same rate and salt
      val viaConst = Sampling.hashSample(
        rows.filter(col("w") === 0.5), "doc_id", 0.5, salt = "soft")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaConst == kept.filter(col("w") === 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet,
        "per-row gate at a constant weight must equal the constant-rate gate")
    } finally { kept.unpersist(); () }
  }

  test("stratified sampling applies per-stratum rates") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.9), 0.1)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    val deRate = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(enRate > 0.7, s"en kept at $enRate, expected ~0.9")
    assert(deRate < 0.35, s"de kept at $deRate, expected ~0.1")
  }

  test("train/val/test split is exhaustive, disjoint, and id-stable") {
    val split = Sampling.trainValTestSplit(docs, "doc_id").select("doc_id", "split")
    assert(split.count() == docs.count())
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.1)
    // stability: the split of a given id is unchanged when computed on a subset
    val subset = Sampling.trainValTestSplit(docs.filter(col("doc_id") < 100), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = split.filter(col("doc_id") < 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset == full, "membership of other rows must not affect a doc's split")
  }

  test("multistep funnel: ordering between steps is enforced") {
    import java.sql.Timestamp
    def ev(id: Long, ts: String, user: Long, typ: String) =
      (id, Timestamp.valueOf(ts), user, typ, 1.0)
    val events = Seq(
      // user 1: signup → view → purchase in order: counts in all three steps
      ev(1, "2024-01-01 09:00:00", 1, "signup"),
      ev(2, "2024-01-01 10:00:00", 1, "view"),
      ev(3, "2024-01-01 11:00:00", 1, "purchase"),
      // user 2: view BEFORE signup, purchase after signup but no view after
      // signup: counts in step 1 only
      ev(4, "2024-01-01 08:00:00", 2, "view"),
      ev(5, "2024-01-01 09:00:00", 2, "signup"),
      ev(6, "2024-01-01 10:00:00", 2, "purchase"),
      // user 3: purchase BETWEEN signup and view: steps 1 and 2 only
      ev(7, "2024-01-01 09:00:00", 3, "signup"),
      ev(8, "2024-01-01 09:30:00", 3, "purchase"),
      ev(9, "2024-01-01 10:00:00", 3, "view"),
      // user 4: never signs up: no step
      ev(10, "2024-01-01 09:00:00", 4, "view"),
      ev(11, "2024-01-01 10:00:00", 4, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.multistepFunnel(events).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("stopRatioByLang scores against the predicted language's lexicon") {
    val df = Seq(
      (1L, "el la de y en es los la"),      // spanish-heavy: all 8 tokens are es stopwords
      (2L, "the a and of completely new")   // english: 4 of 6 are en stopwords
    ).toDF("doc_id", "text")
    val r = TextAnalysis.stopRatioByLang(df).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("predicted_lang") == "es")
    assert(math.abs(r(0).getAs[Double]("stop_ratio") - 1.0) < 1e-12)
    assert(r(1).getAs[String]("predicted_lang") == "en")
    assert(math.abs(r(1).getAs[Double]("stop_ratio") - 4.0 / 6.0) < 1e-12)
  }

  test("scoreDocuments agrees with qualityScore ⋈ langId (single-projection form)") {
    val one = TextAnalysis.scoreDocuments(docs)
      .select("doc_id", "quality", "predicted_lang")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val joined = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
      .join(TextAnalysis.langId(docs).select(col("doc_id"), col("predicted_lang")), Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(one == joined)
  }

  test("multi-signal clusters cover both the text-only and embedding-only memberships") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val multi = Dedup.multiSignalClusters(docs, embs)
      .collect().map(_.getLong(0)).toSet
    val textOnly = Dedup.nearDupClusters(docs, 0.8)
      .collect().map(_.getLong(0)).toSet
    val embMembers = Similarity.blockedNearDupPairs(embs, 0.45)
      .select("vec_a", "vec_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(textOnly.subsetOf(multi), "every text near-dup member stays clustered")
    assert(embMembers.subsetOf(multi), "every embedding near-dup member joins a cluster")
    assert(multi == textOnly ++ embMembers, "no member appears without a supporting signal")
  }

  test("decontamination: planted overlap is reported; clean docs survive") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "completely unrelated words here padding tokens"),
      (2L, "said the quick brown fox yesterday"),  // shares "the quick brown" + "quick brown fox"
      (3L, "another clean document with no overlap at all")
    ).toDF("doc_id", "text")
    val report = Dedup.contaminationReport(corpus, bench).collect()
    assert(report.map(_.getLong(0)).toSet == Set(2L))
    assert(report.head.getLong(1) == 2L)
    val clean = Dedup.decontaminate(corpus, bench).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(1L, 3L))
  }

  test("decontamination plan broadcasts the benchmark shingles (no corpus shuffle of text)") {
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val plan = Dedup.contaminationReport(corpus, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side should broadcast:\n$plan")
  }
}
