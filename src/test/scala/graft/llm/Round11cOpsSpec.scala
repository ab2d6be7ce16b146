package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 third-session operators: PMI collocations (x33) + later
  * additions from the same session.
  */
class Round11cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiCollocations: hand-computed PMI on a perfectly-associated pair") {
    // 6 docs of "x y": c_xy=6, N_bi=6, c_x=c_y=6, N_uni=12
    // PMI = ln((6/6) / ((6/12)*(6/12))) = ln 4 = 1.38629436 at scale 8
    val docs = (1 to 6).map(i => (i.toLong, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, minCount = 5)
      .select("w1", "w2", "n_pair", "pmi").as[(String, String, Long, Double)]
      .collect().toSeq
    assert(out === Seq(("x", "y", 6L, 1.38629436)))
  }

  test("pmiCollocations: fully-crossed design scores ln 4 exactly; minCount prunes") {
    // all four combinations of {a,c} x {b,d} appear 8x each:
    // p(ab) = 8/32 = 1/4, p(a) = p(b) = 16/64 = 1/4
    // PMI = ln(0.25 / (0.25 * 0.25)) = ln 4 for every pair — assert the
    // exact DECIMAL(18,8)-quantized value.
    val pairsAB = (1 to 8).map(i => (i.toLong, "a b"))
    val pairsAD = (1 to 8).map(i => (100 + i.toLong, "a d"))
    val pairsCB = (1 to 8).map(i => (200 + i.toLong, "c b"))
    val pairsCD = (1 to 8).map(i => (300 + i.toLong, "c d"))
    val docs = (pairsAB ++ pairsAD ++ pairsCB ++ pairsCD).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, minCount = 5)
    assert(out.count() === 4)
    val ab = out.filter(col("w1") === "a" && col("w2") === "b")
      .select("pmi").as[Double].head()
    assert(ab === math.floor(math.log(4) * 1e8 + 0.5) / 1e8 ||
      ab === BigDecimal(math.log(4)).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // rare pair below minCount disappears
    val withRare = docs.union(Seq((999L, "q z")).toDF("doc_id", "text"))
    assert(TextAnalysis.pmiCollocations(withRare, minCount = 5)
      .filter(col("w1") === "q").count() === 0)
  }

  test("canonicalPerCluster: best-quality copy survives, ties break to min id") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home now"
    val docs = Seq(
      (1L, base),                        // near-dup cluster {1,2}: 2 is longer
      (2L, base + " tonight my friend"), // => higher len_score => canonical
      (7L, "completely different words entirely unrelated content here today"),
      (10L, "copy of twin text body exactly equal weight and length overall"),
      (11L, "copy of twin text body exactly equal weight and length overall"))
      .toDF("doc_id", "text")
    val out = Dedup.canonicalPerCluster(docs, threshold = 0.6)
      .orderBy("doc_id")
      .select("doc_id", "rep", "canonical_id", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 2L, false),   // cluster rep is min id, canonical is best copy
      (2L, 1L, 2L, true),
      (7L, 7L, 7L, true),    // singleton keeps itself
      (10L, 10L, 10L, true), // exact twins: equal quality, min id survives
      (11L, 10L, 10L, false)))
  }

  test("QualityModel: GD actually learns (beats majority class), exactly reproducible") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val preds = QualityModel.trainAndPredict(t.documents, iterations = 3)
    val n = preds.count().toDouble
    val acc = preds.filter((col("pred") && col("y") === 1.0) ||
      (!col("pred") && col("y") === 0.0)).count() / n
    val majority = math.max(
      preds.filter(col("y") === 1.0).count() / n,
      preds.filter(col("y") === 0.0).count() / n)
    assert(acc > majority, s"accuracy $acc must beat majority baseline $majority")
    // training is partitioning-independent: exact weight equality
    val w1 = QualityModel.train(t.documents, iterations = 3)
    val w2 = QualityModel.train(t.documents.repartition(13), iterations = 3)
    assert(w1.toSeq === w2.toSeq)
  }

  test("QualityModel: one GD step separates opposite-label documents") {
    val docs = Seq((1L, "short doc here"), (2L, "x " * 200)).toDF("doc_id", "text")
    val preds = QualityModel.trainAndPredict(docs, iterations = 1)
    assert(preds.count() === 2)
    // after one step from w=0 the two opposite-label docs separate
    val ps = preds.orderBy("doc_id").select("p").as[Double].collect()
    assert(ps(0) < ps(1), "longer (positive-label) doc must score higher after one step")
  }

  test("KMeans: hand-computed Lloyd step, tie to smaller cid, empty cluster persists") {
    // 1-D points embedded in 2-D; init = two smallest vec_ids (0.0 and 10.0)
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(10.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(9.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val m = KMeans.train(emb, k = 2, iterations = 1)
    assert(m(0).toSeq === Seq(0.5, 0.0)) // mean of {0,1}
    assert(m(1).toSeq === Seq(9.5, 0.0)) // mean of {10,9}
    val assigned = KMeans.trainAndAssign(emb, k = 2, iterations = 1)
      .orderBy("vec_id").select("cid").as[Long].collect().toSeq
    assert(assigned === Seq(0L, 1L, 0L, 1L))

    // equidistant point: tie breaks to the smaller cid
    val tie = Seq((1L, Seq(0.0f)), (2L, Seq(2.0f)), (3L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val tieCid = KMeans.trainAndAssign(tie, k = 2, iterations = 0)
      .filter(col("vec_id") === 3).select("cid").as[Long].head()
    assert(tieCid === 0L)

    // an emptied cluster keeps its previous centroid (init c2 duplicates
    // c0's point, every vector prefers a smaller-cid centroid)
    val dup = Seq((1L, Seq(0.0f)), (2L, Seq(5.0f)), (3L, Seq(0.0f)))
      .toDF("vec_id", "embedding")
    val m3 = KMeans.train(dup, k = 3, iterations = 2)
    assert(m3(2).toSeq === Seq(0.0)) // untouched init value
  }

  test("KMeans: training is partitioning-independent (exact model equality)") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val a = KMeans.train(t.embeddings, k = 4, iterations = 2)
    val b = KMeans.train(t.embeddings.repartition(11), k = 4, iterations = 2)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("semDeDupKMeans: planted duplicates pruned within learned clusters") {
    // two tight groups; 11 duplicates 1, 12 near-duplicates 2
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f)),
      (11L, Seq(1.0f, 0.0f, 0.0f)), (12L, Seq(0.0f, 0.99f, 0.1f)),
      (30L, Seq(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDeDupKMeans(emb, k = 3, iterations = 2, threshold = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "rep_id", "kept").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 1L), (2L, 2L, 1L), (11L, 1L, 0L), (12L, 2L, 0L), (30L, 30L, 1L)))
  }

  test("zipfFit: flat distribution fits slope 0 exactly; perfect Zipf fits ~ -1") {
    // two tokens, equal frequency: y is constant => exact 0 slope
    val flat = Seq((1L, "aa bb"), (2L, "aa bb")).toDF("doc_id", "text")
    val f = TextAnalysis.zipfFit(flat).select("n_vocab", "slope")
      .as[(Long, Double)].head()
    assert(f === ((2L, 0.0)))
    // freq ∝ 1/rank (6, 3, 2): ln freq = ln 6 - ln rank => slope -1
    // (up to the DECIMAL(18,8) quantization of each ln)
    val words = Seq.fill(6)("aa") ++ Seq.fill(3)("bb") ++ Seq.fill(2)("cc")
    val zipf = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val z = TextAnalysis.zipfFit(zipf).select("slope").as[Double].head()
    assert(math.abs(z + 1.0) < 1e-6, s"slope $z should be ~ -1")
  }

  test("ccnetBuckets: terciles per language, head = lowest surprisal, no Window") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.ccnetBuckets(t.documents)
    // every language splits 3 ways with near-equal tercile sizes
    val sizes = out.groupBy("lang", "bucket").count()
      .groupBy("lang").agg(max("count").as("mx"), min("count").as("mn"),
        count(lit(1)).as("nb")).collect()
    sizes.foreach { r =>
      assert(r.getLong(3) === 3L, s"lang ${r.getString(0)} must have 3 buckets")
      assert(r.getLong(1) - r.getLong(2) <= 1, "terciles within 1 of each other")
    }
    // ordering: every head doc scores <= every tail doc within its language
    val agg = out.groupBy("lang").agg(
      max(when(col("bucket") === "head", col("surprisal"))).as("maxHead"),
      min(when(col("bucket") === "tail", col("surprisal"))).as("minTail")).collect()
    agg.foreach(r => assert(r.getDouble(1) <= r.getDouble(2),
      s"head must outscore tail in ${r.getString(0)}"))
    assert(!out.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("leakFreeSplit: planted cross-split copy drops; disjoint survives; test never drops") {
    val ids = spark.range(1, 201).select(col("id").as("doc_id"))
    val sp = Sampling.trainValTestSplit(ids, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect()
    val testId = sp.find(_._2 == "test").get._1
    val trainIds = sp.filter(_._2 == "train").map(_._1)
    val (leakTrain, cleanTrain) = (trainIds(0), trainIds(1))
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ") // 28 shingles ≥ 20
    val docs = Seq(
      (testId, shared),                    // held-out doc
      (leakTrain, shared),                 // verbatim copy in train => leak
      (cleanTrain, Seq.fill(8)("totally different words here now").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sampling.leakFreeSplit(docs, minShared = 20)
      .as[(Long, String)].collect().toMap
    assert(out(testId) === "test")
    assert(out(leakTrain) === "dropped")
    assert(out(cleanTrain) === "train")
  }

  test("pmiCollocations: raw text never shuffles (only count exchanges)") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val plan = TextAnalysis.pmiCollocations(docs).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"))
  }
}
