package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the approximate operators (no DuckDB twin): LSH recall
  * against exact ground truth, SimHash Hamming-distance separation, and plan
  * shape (no cartesian product in the bucketed paths).
  */
class LlmSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("minhash LSH recovers ALL exact near-dup pairs (recall 1.0 at j≥0.8)") {
    // ground truth by brute-force shingle Jaccard (500 docs → fine in a test)
    val sh = docs.select(col("doc_id"), TextFns.shingles(col("text")).as("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), TextFns.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.nearDupPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh == truth, s"LSH missed ${truth -- lsh}, invented ${lsh -- truth}")
  }

  test("estimated near-dup pairs: identical twins estimate exactly 1.0; error vs exact bounded") {
    import spark.implicits._
    // measured estimate quality on every banded candidate: threshold 0.0
    // keeps all candidates, so we compare est_j against exact Jaccard
    val (est, release) = Dedup.estimatedNearDupPairsWithCleanup(docs, threshold = 0.0)
    val sh = docs.select(col("doc_id"), TextFns.shingles(col("text")).as("sh"))
    val exact = est.select("doc_a", "doc_b", "est_j")
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("est_j"),
        TextFns.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .collect()
    release()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (e, j) = (r.getDouble(2), r.getDouble(3))
      assert(e >= 0.0 && e <= 1.0)
      assert(math.abs(e - j) <= 0.3,
        s"estimate $e too far from exact $j for (${r.getLong(0)}, ${r.getLong(1)})")
      if (j == 1.0) assert(e == 1.0, "identical docs must estimate exactly 1.0")
    }
    val meanErr = exact.map(r => math.abs(r.getDouble(2) - r.getDouble(3))).sum / exact.length
    assert(meanErr <= 0.08, s"mean |est − exact| = $meanErr exceeds the k=64 error budget")
    // every j≥0.8 truth pair survives the 0.8-thresholded ESTIMATE within
    // the estimator's own noise floor at 0.7 (recall knob: lower the serve
    // threshold by the std-err margin when exact verify is skipped)
    val hi = exact.filter(_.getDouble(3) >= 0.8)
    assert(hi.forall(_.getDouble(2) >= 0.7),
      "a true near-dup fell more than the error budget below the threshold")
  }

  test("estimated near-dup pairs are deterministic under repartitioning") {
    val a = Dedup.estimatedNearDupPairs(docs, threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val b = Dedup.estimatedNearDupPairs(docs.repartition(13), threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(a == b)
  }

  test("LSH candidate generation is sub-quadratic (bucketed, not all-pairs)") {
    val n = docs.count()
    val candidates = Dedup.candidatePairs(Dedup.minhashSignature(docs)).count()
    assert(candidates < n * n / 20, s"$candidates candidates for $n docs is near-quadratic")
  }

  test("simhash: near-dup pairs have small Hamming distance, random pairs do not") {
    val near = Dedup.nearDupPairs(docs, 0.8).select("doc_a", "doc_b")
    val sim = Dedup.simhash(docs)
    val withH = near
      .join(sim.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
      .join(sim.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
      .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
    val maxNear = withH.agg(max("d")).collect()(0).getInt(0)
    // random (id, id+7) pairs are unrelated docs → distance well above near-dups
    val rand = sim.select(col("doc_id"), col("simhash").as("ha"))
      .join(sim.select((col("doc_id") - 7).as("doc_id"), col("simhash").as("hb")), Seq("doc_id"))
      .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
    val avgRand = rand.agg(avg("d")).collect()(0).getDouble(0)
    assert(maxNear <= 10, s"near-dup simhash distance $maxNear")
    assert(avgRand > maxNear + 4, s"no separation: near max $maxNear vs random mean $avgRand")
  }

  test("int8-quantized ranking matches the float ranking (recall@10 ≥ 0.95)") {
    // s05's contract: 4× compression must not change who your neighbors
    // are. recall@10 of the quantized brute force vs the exact float one —
    // the number graft.Recall grades per round; asserted as a floor here.
    val pred = col("vec_id") % 100 === 0
    val exact = Similarity.bruteForceTopK(embs, pred, 10)
    val quant = Similarity.bruteForceTopKQuantized(embs, pred, 10)
    val r = Similarity.recallAtK(exact, quant)
    assert(r >= 0.95, s"quantized recall@10 $r < 0.95")
  }

  test("LSH ANN recovers planted near neighbors (cos≈0.999 twins)") {
    // The testdata embeddings have NO true near neighbors (max pairwise cos
    // ≈0.51, i.e. ~60° angles), so recall@10 against "nearest of nothing" is
    // bounded by bucket-collision probability at wide angles — not a useful
    // metric. Plant twins instead: perturbed copies of each query vector at
    // cos≈0.999; sign-LSH must bucket-collide with its twin in ≥1 of the 8
    // tables (miss probability ~2e-8) and rank it #1.
    // exclude the twins themselves from the query set (their ids also
    // satisfy % 50 == 0 by construction)
    val queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 1000000L
    val twins = embs.filter(col("vec_id") % 50 === 0).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * lit(1.05f)).otherwise(x)).as("embedding"),
      col("label"))
    val corpus = embs.unionByName(twins)
    val top1 = Similarity.lshTopK(corpus, queryPred, 10)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = top1.count { case (q, n) => n == q + 1000000L }
    assert(hits >= (top1.size * 0.8).toInt, s"only $hits/${top1.size} planted twins found at rank 1")
  }

  test("IVF ANN recovers planted near neighbors (twin lands in the same cell)") {
    val queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 1000000L
    val twins = embs.filter(col("vec_id") % 50 === 0).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * lit(1.05f)).otherwise(x)).as("embedding"),
      col("label"))
    val corpus = embs.unionByName(twins)
    val top1 = Similarity.ivfTopK(corpus, queryPred, 10)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = top1.count { case (q, n) => n == q + 1000000L }
    assert(hits >= (top1.size * 0.8).toInt, s"only $hits/${top1.size} planted twins found at rank 1")
  }

  test("IVF with the k-means quantizer recovers planted twins too") {
    val queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 1000000L
    val twins = embs.filter(col("vec_id") % 50 === 0).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * lit(1.05f)).otherwise(x)).as("embedding"),
      col("label"))
    val corpus = embs.unionByName(twins)
    val top1 = Similarity.ivfTopKWith(corpus,
      Similarity.ivfCentroidsKMeans(corpus), queryPred, 10)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = top1.count { case (q, n) => n == q + 1000000L }
    assert(hits >= (top1.size * 0.8).toInt, s"only $hits/${top1.size} planted twins at rank 1")
  }

  test("IVF assignment covers every vector with exactly one cell") {
    val assigned = Similarity.ivfAssign(embs)
    assert(assigned.count() == embs.count())
    assert(assigned.select("vec_id").distinct().count() == embs.count())
    val cells = assigned.select("cell").distinct().count()
    assert(cells > 1 && cells <= Similarity.IvfCells)
  }

  test("LSH ANN candidate set is a small fraction of the corpus") {
    val queryPred = col("vec_id") % 50 === 0
    val n = embs.count()
    val nQueries = embs.filter(queryPred).count()
    val cands = Similarity.lshBuckets(embs).filter(queryPred)
      .select(col("table"), col("bucket"), col("vec_id").as("q"))
      .join(Similarity.lshBuckets(embs).select(col("table"), col("bucket"), col("vec_id").as("c")),
        Seq("table", "bucket"))
      .filter(col("q") =!= col("c"))
      .select("q", "c").distinct().count()
    assert(cands < nQueries * n / 2, s"$cands candidates ≈ brute force for $nQueries×$n")
  }

  test("ANN paths leave no persisted intermediates behind (VERDICT r3 #3)") {
    val sc = spark.sparkContext
    def persisted = sc.getPersistentRDDs.keySet
    val queryPred = col("vec_id") % 50 === 0
    // lazy WithCleanup variants: zero residue once the handle is called
    val before1 = persisted
    val (lsh, releaseLsh) = Similarity.lshTopKWithCleanup(embs, queryPred, 10)
    lsh.write.format("noop").mode("overwrite").save()
    releaseLsh()
    assert((persisted -- before1).isEmpty, "lshTopKWithCleanup leaked persisted RDDs")
    val before2 = persisted
    val (ivf, releaseIvf) =
      Similarity.ivfTopKWithCleanup(embs, Similarity.ivfCentroids(embs), queryPred, 10)
    ivf.write.format("noop").mode("overwrite").save()
    releaseIvf()
    assert((persisted -- before2).isEmpty, "ivfTopKWithCleanup leaked persisted RDDs")
    // eager convenience forms: at most the materialized ≤k·|queries|-row
    // result's own checkpoint — the bucket/centroid caches must be gone
    val before3 = persisted
    Similarity.lshTopK(embs, queryPred, 10).count()
    assert((persisted -- before3).size <= 1, "lshTopK left internal caches persisted")
    val before4 = persisted
    Similarity.ivfTopK(embs, queryPred, 10).count()
    assert((persisted -- before4).size <= 1, "ivfTopK left internal caches persisted")
  }

  test("exact dedup representatives cover every document exactly once") {
    val d = Dedup.exact(docs)
    assert(d.agg(sum("n_copies")).collect()(0).getLong(0) == docs.count())
    assert(d.select("fingerprint").distinct().count() == d.count())
  }

  test("sessionization: session boundaries respect the 30-minute gap") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 5L, "view", 1.0, "{}"),
      (2L, "2024-01-01 10:10:00", 5L, "view", 1.0, "{}"),
      (3L, "2024-01-01 11:00:00", 5L, "view", 1.0, "{}"), // 50min gap → new session
      (4L, "2024-01-01 11:20:00", 5L, "view", 1.0, "{}"),
      (5L, "2024-01-01 09:00:00", 6L, "view", 1.0, "{}")) // other user
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val sessions = Events.sessionize(ev).orderBy("user_id", "session_id").collect()
    assert(sessions.length == 3)
    assert(sessions.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((5L, 1L, 2L), (5L, 2L, 2L), (6L, 1L, 1L)))
  }

  test("hourly windows align to epoch hours and cover all events") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:59:59", 5L, "view", 1.5, "{}"),
      (2L, "2024-01-01 11:00:00", 5L, "view", 2.5, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val w = Events.hourlyWindows(ev).orderBy("window_start").collect()
    assert(w.length == 2)
    assert(w.map(_.getAs[java.sql.Timestamp]("window_start").toString).toSeq ==
      Seq("2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0"))
  }
}
