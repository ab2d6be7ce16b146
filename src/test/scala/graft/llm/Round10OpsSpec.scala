package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 operators: SemDeDup-style semantic dedup (d12) and per-source
  * token-cap downsampling (p03).
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- semanticDedup

  /** Three planted groups in one block plus cross-block twins:
    *   block 0: {1, 2} identical direction, {3} orthogonal
    *   block 1: {10, 11, 12} a chained near-dup cluster, {13} orthogonal
    *   blocks 2/3: {20} and {21} identical vectors but DIFFERENT blocks —
    *     must NOT merge (blocking is the contract, not a bug)
    */
  private def fixture = Seq(
    (1L, Array(1f, 0f, 0f, 0f), 0),
    (2L, Array(2f, 0f, 0f, 0f), 0),
    (3L, Array(0f, 1f, 0f, 0f), 0),
    (10L, Array(1f, 1f, 0f, 0f), 1),
    (11L, Array(1f, 0.9f, 0f, 0f), 1),
    (12L, Array(1f, 0.8f, 0f, 0f), 1),
    (13L, Array(0f, 0f, 1f, 0f), 1),
    (20L, Array(0f, 0f, 0f, 1f), 2),
    (21L, Array(0f, 0f, 0f, 1f), 3)
  ).toDF("vec_id", "embedding", "label")

  test("semanticDedup keeps one representative per cosine group, singletons survive") {
    val out = Similarity.semanticDedup(fixture, threshold = 0.95)
      .orderBy("vec_id")
      .as[(Long, Long, Long)].collect()
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 20L, 21L),
      "one row per corpus vector")
    assert(byId(1L) == ((1L, 1L)) && byId(2L) == ((1L, 0L)),
      "identical-direction pair collapses to min id")
    assert(byId(3L) == ((3L, 1L)), "orthogonal singleton keeps itself")
    // chained cluster: 10~11, 11~12 (10~12 may or may not cross the
    // threshold; connectivity must still give all three the same rep)
    assert(byId(10L) == ((10L, 1L)) && byId(11L)._1 == 10L && byId(12L)._1 == 10L,
      "chained near-dups share one representative")
    assert(byId(11L)._2 == 0L && byId(12L)._2 == 0L, "non-reps pruned")
    assert(byId(20L) == ((20L, 1L)) && byId(21L) == ((21L, 1L)),
      "identical vectors in different blocks never merge")
  }

  test("semanticDedup kept set = corpus minus (cluster size - 1) per cluster") {
    val out = Similarity.semanticDedup(fixture, threshold = 0.95)
    assert(out.count() == 9)
    assert(out.filter(col("kept") === 1L).count() == 6) // 9 - 1 (block0 pair) - 2 (block1 triple)
    // every rep_id is itself kept (representatives are real corpus rows)
    val reps = out.select(col("rep_id").as("vec_id")).distinct()
    val keptIds = out.filter(col("kept") === 1L).select("vec_id")
    assert(reps.except(keptIds).isEmpty)
  }

  test("semanticDedup is partition-layout independent") {
    val base = Similarity.semanticDedup(fixture, threshold = 0.95).orderBy("vec_id").collect()
    val shuffled = Similarity.semanticDedup(fixture.repartition(7), threshold = 0.95)
      .orderBy("vec_id").collect()
    assert(base.toSeq == shuffled.toSeq)
  }

  // -------------------------------------------------------- sourceCapSample

  private def docs = Seq(
    // source "big": 6 docs × 4 tokens = 24 tokens (over a cap of 12 → rate 1/2)
    (1L, "big", "a b c d"), (2L, "big", "a b c d"), (3L, "big", "a b c d"),
    (4L, "big", "a b c d"), (5L, "big", "a b c d"), (6L, "big", "a b c d"),
    // source "small": 2 docs × 4 tokens = 8 tokens (under cap → keep all)
    (7L, "small", "a b c d"), (8L, "small", "a b c d")
  ).toDF("doc_id", "source", "text")

  test("sourceCapSample keeps under-cap sources whole and thins over-cap sources") {
    val out = Sampling.sourceCapSample(docs, capTokens = 12L)
    val kept = out.select("doc_id", "source", "thresh").as[(Long, String, String)]
      .collect().toSeq
    assert(kept.filter(_._2 == "small").map(_._1).sorted == Seq(7L, 8L),
      "under-cap source passes whole")
    assert(kept.filter(_._2 == "small").forall(_._3 == "g000"))
    // over-cap source: threshold is exactly 12*65536 div 24 = 0x8000
    assert(kept.filter(_._2 == "big").forall(_._3 == "8000"))
    val bigKept = kept.count(_._2 == "big")
    assert(bigKept > 0 && bigKept < 6, "over-cap source thinned, not emptied")
    // the decision is the documented hash-bucket predicate — recompute it
    val expected = (1L to 6L).filter { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:mix".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      h < "8000"
    }
    assert(kept.filter(_._2 == "big").map(_._1).sorted == expected)
  }

  test("sourceCapSample is deterministic across partitionings") {
    val a = Sampling.sourceCapSample(docs, capTokens = 12L).orderBy("doc_id").collect()
    val b = Sampling.sourceCapSample(docs.repartition(5), capTokens = 12L)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("sourceCapSample rejects a non-positive cap") {
    intercept[IllegalArgumentException] {
      Sampling.sourceCapSample(docs, capTokens = 0L)
    }
  }

  // -------------------------------------------------------- retentionCohorts

  test("retentionCohorts counts distinct users per (cohort day, offset)") {
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // u1 first on d1, active d1+d2+d3; u2 first on d1, active d1 only
    // (twice — distinct must collapse); u3 first on d2, active d2+d9
    // (offset 7 kept, boundary) and d10 (offset 8 dropped)
    val ev = Seq(
      (1L, ts(1, 9)), (1L, ts(2, 9)), (1L, ts(3, 9)),
      (2L, ts(1, 10)), (2L, ts(1, 23)),
      (3L, ts(2, 5)), (3L, ts(9, 5)), (3L, ts(10, 5))
    ).toDF("user_id", "ts")
    val out = Events.retentionCohorts(ev, maxOffsetDays = 7)
      .orderBy("cohort_day", "offset_days")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L), // u1+u2 on their first day
      ("2024-01-01", 1, 1L), // u1 back next day
      ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L), // u3 cohort
      ("2024-01-02", 7, 1L)  // u3 on the boundary offset — kept
    ))
  }

  // ----------------------------------------------------------------- pqTopK

  private val TwinOffset = 1000000L

  /** Deterministic 200-vector corpus + a cos≈0.999 twin for every query
    * (the Recall.planted recipe): the re-ranked PQ search must put each
    * query's twin back at rank 1.
    */
  private def pqCorpus = {
    val dim = Similarity.Dim
    val base = (0L until 200L).map { id =>
      (id, Array.tabulate(dim)(d =>
        (graft.functions.LshFns.planeComponent(id.toInt * 53 + 29, d) * 2.0).toFloat))
    }
    val twins = base.filter(_._1 % 50 == 0).map { case (id, emb) =>
      (id + TwinOffset, emb.updated(0, emb(0) * 1.05f))
    }
    (base ++ twins).toDF("vec_id", "embedding")
  }

  test("pqTopKReranked recovers planted twins at rank 1") {
    val corpus = pqCorpus
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val top1 = Similarity.pqTopKReranked(corpus, pred, k = 10)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length == 4)
    assert(top1.forall { case (q, n) => n == q + TwinOffset },
      s"every twin at rank 1, got ${top1.toSeq}")
  }

  test("pqTopK is deterministic across partitionings and returns k rows per query") {
    val corpus = pqCorpus
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val a = Similarity.pqTopK(corpus, pred, k = 5)
      .orderBy("query_id", "rank").collect()
    val b = Similarity.pqTopK(corpus.repartition(7), pred, k = 5)
      .orderBy("query_id", "rank").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 4 * 5)
  }

  test("pq re-rank never lowers recall vs the raw ADC ranking") {
    val corpus = pqCorpus
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val exact = Similarity.bruteForceTopK(corpus, pred, 10)
    val adc = Similarity.recallAtK(exact, Similarity.pqTopK(corpus, pred, 10))
    val rr = Similarity.recallAtK(exact, Similarity.pqTopKReranked(corpus, pred, 10))
    assert(rr >= adc, s"reranked $rr < adc $adc")
    assert(rr > 0.0, "re-ranked recall must be non-trivial on a 200-vector corpus")
  }

  test("pqCodebooksKMeans trains rectangular codebooks and serves the same machinery") {
    val corpus = pqCorpus
    val m = Similarity.PqSubspaces
    val books = Similarity.pqCodebooksKMeans(corpus, m, kCent = 8, maxIter = 5)
    assert(books.length == m)
    assert(books.forall(_.length == 8))
    assert(books.forall(_.forall(_.length == Similarity.Dim / m)))
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val top1 = Similarity.pqTopKRerankedWith(corpus, books, pred, k = 10)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length == 4)
    assert(top1.forall { case (q, n) => n == q + TwinOffset },
      "trained codebooks + re-rank still recover every planted twin at rank 1")
  }

  test("pqCodebooks reject a dimension not divisible into subspaces") {
    val bad = Seq((1L, Seq.fill(10)(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(bad, m = 3)
    }
  }

  // ---------------------------------------------------------------- ivfPq

  test("ivfPqTopK recovers planted twins at rank 1 and is deterministic") {
    val corpus = pqCorpus
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    // a twin quantizes to its query's cell (near-identical vectors), and
    // each query's own cell is always its closest probe — nProbe=8 of the
    // 32-cell default leaves plenty of slack
    val top1 = Similarity.ivfPqTopK(corpus, pred, k = 10, nProbe = 8)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length == 4)
    assert(top1.forall { case (q, n) => n == q + TwinOffset },
      s"every twin at rank 1 through probe+ADC+rerank, got ${top1.toSeq}")
    val a = Similarity.ivfPqTopK(corpus, pred, k = 5, nProbe = 8)
      .orderBy("query_id", "rank").collect()
    val b = Similarity.ivfPqTopK(corpus.repartition(7), pred, k = 5, nProbe = 8)
      .orderBy("query_id", "rank").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("ivfPqTopK probing cuts the scored candidate set below the full-scan PQ path") {
    val corpus = pqCorpus
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val centroids = Similarity.ivfCentroids(corpus)
    val assigned = Similarity.ivfAssign(corpus, centroids).select("vec_id", "cell")
    val probes = Similarity.ivfProbes(corpus, centroids, pred, nProbe = 4)
      .select("query_id", "cell")
    val nCand = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id")).count()
    val n = corpus.count()
    val nQ = corpus.filter(pred).count()
    assert(nCand < nQ * (n - 1), "probed candidates must be a strict subset")
    assert(nCand > 0)
  }

  test("persisted IVF-PQ index serves byte-identically to the in-memory pipeline") {
    val corpus = pqCorpus
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-spec")
    try {
      Similarity.writeIvfPqIndex(corpus, idxDir.toString)
      val handle = new Similarity.IvfPqIndexHandle(spark, idxDir.toString)
      // codebooks round-trip exactly
      assert(handle.books == Similarity.pqCodebooks(corpus))
      val served = Similarity.ivfPqTopKFromIndex(
        corpus.filter(pred), idxDir.toString, k = 10, nProbe = 8,
        rerankAgainst = Some(corpus))
        .orderBy("query_id", "rank").collect()
      val inMem = Similarity.ivfPqTopKWith(corpus,
        Similarity.ivfCentroids(corpus), Similarity.pqCodebooks(corpus),
        pred, k = 10, nProbe = 8)
        .orderBy("query_id", "rank").collect()
      assert(served.toSeq == inMem.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("IVF-PQ index serving prunes to probed cell directories and reads no floats") {
    val corpus = pqCorpus
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-prune")
    try {
      Similarity.writeIvfPqIndex(corpus, idxDir.toString)
      val handle = new Similarity.IvfPqIndexHandle(spark, idxDir.toString)
      val adcOnly = handle.topK(corpus.filter(pred), k = 10, nProbe = 2)
      val plan = adcOnly.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        s"probed-cell partition pruning missing:\n$plan")
      assert(!plan.contains("embedding"),
        "ADC-only serving must never read the float corpus")
      assert(adcOnly.count() > 0)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("ivfPqTopK leaves no persisted RDDs behind") {
    val corpus = pqCorpus
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Similarity.ivfPqTopK(corpus, pred, k = 5, nProbe = 8).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    val leaked = after -- before
    assert(leaked.isEmpty || leaked.forall { id =>
      // the eager localCheckpoint of the tiny result frame is the one
      // intentional materialization; everything centroid-sized must be gone
      spark.sparkContext.getPersistentRDDs(id).name == null ||
        !spark.sparkContext.getPersistentRDDs(id).toString.contains("c_emb")
    })
  }
}
