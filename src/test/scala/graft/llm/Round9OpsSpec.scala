package graft.llm

import graft.SparkSpec
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Behavior tests for the round-9 scale work: IVF vectors-table compaction
  * (VERDICT r8 #1), the cell-occupancy drift report (#4), enforced
  * broadcast-small ANN query contracts (#3), the streaming writer lock
  * (#6), the reliable-checkpoint CC option (#7), and the ADVICE r8 fixes
  * (vacuum rename→swap window, corrupt-mark degradation, within-batch key
  * hygiene).
  */
class Round9OpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def topKRows(idx: String): Seq[(Long, Int, Long)] =
    Similarity.ivfTopKQuantizedFromIndex(
        embs.filter(col("vec_id") % 100 === 0), idx, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  // ------------------------------------------------ IVF compaction (r8 #1)

  test("IVF vectors compaction collapses per-batch small files without changing answers") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-compact").toString
    Similarity.writeIvfIndex(embs.filter(col("vec_id") % 4 === 0), idx)
    (1 to 3).foreach { r =>
      Similarity.appendToIvfIndex(embs.filter(col("vec_id") % 4 === r), idx)
    }
    val before = topKRows(idx)
    val statsBefore = Similarity.ivfIndexStats(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(statsBefore.exists(_._3 >= 4),
      "setup: per-batch appends must fragment cell directories " +
        s"(max files/cell = ${statsBefore.map(_._3).max})")

    val st = Similarity.compactIvfIndex(spark, idx)
    assert(st.partitionsCompacted > 0, "fragmented cells must be folded")
    assert(st.partitionsSkipped.isEmpty, s"skipped: ${st.partitionsSkipped}")
    val statsAfter = Similarity.ivfIndexStats(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(statsAfter.forall(_._3 == 1),
      s"every cell dir must fold to one file at fixture size: $statsAfter")
    assert(statsAfter.map(s => s._1 -> s._2).toMap ==
      statsBefore.map(s => s._1 -> s._2).toMap,
      "compaction must not change per-cell row counts")
    assert(topKRows(idx) == before, "compaction must not change served answers")
    // probe-time partition pruning still holds on the compacted layout
    val served = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(col("vec_id") % 100 === 0), idx, 10)
    assert(fileScanPaths(served).exists(_.contains("/vectors")))
  }

  test("streamed vector ingest with compactEvery folds small files and serves identically") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-vec-ce").toString
    Similarity.writeIvfIndex(embs.filter(col("vec_id") % 4 === 0), s"$root/idx")
    def slice(r: Int) = embs.filter(col("vec_id") % 4 === r)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.ingestVectorsStream(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/idx", s"$root/ckpt",
      compactEvery = 2)
    try {
      (1 to 3).foreach { r => stream.addData(slice(r)); q.processAllAvailable() }
    } finally q.stop()
    // batchId 2 triggered a fold over batches 0-2's appends; batch 3 (one
    // more file set) landed after — so no cell holds the full 4 file sets
    val stats = Similarity.ivfIndexStats(spark, s"$root/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stats.forall(_._3 <= 2),
      s"compactEvery must bound per-cell file growth: $stats")
    assert(stats.map(_._2).sum == embs.count(), "no rows lost in the fold")
    assert(topKRows(s"$root/idx").nonEmpty)
  }

  // ------------------------------------------------ drift report (r8 #4)

  test("ivfIndexStats surfaces cell skew from a drifted append; rebuild re-balances") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-drift").toString
    Similarity.writeIvfIndex(embs, idx, quantizer = Similarity.KMeansQuantizer)
    def skew(): Double = {
      val counts = Similarity.ivfIndexStats(spark, idx)
        .collect().map(_.getLong(1)).filter(_ > 0)
      counts.max.toDouble / (counts.sum.toDouble / counts.length)
    }
    val balanced = skew()
    // drift injection: a stream whose vectors all equal one corpus vector
    // (new ids, same embedding) — every row lands in ONE cell
    val one = embs.orderBy("vec_id").limit(1)
      .select(col("embedding")).crossJoin(spark.range(2000, 2000 + embs.count()))
      .select(col("id").as("vec_id"), col("embedding"))
    Similarity.appendToIvfIndex(one, idx)
    val drifted = skew()
    assert(drifted > 2 * balanced,
      f"the drift report must surface the hot cell (skew $balanced%.2f → $drifted%.2f)")
    // the documented retrain-rebuild path: refit centers on the CURRENT
    // distribution and rewrite — occupancy re-tiles
    val current = embs.select("vec_id", "embedding").unionByName(one)
    Similarity.writeIvfIndex(current, idx, quantizer = Similarity.KMeansQuantizer)
    val rebuilt = skew()
    assert(rebuilt < drifted,
      f"k-means rebuild must re-balance occupancy ($drifted%.2f → $rebuilt%.2f)")
    val stats = Similarity.ivfIndexStats(spark, idx)
    assert(stats.agg(sum("n_vectors")).head.getLong(0) == current.count())
  }

  // ------------------------------------- enforced query contracts (r8 #3)

  test("ANN driver collects fail fast past MaxDriverQueryRows instead of OOMing the driver") {
    val big = spark.range(Similarity.MaxDriverQueryRows + 1)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(Similarity.Dim - 1)),
          i => (i + col("id") % 7 + 1).cast("float")).as("embedding"))
    val eQ = intercept[IllegalArgumentException] {
      Similarity.queryProbeBuckets(big, 2, 8, 1)
    }
    assert(eQ.getMessage.contains("MaxDriverQueryRows"))

    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-cap").toString
    Similarity.writeIvfIndex(embs, idx)
    val handle = new Similarity.IvfIndexHandle(spark, idx)
    // the cap binds the driver-localized PROBE rows (|queries| × nProbe)
    val eH = intercept[IllegalArgumentException] {
      handle.topK(big.limit(Similarity.MaxDriverQueryRows / 4 + 1), 10, nProbe = 4)
    }
    assert(eH.getMessage.contains("MaxDriverQueryRows"))
    // contract-sized queries still serve
    assert(handle.topK(embs.filter(col("vec_id") % 100 === 0), 10).count() > 0)
  }

  // ------------------------------------- vacuum rename→swap gap (ADVICE r8)

  test("vacuum spares a renamed-but-unswapped max+1 version; the next append reclaims it") {
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-vgap").toString
    Dedup.writeCorpusIndex(docs.filter(col("doc_id") % 3 === 0), idx)
    // simulate a concurrent commit caught between its v2 rename and its
    // pointer swap: a fully-written v2 the pointer does not reference yet
    val probe = Seq((424242L, Seq("IN", "FLIGHT"))).toDF("doc_id", "sh")
    probe.write.parquet(s"$idx/v2/shingles")
    Seq((424242L, 0, 0L)).toDF("doc_id", "band", "band_hash")
      .write.parquet(s"$idx/v2/buckets")
    assert(Dedup.vacuumCorpusIndex(idx) == 0,
      "vacuum must never delete a version above the max committed one")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(idx, "v2")),
      "the in-flight version must survive vacuum")
    // a later append targets v2, clobbers the orphan, and commits it
    val batch = docs.filter(col("doc_id") % 3 === 1)
    Dedup.appendToCorpusIndex(batch, idx)
    val after = Dedup.indexShingles(spark, idx).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(!after.contains(424242L), "orphan contents must never surface")
    assert(Dedup.vacuumCorpusIndex(idx) == 0, "both versions committed — nothing to vacuum")
  }

  // ------------------------------------- corrupt mark degradation (ADVICE r8)

  test("a corrupted high-water mark degrades to the Recover posture, not a crash") {
    val root = java.nio.file.Files.createTempDirectory("graft-hwm-corrupt")
    val sink = root.resolve("sink"); val ckpt = root.resolve("ckpt")
    java.nio.file.Files.createDirectories(sink)
    java.nio.file.Files.createDirectories(ckpt)
    java.nio.file.Files.writeString(ckpt.resolve("metadata"), """{"id":"q-abc"}""")
    def freshGuard() = new StreamingOps.ReplayGuard(sink.toString, ckpt.toString)
    // sane mark: batches at or below it Skip
    java.nio.file.Files.writeString(sink.resolve("_streaming_hwm"), "q-abc 7")
    assert(freshGuard().posture(7) == StreamingOps.Skip)
    // matching qid, garbled batch field (hand-edited/corrupted): the old
    // parse threw NumberFormatException inside EVERY micro-batch
    java.nio.file.Files.writeString(sink.resolve("_streaming_hwm"), "q-abc notanumber")
    assert(freshGuard().posture(7) == StreamingOps.Recover,
      "an unreadable mark must fall back to the defensive posture")
    // foreign lineage stays Recover too
    java.nio.file.Files.writeString(sink.resolve("_streaming_hwm"), "other-query 99")
    assert(freshGuard().posture(7) == StreamingOps.Recover)
  }

  // ------------------------------------------------ writer lock (r8 #6)

  test("streaming writer lock: a second checkpoint on one sink fails fast; restarts and stale leases recover") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink-lock")
    val sink = root.resolve("sink").toString
    val a = new StreamingOps.ReplayGuard(sink, root.resolve("ckptA").toString)
    a.acquireLock()
    // a DIFFERENT checkpoint is a second concurrent writer — fail fast
    val b = new StreamingOps.ReplayGuard(sink, root.resolve("ckptB").toString)
    val e = intercept[IllegalStateException](b.acquireLock())
    assert(e.getMessage.contains("locked by checkpoint"))
    // the SAME checkpoint is the same logical writer restarting — allowed
    new StreamingOps.ReplayGuard(sink, root.resolve("ckptA").toString).acquireLock()
    // a dead writer's lease goes stale after the TTL and may be broken
    val bStale = new StreamingOps.ReplayGuard(
      sink, root.resolve("ckptB").toString, lockTtlMs = 0L)
    bStale.acquireLock()
    // ...and now A is the foreigner
    val aBack = new StreamingOps.ReplayGuard(sink, root.resolve("ckptA").toString)
    assert(intercept[IllegalStateException](aBack.acquireLock())
      .getMessage.contains("locked by checkpoint"))
  }

  test("ingestVectorsStream on a locked sink fails fast end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-vec-lock").toString
    Similarity.writeIvfIndex(embs, s"$root/idx")
    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.ingestVectorsStream(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/idx", s"$root/ckptA")
    try {
      val e = intercept[IllegalStateException] {
        StreamingOps.ingestVectorsStream(
          stream.toDF().toDF("vec_id", "embedding"), s"$root/idx", s"$root/ckptB")
      }
      assert(e.getMessage.contains("one writer per sink"))
    } finally q.stop()
  }

  // ------------------------------------- within-batch key hygiene (ADVICE r8)

  test("a Fresh-posture batch violating the unique-key contract lands each key once") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-vec-dupkey").toString
    Similarity.writeIvfIndex(embs.filter(col("vec_id") % 2 === 0), s"$root/idx")
    val rows = embs.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.ingestVectorsStream(
      stream.toDF().toDF("vec_id", "embedding"), s"$root/idx", s"$root/ckpt")
    try {
      stream.addData(rows.take(3)); q.processAllAvailable() // batch 0: Recover
      // batch 1 (Fresh — the no-store-scan fast path) re-sends one key twice
      stream.addData(rows.drop(3) ++ Seq(rows.last)); q.processAllAvailable()
    } finally q.stop()
    val stored = spark.read.parquet(s"$root/idx/vectors")
    assert(stored.count() == stored.select("vec_id").distinct().count(),
      "within-batch duplicate keys must not land twice")
  }

  // ------------------------------------- reliable-checkpoint CC loop (r8 #7)

  test("the CC loop converges identically under reliable checkpointing") {
    val sc = spark.sparkContext
    val prior = sc.getCheckpointDir.orNull
    // pin the DISTRIBUTED loop (the machinery under test) — the adaptive
    // driver fast path would otherwise satisfy this fixture without ever
    // checkpointing
    spark.conf.set("spark.graft.cc.maxDriverEdges", "0")
    try {
      val expected = Dedup.nearDupClusters(docs, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val dir = java.nio.file.Files.createTempDirectory("graft-cc-reliable").toString
      sc.setCheckpointDir(dir)
      try {
        val reliable = Dedup.nearDupClusters(docs, 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(reliable == expected,
          "reliable-checkpoint clusters must equal the localCheckpoint ones")
        assert(new java.io.File(dir).listFiles().nonEmpty,
          "the loop must actually write reliable checkpoints when a dir is set")
      } finally sc.setCheckpointDir(prior)
    } finally spark.conf.unset("spark.graft.cc.maxDriverEdges")
  }

  // ----------------------------------- adaptive driver-side CC fast path

  test("driver union-find clusters are byte-identical to the distributed loop") {
    val fast = Dedup.nearDupClusters(docs, 0.8) // default: fast path engages
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fast.nonEmpty, "fixture must yield near-dup clusters")
    spark.conf.set("spark.graft.cc.maxDriverEdges", "0")
    try {
      val loop = Dedup.nearDupClusters(docs, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fast == loop, "fast path must reproduce the loop's labels exactly")
    } finally spark.conf.unset("spark.graft.cc.maxDriverEdges")
    // an over-ceiling edge set falls through to the loop and still agrees
    spark.conf.set("spark.graft.cc.maxDriverEdges", "1")
    try {
      val fellThrough = Dedup.nearDupClusters(docs, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fellThrough == fast, "over-ceiling fall-through must agree")
    } finally spark.conf.unset("spark.graft.cc.maxDriverEdges")
    // the multi-signal composition routes through the same switch
    val ms = Dedup.multiSignalClusters(docs, embs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set("spark.graft.cc.maxDriverEdges", "0")
    try {
      val msLoop = Dedup.multiSignalClusters(docs, embs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(ms == msLoop, "multi-signal clusters must agree across paths")
    } finally spark.conf.unset("spark.graft.cc.maxDriverEdges")
  }
}
