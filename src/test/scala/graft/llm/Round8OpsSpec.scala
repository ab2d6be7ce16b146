package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the round-8 scale work: the dedup index's atomic
  * versioned commit (VERDICT r7 #3) — both tables of a batch become visible
  * together, a half-written version never surfaces, and a replayed crashed
  * append clobbers the orphan instead of leaking it.
  */
class Round8OpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").distinct().as[Long].collect().toSet

  test("dedup index: a crash between staging and the pointer swap leaves readers on the old index") {
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 1)
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-atomic").toString
    Dedup.writeCorpusIndex(corpus, idx)
    val committedIds = ids(Dedup.indexShingles(spark, idx))
    val dedupBefore = ids(Dedup.dedupAgainstIndex(batch, idx, threshold = 0.5))

    // fault injection: a crashed append staged its version dirs (with
    // GARBAGE contents, to prove they can never surface) but died before
    // the pointer swap
    val junk = Seq((999999L, Seq("CORRUPT", "GARBAGE"))).toDF("doc_id", "sh")
    junk.write.parquet(s"$idx/v2/shingles")
    Seq((999999L, 0, 0L)).toDF("doc_id", "band", "band_hash")
      .write.parquet(s"$idx/v2/buckets")

    assert(ids(Dedup.indexShingles(spark, idx)) == committedIds,
      "uncommitted version leaked into the shingle reader")
    assert(!ids(Dedup.indexBuckets(spark, idx)).contains(999999L),
      "uncommitted version leaked into the bucket reader")
    assert(ids(Dedup.dedupAgainstIndex(batch, idx, threshold = 0.5)) == dedupBefore,
      "a half-committed batch changed dedup answers")

    // the replayed append derives its version from the POINTER, overwrites
    // the orphan, and commits both tables in one swap
    val survivors = Dedup.dedupAgainstIndex(batch, idx, threshold = 0.5).localCheckpoint(true)
    Dedup.appendToCorpusIndex(survivors, idx)
    val after = ids(Dedup.indexShingles(spark, idx))
    assert(after == committedIds ++ ids(survivors), "replayed append must land exactly once")
    assert(!after.contains(999999L), "orphaned garbage must be clobbered, not committed")
    assert(ids(Dedup.indexBuckets(spark, idx)) == after,
      "buckets and shingles must commit together")
  }

  // ------------------------------------------ IVF serving handle (r7 #7)

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("IvfIndexHandle: queries plan no centroids scan and leak no persisted RDDs") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-handle").toString
    Similarity.writeIvfIndex(embs, idx)
    val handle = new Similarity.IvfIndexHandle(spark, idx)
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val r1 = handle.topK(queries, 10)
    val r2 = handle.topK(queries, 10)
    assert(fileScanPaths(r1).exists(_.contains("/vectors")), "serving must read the store")
    assert(!fileScanPaths(r1).exists(_.contains("centroids")) &&
      !fileScanPaths(r2).exists(_.contains("centroids")),
      "per-query plans must not re-scan the centroid table (handle localizes it once)")
    val rows1 = r1.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(rows1.nonEmpty)
    // identical to the one-shot form, and serving leaves nothing cached
    val oneShot = Similarity.ivfTopKQuantizedFromIndex(queries, idx, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(rows1 == oneShot)
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore,
      "a served query must not accrue persisted/checkpointed RDDs (ADVICE r7)")
  }

  // ------------------------------------------ multi-probe LSH (r7 #6)

  test("multi-probe: driver-side probe codes replicate lshBuckets bit-exactly, flips are Hamming-1") {
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val nTables = 4; val nBits = 10; val probeBits = 3
    val exactCodes = Similarity.lshBuckets(queries, nTables, nBits)
      .select("vec_id", "table", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val probes = Similarity.queryProbeBuckets(
        queries.select("vec_id", "embedding"), nTables, nBits, probeBits)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(probes.keySet == exactCodes.keySet)
    probes.foreach { case (key, buckets) =>
      val own = exactCodes(key)
      assert(buckets.head == own, s"first probe must be the query's own bucket for $key")
      assert(buckets.size == probeBits + 1 && buckets.distinct.size == buckets.size)
      buckets.tail.foreach { b =>
        assert(Integer.bitCount(b ^ own) == 1, s"flip probe $b not Hamming-1 from $own")
      }
    }
  }

  test("multi-probe candidates strictly extend the exact-probe candidates; recall never drops") {
    val pred = col("vec_id") % 100 === 0
    def pairs(probeBits: Int): Set[(Long, Long)] = {
      val (cands, release) = Similarity.lshCandidatePairs(embs, pred, 8, 10, probeBits)
      try cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet finally release()
    }
    val exactOnly = pairs(0)
    val probed = pairs(10)
    assert(exactOnly.subsetOf(probed), "multi-probe must only ADD candidates")
    assert(probed.size > exactOnly.size, "1-bit-flip probing must widen the candidate set")
    val truth = Similarity.bruteForceTopK(embs, pred, 10)
    val rExact = Similarity.recallAtK(truth, Similarity.lshTopK(embs, pred, 10, 8, 10))
    val rProbe = Similarity.recallAtK(truth, Similarity.lshTopK(embs, pred, 10, 8, 10, 10))
    assert(rProbe >= rExact, s"multi-probe recall $rProbe below exact-probe $rExact")
  }

  // -------------------------------------------- alpha-aware resize (ADVICE r7)

  test("resize preserves the alpha channel of transparent sources") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, (128 << 24) | (100 << 16) | (150 << 8) | 200) // half-transparent
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val asset = Asset(7L, "image/png", out.size(), out.toByteArray)
    val resized = Multimodal.resize(Seq(asset).toDS(), factor = 4).collect().head
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized.payload))
    assert(back.getColorModel.hasAlpha, "alpha channel must survive the resize")
    val p = back.getRGB(2, 2)
    assert(((p >>> 24) & 0xFF) == 128, f"alpha value drifted: 0x$p%08x")
    // color rides through the premultiplied-alpha pipeline: ±1 rounding is
    // inherent (150·128/255 → 75 → ·255/128 → 149); the r7 bug was total
    // alpha LOSS (composite onto opaque black), not off-by-one
    def near(got: Int, want: Int) = math.abs(got - want) <= 1
    assert(near((p >> 16) & 0xFF, 100) && near((p >> 8) & 0xFF, 150) && near(p & 0xFF, 200),
      f"color drifted under alpha: 0x$p%08x")
  }

  test("dedup index compaction folds per-batch versions without changing answers") {
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-compact").toString
    Dedup.writeCorpusIndex(docs.filter(col("doc_id") % 4 === 0), idx)
    Dedup.appendToCorpusIndex(docs.filter(col("doc_id") % 4 === 1), idx)
    Dedup.appendToCorpusIndex(docs.filter(col("doc_id") % 4 === 2), idx)
    val batch = docs.filter(col("doc_id") % 4 === 3)
    val before = ids(Dedup.dedupAgainstIndex(batch, idx, threshold = 0.5))
    val shinglesBefore = ids(Dedup.indexShingles(spark, idx))

    assert(Dedup.compactCorpusIndex(spark, idx) == 3, "three committed versions fold")
    val pointer = java.nio.file.Files.readString(
      java.nio.file.Paths.get(idx, "CURRENT")).trim
    assert(!pointer.contains("\n"), s"folded pointer must list ONE version, got: $pointer")
    assert(ids(Dedup.indexShingles(spark, idx)) == shinglesBefore)
    assert(ids(Dedup.dedupAgainstIndex(batch, idx, threshold = 0.5)) == before,
      "compaction must not change dedup answers")
    assert(Dedup.compactCorpusIndex(spark, idx) == 0, "re-running is a no-op")
    // the folded index stays appendable
    Dedup.appendToCorpusIndex(batch, idx)
    assert(ids(Dedup.indexShingles(spark, idx)) == shinglesBefore ++ ids(batch))
  }

  test("dedup index: writeCorpusIndex replaces — readers see only the latest corpus") {
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-replace").toString
    Dedup.writeCorpusIndex(docs.filter(col("doc_id") % 3 === 0), idx)
    val second = docs.filter(col("doc_id") % 3 === 1)
    Dedup.writeCorpusIndex(second, idx)
    assert(ids(Dedup.indexShingles(spark, idx)) == ids(second),
      "replace must supersede the previous index version")
    // vacuum removes exactly the superseded version and answers survive
    assert(Dedup.vacuumCorpusIndex(idx) == 1, "one unreferenced version dir removed")
    assert(ids(Dedup.indexShingles(spark, idx)) == ids(second))
    assert(Dedup.vacuumCorpusIndex(idx) == 0, "vacuum re-run is a no-op")
  }

  test("appending onto a legacy FLAT index adopts its tables instead of hiding them") {
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-legacy").toString
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    // build the pre-versioning layout by hand: bare buckets/shingles dirs,
    // no CURRENT pointer — what an r7-era writeCorpusIndex left on disk
    val sh = corpus.select(col("doc_id"), TextFns.shingles(col("text"), 3).as("sh"))
    Dedup.bandBuckets(Dedup.signatureFromShingles(sh))
      .select("doc_id", "band", "band_hash").write.parquet(s"$idx/buckets")
    sh.write.parquet(s"$idx/shingles")
    val legacyIds = ids(Dedup.indexShingles(spark, idx))
    assert(legacyIds.nonEmpty, "setup: flat index readable")

    val batch = docs.filter(col("doc_id") % 3 === 1)
    val survivors = Dedup.dedupAgainstIndex(batch, idx, threshold = 0.5).localCheckpoint(true)
    Dedup.appendToCorpusIndex(survivors, idx)
    assert(ids(Dedup.indexShingles(spark, idx)) == legacyIds ++ ids(survivors),
      "the flat corpus must stay visible after the first versioned append")
    // and the adopted index folds like any other
    assert(Dedup.compactCorpusIndex(spark, idx) == 2, "legacy '.' + v1 fold into one")
    assert(ids(Dedup.indexShingles(spark, idx)) == legacyIds ++ ids(survivors))
  }

  test("IVF index built with the k-means quantizer serves identically-shaped queries") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-kmeans").toString
    Similarity.writeIvfIndex(embs, idx, quantizer = Similarity.KMeansQuantizer)
    val stored = spark.read.parquet(s"$idx/centroids")
    assert(stored.count() == Similarity.IvfCells)
    assert(stored.select("cell").distinct().count() == Similarity.IvfCells,
      "k-means cells must be distinct ids")
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val res = Similarity.ivfTopKQuantizedFromIndex(queries, idx, 10,
      Similarity.IvfProbesRegistered)
    val exact = Similarity.bruteForceTopK(embs, col("vec_id") % 100 === 0, 10)
    val recall = Similarity.recallAtK(exact, res)
    assert(recall >= 0.8, s"k-means-quantized index recall collapsed: $recall")
    // every query returns a full top-10
    val counts = res.groupBy("query_id").count().select("count")
      .collect().map(_.getLong(0))
    assert(counts.nonEmpty && counts.forall(_ == 10L))
  }
}
