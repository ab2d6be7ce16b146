package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the round-6 operators: the persisted cross-corpus
  * dedup index (build once, join batches against the store, append
  * survivors) and the eager leak-free crossNearDupPairs convenience form.
  * (Cross-engine exactness of the indexed path is the d09 DuckDB oracle —
  * same SQL as d08, so the store must change nothing about the answer.)
  */
class Round6OpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def tmpIndex(): String =
    java.nio.file.Files.createTempDirectory("graft-idx-spec").toString

  test("indexed cross-dedup returns exactly the recompute-everything pairs") {
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("new_id", "corpus_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val direct = {
      val (p, release) = Dedup.crossNearDupPairsWithCleanup(batch, corpus, 0.8)
      try collectPairs(p.localCheckpoint(true)) finally release()
    }
    val idx = tmpIndex()
    Dedup.writeCorpusIndex(corpus, idx)
    val indexed = {
      val (p, release) = Dedup.crossNearDupPairsAgainstIndexWithCleanup(batch, idx, 0.8)
      try collectPairs(p.localCheckpoint(true)) finally release()
    }
    assert(direct.nonEmpty, "testdata should contain cross-side near-dups")
    assert(indexed == direct,
      s"index missed ${direct -- indexed}, invented ${indexed -- direct}")
  }

  test("the indexed plan's corpus side reads the store, not the documents table") {
    val idx = tmpIndex()
    Dedup.writeCorpusIndex(docs.filter(col("doc_id") % 3 =!= 0), idx)
    val (pairs, release) = Dedup.crossNearDupPairsAgainstIndexWithCleanup(
      docs.filter(col("doc_id") % 3 === 0), idx, 0.8)
    try {
      val scans = pairs.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.mkString(",")
      }
      assert(scans.exists(_.contains(idx)),
        s"no scan reads the persisted index; scans: $scans")
      // the corpus text column is paid ONCE at index-build time; the
      // per-batch query shingles only the batch side
      val corpusTextScans = scans.filter(p =>
        p.contains("documents.parquet") && !p.contains(idx))
      assert(corpusTextScans.size <= 2, // batch side: bucket stage + verify stage
        s"too many documents scans for an indexed query: $scans")
    } finally release()
  }

  test("append extends the index: second batch near-dups against appended survivors") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batch1 = Seq(
      (10L, "one two three four five six seven eight nine ten"), // novel → survives
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")) // dup of 1
      .toDF("doc_id", "text")
    val batch2 = Seq(
      (20L, "one two three four five six seven eight nine eleven"), // dup of 10 (appended)
      (21L, "completely different words about spark partitioning and shuffles"))
      .toDF("doc_id", "text")

    val idx = tmpIndex()
    Dedup.writeCorpusIndex(corpus, idx)
    val survivors1 = Dedup.dedupAgainstIndex(batch1, idx, threshold = 0.5)
    assert(survivors1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(10L))
    Dedup.appendToCorpusIndex(survivors1, idx)
    val survivors2 = Dedup.dedupAgainstIndex(batch2, idx, threshold = 0.5)
    // 20 matches the APPENDED doc 10, not the original corpus — proves the
    // append extended the join side; 21 is novel
    assert(survivors2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(21L))
  }

  // ------------------------------------------------------ IVF-int8 index

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("persisted IVF-int8 index: planted twins recovered at rank 1 from the store") {
    val twins = embs.filter(col("vec_id") % 50 === 0).select(
      (col("vec_id") + 10000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * lit(1.05f)).otherwise(x)).as("embedding"),
      col("label"))
    val corpus = embs.unionByName(twins)
    val idx = tmpIndex()
    Similarity.writeIvfIndex(corpus, idx)
    val queries = corpus.filter(col("vec_id") % 50 === 0 && col("vec_id") < 10000000L)
    val top1 = Similarity.ivfTopKQuantizedFromIndex(queries, idx, 10,
      nProbe = Similarity.IvfProbesRegistered)
      .filter(col("rank") === 1).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.nonEmpty)
    val hits = top1.count { case (q, n) => n == q + 10000000L }
    assert(hits >= (top1.length * 0.8).toInt,
      s"only $hits/${top1.length} planted twins found at rank 1 through the index")
  }

  test("IVF index is reusable and appendable: second batch queries the extended store") {
    val half1 = embs.filter(col("vec_id") % 2 === 0)
    val half2 = embs.filter(col("vec_id") % 2 =!= 0)
    val idx = tmpIndex()
    Similarity.writeIvfIndex(half1, idx)
    Similarity.appendToIvfIndex(half2, idx)
    val full = spark.read.parquet(s"$idx/vectors")
    assert(full.count() == embs.count(), "append must extend the vector store")
    assert(full.select("vec_id").distinct().count() == embs.count())
    // queries against the appended store can return odd-id neighbors
    val res = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(col("vec_id") % 100 === 0), idx, 10,
      nProbe = Similarity.IvfProbesRegistered)
    assert(res.filter(col("neighbor_id") % 2 =!= 0).count() > 0,
      "appended vectors must be searchable")
    // centroid geometry is FIXED across the append (same stored centroids)
    assert(spark.read.parquet(s"$idx/centroids").count() <= Similarity.IvfCells)
  }

  test("querying the IVF index never reads the corpus float embeddings") {
    val idx = tmpIndex()
    Similarity.writeIvfIndex(embs, idx)
    val plan = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(col("vec_id") % 100 === 0), idx, 10).queryExecution.sparkPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.relation.location.rootPaths.mkString(","), s.requiredSchema.fieldNames.toSet)
    }
    // embeddings.parquet appears only for the QUERY side; the corpus side
    // is the store's int8 codes
    assert(scans.exists(_._1.contains(s"$idx/vectors")), s"no store scan in: $scans")
    val corpusFloatScans = scans.filter { case (p, fields) =>
      p.contains("embeddings.parquet") }
    assert(corpusFloatScans.size <= 1, // the broadcast query side only
      s"query path re-reads corpus floats: $scans")
  }

  test("IVF vectors table is cell-partitioned and a probe prunes to the probed cells (VERDICT r6 #2)") {
    val idx = tmpIndex()
    Similarity.writeIvfIndex(embs, idx)
    // on-disk layout: one directory per cell
    val cellDirs = new java.io.File(s"$idx/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_"))
    assert(cellDirs.nonEmpty && cellDirs.forall(_.startsWith("cell=")),
      s"vectors not partitioned by cell: ${cellDirs.mkString(",")}")
    // single query, default 4 probes → the scan must plan a partition
    // filter and select at most 4 of the cell directories
    val firstId = embs.agg(min("vec_id")).collect()(0).getLong(0)
    val q = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(col("vec_id") === firstId), idx, 10)
    val scans = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.mkString(",").contains(s"$idx/vectors") => s
    }
    assert(scans.nonEmpty, "no scan over the persisted vectors table")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"vectors scan has no PartitionFilters:\n${q.queryExecution.sparkPlan}")
    // the pruning predicate is a LITERAL in-list over the probed cells —
    // its size bounds the partitions read to ≤ nProbe of the cell dirs
    val inSizes = scan.partitionFilters.flatMap(_.collect {
      case org.apache.spark.sql.catalyst.expressions.In(_, list) => list.length
      case s: org.apache.spark.sql.catalyst.expressions.InSet => s.hset.size
    })
    assert(inSizes.nonEmpty && inSizes.max <= Similarity.IvfProbes,
      s"probe predicate selects ${inSizes.mkString(",")} of ${cellDirs.length} " +
        s"cell partitions (expected ≤ ${Similarity.IvfProbes}): ${scan.partitionFilters}")
    assert(q.filter(col("rank") === 1).count() > 0, "pruned probe still returns neighbors")
  }

  test("eager crossNearDupPairs releases its caches (ADVICE r5 leak)") {
    def persisted = spark.sparkContext.getPersistentRDDs.keySet
    val before = persisted
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val fresh = Seq((2L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text")
    val pairs = Dedup.crossNearDupPairs(fresh, corpus, threshold = 0.5)
    assert(pairs.count() == 1)
    assert((persisted -- before).size <= 1, // the localCheckpoint result itself
      "crossNearDupPairs leaked pipeline caches")
  }
}
