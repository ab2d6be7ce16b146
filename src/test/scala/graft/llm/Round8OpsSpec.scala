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

  test("dedup index: writeCorpusIndex replaces — readers see only the latest corpus") {
    val idx = java.nio.file.Files.createTempDirectory("graft-idx-replace").toString
    Dedup.writeCorpusIndex(docs.filter(col("doc_id") % 3 === 0), idx)
    val second = docs.filter(col("doc_id") % 3 === 1)
    Dedup.writeCorpusIndex(second, idx)
    assert(ids(Dedup.indexShingles(spark, idx)) == ids(second),
      "replace must supersede the previous index version")
  }
}
