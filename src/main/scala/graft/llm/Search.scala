package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index (term → postings) + conjunctive keyword
  * serve — the search-engine-shaped secondary index the store family was
  * missing (dedup shingle index, IVF/PQ vector indexes, count/sketch stores,
  * and now text postings).
  *
  * Mirrors the reference's ad-hoc `LIKE`-over-rows text filtering intent
  * (reference queries scan the fact table for string matches) re-expressed
  * as the structure a 100 TB corpus needs: tokenize ONCE at build time into
  * (term, doc_id, tf) postings, lay the postings out by a deterministic
  * term bucket, and serve keyword queries by reading ONLY the buckets the
  * query terms hash to.
  *
  * Scale shape:
  *   - build: one narrow explode over the corpus followed by a map-side-
  *     combined groupBy(term, doc_id) — the exchange carries postings
  *     (two longs + a term), never document text;
  *   - layout: `partitionBy(bucket)` directories, bucket = md5(term) mod B,
  *     so the term space spreads uniformly whatever its skew (a hot term
  *     concentrates its OWN postings run, not a directory hot-spot);
  *   - serve: the query's terms hash DRIVER-SIDE (same md5, no Spark job)
  *     to a bucket list → partition pruning reads |query buckets|/B of the
  *     index; the `term IN (...)` equality then pushes into parquet
  *     row-group stats. The doc_id groupBy that intersects the posting
  *     lists exchanges only rows for the queried terms.
  *
  * Conjunctive (AND) semantics with exact integer tf ranking; postings are
  * unique on (term, doc_id) so `count(*)` per doc counts DISTINCT matched
  * query terms. Relevance-weighted variants belong to the BM25 tier
  * (TextAnalysis.bm25Scores, x26) — this operator is the retrieval
  * structure, not the scorer.
  */
object Search {

  val DefaultBuckets = 64

  private val BucketSalt = ":tidx"

  /** Executor-side term bucket: first four hex chars of md5(term+salt),
    * mod `buckets`. The driver twin is [[termBucketLocal]] — both sides
    * MUST agree or pruning silently drops matches, so the agreement is
    * spec-pinned (SearchSpec).
    */
  def termBucket(term: Column, buckets: Int): Column =
    pmod(conv(substring(md5(concat(term, lit(BucketSalt)).cast("binary")), 1, 4), 16, 10)
      .cast("int"), lit(buckets))

  /** Driver-side twin of [[termBucket]] (plain JVM md5 — no Spark job to
    * plan a query's bucket list).
    */
  def termBucketLocal(term: String, buckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((term + BucketSalt).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex4 = f"${(d(0) & 0xff)}%02x${(d(1) & 0xff)}%02x"
    Integer.parseInt(hex4, 16) % buckets
  }

  /** Postings rows (term, doc_id, tf) from whitespace-tokenized lowercased
    * text. Empty terms (leading/trailing whitespace artifacts) are dropped.
    */
  def postings(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents
      .select(col("doc_id"), explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Build and persist the index at `path`: postings partitioned by term
    * bucket. The pre-write `repartition(bucket)` makes each task own whole
    * buckets, so the layout lands as one file per bucket directory instead
    * of |tasks|×|buckets| fragments. The bucket count is persisted beside
    * the data (BUCKETS) — the serve path verifies against it, because a
    * mismatched count would not error, it would silently prune MATCHING
    * buckets away.
    */
  def writeIndex(documents: DataFrame, path: String,
                 buckets: Int = DefaultBuckets, textCol: String = "text"): Unit = {
    postings(documents, textCol)
      .withColumn("bucket", termBucket(col("term"), buckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    graft.warehouse.AtomicPointer.write(s"$path/$BucketsFile", buckets.toString)
  }

  // underscore prefix: Spark's file index skips _-prefixed names, so the
  // sidecar can live inside the flat index's parquet directory
  private val BucketsFile = "_BUCKETS"

  /** Fail fast when the caller's bucket count disagrees with the one the
    * index was BUILT with (stored in BUCKETS): the wrong count doesn't
    * error downstream — it prunes matching buckets away silently. Legacy
    * indexes without the file pass through on the caller's word.
    */
  private def checkBuckets(path: String, buckets: Int): Unit =
    graft.warehouse.AtomicPointer.read(s"$path/$BucketsFile").map(_.trim.toInt)
      .foreach(stored => require(stored == buckets,
        s"index at $path was built with $stored buckets, queried with $buckets " +
          "— pruning would silently drop matches"))

  /** Conjunctive keyword serve: documents containing EVERY query term, with
    * the exact total term frequency as the ranking signal. Reads only the
    * buckets the query terms hash to (partition pruning — plan-pinned in
    * SearchSpec) and pushes the term equalities into the parquet scan.
    */
  def searchAll(spark: SparkSession, path: String, terms: Seq[String],
                buckets: Int = DefaultBuckets): DataFrame = {
    require(terms.nonEmpty, "searchAll: empty query")
    checkBuckets(path, buckets)
    val lowered = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val bks = lowered.map(termBucketLocal(_, buckets)).distinct
    spark.read.parquet(path)
      .filter(col("bucket").isin(bks.map(Integer.valueOf): _*))
      .filter(col("term").isin(lowered: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("total_tf"))
      .filter(col("n_terms") === lowered.size)
      .select(col("doc_id"), col("total_tf"))
  }

  /** The serve result computed directly from the corpus (no index) — the
    * definition `searchAll` must match; shared by the spec and the oracle
    * formulation.
    */
  def searchAllDirect(documents: DataFrame, terms: Seq[String],
                      textCol: String = "text"): DataFrame = {
    val lowered = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    postings(documents, textCol)
      .filter(col("term").isin(lowered: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("total_tf"))
      .filter(col("n_terms") === lowered.size)
      .select(col("doc_id"), col("total_tf"))
  }

  // ------------------------------------------------- versioned incremental

  private val Pointer = "CURRENT"

  private def committedVersions(path: String): Seq[String] =
    graft.warehouse.AtomicPointer.read(s"$path/$Pointer")
      .map(_.split("\n").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  /** Stage postings for one batch as the next version (bucket-partitioned
    * under the version's `postings/` dir, so the serve path's pruning
    * survives versioning), publish the dir, swap the CURRENT pointer — the
    * store family's crash-safe protocol (a crash mid-append leaves the
    * prior pointer live; the replay clobbers the orphan staging dir). An
    * optional `tag` commits atomically WITH the version — the exactly-once
    * bookkeeping the streaming maintainer needs, since additive tf state
    * cannot be de-duplicated downstream.
    */
  private def commitVersion(documents: DataFrame, path: String,
                            replace: Boolean, buckets: Int,
                            textCol: String, tag: Option[String]): Unit = {
    val committed = committedVersions(path)
    val next = "v" + (committed.filter(_.matches("v\\d+"))
      .lastOption.map(_.drop(1).toLong).getOrElse(0L) + 1)
    val staging = s"$path/.staging-$next"
    postings(documents, textCol)
      .withColumn("bucket", termBucket(col("term"), buckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$staging/postings")
    tag.foreach(t => graft.warehouse.AtomicPointer.write(s"$staging/TAG", t))
    graft.warehouse.AtomicPointer.publishDir(staging, s"$path/$next")
    checkBuckets(path, buckets)
    graft.warehouse.AtomicPointer.write(s"$path/$BucketsFile", buckets.toString)
    graft.warehouse.AtomicPointer.write(s"$path/$Pointer",
      ((if (replace) Seq.empty else committed) :+ next).mkString("", "\n", "\n"))
  }

  /** Bootstrap the versioned index: commit `documents`' postings as the
    * sole version.
    */
  def initIndex(documents: DataFrame, path: String,
                buckets: Int = DefaultBuckets, textCol: String = "text",
                tag: Option[String] = None): Unit =
    commitVersion(documents, path, replace = true, buckets, textCol, tag)

  /** Append one batch's postings as a new version WITHOUT reading existing
    * state (the CountStore contract: the merge is the read side's SUM, so
    * appends stay O(batch) however large the index has grown). tf merges
    * additively — a document whose text arrives split across batches sums
    * to the same postings as a one-shot build (spec-pinned).
    */
  def appendToIndex(documents: DataFrame, path: String,
                    buckets: Int = DefaultBuckets, textCol: String = "text",
                    tag: Option[String] = None): Unit =
    commitVersion(documents, path, replace = false, buckets, textCol, tag)

  /** Whether any COMMITTED version carries `tag` — the streaming
    * maintainer's crash-window probe (see CountStore.hasTag for the
    * argument; committed-only is what makes it safe: an orphaned staging
    * dir's tag is invisible, exactly as its rows are).
    */
  def hasTag(path: String, tag: String): Boolean =
    committedVersions(path).exists(v =>
      graft.warehouse.AtomicPointer.read(s"$path/$v/TAG").map(_.trim).contains(tag))

  /** [[searchAll]] against the VERSIONED index: every committed version is
    * read through the same bucket-pruned, term-pushed scan, postings merge
    * by additive tf on (term, doc_id), then the conjunctive intersection.
    * The merge exchange carries only the queried terms' postings — version
    * count never touches the corpus-sized build cost.
    */
  def searchAllIndexed(spark: SparkSession, path: String, terms: Seq[String],
                       buckets: Int = DefaultBuckets): DataFrame = {
    val vs = committedVersions(path)
    require(vs.nonEmpty, s"searchAllIndexed: no committed versions under $path")
    checkBuckets(path, buckets)
    val lowered = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    require(lowered.nonEmpty, "searchAllIndexed: empty query")
    val bks = lowered.map(termBucketLocal(_, buckets)).distinct
    val merged = vs.map { v =>
      spark.read.parquet(s"$path/$v/postings")
        .filter(col("bucket").isin(bks.map(Integer.valueOf): _*))
        .filter(col("term").isin(lowered: _*))
        .select("term", "doc_id", "tf")
    }.reduce(_.unionByName(_))
      .groupBy("term", "doc_id").agg(sum("tf").as("tf"))
    merged
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("total_tf"))
      .filter(col("n_terms") === lowered.size)
      .select(col("doc_id"), col("total_tf"))
  }
}
