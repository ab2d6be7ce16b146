package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.warehouse.AtomicPointer

/** Versioned ADDITIVE count store — persisted keyed counts whose merge
  * operation is SUM, so appends are associative and an incremental build
  * equals a from-scratch one exactly (long arithmetic; spec-pinned by the
  * x27 def's unchanged x25 oracle). The statistics backbone for models
  * that are themselves counts: DSIR bucket histograms, unigram/bigram LM
  * frequencies, per-source token budgets.
  *
  * Same durability protocol as the dedup corpus index (Dedup.scala): each
  * batch stages under a dot-prefixed dir (invisible to vacuum and listing
  * tools), renames into `v<N>`, then the CURRENT pointer — a newline list
  * of committed versions — swaps atomically. A crash mid-append leaves the
  * prior pointer live; the replayed append clobbers the orphan.
  *
  * Layout convention: every column but the LAST is a key; the last column
  * is the long count. [[read]] returns the summed view across committed
  * versions — at 100 TB each version is key-cardinality-sized (bucket
  * histograms: ≤ |buckets| rows), so the sum is a metadata-scale rollup,
  * and [[compact]] folds the version list back to one when it grows.
  */
object CountStore {

  private def committedVersions(path: String): Seq[String] =
    VersionedStore.committedVersions(path)

  private def requireCountSchema(counts: DataFrame): Unit = {
    require(counts.columns.length >= 2,
      "CountStore needs at least one key column plus the trailing count column")
    require(counts.schema.fields.last.dataType == LongType,
      s"CountStore's last column must be the long count, got " +
        counts.schema.fields.last.dataType.catalogString)
  }

  private def commit(counts: DataFrame, path: String, replace: Boolean,
                     tag: Option[String] = None): Unit = {
    requireCountSchema(counts)
    // the tag rides INSIDE the staged dir, so it becomes visible atomically
    // with the version itself (exactly-once bookkeeping for replayed
    // streaming appends — see hasTag)
    VersionedStore.commit(counts, path, replace, tag, dataDir = "counts")
  }

  /** Publish `counts` as the store's sole version (bootstrap / rebuild). */
  def write(counts: DataFrame, path: String): Unit =
    commit(counts, path, replace = true)

  /** Append a batch's counts as a new version — NOTHING existing is read
    * or rewritten; the merge is deferred to [[read]]'s sum. An optional
    * `tag` (e.g. a streaming batch id) is committed atomically with the
    * version; [[hasTag]] then makes a replayed append detectable, which is
    * what turns at-least-once delivery into exactly-once counting — a
    * double-appended histogram would silently DOUBLE-COUNT, the failure
    * mode no read-side dedup can repair for additive state.
    */
  def append(counts: DataFrame, path: String, tag: Option[String] = None): Unit =
    commit(counts, path, replace = false, tag)

  /** Whether any COMMITTED version carries `tag`. A crash between
    * publishDir and the pointer swap leaves an uncommitted orphan whose
    * tag is invisible here — and the replayed append re-stages the SAME
    * version number, clobbering the orphan, so the count is never doubled
    * either way.
    */
  def hasTag(path: String, tag: String): Boolean =
    VersionedStore.hasTag(path, tag)

  /** The summed view across all committed versions. */
  def read(spark: SparkSession, path: String): DataFrame = {
    require(committedVersions(path).nonEmpty,
      s"CountStore.read: no committed versions under $path")
    val u = VersionedStore.readUnion(spark, path, dataDir = "counts")
    val cnt = u.columns.last
    u.groupBy(u.columns.dropRight(1).map(col): _*).agg(sum(col(cnt)).as(cnt))
  }

  /** Fold the committed versions into one (bounds [[read]]'s union width);
    * old version dirs stay until [[vacuum]].
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val folded = read(spark, path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try { folded.count(); commit(folded, path, replace = true) }
    finally { folded.unpersist(); () }
  }

  /** Delete version dirs the pointer no longer references — the dedup
    * index's vacuum guards: never above the max committed number (a serial
    * writer's in-flight commit occupies exactly max+1), pointer re-read
    * before each delete. Returns the number of directories removed.
    */
  def vacuum(path: String): Int = VersionedStore.vacuum(path)
}
