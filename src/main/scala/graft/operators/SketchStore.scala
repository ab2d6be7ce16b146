package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Versioned MERGEABLE-SKETCH store — the sketch MATERIALIZED VIEW: keyed
  * HLL sketches persisted once, so distinct-count queries (rolling active
  * users, cardinality dashboards) serve from |keys| rows without ever
  * rescanning the event log. The sketch twin of [[CountStore]] (same
  * durability protocol via [[VersionedStore]]): appends stage a new
  * version without reading existing state, and the merge — register-wise
  * max under `hll_union_agg`, associative, commutative, and IDEMPOTENT —
  * is deferred to [[read]]. Idempotence is the property counts don't
  * have: re-unioning the same sketch cannot inflate the estimate, while
  * the exactly-once TAG protocol still prevents the split-day case where
  * a replayed batch's rows were themselves re-sketched.
  *
  * Layout convention: every column but the LAST is a key; the last column
  * is the binary HLL sketch (`hll_sketch_agg` output). At 100 TB each
  * version is key-cardinality-sized (daily user sketches: |days| rows of
  * ≤ 2^lgK bytes), so [[read]]'s union is a metadata-scale rollup.
  */
object SketchStore {

  private def requireSketchSchema(sketches: DataFrame): Unit = {
    require(sketches.columns.length >= 2,
      "SketchStore needs at least one key column plus the trailing sketch column")
    require(sketches.schema.fields.last.dataType == BinaryType,
      s"SketchStore's last column must be the binary HLL sketch, got " +
        sketches.schema.fields.last.dataType.catalogString)
  }

  /** Publish `sketches` as the store's sole version (bootstrap/rebuild). */
  def write(sketches: DataFrame, path: String): Unit = {
    requireSketchSchema(sketches)
    VersionedStore.commit(sketches, path, replace = true, None, dataDir = "sketches")
  }

  /** Append a batch's sketches as a new version — nothing existing is read
    * or rewritten. The optional `tag` commits atomically with the version
    * (see [[CountStore.append]] for the replay argument).
    */
  def append(sketches: DataFrame, path: String, tag: Option[String] = None): Unit = {
    requireSketchSchema(sketches)
    VersionedStore.commit(sketches, path, replace = false, tag, dataDir = "sketches")
  }

  /** Whether any COMMITTED version carries `tag`. */
  def hasTag(path: String, tag: String): Boolean = VersionedStore.hasTag(path, tag)

  /** The union-merged view across all committed versions: one row per key,
    * sketches merged register-wise (identical to having sketched all the
    * underlying items in one pass).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val u = VersionedStore.readUnion(spark, path, dataDir = "sketches")
    val sk = u.columns.last
    u.groupBy(u.columns.dropRight(1).map(col): _*)
      .agg(hll_union_agg(col(sk)).as(sk))
  }

  /** Fold the committed versions into one (bounds [[read]]'s union width). */
  def compact(spark: SparkSession, path: String): Unit = {
    val folded = read(spark, path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      folded.count()
      VersionedStore.commit(folded, path, replace = true, None, dataDir = "sketches")
    } finally { folded.unpersist(); () }
  }

  /** Delete unreferenced version dirs (the [[VersionedStore]] guards). */
  def vacuum(path: String): Int = VersionedStore.vacuum(path)
}
