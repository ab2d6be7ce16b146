package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.warehouse.AtomicPointer

/** The shared versioned-append durability protocol under [[CountStore]]
  * and [[SketchStore]] (originally the dedup corpus index's, Dedup.scala):
  * each batch stages under a dot-prefixed dir (invisible to vacuum and
  * listing tools), renames into `v<N>`, then the CURRENT pointer — a
  * newline list of committed versions — swaps atomically. A crash
  * mid-append leaves the prior pointer live; the replayed append re-stages
  * the SAME version number and clobbers the orphan. Appends never read
  * existing state; the merge is each store's read-side concern (SUM for
  * counts, union for sketches — any associative, commutative merge fits).
  */
private[operators] object VersionedStore {

  private val Pointer = "CURRENT"

  def committedVersions(path: String): Seq[String] =
    AtomicPointer.read(s"$path/$Pointer")
      .map(_.split("\n").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  /** Stage + atomically commit `df` as the next version. `replace = true`
    * makes it the sole committed version (bootstrap/rebuild/compaction
    * fold); an optional `tag` commits atomically WITH the version
    * (exactly-once bookkeeping for replayed streaming appends).
    */
  def commit(df: DataFrame, path: String, replace: Boolean,
             tag: Option[String], dataDir: String): Unit = {
    val committed = committedVersions(path)
    val next = "v" + (committed.filter(_.matches("v\\d+"))
      .lastOption.map(_.drop(1).toLong).getOrElse(0L) + 1)
    val staging = s".staging-$next"
    df.write.mode("overwrite").parquet(s"$path/$staging/$dataDir")
    tag.foreach(t => AtomicPointer.write(s"$path/$staging/TAG", t))
    AtomicPointer.publishDir(s"$path/$staging", s"$path/$next")
    AtomicPointer.write(s"$path/$Pointer",
      ((if (replace) Seq.empty else committed) :+ next).mkString("", "\n", "\n"))
  }

  /** Whether any COMMITTED version carries `tag` (see [[CountStore.hasTag]]
    * for the crash-window argument).
    */
  def hasTag(path: String, tag: String): Boolean =
    committedVersions(path).exists(v =>
      AtomicPointer.read(s"$path/$v/TAG").map(_.trim).contains(tag))

  /** Raw unionByName of every committed version's rows (pre-merge view). */
  def readUnion(spark: SparkSession, path: String, dataDir: String): DataFrame = {
    val vs = committedVersions(path)
    require(vs.nonEmpty, s"VersionedStore: no committed versions under $path")
    vs.map(v => spark.read.parquet(s"$path/$v/$dataDir"))
      .reduce(_.unionByName(_))
  }

  /** Delete version dirs the pointer no longer references — never above
    * the max committed number (a serial writer's in-flight commit occupies
    * exactly max+1), pointer re-read before each delete.
    */
  def vacuum(path: String): Int = {
    val committed = committedVersions(path).toSet
    val maxCommitted = committed.filter(_.matches("v\\d+"))
      .map(_.drop(1).toLong).maxOption.getOrElse(0L)
    val junk = AtomicPointer.listDirNames(path)
      .filter(n => n.matches("v\\d+") && !committed.contains(n) &&
        n.drop(1).toLong <= maxCommitted)
    junk.count { name =>
      !committedVersions(path).contains(name) &&
        AtomicPointer.deleteDir(s"$path/$name")
    }
  }
}
