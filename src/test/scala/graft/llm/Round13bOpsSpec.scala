package graft.llm

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 second-session pins: the vector-index DELETE lifecycle (s24).
  * Exactness of the served ranking is the s24 DuckDB oracle's job; these
  * pin the store mechanics — tombstones mask at every probe depth, purge
  * preserves the served answer while folding the anti-join state away,
  * only touched cell directories are rewritten, a fully-emptied cell's
  * directory drops (it would otherwise resurrect once tombstones clear),
  * and a rebuild voids stale tombstones.
  */
class Round13bOpsSpec extends SparkSpec {

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private val queries = col("vec_id") % 100 === 0

  private def freshIndex(): String = {
    val idx = Files.createTempDirectory("graft-del-spec").toString
    Similarity.writeIvfIndex(embs, idx)
    idx
  }

  private def cellFiles(idx: String): Map[String, Set[String]] = {
    val root = new java.io.File(s"$idx/vectors")
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.getName -> d.listFiles().map(_.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet).toMap
  }

  test("tombstones mask deleted ids at partial AND full probe depth") {
    val idx = freshIndex()
    Similarity.deleteFromIvfIndex(
      embs.filter(col("vec_id") % 7 === 0).select("vec_id"), idx)
    for (probe <- Seq(Similarity.IvfProbes, Similarity.IvfCells)) {
      val got = Similarity.ivfTopKQuantizedFromIndex(
        embs.filter(queries), idx, k = 10, nProbe = probe)
      assert(got.filter(col("neighbor_id") % 7 === 0).count() == 0,
        s"a deleted vector ranked at nProbe=$probe")
      assert(got.count() > 0)
    }
  }

  test("purge preserves the served answer, folds state, rewrites only touched cells") {
    val idx = freshIndex()
    val delIds = embs.filter(col("vec_id") % 7 === 0).select("vec_id")
    val nDel = delIds.count()
    Similarity.deleteFromIvfIndex(delIds, idx)
    val touched = spark.read.parquet(s"$idx/vectors")
      .join(delIds, Seq("vec_id"))
      .select(col("cell").cast("long")).distinct()
      .collect().map(r => s"cell=${r.getLong(0)}").toSet
    val before = cellFiles(idx)
    val served = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(queries), idx, k = 10, nProbe = Similarity.IvfCells)
      .orderBy("query_id", "rank").collect().toSeq

    val purged = Similarity.purgeIvfIndexDeletes(spark, idx)
    assert(purged == nDel, s"expected $nDel rows purged, got $purged")
    assert(!new java.io.File(s"$idx/deletes").exists(),
      "tombstones must drop once folded")
    val after = cellFiles(idx)
    before.keySet.diff(touched).foreach { c =>
      assert(after(c) == before(c), s"untouched $c was rewritten")
    }
    assert(touched.forall(c => !after.contains(c) || after(c) != before(c)),
      "every touched cell must be rewritten (or dropped)")
    val reserved = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(queries), idx, k = 10, nProbe = Similarity.IvfCells)
      .orderBy("query_id", "rank").collect().toSeq
    assert(reserved == served, "purge changed the served ranking")
    assert(Similarity.purgeIvfIndexDeletes(spark, idx) == 0L, "re-purge is a no-op")
  }

  test("a fully-emptied cell's directory drops at purge (no resurrection)") {
    val idx = freshIndex()
    val vecs = spark.read.parquet(s"$idx/vectors")
    val victim = vecs.groupBy(col("cell").cast("long").as("cell")).count()
      .orderBy(col("count"), col("cell")).limit(1)
      .collect().head.getLong(0)
    // localize the victim ids BEFORE purge: the lazy frame's file goes
    // away with the emptied cell dir (vacuum semantics, same as t29)
    val victimIdSeq = vecs.filter(col("cell") === victim).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    val nVictim = victimIdSeq.size.toLong
    assert(nVictim > 0)
    import spark.implicits._
    val victimIds = victimIdSeq.toDF("vec_id")
    Similarity.deleteFromIvfIndex(victimIds, idx)
    val purged = Similarity.purgeIvfIndexDeletes(spark, idx)
    assert(purged == nVictim)
    assert(!new java.io.File(s"$idx/vectors/cell=$victim").exists(),
      "an emptied cell directory left behind would resurrect its rows")
    val got = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(queries), idx, k = 10, nProbe = Similarity.IvfCells)
    assert(got.join(victimIds.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_semi").count() == 0,
      "a purged vector ranked after its cell dropped")
  }

  test("a rebuild voids stale tombstones") {
    val idx = freshIndex()
    Similarity.deleteFromIvfIndex(
      embs.filter(col("vec_id") % 7 === 0).select("vec_id"), idx)
    Similarity.writeIvfIndex(embs, idx)
    val got = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(queries), idx, k = 10, nProbe = Similarity.IvfCells)
    assert(got.filter(col("neighbor_id") % 7 === 0).count() > 0,
      "tombstones from the replaced generation must not mask the rebuild")
  }
}
