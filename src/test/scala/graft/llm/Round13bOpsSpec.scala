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

  test("upsertIvfIndex: retry converges to one copy at every crash window") {
    val idx = freshIndex()
    val batch = embs.filter(col("vec_id") % 13 === 0)
      .withColumn("embedding", reverse(col("embedding")))
    def serveNow() = Similarity.ivfTopKQuantizedFromIndex(
      embs.filter(queries), idx, k = 10, nProbe = Similarity.IvfCells)
      .orderBy("query_id", "rank").collect().toSeq
    Similarity.upsertIvfIndex(batch, idx)
    val want = serveNow()
    // crash-after-append replay: the whole upsert runs again
    Similarity.upsertIvfIndex(batch, idx)
    assert(serveNow() == want, "a replayed upsert must not double or lose rows")
    // crash-between-purge-and-append replay: rows already removed when
    // the retry's delete+purge run — they must no-op and the append land
    Similarity.deleteFromIvfIndex(batch.select("vec_id"), idx)
    Similarity.purgeIvfIndexDeletes(spark, idx)
    Similarity.upsertIvfIndex(batch, idx)
    assert(serveNow() == want, "a mid-gap replay must land the batch exactly once")
    // exactly one copy of every upserted id in the store
    val copies = spark.read.parquet(s"$idx/vectors")
      .join(batch.select("vec_id"), Seq("vec_id"))
      .groupBy("vec_id").count().filter(col("count") =!= 1).count()
    assert(copies == 0, "an upserted id must have exactly one stored copy")
  }

  test("kneserNeyScore: hand-computed ladder on a toy corpus; model sums to 1 per context") {
    import spark.implicits._
    // train "a b a c": bigrams {a b, b a, a c} each once → B = 3;
    // ctx a: n_ctx=2, N1+(a·)=2; cont: each of a/b/c follows exactly 1 ctx.
    // Seen pair (a,b):   P = ((4−3)·3 + 3·2·1)/(4·3·2) = 9/24
    // Unseen pair (a,a): P = 3·2·1/24 = 6/24
    // → Σ_w P(w|a) over the vocab = 9/24 + 9/24 + 6/24 = 1 (KN mass law)
    val model = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val scored = Seq(
      (1L, "a b"), // seen bigram        → ln(24/9)
      (3L, "a a"), // backoff            → ln(24/6) = ln 4
      (5L, "z z")  // OOV                → ln(4·B)  = ln 12
    ).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyScore(scored, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got(1L) == ((1L, r4(math.log(24.0 / 9)))))
    assert(got(3L) == ((1L, r4(math.log(4.0)))))
    assert(got(5L) == ((1L, r4(math.log(12.0)))))
  }

  test("kneserNeyScore ranks in-domain text as less surprising than shuffled text") {
    // the property a perplexity FILTER needs: fluent in-domain bigrams
    // score lower than the same tokens in scrambled order
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val model = docs.filter(col("doc_id") % 2 === 0)
    val fluent = docs.filter(col("doc_id") % 2 === 1)
    val shuffled = fluent.select(col("doc_id"),
      concat_ws(" ", reverse(org.apache.spark.sql.functions.split(
        lower(col("text")), "\\s+"))).as("text"))
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      TextAnalysis.kneserNeyScore(df, model)
        .agg(avg("kn_surprisal")).collect().head.getDouble(0)
    val (f, s) = (mean(fluent), mean(shuffled))
    assert(f < s, s"fluent $f must be less surprising than shuffled $s")
  }

  test("doremiMixtureWeights: a distribution that up-weights exactly the hard domains") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val w = TextAnalysis.doremiMixtureWeights(docs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // each published weight rounds to 6 dp → the sum can drift |domains|·5e-7
    assert(math.abs(w.map(_._4).sum - 1.0) < w.length * 5e-7,
      "weights must normalize to 1 within rounding")
    val totTok = w.map(_._2).sum.toDouble
    val lBar = {
      // token-weighted corpus mean of the per-domain means
      w.map { case (_, n, ls, _) => n * ls }.sum / totTok
    }
    w.foreach { case (s, n, ls, wt) =>
      val share = n / totTok
      if (ls > lBar + 1e-9)
        assert(wt > share, s"hard domain $s must up-weight from its token share")
      if (ls < lBar - 1e-9)
        assert(wt < share, s"easy domain $s must down-weight from its token share")
    }
    // η = 0 degenerates to the token-share baseline exactly
    val base = TextAnalysis.doremiMixtureWeights(docs, eta = 0.0).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    w.foreach { case (s, n, _, _) =>
      assert(math.abs(base(s) - n / totTok) < 5e-7,
        s"eta=0 must return the token share for $s")
    }
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
