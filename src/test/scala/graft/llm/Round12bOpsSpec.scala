package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 pins. d25: the rolling-hash substring dedup must be a pure
  * shuffle-key swap — identical output to the string-keyed d16 form on
  * real corpora (collisions are ≈n²/2⁵³ and would reproduce identically
  * in the DuckDB oracle anyway, so any divergence here is a bug, not a
  * collision).
  */
class Round12bOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("removeDuplicateSpansHashed ≡ removeDuplicateSpans on the documents corpus") {
    val str = Dedup.removeDuplicateSpans(docs, k = 8).orderBy("doc_id").collect()
    val hsh = Dedup.removeDuplicateSpansHashed(docs, k = 8).orderBy("doc_id").collect()
    assert(hsh.toSeq == str.toSeq,
      "hashed shuffle key must not change keep-first span semantics")
  }

  test("removeDuplicateSpansHashed: keep-first, hand-computed (d16 twin case)") {
    val in = Seq(
      (1L, "a b c d x y z q"),
      (2L, "p q r a b c d w"),
      (3L, "u v w only here")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpansHashed(in, k = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 0, "a b c d x y z q"),
      (2L, 4, "p q r w"),
      (3L, 0, "u v w only here")))
  }

  test("removeDuplicateSpansHashed: within-doc repeat keeps only the first copy") {
    val in = Seq((1L, "m n o x m n o")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpansHashed(in, k = 3).collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((3, "m n o x")))
  }

  test("duplicateSpansHashed ≡ duplicateSpans on the documents corpus") {
    val str = Dedup.duplicateSpans(docs, k = 8)
      .orderBy("doc_id", "span_start").collect()
    val hsh = Dedup.duplicateSpansHashed(docs, k = 8)
      .orderBy("doc_id", "span_start").collect()
    assert(hsh.toSeq == str.toSeq,
      "hashed dup-set key must not change span semantics")
  }

  test("dedupLinesHashed ≡ dedupLines on the multi-line fixture") {
    val docs = spark.read.schema("doc_id LONG, text STRING")
      .json("/root/repo/fixtures/documents_multiline.jsonl")
    val str = Dedup.dedupLines(docs).orderBy("doc_id").collect()
    val hsh = Dedup.dedupLinesHashed(docs).orderBy("doc_id").collect()
    assert(hsh.toSeq == str.toSeq,
      "hashed line key must not change keep-first semantics")
  }

  // ---------------------------------------- ANN MIPS via IVF (s18)

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private val qPred = col("vec_id") % 100 === 0

  test("mipsTopKIvf with full probe fan-out ≡ exact mipsTopK (reduction is lossless)") {
    // probing every cell removes the pruning, leaving the reduction itself:
    // any divergence from the exact inner-product ranking is a bug in the
    // augmentation or tie order, not a recall artifact
    val exact = Similarity.mipsTopK(embs, qPred, k = 10)
      .orderBy("query_id", "rank").collect()
    val full = Similarity.mipsTopKIvf(embs, qPred, k = 10,
        nProbe = Similarity.IvfCells)
      .orderBy("query_id", "rank").collect()
    assert(full.toSeq == exact.toSeq)
  }

  test("mipsTopKIvf is deterministic across runs") {
    val a = Similarity.mipsTopKIvf(embs, qPred, k = 10, nProbe = 4)
      .orderBy("query_id", "rank").collect()
    val b = Similarity.mipsTopKIvf(embs, qPred, k = 10, nProbe = 4)
      .orderBy("query_id", "rank").collect()
    assert(a.toSeq == b.toSeq)
  }

  // ---------------------------------------- persisted MIPS index (s19)

  private def withTmpIndex[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mips-spec")
    try f(dir.toString) finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("MIPS index: append with a longer vector than the anchor fails fast") {
    withTmpIndex { idx =>
      Similarity.writeMipsIndex(embs, idx)
      // a vector 2× the longest build vector violates the frozen M²
      val long = embs.limit(1).select(col("vec_id") + 900000000L,
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        .toDF("vec_id", "embedding")
      val e = intercept[IllegalArgumentException] {
        Similarity.appendToMipsIndex(long, idx)
      }
      assert(e.getMessage.contains("exceeds the index anchor"),
        s"unexpected message: ${e.getMessage}")
      // an in-contract append (existing-scale vectors) lands and serves
      val ok = embs.limit(5).select(col("vec_id") + 800000000L, col("embedding"))
        .toDF("vec_id", "embedding")
      Similarity.appendToMipsIndex(ok, idx)
      val served = Similarity.mipsTopKFromIndex(
        embs.filter(qPred).limit(2), idx, k = 5, nProbe = Similarity.IvfCells)
      assert(served.count() == 10)
    }
  }

  test("MIPS index: missing _M2 sidecar is rejected, not silently mis-served") {
    withTmpIndex { idx =>
      Similarity.writeMipsIndex(embs, idx)
      java.nio.file.Files.delete(java.nio.file.Paths.get(s"$idx/_M2"))
      assertThrows[IllegalStateException] {
        new Similarity.MipsIndexHandle(spark, idx)
      }
    }
  }

  test("MIPS index: probe scan prunes to the probed cells' partitions") {
    withTmpIndex { idx =>
      Similarity.writeMipsIndex(embs, idx)
      val plan = Similarity.mipsTopKFromIndex(
        embs.filter(qPred).limit(3), idx, k = 10, nProbe = 4)
        .queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cell")),
        s"probed-cell literal must prune the vectors scan:\n$plan")
    }
  }

  test("MIPS index serve is deterministic across handles") {
    withTmpIndex { idx =>
      Similarity.writeMipsIndex(embs, idx)
      val q = embs.filter(qPred)
      val a = Similarity.mipsTopKFromIndex(q, idx, k = 10, nProbe = 4)
        .orderBy("query_id", "rank").collect()
      val b = Similarity.mipsTopKFromIndex(q, idx, k = 10, nProbe = 4)
        .orderBy("query_id", "rank").collect()
      assert(a.toSeq == b.toSeq)
    }
  }

  // ------------------------------------ partition-spec evolution (t32)

  test("spec evolution: each generation prunes at its own granularity, no rows lost or doubled") {
    import graft.warehouse.ParquetWarehouse
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("year", year(col("o_orderdate")).cast("int"))
    withTmpIndex { root =>
      val path = s"$root/evolved"
      ParquetWarehouse.writeSpecEvolved(Seq(
        (orders.filter(col("year") < 1998), Seq("year")),
        (orders.filter(col("year") >= 1998), Seq("year", "o_orderstatus"))), path)
      val read = ParquetWarehouse.readSpecEvolved(spark, path)
      // lossless across the generation boundary
      assert(read.count() == orders.count())
      assert(read.select("o_orderkey").distinct().count() == orders.count(),
        "no order may be doubled across generations")
      // pruning: year is a listing-time partition filter on BOTH scans;
      // o_orderstatus is a partition filter only on the evolved scan and a
      // pushed parquet data filter on the original
      val plan = read
        .filter(col("year").isin(1996, 1999) && col("o_orderstatus") === "F")
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
      assert(scans.size == 2, s"expected two generation scans:\n$plan")
      assert(scans.forall(_.contains("year")),
        s"year must prune both generations at listing time:\n$plan")
      assert(scans.exists(_.contains("o_orderstatus")),
        s"status must prune the evolved generation at listing time:\n$plan")
      assert(plan.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("o_orderstatus")),
        s"status must push as a data filter on the original generation:\n$plan")
    }
  }

  test("spec evolution: generations order numerically past 9 and null-fill added columns") {
    import graft.warehouse.ParquetWarehouse
    val base = spark.range(2).select(col("id"), lit("old").as("src"))
    withTmpIndex { root =>
      val path = s"$root/manyspecs"
      // 11 generations — spec10 sorts BEFORE spec2 lexicographically; the
      // numeric sort must keep generation order (pinned via the src tag)
      ParquetWarehouse.writeSpecEvolved(
        (0 until 11).map(i =>
          (spark.range(1).select((col("id") + i * 10).as("id"),
            lit(s"g$i").as("src")), Seq.empty[String])), path)
      val read = ParquetWarehouse.readSpecEvolved(spark, path)
      assert(read.count() == 11)
      assert(read.select("src").as[String].collect().toSet ==
        (0 until 11).map(i => s"g$i").toSet)
      // schema evolution: a NEWER generation adds a column; older
      // generations must serve it as null, not fail the union
      val path2 = s"$root/addedcol"
      base.write.parquet(s"$path2/spec0")
      spark.range(3, 5).select(col("id"), lit("new").as("src"),
        lit(7).as("added")).write.parquet(s"$path2/spec1")
      val evolved = ParquetWarehouse.readSpecEvolved(spark, path2)
      assert(evolved.columns.toSet == Set("id", "src", "added"))
      val nulls = evolved.filter(col("added").isNull).count()
      assert(nulls == 2, s"old generation must null-fill the added column, got $nulls")
      assert(evolved.count() == 4)
    }
  }

  // ------------------------------------ key-indexed point lookup (t33)

  test("key-indexed layout: point lookup materializes a fraction; unsorted scans everything") {
    import graft.warehouse.ParquetWarehouse
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head.metrics("numOutputRows").value
    }
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val total = orders.count()
    // probe MID-RANGE: a boundary key (min/max) is prunable by accident
    // even without sorting, because only one hash-clustered file's
    // [min,max] can contain the global extreme — the middle key is the
    // honest contrast (every unsorted file's range straddles it)
    val mm = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
    val key = (mm.getLong(0) + mm.getLong(1)) / 2
    withTmpIndex { root =>
      ParquetWarehouse.writeKeyIndexed(orders, s"$root/keyed", "o_orderkey", files = 8)
      // contrast layout: same files, key order destroyed (hash clustering)
      orders.repartition(8, col("o_custkey"))
        .write.mode("overwrite").parquet(s"$root/unsorted")
      withConf("spark.sql.adaptive.enabled", "false") {
        val keyed = scanRows(
          spark.read.parquet(s"$root/keyed").filter(col("o_orderkey") === key))
        val unsorted = scanRows(
          spark.read.parquet(s"$root/unsorted").filter(col("o_orderkey") === key))
        assert(keyed * 4 <= total,
          s"sorted stats + bloom must prune the point lookup: scanned $keyed of $total")
        assert(unsorted * 2 > total,
          s"the unsorted layout has no stats to prune with: scanned $unsorted of $total")
        assert(keyed < unsorted)
      }
      // losslessness of the indexed round-trip
      assert(spark.read.parquet(s"$root/keyed").count() == total)
    }
  }

  test("mipsAugmented: every augmented vector has squared norm = corpus max") {
    val aug = Similarity.mipsAugmented(embs)
    val norms = aug.select(
      graft.functions.VecMath.vecDot(col("embedding"), col("embedding")).as("n2"))
      .agg(min("n2").as("lo"), max("n2").as("hi")).head()
    // float augmentation rounds: the augmented component is the float
    // nearest to sqrt(M^2 - |x|^2), so norms agree to float precision
    assert(math.abs(norms.getDouble(0) - norms.getDouble(1)) <
      1e-5 * norms.getDouble(1),
      s"augmented norms must be ~constant, got ${norms.getDouble(0)} vs ${norms.getDouble(1)}")
  }
}
