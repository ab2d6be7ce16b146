package graft.warehouse

import java.nio.file.Files

import graft.SparkSpec
import graft.llm.Multimodal
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft-wh")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("idempotent append: second run of the same data inserts zero rows") {
    val path = tmpDir() + "/fact"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    assert(ParquetWarehouse.appendIdempotent(df, path, "k") == 3)
    assert(ParquetWarehouse.appendIdempotent(df, path, "k") == 0)
    val more = Seq((3L, "c"), (4L, "d")).toDF("k", "v")
    assert(ParquetWarehouse.appendIdempotent(more, path, "k") == 1)
    assert(spark.read.parquet(path).count() == 4)
  }

  test("snapshot publish is versioned and atomic; pre-flight validates layout") {
    val root = tmpDir()
    val t1 = Seq((1, "x")).toDF("k", "v")
    val v1 = ParquetWarehouse.publishSnapshot(root, Map("dim" -> t1, "fact" -> t1))
    assert(v1 == "v1")
    assert(ParquetWarehouse.readTable(spark, root, "dim").count() == 1)
    val t2 = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val v2 = ParquetWarehouse.publishSnapshot(root, Map("dim" -> t2, "fact" -> t2))
    assert(v2 == "v2")
    assert(ParquetWarehouse.readTable(spark, root, "fact").count() == 2)
    val pf = ParquetWarehouse.preFlight(spark, root, Seq("dim", "fact"))
    assert(pf.ok && pf.rowCounts == Map("dim" -> 2L, "fact" -> 2L))
    val bad = ParquetWarehouse.preFlight(spark, root, Seq("dim", "missing_table"))
    assert(!bad.ok && bad.problems.exists(_.contains("missing_table")))
  }

  test("pre-flight fails cleanly with no published snapshot") {
    val pf = ParquetWarehouse.preFlight(spark, tmpDir(), Seq("dim"))
    assert(!pf.ok)
  }

  test("star integrity: a freshly built star passes every check; corruption is caught") {
    import graft.etl.{DirtyTxns, TxnPipeline}
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val star = TxnPipeline.buildStar(DirtyTxns(orders)) - "valid"
    val results = StarIntegrity.checks(star)
    assert(results.forall(_._2 == 0L), s"violations: ${results.filter(_._2 != 0)}")
    // corrupt: drop half the user dim → orphan_user fires
    val corrupted = star + ("dim_user" -> star("dim_user").filter(col("user_key") % 2 === 0))
    val bad = StarIntegrity.checks(corrupted).toMap
    assert(bad("orphan_user") > 0)
    assert(!StarIntegrity.allClean(corrupted))
  }

  test("multimodal: feature extraction is deterministic, features are unit-mass histograms") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val feats = Multimodal.extractFeatures(Multimodal.syntheticAssets(docs)).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, "histogram sums to 1")
      assert(f.checksum.length == 32)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.syntheticAssets(docs)).collect()
    assert(feats.sortBy(_.asset_id).map(_.checksum).toSeq ==
      again.sortBy(_.asset_id).map(_.checksum).toSeq)
  }

  test("multimodal: chunk sampling keeps every k-th fixed-size chunk") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(5)
    val chunks = Multimodal.sampleChunks(Multimodal.syntheticAssets(docs), chunkBytes = 64, every = 4)
    val perAsset = chunks.groupBy("asset_id").agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"))
      .collect()
    perAsset.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getInt(2) % 4 == 0) // only indices 0,4,8,... survive
    }
  }
}
