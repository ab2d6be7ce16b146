package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Multi-probe LSH frontier sweep — the measurement harness behind the
  * SURVEY §8 recall/fraction frontier numbers (not part of the def
  * registry). Usage: runMain graft.LshSweep <sfDir> [clustered]
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.getOrCreate()
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embs = (if (args.length > 1 && args(1) == "clustered")
        Recall.clusteredCorpus(spark, base.count()) else base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pred = col("vec_id") % 100 === 0
    val n = embs.count()
    val nQ = embs.filter(pred).count()
    val allPairs = (nQ * (n - 1)).toDouble
    val exact = Similarity.bruteForceTopK(embs, pred, 10).localCheckpoint(true)
    val configs = Seq(
      (88, 12, 12), (96, 12, 12), (104, 12, 12), (112, 12, 12), (128, 12, 12))
    configs.foreach { case (l, b, f) =>
      val (cands, release) = Similarity.lshCandidatePairs(embs, pred, l, b, f)
      val frac = try cands.count() / allPairs finally release()
      val recall = Similarity.recallAtK(exact, Similarity.lshTopK(embs, pred, 10, l, b, f))
      println(f"SWEEP L=$l%3d b=$b%2d f=$f recall=$recall%.3f fraction=$frac%.3f")
    }
    spark.stop()
  }
}
