package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** s06 build-vs-serve decomposition — the measurement harness behind the
  * SURVEY §8 bench attribution (the s06 def rebuilds its index per run,
  * so its bench time conflates the two). Usage: runMain graft.S06Split <sfDir>
  */
object S06Split {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.getOrCreate()
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"S06 $what%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // each index is a full quantized copy of the corpus — delete after use
    // (the same hygiene Recall.ivfIndexEntries applies, ADVICE r7)
    def withIndex(body: String => Unit): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft-s06")
      try body(dir.toString)
      finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    // warm-up pass
    withIndex { w =>
      Similarity.writeIvfIndex(embs, w)
      Similarity.ivfTopKQuantizedFromIndex(embs.filter(col("vec_id") % 100 === 0), w,
        10, Similarity.IvfProbesRegistered).write.format("noop").mode("overwrite").save()
    }
    (1 to 3).foreach { _ =>
      spark.catalog.clearCache()
      withIndex { idx =>
        time("build") { Similarity.writeIvfIndex(embs, idx) }
        time("serve") {
          Similarity.ivfTopKQuantizedFromIndex(
            embs.filter(col("vec_id") % 100 === 0), idx, 10, Similarity.IvfProbesRegistered)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
