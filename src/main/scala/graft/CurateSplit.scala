package graft

import graft.llm.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** p01 stage decomposition — the measurement harness behind the SURVEY §8
  * bench attribution of the r8 p01_curate_corpus anomaly (2.41 → 3.66 s
  * while its component defs d05/x15 stayed flat and `Curation.curate` was
  * untouched; VERDICT r8 wrong #1 / next #2). Same protocol as
  * [[S06Split]]: one warm-up pass, then 3 cold reps of the three stages
  * p01 composes —
  *
  *   cluster  = Dedup.nearDupClusters → non-representative drop set
  *              (d05's work + the filter)
  *   score    = TextAnalysis.scoreDocuments fused scoring pass
  *              (x15's dominant stage)
  *   assemble = the FULL Curation.curate + orderBy (what the p01 def runs)
  *
  * so `assemble − cluster − score` isolates the join/filter/sort tail. If
  * the stages sum to ~their component-def times and assemble tracks the
  * sum, the r8 number was box contention; a stage materially above its
  * def's time names the regression. Usage: runMain graft.CurateSplit <sfDir>
  */
object CurateSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.getOrCreate()
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"P01 $what%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-up pass (JIT + codegen + parquet footer caches)
    noop(Curation.curate(docs).orderBy("doc_id"))
    (1 to 3).foreach { _ =>
      spark.catalog.clearCache()
      time("cluster") {
        noop(Dedup.nearDupClusters(docs, 0.8)
          .filter(col("doc_id") =!= col("rep")).select("doc_id"))
      }
      spark.catalog.clearCache()
      time("score") { noop(TextAnalysis.scoreDocuments(docs)) }
      spark.catalog.clearCache()
      time("assemble") { noop(Curation.curate(docs).orderBy("doc_id")) }
    }
    spark.stop()
  }
}
