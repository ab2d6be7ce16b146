package graft

import org.apache.spark.sql.functions._

/** Temporary r17 measurement probe (not part of any query path): times the
  * s24/s25 IVF-store lifecycle step by step so the optimization report can
  * attribute the defs' cost to build / mutate / serve. Removed or kept as
  * measurement tooling only.
  */
object ProbeS25 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val t = Tables(spark, sfDir)
    import graft.llm.Similarity
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    (1 to 2).foreach { rep =>
      System.err.println(s"[probe] === rep $rep ===")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      TempDirs.purgeAll()
      val idx = TempDirs.scoped("graft-probe-ups")
      timed("build writeIvfIndex") {
        Similarity.writeIvfIndex(t.embeddings, idx)
      }
      val batch = t.embeddings.filter(col("vec_id") % 13 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      timed("upsert: delete") {
        Similarity.deleteFromIvfIndex(batch.select("vec_id"), idx)
      }
      timed("upsert: purge") {
        Similarity.purgeIvfIndexDeletes(spark, idx)
      }
      timed("upsert: append") {
        Similarity.appendToIvfIndex(batch, idx)
      }
      val corpus = t.embeddings.withColumn("embedding",
        when(col("vec_id") % 13 === 0, reverse(col("embedding")))
          .otherwise(col("embedding")))
      timed("serve full-probe") {
        Similarity.ivfTopKQuantizedFromIndex(
          corpus.filter(col("vec_id") % 100 === 0), idx,
          k = 10, nProbe = Similarity.IvfCells)
          .write.format("noop").mode("overwrite").save()
      }
      // e27 quantile-store lifecycle
      val ev = Tables.microsTs(t.events, "ts")
      val root = TempDirs.scoped("graft-probe-qstore")
      timed("e27 write batch1") {
        graft.operators.QuantileStore.write(
          ev.filter(col("event_id") % 3 === 0), "event_type", "value", root)
      }
      timed("e27 append batch2") {
        graft.operators.QuantileStore.append(
          ev.filter(col("event_id") % 3 === 1), "event_type", "value", root)
      }
      timed("e27 append batch3") {
        graft.operators.QuantileStore.append(
          ev.filter(col("event_id") % 3 === 2), "event_type", "value", root)
      }
      timed("e27 serve") {
        graft.operators.QuantileStore.serve(spark, root, Seq(25, 50, 75, 90))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
