package graft

import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (test scope only, not shipped). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val part = spark.read.parquet("/root/testdata/sf0.1/part.parquet").select("p_partkey", "p_brand")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val proj = li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_extendedprice"))
    // warm
    noop(proj.join(part, col("l_partkey") === col("p_partkey")))
    time("join smj")(noop(proj.join(part, col("l_partkey") === col("p_partkey"))))
    time("join shj")(noop(proj.join(part.hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))))
    time("scan only")(noop(proj))
    val q19 = SparkEntry.defs.find(_.name == "q19_anomaly_zscore").get
    spark.catalog.clearCache()
    time("q19 now")(noop(q19.run(spark, "/root/testdata/sf0.1")))
    spark.catalog.clearCache()
    time("q19 again")(noop(q19.run(spark, "/root/testdata/sf0.1")))
    q19.run(spark, "/root/testdata/sf0.1").explain("formatted")
    spark.stop()
  }
}
