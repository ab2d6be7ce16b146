package graft.cli

import graft.GraftSession
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runnable `readStream → transform → writeStream` demo over the events
  * table: treats the parquet directory as a file stream (the batch file is
  * one micro-batch under Trigger.AvailableNow), applies the watermarked
  * windowed aggregation, and prints the finalized windows.
  *
  *   runMain graft.cli.StreamDemo [sfDir]
  */
object StreamDemo {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate()
    try {
      // schema comes from a static read (file streams require one up front)
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      // file streams watch a DIRECTORY; select the single events file by glob
      val stream = spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val windows = StreamingOps.windowedCounts(stream)
      val query = windows.writeStream
        .format("memory")
        .queryName("stream_demo")
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val out = spark.table("stream_demo").orderBy("window_start", "event_type")
      println(s"[stream-demo] ${out.count()} windows from $sfDir/events.parquet")
      out.show(12, truncate = false)
    } finally spark.stop()
  }
}
