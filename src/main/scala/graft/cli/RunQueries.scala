package graft.cli

import graft.{GraftSession, SparkEntry}

/** EP2/P26 — the query-runner CLI (reference src/run_queries.py:27-177):
  *
  *   runMain graft.cli.RunQueries [--name <query>] [--limit N] [--sf <dir>]
  *                                [--sql-file <queries.sql>]
  *
  * With no --name, runs every registered query (the reference's --all) and
  * prints a width-clamped table with a display row cap, like the
  * reference's `_display_table` (100-row cap, 50-char clamp). With
  * --sql-file, builds the star from the sf dir's transaction source,
  * registers it as temp views, and runs every (purpose, sql) entry parsed
  * from the file — the reference's queries.sql entry point.
  */
object RunQueries {

  def main(argv: Array[String]): Unit = {
    val opts = argv.sliding(2, 2).collect {
      case Array(k, v) => k -> v
    }.toMap
    val sfDir = opts.getOrElse("--sf", "/root/testdata/sf0.001")
    val limit = opts.getOrElse("--limit", "100").toInt
    val only = opts.get("--name")

    val spark = GraftSession.getOrCreate()
    try {
      opts.get("--sql-file") match {
        case Some(path) =>
          val orders = spark.read.parquet(s"$sfDir/orders.parquet")
          SqlFileQueries.registerStar(
            graft.etl.TxnPipeline.buildStar(graft.etl.DirtyTxns(orders)))
          SqlFileQueries.runAll(spark, path).foreach { case (q, df) =>
            val t0 = System.nanoTime()
            println(s"\n=== ${q.purpose}")
            df.show(limit, truncate = 50)
            println(f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
          }
        case None =>
          val defs = SparkEntry.defs.filter(d => only.forall(_ == d.name))
          if (defs.isEmpty) { System.err.println(s"no query named ${only.get}"); sys.exit(1) }
          defs.foreach { d =>
            val t0 = System.nanoTime()
            val df = d.run(spark, sfDir)
            println(s"\n=== ${d.name}")
            df.show(limit, truncate = 50)
            println(f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
          }
      }
    } finally spark.stop()
  }
}
