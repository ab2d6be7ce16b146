package graft.cli

import graft.{GraftSession, SparkEntry}

/** EP2/P26 — the query-runner CLI (reference src/run_queries.py:27-177):
  *
  *   runMain graft.cli.RunQueries [--name <query>] [--limit N] [--sf <dir>]
  *                                [--sql-file <queries.sql>] [--validation]
  *
  * With no --name, runs every registered query (the reference's --all) and
  * prints a width-clamped table with a display row cap, like the
  * reference's `_display_table` (100-row cap, 50-char clamp). With
  * --sql-file, builds the star from the sf dir's transaction source,
  * registers it as temp views, and runs every (purpose, sql) entry parsed
  * from the file — the reference's queries.sql entry point. With
  * --validation, builds the star and runs the StarIntegrity check suite
  * with a pass/fail summary and non-zero exit on failure (the reference's
  * `--validation` path, src/run_queries.py:180-282).
  */
object RunQueries {

  def main(argv: Array[String]): Unit = {
    val validation = argv.contains("--validation")
    val opts = argv.filterNot(_ == "--validation").sliding(2, 2).collect {
      case Array(k, v) => k -> v
    }.toMap
    val sfDir = opts.getOrElse("--sf", "/root/testdata/sf0.001")
    val limit = opts.getOrElse("--limit", "100").toInt
    val only = opts.get("--name")

    val spark = GraftSession.getOrCreate()
    try {
      if (validation) {
        val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        val star = graft.etl.TxnPipeline.buildStar(graft.etl.DirtyTxns(orders))
        val results = graft.warehouse.StarIntegrity.checks(star)
        results.foreach { case (name, n) =>
          println(f"${if (n == 0) "PASS" else "FAIL"}%-6s$name%-42s$n") }
        val ok = results.forall(_._2 == 0)
        println(if (ok) s"\nAll ${results.size} validation checks passed"
                else s"\nVALIDATION FAILURES: ${results.count(_._2 != 0)}")
        spark.stop()
        if (!ok) sys.exit(1) else return
      }
      opts.get("--sql-file") match {
        case Some(path) =>
          val orders = spark.read.parquet(s"$sfDir/orders.parquet")
          SqlFileQueries.registerStar(
            graft.etl.TxnPipeline.buildStar(graft.etl.DirtyTxns(orders)))
          SqlFileQueries.runAll(spark, path).foreach { case (q, df) =>
            val t0 = System.nanoTime()
            println(s"\n=== ${q.purpose}")
            Display.printTable(df, limit)
            println(f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
          }
        case None =>
          val defs = SparkEntry.defs.filter(d => only.forall(_ == d.name))
          if (defs.isEmpty) { System.err.println(s"no query named ${only.get}"); sys.exit(1) }
          defs.foreach { d =>
            val t0 = System.nanoTime()
            val df = d.run(spark, sfDir)
            println(s"\n=== ${d.name}")
            Display.printTable(df, limit)
            println(f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
          }
      }
    } finally spark.stop()
  }
}
