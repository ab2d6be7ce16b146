package graft.cli

import graft.{GraftSession, SparkEntry}

/** EP2/P26 — the query-runner CLI (reference src/run_queries.py:27-177):
  *
  *   runMain graft.cli.RunQueries [--name <query>] [--limit N] [--sf <dir>]
  *
  * With no --name, runs every registered query (the reference's --all) and
  * prints a width-clamped table with a display row cap, like the
  * reference's `_display_table` (100-row cap, 50-char clamp).
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
      val defs = SparkEntry.defs.filter(d => only.forall(_ == d.name))
      if (defs.isEmpty) { System.err.println(s"no query named ${only.get}"); sys.exit(1) }
      defs.foreach { d =>
        val t0 = System.nanoTime()
        val df = d.run(spark, sfDir)
        println(s"\n=== ${d.name}")
        df.show(limit, truncate = 50)
        println(f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
      }
    } finally spark.stop()
  }
}
