package graft.cli

import graft.GraftSession
import graft.etl.{CsvExtract, EtlConfig, PhaseLog, TxnPipeline}
import graft.warehouse.ParquetWarehouse

/** EP1 — the batch pipeline CLI (reference src/etl_pipeline.py:475-658):
  *
  *   runMain graft.cli.EtlPipeline --source <csv> --warehouse <dir>
  *     [--dry-run] [--validate-only] [--verbose]
  *
  * Modes mirror the reference: full ETL, --dry-run (skip the load),
  * --validate-only (extract + transform validation report, no star build).
  * Exit codes: 0 success, 1 failure (130 on interrupt is JVM default).
  *
  * Operational surface from the environment ([[graft.etl.EtlConfig]]):
  * LOG_LEVEL/LOG_FILE drive the per-phase structured log
  * ([[graft.etl.PhaseLog]], stderr + optional file — stdout stays the
  * machine-readable report lines); MAX_DB_RETRIES/RETRY_DELAY bound the
  * publish retry loop.
  */
object EtlPipeline {

  final case class Args(source: String = "", warehouse: String = "",
                        dryRun: Boolean = false, validateOnly: Boolean = false,
                        verbose: Boolean = false)

  private def parse(argv: Array[String]): Args =
    argv.foldLeft((Args(), Option.empty[String])) {
      case ((a, Some("--source")), v) => (a.copy(source = v), None)
      case ((a, Some("--warehouse")), v) => (a.copy(warehouse = v), None)
      case ((a, None), "--source") => (a, Some("--source"))
      case ((a, None), "--warehouse") => (a, Some("--warehouse"))
      case ((a, None), "--dry-run") => (a.copy(dryRun = true), None)
      case ((a, None), "--validate-only") => (a.copy(validateOnly = true), None)
      case ((a, None), "--verbose") => (a.copy(verbose = true), None)
      case ((a, None), other) => sys.error(s"unknown argument: $other")
      case ((_, Some(flag)), _) => sys.error(s"missing value for $flag")
    }._1

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    require(args.source.nonEmpty, "--source <csv> is required")
    val cfg = EtlConfig.fromEnv()
    val log = new PhaseLog("etl_pipeline",
      if (args.verbose) "DEBUG" else cfg.logLevel, cfg.logFile)
    val spark = GraftSession.getOrCreate()
    val t0 = System.nanoTime()
    def elapsed = f"${(System.nanoTime() - t0) / 1e9}%.2f s"
    try {
      val raw = log.phase("extract") {
        val raw = CsvExtract.extract(spark, args.source)
        val structure = CsvExtract.validateStructure(raw)
        println(s"[extract] ${structure.rowCount} rows, " +
          s"extra=${structure.extraColumns.mkString(",")}, allNull=${structure.allNullRows} ($elapsed)")
        if (args.verbose) CsvExtract.nullProfile(raw).show(20, truncate = false)
        raw
      }

      val proceed = log.phase("transform") {
        val flags = TxnPipeline.withFlags(
          TxnPipeline.standardize(TxnPipeline.dedupKeepFirst(raw)))
        val valid = TxnPipeline.validTxns(flags)
        val nValid = valid.count()
        println(s"[transform] $nValid valid rows ($elapsed)")
        !args.validateOnly
      }
      if (!proceed) { println(s"[done] validate-only, exit 0 ($elapsed)"); return }

      val star = TxnPipeline.buildStar(raw) - "valid"
      if (args.dryRun) {
        star.foreach { case (n, df) => println(s"[dry-run] $n: ${df.count()} rows") }
        println(s"[done] dry-run, no load ($elapsed)"); return
      }
      require(args.warehouse.nonEmpty, "--warehouse <dir> is required unless --dry-run")
      log.phase("load") {
        val version = EtlConfig.withRetries(cfg.maxDbRetries, cfg.retryDelaySec, log.warning) {
          ParquetWarehouse.publishSnapshot(args.warehouse, star)
        }
        val pf = ParquetWarehouse.preFlight(spark, args.warehouse, star.keys.toSeq)
        println(s"[load] published $version: ${pf.rowCounts.toSeq.sortBy(_._1)
          .map { case (t, n) => s"$t=$n" }.mkString(", ")} ($elapsed)")
        if (!pf.ok) { pf.problems.foreach(p => System.err.println(s"[load] $p")); sys.exit(1) }
      }
      println(s"[done] exit 0 ($elapsed)")
    } catch {
      case e: Exception =>
        log.error(s"pipeline failed: ${e.getMessage}")
        System.err.println(s"[failed] ${e.getMessage} ($elapsed)")
        sys.exit(1)
    } finally spark.stop()
  }
}
