package graft.etl

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneId}

/** Structured per-phase pipeline logging — the reference's logger module
  * (/root/reference/src/logger.py): the same `ts - name - LEVEL - message`
  * line format and dual console + optional file sink, plus a `phase`
  * wrapper that brackets each pipeline stage with start/end lines and the
  * elapsed seconds (the reference logs stage boundaries by hand in
  * etl_pipeline.py; here the bracket is the API). Console output goes to
  * stderr so a CLI's stdout stays machine-readable.
  */
final class PhaseLog(name: String, level: String = "INFO",
                     file: Option[String] = None) {

  private val levels = Seq("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL")
  private val threshold = math.max(0, levels.indexOf(level.toUpperCase))
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  file.foreach { f =>
    Option(Paths.get(f).getParent).foreach(Files.createDirectories(_))
  }

  private def emit(lvl: String, msg: String): Unit = {
    if (levels.indexOf(lvl) >= threshold) {
      val line = s"${LocalDateTime.now(ZoneId.systemDefault()).format(fmt)} - $name - $lvl - $msg"
      System.err.println(line)
      file.foreach { f =>
        Files.writeString(Paths.get(f), line + System.lineSeparator(),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    }
  }

  def debug(msg: String): Unit = emit("DEBUG", msg)
  def info(msg: String): Unit = emit("INFO", msg)
  def warning(msg: String): Unit = emit("WARNING", msg)
  def error(msg: String): Unit = emit("ERROR", msg)

  /** Run `body` as a named pipeline phase: start line, end line with
    * elapsed wall seconds, failure line (and rethrow) on exception.
    */
  def phase[T](p: String)(body: => T): T = {
    info(s"[$p] started")
    val t0 = System.nanoTime()
    try {
      val out = body
      info(f"[$p] completed in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    } catch {
      case e: Throwable =>
        error(f"[$p] FAILED after ${(System.nanoTime() - t0) / 1e9}%.2f s: ${e.getMessage}")
        throw e
    }
  }
}
