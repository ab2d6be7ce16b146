package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's SQL-file query entry point re-expressed for Spark
  * (/root/reference/src/run_queries.py:130-177 parse_queries_file): a
  * queries.sql library file is parsed into (purpose, sql) pairs and each
  * query runs against the star schema — here as Spark SQL over temp views
  * registered from the warehouse DataFrames, so the SAME file a reference
  * user maintains keeps working (Spark SQL is ANSI-compatible with the
  * reference's PostgreSQL dialect for the analytics subset the library
  * uses).
  *
  * File format contract (mirrored from the reference):
  *   - queries are separated by blank double-lines (three consecutive
  *     newlines);
  *   - `--====…` banner sections are skipped;
  *   - a `-- Purpose: …` comment line supplies the description (several
  *     concatenate; absent → "Query");
  *   - the query body starts at the first line beginning with SELECT or
  *     WITH and runs to the section end; one optional trailing `;` is
  *     stripped.
  */
object SqlFileQueries {

  final case class SqlQuery(purpose: String, sql: String)

  def parse(content: String): Seq[SqlQuery] =
    content.split("\n\n\n").toSeq
      .map(_.trim)
      .filter(s => s.nonEmpty && !s.startsWith("--===="))
      .flatMap { section =>
        val lines = section.split("\n").toSeq
        val purposes = lines.collect {
          case l if l.trim.startsWith("-- Purpose:") =>
            l.trim.stripPrefix("-- Purpose:").trim
        }
        val body = lines.dropWhile { l =>
          val u = l.trim.toUpperCase
          !(u.startsWith("SELECT") || u.startsWith("WITH"))
        }
        if (body.isEmpty) None
        else {
          val sql = body.mkString("\n").trim.stripSuffix(";")
          Some(SqlQuery(if (purposes.nonEmpty) purposes.mkString(" ") else "Query", sql))
        }
      }

  def parseFile(path: String): Seq[SqlQuery] =
    parse(Files.readString(Paths.get(path)))

  /** Register star tables as temp views so file-based SQL resolves them by
    * the reference's table names (fact_transactions, dim_date, …).
    */
  def registerStar(tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }

  /** Parse + plan every query in the file (lazy DataFrames — callers decide
    * whether to show, write, or collect).
    */
  def runAll(spark: SparkSession, path: String): Seq[(SqlQuery, DataFrame)] =
    parseFile(path).map(q => q -> spark.sql(q.sql))
}
