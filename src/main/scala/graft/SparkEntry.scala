package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.EtlQueries
import graft.llm.LlmQueries
import graft.queries.{GraphQueries, StarQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's QueryDef from the per-module
  * registries. Each entry pairs an idiomatic Spark DataFrame program with a
  * DuckDB oracle SQL (where ANSI-expressible) over the same parquet tables.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def defs: Seq[QueryDef] =
    StarQueries.all ++ EtlQueries.all ++ LlmQueries.all ++ GraphQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    defs.head.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops — and
    * for adaptive-round defs whose run has NOT executed in this process
    * (`oracleReady` false): their late-bound oracle would unroll a seeded
    * fallback round count, which at a scale where the data-derived R
    * differs is a falsely-failing oracle, worse than the driver's
    * rows-only fallback (ADVICE r12 #3).
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d =>
      if (d.oracleReady()) d.oracleText.map(d.name -> _) else None).toMap
}
