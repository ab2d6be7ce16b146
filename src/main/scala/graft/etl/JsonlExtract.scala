package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) document ingestion — the wire format
  * crawl dumps and LLM-corpus interchange actually arrive in (one JSON
  * object per line; WebText/C4/Dolma-style layout).
  *
  * Scale contract: the schema is EXPLICIT — schema-on-read with no
  * inference pass (`spark.read.json` without a schema samples the whole
  * input first: a second full 100 TB scan before the real one). Unknown
  * extra fields are ignored by the reader, missing fields land as null,
  * and malformed lines are captured per-row in `_corrupt_record`
  * (PERMISSIVE) instead of failing the batch — the same
  * tolerate-and-profile posture as the CSV extract (CsvExtract.read).
  * JSONL splits by newline, so a single file parallelizes across tasks
  * like CSV; parsing is a narrow map.
  */
object JsonlExtract {

  /** Document-corpus JSONL schema: id + text + descriptive metadata, with a
    * nested provenance struct (url, crawl id) — nested fields stay typed
    * columns, prunable by Catalyst (reading only `meta.url` does not parse
    * `text`... column pruning reaches INSIDE the struct for parquet; for
    * JSON the line is parsed once but only requested fields materialize).
    */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("meta", StructType(Seq(
      StructField("url", StringType),
      StructField("crawl", StringType)))),
    StructField("_corrupt_record", StringType)))

  /** Read a JSONL document file/directory with the explicit corpus schema.
    * Valid rows have `_corrupt_record` null; malformed lines yield a row
    * that is null everywhere EXCEPT `_corrupt_record` (the raw line, for
    * quarantine/profiling).
    */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(DocumentSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Ingestion + normalization: drop corrupt lines (counted upstream via
    * [[corruptLines]]), default a missing language to 'und' (BCP-47
    * undetermined), flatten provenance, and derive the length fields the
    * curation stages key on. One narrow pass.
    */
  def normalizeDocuments(raw: DataFrame): DataFrame =
    raw
      .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .select(
        col("doc_id"),
        col("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        col("source"),
        col("meta.url").as("url"),
        col("meta.crawl").as("crawl"),
        length(col("text")).as("n_chars"),
        size(graft.llm.TextFns.tokens(col("text"))).as("n_tokens"))

  /** The quarantine side: raw malformed lines for profiling. The filter
    * deliberately references `doc_id` too — Spark refuses a raw-file query
    * whose required schema is ONLY the internal corrupt-record column
    * (SPARK-21610), and on a corrupt row every schema field is null anyway,
    * so the predicate is equivalent and keeps the scan legal without
    * caching the whole input.
    */
  def corruptLines(raw: DataFrame): DataFrame =
    raw.filter(col("doc_id").isNull && col("_corrupt_record").isNotNull)
      .select("_corrupt_record")
}
