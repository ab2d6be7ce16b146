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

  /** Ingestion + normalization: keep only fully-parsed lines that carry the
    * required key (corrupt lines go to [[corruptLines]]; well-formed lines
    * missing `doc_id` go to [[rejectedLines]] — the three outputs partition
    * the input), default a missing language to 'und' (BCP-47 undetermined),
    * flatten provenance, and derive the length fields the curation stages
    * key on. One narrow pass.
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

  /** The quarantine side: raw malformed lines for profiling. The EFFECTIVE
    * predicate is `_corrupt_record IS NOT NULL` alone — Spark 4 parses
    * PERMISSIVE JSON with partial results
    * (spark.sql.json.enablePartialResults), so a malformed line can still
    * yield non-null schema fields (e.g. a parsed `doc_id` prefix before the
    * truncation point); requiring them null would silently drop such rows
    * from BOTH sides. The `doc_id IS NULL OR doc_id IS NOT NULL` conjunct is
    * a tautology whose only job is to keep `doc_id` in the scan's required
    * schema even when downstream pruning (e.g. a bare `count()`) drops the
    * projection — Spark refuses a raw-file query whose required schema is
    * ONLY the internal corrupt-record column (SPARK-21610). `doc_id` also
    * rides along in the output so the profiler sees which partially-parsed
    * key the broken line claimed.
    */
  def corruptLines(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNotNull &&
        (col("doc_id").isNull || col("doc_id").isNotNull))
      .select(col("doc_id"), col("_corrupt_record"))

  /** The third bucket: lines that parse as valid JSON but lack the required
    * `doc_id` key, so they can enter neither the clean corpus (no dedup /
    * join identity) nor the corrupt quarantine (nothing is malformed).
    * Totality contract: for any input,
    * normalizeDocuments ∪ corruptLines ∪ rejectedLines covers every line
    * exactly once (the three predicates are pairwise disjoint and exhaustive
    * over (_corrupt_record null?, doc_id null?)).
    */
  def rejectedLines(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNull && col("doc_id").isNull)
      .select(col("text"), col("lang"), col("source"), col("meta"))
}
