package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lazy handles over the driver-provided parquet tables for one scale-factor
  * directory (TESTDATA.md). Reads are plain parquet scans so Catalyst can push
  * filters and prune columns into the file source — never cache here; each
  * query should read only the columns it projects.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  def events: DataFrame     = Tables.widenIds(load("events"), "event_id", "user_id")
  def documents: DataFrame  = Tables.widenIds(load("documents"), "doc_id")
  def embeddings: DataFrame =
    Tables.floatEmbedding(Tables.widenIds(load("embeddings"), "vec_id"), "embedding")
}

object Tables {

  /** Physical-type tolerance at the source boundary: normalize a ts-like
    * column to a microsecond `TimestampType` regardless of how the provider's
    * parquet writer encoded it. Coerce, don't assume (reference
    * src/extract.py:159 inferred parse; src/transform.py:249
    * `pd.to_datetime(errors='coerce')`): a data provider regenerating the
    * inputs with a different writer must not break every downstream operator.
    *
    * Encodings seen in the wild for the `events.ts` column:
    *   - `TIMESTAMP(NANOS)` read as long under
    *     `spark.sql.legacy.parquet.nanosAsLong` (or a plain int64 of epoch
    *     nanos) → integer ns→us division, the same truncation DuckDB applies;
    *   - `timestamp[us]` (pandas/pyarrow default) → already the target type;
    *   - `timestamp_ntz[us]` → reinterpreted as UTC-instant (sessions run UTC,
    *     so the wall-clock field values are preserved bit-for-bit).
    */
  def microsTs(df: DataFrame, colName: String): DataFrame = {
    def as(c: Column): DataFrame = df.withColumn(colName, c)
    df.schema(colName).dataType match {
      case TimestampType    => df
      // integer division (never double: epoch-ns magnitudes exceed double's
      // 2^53 exact-integer range, so a float path would corrupt low bits)
      case LongType         => as(timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType => as(df(colName).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"column '$colName' has unsupported ts encoding $other " +
          "(expected timestamp, timestamp_ntz, or epoch-nanos long)")
    }
  }

  /** Widen int32-encoded id columns to long. The LLM-tier operators consume
    * ids as `Long` (driver probes, codegen'd expressions, case-class
    * encoders); a provider writing pandas-default int32 must not crash them.
    * No-op (no cast node, pushdown untouched) when the column is already
    * long — the normal case.
    */
  def widenIds(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case IntegerType | ShortType | ByteType => d.withColumn(c, d(c).cast(LongType))
        case _                                  => d
      }
    }

  /** Normalize an embedding column to `array<float>` — the width every
    * similarity operator assumes (float collects, int8 quantization,
    * codegen'd dot products). A float64 parquet encoding narrows here ONCE
    * at the scan boundary instead of crashing every getSeq[Float]. No-op
    * when already float.
    */
  def floatEmbedding(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(DoubleType | IntegerType | LongType, _) =>
        df.withColumn(colName, df(colName).cast(ArrayType(FloatType)))
      case other => throw new IllegalArgumentException(
        s"column '$colName' has unsupported embedding encoding $other")
    }
}
