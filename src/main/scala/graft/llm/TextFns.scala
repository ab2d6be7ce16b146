package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators: tokenization,
  * n-gram shingling, normalization. All pure Column compositions (codegen'd,
  * no UDFs) with DuckDB-SQL twins for the correctness oracles.
  */
object TextFns {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Canonical text normalization for exact-dedup fingerprinting:
    * lowercase, trim, collapse internal whitespace.
    */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Distinct n-word shingles (the unit of Jaccard similarity). Documents
    * shorter than n words get an empty set.
    *
    * Backed by the native codegen'd [[graft.functions.WordShingles]]
    * expression (one pass: lowercase → whitespace split → n-gram join →
    * first-occurrence distinct). The history of this operator is the HOF
    * pitfall ladder: a `transform` lambda indexing the token array
    * re-evaluates the captured subtree per element (O(tokens²)); the
    * slice+zip_with chain fixed that but still walked interpreted
    * CodegenFallback HOFs n+2 times per document. Byte-identical output to
    * both (WordShinglesSpec).
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.ShingleFns.wordShingles(text, n)

  /** Exact Jaccard similarity of two string-array columns, as double
    * (integer set sizes → one double division, bit-identical across engines).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  // ---------------------------------------------------------------- oracles

  def sqlNormalized(col: String): String =
    s"regexp_replace(trim(lower($col)), '\\s+', ' ', 'g')"

  /** DuckDB: distinct n-gram shingles exploded to (id, shingle) rows — the
    * sparse form that lets the oracle compute Jaccard by equi-join instead
    * of all-pairs array intersection.
    */
  def sqlShingleRows(idCol: String, textCol: String, table: String, n: Int = 3): String = {
    val parts = (0 until n).map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
    s"""SELECT DISTINCT $idCol, unnest(list_transform(generate_series(1, len(w) - ${n - 1}),
       i -> $parts)) AS shingle
       FROM (SELECT $idCol, string_split_regex(lower($textCol), '\\s+') AS w FROM $table) z"""
  }
}
