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
    * Built from n shifted `slice`s zipped together rather than a
    * `transform` whose lambda indexes the token array: a lambda that
    * captures an outer array subtree re-evaluates that subtree PER ELEMENT
    * (O(tokens²) per document — measured 10s for 5k docs before the
    * rewrite); zip_with lambdas touch only their own arguments, so this
    * version is linear.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    val len = size(t) - (n - 1)
    val parts = (0 until n).map(j => slice(t, lit(j + 1), len))
    val joined = parts.reduceLeft((acc, next) =>
      zip_with(acc, next, (a, b) => concat(a, lit(" "), b)))
    when(size(t) >= n, array_distinct(joined))
      .otherwise(array().cast("array<string>"))
  }

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
