package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** word_shingles must produce byte-identical arrays (values AND order) to
  * the slice+zip_with+array_distinct HOF formulation it replaced.
  */
class WordShinglesSpec extends SparkSpec {

  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val t = split(lower(text), "\\s+")
    val len = size(t) - (n - 1)
    val parts = (0 until n).map(j => slice(t, lit(j + 1), len))
    val joined = parts.reduceLeft((acc, next) =>
      zip_with(acc, next, (a, b) => concat(a, lit(" "), b)))
    when(size(t) >= n, array_distinct(joined))
      .otherwise(array().cast("array<string>"))
  }

  test("byte-identical to the HOF formulation on real documents (n=2 and n=3)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(2, 3).foreach { n =>
      val mismatches = docs
        .select(ShingleFns.wordShingles(col("text"), n).as("native"),
          hofShingles(col("text"), n).as("hof"))
        .filter(!(col("native") <=> col("hof")))
        .count()
      assert(mismatches == 0, s"n=$n")
    }
  }

  test("edge cases: short docs, repeated shingles, whitespace runs, null") {
    val df = spark.sql(
      """SELECT * FROM VALUES
         ('one two'),
         ('a b c a b c a b c'),
         ('  leading   and   internal   runs  '),
         (CAST(null AS STRING))
         AS t(text)""")
    val got = df.select(ShingleFns.wordShingles(col("text"), 3).as("native"),
      col("text")).collect()
    val short = got.find(r => r.getString(1) == "one two").get
    assert(short.getSeq[String](0).isEmpty)
    val rep = got.find(r => r.getString(1) == "a b c a b c a b c").get
    // 7 trigram positions but only 3 distinct shingles, first-occurrence order
    assert(rep.getSeq[String](0) == Seq("a b c", "b c a", "c a b"))
    val nul = got.find(_.isNullAt(1)).get
    assert(nul.isNullAt(0))
  }
}
