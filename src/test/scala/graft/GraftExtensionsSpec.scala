package graft

import org.apache.spark.sql.functions._

/** Every custom expression must be reachable from plain Spark SQL through
  * the session extension — the contract that makes the engine installable
  * on any cluster via spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("all injected functions resolve and compute from SQL") {
    val r = spark.sql(
      """SELECT
         py_title("o'brien-smith 2x llc") AS t,
         vec_dot(array(cast(1.5 as float), cast(2.0 as float)),
                 array(cast(2.0 as float), cast(3.0 as float))) AS d,
         minhash_sig(array('a b c', 'b c d'), 4) AS m,
         simhash64(array('the', 'quick', 'fox')) AS s,
         word_shingles('The quick brown fox jumps', 3) AS w,
         poly_hash('ab', 9007199254740881L) AS p""").collect()(0)
    assert(r.getString(0) == "O'Brien-Smith 2X Llc")
    assert(r.getDouble(1) == 9.0)
    assert(r.getSeq[Long](2).length == 4)
    assert(r.getLong(3) != 0L)
    assert(r.getSeq[String](4) ==
      Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    assert(r.getLong(5) == ('a'.toLong * 31 + 'b'.toLong))
  }

  test("non-literal k for minhash_sig is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), cast(rand() * 4 AS int))").collect()
    }
    assert(e.getMessage.contains("literal integer"))
  }
}
