package graft.functions

import graft.SparkSpec
import graft.llm.TextFns
import org.apache.spark.sql.functions._

/** The narrow-map simhash64 expression must be bit-identical to the
  * explode + 64-conditional-sum aggregation it replaced, and its plan must
  * actually be shuffle-free.
  */
class SimhashSpec extends SparkSpec {

  test("bit-identical to the explode/groupBy aggregation on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def fold(base: Int, mod: Long) = aggregate(
      transform(split(col("token"), ""), c => ascii(c).cast("long")),
      lit(0L), (h, c) => (h * base + c) % mod)
    val tok = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      .withColumn("h",
        fold(31, SimhashFns.P1) * lit(4294967296L) + fold(131, SimhashFns.P2))
    val bitSums = (0 until 64).map(k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$k"))
    val assembled = (0 until 64).map(k =>
      when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), assembled.as("agg_simhash"))
    val native = docs.select(col("doc_id"),
      SimhashFns.simhash64(TextFns.tokens(col("text"))).as("n_simhash"))
    val mismatches = native.join(agg, Seq("doc_id"))
      .filter(col("n_simhash") =!= col("agg_simhash")).count()
    assert(mismatches == 0)
    assert(native.count() == docs.count())
  }

  test("simhash plan is a narrow map — no exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.llm.Dedup.simhash(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"simhash should not shuffle:\n$plan")
  }
}
