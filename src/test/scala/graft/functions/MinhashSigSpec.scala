package graft.functions

import graft.SparkSpec
import graft.llm.{Dedup, TextFns}
import org.apache.spark.sql.functions._

/** The fused minhash_sig expression must be bit-identical to the
  * transform/array_min HOF formulation of the same portable family (same
  * poly-fold base hash, same per-seed affine map, same null rule).
  */
class MinhashSigSpec extends SparkSpec {

  private val K = Dedup.MinhashBands * Dedup.MinhashRows

  test("bit-identical to the HOF formulation on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def fold(tok: org.apache.spark.sql.Column, base: Int, mod: Long) = aggregate(
      transform(split(tok, ""), c => ascii(c).cast("long")),
      lit(0L), (h, c) => (h * base + c) % mod)
    val hofSig = (0 until K).map { s =>
      array_min(transform(col("hs"),
        h => (lit(MinhashFns.seedA(s)) * h + lit(MinhashFns.seedB(s))) % MinhashFns.P))
    }
    val mismatches = docs
      .select(col("doc_id"), TextFns.shingles(col("text")).as("sh"))
      .withColumn("hs", transform(col("sh"), x =>
        (fold(x, 31, SimhashFns.P1) * lit(4294967296L) + fold(x, 131, SimhashFns.P2))
          % MinhashFns.P))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        MinhashFns.minhashSig(col("sh"), K).as("native"),
        array(hofSig: _*).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    assert(mismatches == 0)
  }

  test("null and empty shingle arrays yield null signatures") {
    val df = spark.sql("SELECT cast(null as array<string>) AS a, array() AS b")
      .select(MinhashFns.minhashSig(col("a"), 4).as("na"),
        MinhashFns.minhashSig(col("b").cast("array<string>"), 4).as("nb"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("signature length is k and values depend on content") {
    val df = spark.sql(
      "SELECT array('a b c', 'b c d') AS s1, array('x y z', 'y z w') AS s2")
      .select(MinhashFns.minhashSig(col("s1"), 8).as("g1"),
        MinhashFns.minhashSig(col("s2"), 8).as("g2"))
    val r = df.collect()(0)
    assert(r.getSeq[Long](0).length == 8)
    assert(r.getSeq[Long](0) != r.getSeq[Long](1))
  }
}
