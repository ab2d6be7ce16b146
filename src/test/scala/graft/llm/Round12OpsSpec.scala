package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 pins. d25: the rolling-hash substring dedup must be a pure
  * shuffle-key swap — identical output to the string-keyed d16 form on
  * real corpora (collisions are ≈n²/2⁵³ and would reproduce identically
  * in the DuckDB oracle anyway, so any divergence here is a bug, not a
  * collision).
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("removeDuplicateSpansHashed ≡ removeDuplicateSpans on the documents corpus") {
    val str = Dedup.removeDuplicateSpans(docs, k = 8).orderBy("doc_id").collect()
    val hsh = Dedup.removeDuplicateSpansHashed(docs, k = 8).orderBy("doc_id").collect()
    assert(hsh.toSeq == str.toSeq,
      "hashed shuffle key must not change keep-first span semantics")
  }

  test("removeDuplicateSpansHashed: keep-first, hand-computed (d16 twin case)") {
    val in = Seq(
      (1L, "a b c d x y z q"),
      (2L, "p q r a b c d w"),
      (3L, "u v w only here")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpansHashed(in, k = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 0, "a b c d x y z q"),
      (2L, 4, "p q r w"),
      (3L, 0, "u v w only here")))
  }

  test("removeDuplicateSpansHashed: within-doc repeat keeps only the first copy") {
    val in = Seq((1L, "m n o x m n o")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpansHashed(in, k = 3).collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((3, "m n o x")))
  }
}
