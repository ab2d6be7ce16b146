package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE vocabulary learning (Sennrich et al. 2016): hand-computed merge
  * sequences, greedy-fold semantics, vocabulary-cache tokenization, and
  * the scale-shape pins (corpus aggregates once; iterations are
  * vocab-sized; tokenization is a broadcast join, not a corpus fold).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("char split has no phantom empty symbols") {
    val syms = Seq("abc").toDF("word")
      .select(split(col("word"), "").as("s"))
      .as[Seq[String]].head()
    assert(syms == Seq("a", "b", "c"), s"got $syms")
  }

  test("train: hand-computed merge sequence") {
    // corpus: "low low low lower" → vocab {low:3, lower:1}
    // pairs r1: (l,o):4 (o,w):4 (w,e):1 (e,r):1 → tie (l,o)/(o,w) at 4
    //   → lexicographic tie-break picks (l,o)
    // r2: (lo,w):4 (w,e):1 (e,r):1 → (lo,w)
    // r3: low:3 has no pairs; lower: (low,e):1 (e,r):1 → (e,r)
    val docs = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val model = Bpe.train(docs, numMerges = 3)
    val got = model.merges.map(m => (m.mergeRank, m.lhs, m.rhs, m.pairCount))
    assert(got == Seq((1, "l", "o", 4L), (2, "lo", "w", 4L), (3, "e", "r", 1L)),
      s"got $got")
  }

  test("applyMerge: greedy left-to-right, non-overlapping") {
    val out = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("b", "a", "a"))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("aa", "a"), Seq("aa", "aa"), Seq("b", "aa")), s"got $out")
  }

  test("train stops early when every word is one symbol") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(docs, numMerges = 10)
    assert(model.merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")),
      "only one merge is learnable from a single 2-char word")
  }

  test("tokenCounts: vocabulary cache reproduces per-word merge application") {
    val docs = Seq((1L, "low lower low"), (2L, "newest")).toDF("doc_id", "text")
    val model = Bpe.train(docs, numMerges = 4)
    val counts = Bpe.tokenCounts(docs, model)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every corpus word is in the vocab; symbol totals must equal the sum of
    // the trained per-word symbol lengths
    val vocabLens = model.vocab
      .select(col("word"), size(col("syms")).cast("long").as("len"))
      .as[(String, Long)].collect().toMap
    def docLen(words: String*) = words.map(vocabLens).sum
    assert(counts(0) == ((1L, docLen("low", "lower", "low"), 3L)))
    assert(counts(1) == ((2L, docLen("newest"), 1L)))
  }

  test("tokenCounts: unseen words degrade to character symbols") {
    val train = Seq((1L, "low low")).toDF("doc_id", "text")
    val model = Bpe.train(train, numMerges = 2)
    val other = Seq((9L, "xyz")).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(other, model).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((9L, 3L, 1L)), s"got $got")
  }

  test("train is deterministic under repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(docs, numMerges = 5).merges
    val b = Bpe.train(docs.repartition(13), numMerges = 5).merges
    assert(a == b, "merge sequence is a pure function of the corpus")
  }

  // -------------------------------------------- batched rounds (VERDICT r11 #4)

  private def modelSignature(m: Bpe.Model) = (
    m.merges,
    m.vocab.orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).toSeq)

  test("trainBatched(batch=1) ≡ train bit-for-bit (merges AND final vocab)") {
    val docs = Seq((1L, "low low low lower"), (2L, "newest widest low")).toDF("doc_id", "text")
    assert(modelSignature(Bpe.trainBatched(docs, numMerges = 6, batch = 1))
      == modelSignature(Bpe.train(docs, numMerges = 6)))
  }

  test("trainBatched ≡ train at every batch width (the exactness guard)") {
    val docs = Seq(
      (1L, "low low low lower"),
      (2L, "newest widest lowest"),
      (3L, "he she the then them")).toDF("doc_id", "text")
    val seqSig = modelSignature(Bpe.train(docs, numMerges = 8))
    for (b <- Seq(2, 4, 8, 16))
      assert(modelSignature(Bpe.trainBatched(docs, numMerges = 8, batch = b)) == seqSig,
        s"batch=$b diverged from the sequential merge sequence")
  }

  test("trainBatched ≡ train on the real corpus, with measured round reduction") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val seqModel = Bpe.train(docs, numMerges = 10)
    val (batched, rounds) = Bpe.trainBatchedCounted(docs, numMerges = 10, batch = 8)
    assert(batched.merges == seqModel.merges,
      "batched merge sequence must be bit-identical to sequential")
    assert(rounds < 10,
      s"batching must cut driver round-trips below one-per-merge, got $rounds/10")
    info(s"rounds=$rounds for 10 merges (jobs/merge = ${rounds / 10.0})")
  }

  test("applyMerges on disjoint pairs ≡ sequential applyMerge composition") {
    val words = Seq(
      Seq("a", "b", "c", "d"), Seq("a", "b", "a", "b"),
      Seq("c", "d", "a", "b", "x"), Seq("a", "a", "b", "b"),
      Seq("x", "c", "d", "c", "d")).toDF("syms")
    val batched = words.select(
        Bpe.applyMerges(col("syms"), Seq(("a", "b"), ("c", "d"))).as("m"))
      .as[Seq[String]].collect().toSeq
    val sequential = words.select(
        Bpe.applyMerge(Bpe.applyMerge(col("syms"), "a", "b"), "c", "d").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(batched == sequential)
  }

  test("tokenization plans as a broadcast join, not a corpus merge fold") {
    val docs = Seq((1L, "low lower")).toDF("doc_id", "text")
    val model = Bpe.train(docs, numMerges = 2)
    val plan = Bpe.tokenCounts(docs, model).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"vocab cache must broadcast:\n$plan")
    assert(!plan.contains("aggregate("),
      s"the corpus side must not run the merge fold:\n$plan")
  }
}
