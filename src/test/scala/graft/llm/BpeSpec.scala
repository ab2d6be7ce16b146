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

  // ---------------------- batch-admission guard (ADVICE r12 #1 + VERDICT r12 #3)

  test("selectBatch: concatenation collision with a pre-existing symbol ends the batch") {
    // The ADVICE r12 scenario: (a,bc) ranked first, (abc,d) next, with
    // "abc" already a symbol (minted by an earlier (ab,c) merge). String
    // disjointness alone admits both — but applying (a,bc) mints new
    // "abc" occurrences, so (abc,d)'s collected count is stale-low and
    // the threat scan (which keys on component overlap) never sees it.
    // The guard must accept (a,bc) and STOP.
    val top = IndexedSeq(("a", "bc", 100L), ("abc", "d", 90L), ("x", "y", 10L))
    val got = Bpe.selectBatch(top, want = 3, truncated = false,
      everCreated = Set("bc", "abc", "ab"))
    assert(got == Seq(("a", "bc", 100L)),
      s"batch must end at the colliding concatenation, got $got")
  }

  test("selectBatch: duplicate concatenation within one batch ends it at the second mint") {
    // (a,bc) and (ab,c) both mint "abc": each admission bound is sound in
    // isolation, but a symbol fed by TWO merges can push a created pair
    // past any single threat bound — accept the second, then stop.
    val top = IndexedSeq(
      ("a", "bc", 100L), ("ab", "c", 90L), ("x", "y", 80L), ("p", "q", 10L))
    val got = Bpe.selectBatch(top, want = 4, truncated = false,
      everCreated = Set("ab", "bc"))
    assert(got == Seq(("a", "bc", 100L), ("ab", "c", 90L)),
      s"duplicate mint must close the batch, got $got")
  }

  test("selectBatch: a candidate whose components were minted this batch stops the batch") {
    // (abc,d) after (a,bc) in the SAME slice: its collected count predates
    // the "abc" mints, so ranking against it is meaningless.
    val top = IndexedSeq(("a", "bc", 100L), ("abc", "d", 90L))
    val got = Bpe.selectBatch(top, want = 2, truncated = false,
      everCreated = Set("bc"))
    assert(got == Seq(("a", "bc", 100L)), s"got $got")
  }

  test("selectBatch: a candidate equal to an earlier pick's component + fold hazard stops") {
    // (abc,d) picked first, then (a,bc) whose concatenation "abc" IS an
    // earlier pick's component: the left-to-right fold would let (abc,d)
    // consume adjacencies (a,bc) mints mid-pass ("a bc d" → "abcd" in one
    // pass vs sequential "abc d").
    val top = IndexedSeq(("abc", "d", 100L), ("a", "bc", 90L), ("x", "y", 1L))
    val got = Bpe.selectBatch(top, want = 3, truncated = false,
      everCreated = Set("ab", "abc", "bc"))
    assert(got == Seq(("abc", "d", 100L)), s"got $got")
  }

  test("selectBatch: fully conflicting slice degenerates to one merge (sequential)") {
    // VERDICT r12 #3's degenerate case: every later candidate shares a
    // symbol with the head — the batch is exactly the sequential argmax.
    val top = IndexedSeq(
      ("a", "b", 100L), ("b", "c", 90L), ("c", "a", 80L), ("a", "a", 70L))
    val got = Bpe.selectBatch(top, want = 4, truncated = false,
      everCreated = Set.empty[String])
    assert(got == Seq(("a", "b", 100L)), s"got $got")
  }

  test("selectBatch: threat from a shared-symbol successor blocks, unrelated pairs pass") {
    // (x,y) at 50 would be admitted after (a,b) — but (b,z) at 60 shares
    // b with the batch and outranks it, so (x,y) must NOT be admitted
    // (sequential round 2 might pick a risen b-pair instead).
    val blocked = Bpe.selectBatch(
      IndexedSeq(("a", "b", 100L), ("x", "y", 50L), ("b", "z", 60L)),
      want = 3, truncated = false, everCreated = Set.empty[String])
    assert(blocked == Seq(("a", "b", 100L)), s"got $blocked")
    val admitted = Bpe.selectBatch(
      IndexedSeq(("a", "b", 100L), ("x", "y", 50L), ("b", "z", 40L)),
      want = 3, truncated = false, everCreated = Set.empty[String])
    assert(admitted == Seq(("a", "b", 100L), ("x", "y", 50L)), s"got $admitted")
  }

  test("selectBatch: truncated slice bounds unseen pairs by the horizon count") {
    // truncated=true → pairs below the collect horizon may hold up to the
    // last collected count (30); (x,y) at 50 > 30 still passes, (p,q) at
    // 25 ≤ 30 must not.
    val top = IndexedSeq(
      ("a", "b", 100L), ("x", "y", 50L), ("p", "q", 25L), ("m", "n", 30L))
    val got = Bpe.selectBatch(top, want = 4, truncated = true,
      everCreated = Set.empty[String])
    assert(got == Seq(("a", "b", 100L), ("x", "y", 50L)), s"got $got")
  }

  test("trainBatched ≡ train on overlap-heavy corpora (greedy-steal adversarial family)") {
    // Runs of repeated chars + alternations maximize overlapping-adjacency
    // and mint-cascade pressure — the corpus family where a batched-round
    // bug would surface as a hash divergence from sequential training.
    val docs = Seq(
      (1L, "aaa aaaa aaaaa aaaaaa aab abab ababab"),
      (2L, "bbc bbbc bbbbc bbbbbc bcbc abc aabc"),
      (3L, "aaab baab abba aabb bbaa abab baba"),
      (4L, "xyxy xxyy xyyx yxxy xyx yxy")).toDF("doc_id", "text")
    val seqSig = modelSignature(Bpe.train(docs, numMerges = 14))
    for (b <- Seq(2, 3, 5, 8, 32))
      assert(modelSignature(Bpe.trainBatched(docs, numMerges = 14, batch = b)) == seqSig,
        s"batch=$b diverged from sequential on the adversarial corpus")
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
