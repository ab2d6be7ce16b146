package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 pins: the kmeans-trained PQ codebooks are the REGISTERED
  * serving config for s08/s09/s10 (VERDICT r10 #3) — so training must be
  * reproducible, bounded, and flow through the persisted index unchanged.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private val TwinOffset = 1000000L

  private lazy val corpus =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pqCodebooksKMeans is deterministic: two fits yield identical books") {
    val a = Similarity.pqCodebooksKMeans(corpus, kCent = 8, maxIter = 5)
    val b = Similarity.pqCodebooksKMeans(corpus, kCent = 8, maxIter = 5)
    assert(a == b, "trained codebooks must be bit-reproducible (fixed seed + sample)")
  }

  test("fit sample is bounded: training cost independent of corpus size") {
    // a 64-row cap must train valid rectangular books on the same corpus
    val books = Similarity.pqCodebooksKMeans(corpus, kCent = 8, maxIter = 3,
      fitSampleRows = 64)
    assert(books.length == Similarity.PqSubspaces)
    assert(books.forall(_.length == 8))
    val dsub = books.head.head.length
    assert(books.forall(_.forall(_.length == dsub)))
  }

  test("trained books round-trip the persisted IVF-PQ index byte-exactly") {
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val trained = Similarity.pqCodebooksKMeans(corpus, kCent = 8, maxIter = 5)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-trained")
    try {
      Similarity.writeIvfPqIndex(corpus, idxDir.toString, kCent = 8,
        booksIn = Some(trained))
      val handle = new Similarity.IvfPqIndexHandle(spark, idxDir.toString)
      assert(handle.books == trained, "stored codebooks must equal the trained ones")
      val served = Similarity.ivfPqTopKFromIndex(
        corpus.filter(pred), idxDir.toString, k = 10, nProbe = 8,
        rerankAgainst = Some(corpus))
        .orderBy("query_id", "rank").collect()
      val inMem = Similarity.ivfPqTopKWith(corpus,
        Similarity.ivfCentroids(corpus), trained, pred, k = 10, nProbe = 8)
        .orderBy("query_id", "rank").collect()
      assert(served.toSeq == inMem.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  // ----------------------------- exact-substring dedup (d15/d16, Lee 2022)

  test("duplicateSpans: marks maximal duplicated runs, hand-computed") {
    // k=3; "a b c d" appears in docs 1 and 2 → shingles "a b c" (pos 1) and
    // "b c d" (pos 2) both duplicated; doc 3 repeats "u v w" within itself
    val docs = Seq(
      (1L, "a b c d x y z q"),
      (2L, "p q r a b c d w"),
      (3L, "u v w x u v w")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, k = 3).orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    // doc1: marks at pos 1,2 → covered tokens 1..4; doc2: marks at 4,5 → 4..7;
    // doc3: within-doc "u v w" at pos 1 and 5 (gap 4 > k) → two spans
    assert(got == Seq((1L, 1, 4, 4), (2L, 4, 7, 4), (3L, 1, 3, 3), (3L, 5, 7, 3)))
  }

  test("duplicateSpans: within-doc repeats qualify; touching ranges merge; gaps split") {
    // doc 1 repeats "m n o" at pos 1 and pos 7 (gap 6 > k=3 → two spans);
    // marks at pos 1 and 4 (gap 3 = k) produce contiguous coverage → merge
    val docs = Seq(
      (1L, "m n o x y z m n o"),
      (2L, "c1 c2 c3 f c1 c2 c3 t1 t2 t3"),
      (3L, "t1 t2 t3 c1 c2 c3 z9")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, k = 3).orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    // doc1: marks 1 and 7 → spans [1,3] and [7,9]
    // doc2: "c1 c2 c3" dup (pos 1, 5) + "t1 t2 t3" dup (pos 8) → marks 1,5,8:
    //   gap(1→5)=4 > 3 → split; gap(5→8)=3 = k → merge → spans [1,3],[5,10]
    // doc3: marks 1 ("t1 t2 t3") and 4 ("c1 c2 c3") → gap 3 = k → one span [1,6]
    assert(got == Seq(
      (1L, 1, 3, 3), (1L, 7, 9, 3),
      (2L, 1, 3, 3), (2L, 5, 10, 6),
      (3L, 1, 6, 6)))
  }

  test("removeDuplicateSpans: keep-first, redundant occurrences dropped, clean text ordered") {
    val docs = Seq(
      (1L, "a b c d x y z q"),
      (2L, "p q r a b c d w"),
      (3L, "u v w only here")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, k = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    // doc1 holds the first occurrences (doc_id 1 < 2) → untouched;
    // doc2's "a b c d" (tokens 4..7) is redundant → removed
    assert(got == Seq(
      (1L, 0, "a b c d x y z q"),
      (2L, 4, "p q r w"),
      (3L, 0, "u v w only here")))
  }

  test("removeDuplicateSpans: within-doc repeat keeps only the first copy") {
    val docs = Seq((1L, "m n o x m n o")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, k = 3).collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((3, "m n o x")))
  }

  test("duplicateSpans: docs shorter than k contribute nothing; empty corpus-dup set → no rows") {
    val docs = Seq((1L, "a b"), (2L, "c d e f")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(docs, k = 3).count() == 0)
    val clean = Dedup.removeDuplicateSpans(docs, k = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(clean == Seq((1L, 0, "a b"), (2L, 0, "c d e f")))
  }

  test("duplicateSpans plan: no single-task window (doc_id-partitioned only)") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val plan = Dedup.duplicateSpans(docs, k = 3).queryExecution.sparkPlan
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, "coverage window must partition by doc_id")
  }

  // ------------------------------------------------ PCA reduction (s13)

  test("pcaFit: components are orthonormal, variance-ordered, deterministic") {
    val m1 = Similarity.pcaFit(corpus, k = 8)
    val m2 = Similarity.pcaFit(corpus, k = 8)
    assert(m1 == m2, "PCA fit must be bit-reproducible")
    // orthonormal
    for (i <- m1.components.indices; j <- i until m1.components.size) {
      val dot = m1.components(i).iterator.zip(m1.components(j).iterator)
        .map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"<w$i, w$j> = $dot")
    }
    // eigenvalues sorted descending and non-negative
    assert(m1.eigenvalues == m1.eigenvalues.sortBy(-_))
    assert(m1.eigenvalues.forall(_ >= -1e-12))
  }

  test("pcaFit recovers a planted dominant direction") {
    // points along (1, 1, 0, ..., 0)/√2 with tiny isotropic noise-free spread
    val d = 8
    val rows = (0 until 200).map { i =>
      val t = (i - 100).toDouble / 10.0
      val v = Array.fill(d)(0.0f)
      v(0) = (t / math.sqrt(2)).toFloat; v(1) = (t / math.sqrt(2)).toFloat
      v(2) = (i % 3 - 1).toFloat * 0.01f // tiny second direction
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Similarity.pcaFit(df, k = 2)
    val w0 = m.components.head
    assert(math.abs(math.abs(w0(0)) - 1 / math.sqrt(2)) < 1e-3 &&
      math.abs(math.abs(w0(1)) - 1 / math.sqrt(2)) < 1e-3,
      s"dominant component should be the planted diagonal: $w0")
    assert(m.eigenvalues.head > 100 * m.eigenvalues(1),
      s"variance ordering: ${m.eigenvalues}")
  }

  test("pcaProject is a narrow map and pcaTopKReranked recovers planted twins") {
    val base = corpus.select("vec_id", "embedding")
    val twins = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + TwinOffset).as("vec_id"), col("embedding"))
    val planted = base.unionByName(twins)
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val model = Similarity.pcaFit(planted, k = 16)
    val projPlan = planted.select(Similarity.pcaProject(col("embedding"), model))
      .queryExecution.executedPlan.toString
    assert(!projPlan.contains("Exchange"), s"projection must be narrow:\n$projPlan")
    val top1 = Similarity.pcaTopKReranked(planted, pred, k = 10, pcaDims = 16)
      .filter(col("rank") === 1)
    val hits = top1.filter(col("neighbor_id") === col("query_id") + TwinOffset).count()
    assert(hits == top1.count(),
      "every query's exact twin must surface at rank 1 after the exact re-rank")
  }

  // --------------------------------- sign-bit binary quantization (s17)

  test("binaryQuantize: hand-computed sign bits, one long per vector") {
    // dims 0 and 2 positive → bits 0 and 2; zero is NOT positive
    val v = Array.fill(64)(-1.0f)
    v(0) = 2.5f; v(2) = 0.1f; v(5) = 0.0f
    val got = Seq((7L, v.toSeq)).toDF("vec_id", "embedding")
    val code = Similarity.binaryQuantize(got).head().getLong(1)
    assert(code == ((1L << 0) | (1L << 2)), s"got bits ${code.toBinaryString}")
    // all-positive vector sets every bit including the sign bit (no
    // overflow trap under ANSI — the fold is | over shiftleft, not acc·2)
    val all = Seq((8L, Array.fill(64)(1.0f).toSeq)).toDF("vec_id", "embedding")
    assert(Similarity.binaryQuantize(all).head().getLong(1) == -1L)
  }

  test("binaryQuantize is a narrow map; knnBinaryReranked recovers planted twins") {
    val base = corpus.select("vec_id", "embedding")
    val plan = Similarity.binaryQuantize(base)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must be narrow:\n$plan")
    val twins = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + TwinOffset).as("vec_id"), col("embedding"))
    val planted = base.unionByName(twins)
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val top1 = Similarity.knnBinaryReranked(planted, pred, k = 10)
      .filter(col("rank") === 1)
    val hits = top1.filter(col("neighbor_id") === col("query_id") + TwinOffset).count()
    assert(hits == top1.count(),
      "an identical twin has Hamming 0 — it must survive the shortlist and win the re-rank")
  }

  test("knnBinaryReranked is deterministic under repartitioning") {
    val pred = col("vec_id") % 100 === 0
    val a = Similarity.knnBinaryReranked(corpus, pred, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val b = Similarity.knnBinaryReranked(corpus.repartition(13), pred, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
  }

  // ------------------------------------- event transitions (e17, Markov)

  test("eventTransitions: per-user ordered pairs, counts and probabilities") {
    val ev = Seq(
      (1L, 101L, "view", "2026-01-01 10:00:00"),
      (1L, 102L, "cart", "2026-01-01 10:05:00"),
      (1L, 103L, "buy", "2026-01-01 10:10:00"),
      (2L, 201L, "view", "2026-01-01 11:00:00"),
      (2L, 202L, "view", "2026-01-01 11:05:00"),
      (2L, 203L, "cart", "2026-01-01 11:10:00"))
      .toDF("user_id", "event_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Events.eventTransitions(ev).orderBy("prev_type", "next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // user1: view→cart, cart→buy; user2: view→view, view→cart
    // view→cart 2, view→view 1 (p 2/3, 1/3); cart→buy 1 (p 1.0)
    assert(got == Seq(
      ("cart", "buy", 1L, 1.0),
      ("view", "cart", 2L, 2.0 / 3.0),
      ("view", "view", 1L, 1.0 / 3.0)))
  }

  // ------------------------------------------ line dedup (d17, Dolma/CCNet)

  test("dedupLines: keep-first across docs, within-doc repeats, untouched docs") {
    val docs = Seq(
      (1L, "alpha\nshared line\nbeta"),
      (2L, "shared line\ngamma\nshared line"),
      (3L, "unique one\nunique two")).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    // "shared line" first occurs at (1,2) → doc2 loses both its copies
    assert(got == Seq(
      (1L, 0, "alpha\nshared line\nbeta"),
      (2L, 2, "gamma"),
      (3L, 0, "unique one\nunique two")))
  }

  test("dedupLines: trailing empty lines dedup like any line (split keeps them)") {
    val docs = Seq(
      (1L, "a\n"),   // lines: "a", ""
      (2L, "b\n")).toDF("doc_id", "text") // lines: "b", "" (dup of doc1's)
    val got = Dedup.dedupLines(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 0, "a\n"), (2L, 1, "b")))
  }

  // --------------------------- stupid backoff cross-corpus scoring (x24)

  test("stupidBackoffScore: all three tiers, hand-computed") {
    // model "a b a c": bigrams {a b:1, b a:1, a c:1}, ctx {a:2, b:1},
    // unigrams {a:2, b:1, c:1}, N=4
    val model = Seq((10L, "a b a c")).toDF("doc_id", "text")
    val scored = Seq(
      (1L, "a b q"),  // "a b" in-model: ln(2/1); "b q": q OOV → ln(2.5·4)
      (2L, "x a"))    // "x a": bg absent, a in vocab (n=2) → ln(2.5·4/2)
      .toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffScore(scored, model).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ln2 = BigDecimal(math.log(2.0)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val ln10 = BigDecimal(math.log(10.0)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val ln5 = BigDecimal(math.log(5.0)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val d1 = ((ln2 + ln10) / 2).toDouble
    assert(got == Seq(
      (1L, 2L, BigDecimal(d1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (2L, 1L, ln5.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("stupidBackoffScore: in-model text scores below shuffled-OOV text") {
    val model = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (12L, "the quick brown fox runs under the old tree")).toDF("doc_id", "text")
    val scored = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "zq wv kx the pf brown mm fox yy")).toDF("doc_id", "text")
    val m = TextAnalysis.stupidBackoffScore(scored, model).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(m(1L) < m(3L), s"fluent text must score lower surprisal: $m")
  }

  test("stupidBackoffScore: raw text never shuffles; model count frame materializes once") {
    val model = Seq((10L, "a b c")).toDF("doc_id", "text")
    val scored = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = TextAnalysis.stupidBackoffScore(scored, model)
      .queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      "raw text must never shuffle")
    assert(plan.contains("ExistingRDD"), "expected the materialized model count frame")
  }

  // --------------------------------------------- gopherLineRules (x23)

  test("gopherLineRules: bullet/ellipsis fractions and verdicts, hand-computed") {
    val docs = Seq(
      (1L, "plain one\nplain two"),                        // 2 lines, clean
      (2L, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"), // 10/10 bullets
      (3L, "head\n- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i"), // 9/10 = 0.9 boundary
      (4L, "x...\ny...\nz...\nw...\na\nb\nc\nd\ne\nf"),    // 4/10 ellipsis > 0.3
      (5L, "x...\ny...\nz...\na\nb\nc\nd\ne\nf\ng"),       // 3/10 = 0.3 boundary
      (6L, "  • indented\n\t- tabbed\nends…\n* star\nplain"), // unicode forms
      (7L, "trailing newline\n"),                          // empty last line counts
      (8L, "-nospace\nmid - dash\ntwo dots ..\ndots ... middle"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherLineRules(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getBoolean(6), r.getBoolean(7), r.getBoolean(8))).toSeq
    assert(out == Seq(
      (1L, 2, 0, 0, true, true, true),
      (2L, 10, 10, 0, false, true, false),   // 1.0 > 0.9 → removed
      (3L, 10, 9, 0, true, true, true),      // exactly 0.9 → kept
      (4L, 10, 0, 4, true, false, false),    // 0.4 > 0.3 → removed
      (5L, 10, 0, 3, true, true, true),      // exactly 0.3 → kept
      (6L, 5, 3, 1, true, true, true),       // •/tab/−/* markers, … ending
      (7L, 2, 0, 0, true, true, true),       // split keeps the trailing empty
      (8L, 4, 0, 0, true, true, true)))      // near-miss markers don't count
  }

  test("gopherLineRules plans as a narrow map: no exchange, no window") {
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = TextAnalysis.gopherLineRules(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line rules must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"line rules must not window:\n$plan")
  }

  test("DSIR: target == raw yields exactly zero log-weight for every doc") {
    // identical distributions → per-bucket counts equal → both quantized
    // lns identical → lnr = 0 exactly; any nonzero means the two model
    // passes diverged (hashing, smoothing, or accumulation asymmetry)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = TextAnalysis.dsirWeights(docs, docs, buckets = 256)
    assert(w.count() == docs.count())
    assert(w.filter(col("dsir_logw") =!= 0.0).isEmpty,
      "self-referential DSIR must be identically zero")
  }

  test("DSIR: a disjoint-vocabulary target pushes every raw doc's weight negative") {
    val raw = Seq((1L, "aa bb cc dd"), (2L, "bb cc dd ee")).toDF("doc_id", "text")
    val tgt = Seq((10L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(raw, tgt, buckets = 64)
      .collect().map(_.getAs[Double]("dsir_logw"))
    assert(w.length == 2 && w.forall(_ < 0.0),
      "raw tokens absent from the target must be downweighted")
  }

  test("poly_hash: native expression matches the HOF fold bit-for-bit (incl. unicode)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq(
        (100001L, ""),                   // empty: both sides yield 0
        (100002L, "héllo wörld"),        // 2-byte code points
        (100003L, "a😀b"))     // surrogate pair stays one code point
        .toDF("doc_id", "text"))
    val m = TextAnalysis.RollMod
    val hof = docs.select(col("doc_id"),
      aggregate(
        transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L), (h, c) => (h * 31 + c) % m).as("h_hof"))
    val native = docs.select(col("doc_id"),
      graft.functions.PolyHashFns.polyHash(col("text"), m).as("h_nat"))
    val joined = hof.join(native, "doc_id")
    assert(joined.filter(col("h_hof") =!= col("h_nat")).isEmpty,
      "native poly_hash must reproduce the relational fold exactly")
    // and the native form keeps the projection inside whole-stage codegen
    // (the "*(n)" prefix in the compact plan) — the HOF fold is
    // CodegenFallback and breaks the span
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("poly_hash") && l.contains("*(")),
      s"poly_hash projection not in a codegen span:\n$plan")
  }

  test("DSIR fit/serve: narrow scoring reproduces the fused path bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = docs.filter(col("lang") === "en")
    val lut = TextAnalysis.dsirModelLut(docs, target, buckets = 1024)
    assert(lut.length == 1024)
    val narrow = TextAnalysis.dsirScoreNarrow(docs, lut)
    val fused = TextAnalysis.dsirWeights(docs, target, buckets = 1024)
    assert(narrow.orderBy("doc_id").collect().toSeq ==
      fused.orderBy("doc_id").collect().toSeq,
      "driver-fit LUT + narrow fold must equal the in-cluster LUT join exactly")
    // the serving plan is a pure narrow map: zero exchanges at any scale
    val plan = narrow.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow DSIR serve plans a shuffle:\n$plan")
  }

  test("BM25 fit/serve: narrow scoring reproduces the fused path bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("spark", "join", "window", "shuffle")
    val model = TextAnalysis.bm25Fit(docs, terms)
    val narrow = TextAnalysis.bm25ScoreNarrow(docs, model)
    val fused = TextAnalysis.bm25Score(docs, terms)
    assert(narrow.orderBy("doc_id").collect().toSeq ==
      fused.orderBy("doc_id").collect().toSeq,
      "driver-fit IDFs + per-term narrow counts must equal the fused path exactly")
    val plan = narrow.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow BM25 serve plans a shuffle:\n$plan")
  }

  test("trained books recover planted twins at rank 1 through the re-rank") {
    val base = corpus.select("vec_id", "embedding")
    val twins = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + TwinOffset).as("vec_id"), col("embedding"))
    val planted = base.unionByName(twins)
    val pred = col("vec_id") % 50 === 0 && col("vec_id") < TwinOffset
    val books = Similarity.pqCodebooksKMeans(planted, kCent = 8, maxIter = 5)
    val top1 = Similarity.pqTopKRerankedWith(planted, books, pred, k = 10)
      .filter(col("rank") === 1)
    val hits = top1.filter(col("neighbor_id") === col("query_id") + TwinOffset).count()
    assert(hits == top1.count(),
      "every query's exact twin must surface at rank 1 after the exact re-rank")
  }
}
