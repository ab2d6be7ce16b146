package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 fourth-pass operators: the Gopher quality-rule battery (x21),
  * Bloom-pre-filtered incremental exact dedup (d14), and per-user
  * inter-arrival statistics (e14).
  */
class Round10dOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- gopherRules

  private val fiftyGood =
    (Seq("the", "a", "and") ++ Seq.fill(47)("word")).mkString(" ")

  test("gopherRules keeps a compliant document and flags each rule individually") {
    val docs = Seq(
      (1L, fiftyGood),                                  // all rules pass
      (2L, "too short to pass the word count"),         // < 50 words
      (3L, (Seq("the", "a") ++ Seq.fill(48)("#### ... ####")).mkString(" ")), // symbols
      (4L, (Seq("the", "a") ++ Seq.fill(48)("12345")).mkString(" ")), // non-alpha words
      (5L, Seq.fill(50)("word").mkString(" "))          // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep_doc"))
    assert(!byId(2L).getAs[Boolean]("ok_word_count") && !byId(2L).getAs[Boolean]("keep_doc"))
    assert(!byId(3L).getAs[Boolean]("ok_symbol_ratio"))
    assert(!byId(4L).getAs[Boolean]("ok_alpha_words"))
    assert(!byId(5L).getAs[Boolean]("ok_stopwords") && byId(5L).getAs[Boolean]("ok_word_count"))
  }

  test("gopherRules counts '...' by length-delta thirds and '#' per char") {
    val docs = Seq((1L, (Seq("the", "a") ++ Seq.fill(48)("w")).mkString(" ") + " ..... ##"))
      .toDF("doc_id", "text")
    // '.....' = one non-overlapping '...' match (left-to-right) → 1; '##' → 2
    val r = TextAnalysis.gopherRules(docs).collect().head
    assert(r.getAs[Int]("n_words") == 52)
    val symbolRatio = r.getAs[Double]("symbol_ratio")
    assert(symbolRatio == 3.0 / 52.0, s"3 symbols / 52 words, got $symbolRatio")
  }

  test("gopherRules mean-word-length bounds are inclusive") {
    // 50 words of exactly 3 chars → mean 3.0 passes; 2-char words → 2.0 fails
    val docs = Seq(
      (1L, (Seq("the", "and") ++ Seq.fill(48)("abc")).mkString(" ")),
      (2L, (Seq("ab") ++ Seq.fill(49)("cd")).mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("ok_mean_word_len"))
    assert(!out(1).getAs[Boolean]("ok_mean_word_len"))
  }

  // ------------------------------------------------ incrementalExactBloom

  private def batchAndCorpus = {
    val batch = Seq(
      (3L, "Shared   Text one"),   // dup of corpus 1 after normalization
      (6L, "brand new text A"),
      (9L, "brand new text B"),
      (12L, "shared text two")     // dup of corpus 2
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "shared text one"),
      (2L, "SHARED TEXT TWO"),
      (4L, "corpus only text")
    ).toDF("doc_id", "text")
    (batch, corpus)
  }

  test("incrementalExactBloom returns exactly the batch docs absent from the corpus") {
    val (batch, corpus) = batchAndCorpus
    val out = Dedup.incrementalExactBloom(batch, corpus, expectedItems = 1000L)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out.map(_._1).toSeq == Seq(6L, 9L), "normalization-equal dups are dropped")
  }

  test("incrementalExactBloom equals the plain anti-join (bloom adds no error)") {
    val (batch, corpus) = batchAndCorpus
    val fp = md5(TextFns.normalized(col("text")).cast("binary")).as("fingerprint")
    val plain = batch.select(col("doc_id"), fp)
      .join(corpus.select(fp), Seq("fingerprint"), "left_anti")
      .select("doc_id", "fingerprint")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // tiny filter (high fpp pressure): correctness must still be exact
    val bloom = Dedup.incrementalExactBloom(batch, corpus, expectedItems = 1L, fpp = 0.5)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(bloom == plain)
  }

  test("incrementalExactBloom is partition-layout independent") {
    val (batch, corpus) = batchAndCorpus
    val a = Dedup.incrementalExactBloom(batch.repartition(1), corpus.repartition(1), 1000L)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val b = Dedup.incrementalExactBloom(batch.repartition(7), corpus.repartition(5), 1000L)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(a == b)
  }

  // ----------------------------------------------------- interarrivalStats

  test("interarrivalStats computes exact gap stats incl. half-odd medians") {
    // user 1: events at t0, +1s, +3s → gaps 1s, 2s → median 1.5s (the .5 case)
    // user 2: single event → no gaps, excluded
    val events = Seq(
      (1L, 1L, "2024-01-01 00:00:00"),
      (2L, 1L, "2024-01-01 00:00:01"),
      (3L, 1L, "2024-01-01 00:00:03"),
      (4L, 2L, "2024-01-01 00:00:00")
    ).toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val out = Events.interarrivalStats(events).collect()
    assert(out.length == 1, "single-event users have no gaps")
    val r = out.head
    assert(r.getAs[Long]("n_gaps") == 2L)
    assert(r.getAs[Long]("min_gap_us") == 1000000L)
    assert(r.getAs[Long]("max_gap_us") == 2000000L)
    assert(r.getAs[Double]("median_gap_us") == 1500000.0, "interpolated median is exact")
  }

  // ----------------------------------------------------------- rangeSearch

  test("rangeSearch returns exactly the pairs at/above the cosine threshold") {
    // planted geometry: q=(1,0); n1=(1,0) cos 1; n2=(1,1)/√2 cos ≈0.7071;
    // n3=(0,1) cos 0 — threshold 0.7 keeps n1,n2, the ≥ boundary excludes n3
    val embs = Seq(
      (100L, Array(1.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.rangeSearch(embs, col("vec_id") === 100L, threshold = 0.7)
      .orderBy("neighbor_id").as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2) == Seq(1L, 2L))
    assert(out.head._3 == 1.0)
    assert(math.abs(out(1)._3 - math.sqrt(0.5)) < 1e-12)
  }

  test("rangeSearch agrees with bruteForceTopK on the qualifying prefix") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("vec_id", col("vec_id").cast("long"))
    val range = Similarity.rangeSearch(embs, col("vec_id") % 100 === 0, threshold = 0.3)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    val topk = Similarity.bruteForceTopK(embs, col("vec_id") % 100 === 0, k = 50)
      .filter(col("cos") >= 0.3)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(range == topk, "radius pairs must equal the thresholded exact ranking")
    assert(range.nonEmpty, "threshold chosen to be non-degenerate at sf0.001")
  }

  // ------------------------------------------------------ bigramSurprisal

  test("bigramSurprisal scores a fully self-predictable corpus at zero") {
    // every context has exactly one continuation → p = 1 everywhere → 0
    val corpus = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(corpus).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Double]("bg_surprisal")).forall(_ == 0.0))
    assert(out.map(_.getAs[Long]("n_bigrams")).toSeq == Seq(3L, 1L))
  }

  test("bigramSurprisal penalizes improbable transitions exactly") {
    // c(a b)=3, c(b a)=1, c(b b)=1 → ctx a=3, b=2
    // lnv(a b)=ln(1)=0; lnv(b a)=lnv(b b)=ln(2) quantized to 8dp
    val corpus = Seq((1L, "a b a b"), (2L, "a b"), (3L, "b b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(corpus).orderBy("doc_id").collect()
    val ln2q = BigDecimal(math.log(2.0)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val expected1 = (ln2q / 3).toDouble  // (2·0 + 1·ln2)/3
    assert(out(0).getAs[Double]("bg_surprisal") ==
      BigDecimal(expected1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1).getAs[Double]("bg_surprisal") == 0.0)
    assert(out(2).getAs[Double]("bg_surprisal") ==
      BigDecimal(ln2q.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("bigramSurprisal is partition-layout independent") {
    val corpus = Seq((1L, "a b a b c d"), (2L, "a b c"), (3L, "d c b a")).toDF("doc_id", "text")
    val a = TextAnalysis.bigramSurprisal(corpus.repartition(1))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val b = TextAnalysis.bigramSurprisal(corpus.repartition(7))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  // --------------------------------------------------------- dailyTopTypes

  test("dailyTopTypes ranks by count desc with deterministic name ties, bounded by k") {
    val events = Seq(
      (1L, "2024-01-01 01:00:00", "view"), (2L, "2024-01-01 02:00:00", "view"),
      (3L, "2024-01-01 03:00:00", "click"), (4L, "2024-01-01 04:00:00", "click"),
      (5L, "2024-01-01 05:00:00", "buy"), (6L, "2024-01-01 06:00:00", "signup"),
      (7L, "2024-01-02 01:00:00", "buy")
    ).toDF("event_id", "s", "event_type").withColumn("ts", to_timestamp(col("s")))
    val out = Events.dailyTopTypes(events, k = 3)
      .orderBy("day", "rnk")
      .select("event_type", "n_events", "rnk").as[(String, Long, Int)].collect().toSeq
    // day 1: click/view tie at 2 → click first alphabetically; buy/signup tie
    // at 1 → buy takes rank 3, signup cut by k
    assert(out == Seq(("click", 2L, 1), ("view", 2L, 2), ("buy", 1L, 3), ("buy", 1L, 1)))
  }

  // --------------------------------------------------------- conversionLag

  test("conversionLag measures first-signup→first-purchase per cohort, excluding non-converters") {
    val events = Seq(
      // user 1: signup 00:00, purchase 00:10 → lag 600s
      (1L, 1L, "2024-01-01 00:00:00", "signup"),
      (2L, 1L, "2024-01-01 00:10:00", "purchase"),
      // user 2: same cohort, lag 30s; later second purchase ignored
      (3L, 2L, "2024-01-01 08:00:00", "signup"),
      (4L, 2L, "2024-01-01 08:00:30", "purchase"),
      (5L, 2L, "2024-01-02 00:00:00", "purchase"),
      // user 3: purchase BEFORE signup → not converted
      (6L, 3L, "2024-01-01 05:00:00", "purchase"),
      (7L, 3L, "2024-01-01 06:00:00", "signup"),
      // user 4: signup only → not converted
      (8L, 4L, "2024-01-01 07:00:00", "signup")
    ).toDF("event_id", "user_id", "s", "event_type")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Events.conversionLag(events).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_converted") == 2L)
    assert(r.getAs[Long]("min_lag_us") == 30000000L)
    assert(r.getAs[Long]("max_lag_us") == 600000000L)
    assert(r.getAs[Double]("median_lag_us") == 315000000.0, "interpolated median of 30s/600s")
  }

  test("interarrivalStats breaks timestamp ties by event_id") {
    // two events at the same ts: order by event_id → gaps 0 then 5s
    val events = Seq(
      (10L, 1L, "2024-01-01 00:00:00"),
      (11L, 1L, "2024-01-01 00:00:00"),
      (12L, 1L, "2024-01-01 00:00:05")
    ).toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val r = Events.interarrivalStats(events).collect().head
    assert(r.getAs[Long]("min_gap_us") == 0L)
    assert(r.getAs[Long]("max_gap_us") == 5000000L)
    assert(r.getAs[Double]("median_gap_us") == 2500000.0)
  }
}
