package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 fourth-session operators: Moore–Lewis selection (x38) and the
  * other additions from the same session.
  */
class Round11dOpsSpec extends SparkSpec {
  import spark.implicits._

  /** The engine's quantization: ln of a double ratio, DECIMAL(18,8) HALF_UP. */
  private def qln(num: Long, den: Long): BigDecimal =
    BigDecimal(math.log(num.toDouble / den.toDouble))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)

  test("mooreLewisScore: hand-computed cross-entropy difference on a 3-doc corpus") {
    // gen counts: a:3 b:2 c:3 d:1, N_gen=9, V=4; in-domain = doc 1 only:
    // a:2 b:1, N_in=3. lnd(w) = qln(N_in+V, n_in+1) - qln(N_gen+V, n_gen+1).
    val docs = Seq(
      (1L, "a a b", "src0"),
      (2L, "a b c", "src1"),
      (3L, "c c d", "src1")).toDF("doc_id", "text", "source")
    val lnd = Map(
      "a" -> (qln(7, 3) - qln(13, 4)),
      "b" -> (qln(7, 2) - qln(13, 3)),
      "c" -> (qln(7, 1) - qln(13, 4)),
      "d" -> (qln(7, 1) - qln(13, 2)))
    def score(toks: (String, Int)*): Double = {
      val n = toks.map(_._2).sum
      val s = toks.map { case (w, c) => lnd(w) * c }.sum
      BigDecimal(s.toDouble / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = TextAnalysis.mooreLewisScore(docs, col("source") === "src0")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "ml_score").as[(Long, Long, Double)]
      .collect().toSeq
    assert(out === Seq(
      (1L, 3L, score("a" -> 2, "b" -> 1)),
      (2L, 3L, score("a" -> 1, "b" -> 1, "c" -> 1)),
      (3L, 3L, score("c" -> 2, "d" -> 1))))
  }

  test("mooreLewisScore: in-domain-vocabulary docs score lower than disjoint-vocabulary docs") {
    // two token populations with zero overlap; in-domain uses only pop A —
    // every A-token is cheap under the in-domain LM and every B-token is
    // maximally surprising to it, so the A-only out-of-domain twin must
    // still rank strictly below any B-only document.
    val inDom = (1 to 5).map(i => (i.toLong, "alpha beta gamma", "target"))
    val aOnly = (10 to 14).map(i => (i.toLong, "alpha beta gamma", "other"))
    val bOnly = (20 to 24).map(i => (i.toLong, "delta epsilon zeta", "other"))
    val docs = (inDom ++ aOnly ++ bOnly).toDF("doc_id", "text", "source")
    val scores = TextAnalysis.mooreLewisScore(docs, col("source") === "target")
      .select("doc_id", "ml_score").as[(Long, Double)].collect().toMap
    val aMax = (10L to 14L).map(scores).max
    val bMin = (20L to 24L).map(scores).min
    assert(aMax < bMin,
      s"in-domain-vocab docs must outrank disjoint-vocab docs ($aMax vs $bMin)")
  }

  test("q27 customer trend: hand-computed OLS line through exact points") {
    // cust 1: (day 0, 10), (day 1, 12), (day 2, 14) → slope 2, intercept 10
    // cust 2: (0, 100), (2, 100), (4, 130) → slope 7.5, intercept 95
    // cust 3: n = 2 → filtered; cust 4: one distinct day → den = 0 → filtered
    val dir = java.nio.file.Files.createTempDirectory("graft-q27").toString
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq(
      (1L, 1L, "O", 10.0, d("1992-01-01"), "1-URGENT"),
      (2L, 1L, "O", 12.0, d("1992-01-02"), "1-URGENT"),
      (3L, 1L, "O", 14.0, d("1992-01-03"), "1-URGENT"),
      (4L, 2L, "O", 100.0, d("1992-01-01"), "1-URGENT"),
      (5L, 2L, "O", 100.0, d("1992-01-03"), "1-URGENT"),
      (6L, 2L, "O", 130.0, d("1992-01-05"), "1-URGENT"),
      (7L, 3L, "O", 1.0, d("1992-01-01"), "1-URGENT"),
      (8L, 3L, "O", 2.0, d("1992-01-02"), "1-URGENT"),
      (9L, 4L, "O", 1.0, d("1992-01-01"), "1-URGENT"),
      (10L, 4L, "O", 2.0, d("1992-01-01"), "1-URGENT"),
      (11L, 4L, "O", 3.0, d("1992-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(dir + "/orders.parquet")
    val out = graft.SparkEntry.queries("q27_customer_trend")(spark, dir)
      .select("o_custkey", "n_orders", "slope", "intercept")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq((1L, 3L, 2.0, 10.0), (2L, 3L, 7.5, 95.0)))
  }

  test("mooreLewisScore: partition-layout independence (1 vs 13 partitions)") {
    val docs = (1 to 40).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} shared word", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val one = TextAnalysis.mooreLewisScore(docs.coalesce(1), col("source") === "src0")
      .orderBy("doc_id").collect().toSeq
    val many = TextAnalysis.mooreLewisScore(docs.repartition(13), col("source") === "src0")
      .orderBy("doc_id").collect().toSeq
    assert(one === many)
  }
}
