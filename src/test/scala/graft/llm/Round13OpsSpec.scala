package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 operators: hourly seasonality (e22) and readability (x46) —
  * hand-computed values, exact-arithmetic contracts, tie-breaks.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("hourlySeasonality: hand-computed chi2, peak ties to the smaller hour") {
    // type A: hours 1,1,2 → n=3, Σobs²=5, chi2=(24·5−9)/3=37; peak hour 1 (c=2)
    // type B: hours 3,5 → counts 1,1 tie → peak hour 3; chi2=(24·2−4)/2=22
    val ev = Seq(
      ("A", "2024-01-01 01:10:00"), ("A", "2024-01-01 01:20:00"),
      ("A", "2024-01-01 02:00:00"),
      ("B", "2024-01-01 05:00:00"), ("B", "2024-01-01 03:00:00"))
      .toDF("event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Events.hourlySeasonality(ev).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("A", 3L, 37.0, 1L, 0.6667),
      ("B", 2L, 22.0, 3L, 0.5)))
  }

  test("hourlySeasonality: uniform traffic scores chi2 = 0") {
    val ev = (0 until 24).map(h => ("U", f"2024-01-01 $h%02d:00:00"))
      .toDF("event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val r = Events.hourlySeasonality(ev).head()
    assert(r.getDouble(2) == 0.0, s"uniform chi2: ${r.getDouble(2)}")
    assert(r.getLong(3) == 0L, "uniform peak ties to hour 0")
  }

  test("trendingDecay: hand-computed half-life weights against the newest day") {
    // type A: 2 events on the newest day (w=1) + 1 exactly one half-life
    // back (w=0.5) → decayed 2.5; type B: 1 event 14 days back → 0.25
    val ev = Seq(
      ("A", "2024-01-15 10:00:00"), ("A", "2024-01-15 11:00:00"),
      ("A", "2024-01-08 10:00:00"),
      ("B", "2024-01-01 10:00:00"))
      .toDF("event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Events.trendingDecay(ev, halfLifeDays = 7).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("A", 3L, 2.5), ("B", 1L, 0.25)))
  }

  test("trendingDecay: recency beats volume across a long gap") {
    val ev = (Seq.fill(10)(("old", "2024-01-01 10:00:00")) ++
      Seq(("new", "2024-03-01 10:00:00")))
      .toDF("event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val byType = Events.trendingDecay(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byType("new") > byType("old"),
      s"a fresh event must outscore 10 stale ones: $byType")
  }

  test("changePoints: hand-computed CUSUM peak at the level shift; flat series scores 0") {
    // type A: 3 days at 1/day then 3 days at 5/day — the CUSUM valley
    // bottoms at day 3 (the last old-level day): S = -12,-24,-36,-24,-12,0
    // → |S| peak 36, score 36/(6·18) = 0.333333
    def day(d: Int, n: Int, typ: String) =
      Seq.fill(n)((typ, f"2024-01-$d%02d 10:00:00"))
    val ev = ((1 to 3).flatMap(day(_, 1, "A")) ++ (4 to 6).flatMap(day(_, 5, "A")) ++
      (1 to 4).flatMap(day(_, 2, "F")))
      .toDF("event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Events.changePoints(ev).orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("A", 6L, 18L, "2024-01-03", -36L, 0.333333),
      // flat series: every S_t = 0; tie → earliest day, score 0
      ("F", 4L, 8L, "2024-01-01", 0L, 0.0)))
  }

  test("windowedConversion: inside-window converts, outside/before/never do not") {
    // u1: purchase 3 days after signup → converts
    // u2: purchase 8 days after → outside the 7-day window
    // u3: purchase BEFORE the signup only → no conversion
    // u4: signup, never purchases
    // u5: purchase exactly AT the 7-day boundary → converts (closed edge)
    val ev = Seq(
      (1L, "signup", "2024-01-01 10:00:00"), (1L, "purchase", "2024-01-04 10:00:00"),
      (2L, "signup", "2024-01-01 10:00:00"), (2L, "purchase", "2024-01-09 10:00:01"),
      (3L, "purchase", "2024-01-01 09:00:00"), (3L, "signup", "2024-01-01 10:00:00"),
      (4L, "signup", "2024-01-02 10:00:00"),
      (5L, "signup", "2024-01-02 10:00:00"), (5L, "purchase", "2024-01-09 10:00:00"))
      .toDF("user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = Events.windowedConversion(ev).orderBy("cohort_day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      ("2024-01-01", 3L, 1L, 0.3333), // u1 converts; u2 late; u3 pre-signup only
      ("2024-01-02", 2L, 1L, 0.5)))   // u5 boundary-exact converts; u4 never
  }

  test("readability: hand-computed Flesch/FK on known sentences") {
    // "the cat sat. it ran!" → 2 sentence runs, 5 words,
    // syllables: the=1(e), cat=1(a), sat=1(a), it=1(i), ran=1(a) → 5
    // wps=2.5, spw=1.0 → flesch=206.835−1.015·2.5−84.6 = 119.6975
    // fk = 0.39·2.5 + 11.8·1.0 − 15.59 = −2.815
    val docs = Seq((1L, "the cat sat. it ran!")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 5L, 5L)))
    assert(r.getDouble(4) == 119.6975, s"flesch ${r.getDouble(4)}")
    assert(r.getDouble(5) == -2.815, s"fk ${r.getDouble(5)}")
  }

  test("readability: no punctuation floors at one sentence; vowelless words floor at one syllable") {
    val docs = Seq((1L, "xyz qrst")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 2L, 2L)))
  }

  test("vocabularyProfile: hand-computed counts, hapax fraction, top-k shares") {
    // tokens: a a a b b c  → vocab {a:3, b:2, c:1}: 6 tokens, 3 terms,
    // 1 hapax; top-10 covers everything (share 1.0)
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabularyProfile(docs).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 3L, 1L)))
    assert(r.getDouble(3) == 0.3333 && r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("readability plans zero exchanges (narrow map)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.readability(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"readability must be narrow:\n$plan")
  }
}
