package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 continuation pins: Efraimidis–Spirakis priority sampling (p09)
  * and embedding-space benchmark decontamination (d18).
  */
class Round11bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------ prioritySample (p09, ES 2006)

  /** Driver-side twin of the priority key: md5("id:salt"), first 8 hex
    * chars as a 32-bit int, u = (v + ½)/2³², priority = u^(1/w).
    */
  private def priorityOf(id: Long, w: Double, salt: String = "prio"): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    math.pow((v.toDouble + 0.5) / 4294967296.0, 1.0 / w)
  }

  private lazy val weighted = (1L to 200L).map(i => (i, (i % 7 + 1).toLong))
    .toDF("doc_id", "w")

  test("prioritySample: exactly k rows, matching the brute-force ES ranking") {
    val got = Sampling.prioritySample(weighted, "doc_id", "w", k = 25)
      .select("doc_id", "w", "priority")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 25)
    val expected = (1L to 200L).map { i =>
      val w = (i % 7 + 1).toLong
      (i, w, priorityOf(i, w.toDouble))
    }.sortBy { case (id, _, p) => (-p, id) }.take(25)
    assert(got.sortBy { case (id, _, p) => (-p, id) }.toSeq == expected,
      "sample must equal the exact (priority desc, id) top-k")
  }

  test("prioritySample: deterministic under repartitioning") {
    val a = Sampling.prioritySample(weighted, "doc_id", "w", k = 25)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.prioritySample(weighted.repartition(13), "doc_id", "w", k = 25)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "the sampled set is a pure function of (id, salt, w, k)")
  }

  test("prioritySample: non-positive and null weights are excluded") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -4L)).toDF("doc_id", "w")
      .union(Seq((4L, Option.empty[Long])).toDF("doc_id", "w"))
    val kept = Sampling.prioritySample(df, "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), "only positive-weight rows can be drawn")
  }

  test("prioritySample: heavier rows dominate the sample") {
    // 100 rows at weight 1000 vs 1000 rows at weight 1: the k=50 sample
    // should be nearly all heavy (each heavy row is ~1000x more likely).
    val df = ((1L to 100L).map(i => (i, 1000L)) ++
      (1001L to 2000L).map(i => (i, 1L))).toDF("doc_id", "w")
    val heavy = Sampling.prioritySample(df, "doc_id", "w", k = 50)
      .filter(col("doc_id") <= 100L).count()
    assert(heavy >= 45, s"expected the heavy tier to dominate, got $heavy/50")
  }

  test("prioritySample plans as a distributed partial top-k, not a global sort") {
    val plan = Sampling.prioritySample(weighted, "doc_id", "w", k = 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject (per-partition top-k + bounded merge), got:\n$plan")
  }

  test("prioritySamplePerGroup: exact per-group quotas, brute-force ES ranks") {
    // group 'a': 30 rows (quota binds), group 'b': 5 rows (passes whole)
    val df = ((1L to 30L).map(i => (i, "a", (i % 5 + 1).toLong)) ++
      (31L to 35L).map(i => (i, "b", 2L))).toDF("doc_id", "src", "w")
    val got = Sampling.prioritySamplePerGroup(df, "src", k = 10,
        weightCol = "w")
      .select("doc_id", "src", "priority_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val expected = Seq("a", "b").flatMap { g =>
      val rows = if (g == "a") (1L to 30L).map(i => (i, (i % 5 + 1).toLong))
      else (31L to 35L).map(i => (i, 2L))
      rows.map { case (id, w) => (id, priorityOf(id, w.toDouble, salt = "gprio")) }
        .sortBy { case (id, p) => (-p, id) }
        .take(10).zipWithIndex
        .map { case ((id, _), i) => (id, g, i + 1) }
    }.toSet
    assert(got == expected)
    assert(got.count(_._2 == "b") == 5, "under-quota groups pass whole")
  }

  // ---------------------------------------------- unicodeScrub (x32)

  test("unicodeScrub: hand-computed mapping, removal, and counts; idempotent") {
    val df = Seq(
      (1L, "\u201Chi\u201D \u2018there\u2019 \u2013\u00A0ok"), // 6 mapped
      (2L, "a\u200Bb\u200Cc\uFEFFd"),                            // 3 zero-width
      (3L, "x\u0007y\u0000z\u001Fw"),                            // 3 controls
      (4L, "clean text")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unicodeScrub(df).orderBy("doc_id")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(got(0) == ((1L, 6, 0, 0, "\"hi\" 'there' - ok")))
    assert(got(1) == ((2L, 0, 3, 0, "abcd")))
    assert(got(2) == ((3L, 0, 0, 3, "xyzw")))
    assert(got(3) == ((4L, 0, 0, 0, "clean text")))
    val rescrub = TextAnalysis.unicodeScrub(
      TextAnalysis.unicodeScrub(df).select(col("doc_id"), col("scrubbed").as("text")))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(rescrub.forall(_ == ((0, 0, 0))), "scrub must be idempotent")
  }

  // ------------------------------- semanticDecontaminate (d18, eval leakage)

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private lazy val planted = Seq(
    // benchmark rows (flagged by pred id >= 100)
    (100L, vec(1, 0, 0, 0)),
    (101L, vec(0, 1, 0, 0)),
    // corpus: exact copy of bench 100, a near-copy, something orthogonal
    (1L, vec(1, 0, 0, 0)),
    (2L, vec(0.9, 0.1, 0, 0)),
    (3L, vec(0, 0, 0, 1))
  ).toDF("vec_id", "embedding")

  // ---------------------------------- containmentPairs (d19, excerpts)

  test("containmentPairs: planted excerpt scores 1.0 one way, invisible the other") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta"), // 2 shingles, both inside doc 1
      (3L, "completely different words entirely never overlapping anything")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((2L, 1L, 1.0)),
      s"excerpt containment must be 1.0 and strictly one-directional, got $got")
  }

  // -------------------------------------- marginMining (s14, bitext/LASER)

  test("marginMining: margins equal a driver-side brute force; one best pair per query") {
    // deterministic pseudo-random unit-ish vectors in two label groups
    def v(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    val rows = (0L until 12L).map(i => (i, v(i), 0)) ++
      (100L until 110L).map(i => (i, v(i), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val k = 3
    val got = Similarity.marginMining(df, 0, 1, k = k, threshold = 0.0)
      .orderBy("x_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))

    // brute force with the engine's exact arithmetic: double cosine fold,
    // DECIMAL(18,12) HALF_UP quantization, exact decimal sum, /k in double
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val as = rows.filter(_._3 == 0).map(r => (r._1, r._2))
    val bs = rows.filter(_._3 == 1).map(r => (r._1, r._2))
    val pairMap = (for { (x, xe) <- as; (y, ye) <- bs } yield ((x, y), cos(xe, ye))).toMap
    def mu(tops: Seq[Double]): Double =
      tops.map(c => BigDecimal(c).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / k
    val muX = as.map { case (x, _) =>
      x -> mu(bs.map { case (y, _) => (pairMap((x, y)), y) }
        .sortBy { case (c, y) => (-c, y) }.take(k).map(_._1))
    }.toMap
    val muY = bs.map { case (y, _) =>
      y -> mu(as.map { case (x, _) => (pairMap((x, y)), x) }
        .sortBy { case (c, x) => (-c, x) }.take(k).map(_._1))
    }.toMap
    val expected = as.map { case (x, _) =>
      val (y, m) = bs.map { case (y, _) =>
        (y, pairMap((x, y)) / ((muX(x) + muY(y)) / 2))
      }.minBy { case (y, m) => (-m, y) }
      (x, y, m)
    }.sortBy(_._1)
    assert(got.length == expected.length, "one best pair per query vector")
    got.zip(expected).foreach { case ((gx, gy, gm), (ex, ey, em)) =>
      assert(gx == ex && gy == ey && math.abs(gm - em) < 1e-12,
        s"query $gx: got ($gy, $gm), expected ($ey, $em)")
    }
  }

  test("marginMining: deterministic under repartitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.marginMining(emb, 0, 1).orderBy("x_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Similarity.marginMining(emb.repartition(13), 0, 1).orderBy("x_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("semanticDecontaminate: flags planted leaks with exact max/count") {
    val got = Similarity.semanticDecontaminate(planted,
        col("vec_id") >= 100L, threshold = 0.5)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "copy + near-copy flag; orthogonal doesn't")
    assert(got(0)._2 == 1.0 && got(0)._3 == 1L, "exact copy: max_cos 1.0, one bench hit")
    // embeddings are float32: the expected cosine uses the stored values
    val (a, b) = (0.9f.toDouble, 0.1f.toDouble)
    val expected2 = a / math.sqrt(a * a + b * b)
    assert(math.abs(got(1)._2 - expected2) < 1e-12)
    assert(got(1)._3 == 1L, "near-copy matches only its own bench vector at 0.5")
  }

  test("semanticDecontaminate: benchmark rows never appear as corpus rows") {
    val ids = Similarity.semanticDecontaminate(planted,
        col("vec_id") >= 100L, threshold = 0.0)
      .select("vec_id").as[Long].collect().toSet
    assert(ids.forall(_ < 100L), "the report covers the corpus side only")
  }

  test("semanticDecontaminate: bench side broadcasts; aggregate combines map-side") {
    val plan = Similarity.semanticDecontaminate(planted,
        col("vec_id") >= 100L, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"),
      s"benchmark side must broadcast (corpus never shuffles), got:\n$plan")
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0 && plan.indexOf("partial_max") >= 0,
      s"expected a partial (map-side) aggregate before the exchange, got:\n$plan")
  }
}
