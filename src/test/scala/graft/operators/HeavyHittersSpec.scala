package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The heavy-hitter operator's exactness contract: output ≡ the plain
  * groupBy + HAVING formulation at every support and partitioning, on a
  * skewed distribution where Misra-Gries actually drops tail keys; nulls
  * count as a value; the candidate cap fails fast.
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  // skew: one key at ~50%, one at ~25%, 500-key uniform tail
  private lazy val skewed = {
    val hot = Seq.fill(2000)("hot") ++ Seq.fill(1000)("warm")
    val tail = (0 until 1000).map(i => s"t${i % 500}")
    (hot ++ tail).toDF("v")
  }

  private def exact(df: org.apache.spark.sql.DataFrame, support: Double): Set[(String, Long)] = {
    val n = df.count().toDouble
    df.groupBy(col("v").as("value")).agg(count(lit(1)).as("n"))
      .filter(col("n").cast("double") >= support * n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("exact at every support, independent of partitioning") {
    for (support <- Seq(0.4, 0.2, 0.05, 0.01); parts <- Seq(1, 7)) {
      val df = skewed.repartition(parts)
      val got = HeavyHitters.frequentItems(df, "v", support)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == exact(df, support),
        s"mismatch at support=$support parts=$parts")
    }
  }

  test("tail keys below support never surface even as MG candidates survive") {
    val got = HeavyHitters.frequentItems(skewed, "v", 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("hot", 2000L), ("warm", 1000L)))
  }

  test("nulls count as a value; sentinel cannot alias a real string") {
    // "vn"-prefixed encoding: a corpus containing the literal strings "n"
    // and "vn" must not cross-count with nulls
    val df = (Seq.fill(40)(Some("n")) ++ Seq.fill(40)(Some("vn")) ++
      Seq.fill(40)(Option.empty[String]) ++ Seq.fill(5)(Some("rare")))
      .toDF("v")
    val got = HeavyHitters.frequentItems(df, "v", 0.3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got == Set((Some("n"), 40L), (Some("vn"), 40L), (None, 40L)))
  }

  test("candidate cap and support bounds fail fast") {
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(skewed, "v", 0.0)
    }
    intercept[IllegalArgumentException] {
      // support 0.01 → capacity 100; tail has 500 distinct keys spread over
      // partitions — cap of 3 must trip before any recount runs
      HeavyHitters.frequentItems(skewed, "v", 0.01, maxCandidates = 3)
    }
  }
}
