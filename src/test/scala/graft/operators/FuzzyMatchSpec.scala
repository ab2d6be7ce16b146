package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q-gram-blocked edit-distance pairs: hand-computed edges, completeness
  * against a driver-side brute force (the blocking must MISS nothing),
  * short-bucket coverage, and the no-cartesian plan pin.
  */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(xs: Seq[String], maxDist: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      a <- xs.distinct; b <- xs.distinct if a < b
      d = lev(a, b) if d <= maxDist
    } yield (a, b, d)).toSet
  }

  private def run(xs: Seq[String], maxDist: Int): Set[(String, String, Int)] =
    FuzzyMatch.editDistancePairs(xs.toDF("s"), "s", maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("hand-computed: substitution, insertion, deletion edges at k=2") {
    val xs = Seq("merchant", "merchAnt", "merchants", "mrchant", "banana")
    val got = run(xs, maxDist = 2)
    assert(got == bruteForce(xs, 2))
    assert(got.contains(("merchAnt", "merchant", 1)), "one substitution")
    assert(got.contains(("merchant", "merchants", 1)), "one insertion")
    assert(got.contains(("merchant", "mrchant", 1)), "one deletion")
    assert(!got.exists(p => p._1 == "banana" || p._2 == "banana"))
  }

  test("short bucket: pairs where both strings are under (k+1)q chars") {
    val xs = Seq("ab", "b", "abc", "xyz", "abcde", "abcdef")
    val got = run(xs, maxDist = 2)
    assert(got == bruteForce(xs, 2),
      "short-short, short-long, and long-long pairs all covered")
    assert(got.contains(("ab", "b", 1)), "both-short pair found without q-grams")
    assert(got.contains(("abcde", "abcdef", 1)),
      "pair straddling the short/long threshold found via the gram join")
  }

  test("completeness: blocking equals brute force on a varied corpus") {
    // generated names with planted typos, duplicated-distinct values, and
    // a hot shared gram ("no. ") across families
    val base = (0 until 40).map(i => s"global mart no. $i") ++
      (0 until 40).map(i => s"globel mart no. $i") ++
      Seq("acme", "acne", "ac", "a corp", "b corp", "ab corp")
    val got = run(base, maxDist = 2)
    assert(got == bruteForce(base, 2))
    assert(got.nonEmpty)
  }

  test("no pair is emitted twice") {
    val xs = Seq("aaaa aaaa", "aaaa aaab", "aaaa abab")
    val df = FuzzyMatch.editDistancePairs(xs.toDF("s"), "s", maxDist = 2)
    val n = df.count()
    assert(n == df.distinct().count(), "candidate sources must be disjoint")
  }

  test("nulls are dropped, not matched") {
    val xs = Seq(Some("abc"), None, Some("abd")).toDF("s")
    val got = FuzzyMatch.editDistancePairs(xs, "s", maxDist = 2).count()
    assert(got == 1L)
  }

  test("plan: the corpus-scale path joins on grams, never cartesian") {
    val plan = FuzzyMatch.editDistancePairs(
      (0 until 100).map(i => s"merchant number $i").toDF("s"), "s", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"long-string candidates must come from the gram equi-join:\n$plan")
  }
}
