package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance entity resolution without all-pairs: the q-gram inverted-
  * index candidate join (the Gravano et al. 2001 / PassJoin-family filter
  * pattern) with an exact codegen'd `levenshtein` verify.
  *
  * Soundness of the blocking: if ed(a, b) ≤ k, an optimal edit script has k
  * or fewer operations, each destroying at most q of the |s|−q+1 positional
  * q-grams, so a and b share at least max(|a|,|b|) − q + 1 − k·q q-grams.
  * That bound is ≥ 1 — i.e. the shared-gram equi-join is guaranteed to
  * surface the pair — whenever max(|a|,|b|) ≥ (k+1)·q. Pairs where BOTH
  * strings are shorter than (k+1)·q fall through to an all-pairs join over
  * the short bucket, whose cardinality is alphabet-bounded (strings of
  * length < (k+1)·q), so the quadratic corner never touches corpus-scale
  * data. The two candidate sources are disjoint by construction
  * (max-length ≥ vs < the threshold), so no pair is scored twice.
  *
  * Scale shape: distinct strings → distinct q-grams (narrow explode) →
  * shared-gram equi-join with the length-band prune (|len Δ| ≤ k) fused
  * into the join condition → pair-level distinct → one codegen'd
  * levenshtein per surviving candidate. Same sparse inverted-index posture
  * as the exact-Jaccard pair join (d11): nothing all-pairs, hot grams are
  * AQE skew-join territory, and the verify runs on candidates only. At
  * 100 TB add a gram-frequency stoplist (drop grams appearing in > f of
  * strings before the join — completeness then needs the count argument
  * re-checked against the pruned gram set, the d10-style diagnostic).
  */
object FuzzyMatch {

  /** All unordered pairs of DISTINCT values of `strCol` with
    * levenshtein(a, b) ≤ `maxDist`, as (s_a, s_b, dist) with s_a < s_b.
    * Nulls are not matchable and are dropped.
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int,
                        q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist $maxDist must be >= 1")
    require(q >= 2, s"q $q must be >= 2 (unigrams carry no position signal)")
    val minLongLen = (maxDist + 1) * q
    val s = df.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull).distinct()
    val grams = s.filter(length(col("s")) >= q)
      .select(col("s"), explode(array_distinct(expr(
        s"transform(sequence(1, length(s) - ${q - 1}), i -> substring(s, i, $q))")))
        .as("g"))
    val candLong = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.s") < col("b.s") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist &&
          greatest(length(col("a.s")), length(col("b.s"))) >= minLongLen)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
      .distinct()
    val short = s.filter(length(col("s")) < minLongLen)
    val candShort = short.as("a").join(short.as("b"),
        col("a.s") < col("b.s") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist &&
          greatest(length(col("a.s")), length(col("b.s"))) < minLongLen)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
    candLong.union(candShort)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
  }
}
