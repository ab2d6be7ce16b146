package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT frequent-items (heavy hitters): all values of a column whose count
  * is ≥ `support · N`, without ever shuffling the full distinct-key space.
  *
  * The classic two-phase candidate/verify shape:
  *   1. one NARROW pass runs a Misra-Gries summary of capacity
  *      k = ⌈1/support⌉ per partition and ships only (partition row count,
  *      ≤ k surviving keys) to the driver — bounded by partitions · k, not
  *      by the key cardinality. MG's guarantee makes the union a provable
  *      SUPERSET of the answer: a key dropped entirely by partition p has
  *      count_p ≤ n_p/(k+1), so a key surviving NO partition has total
  *      count ≤ N/(k+1) < support·N.
  *   2. an exact recount of ONLY the candidate keys (broadcast semi-join —
  *      the corpus side never shuffles; the aggregation's key space is the
  *      candidate set) removes the false positives MG admits.
  *
  * Output is therefore EXACT — `value, n` for every qualifying value,
  * DuckDB-oracle-able as a plain HAVING — while the full `groupBy(value)`
  * it replaces would shuffle every distinct key at 100 TB (think: distinct
  * URLs) to answer a question whose result is support-bounded at ≤ 1/support
  * rows. The candidate collect is capped (`maxCandidates`) and fails fast,
  * the same contract every driver-localized probe in the engine enforces.
  *
  * The threshold comparison is `CAST(n AS DOUBLE) >= support · N` with the
  * multiplication evaluated identically in both engines (one double
  * product of exact inputs).
  */
object HeavyHitters {

  def frequentItems(df: DataFrame, valueCol: String, support: Double,
                    maxCandidates: Int = 100000): DataFrame = {
    require(support > 0.0 && support <= 1.0, s"support $support outside (0, 1]")
    val k = math.ceil(1.0 / support).toInt
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(col(valueCol).cast("string")).as[String]
    // pass 1: per-partition (row count, MG survivors)
    val partials: Array[(Long, Array[String])] = values.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { v =>
        n += 1
        // collision-free encoding: null -> "n", value v -> "v" + v (a real
        // string can never alias the null marker)
        val key = if (v == null) "n" else "v" + v
        counters.get(key) match {
          case Some(c) => counters.update(key, c + 1)
          case None if counters.size < k => counters.update(key, 1L)
          case None =>
            // decrement-all: amortized O(1) per row (each decrement pays
            // back an earlier increment)
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (kk, c) =>
              if (c == 1L) dead += kk else counters.update(kk, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      Iterator.single((n, counters.keys.toArray))
    }.collect()
    val total = partials.map(_._1).sum
    val candidates = partials.iterator.flatMap(_._2).toSet
    require(candidates.size <= maxCandidates,
      s"heavy-hitter candidate set ${candidates.size} exceeds $maxCandidates — " +
        s"support $support admits up to partitions·⌈1/support⌉ candidates; " +
        "raise the support or the cap")
    val hasNull = candidates.contains("n")
    val candDf = broadcast(
      candidates.filter(_.startsWith("v")).map(_.drop(1)).toSeq.toDF("cand"))
    // pass 2: exact recount of candidates only (null candidate via isNull —
    // an equi-join can't match it)
    val keyMatches = df.join(candDf, col(valueCol).cast("string") === col("cand"))
      .drop("cand")
    val matched =
      if (hasNull) keyMatches.unionByName(df.filter(col(valueCol).isNull))
      else keyMatches
    matched
      .groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n").cast("double") >= lit(support) * lit(total).cast("double"))
  }
}
