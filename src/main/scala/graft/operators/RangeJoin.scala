package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval RANGE JOIN by grain binning — the scale-correct form of the
  * inequality join Spark has no native operator for. A naive
  * `a.start <= b.end AND b.start <= a.end` join plans as a broadcast
  * nested loop (or a cartesian when neither side fits), O(|A|·|B|)
  * comparisons; the binned form explodes each interval to the time grains
  * it covers and EQUI-joins on the grain, so only temporally co-located
  * rows ever meet — the standard trick underneath production interval
  * joins (Databricks' range-join hints, KDB asof/window machinery).
  *
  * Duplicate suppression is structural, not a `distinct`: a candidate pair
  * shares every grain in the intersection of its cover sets, so the join
  * keeps the pair only at the FIRST SHARED grain
  * (⌊max(starts)/grain⌋ — both intervals cover it whenever they overlap at
  * all, because max(starts) ≤ min(ends)). Each qualifying pair therefore
  * emits exactly once with no post-shuffle dedup.
  *
  * Grain choice trades explosion for selectivity: cover-set size is
  * interval_length/grain + 1 per row, while a grain far above typical
  * interval length degrades toward all-pairs within each bin. Pick the
  * typical interval length. Time-skewed data (many concurrent intervals in
  * one hot grain) is AQE's skew-join case, same as any hot equi-key.
  *
  * Columns of `left` and `right` must be disjoint (enforced); bounds are
  * LONG microseconds, intervals CLOSED on both ends.
  */
object RangeJoin {

  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStartUs: String, lEndUs: String,
                  rStartUs: String, rEndUs: String,
                  grainUs: Long): DataFrame = {
    require(grainUs > 0, s"grainUs $grainUs must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"overlapJoin needs disjoint column names, both sides have: ${overlap.mkString(", ")}")
    def binned(df: DataFrame, startCol: String, endCol: String) = df
      .withColumn("_grain", explode(sequence(
        floor(col(startCol) / grainUs), floor(col(endCol) / grainUs))))
    val l = binned(left, lStartUs, lEndUs)
    val r = binned(right, rStartUs, rEndUs)
      .withColumnRenamed("_grain", "_rgrain")
    l.join(r,
        col("_grain") === col("_rgrain") &&
        // exact closed-interval overlap
        col(lStartUs) <= col(rEndUs) && col(rStartUs) <= col(lEndUs) &&
        // first-shared-grain: emit each qualifying pair exactly once
        col("_grain") === floor(greatest(col(lStartUs), col(rStartUs)) / grainUs))
      .drop("_grain", "_rgrain")
  }
}
