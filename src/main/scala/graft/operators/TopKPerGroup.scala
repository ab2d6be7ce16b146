package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-group top-k.
  *
  * The textbook formulation — `row_number() OVER (PARTITION BY group ORDER
  * BY metric DESC)` then `rank <= k` — is correct but serializes each
  * group's ENTIRE row set through one task. With low-cardinality groups
  * (statuses, priorities, languages) and 100 TB of rows, that is a handful
  * of tasks sorting billions of rows each.
  *
  * This operator runs the same ranking in two phases:
  *   1. rows scatter across `fanout` salt buckets (deterministic hash of the
  *      tie-break key); a window PARTITIONED BY (group, salt) keeps each
  *      task's sort bounded at ~rows/(groups·fanout) and emits at most k
  *      survivors per bucket — anything ranked below k within its bucket is
  *      ranked below k globally, so no qualifying row is lost;
  *   2. a final window over the ≤ groups·fanout·k survivors — a bounded
  *      frame — produces exact global ranks.
  *
  * The ordering must be TOTAL (include a unique tie-break column), else
  * ranks are partition-placement-dependent. Result is row-for-row identical
  * to the single-window formulation (TopKPerGroupSpec asserts equality; the
  * q23 DuckDB oracle is the single-window SQL).
  */
object TopKPerGroup {

  def topKPerGroup(df: DataFrame, groupCols: Seq[String], tieBreakCol: String,
                   order: Seq[Column], k: Int, fanout: Int = 64): DataFrame = {
    require(k > 0 && fanout > 0)
    val salt = pmod(xxhash64(col(tieBreakCol)), lit(fanout)).cast("int")
    val g = groupCols.map(col)
    val local = df
      .withColumn("__rk", row_number().over(
        Window.partitionBy(g :+ salt: _*).orderBy(order: _*)))
      .filter(col("__rk") <= k)
      .drop("__rk")
    local
      .withColumn("rank", row_number().over(Window.partitionBy(g: _*).orderBy(order: _*)))
      .filter(col("rank") <= k)
  }
}
