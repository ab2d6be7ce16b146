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
                   order: Seq[Column], k: Int, fanout: Int = 64,
                   rankCol: String = "rank"): DataFrame = {
    require(k > 0 && fanout > 0)
    // withColumn silently REPLACES a same-named input column, so the output
    // rank column must not collide (caller picks another name), and the
    // phase-1 scratch column gets a name no input can contain (ADVICE r3)
    require(!df.columns.contains(rankCol),
      s"topKPerGroup: input already has a '$rankCol' column — pass a different rankCol")
    val localRk = Iterator.from(0).map(i => s"__topk_rk$i")
      .find(n => !df.columns.contains(n)).get
    val salt = pmod(xxhash64(col(tieBreakCol)), lit(fanout)).cast("int")
    val g = groupCols.map(col)
    val local = df
      .withColumn(localRk, row_number().over(
        Window.partitionBy(g :+ salt: _*).orderBy(order: _*)))
      .filter(col(localRk) <= k)
      .drop(localRk)
    local
      .withColumn(rankCol, row_number().over(Window.partitionBy(g: _*).orderBy(order: _*)))
      .filter(col(rankCol) <= k)
  }
}
