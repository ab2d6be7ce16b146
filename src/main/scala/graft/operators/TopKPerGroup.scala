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

  /** Fanout adapts to the input size: `fanout` is a CAP, and the effective
    * bucket count is ceil(estimatedRows / targetPartitionRows), clamped to
    * [1, fanout]. The estimate comes from Catalyst's propagated plan
    * statistics (rowCount under CBO, else sizeInBytes / schema row width) —
    * free, no extra count job. Small inputs (the sf0.1 gate, a post-agg
    * frame of thousands of rows) collapse to the plain single-window form,
    * avoiding two back-to-back window shuffles whose fixed overhead
    * dominates below ~targetPartitionRows; at warehouse scale the estimate
    * saturates the cap and the salted two-phase plan kicks in. Either path
    * produces row-identical output (TopKPerGroupSpec asserts equality across
    * forced fanouts).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], tieBreakCol: String,
                   order: Seq[Column], k: Int, fanout: Int = 64,
                   rankCol: String = "rank",
                   targetPartitionRows: Long = 4L << 20): DataFrame = {
    require(k > 0 && fanout > 0 && targetPartitionRows > 0)
    // withColumn silently REPLACES a same-named input column, so the output
    // rank column must not collide (caller picks another name), and the
    // phase-1 scratch column gets a name no input can contain (ADVICE r3)
    require(!df.columns.contains(rankCol),
      s"topKPerGroup: input already has a '$rankCol' column — pass a different rankCol")
    val optimized = df.queryExecution.optimizedPlan
    val stats = optimized.stats
    val estRows: Long = stats.rowCount.map(_.toLong).getOrElse {
      val rowWidth = math.max(1, df.schema.defaultSize)
      // without CBO rowCount, sizeInBytes propagates from the COMPRESSED
      // on-disk file size when the lineage reads files — parquet typically
      // compresses 3-8×, so a bytes-derived row estimate can undercount by
      // the compression ratio and silently reinstate the single-task
      // straggler the salted plan exists to avoid (ADVICE r6). Inflate by
      // 8× before deciding to collapse — but ONLY when a file scan feeds
      // the estimate; local/in-memory frames carry width-exact sizes and
      // inflating them would force the two-window plan on genuinely small
      // inputs (ADVICE r7). The bias only ever picks the salted plan, and
      // both plans are row-identical.
      val fromFiles = optimized.collectLeaves().exists {
        case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
        case _ => false
      }
      val inflate = if (fromFiles) 8 else 1
      (stats.sizeInBytes * inflate / rowWidth).min(BigInt(Long.MaxValue)).toLong
    }
    val effFanout =
      math.min(fanout.toLong, (estRows - 1) / targetPartitionRows + 1).max(1L).toInt
    val g = groupCols.map(col)
    val globalRank =
      row_number().over(Window.partitionBy(g: _*).orderBy(order: _*))
    if (effFanout <= 1) {
      df.withColumn(rankCol, globalRank).filter(col(rankCol) <= k)
    } else {
      val localRk = Iterator.from(0).map(i => s"__topk_rk$i")
        .find(n => !df.columns.contains(n)).get
      val salt = pmod(xxhash64(col(tieBreakCol)), lit(effFanout)).cast("int")
      val local = df
        .withColumn(localRk, row_number().over(
          Window.partitionBy(g :+ salt: _*).orderBy(order: _*)))
        .filter(col(localRk) <= k)
        .drop(localRk)
      local
        .withColumn(rankCol, globalRank)
        .filter(col(rankCol) <= k)
    }
  }
}
