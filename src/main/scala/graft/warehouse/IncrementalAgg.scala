package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Incremental materialized-aggregate maintenance — the view-refresh shape
  * that makes a 100 TB daily rollup affordable: instead of recomputing the
  * aggregate over the full history every batch, keep the view as PARTIAL
  * aggregates (counts + exact-decimal sums, the [[graft.functions.Det]]
  * two-level machinery), aggregate only the DELTA batch, and merge the two
  * partial frames by group key. Because decimal sums are associative and
  * order-independent, the merged view is bit-equal to a from-scratch
  * recompute — the t28 oracle proves it against DuckDB's full recompute.
  *
  * Contract: a partial-aggregate frame is groupCols ++ mergeable columns,
  * where every non-key column is additive under SUM — `count(*) AS n`
  * (long) and `sum(x :: DECIMAL) ` partials qualify; AVG or float sums do
  * NOT (store n + decimal sum instead and divide at read time). Deltas
  * must be disjoint from already-folded history (the t11 idempotent-append
  * contract guards the ingest side).
  *
  * Scale shape: the merge shuffles two AGGREGATE-sized frames (|groups|
  * rows each), never the raw history; with the view stored partitioned by
  * a group-key prefix the delta merge rewrites only touched partitions
  * (compose with [[ParquetWarehouse.upsertPartitioned]]).
  */
object IncrementalAgg {

  /** Merge partial-aggregate frames by `keyCols`: every non-key column is
    * SUMmed (long counts stay long; decimal partials stay decimal at
    * Spark's widened precision, exactness preserved). Schemas must agree.
    */
  def mergePartials(stored: DataFrame, delta: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    require(stored.columns.toSeq == delta.columns.toSeq,
      s"partial frames must share a schema: ${stored.columns.toSeq} vs ${delta.columns.toSeq}")
    val mergeCols = stored.columns.filterNot(keyCols.contains)
    mergeCols.foreach { c =>
      val dt = stored.schema(c).dataType
      require(dt == LongType || dt.isInstanceOf[DecimalType],
        s"merge column '$c' must be an additive partial (long count or decimal sum), got $dt")
    }
    stored.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(mergeCols.head -> "sum", mergeCols.tail.map(_ -> "sum"): _*)
      .select(keyCols.map(col) ++
        mergeCols.map(c => col(s"sum($c)").as(c)): _*)
  }
}
