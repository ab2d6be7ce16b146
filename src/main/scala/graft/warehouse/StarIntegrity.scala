package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse integrity checks — the reference re-validates its constraints
  * as queries (orphans/duplicates, /root/reference/sql/queries.sql:40-54,
  * and the `--validation` runner path, src/run_queries.py:180-282); Spark
  * has no constraint enforcement, so these ARE the constraint surface.
  * Each check returns a violation count; a healthy star is all zeros.
  */
object StarIntegrity {

  /** Run every check; returns (check_name, violation_count) rows. */
  def checks(star: Map[String, DataFrame]): Seq[(String, Long)] = {
    val fact = star("fact_transactions")
    def orphans(dim: DataFrame, key: String): Long =
      fact.select(col(key)).join(dim.select(col(key)), Seq(key), "left_anti").count()
    val notNullCols = Seq("transaction_key", "transaction_id", "date_key", "category_key",
      "merchant_key", "payment_method_key", "user_key", "amount")
    Seq(
      "orphan_category" -> orphans(star("dim_category"), "category_key"),
      "orphan_merchant" -> orphans(star("dim_merchant"), "merchant_key"),
      "orphan_payment" -> orphans(star("dim_payment_method"), "payment_method_key"),
      "orphan_user" -> orphans(star("dim_user"), "user_key"),
      "orphan_date" -> orphans(star("dim_date"), "date_key"),
      "duplicate_transaction_ids" ->
        fact.groupBy("transaction_id").count().filter(col("count") > 1).count(),
      "duplicate_transaction_keys" ->
        fact.groupBy("transaction_key").count().filter(col("count") > 1).count(),
      "null_required_fields" ->
        fact.filter(notNullCols.map(c => col(c).isNull).reduce(_ || _)).count(),
      "amount_out_of_range" ->
        fact.filter(col("amount") <= 0 || col("amount") > 10000).count(),
      "dim_natural_key_dupes" -> Seq(
        ("dim_category", "category_name"), ("dim_merchant", "merchant_name"),
        ("dim_payment_method", "payment_method_name"), ("dim_user", "user_id"),
        ("dim_date", "date")).map { case (d, k) =>
          star(d).groupBy(k).count().filter(col("count") > 1).count()
        }.sum)
  }

  /** [[checks]] fused for scale: the same (check_name, violation_count)
    * rows from THREE passes over the fact instead of nine — the five
    * orphan checks ride broadcast-marker left joins sharing ONE scan with
    * the row-local null/range predicates (at 100 TB the fact scan IS the
    * audit cost; dims are bounded and broadcast), and only the two
    * duplicate checks keep their own scans because each needs its own
    * key shuffle. Dim-side natural-key checks stay per-dim (dim-sized).
    * Equality with [[checks]] on planted violations is spec-pinned.
    */
  def checksFused(star: Map[String, DataFrame]): Seq[(String, Long)] = {
    val fact = star("fact_transactions")
    val dims = Seq(
      ("orphan_category", "dim_category", "category_key"),
      ("orphan_merchant", "dim_merchant", "merchant_key"),
      ("orphan_payment", "dim_payment_method", "payment_method_key"),
      ("orphan_user", "dim_user", "user_key"),
      ("orphan_date", "dim_date", "date_key"))
    val notNullCols = Seq("transaction_key", "transaction_id", "date_key", "category_key",
      "merchant_key", "payment_method_key", "user_key", "amount")
    // distinct() guards the join from multiplying fact rows if a dim ever
    // carried a duplicate key (the anti-join formulation is immune; the
    // marker join must be made so)
    val marked = dims.foldLeft(fact) { case (df, (_, d, k)) =>
      df.join(broadcast(star(d).select(col(k)).distinct()
        .withColumn(s"__has_$k", lit(1))), Seq(k), "left")
    }
    val aggCols =
      dims.map { case (n, _, k) =>
        coalesce(sum(when(col(s"__has_$k").isNull, 1L).otherwise(0L)), lit(0L)).as(n)
      } ++ Seq(
        coalesce(sum(when(notNullCols.map(c => col(c).isNull).reduce(_ || _), 1L)
          .otherwise(0L)), lit(0L)).as("null_required_fields"),
        coalesce(sum(when(col("amount") <= 0 || col("amount") > 10000, 1L)
          .otherwise(0L)), lit(0L)).as("amount_out_of_range"))
    val row = marked.agg(aggCols.head, aggCols.tail: _*).head()
    val fused = (dims.map(_._1) ++ Seq("null_required_fields", "amount_out_of_range"))
      .zipWithIndex.map { case (n, i) => n -> row.getLong(i) }.toMap
    Seq(
      "orphan_category" -> fused("orphan_category"),
      "orphan_merchant" -> fused("orphan_merchant"),
      "orphan_payment" -> fused("orphan_payment"),
      "orphan_user" -> fused("orphan_user"),
      "orphan_date" -> fused("orphan_date"),
      "duplicate_transaction_ids" ->
        fact.groupBy("transaction_id").count().filter(col("count") > 1).count(),
      "duplicate_transaction_keys" ->
        fact.groupBy("transaction_key").count().filter(col("count") > 1).count(),
      "null_required_fields" -> fused("null_required_fields"),
      "amount_out_of_range" -> fused("amount_out_of_range"),
      "dim_natural_key_dupes" -> Seq(
        ("dim_category", "category_name"), ("dim_merchant", "merchant_name"),
        ("dim_payment_method", "payment_method_name"), ("dim_user", "user_id"),
        ("dim_date", "date")).map { case (d, k) =>
          star(d).groupBy(k).count().filter(col("count") > 1).count()
        }.sum)
  }

  def allClean(star: Map[String, DataFrame]): Boolean =
    checksFused(star).forall(_._2 == 0L)
}
