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

  def allClean(star: Map[String, DataFrame]): Boolean =
    checks(star).forall(_._2 == 0L)
}
