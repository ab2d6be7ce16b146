package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic "dirty CSV" transactions source derived from `orders`.
  *
  * The reference ingests a 7-column CSV of transactions with real-world dirt
  * (/root/reference/src/config.py:45-53 contract; tests/conftest.py:174-231
  * dirty fixtures). The driver's testdata has no CSV, so the raw frame is
  * DERIVED from the orders table by pure integer/string arithmetic on
  * (o_orderkey, o_custkey, o_orderdate) — expressible identically in Spark
  * and in the DuckDB oracle, which makes every downstream ETL stage
  * hash-checkable end-to-end.
  *
  * Dirt injected (k = o_orderkey, c = o_custkey), mirroring the reference's
  * dirty-fixture matrix:
  *   - duplicates:      k%97=0 emits a second row (same transaction_id,
  *                      different amount, later file order) → dedup keep-first
  *   - null txn id:     k%211=0
  *   - unparseable date k%101=0, future date k%103=0, too-old date k%107=0
  *   - unparseable amt  k%113=0, null amt k%127=0, negative amt k%131=0,
  *     3-decimal amt    k%17=0 (exercises pandas HALF_EVEN rounding)
  *   - non-int user id  k%137=0, null user id k%139=0
  *   - invalid category k%109=0, invalid payment k%149=0
  *   - whitespace/case dirt on category/merchant/payment throughout,
  *     including the apostrophe/digit title-case edges ("o'brien & sons",
  *     "d'angelo-smith 2x llc").
  */
object DirtyTxns {

  val Categories: Seq[String] = Seq(
    "groceries", "dining", "transport", "entertainment",
    "utilities", "healthcare", "shopping", "travel")

  val Payments: Seq[String] = Seq("credit card", "debit card", "cash", "digital wallet")

  /** Columns of the raw frame (the CSV contract plus `seq` = file order). */
  val RawColumns: Seq[String] = Seq(
    "seq", "transaction_id", "date", "category", "amount",
    "merchant", "payment_method", "user_id")

  // --------------------------------------------------------------- Spark side

  private def rows(orders: DataFrame, dup: Boolean): DataFrame = {
    val k = col("o_orderkey")
    val c = col("o_custkey")
    val seqCol = if (dup) k * 2 + 1 else k * 2
    val cents0 = (k * 7919) % 1100000
    val cents = if (dup) cents0 + 111 else cents0

    val catBase = element_at(
      array(Categories.map(lit): _*), (k % 8).cast("int") + 1)
    val category = when(k % 109 === 0, lit("unknown category"))
      .when(k % 3 === 0, concat(lit("  "), upper(catBase)))
      .when(k % 3 === 1, concat(catBase, lit("   ")))
      .otherwise(catBase)

    val c50 = (c % 50).cast("string")
    val merchant = when(c % 4 === 0, concat(lit("o'brien & sons   no. "), c50))
      .when(c % 4 === 1, concat(lit("ACME  corp "), c50))
      .when(c % 4 === 2, lit("d'angelo-smith 2x llc"))
      .otherwise(concat(lit("  global   mart no."), c50))

    val payBase = element_at(array(Payments.map(lit): _*), (k % 4).cast("int") + 1)
    val payment = when(k % 149 === 0, lit("bitcoin"))
      .when(k % 5 === 0, upper(payBase))
      .when(k % 7 === 0, concat(lit("  "), payBase, lit(" ")))
      .otherwise(payBase)

    val amountBody = concat(
      when(k % 131 === 0, lit("-")).otherwise(lit("")),
      (cents / 100).cast("long").cast("string"),
      lit("."),
      lpad((cents % 100).cast("string"), 2, "0"),
      when(k % 17 === 0, lit("5")).otherwise(lit("")))
    val amount = when(k % 113 === 0, lit("abc"))
      .when(k % 127 === 0, lit(null).cast("string"))
      .otherwise(amountBody)

    val dateStr = when(k % 101 === 0, lit("not-a-date"))
      .when(k % 103 === 0, lit("2031-12-31"))
      .when(k % 107 === 0, lit("1989-06-15"))
      .otherwise(col("o_orderdate").cast("date").cast("string"))

    val txnId = when(k % 211 === 0, lit(null).cast("string"))
      .otherwise(concat(lit("TXN-"), lpad(k.cast("string"), 9, "0")))

    val userId = when(k % 137 === 0, lit("12.5"))
      .when(k % 139 === 0, lit(null).cast("string"))
      .otherwise(c.cast("string"))

    orders.select(
      seqCol.as("seq"),
      txnId.as("transaction_id"),
      dateStr.as("date"),
      category.as("category"),
      amount.as("amount"),
      merchant.as("merchant"),
      payment.as("payment_method"),
      userId.as("user_id"))
  }

  /** The raw dirty frame: one row per order plus duplicate rows for k%97=0. */
  def apply(orders: DataFrame): DataFrame =
    rows(orders, dup = false).union(rows(orders.filter(col("o_orderkey") % 97 === 0), dup = true))

  // -------------------------------------------------------------- oracle side

  private def sqlRows(dup: Boolean): String = {
    val seq = if (dup) "o_orderkey*2+1" else "o_orderkey*2"
    val cents = if (dup) "((o_orderkey*7919) % 1100000 + 111)" else "((o_orderkey*7919) % 1100000)"
    val cats = Categories.map(s => s"'$s'").mkString(", ")
    val pays = Payments.map(s => s"'$s'").mkString(", ")
    val where = if (dup) "WHERE o_orderkey % 97 = 0" else ""
    s"""SELECT $seq AS seq,
       CASE WHEN o_orderkey % 211 = 0 THEN NULL
            ELSE 'TXN-' || lpad(CAST(o_orderkey AS VARCHAR), 9, '0') END AS transaction_id,
       CASE WHEN o_orderkey % 101 = 0 THEN 'not-a-date'
            WHEN o_orderkey % 103 = 0 THEN '2031-12-31'
            WHEN o_orderkey % 107 = 0 THEN '1989-06-15'
            ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) END AS date,
       CASE WHEN o_orderkey % 109 = 0 THEN 'unknown category'
            WHEN o_orderkey % 3 = 0 THEN '  ' || upper(([$cats])[CAST(o_orderkey % 8 AS INT) + 1])
            WHEN o_orderkey % 3 = 1 THEN ([$cats])[CAST(o_orderkey % 8 AS INT) + 1] || '   '
            ELSE ([$cats])[CAST(o_orderkey % 8 AS INT) + 1] END AS category,
       CASE WHEN o_orderkey % 113 = 0 THEN 'abc'
            WHEN o_orderkey % 127 = 0 THEN NULL
            ELSE (CASE WHEN o_orderkey % 131 = 0 THEN '-' ELSE '' END)
                 || CAST($cents // 100 AS VARCHAR) || '.'
                 || lpad(CAST($cents % 100 AS VARCHAR), 2, '0')
                 || (CASE WHEN o_orderkey % 17 = 0 THEN '5' ELSE '' END) END AS amount,
       CASE WHEN o_custkey % 4 = 0 THEN 'o''brien & sons   no. ' || CAST(o_custkey % 50 AS VARCHAR)
            WHEN o_custkey % 4 = 1 THEN 'ACME  corp ' || CAST(o_custkey % 50 AS VARCHAR)
            WHEN o_custkey % 4 = 2 THEN 'd''angelo-smith 2x llc'
            ELSE '  global   mart no.' || CAST(o_custkey % 50 AS VARCHAR) END AS merchant,
       CASE WHEN o_orderkey % 149 = 0 THEN 'bitcoin'
            WHEN o_orderkey % 5 = 0 THEN upper(([$pays])[CAST(o_orderkey % 4 AS INT) + 1])
            WHEN o_orderkey % 7 = 0 THEN '  ' || ([$pays])[CAST(o_orderkey % 4 AS INT) + 1] || ' '
            ELSE ([$pays])[CAST(o_orderkey % 4 AS INT) + 1] END AS payment_method,
       CASE WHEN o_orderkey % 137 = 0 THEN '12.5'
            WHEN o_orderkey % 139 = 0 THEN NULL
            ELSE CAST(o_custkey AS VARCHAR) END AS user_id
       FROM orders $where"""
  }

  /** DuckDB CTE body producing the identical raw frame. */
  def oracleCte: String =
    s"(${sqlRows(dup = false)}) UNION ALL (${sqlRows(dup = true)})"
}
