package graft

import org.apache.spark.sql.DataFrame

/** SURVEY §7.1 #5: queries exist as DataFrame programs AND must agree with
  * their Spark-SQL expression over registered temp views — a free self-test
  * that both frontends produce the same plans/results, plus coverage of the
  * SparkSessionExtensions-registered functions in SQL.
  */
class SqlAgreementSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val views: Unit = {
    Seq("orders", "lineitem", "part", "customer", "nation").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
    }
  }

  private def byName(name: String): DataFrame =
    SparkEntry.defs.find(_.name == name).get.run(spark, sf)

  private def agree(dfProgram: DataFrame, sql: String): Unit = {
    views
    val sqlDf = spark.sql(sql)
    assert(dfProgram.columns.toSeq == sqlDf.columns.toSeq, "column names/order")
    val a = dfProgram.collect().map(_.toSeq).toSeq
    val b = sqlDf.collect().map(_.toSeq).toSeq
    assert(a == b, s"row mismatch: ${a.take(2)} vs ${b.take(2)}")
  }

  test("q05 DataFrame program ≡ spark.sql") {
    agree(byName("q05_monthly_trends"),
      """SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
         COUNT(*) AS transaction_count,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_transaction
         FROM orders GROUP BY 1, 2 ORDER BY year, month""")
  }

  test("q13 DataFrame program ≡ spark.sql (scalar subquery)") {
    agree(byName("q13_status_distribution"),
      """SELECT o_orderstatus, COUNT(*) AS order_count,
         ROUND(CAST(100.0 AS DOUBLE) * COUNT(*) / (SELECT COUNT(*) FROM orders), 2) AS pct_of_orders
         FROM orders GROUP BY 1 ORDER BY order_count DESC, o_orderstatus""")
  }

  test("q17 DataFrame program ≡ spark.sql (CTE + LAG window)") {
    agree(byName("q17_mom_growth"),
      """WITH monthly AS (
           SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
           FROM orders GROUP BY 1, 2)
         SELECT year, month, total_spent,
                LAG(total_spent) OVER (ORDER BY year, month) AS prev_month,
                ROUND(100.0 * (total_spent - LAG(total_spent) OVER (ORDER BY year, month))
                      / NULLIF(LAG(total_spent) OVER (ORDER BY year, month), CAST(0.0 AS DOUBLE)), 2) AS growth_pct
         FROM monthly ORDER BY year, month""")
  }

  test("q11 aggregate-then-join rewrite ≡ spark.sql single-pass join+group form") {
    agree(byName("q11_top_parts"),
      """SELECT p.p_partkey, p.p_name, COUNT(*) AS times_sold,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2 ORDER BY revenue DESC, p_partkey LIMIT 20""")
  }

  test("q15 aggregate-then-join rewrite ≡ spark.sql single-pass join+group form") {
    agree(byName("q15_top_customers"),
      """SELECT c.c_custkey, c.c_name, COUNT(*) AS order_count,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
         MAX(o.o_totalprice) AS max_order
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1, 2 ORDER BY total_spent DESC, c_custkey LIMIT 10""")
  }

  test("q12 pre-aggregated distinct rewrite ≡ spark.sql COUNT(DISTINCT) form") {
    agree(byName("q12_nation_customers"),
      """SELECT n.n_name AS nation, COUNT(DISTINCT o.o_custkey) AS unique_customers,
         COUNT(*) AS order_count,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1 ORDER BY unique_customers DESC, nation LIMIT 15""")
  }

  test("q22 DataFrame rollup ≡ spark.sql GROUP BY ROLLUP") {
    agree(byName("q22_rollup_totals"),
      """SELECT year(o_orderdate) AS year, quarter(o_orderdate) AS quarter,
         COUNT(*) AS order_count,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
         FROM orders GROUP BY ROLLUP(year(o_orderdate), quarter(o_orderdate))
         ORDER BY year ASC NULLS FIRST, quarter ASC NULLS FIRST""")
  }

  test("q23 two-phase top-k ≡ spark.sql single-window ranking") {
    agree(byName("q23_top_customers_per_priority"),
      """WITH spend AS (
           SELECT o_orderpriority, o_custkey,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
           FROM orders GROUP BY 1, 2),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                     ORDER BY total_spent DESC, o_custkey) AS rank FROM spend)
         SELECT o_orderpriority, rank, o_custkey, total_spent
         FROM r WHERE rank <= 3 ORDER BY o_orderpriority, rank""")
  }

  test("extension-registered py_title works from Spark SQL") {
    val r = spark.sql("SELECT py_title(\"o'brien-smith 2x llc\") AS t").collect()(0).getString(0)
    assert(r == "O'Brien-Smith 2X Llc")
  }
}
