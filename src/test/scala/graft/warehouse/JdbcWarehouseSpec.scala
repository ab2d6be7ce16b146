package graft.warehouse

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec

/** JDBC load-path tests against embedded Derby, mirroring the reference's
  * tests/test_load.py matrices: batched insert round-trip, run-twice
  * idempotency (:135-223), and transactional rollback-on-error (:703-924 —
  * a failed publish must leave EVERY target at its previous contents).
  */
class JdbcWarehouseSpec extends SparkSpec {

  import spark.implicits._

  private lazy val url: String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    val u = s"jdbc:derby:$dir/wh;create=true"
    val conn = DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      // explicit DDL (the reference's sql/schema.sql approach): PK on the
      // targets, plain twins for staging
      st.executeUpdate("CREATE TABLE txns (transaction_id VARCHAR(32) PRIMARY KEY, amount DOUBLE)")
      st.executeUpdate("CREATE TABLE txns_stage (transaction_id VARCHAR(32), amount DOUBLE)")
      st.executeUpdate("CREATE TABLE dim_cat (category_key INT PRIMARY KEY, category_name VARCHAR(64))")
      st.executeUpdate("CREATE TABLE dim_cat_stage (category_key INT, category_name VARCHAR(64))")
      st.close()
    } finally conn.close()
    u
  }

  private def txns(ids: Range) = ids.map(i => (f"T$i%04d", i * 1.5)).toDF("transaction_id", "amount")

  private def readTable(table: String) = spark.read.jdbc(url, table, new java.util.Properties)

  test("batched JDBC append round-trips through per-partition batchsize inserts") {
    JdbcWarehouse.appendBatched(txns(0 until 25).repartition(3), url, "txns", batchSize = 10)
    val back = readTable("txns")
    assert(back.count() == 25)
    val row = back.filter($"TRANSACTION_ID" === "T0007").collect()(0)
    assert(row.getDouble(1) == 10.5)
  }

  test("idempotent append: re-running the same batch inserts zero rows, new keys insert") {
    // depends on the previous test's 25 rows (shared embedded db, ordered suite)
    val again = JdbcWarehouse.appendIdempotent(txns(0 until 25), url, "txns", "transaction_id")
    assert(again == 0)
    assert(readTable("txns").count() == 25)
    val grown = JdbcWarehouse.appendIdempotent(txns(0 until 30), url, "txns", "transaction_id")
    assert(grown == 5)
    assert(readTable("txns").count() == 30)
  }

  test("existing-key read parallelizes over numeric keys (bounded stride scan)") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE fact_k (row_key BIGINT PRIMARY KEY, v DOUBLE)")
      st.close()
    } finally conn.close()
    JdbcWarehouse.appendBatched(
      (0L until 100L).map(i => (i, i * 0.5)).toDF("row_key", "v"), url, "fact_k")
    val keys = JdbcWarehouse.existingKeys(spark, url, "fact_k", "row_key", numPartitions = 3)
    assert(keys.rdd.getNumPartitions == 3, "numeric key read must split into stride partitions")
    assert(keys.count() == 100)
    // idempotency through the parallel read: re-run inserts 0, growth inserts the delta
    val again = JdbcWarehouse.appendIdempotent(
      (0L until 100L).map(i => (i, i * 0.5)).toDF("row_key", "v"), url, "fact_k", "row_key",
      keyReadPartitions = 3)
    assert(again == 0)
    val grown = JdbcWarehouse.appendIdempotent(
      (0L until 120L).map(i => (i, i * 0.5)).toDF("row_key", "v"), url, "fact_k", "row_key",
      keyReadPartitions = 3)
    assert(grown == 20)
    assert(readTable("fact_k").count() == 120)
    // empty-table fallback: bounds are NULL, read degrades to one partition
    val conn2 = DriverManager.getConnection(url)
    try {
      val st = conn2.createStatement()
      st.executeUpdate("CREATE TABLE fact_empty (row_key BIGINT PRIMARY KEY, v DOUBLE)")
      st.close()
    } finally conn2.close()
    assert(JdbcWarehouse.existingKeys(spark, url, "fact_empty", "row_key").count() == 0)
  }

  test("transactional publish replaces every target's contents atomically") {
    val cats = Seq((1, "Groceries"), (2, "Dining")).toDF("category_key", "category_name")
    JdbcWarehouse.publishTransactional(url,
      Map("txns" -> txns(100 until 110), "dim_cat" -> cats))
    assert(readTable("txns").count() == 10)
    assert(readTable("dim_cat").count() == 2)
    // second publish REPLACES (snapshot semantics), not appends
    JdbcWarehouse.publishTransactional(url,
      Map("txns" -> txns(200 until 215), "dim_cat" -> cats.limit(1)))
    assert(readTable("txns").count() == 15)
    assert(readTable("dim_cat").count() == 1)
  }

  test("catalog verification: star DDL passes, drift is reported (verify_schema.sql twin)") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE dim_date (date_key INT PRIMARY KEY, "DATE" DATE, "YEAR" INT,
           "QUARTER" INT, "MONTH" INT, "DAY" INT, month_name VARCHAR(16), day_name VARCHAR(16),
           day_of_week INT, week_of_year INT, is_weekend BOOLEAN)""")
      st.executeUpdate("CREATE TABLE dim_category (category_key INT PRIMARY KEY, category_name VARCHAR(64))")
      st.executeUpdate("CREATE TABLE dim_merchant (merchant_key INT PRIMARY KEY, merchant_name VARCHAR(128))")
      st.executeUpdate("CREATE TABLE dim_payment_method (payment_method_key INT PRIMARY KEY, payment_method_name VARCHAR(64))")
      st.executeUpdate("CREATE TABLE dim_user (user_key INT PRIMARY KEY, user_id BIGINT)")
      st.executeUpdate(
        """CREATE TABLE fact_transactions (
           transaction_key INT PRIMARY KEY, transaction_id VARCHAR(64),
           date_key INT REFERENCES dim_date(date_key),
           category_key INT REFERENCES dim_category(category_key),
           merchant_key INT REFERENCES dim_merchant(merchant_key),
           payment_method_key INT REFERENCES dim_payment_method(payment_method_key),
           user_key INT REFERENCES dim_user(user_key),
           amount DOUBLE)""")
      st.close()
    } finally conn.close()
    val check = JdbcWarehouse.verifyCatalog(url, JdbcWarehouse.StarCatalog)
    assert(check.ok, s"catalog drift: ${check.problems.mkString("; ")}")
    assert(check.indexes("fact_transactions").nonEmpty, "PK must have a backing index")
    // drift detection: a wrong expectation must be reported, not ignored
    val drift = JdbcWarehouse.verifyCatalog(url, Map(
      "dim_user" -> JdbcWarehouse.TableSpec(Seq("user_key", "user_id", "ghost_col"),
        pk = Seq("user_key")),
      "dim_ghost" -> JdbcWarehouse.TableSpec(Seq("x"))))
    assert(!drift.ok)
    assert(drift.problems.exists(_.contains("dim_user")))
    assert(drift.problems.exists(_.contains("missing table dim_ghost")))
  }

  test("failed publish rolls back ALL targets to the previous snapshot") {
    // duplicate PKs in the staged txns make the INSERT..SELECT violate the
    // target's primary key inside the swap transaction
    val dupes = Seq(("TDUP", 1.0), ("TDUP", 2.0)).toDF("transaction_id", "amount")
    val cats = Seq((7, "Travel")).toDF("category_key", "category_name")
    val before = {
      val t = readTable("txns").collect().map(_.getString(0)).sorted.toSeq
      val c = readTable("dim_cat").collect().map(_.getInt(0)).sorted.toSeq
      (t, c)
    }
    assertThrows[java.sql.SQLException] {
      JdbcWarehouse.publishTransactional(url,
        Map("dim_cat" -> cats, "txns" -> dupes))
    }
    val after = {
      val t = readTable("txns").collect().map(_.getString(0)).sorted.toSeq
      val c = readTable("dim_cat").collect().map(_.getInt(0)).sorted.toSeq
      (t, c)
    }
    assert(after == before, "a failed publish must be invisible in every target")
  }
}
