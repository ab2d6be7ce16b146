package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transform matrices mirroring /root/reference/tests/test_transform.py:
  * dedup keep-first (:117-133), per-rule filtering (:222-362), rounding
  * HALF_EVEN evidence (:366-377), dims (:516-617), pipeline integration
  * (:678-827).
  */
class TransformSpec extends SparkSpec {

  import spark.implicits._

  /** Raw rows in CSV-contract shape: (seq, txn, date, cat, amount, merchant, pay, user). */
  private def raw(rows: (Long, String, String, String, String, String, String, String)*): DataFrame =
    rows.toDF(DirtyTxns.RawColumns: _*)

  private def validRow(seq: Long, id: String, amt: String = "12.34",
                       date: String = "1996-05-07", user: String = "42") =
    (seq, id, date, "groceries", amt, "acme corp", "cash", user)

  // ------------------------------------------------------------------ dedup

  test("dedup keeps FIRST occurrence in file order, not an arbitrary row") {
    val df = raw(
      (3L, "T1", "1996-05-07", "dining", "1.00", "m", "cash", "1"),
      (1L, "T1", "1996-05-07", "groceries", "2.00", "m", "cash", "1"),
      (2L, "T1", "1996-05-07", "travel", "3.00", "m", "cash", "1"),
      (4L, "T2", "1996-05-07", "dining", "4.00", "m", "cash", "1"))
    val kept = TxnPipeline.dedupKeepFirst(df).orderBy("seq").collect()
    assert(kept.length == 2)
    assert(kept.map(_.getString(3)).toSeq == Seq("groceries", "dining"))
  }

  test("dedup groups NULL transaction_ids together (pandas NaN-equal semantics)") {
    val df = raw(
      (1L, null, "1996-05-07", "dining", "1.00", "m", "cash", "1"),
      (2L, null, "1996-05-07", "travel", "2.00", "m", "cash", "1"))
    assert(TxnPipeline.dedupKeepFirst(df).count() == 1)
  }

  // ------------------------------------------------------- standardize/coerce

  test("standardization trims, collapses whitespace and title-cases; nulls pass through") {
    val df = raw(
      (1L, "T1", "1996-05-07", "  GROCERIES ", "1.00", " o'brien   &  sons ", " CREDIT CARD ", "1"),
      (2L, "T2", "1996-05-07", null, "1.00", null, null, "1"))
    val std = TxnPipeline.standardize(df).orderBy("seq").collect()
    assert(std(0).getAs[String]("category") == "Groceries")
    assert(std(0).getAs[String]("merchant") == "O'Brien & Sons")
    assert(std(0).getAs[String]("payment_method") == "Credit Card")
    assert(std(1).getAs[String]("category") == null)
    assert(std(1).getAs[String]("merchant") == null)
    assert(std(1).getAs[String]("payment_method") == null)
  }

  test("coercion yields null on unparseable amount/date/user (errors='coerce')") {
    val df = raw(
      (1L, "T1", "not-a-date", "dining", "abc", "m", "cash", "12.5"))
    val std = TxnPipeline.standardize(df).collect()(0)
    assert(std.isNullAt(std.fieldIndex("amount")))
    assert(std.isNullAt(std.fieldIndex("date")))
    assert(std.isNullAt(std.fieldIndex("user_id")))
  }

  test("amount rounding is HALF_EVEN (reference evidence 10.999→11.00, 30.555→30.56)") {
    val cases = Seq(
      "10.999" -> 11.00, "30.555" -> 30.56, "2.675" -> 2.68, "2.665" -> 2.66,
      "1.005" -> 1.00, "1.015" -> 1.02, "-2.675" -> -2.68, "7.00" -> 7.00)
    val df = raw(cases.zipWithIndex.map { case ((a, _), i) =>
      validRow(i.toLong, s"T$i", amt = a)
    }: _*)
    val got = TxnPipeline.standardize(df).orderBy("seq")
      .select("amount").collect().map(_.getDouble(0)).toSeq
    assert(got == cases.map(_._2))
  }

  // -------------------------------------------------------------- validation

  test("per-rule validation flags match the reference's 9-rule matrix") {
    val df = raw(
      (1L, "OK1", "1996-05-07", "groceries", "10.00", "m", "cash", "1"), // valid
      (2L, null, "1996-05-07", "groceries", "10.00", "m", "cash", "1"), // null id
      (3L, "B1", "1996-05-07", "groceries", "-5.00", "m", "cash", "1"), // nonpos
      (4L, "B2", "1996-05-07", "groceries", "10000.01", "m", "cash", "1"), // excessive
      (5L, "B3", "nope", "groceries", "10.00", "m", "cash", "1"), // unparseable date
      (6L, "B4", "1989-01-01", "groceries", "10.00", "m", "cash", "1"), // too old
      (7L, "B5", "2031-01-01", "groceries", "10.00", "m", "cash", "1"), // future
      (8L, "B6", "1996-05-07", "crypto", "10.00", "m", "cash", "1"), // bad category
      (9L, "B7", "1996-05-07", "groceries", "10.00", "m", "bitcoin", "1"), // bad payment
      (10L, "B8", "1996-05-07", "groceries", "10.00", "m", "cash", "x")) // bad user
    val flags = TxnPipeline.withFlags(TxnPipeline.standardize(TxnPipeline.dedupKeepFirst(df)))
    def n(c: String) = flags.filter(col(c)).count()
    assert(n("f_null_required") == 1)
    assert(n("f_amount_nonpos") == 1)
    assert(n("f_amount_excessive") == 1)
    assert(n("f_date_unparseable") == 1)
    assert(n("f_date_old") == 1)
    assert(n("f_date_future") == 1)
    assert(n("f_category_invalid") == 1)
    assert(n("f_payment_invalid") == 1)
    assert(n("f_user_invalid") == 1)
    assert(flags.filter(col("is_valid")).count() == 1)
    assert(TxnPipeline.validTxns(flags).select("transaction_id").as[String].collect().toSeq == Seq("OK1"))
  }

  test("boundary amounts: 10000.00 is allowed, 0 is not (reference constants)") {
    val df = raw(
      validRow(1, "T1", amt = "10000.00"),
      validRow(2, "T2", amt = "0.00"),
      validRow(3, "T3", amt = "0.01"))
    val valid = TxnPipeline.cleanValid(df)
    assert(valid.select("transaction_id").as[String].collect().toSet == Set("T1", "T3"))
  }

  test("date window boundaries are inclusive") {
    val df = raw(
      validRow(1, "T1", date = TxnPipeline.MinValidDate),
      validRow(2, "T2", date = TxnPipeline.MaxValidDate))
    assert(TxnPipeline.cleanValid(df).count() == 2)
  }

  // ------------------------------------------------------------------- dims

  private val starRaw = raw(
    validRow(1, "T1", date = "1996-05-07", user = "7"),
    (2L, "T2", "1996-05-08", "dining", "20.00", "zebra shop", "debit card", "3"),
    (3L, "T3", "1996-05-07", "dining", "30.00", "acme corp", "cash", "7"),
    (4L, "T4", "1996-06-01", "travel", "40.00", "  acme   CORP ", "digital wallet", "11"))

  test("dims are distinct, sorted by natural key, with dense 1..N surrogate keys") {
    val valid = TxnPipeline.cleanValid(starRaw)
    val cats = TxnPipeline.dimCategory(valid).collect()
    assert(cats.map(_.getString(1)).toSeq == Seq("Dining", "Groceries", "Travel"))
    assert(cats.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val merch = TxnPipeline.dimMerchant(valid).collect()
    // whitespace-collapse + title-case folds '  acme   CORP ' into 'Acme Corp'
    assert(merch.map(_.getString(1)).toSeq == Seq("Acme Corp", "Zebra Shop"))
    val users = TxnPipeline.dimUser(valid).collect()
    assert(users.map(_.getLong(1)).toSeq == Seq(3L, 7L, 11L))
    assert(users.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("dim_date derives the full 11-attribute row") {
    val valid = TxnPipeline.cleanValid(raw(validRow(1, "T1", date = "1996-06-12")))
    val d = TxnPipeline.dimDate(valid).collect()(0)
    assert(d.getAs[Int]("date_key") == 19960612)
    assert(d.getAs[Int]("year") == 1996)
    assert(d.getAs[Int]("quarter") == 2)
    assert(d.getAs[Int]("month") == 6)
    assert(d.getAs[Int]("day") == 12)
    assert(d.getAs[String]("month_name") == "June")
    assert(d.getAs[String]("day_name") == "Wednesday")
    assert(d.getAs[Int]("day_of_week") == 3) // ISO: Monday=1
    assert(d.getAs[Int]("week_of_year") == 24)
    assert(!d.getAs[Boolean]("is_weekend"))
  }

  test("weekend flags: Saturday and Sunday only (ISO 6,7)") {
    val days = Seq("1996-05-04", "1996-05-05", "1996-05-06") // Sat, Sun, Mon
    val df = raw(days.zipWithIndex.map { case (d, i) => validRow(i.toLong, s"T$i", date = d) }: _*)
    val got = TxnPipeline.dimDate(TxnPipeline.cleanValid(df))
      .orderBy("date_key").select("day_of_week", "is_weekend")
      .collect().map(r => (r.getInt(0), r.getBoolean(1))).toSeq
    assert(got == Seq((6, true), (7, true), (1, false)))
  }

  // ------------------------------------------------------------------- fact

  test("fact enrichment resolves all 5 surrogate keys") {
    val valid = TxnPipeline.cleanValid(starRaw)
    val fact = TxnPipeline.buildFact(valid,
      TxnPipeline.dimCategory(valid), TxnPipeline.dimMerchant(valid),
      TxnPipeline.dimPayment(valid), TxnPipeline.dimUser(valid),
      TxnPipeline.dimDate(valid), abortOnUnmapped = true)
      .orderBy("transaction_key").collect()
    assert(fact.length == 4)
    assert(fact.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4)) // dense keys
    val keyCols = Seq("date_key", "category_key", "merchant_key", "payment_method_key", "user_key")
    fact.foreach(r => keyCols.foreach(c => assert(!r.isNullAt(r.fieldIndex(c)), c)))
  }

  test("fact enrichment ABORTS on unmapped keys instead of dropping rows") {
    val valid = TxnPipeline.cleanValid(starRaw)
    val truncatedCats = TxnPipeline.dimCategory(valid).filter(col("category_name") =!= "Travel")
    assertThrows[FactLoadError] {
      TxnPipeline.buildFact(valid, truncatedCats,
        TxnPipeline.dimMerchant(valid), TxnPipeline.dimPayment(valid),
        TxnPipeline.dimUser(valid), TxnPipeline.dimDate(valid), abortOnUnmapped = true)
        .count()
    }
  }

  test("incremental load is idempotent: second run inserts zero rows") {
    val valid = TxnPipeline.cleanValid(starRaw)
    val loaded = valid.select("transaction_id")
    val second = valid.join(loaded, Seq("transaction_id"), "left_anti")
    assert(second.count() == 0)
  }

  test("scalable dim builder produces the identical dense-key contract") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val valid = TxnPipeline.cleanValid(DirtyTxns(orders))
    val window = TxnPipeline.dimFrom(valid, "merchant", "merchant_key", "merchant_name")
      .orderBy("merchant_key").collect().toSeq
    val scalable = TxnPipeline.dimFromScalable(valid, "merchant", "merchant_key", "merchant_name")
      .orderBy("merchant_key").collect().toSeq
    assert(window == scalable)
  }

  test("bounded dim builder matches the scalable path and ENFORCES its cap") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val valid = TxnPipeline.cleanValid(DirtyTxns(orders))
    val bounded = TxnPipeline.dimCategory(valid).orderBy("category_key").collect().toSeq
    val scalable = TxnPipeline.dimFromScalable(valid, "category", "category_key", "category_name")
      .orderBy("category_key").collect().toSeq
    assert(bounded == scalable, "bounded and scalable key paths must agree row-for-row")
    // the cap is a contract, not a hint: an unbounded column through the
    // bounded path must throw, never silently collect the domain
    val e = intercept[IllegalArgumentException] {
      TxnPipeline.dimFromBounded(valid, "merchant", "merchant_key", "merchant_name", cap = 3)
    }
    assert(e.getMessage.contains("exceeds cap"))
  }

  test("withDenseKey ranks multi-partition input 1..N in order-column order, off a single partition") {
    val df = spark.range(0, 1000).toDF("n")
      .select(concat(lit("T"), format_string("%04d", col("n"))).as("transaction_id"),
        (col("n") * 3).as("payload"))
      .repartition(13) // deliberately scrambled partition placement
    // AQE legitimately coalesces a 1000-row shuffle to one partition by SIZE;
    // disable coalescing here to expose the structural property — the range
    // exchange spreads work, it never MANDATES a single partition
    val keyed = withConf("spark.sql.adaptive.coalescePartitions.enabled", "false") {
      val k = TxnPipeline.withDenseKey(df, "transaction_key", "transaction_id")
      assert(k.rdd.getNumPartitions > 1, "dense-key path must not funnel through one partition")
      k
    }
    val rows = keyed.orderBy("transaction_key").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 1000))
    assert(rows.map(_.getString(1)).toSeq == rows.map(_.getString(1)).sorted.toSeq)
    assert(rows.map(r => (r.getString(1), r.getLong(2))).forall {
      case (id, p) => p == id.drop(1).toLong * 3
    })
  }

  test("typed Dataset view round-trips the transform output") {
    val ds = TxnPipeline.cleanValidTyped(starRaw)
    val rows = ds.collect().sortBy(_.transaction_id)
    assert(rows.length == 4)
    assert(rows.head == Transaction("T1", java.sql.Date.valueOf("1996-05-07"),
      "Groceries", 12.34, "Acme Corp", "Cash", 7L))
    // typed filter/map compile and run
    assert(ds.filter(_.amount > 15.0).count() == 3)
  }

  // -------------------------------------------------------------- integration

  test("full pipeline on the derived dirty source agrees with hand counts (sf0.001)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dirty = DirtyTxns(orders)
    val nOrders = orders.count()
    val nDup = orders.filter(col("o_orderkey") % 97 === 0).count()
    assert(dirty.count() == nOrders + nDup)
    val valid = TxnPipeline.cleanValid(dirty)
    assert(valid.count() > 0 && valid.count() < nOrders)
    // every valid row survives enrichment (dims derive from the same data)
    val star = TxnPipeline.buildStar(dirty)
    assert(star("fact_transactions").count() == valid.count())
  }
}
