package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Det._
import graft.functions.DateFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's 19 declared analytics queries (/root/reference/sql/queries.sql,
  * SURVEY.md §2.B Q1-Q19) re-expressed Spark-first over the TPC-H-ish star in
  * /root/testdata: orders plays fact_transactions, customer/part/nation play the
  * dimensions, o_orderpriority/o_orderstatus/l_returnflag play the enum dims.
  *
  * Every query is a declarative DataFrame program — Catalyst does predicate
  * pushdown, column pruning into the parquet scan, broadcast-join selection for
  * the small dimensions, and partial (map-side) aggregation. Scale notes per
  * query where the plan shape matters at 100 TB.
  */
object StarQueries {

  private def q(name: String, oracle: String, headline: Boolean = false)(
      f: Tables => DataFrame): QueryDef =
    QueryDef(name, (s: SparkSession, dir: String) => f(Tables(s, dir)), Some(oracle), headline)

  // ---------------------------------------------------------------------------
  // Q1 — record counts across all tables (sql/queries.sql:24-35).
  // Seven parallel COUNT(*) scans UNION ALL'd; count-only scans read parquet
  // row-group metadata, no column data.
  private val q01 = q(
    "q01_record_counts",
    """SELECT * FROM (
       SELECT 'region' AS table_name, COUNT(*) AS record_count FROM region
       UNION ALL SELECT 'nation', COUNT(*) FROM nation
       UNION ALL SELECT 'customer', COUNT(*) FROM customer
       UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
       UNION ALL SELECT 'part', COUNT(*) FROM part
       UNION ALL SELECT 'orders', COUNT(*) FROM orders
       UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
       ) ORDER BY table_name""") { t =>
    def one(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("record_count")).select(lit(name).as("table_name"), col("record_count"))
    one("region", t.region)
      .union(one("nation", t.nation))
      .union(one("customer", t.customer))
      .union(one("supplier", t.supplier))
      .union(one("part", t.part))
      .union(one("orders", t.orders))
      .union(one("lineitem", t.lineitem))
      .orderBy("table_name")
  }

  // Q2 — orphaned fact rows (NOT EXISTS x3, OR-combined; sql/queries.sql:40-46).
  // Shape: fact left-joins each parent's PRIMARY-KEY column (o_orderkey /
  // p_partkey / s_suppkey are unique, so no distinct() pre-shuffle and no row
  // duplication), keep rows missing any parent. No broadcast hints: orders /
  // part / supplier all grow with scale factor, so AQE picks broadcast vs
  // shuffle at runtime from the observed sizes.
  private val q02 = q(
    "q02_orphaned_facts",
    """SELECT COUNT(*) AS orphan_count FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          OR NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
          OR NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)""") { t =>
    t.lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
      .join(t.orders.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left")
      .join(t.part.select(col("p_partkey")), col("l_partkey") === col("p_partkey"), "left")
      .join(t.supplier.select(col("s_suppkey")), col("l_suppkey") === col("s_suppkey"), "left")
      .filter(col("o_orderkey").isNull || col("p_partkey").isNull || col("s_suppkey").isNull)
      .agg(count(lit(1)).as("orphan_count"))
  }

  // Q3 — duplicate-key detection via GROUP BY + HAVING (sql/queries.sql:51-54):
  // customers holding more than one order.
  private val q03 = q(
    "q03_duplicate_keys",
    """SELECT o_custkey, COUNT(*) AS order_count FROM orders
       GROUP BY o_custkey HAVING COUNT(*) > 1
       ORDER BY order_count DESC, o_custkey""") { t =>
    t.orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("order_count"))
      .filter(col("order_count") > 1)
      .orderBy(col("order_count").desc, col("o_custkey"))
  }

  // Q4 — amount data-quality stats incl. exact interpolated median
  // (sql/queries.sql:59-65). percentile() is the exact variant —
  // percentile_approx would break the oracle. Median is rounded to 6dp:
  // the two engines interpolate with algebraically equal but floating-point-
  // different formulas.
  private val q04 = q(
    "q04_amount_stats",
    s"""SELECT COUNT(*) AS total_orders,
        MIN(o_totalprice) AS min_amount,
        MAX(o_totalprice) AS max_amount,
        ROUND(${sqlDavg("o_totalprice")}, 6) AS avg_amount,
        ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 6) AS median_amount
        FROM orders""") { t =>
    t.orders.agg(
      count(lit(1)).as("total_orders"),
      min("o_totalprice").as("min_amount"),
      max("o_totalprice").as("max_amount"),
      round(davg(col("o_totalprice")), 6).as("avg_amount"),
      round(percentile(col("o_totalprice"), lit(0.5)).cast("double"), 6).as("median_amount"))
  }

  // Q5 — monthly spending trends (sql/queries.sql:74-84): group fact by
  // calendar month. Decimal partial aggregation → ~12-80 groups; the shuffle
  // moves only one row per (partition, group) thanks to map-side combine.
  private val q05 = q(
    "q05_monthly_trends",
    s"""SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
        COUNT(*) AS transaction_count,
        ${sqlDsum("o_totalprice")} AS total_spent,
        ROUND(${sqlDavg("o_totalprice")}, 6) AS avg_transaction
        FROM orders GROUP BY 1, 2 ORDER BY year, month""",
    headline = true) { t =>
    t.orders
      .groupBy(year(col("o_orderdate")).as("year"), month(col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("transaction_count"),
        dsum(col("o_totalprice")).as("total_spent"),
        round(davg(col("o_totalprice")), 6).as("avg_transaction"))
      .orderBy("year", "month")
  }

  // Q6 — quarterly comparison (sql/queries.sql:89-97).
  private val q06 = q(
    "q06_quarterly",
    s"""SELECT year(o_orderdate) AS year, quarter(o_orderdate) AS quarter,
        COUNT(*) AS transaction_count, ${sqlDsum("o_totalprice")} AS total_spent
        FROM orders GROUP BY 1, 2 ORDER BY year, quarter""") { t =>
    t.orders
      .groupBy(year(col("o_orderdate")).as("year"), quarter(col("o_orderdate")).as("quarter"))
      .agg(count(lit(1)).as("transaction_count"), dsum(col("o_totalprice")).as("total_spent"))
      .orderBy("year", "quarter")
  }

  // Q7 — day-of-week patterns (sql/queries.sql:102-111). ISO dow derived in
  // the plan (DateFns.isoDayOfWeek) — pure expression, stays in codegen.
  private val q07 = q(
    "q07_dow_patterns",
    s"""SELECT isodow(o_orderdate) AS day_of_week, dayname(o_orderdate) AS day_name,
        COUNT(*) AS transaction_count,
        ${sqlDsum("o_totalprice")} AS total_spent,
        ROUND(${sqlDavg("o_totalprice")}, 6) AS avg_transaction
        FROM orders GROUP BY 1, 2 ORDER BY day_of_week""") { t =>
    t.orders
      .groupBy(
        isoDayOfWeek(col("o_orderdate")).as("day_of_week"),
        dayName(col("o_orderdate")).as("day_name"))
      .agg(
        count(lit(1)).as("transaction_count"),
        dsum(col("o_totalprice")).as("total_spent"),
        round(davg(col("o_totalprice")), 6).as("avg_transaction"))
      .orderBy("day_of_week")
  }

  // Q8 — weekend vs weekday split (sql/queries.sql:116-124): CASE WHEN label
  // then group.
  private val q08 = q(
    "q08_weekend_split",
    s"""SELECT CASE WHEN isodow(o_orderdate) IN (6,7) THEN 'Weekend' ELSE 'Weekday' END AS day_type,
        COUNT(*) AS transaction_count,
        ${sqlDsum("o_totalprice")} AS total_spent,
        ROUND(${sqlDavg("o_totalprice")}, 6) AS avg_transaction
        FROM orders GROUP BY 1 ORDER BY day_type""") { t =>
    t.orders
      .groupBy(when(isWeekend(col("o_orderdate")), "Weekend").otherwise("Weekday").as("day_type"))
      .agg(
        count(lit(1)).as("transaction_count"),
        dsum(col("o_totalprice")).as("total_spent"),
        round(davg(col("o_totalprice")), 6).as("avg_transaction"))
      .orderBy("day_type")
  }

  // Q9 — top categories with % of total (sql/queries.sql:133-142): scalar
  // subquery for the grand total. In Spark the scalar is a 1-row DataFrame
  // cross-joined in (broadcast nested loop of a single row — free); Catalyst
  // plans the same for a scalar subquery in SQL.
  private val q09 = q(
    "q09_returnflag_pct",
    s"""SELECT l_returnflag,
        COUNT(*) AS transaction_count,
        ${sqlDsum6("l_extendedprice * (1 - l_discount)")} AS revenue,
        ROUND(100.0 * ${sqlDsum6("l_extendedprice * (1 - l_discount)")} /
          (SELECT ${sqlDsum6("l_extendedprice * (1 - l_discount)")} FROM lineitem), 2) AS pct_of_total
        FROM lineitem GROUP BY l_returnflag ORDER BY revenue DESC, l_returnflag""",
    headline = true) { t =>
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val total = t.lineitem.agg(dsum6(rev).as("grand_total"))
    t.lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("transaction_count"), dsum6(rev).as("revenue"))
      .crossJoin(broadcast(total))
      .select(
        col("l_returnflag"),
        col("transaction_count"),
        col("revenue"),
        round(lit(100.0) * col("revenue") / col("grand_total"), 2).as("pct_of_total"))
      .orderBy(col("revenue").desc, col("l_returnflag"))
  }

  // Q10 — category-by-month pivot via conditional aggregation
  // (sql/queries.sql:147-158): SUM(CASE WHEN ...) x priority bucket. One pass,
  // one shuffle — the pivot is map-side expressions, not a join.
  private val q10 = q(
    "q10_priority_pivot",
    s"""SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
        ${sqlDsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END")} AS urgent_total,
        ${sqlDsum("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice ELSE 0 END")} AS high_total,
        ${sqlDsum("CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice ELSE 0 END")} AS medium_total,
        ${sqlDsum("CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN o_totalprice ELSE 0 END")} AS low_total
        FROM orders GROUP BY 1, 2 ORDER BY year, month""") { t =>
    def bucket(cond: org.apache.spark.sql.Column) =
      dsum(when(cond, col("o_totalprice")).otherwise(lit(0)))
    t.orders
      .groupBy(year(col("o_orderdate")).as("year"), month(col("o_orderdate")).as("month"))
      .agg(
        bucket(col("o_orderpriority") === "1-URGENT").as("urgent_total"),
        bucket(col("o_orderpriority") === "2-HIGH").as("high_total"),
        bucket(col("o_orderpriority") === "3-MEDIUM").as("medium_total"),
        bucket(col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")).as("low_total"))
      .orderBy("year", "month")
  }

  // Q11 — top-20 merchants → top-20 parts by revenue (sql/queries.sql:167-178).
  // AGGREGATE-THEN-JOIN with the LIMIT pushed below the name join — the two
  // rewrites Catalyst doesn't do itself: (1) the rollup runs on lineitem
  // keyed by l_partkey (map-side combine shrinks each partition to its
  // distinct partkeys; only (key, count, sum) triples shuffle — the raw
  // form dragged p_name through a fact-sized join AND a fact-sized
  // aggregation shuffle); (2) the top-20 is taken BEFORE the join
  // (TakeOrderedAndProject on the |parts|-sized rollup), so part is joined
  // against 20 broadcast rows instead of the whole fact. Equivalent because
  // p_partkey is the part PK (one name per key) and every l_partkey
  // resolves (referential integrity) — the same rows survive either order.
  private val q11 = q(
    "q11_top_parts",
    s"""SELECT p.p_partkey, p.p_name,
        COUNT(*) AS times_sold,
        ${sqlDsum6("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2 ORDER BY revenue DESC, p_partkey LIMIT 20""",
    headline = true) { t =>
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val top = t.lineitem
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(count(lit(1)).as("times_sold"), dsum6(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey"))
      .limit(20)
    broadcast(top)
      .join(t.part.select("p_partkey", "p_name"), Seq("p_partkey"))
      .select("p_partkey", "p_name", "times_sold", "revenue")
      .orderBy(col("revenue").desc, col("p_partkey"))
  }

  // Q12 — merchant visit frequency → customers per nation with COUNT(DISTINCT)
  // (sql/queries.sql:183-192). countDistinct expands to a two-phase aggregate;
  // the distinct set (custkey) is re-shuffled once — unavoidable for exact
  // distinct; approx_count_distinct is the 100TB escape hatch when 2% error is
  // acceptable.
  private val q12 = q(
    "q12_nation_customers",
    s"""SELECT n.n_name AS nation,
        COUNT(DISTINCT o.o_custkey) AS unique_customers,
        COUNT(*) AS order_count,
        ${sqlDsum("o.o_totalprice")} AS total_spent
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1 ORDER BY unique_customers DESC, nation LIMIT 15""") { t =>
    // AGGREGATE-THEN-JOIN: rolling orders up per custkey first shrinks the
    // customer join from |orders| rows to |customers| rows AND turns the
    // COUNT(DISTINCT custkey) into a plain count (each custkey is one row
    // after the rollup — no two-phase distinct expansion re-shuffling the
    // key set). The spend stays decimal between the two levels (dsumPartial/
    // dsumMerge) so the total is bit-equal to the one-pass sum.
    t.orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsumPartial(col("o_totalprice")).as("spent_dec"))
      .join(t.customer.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("unique_customers"),
        sum(col("n_orders")).as("order_count"),
        dsumMerge(col("spent_dec")).as("total_spent"))
      .orderBy(col("unique_customers").desc, col("nation"))
      .limit(15)
  }

  // Q13 — payment-method usage distribution → order-status distribution with
  // scalar-subquery % of all orders (sql/queries.sql:201-210).
  private val q13 = q(
    "q13_status_distribution",
    """SELECT o_orderstatus,
       COUNT(*) AS order_count,
       ROUND(100.0 * COUNT(*) / (SELECT COUNT(*) FROM orders), 2) AS pct_of_orders
       FROM orders GROUP BY 1 ORDER BY order_count DESC, o_orderstatus""") { t =>
    val total = t.orders.agg(count(lit(1)).as("n_total"))
    t.orders.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("order_count"))
      .crossJoin(broadcast(total))
      .select(
        col("o_orderstatus"),
        col("order_count"),
        round(lit(100.0) * col("order_count") / col("n_total"), 2).as("pct_of_orders"))
      .orderBy(col("order_count").desc, col("o_orderstatus"))
  }

  // Q14 — payment method by category → priority x status matrix
  // (sql/queries.sql:215-224).
  private val q14 = q(
    "q14_priority_by_status",
    s"""SELECT o_orderpriority, o_orderstatus,
        COUNT(*) AS order_count, ${sqlDsum("o_totalprice")} AS total_spent
        FROM orders GROUP BY 1, 2 ORDER BY o_orderpriority, o_orderstatus""") { t =>
    t.orders.groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("order_count"), dsum(col("o_totalprice")).as("total_spent"))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  // Q15 — top-10 users by spend (sql/queries.sql:232-243). Same
  // aggregate-then-join rewrite as q11: the rollup runs per custkey straight
  // off the orders scan (c_name never near the fact), the top-10 is taken on
  // the |customers|-sized rollup, and the customer dim is joined against 10
  // broadcast rows for the name. Equivalent because c_custkey is the
  // customer PK and every o_custkey resolves.
  private val q15 = q(
    "q15_top_customers",
    s"""SELECT c.c_custkey, c.c_name,
        COUNT(*) AS order_count,
        ${sqlDsum("o.o_totalprice")} AS total_spent,
        MAX(o.o_totalprice) AS max_order
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2 ORDER BY total_spent DESC, c_custkey LIMIT 10""") { t =>
    val top = t.orders
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("total_spent"),
        max(col("o_totalprice")).as("max_order"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(10)
    broadcast(top)
      .join(t.customer.select("c_custkey", "c_name"), Seq("c_custkey"))
      .select("c_custkey", "c_name", "order_count", "total_spent", "max_order")
      .orderBy(col("total_spent").desc, col("c_custkey"))
  }

  // Q16 — top-5 customers' breakdown via IN-subquery → left-semi join against
  // a top-k (sql/queries.sql:248-266). The top-5 set is tiny → broadcast semi
  // join; no shuffle of the big side.
  private val q16 = q(
    "q16_top5_breakdown",
    s"""SELECT o_custkey, o_orderstatus,
        COUNT(*) AS order_count, ${sqlDsum("o_totalprice")} AS total_spent
        FROM orders
        WHERE o_custkey IN (
          SELECT o_custkey FROM orders GROUP BY o_custkey
          ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) DESC, o_custkey LIMIT 5)
        GROUP BY 1, 2 ORDER BY o_custkey, o_orderstatus""") { t =>
    val top5 = t.orders.groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("spend"))
      .orderBy(col("spend").desc, col("o_custkey"))
      .limit(5)
      .select("o_custkey")
    t.orders.join(broadcast(top5), Seq("o_custkey"), "left_semi")
      .groupBy("o_custkey", "o_orderstatus")
      .agg(count(lit(1)).as("order_count"), dsum(col("o_totalprice")).as("total_spent"))
      .orderBy("o_custkey", "o_orderstatus")
  }

  // Q17 — month-over-month growth: CTE + LAG (sql/queries.sql:275-296). The
  // monthly rollup is bounded (≤12 rows/year of data, ever), so instead of a
  // global-ORDER-BY window — the one WindowExec shape that serializes through
  // a single partition and can't be distinguished at runtime from a genuine
  // scale bug — LAG is expressed as "value at the greatest earlier month":
  // a broadcast self-join of the tiny rollup + max_by. Same previous-PRESENT-
  // month semantics as LAG (not calendar-month arithmetic, which would differ
  // on gappy data); every runtime plan in the engine is now free of
  // unpartitioned windows.
  private val q17 = q(
    "q17_mom_growth",
    s"""WITH monthly AS (
          SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
                 ${sqlDsum("o_totalprice")} AS total_spent
          FROM orders GROUP BY 1, 2)
        SELECT year, month, total_spent,
               LAG(total_spent) OVER (ORDER BY year, month) AS prev_month,
               ROUND(100.0 * (total_spent - LAG(total_spent) OVER (ORDER BY year, month))
                     / NULLIF(LAG(total_spent) OVER (ORDER BY year, month), 0), 2) AS growth_pct
        FROM monthly ORDER BY year, month""",
    headline = true) { t =>
    val monthly = t.orders
      .groupBy(year(col("o_orderdate")).as("year"), month(col("o_orderdate")).as("month"))
      .agg(dsum(col("o_totalprice")).as("total_spent"))
      .withColumn("idx", col("year") * 12 + col("month"))
    val prev = monthly.select(col("idx").as("p_idx"), col("total_spent").as("p_total"))
    monthly.join(broadcast(prev), col("p_idx") < col("idx"), "left")
      .groupBy("year", "month", "total_spent")
      .agg(max_by(col("p_total"), col("p_idx")).as("prev_month"))
      .withColumn(
        "growth_pct",
        round(lit(100.0) * (col("total_spent") - col("prev_month")) /
          nullif(col("prev_month"), lit(0.0)), 2))
      .select("year", "month", "total_spent", "prev_month", "growth_pct")
      .orderBy("year", "month")
  }

  // Q18 — running total per category (sql/queries.sql:301-313): running SUM
  // OVER (PARTITION BY status ORDER BY date ROWS UNBOUNDED PRECEDING). The
  // order key is made unique (date, orderkey) so prefix sums are
  // deterministic; sums run in decimal so the prefix is exact. The window
  // formulation (the oracle) hash-exchanges the WHOLE table onto the 3
  // status values — a single-task-per-group funnel at any scale (VERDICT
  // r10 #1) — so the runtime plan is the grouped two-phase prefix sum
  // instead: range-partition by (status, date, orderkey), per-partition
  // per-group partials, driver-side offsets over |groups×partitions| rows,
  // offset + local running sum. Decimal arithmetic rides exact unscaled
  // longs, so the DECIMAL(38,2)→double result is bit-identical to the
  // window's SUM(decimal) and the oracle is unchanged.
  private val q18 = q(
    "q18_running_total",
    """SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS order_date, o_orderkey, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
       FROM orders ORDER BY o_orderstatus, order_date, o_orderkey""") { t =>
    val base = t.orders
      .select(col("o_orderstatus"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"), col("o_totalprice").cast("decimal(18,2)").as("tp_dec"))
    graft.operators.PrefixSum.withGroupedRunningSum(base,
        groupCols = Seq("o_orderstatus"),
        orderCols = Seq("o_orderdate", "o_orderkey"),
        valueCol = "tp_dec", outCol = "rt_dec")
      .withColumn("running_total", col("rt_dec").cast("double"))
      .withColumn("order_date", col("o_orderdate").cast("date"))
      .select("o_orderstatus", "order_date", "o_orderkey", "o_totalprice", "running_total")
      .orderBy("o_orderstatus", "order_date", "o_orderkey")
  }

  // Q19 — anomaly detection by z-score (sql/queries.sql:317-340): per-group
  // moments via CTE, join back, filter x > mean + 1.5*stddev (the reference
  // uses 3*mean; this data is near-uniform so that returns nothing — same
  // operator shape, data-appropriate threshold; deviation recorded in
  // SURVEY §7.4 fidelity notes). Stddev is computed from exact decimal sums
  // (sum, sum of squares) so both engines see identical doubles —
  // stddev_samp over raw doubles is accumulation-order-dependent.
  //
  // Scale shape (fixes r1 double-join): pass 1 pre-aggregates the moments per
  // l_partkey BEFORE touching part — map-side combine collapses the fact to
  // ≤|part| rows, and only that reduced set joins part (no broadcast hint;
  // AQE decides) to roll up per brand (sums of decimal partials ≡ direct
  // sums — exact and associative). Pass 2 is the unavoidable second fact
  // scan joined to part and to the tiny broadcast stats (≤ #brands rows).
  private val q19 = q(
    "q19_anomaly_zscore",
    s"""WITH stats AS (
          SELECT p.p_brand,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 ${sqlDsum6("l.l_extendedprice")} AS s1,
                 ${sqlDsum6("l.l_extendedprice * l.l_extendedprice")} AS s2
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY 1)
        SELECT l.l_orderkey, l.l_linenumber, p.p_brand, l.l_extendedprice,
               ROUND(s.s1 / s.n, 6) AS brand_avg,
               ROUND((l.l_extendedprice - s.s1 / s.n)
                     / NULLIF(sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 0), 4) AS z_score
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN stats s ON p.p_brand = s.p_brand
        WHERE l.l_extendedprice > s.s1 / s.n
              + 1.5 * sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1))
        ORDER BY l_orderkey, l_linenumber""",
    headline = true) { t =>
    val partDim = t.part.select("p_partkey", "p_brand")
    // Pass 1: moments per l_partkey BEFORE touching part. Map-side combine
    // collapses the fact to ≤|part| rows, so the partkey→brand join sees the
    // reduced set, not row-level lineitem. Partials stay DecimalType through
    // the rollup — decimal addition is exact and associative, so summing
    // per-partkey partials per brand equals the direct brand sum bit-for-bit
    // (oracle unchanged; the final cast to double happens once, after).
    val perPart = t.lineitem
      .select(col("l_partkey"), col("l_extendedprice"))
      .groupBy("l_partkey")
      .agg(
        count(lit(1)).as("pn"),
        sum(col("l_extendedprice").cast(DecimalType(24, 6))).as("ps1"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast(DecimalType(24, 6))).as("ps2"))
    val stats = perPart
      .join(partDim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        sum(col("pn")).cast("double").as("n"),
        sum(col("ps1")).cast("double").as("s1"),
        sum(col("ps2")).cast("double").as("s2"))
    val mean = col("s1") / col("n")
    val std = sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
    // Pass 2: the unavoidable second fact scan at row level (output carries
    // per-row columns), joined to part (AQE decides broadcast vs shuffle)
    // and to the tiny broadcast stats (≤ #brands rows).
    val joined = t.lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_extendedprice"))
      .join(partDim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "p_brand")
    joined.join(broadcast(stats), "p_brand")
      .filter(col("l_extendedprice") > mean + lit(1.5) * std)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("p_brand"), col("l_extendedprice"),
        round(mean, 6).as("brand_avg"),
        round((col("l_extendedprice") - mean) / nullif(std, lit(0.0)), 4).as("z_score"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // Q20 — Q18's running total over a pre-aggregated frame: collapse to one
  // row per (status, day) BEFORE the cumulative sum, so the prefix input is
  // ≤ |status|×|days| rows regardless of fact size — the two mitigations
  // (pre-aggregation here, the grouped prefix sum in q18) compose: the
  // runtime cumulative sum rides the same PrefixSum.withGroupedRunningSum,
  // so no grouped running-total window remains anywhere in the registry.
  private val q20 = q(
    "q20_running_total_daily",
    s"""WITH daily AS (
          SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS order_date,
                 ${sqlDsum("o_totalprice")} AS daily_total
          FROM orders GROUP BY 1, 2)
        SELECT o_orderstatus, order_date, daily_total,
               CAST(SUM(CAST(daily_total AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_orderstatus ORDER BY order_date
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM daily ORDER BY o_orderstatus, order_date""") { t =>
    val daily = t.orders
      .groupBy(col("o_orderstatus"), col("o_orderdate").cast("date").as("order_date"))
      .agg(dsum(col("o_totalprice")).as("daily_total"))
      .withColumn("dt_dec", col("daily_total").cast("decimal(18,2)"))
    graft.operators.PrefixSum.withGroupedRunningSum(daily,
        groupCols = Seq("o_orderstatus"), orderCols = Seq("order_date"),
        valueCol = "dt_dec", outCol = "rt_dec")
      .withColumn("running_total", col("rt_dec").cast("double"))
      .select("o_orderstatus", "order_date", "daily_total", "running_total")
      .orderBy("o_orderstatus", "order_date")
  }

  // Q21 — sketch-based approximate aggregates: the 100 TB escape hatch when
  // exact COUNT(DISTINCT)/percentile are too expensive (single-pass HLL++ /
  // KLL-style sketches, no distinct re-shuffle). Approximate → rows-only;
  // accuracy vs the exact answers is asserted in ApproxSpec.
  private val q21 = QueryDef(
    "q21_approx_aggregates",
    (s: SparkSession, dir: String) => {
      val t = Tables(s, dir)
      t.orders.agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx_customers"),
        count(lit(1)).as("n_orders"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_median"))
    },
    oracle = None)

  // Q22 — ROLLUP subtotals (year, quarter) → the warehouse drill-down shape:
  // one pass computes per-quarter, per-year, and grand-total rows (Spark
  // expands grouping sets inside a single hash aggregate — no extra scans).
  // NULL grouping columns mark subtotal rows; both engines order NULLS FIRST
  // explicitly since their ASC defaults differ.
  private val q22 = q(
    "q22_rollup_totals",
    s"""SELECT year(o_orderdate) AS year, quarter(o_orderdate) AS quarter,
        COUNT(*) AS order_count, ${sqlDsum("o_totalprice")} AS total_spent
        FROM orders
        GROUP BY ROLLUP(year(o_orderdate), quarter(o_orderdate))
        ORDER BY year ASC NULLS FIRST, quarter ASC NULLS FIRST""") { t =>
    t.orders
      .rollup(year(col("o_orderdate")).as("year"), quarter(col("o_orderdate")).as("quarter"))
      .agg(count(lit(1)).as("order_count"), dsum(col("o_totalprice")).as("total_spent"))
      .orderBy(col("year").asc_nulls_first, col("quarter").asc_nulls_first)
  }

  // Q23 — per-group top-k (top-3 customers per order priority): the ranking
  // shape the reference's top-N queries imply but never group. Runs through
  // graft.operators.TopKPerGroup's salted two-phase ranking — the single
  // PARTITION BY o_orderpriority window the oracle uses would funnel each
  // priority's full customer set through ONE task at scale (5 groups =
  // 5 tasks for all customers); the two-phase form bounds every sort at
  // rows/(groups·fanout) and ranks identically (total order via the
  // custkey tie-break).
  private val q23 = q(
    "q23_top_customers_per_priority",
    s"""WITH spend AS (
          SELECT o_orderpriority, o_custkey, ${sqlDsum("o_totalprice")} AS total_spent
          FROM orders GROUP BY 1, 2),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                    ORDER BY total_spent DESC, o_custkey) AS rank FROM spend)
        SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_custkey, total_spent
        FROM r WHERE rank <= 3 ORDER BY o_orderpriority, rank""") { t =>
    val spend = t.orders.groupBy("o_orderpriority", "o_custkey")
      .agg(dsum(col("o_totalprice")).as("total_spent"))
    graft.operators.TopKPerGroup.topKPerGroup(
      spend, Seq("o_orderpriority"), "o_custkey",
      Seq(col("total_spent").desc, col("o_custkey").asc), k = 3)
      .select("o_orderpriority", "rank", "o_custkey", "total_spent")
      .orderBy("o_orderpriority", "rank")
  }

  // Q24 — grouped EXACT percentiles (Q4's median generalized per group):
  // Spark's `percentile` is a true aggregate — partials shuffle by the group
  // key like any hash agg (the sorted-values merge happens per group at the
  // reducer), so exact medians scale with group parallelism. approx
  // percentile (q21) remains the escape hatch when groups are huge.
  private val q24 = q(
    "q24_median_by_status",
    """SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
       PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median,
       PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { t =>
    t.orders.groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        percentile(col("o_totalprice"), lit(0.25)).as("p25"),
        percentile(col("o_totalprice"), lit(0.5)).as("median"),
        percentile(col("o_totalprice"), lit(0.75)).as("p75"))
      .orderBy("o_orderstatus")
  }

  // q25 — CUBE over (status, priority): all four grouping sets in ONE pass
  // (Spark expands the cube inside a single Expand+Aggregate — no
  // re-reading the fact per grouping set, the way four separate GROUP BYs
  // would at 100 TB). GROUPING() flags disambiguate real NULLs from
  // subtotal rows, mirrored exactly in DuckDB.
  private val q25 = q(
    "q25_cube_totals",
    s"""SELECT o_orderstatus AS status, o_orderpriority AS priority,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        ${sqlDsum("o_totalprice")} AS total_spent
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_priority, status, priority""") { t =>
    t.orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spent"))
      .withColumnRenamed("o_orderstatus", "status")
      .withColumnRenamed("o_orderpriority", "priority")
      .orderBy(col("g_status"), col("g_priority"), col("status"), col("priority"))
  }

  // q26 — customer spend DECILES without a global window: the decile of
  // each customer needs a GLOBAL rank over |customers| rows, and
  // `ROW_NUMBER() OVER (ORDER BY spend)` plans a single-partition
  // WindowExec — the one-task sort this engine bans (PlanSpec). The rank
  // rides the PrefixSum machinery instead (range-partition by the
  // composite order key, per-partition counts, driver offsets over
  // |partitions| metadata rows), then bucket arithmetic is a narrow map
  // and the decile rollup a 10-key aggregate. The oracle computes the
  // same rank with a window (fine at oracle scale) and the SAME bucket
  // formula. Spend re-aggregates through DECIMAL(24,6) (dsum6) so the
  // two-level sum is order-independent.
  private val q26 = q(
    "q26_spend_deciles",
    s"""WITH spend AS (
          SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
                 ${sqlDsum("o_totalprice")} AS total_spent
          FROM orders GROUP BY 1),
        r AS (SELECT *,
                ROW_NUMBER() OVER (ORDER BY total_spent, o_custkey) AS rnk,
                (SELECT COUNT(*) FROM spend) AS n
              FROM spend)
        SELECT CAST(((rnk - 1) * 10) // n + 1 AS INT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ${sqlDsum6("total_spent")} AS decile_spend,
               MIN(total_spent) AS min_spend, MAX(total_spent) AS max_spend
        FROM r GROUP BY 1 ORDER BY decile""") { t =>
    val spend = t.orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
      .withColumn("g0", lit(0)) // constant group = global composite-order rank
      .withColumn("one", lit(1L))
    val ranked = graft.operators.PrefixSum.withGroupedRunningSum(
      spend, Seq("g0"), Seq("total_spent", "o_custkey"), "one", "rnk")
    val n = spend.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .select(expr("CAST(((rnk - 1) * 10) div n + 1 AS INT)").as("decile"),
        col("total_spent"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        dsum6(col("total_spent")).as("decile_spend"),
        min("total_spent").as("min_spend"), max("total_spent").as("max_spend"))
      .orderBy("decile")
  }

  // ---------------------------------------------------------------------------
  // Q27 — per-customer spend TREND: ordinary-least-squares slope/intercept of
  // order price against order date, one line fit per customer. The moments
  // (n, Σx, Σx², Σy, Σxy) are the whole distributed computation — ONE
  // map-side-combinable groupBy on the customer key (no window, no per-group
  // sort; the same shape at 10⁹ customers) — and the closed-form solve is a
  // narrow projection. Determinism: x is an exact integer day offset, Σy/Σxy
  // accumulate in exact decimal, and the solve runs in DOUBLE with the
  // IDENTICAL expression tree on both engines (exact inputs + IEEE ops =
  // bit-equal), so the rounded slope/intercept hash-match. Degenerate fits
  // (n < 3 or a single distinct date) are filtered by the same predicate on
  // both sides.
  private val q27 = q(
    "q27_customer_trend",
    """WITH m AS (
         SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx,
                CAST(SUM(x * x) AS BIGINT) AS sxx,
                SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sy,
                SUM(CAST(x AS DECIMAL(12,0)) * CAST(o_totalprice AS DECIMAL(18,2))) AS sxy
         FROM (SELECT o_custkey, o_totalprice,
                      date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x
               FROM orders) z
         GROUP BY 1),
       s AS (
         SELECT o_custkey, n,
                CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
                CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
                CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         FROM m)
       SELECT o_custkey, n AS n_orders,
              ROUND(num / den, 6) AS slope,
              ROUND((syd - (num / den) * sxd) / CAST(n AS DOUBLE), 4) AS intercept
       FROM s WHERE n >= 3 AND den <> 0
       ORDER BY o_custkey""") { t =>
    val x = datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
    val m = t.orders
      .select(col("o_custkey"), col("o_totalprice"), x.cast("long").as("x"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sy"),
        sum(col("x").cast(DecimalType(12, 0)) *
          col("o_totalprice").cast(DecimalType(18, 2))).as("sxy"))
    val den = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val num = col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    m.select(col("o_custkey"), col("n"), den.as("den"), num.as("num"),
        col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"))
      .filter(col("n") >= 3 && col("den") =!= 0d)
      .select(col("o_custkey"), col("n").as("n_orders"),
        round(col("num") / col("den"), 6).as("slope"),
        round((col("syd") - (col("num") / col("den")) * col("sxd")) /
          col("n").cast("double"), 4).as("intercept"))
      .orderBy("o_custkey")
  }

  // Q28 — equi-width spend histogram (the data-profiling staple the
  // reference's amount_stats (Q4) summarizes into single aggregates): 25
  // fixed bins of 20k over [0, 500k), count + share per bin. Bin assignment
  // is one IEEE double division + floor — bit-identical cross-engine, no
  // data-derived edges to drift. Scale: one map-side-combined aggregate
  // collapses the fact to ≤25 rows; the share division rides a broadcast
  // scalar crossJoin of the 25-row frame's own total (never a second fact
  // scan, never a window).
  private val q28 = q(
    "q28_price_histogram",
    """WITH h AS (
         SELECT CAST(LEAST(floor(o_totalprice / 20000), 24) AS INT) AS bin,
                CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY 1),
       t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM h)
       SELECT bin, bin * 20000.0 AS bin_lo, (bin + 1) * 20000.0 AS bin_hi,
              n_orders, CAST(n_orders AS DOUBLE) / CAST(total AS DOUBLE) AS share
       FROM h, t ORDER BY bin""") { t =>
    val h = t.orders
      .groupBy(least(floor(col("o_totalprice") / 20000), lit(24)).cast("int").as("bin"))
      .agg(count(lit(1)).as("n_orders"))
    val total = h.agg(sum("n_orders").as("total"))
    h.crossJoin(broadcast(total))
      .select(
        col("bin"),
        (col("bin") * 20000.0).as("bin_lo"),
        ((col("bin") + 1) * 20000.0).as("bin_hi"),
        col("n_orders"),
        (col("n_orders").cast("double") / col("total").cast("double")).as("share"))
      .orderBy("bin")
  }

  // Q29 — robust outlier detection (median/MAD), the heavy-tail-safe
  // complement of q19's mean/σ z-score: per status, the median, the median
  // absolute deviation, and the count beyond the 3·1.4826·MAD fence
  // (1.4826 ≈ 1/Φ⁻¹(¾) makes MAD a consistent σ estimator). Exact
  // percentile interpolation hash-matches PERCENTILE_CONT (the q24
  // treatment); both medians broadcast back as ≤|status|-row scalars, so
  // the two fact passes stay narrow. Exact grouped percentile inherits
  // q24's contract (group values buffer in the aggregator); the 100 TB
  // path for percentile itself is the approx tier (q21).
  private val q29 = q(
    "q29_robust_outliers",
    """WITH med AS (
         SELECT o_orderstatus,
                PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median
         FROM orders GROUP BY 1),
       dev AS (
         SELECT o.o_orderstatus, m.median, abs(o.o_totalprice - m.median) AS adev
         FROM orders o JOIN med m USING (o_orderstatus)),
       mad AS (
         SELECT o_orderstatus,
                PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY adev) AS mad
         FROM dev GROUP BY 1)
       SELECT d.o_orderstatus, d.median, x.mad,
              CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * x.mad THEN 1 ELSE 0 END) AS BIGINT)
                AS n_outliers
       FROM dev d JOIN mad x USING (o_orderstatus)
       GROUP BY 1, 2, 3 ORDER BY o_orderstatus""") { t =>
    val med = t.orders.groupBy("o_orderstatus")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("median"))
    val dev = t.orders.select("o_orderstatus", "o_totalprice")
      .join(broadcast(med), "o_orderstatus")
      .withColumn("adev", abs(col("o_totalprice") - col("median")))
    val mad = dev.groupBy("o_orderstatus")
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "o_orderstatus")
      .groupBy("o_orderstatus", "median", "mad")
      .agg(sum(when(col("adev") > lit(3) * lit(1.4826) * col("mad"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .orderBy("o_orderstatus")
  }

  // q30 — PIVOT: per-priority rows widened by order status (the
  // report-shaped rotation CUBE can't express — measures become columns,
  // not subtotal rows). The status values are EXPLICIT (Seq("F","O","P")),
  // which matters at 100 TB: an implicit pivot runs a distinct-discovery
  // job over the fact first; the explicit list plans one Expand-free
  // single-pass aggregate with FILTER-style conditional measures. Spark
  // leaves empty cells null (count included) — counts coalesce to 0 to
  // match COUNT FILTER, spends stay null to match SUM FILTER, pinning the
  // empty-cell semantics cross-engine.
  private val q30 = q(
    "q30_status_pivot",
    s"""SELECT o_orderpriority AS priority,
        CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS f_n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_spend,
        CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS o_n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_spend,
        CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS p_n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_spend
        FROM orders GROUP BY 1 ORDER BY priority""") { t =>
    t.orders.groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("spend"))
      .select(col("priority"),
        coalesce(col("F_n"), lit(0L)).as("f_n"), col("F_spend").as("f_spend"),
        coalesce(col("O_n"), lit(0L)).as("o_n"), col("O_spend").as("o_spend"),
        coalesce(col("P_n"), lit(0L)).as("p_n"), col("P_spend").as("p_spend"))
      .orderBy("priority")
  }

  // q31 — UNPIVOT/melt: lineitem's four numeric measures rotated long
  // (column name → key), then profiled per measure — the wide-to-long
  // reshape feeding generic per-metric monitoring. Unpivot is a narrow
  // Expand (4× rows, ZERO exchanges until the 4-key rollup, which
  // map-side-combines); measures unify through DECIMAL(18,6) so the 4×
  // sums stay exact and order-independent in both engines.
  private val q31 = q(
    "q31_measure_unpivot",
    """WITH m AS (
         SELECT measure, CAST(v AS DECIMAL(18,6)) AS v FROM (
           SELECT 'quantity' AS measure, l_quantity AS v FROM lineitem
           UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
           UNION ALL SELECT 'discount', l_discount FROM lineitem
           UNION ALL SELECT 'tax', l_tax FROM lineitem) z)
       SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(v) AS DOUBLE) AS total,
              CAST(MIN(v) AS DOUBLE) AS min_v, CAST(MAX(v) AS DOUBLE) AS max_v
       FROM m GROUP BY 1 ORDER BY measure""") { t =>
    t.lineitem.select(col("l_orderkey"),
        col("l_quantity").cast(DecimalType(18, 6)).as("quantity"),
        col("l_extendedprice").cast(DecimalType(18, 6)).as("extendedprice"),
        col("l_discount").cast(DecimalType(18, 6)).as("discount"),
        col("l_tax").cast(DecimalType(18, 6)).as("tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
        "measure", "v")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), sum("v").cast("double").as("total"),
        min("v").cast("double").as("min_v"), max("v").cast("double").as("max_v"))
      .orderBy("measure")
  }

  // q32 — ASYMMETRIC GROUPING SETS: exactly ((status, priority), (status),
  // ()) — the detail, one marginal, and the grand total in ONE
  // Expand+Aggregate pass, WITHOUT the (priority) marginal a CUBE (q25)
  // would force (and at 100 TB would pay an extra expanded replica of the
  // fact for). GROUPING() flags disambiguate subtotal rows exactly as in
  // q25; the DataFrame groupingSets API (Spark 4) is the surface under
  // test, the oracle the literal SQL form.
  private val q32 = q(
    "q32_grouping_sets",
    s"""SELECT o_orderstatus AS status, o_orderpriority AS priority,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        ${sqlDsum("o_totalprice")} AS total_spent
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY g_status, g_priority, status, priority""") { t =>
    t.orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq.empty[org.apache.spark.sql.Column]),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spent"))
      .withColumnRenamed("o_orderstatus", "status")
      .withColumnRenamed("o_orderpriority", "priority")
      .orderBy(col("g_status"), col("g_priority"), col("status"), col("priority"))
  }

  // q33 — TIME-RANGE window frame (the window surface the ROWS-frame
  // running totals q18/q20 can't express): per customer, each order's
  // trailing-7-calendar-day spend via RANGE BETWEEN 6 PRECEDING AND
  // CURRENT ROW over the integer epoch-day key. RANGE includes PEERS —
  // same-day orders contribute to each other's frame on every row, which
  // no ROWS frame reproduces. Scale shape: partitions by o_custkey
  // (unbounded group cardinality — no single-task funnel); the frame sum
  // rides exact DECIMAL so frame-internal order is immaterial and both
  // engines agree bit-for-bit.
  private val q33 = q(
    "q33_rolling_window_range",
    """SELECT o_orderkey AS orderkey, o_custkey AS custkey,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          OVER (PARTITION BY o_custkey
                ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_7d
        FROM orders ORDER BY orderkey""") { t =>
    val w = Window.partitionBy("o_custkey").orderBy(col("day_no")).rangeBetween(-6, 0)
    t.orders
      .withColumn("day_no",
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long"))
      .select(col("o_orderkey").as("orderkey"), col("o_custkey").as("custkey"),
        col("o_orderdate").cast("date").as("order_date"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("spend_7d"))
      .orderBy("orderkey")
  }

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q31, q32, q33)
}
