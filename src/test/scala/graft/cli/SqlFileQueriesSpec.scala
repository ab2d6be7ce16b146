package graft.cli

import graft.SparkSpec
import graft.etl.{DirtyTxns, TxnPipeline}

/** Parser + end-to-end tests for the queries.sql entry point, mirroring the
  * reference's parse contract (banner skipping, Purpose extraction, SELECT/
  * WITH detection, trailing-semicolon strip) and proving a reference-format
  * file runs against the Spark star via temp views.
  */
class SqlFileQueriesSpec extends SparkSpec {

  private val fixture = "/root/repo/fixtures/star_queries.sql"

  test("parses (purpose, sql) pairs: banners skipped, purposes joined, semicolons stripped") {
    val qs = SqlFileQueries.parseFile(fixture)
    assert(qs.length == 4)
    assert(qs(0).purpose == "Verify data has been loaded into all star tables")
    // multiple Purpose lines concatenate
    assert(qs(2).purpose == "Rank merchants by total transaction amount (top 5 only)")
    // query without a Purpose comment gets the default description
    assert(qs(3).purpose == "Query")
    assert(qs.forall(q => !q.sql.endsWith(";")))
    assert(qs(2).sql.toUpperCase.startsWith("WITH"))
  }

  test("a reference-format SQL file runs end-to-end against the star temp views") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    SqlFileQueries.registerStar(TxnPipeline.buildStar(DirtyTxns(orders)))
    val results = SqlFileQueries.runAll(spark, fixture).map { case (q, df) => q.purpose -> df.collect() }
    assert(results.length == 4)
    val counts = results.head._2.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("fact_transactions") > 0)
    assert(counts("dim_category") > 0)
    // top-merchants query respects its LIMIT 5
    assert(results(2)._2.length <= 5)
    // weekend count query returns one row
    assert(results(3)._2.length == 1)
  }
}
