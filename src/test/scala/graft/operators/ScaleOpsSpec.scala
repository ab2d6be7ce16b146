package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-mechanics tests: salted joins preserve semantics while spreading
  * hot keys; bucketed tables co-locate joins with zero shuffle.
  */
class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // 10k rows, 90% on one hot key — the salting target
    val big = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(0L).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = SkewJoin.salted(big, small, "k", salt = 8).select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join spreads the hot key across salt sub-partitions") {
    val big = spark.range(1000).select(lit(0L).as("k"), col("id").as("p"))
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(col("k"), col("p")), lit(8)).cast("int"))
    val spread = bigS.groupBy("__salt").count().collect()
    assert(spread.length == 8, "all 8 salt buckets populated")
    assert(spread.map(_.getLong(1)).max < 1000 * 0.3, "no bucket holds the whole hot key")
  }

  test("salt assignment is content-derived: stable across repartitioning") {
    // same rows, three different physical layouts → identical (row, salt)
    // assignment, because the salt hashes row content, not row position
    val base = spark.range(2000)
      .select((col("id") % 5).as("k"), col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e")).toDF("k", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      SkewJoin.salted(df, small, "k", salt = 8)
        .select("k", "payload", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val r1 = run(base)
    val r2 = run(base.repartition(13))
    val r3 = run(base.repartition(1))
    assert(r1 == r2 && r2 == r3)
    // and the assignment itself (not just the join result) is layout-stable
    def salts(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(salts(base) == salts(base.repartition(13)))
  }

  test("dynamic partition pruning fires on the dim-attribute star join; disabling it scans everything") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/t"
    // 24 months of data, partitioned by (year, month); the filter lives on
    // a dim attribute (quarter), never on the partition columns directly
    val rows = (0 until 2400).map { i =>
      val m = i % 24
      (2000 + m / 12, 1 + m % 12, i.toLong)
    }.toDF("year", "month", "v")
    rows.repartition(col("year"), col("month"))
      .write.mode("overwrite").partitionBy("year", "month").parquet(root)
    // the dim must be a real source (not a LocalRelation — a folded-away
    // literal filter leaves no selective predicate for the DPP heuristic)
    val dimPath = root + "_dim"
    (0 until 24).map(m => (2000 + m / 12, 1 + m % 12))
      .toDF("dd_year", "dd_month")
      .withColumn("quarter", ((col("dd_month") - 1) / 3 + 1).cast("int"))
      .write.mode("overwrite").parquet(dimPath)
    def rollup() = {
      val fact = spark.read.parquet(root)
      val dim = spark.read.parquet(dimPath).filter(col("quarter") === 2)
      fact.join(broadcast(dim),
        fact("year") === col("dd_year") && fact("month") === col("dd_month"))
    }
    val q = rollup()
    q.collect() // resolve the adaptive plan before inspecting it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"the fact scan must carry a runtime pruning subquery:\n${plan.take(4000)}")
    // the pruned scan reads 6 of 24 month directories — measured via the
    // scan metrics after execution
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles").map(_.value)).sum
    }
    val pruned = filesRead(q)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try {
      val full = filesRead(rollup())
      assert(pruned * 2 <= full,
        s"DPP must cut files read (quarter = 6/24 months): pruned=$pruned full=$full")
      assert(rollup().count() == q.count())
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
  }

  test("bucketed tables co-locate the join: zero exchange in the plan") {
    val n = 10000
    spark.sql("DROP TABLE IF EXISTS bkt_fact")
    spark.sql("DROP TABLE IF EXISTS bkt_dim")
    spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_fact")
    spark.range(n / 10).select(col("id").as("k"), lit("d").as("name"))
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_dim")
    // disable auto-broadcast so the join would OTHERWISE shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_fact").join(spark.table("bkt_dim"), Seq("k"))
      joined.collect()
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == n / 10)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
