package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Physical-type tolerance at the `Tables` boundary (VERDICT r9 #4): the
  * SAME def must produce identical results whether the provider's parquet
  * writer emitted `events.ts` as TIMESTAMP(NANOS)-read-as-long (the original
  * driver encoding), `timestamp[us]` (the pandas/pyarrow default the round-9
  * regeneration switched to — it broke all seven e-defs), or timestamp_ntz.
  * Reference analogue: extract.py:159 / transform.py:249 coerce-don't-assume.
  */
class TablesSpec extends SparkSpec {

  // three users, events spanning two hours, sub-microsecond-free instants
  // (every encoding can represent them exactly)
  private val baseUs: Long = 1.6e15.toLong // 2020-09-13T12:26:40 UTC
  private val rows = Seq(
    // (event_id, us-offset, user_id, event_type, value)
    (1L, 0L, 10L, "signup", 1.0),
    (2L, 5L * 60 * 1000000L, 10L, "view", 2.5),
    (3L, 61L * 60 * 1000000L, 10L, "purchase", 9.0),
    (4L, 1L, 20L, "view", 0.5),
    (5L, 2L, 20L, "view", 0.25),
    (6L, 90L * 60 * 1000000L, 30L, "signup", 4.0))

  private def writeFixture(encode: String): String = {
    val dir = Files.createTempDirectory(s"graft-events-$encode").toString
    val data = rows.map { case (id, off, uid, et, v) =>
      Row(id, baseUs + off, uid, et, v, s"""{"k":$id}""")
    }
    val (tsType, transform): (DataType, DataFrame => DataFrame) = encode match {
      case "nanoslong" => (LongType,
        df => df.withColumn("ts", org.apache.spark.sql.functions.expr("ts * 1000")))
      case "micros" => (LongType,
        df => df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(df("ts"))))
      case "ntz" => (LongType,
        df => df.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(df("ts")).cast(TimestampNTZType)))
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val df = transform(spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema))
    withConf("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS") {
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    dir
  }

  private def runDef(name: String, dir: String): Seq[Row] =
    SparkEntry.defs.find(_.name == name).get.run(spark, dir).collect().toSeq

  test("microsTs normalizes long-nanos / timestamp[us] / ntz to identical instants") {
    val dirs = Seq("nanoslong", "micros", "ntz").map(writeFixture)
    val normalized = dirs.map { d =>
      val t = Tables.microsTs(Tables(spark, d).events, "ts")
      assert(t.schema("ts").dataType == TimestampType, s"wrong type from $d")
      t.orderBy("event_id").select("event_id", "ts").collect().toSeq
    }
    assert(normalized(0) == normalized(1), "nanos-long vs timestamp[us] instants differ")
    assert(normalized(0) == normalized(2), "nanos-long vs ntz instants differ")
    assert(normalized(0).head.getAs[Timestamp]("ts").getTime == baseUs / 1000)
  }

  test("the same e-defs produce identical results under every ts encoding (r9 break)") {
    val dirs = Seq("nanoslong", "micros", "ntz").map(writeFixture)
    // one windowed-agg def and the ordered multi-step funnel cover both the
    // truncation-sensitive (sub-second) and ordering-sensitive paths
    Seq("e01_hourly_windows", "e02_sessionization", "e07_multistep_funnel").foreach { q =>
      val out = dirs.map(runDef(q, _))
      assert(out(0).nonEmpty, s"$q returned no rows on the fixture")
      assert(out(0) == out(1), s"$q: nanos-long vs timestamp[us] results differ")
      assert(out(0) == out(2), s"$q: nanos-long vs ntz results differ")
    }
  }

  test("int32 ids and float64 embeddings normalize at the boundary; defs agree across encodings") {
    import org.apache.spark.sql.functions.{col, transform => atransform}
    // native fixture: long ids + float embeddings, as the driver writes today
    val native = Files.createTempDirectory("graft-emb-native").toString
    val drifted = Files.createTempDirectory("graft-emb-drift").toString
    val base = spark.range(0, 40).select(
      col("id").as("vec_id"),
      atransform(org.apache.spark.sql.functions.sequence(
        org.apache.spark.sql.functions.lit(1), org.apache.spark.sql.functions.lit(8)),
        d => (col("id") * 31 + d.cast(LongType)).cast(FloatType) / 97.0f).as("embedding"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("c"), col("id") % 4).as("label"))
    base.write.mode("overwrite").parquet(s"$native/embeddings.parquet")
    // drifted fixture: pandas-style int32 ids + float64 embeddings (every
    // float widens exactly, so values are representable both ways)
    base.select(col("vec_id").cast(IntegerType).as("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$drifted/embeddings.parquet")
    val Seq(a, b) = Seq(native, drifted).map { d =>
      val t = Tables(spark, d).embeddings
      assert(t.schema("vec_id").dataType == LongType)
      assert(t.schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
        t.schema("embedding").dataType == ArrayType(FloatType, containsNull = false))
      runDef("s01_knn_bruteforce", d)
    }
    assert(a.nonEmpty && a == b, "brute-force knn differs across embedding encodings")
  }

  test("microsTs rejects an unsupported encoding loudly") {
    val df = spark.range(1).selectExpr("CAST(id AS STRING) AS ts")
    val e = intercept[IllegalArgumentException](Tables.microsTs(df, "ts"))
    assert(e.getMessage.contains("unsupported ts encoding"))
  }
}
