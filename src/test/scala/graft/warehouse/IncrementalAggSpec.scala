package graft.warehouse

import graft.SparkSpec
import graft.functions.Det.{dsumPartial, dsum6Partial}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1 to 300).map { i =>
    (s"g${i % 7}", i % 13, i * 0.17, i * 1.000001)
  }.toDF("g", "m", "amt", "rev")

  private def partial(df: DataFrame): DataFrame =
    df.groupBy("g", "m").agg(count(lit(1)).as("n"),
      dsumPartial(col("amt")).as("amt_dec"),
      dsum6Partial(col("rev")).as("rev_dec"))

  private def finish(df: DataFrame) =
    df.select(col("g"), col("m"), col("n"),
      col("amt_dec").cast("double"), col("rev_dec").cast("double"))
      .orderBy("g", "m").collect().toSeq

  test("merge of split partials is bit-equal to the one-pass aggregate") {
    val onePass = finish(partial(rows))
    // split so many groups exist on BOTH sides and some on only one
    val merged = finish(IncrementalAgg.mergePartials(
      partial(rows.filter(col("m") < 9)),
      partial(rows.filter(col("m") >= 9)), Seq("g", "m")))
    assert(merged === onePass)
    // a second, unbalanced split must land identically too
    val merged2 = finish(IncrementalAgg.mergePartials(
      partial(rows.limit(1)), partial(rows.except(rows.limit(1))), Seq("g", "m")))
    assert(merged2 === onePass)
  }

  test("three-level fold (delta of a delta) still matches one-pass") {
    val a = partial(rows.filter(col("m") < 5))
    val b = partial(rows.filter(col("m") >= 5 && col("m") < 9))
    val c = partial(rows.filter(col("m") >= 9))
    val folded = IncrementalAgg.mergePartials(
      IncrementalAgg.mergePartials(a, b, Seq("g", "m")), c, Seq("g", "m"))
    assert(finish(folded) === finish(partial(rows)))
  }

  test("schema mismatch and non-additive columns fail fast") {
    val p = partial(rows)
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergePartials(p, p.drop("rev_dec"), Seq("g", "m"))
    }
    val floatView = p.withColumn("amt_dec", col("amt_dec").cast("double"))
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.mergePartials(floatView, floatView, Seq("g", "m"))
    }
    assert(e.getMessage.contains("additive partial"))
  }
}
