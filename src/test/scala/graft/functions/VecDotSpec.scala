package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native vec_dot expression must be a drop-in for the HOF formulation:
  * bit-identical doubles on real embeddings, identical null poisoning, SQL
  * registration, and whole-stage-codegen participation (the point of it).
  */
class VecDotSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the zip_with/aggregate formulation on real embeddings") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = embs.select(col("vec_id"), col("embedding").as("ea"))
    val b = embs.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
    val mismatches = a.join(b, Seq("vec_id"))
      .select(VecMath.vecDot(col("ea"), col("eb")).as("nd"),
        hofDot(col("ea"), col("eb")).as("hd"))
      .filter(!(col("nd") <=> col("hd")))
      .count()
    assert(mismatches == 0)
  }

  test("null inputs, null elements and length mismatches yield null") {
    val df = spark.sql(
      """SELECT
         vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
                 array(cast(3.0 as float), cast(4.0 as float))) AS ok,
         vec_dot(cast(null as array<float>),
                 array(cast(1.0 as float))) AS nin,
         vec_dot(array(cast(1.0 as float), cast(null as float)),
                 array(cast(1.0 as float), cast(1.0 as float))) AS nel,
         vec_dot(array(cast(1.0 as float)),
                 array(cast(1.0 as float), cast(1.0 as float))) AS mism""")
    val r = df.collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("mixed float x double arrays match the HOF formulation (LSH hyperplane case)") {
    val planes = typedlit((0 until 64).map(d => (d * 0.37) - 11.0))
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mismatches = embs
      .select(VecMath.vecDot(col("embedding"), planes).as("nd"),
        hofDot(col("embedding"), planes).as("hd"))
      .filter(!(col("nd") <=> col("hd")))
      .count()
    assert(mismatches == 0)
  }

  test("participates in whole-stage codegen (no CodegenFallback in the projection)") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = embs.select(VecMath.vecDot(col("embedding"), col("embedding")).as("d"))
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.linesIterator.exists(l => l.contains("* Project")),
      s"vec_dot projection not codegen'd:\n$plan")
  }
}
