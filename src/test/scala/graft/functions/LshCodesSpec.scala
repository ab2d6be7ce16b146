package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.Similarity

/** Bit parity of the fused [[LshFns.lshCodes]] expression against the
  * per-(table, bit) `when(vec_dot(embedding, plane-literal) >= 0, …)`
  * formulation it replaced in `Similarity.lshBuckets` — same plane family,
  * same strict left-to-right double accumulation, same degenerate-input
  * collapse (null array / null element / wrong length → all-zero codes).
  */
class LshCodesSpec extends SparkSpec {

  import spark.implicits._

  private val Dim = Similarity.Dim

  /** The pre-fusion formulation, verbatim: one dot sub-tree per (table, bit). */
  private def treeBuckets(embeddings: DataFrame, nTables: Int, nBits: Int): DataFrame = {
    val tables = (0 until nTables).map { t =>
      val code = (0 until nBits).map { i =>
        val w = typedlit((0 until Dim).map(d => LshFns.planeComponent(t * nBits + i, d)))
        when(VecMath.vecDot(col("embedding"), w) >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("table"), code.as("bucket"))
    }
    embeddings.select(col("vec_id"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  private def syntheticEmbs(n: Int): DataFrame = {
    // deterministic floats spanning signs and magnitudes, incl. exact zeros
    // (the >= 0 sign convention makes zero-dot rows a real edge)
    val rows = (0L until n.toLong).map { id =>
      val emb = Array.tabulate(Dim) { d =>
        val v = LshFns.planeComponent(id.toInt * 31 + 7, d) * 3.0
        if (d == (id % Dim).toInt) 0.0f else v.toFloat
      }
      (id, emb.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def codesOf(df: DataFrame, nTables: Int, nBits: Int): Map[(Long, Int), Int] =
    df.collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap

  test("fused lsh_codes is bit-identical to the expression-tree formulation") {
    val embs = syntheticEmbs(200)
    for ((nt, nb) <- Seq((8, 8), (48, 6), (96, 12))) {
      val fused = codesOf(
        Similarity.lshBuckets(embs, nt, nb).select("vec_id", "table", "bucket"), nt, nb)
      val tree = codesOf(treeBuckets(embs, nt, nb), nt, nb)
      assert(fused.size == 200 * nt)
      assert(fused == tree, s"mismatch at config ${nt}x$nb")
    }
  }

  test("real embeddings table: fused codes match the tree formulation") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").limit(300)
    val fused = codesOf(
      Similarity.lshBuckets(embs, 8, 8).select("vec_id", "table", "bucket"), 8, 8)
    val tree = codesOf(treeBuckets(embs, 8, 8), 8, 8)
    assert(fused.nonEmpty && fused == tree)
  }

  test("degenerate inputs collapse to all-zero codes, never null") {
    val wrongLen = Seq((1L, Seq(0.5f, -0.5f))).toDF("vec_id", "embedding")
    val nullEmb = spark.sql("SELECT 2L AS vec_id, CAST(NULL AS array<float>) AS embedding")
    val nullElem = spark.sql(
      s"SELECT 3L AS vec_id, array_insert(array_repeat(CAST(0.5 AS float), ${Dim - 1}), 4, CAST(NULL AS float)) AS embedding")
    for (df <- Seq(wrongLen, nullEmb, nullElem)) {
      val rows = Similarity.lshBuckets(df, 4, 6)
        .select("table", "bucket").collect()
      assert(rows.length == 4)
      assert(rows.forall(r => !r.isNullAt(1) && r.getInt(1) == 0))
    }
  }

  test("multi-probe candidates still recover a planted identical twin") {
    // end-to-end through the fused corpus codes + driver-side probe codes:
    // an identical twin shares every table's bucket, so it MUST be a
    // candidate of its query regardless of probe expansion
    val base = syntheticEmbs(50)
    val twin = base.filter(col("vec_id") === 0L)
      .select(lit(999L).as("vec_id"), col("embedding"))
    val embs = base.unionByName(twin)
    val (cands, release) = Similarity.lshCandidatePairs(
      embs, col("vec_id") === 0L, nTables = 6, nBits = 10, probeBits = 2)
    try {
      val pairs = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 999L)))
    } finally release()
  }

  test("planeM is the exact integer residue behind planeComponent (the s02 oracle contract)") {
    // the SQL twin reconstructs the family as m/1000003 − 0.5 from inlined
    // planeM integers; the two must agree bit-for-bit for every plane the
    // registered s02 config uses, and the residue must stay in [0, 1000003)
    for (p <- 0 until Similarity.LshTablesRegistered * Similarity.LshBitsRegistered;
         d <- 0 until Dim) {
      val m = LshFns.planeM(p, d)
      assert(m >= 0 && m < 1000003L, s"residue out of range at ($p,$d): $m")
      assert(LshFns.planeComponent(p, d) === (m.toDouble / 1000003.0) - 0.5,
        s"planeComponent/planeM disagree at ($p,$d)")
    }
  }
}
