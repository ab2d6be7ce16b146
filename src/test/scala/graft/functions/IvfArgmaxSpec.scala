package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.Similarity

/** Bit parity of the fused [[IvfFns.ivfArgmax]] assignment against the
  * `array_max` over (score, -cell) structs formulation it replaced in
  * `Similarity.ivfAssign` — same strict left-to-right double accumulation,
  * same NaN-above-all / smallest-cell tie order, same degenerate-input
  * anchor — including a centroid count large enough that the old tree
  * overflows janino's 64 KB method limit and drops to interpreted eval.
  */
class IvfArgmaxSpec extends SparkSpec {

  import spark.implicits._

  /** The pre-fusion formulation, verbatim. */
  private def treeAssign(embeddings: DataFrame, cents: Seq[(Long, Seq[Float])]): DataFrame = {
    val scored = cents.map { case (cell, ce) =>
      val cNorm = math.sqrt(ce.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      struct(
        (Similarity.dot(col("embedding"), typedlit(ce)) /
          (Similarity.norm(col("embedding")) * lit(cNorm))).as("score"),
        lit(-cell).as("neg_cell"))
    }
    val best = array_max(array(scored.toIndexedSeq: _*))
    embeddings.select(col("vec_id"), (-best.getField("neg_cell")).as("cell"))
  }

  private val Dim = Similarity.Dim

  private def syntheticCents(c: Int): Seq[(Long, Seq[Float])] =
    (0L until c.toLong).map { cell =>
      (cell, (0 until Dim).map(d =>
        (LshFns.planeComponent(cell.toInt * 131 + 17, d) * 2.0).toFloat))
    }

  private def syntheticEmbs(n: Int): DataFrame =
    (0L until n.toLong).map { id =>
      (id, (0 until Dim).map(d =>
        (LshFns.planeComponent(id.toInt * 37 + 5, d) * 3.0).toFloat))
    }.toDF("vec_id", "embedding")

  private def cellsOf(df: DataFrame): Map[Long, Long] =
    df.select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("fused assignment matches the struct-argmax tree at small and large C") {
    val embs = syntheticEmbs(300)
    for (c <- Seq(4, 32, 600)) { // 600 cells: the tree form overflows codegen
      val cents = syntheticCents(c)
      val centsDf = cents.toDF("cell", "c_emb")
      val fused = cellsOf(Similarity.ivfAssign(embs, centsDf))
      val tree = cellsOf(treeAssign(embs, cents))
      assert(fused.size == 300)
      assert(fused == tree, s"mismatch at C=$c")
    }
  }

  test("real embeddings + real quantizer: fused matches the tree") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val centsDf = Similarity.ivfCentroids(embs)
    val cents = centsDf.select(col("cell").cast("long"), col("c_emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val fused = cellsOf(Similarity.ivfAssign(embs, centsDf))
    val tree = cellsOf(treeAssign(embs, cents))
    assert(fused.nonEmpty && fused == tree)
  }

  test("degenerate embeddings anchor at the smallest cell, like the null-score tree") {
    val cents = syntheticCents(8).map { case (c, e) => (c + 3, e) } // min cell 3
    val centsDf = cents.toDF("cell", "c_emb")
    val zero = Seq((1L, Seq.fill(Dim)(0.0f))).toDF("vec_id", "embedding") // all-NaN scores
    val short = Seq((2L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val nullEmb = spark.sql("SELECT 3L AS vec_id, CAST(NULL AS array<float>) AS embedding")
    val nullElem = spark.sql(
      s"SELECT 4L AS vec_id, array_insert(array_repeat(CAST(1.0 AS float), ${Dim - 1}), 9, CAST(NULL AS float)) AS embedding")
    for (df <- Seq(zero, short, nullEmb, nullElem)) {
      val fused = cellsOf(Similarity.ivfAssign(df, centsDf))
      val tree = cellsOf(treeAssign(df, cents))
      assert(fused == tree)
      assert(fused.values.forall(_ == 3L))
    }
  }
}
