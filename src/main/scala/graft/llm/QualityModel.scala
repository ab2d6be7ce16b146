package graft.llm

import graft.operators.Materialize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed training of a logistic-regression document-quality
  * classifier — the "train the quality filter inside the engine" step of a
  * curation pipeline (the CCNet/RefinedWeb recipe trains exactly such a
  * shallow classifier over handcrafted features). Batch gradient descent:
  * executors compute the exact per-partition gradient contribution, the
  * driver folds the FEATURE-DIMENSION-sized (5-element) totals into the
  * weight vector — the classic parameter-server-of-one shape where only
  * O(d) scalars ever cross the driver boundary, never rows.
  *
  * Features are the x03 quality components (len_score, diversity,
  * stop_ratio, uniq3 — each an exact double in [0,1]); the demo label is
  * `n_chars > 300` (linearly related to len_score, so the model must
  * learn it).
  *
  * Cross-engine determinism (the x16 treatment, applied to training):
  *   - weights live as DOUBLES; every update is a fixed IEEE expression
  *     tree (`w − lr·(g/n)`), identical in any engine;
  *   - σ(z) is quantized to DECIMAL(18,8) per row — the only
  *     transcendental, its last-ulp engine differences absorbed by the
  *     quantization;
  *   - per-row gradient terms `(σq − y)·f_j` quantize to DECIMAL(28,12)
  *     and accumulate as EXACT decimal sums, so the gradient — and
  *     therefore the whole training trajectory — is independent of row
  *     order and partitioning, and replayable as an unrolled DuckDB CTE
  *     chain ([[gradientDescentOracleCtes]]).
  *
  * Scale shape: the feature frame materializes once ([[Materialize.cut]] —
  * iterations must not re-derive features from text); each iteration is
  * ONE whole-stage-codegen aggregate producing a single 6-column row
  * (5 decimal gradient components + count) collected to the driver — the
  * bounded-probe contract (6 scalars, not rows). Raw text never shuffles.
  */
object QualityModel {

  val FeatureCols: Seq[String] = Seq("len_score", "diversity", "stop_ratio", "uniq3")
  val Lr = 2.0
  val LabelThreshold = 300

  /** Per-document (doc_id, features..., y) — exact doubles both engines. */
  def features(documents: DataFrame): DataFrame =
    TextAnalysis.qualityScore(documents)
      .select(col("doc_id") +: FeatureCols.map(col) :+
        when(col("n_chars") > LabelThreshold, 1.0).otherwise(0.0).as("y"): _*)

  private def zExpr(w: Array[Double]): Column =
    FeatureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, i)) => acc + lit(w(i + 1)) * col(f)
    }

  /** Quantized sigmoid of the linear score under weights `w`. */
  private def sigmaQ(w: Array[Double]): Column =
    (lit(1.0) / (lit(1.0) + exp(-zExpr(w)))).cast(DecimalType(18, 8))

  /** Train `iterations` steps of batch GD from w = 0. Returns the final
    * weights (bias first, then [[FeatureCols]] order).
    */
  def train(documents: DataFrame, iterations: Int): Array[Double] = {
    val feats = Materialize.cut(features(documents))
    var w = Array.fill(FeatureCols.length + 1)(0.0)
    for (_ <- 1 to iterations) {
      val r = sigmaQ(w).cast("double") - col("y")
      val terms = feats.select(
        (lit(1.0) +: FeatureCols.map(col)).zipWithIndex.map { case (f, j) =>
          (r * f).cast(DecimalType(28, 12)).as(s"t$j")
        }: _*)
      val gradRow = terms.agg(
        sum("t0").as("g0"), sum("t1").as("g1"), sum("t2").as("g2"),
        sum("t3").as("g3"), sum("t4").as("g4"),
        count(lit(1)).as("n")).head()
      val n = gradRow.getLong(5).toDouble
      w = w.indices.map { j =>
        // fixed IEEE tree: w − lr·(double(g)/n), mirrored in the oracle
        w(j) - Lr * (gradRow.getDecimal(j).doubleValue() / n)
      }.toArray
    }
    w
  }

  /** Train, then score every document with the final model:
    * (doc_id, p, pred, y). `p` is the quantized sigmoid as double.
    */
  def trainAndPredict(documents: DataFrame, iterations: Int): DataFrame = {
    val w = train(documents, iterations)
    features(documents).select(col("doc_id"),
      sigmaQ(w).cast("double").as("p"),
      (sigmaQ(w) >= lit(0.5)).as("pred"),
      col("y"))
  }

  /** DuckDB replay of the identical training loop: unrolled CTEs
    * `w0 .. w{iterations}` over a caller-provided
    * `feats(doc_id, len_score, diversity, stop_ratio, uniq3, y)` CTE.
    * Weight CTEs are single-row (w0..w4 DOUBLE); gradient CTEs fold the
    * same quantized per-row terms.
    */
  def gradientDescentOracleCtes(iterations: Int): String = {
    val sig = (wRef: String) =>
      s"""CAST(1.0/(1.0 + exp(-($wRef.w0 + $wRef.w1*len_score + $wRef.w2*diversity
          + $wRef.w3*stop_ratio + $wRef.w4*uniq3))) AS DECIMAL(18,8))"""
    val w0 = """w0 AS MATERIALIZED (
         SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
                CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,
                CAST(0.0 AS DOUBLE) AS w4)"""
    val iters = (1 to iterations).flatMap { i =>
      val p = s"w${i - 1}"
      val g =
        s"""g$i AS MATERIALIZED (
           SELECT SUM(CAST(r * 1.0 AS DECIMAL(28,12))) AS g0,
                  SUM(CAST(r * len_score AS DECIMAL(28,12))) AS g1,
                  SUM(CAST(r * diversity AS DECIMAL(28,12))) AS g2,
                  SUM(CAST(r * stop_ratio AS DECIMAL(28,12))) AS g3,
                  SUM(CAST(r * uniq3 AS DECIMAL(28,12))) AS g4,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT feats.*, CAST(${sig(p)} AS DOUBLE) - y AS r
                 FROM feats CROSS JOIN $p) z)"""
      val w =
        s"""w$i AS MATERIALIZED (
           SELECT $p.w0 - $Lr * (CAST(g.g0 AS DOUBLE) / CAST(g.n AS DOUBLE)) AS w0,
                  $p.w1 - $Lr * (CAST(g.g1 AS DOUBLE) / CAST(g.n AS DOUBLE)) AS w1,
                  $p.w2 - $Lr * (CAST(g.g2 AS DOUBLE) / CAST(g.n AS DOUBLE)) AS w2,
                  $p.w3 - $Lr * (CAST(g.g3 AS DOUBLE) / CAST(g.n AS DOUBLE)) AS w3,
                  $p.w4 - $Lr * (CAST(g.g4 AS DOUBLE) / CAST(g.n AS DOUBLE)) AS w4
           FROM $p CROSS JOIN g$i g)"""
      Seq(g, w)
    }
    (w0 +: iters).mkString(",\n")
  }

  /** Final-model scoring SQL over `feats` and `w{iterations}`. */
  def predictOracleSelect(iterations: Int): String = {
    val w = s"w$iterations"
    val sig = s"""CAST(1.0/(1.0 + exp(-($w.w0 + $w.w1*len_score + $w.w2*diversity
          + $w.w3*stop_ratio + $w.w4*uniq3))) AS DECIMAL(18,8))"""
    s"""SELECT doc_id, CAST($sig AS DOUBLE) AS p, $sig >= 0.5 AS pred, y
        FROM feats CROSS JOIN $w ORDER BY doc_id"""
  }
}
