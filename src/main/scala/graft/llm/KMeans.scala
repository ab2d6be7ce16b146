package graft.llm

import graft.functions.VecMath
import graft.operators.Materialize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * that powers SemDeDup-style semantic dedup (Abbas et al. 2023: cluster
  * first, then search near-duplicates only WITHIN clusters) and IVF-style
  * partitioning, trained data-parallel inside the engine.
  *
  * Architecture: centroids are the k×dim MODEL (driver-held, the
  * parameter-server-of-one shape — k·dim doubles cross the driver boundary
  * per iteration, never rows); assignment is a narrow map over the corpus
  * (k codegen'd [[VecMath.vecDot]] calls per vector against broadcast
  * centroid literals — no join, no shuffle); the update is ONE
  * map-side-combined (cid, dim) aggregation.
  *
  * Cross-engine determinism (hence the unrolled DuckDB oracle in
  * [[kmeansOracleCtes]]):
  *   - init = the k smallest vec_ids (exact, orderable);
  *   - distances compare as `c·c − 2·x·c` with every dot the strict
  *     left-to-right double fold ([[VecMath.dot]] ≡ DuckDB
  *     `list_dot_product`), ties → smaller cid;
  *   - centroid updates quantize per-element values to DECIMAL(30,12),
  *     sum exactly (order-independent), and divide once in double —
  *     so the whole trajectory is partitioning-independent;
  *   - empty clusters keep their previous centroid.
  */
object KMeans {

  /** Driver-held model: centroid vectors indexed by cid 0..k-1. */
  type Model = Array[Array[Double]]

  /** Deterministic init: the k smallest vec_ids' embeddings (a bounded
    * k-row collect).
    */
  def init(embeddings: DataFrame, k: Int): Model =
    embeddings.orderBy("vec_id").limit(k)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** cid of the nearest centroid (squared-L2 via c·c − 2·x·c; ties →
    * smaller cid) as a narrow column over `embCol`.
    *
    * Implementation note: the argmin is `array_min` over (d, cid) structs —
    * struct ordering compares d first, then cid, which IS the
    * min-distance-tie-to-smaller-cid rule — because a `when`-chain fold
    * duplicates the accumulated branch twice per step (2^k copies of the
    * distance expressions; at k=8, dim=64 that was a ~10⁵-node tree whose
    * PLANNING took ~45 s per job). This form is linear in k·dim.
    */
  def assignCol(model: Model, embCol: Column): Column = {
    def dist(c: Array[Double]): Column = {
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      lit(cc) - lit(2.0) * VecMath.vecDot(embCol, typedlit(c.toSeq))
    }
    array_min(array(model.zipWithIndex.map { case (c, cid) =>
      struct(dist(c).as("d"), lit(cid.toLong).as("cid"))
    }: _*)).getField("cid")
  }

  /** `iterations` Lloyd steps from [[init]]. Returns the final model. */
  def train(embeddings: DataFrame, k: Int, iterations: Int): Model = {
    require(k >= 1 && iterations >= 0)
    val emb = Materialize.cut(embeddings.select("vec_id", "embedding"))
    var model = init(emb, k)
    require(model.length == k,
      s"KMeans.train: corpus has only ${model.length} vectors, need k = $k")
    val dim = model.head.length
    for (_ <- 1 to iterations) {
      val means = emb
        .select(assignCol(model, col("embedding")).as("cid"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(sum(col("v").cast(DecimalType(30, 12))).as("s"),
          count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          (col("s").cast("double") / col("n").cast("double")).as("mv"))
        .collect() // bounded: k·dim rows (the model), never corpus rows
      val next = model.map(_.clone())
      means.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2)
      }
      // empty clusters: no (cid, pos) rows → previous centroid rides through
      model = next
      require(model.forall(_.length == dim))
    }
    model
  }

  /** Train, then label every vector: (vec_id, cid). */
  def trainAndAssign(embeddings: DataFrame, k: Int, iterations: Int): DataFrame = {
    val model = train(embeddings, k, iterations)
    embeddings.select(col("vec_id"), assignCol(model, col("embedding")).as("cid"))
  }

  /** DuckDB replay of the identical trajectory: unrolled CTEs
    * `c0 .. c{iterations}` (cid, cv DOUBLE[]) + assignment CTEs over a
    * caller-provided `emb(vec_id, embedding)` CTE. The final assignment is
    * `a{iterations}` (vec_id, cid).
    */
  def kmeansOracleCtes(k: Int, iterations: Int): String = {
    val c0 =
      s"""c0 AS MATERIALIZED (
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
                CAST(embedding AS DOUBLE[]) AS cv
         FROM (SELECT vec_id, embedding FROM emb ORDER BY vec_id LIMIT $k) z)"""
    val ue =
      """ue AS MATERIALIZED (
         SELECT vec_id,
                unnest(generate_series(1, len(embedding))) AS dim,
                unnest(CAST(embedding AS DOUBLE[])) AS v
         FROM emb)"""
    def assign(i: Int, from: String) =
      s"""dd$i AS MATERIALIZED (
           SELECT e.vec_id, c.cid,
                  list_dot_product(c.cv, c.cv)
                  - 2.0 * list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv) AS d
           FROM emb e CROSS JOIN $from c),
         a$i AS MATERIALIZED (
           SELECT d.vec_id, MIN(d.cid) AS cid
           FROM dd$i d JOIN (SELECT vec_id, MIN(d) AS md FROM dd$i GROUP BY 1) m
             ON d.vec_id = m.vec_id AND d.d = m.md
           GROUP BY 1)"""
    val iters = (1 to iterations).map { i =>
      s"""${assign(i, s"c${i - 1}")},
         m$i AS (
           SELECT a.cid, ue.dim,
                  CAST(SUM(CAST(ue.v AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS mv
           FROM a$i a JOIN ue ON a.vec_id = ue.vec_id
           GROUP BY 1, 2),
         c$i AS MATERIALIZED (
           SELECT p.cid, COALESCE(nl.cv, p.cv) AS cv
           FROM c${i - 1} p LEFT JOIN (
             SELECT cid, list(mv ORDER BY dim) AS cv FROM m$i GROUP BY 1) nl
             ON p.cid = nl.cid)"""
    }
    // the served assignment comes from the FINAL model
    val served = assign(iterations + 1, s"c$iterations")
      .replace(s"dd${iterations + 1}", "ddf").replace(s"a${iterations + 1}", "af")
    (Seq(c0, ue) ++ iters :+ served).mkString(",\n")
  }
}
