package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 pins: ADAPTIVE-probe filtered ANN (s26, VERDICT r13 #4). The
  * load-bearing claims: a candidate floor covering the whole filtered
  * corpus makes the serve EXACT (widening degrades gracefully to the s20
  * answer, never past it); on filter-disjoint geometry the adaptive ring
  * recovers neighbors any fixed probe depth at the same floor misses; and
  * per-query depths really are data-dependent (friendly queries stay at
  * the cheap floor). The recall/cost frontier is graded per-round in
  * RECALL (s21_adaptive entries, both geometries).
  */
class Round14OpsSpec extends SparkSpec {

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private val pred = col("vec_id") % 100 === 0
  private val filt = col("label") === 3

  test("adaptive serve with a floor ≥ |filtered| ≡ the exact filtered answer") {
    val nFiltered = embs.filter(filt).count().toInt
    val exact = Similarity.bruteForceTopKFiltered(embs, pred, filt, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    val adaptive = Similarity.ivfTopKFilteredAdaptive(embs, pred, filt, k = 10,
      nProbeFloor = 1, minCandidates = nFiltered + 1)
      .orderBy("query_id", "rank").collect().toSeq
    assert(adaptive == exact,
      "a floor the filtered corpus cannot satisfy must widen to every cell = exact")
  }

  test("adaptive recall beats fixed-depth at the same probe floor on this corpus") {
    val exact = Similarity.bruteForceTopKFiltered(embs, pred, filt, k = 10)
      .localCheckpoint(true)
    val fixed = Similarity.recallAtK(exact,
      Similarity.ivfTopKFiltered(embs, pred, filt, 10, Similarity.IvfProbes))
    val adaptive = Similarity.recallAtK(exact,
      Similarity.ivfTopKFilteredAdaptive(embs, pred, filt, 10,
        Similarity.IvfProbes, minCandidates = 32))
    assert(adaptive > fixed,
      s"adaptive ($adaptive) must beat fixed-depth ($fixed) at floor ${Similarity.IvfProbes}")
    assert(adaptive >= 0.7, s"adaptive recall $adaptive below the 0.7 bar")
  }

  test("depths are per-query: the ring stops growing once the floor is met") {
    // with minCandidates=32 and ~50 filtered rows over 32 cells, a query
    // needs strictly fewer than all cells — the probe ring must be smaller
    // than the full-probe ring but at least the floor per query
    val cents = Similarity.ivfCentroids(embs)
    val probes = Similarity.ivfFilteredAdaptiveProbes(embs, cents, pred, filt,
      nProbeFloor = Similarity.IvfProbes, minCandidates = 32)
      .groupBy("query_id").agg(count(lit(1)).as("n_cells"))
      .localCheckpoint(true)
    assert(probes.filter(col("n_cells") < Similarity.IvfProbes).count() == 0,
      "no query may probe below the floor")
    assert(probes.filter(col("n_cells") === Similarity.IvfCells).count()
      < probes.count(),
      "at least one query must stop short of probing every cell")
  }

  test("every returned neighbor satisfies the filter; ranks dense 1..k") {
    val got = Similarity.ivfTopKFilteredAdaptive(embs, pred, filt, k = 10,
      nProbeFloor = Similarity.IvfProbes, minCandidates = 32)
      .localCheckpoint(true)
    val bad = got.join(embs.filter(filt).select(col("vec_id").as("neighbor_id")),
      Seq("neighbor_id"), "left_anti").count()
    assert(bad == 0, "a returned neighbor violated the filter")
    val perQuery = got.groupBy("query_id")
      .agg(countDistinct("rank").as("n"), min("rank").as("lo"))
      .filter(col("lo") =!= 1).count()
    assert(perQuery == 0, "ranks must start at 1 per query")
  }
}
