package graft.queries

import graft.{QueryDef, RoundCounter, Tables}
import graft.operators.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-analytics QueryDefs (g*) — iterative algorithms over the
  * customer–supplier purchase graph (customers and suppliers are nodes,
  * an order line is an undirected edge). Every def is an exactly-
  * replayable recurrence the DuckDB oracle unrolls as a CTE chain:
  * PageRank/PPR run a fixed iteration count (iteration is the
  * approximation knob there — see [[graft.operators.Graph]] for the
  * fixed-point arithmetic that makes them order-independent), while the
  * fixpoint algorithms (components, k-core, LPA, BFS) RUN TO CONVERGENCE
  * and record the reached round count R, which the late-bound oracle
  * ([[graft.QueryDef.oracleGen]]) unrolls verbatim — so a deeper graph
  * at 100× scale converges instead of silently emitting partial labels.
  */
object GraphQueries {

  private def q(name: String, oracle: Option[String])(f: Tables => DataFrame): QueryDef =
    QueryDef(name, (s, dir) => f(Tables(s, dir)), oracle)

  /** Adaptive-iteration def: the run records its data-derived round count
    * R (a [[graft.RoundCounter]] the `oracle` thunk closes over), and the
    * oracle SQL — resolved by [[graft.Verify]] only AFTER every query has
    * run — unrolls exactly R rounds. A dump WITHOUT a prior run in this
    * process would unroll the counter's seeded fallback — wrong at any
    * scale where the data-derived R differs — so `oracleReady` reports
    * whether the counter was set by a run and the dump path emits no
    * oracle otherwise (ADVICE r12 #3; driver falls back to rows-only).
    */
  private def qGen(name: String, rounds: RoundCounter)(oracle: => String)(
      f: Tables => DataFrame): QueryDef =
    QueryDef(name, (s, dir) => f(Tables(s, dir)), None,
      oracleGen = Some(() => oracle), oracleReady = () => rounds.ran)

  /** Distinct (customer, supplier) purchase pairs; nodes disambiguated by
    * parity (customer k → 2k, supplier k → 2k+1).
    */
  private def purchaseEdges(t: Tables, minQty: Option[Int]): DataFrame = {
    val li = minQty.fold(t.lineitem)(q => t.lineitem.filter(col("l_quantity") > q))
    val pairs = t.orders.select("o_orderkey", "o_custkey")
      .join(li.select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
    Graph.symmetrize(pairs, "c", "s")
  }

  private def edgesCte(minQty: Option[Int]): String = {
    val filter = minQty.fold("")(q => s" WHERE l_quantity > $q")
    s"""e0 AS MATERIALIZED (
         SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey$filter),
       edges AS MATERIALIZED (
         SELECT CAST(c AS BIGINT) AS src, CAST(s AS BIGINT) AS dst FROM e0
         UNION ALL
         SELECT CAST(s AS BIGINT), CAST(c AS BIGINT) FROM e0)"""
  }

  // g01 — 5 iterations of fixed-point PageRank over the full purchase
  // graph. The oracle replays the integer recurrence, so a wrong degree,
  // a dropped contribution, or any float-order nondeterminism hash-fails
  // on the exact rank_fp column.
  private val g01 = q("g01_pagerank", Some(
    s"""WITH ${edgesCte(None)},
        deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
                FROM edges GROUP BY 1),
        ${Graph.pageRankOracleCtes(iterations = 5)}
        SELECT node, CAST(r AS BIGINT) AS rank_fp,
               CAST(r AS BIGINT) / 1000000000000.0 AS rank
        FROM r5 ORDER BY node""")) { t =>
    Graph.pageRank(purchaseEdges(t, None), iterations = 5).orderBy("node")
  }

  // g02 — connected components of the SPARSE purchase graph (only
  // high-quantity lines: > 48 keeps ~4% of edges, fragmenting the dense
  // bipartite graph into real components). RUN-TO-CONVERGENCE (VERDICT
  // r11 #1): min-label rounds iterate until a round changes nothing, so
  // a 100× graph with a larger diameter converges instead of silently
  // emitting partial labels; the reached round count R is recorded and
  // the oracle unrolls exactly R rounds.
  private val g02Rounds = new RoundCounter(15)
  private val g02 = qGen("g02_connected_components", g02Rounds) {
    val r = g02Rounds.get
    s"""WITH ${edgesCte(Some(48))},
        ${Graph.ccOracleCtes(iterations = r)}
        SELECT node, label AS component FROM l$r ORDER BY node"""
  } { t =>
    val (labels, r) =
      Graph.connectedComponentsConverged(purchaseEdges(t, Some(48)))
    g02Rounds.set(r)
    labels.orderBy("node")
  }

  // g03 — exact triangle count of the rare-part CO-PURCHASE graph
  // (customers linked when they bought the same part at quantity ≥ 49 —
  // the rare-event filter keeps the graph sparse; the unfiltered
  // co-purchase graph is near-complete and its triangle count is the
  // O(n³) query nobody should run). The engine counts via degree-ordered
  // orientation (each triangle once, wedge work O(m^1.5)); the oracle
  // counts the canonical a<b<c 3-way join — the equality proves the
  // orientation neither drops nor double-counts.
  private val g03 = q("g03_triangle_count", Some(
    """WITH rp AS (
         SELECT DISTINCT l_partkey AS p, o_custkey AS c
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity >= 49),
       e AS MATERIALIZED (
         SELECT DISTINCT a.c AS x, b.c AS y
         FROM rp a JOIN rp b ON a.p = b.p AND a.c < b.c),
       nodes AS (SELECT x AS n FROM e UNION SELECT y FROM e)
       SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
              (SELECT CAST(COUNT(*) AS BIGINT)
               FROM e ab JOIN e bc ON ab.y = bc.x
                         JOIN e ac ON ac.x = ab.x AND ac.y = bc.y) AS n_triangles""")) { t =>
    val rare = t.lineitem.filter(col("l_quantity") >= 49)
      .select("l_orderkey", "l_partkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("p"), col("o_custkey").as("c")).distinct()
    val pairs = rare.as("a")
      .join(rare.as("b"), col("a.p") === col("b.p") && col("a.c") < col("b.c"))
      .select(col("a.c").as("x"), col("b.c").as("y")).distinct()
    Graph.triangleCount(pairs, "x", "y")
  }

  // g04 — 3-CORE of the sparse purchase graph by iterative peeling
  // (remove-degree-<3 until stable). RUN-TO-CONVERGENCE: peels until a
  // round removes no edge — a deeper cascade (long pendant paths peel
  // one layer per round) fully resolves at any scale; the recorded R
  // drives the oracle's unroll. The surviving (node, within-core degree)
  // rows are the dense backbone the leaf-cascade strips away.
  private val g04Rounds = new RoundCounter(10)
  private val g04 = qGen("g04_kcore", g04Rounds) {
    val r = g04Rounds.get
    s"""WITH ${edgesCte(Some(48))},
        ${Graph.kCoreOracleCtes(k = 3, rounds = r)}
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM p$r GROUP BY 1 ORDER BY node"""
  } { t =>
    val (core, r) =
      Graph.kCoreConvergedRun(purchaseEdges(t, Some(48)), k = 3)
    g04Rounds.set(r)
    core.orderBy("node")
  }

  // g05 — synchronous label-propagation communities over the sparse
  // purchase graph (g02's edge set): plurality labels with count ties to
  // the smallest label. RUN-UNTIL-STABLE: rounds continue until a
  // fixpoint OR the period-2 oscillation sync LPA enters on bipartite
  // structure (after which no new labeling can appear) — the stopping
  // round R is a deterministic function of the data, and the oracle
  // unrolls exactly R rounds with the window-formulated argmax, so the
  // runtime's max(struct(count, -label)) plurality (no per-node window)
  // must reproduce the full labeling bit-for-bit.
  private val g05Rounds = new RoundCounter(4)
  private val g05 = qGen("g05_label_propagation", g05Rounds) {
    val r = g05Rounds.get
    s"""WITH ${edgesCte(Some(48))},
        ${Graph.lpaOracleCtes(iterations = r)}
        SELECT node, label AS community FROM p$r ORDER BY node"""
  } { t =>
    val (labels, r) =
      Graph.labelPropagationConverged(purchaseEdges(t, Some(48)))
    g05Rounds.set(r)
    labels.orderBy("node")
  }

  // g06 — multi-source BFS over the sparse purchase graph: exact hop
  // distance from the nearest seeded customer (every 100th custkey) by
  // frontier expansion. RUN-TO-CONVERGENCE: rounds continue until the
  // frontier empties, so the full reachable set resolves at any graph
  // eccentricity; the recorded R drives the oracle's unroll. Unreached
  // nodes are absent by contract; a node reached late, twice, or at the
  // wrong distance hash-fails.
  private val g06Rounds = new RoundCounter(6)
  private val g06 = qGen("g06_bfs_distances", g06Rounds) {
    val r = g06Rounds.get
    s"""WITH ${edgesCte(Some(48))},
        seeds AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS node
          FROM orders WHERE o_custkey % 100 = 0),
        ${Graph.bfsOracleCtes(maxDepth = r)}
        SELECT node, CAST(dist AS INT) AS dist FROM b$r ORDER BY node"""
  } { t =>
    val seeds = t.orders.filter(col("o_custkey") % 100 === 0)
      .select((col("o_custkey") * 2).cast("long").as("node"))
    val (reached, r) =
      Graph.bfsDistancesConverged(purchaseEdges(t, Some(48)), seeds)
    g06Rounds.set(r)
    reached.orderBy("node")
  }

  // g07 — PERSONALIZED PageRank over the sparse purchase graph: teleport
  // mass restricted to the seeded customers (every 100th custkey,
  // graph-members only — the runtime semi-joins, the oracle's seeds CTE
  // mirrors it), 5 iterations of the same exact integer recurrence as
  // g01. Rank = proximity to the seed set; the oracle unrolls the gated
  // recurrence, so a leaked teleport, wrong |S|, or missing seed gate
  // hash-fails on rank_fp.
  private val g07 = q("g07_personalized_pagerank", Some(
    s"""WITH ${edgesCte(Some(48))},
        deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
                FROM edges GROUP BY 1),
        seeds AS MATERIALIZED (
          SELECT node FROM deg
          WHERE node IN (SELECT CAST(o_custkey * 2 AS BIGINT)
                         FROM orders WHERE o_custkey % 100 = 0)),
        ${Graph.pprOracleCtes(iterations = 5)}
        SELECT node, CAST(r AS BIGINT) AS rank_fp,
               CAST(r AS BIGINT) / 1000000000000.0 AS rank
        FROM r5 ORDER BY node""")) { t =>
    val seeds = t.orders.filter(col("o_custkey") % 100 === 0)
      .select((col("o_custkey") * 2).cast("long").as("node"))
    Graph.personalizedPageRank(purchaseEdges(t, Some(48)), seeds, iterations = 5)
      .orderBy("node")
  }

  // g08 — connected components by ALTERNATING LARGE-STAR/SMALL-STAR
  // (Kiveris et al. 2014) over g02's edge set: the O(log n)-ROUND form of
  // g02's min-label propagation (one round per diameter unit there; star
  // contraction folds paths doubly-exponentially here — GraphSpec pins a
  // 41-node chain at 40 min-label rounds vs ≤8 alternating, identical
  // labels). The output contract is identical — component = min node id —
  // so the oracle needs NO round unroll at all: a recursive reachability
  // closure (label reaches node, pruned to label < node) whose per-node
  // MIN is the component, verifying the algorithm's fixpoint rather than
  // its trajectory. Any wrong star contraction anywhere hash-fails.
  private val g08 = q("g08_cc_alternating", Some(
    s"""WITH RECURSIVE ${edgesCte(Some(48))},
        rr AS (
          SELECT DISTINCT src AS node, src AS label FROM edges
          UNION
          SELECT e.dst AS node, rr.label
          FROM edges e JOIN rr ON e.src = rr.node
          WHERE rr.label < e.dst)
        SELECT node, CAST(MIN(label) AS BIGINT) AS component
        FROM rr GROUP BY node ORDER BY node""")) { t =>
    Graph.connectedComponentsAlternating(purchaseEdges(t, Some(48)))._1
      .orderBy("node")
  }

  // g09 — RESIDUAL-STOPPED PageRank over the sparse purchase graph
  // (VERDICT r12 #4): g01/g07's fixed 5 iterations are the documented
  // approximation knob; here the iteration count is data-derived — rounds
  // continue until max |Δrank_fp| < 10⁷ (10⁻⁵ rank units) — and the
  // late-bound oracle unrolls exactly the reached R. Power iteration
  // contracts the residual by ~0.85 per round, so R ≈ 25–40 at this
  // tolerance at ANY scale (the initial rank Scale/N shrinks with N, so
  // absolute tolerance needs fewer rounds on bigger graphs, never more).
  private val g09Rounds = new RoundCounter(30)
  private val g09 = qGen("g09_pagerank_converged", g09Rounds) {
    val r = g09Rounds.get
    s"""WITH ${edgesCte(Some(48))},
        deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
                FROM edges GROUP BY 1),
        ${Graph.pageRankOracleCtes(iterations = r)}
        SELECT node, CAST(r AS BIGINT) AS rank_fp,
               CAST(r AS BIGINT) / 1000000000000.0 AS rank
        FROM r$r ORDER BY node"""
  } { t =>
    val (ranks, r) = Graph.pageRankConverged(purchaseEdges(t, Some(48)))
    g09Rounds.set(r)
    ranks.orderBy("node")
  }

  /** (customer, supplier) purchase pairs carrying a WEIGHT: the pair's
    * minimum line quantity (exact BIGINT — "the cheapest traversal this
    * relationship ever offered"). Symmetrized with the weight on both
    * directions; [[Graph.symmetrize]] is pair-only, so the mirror is
    * inlined here.
    */
  private def weightedPurchaseEdges(t: Tables, minQty: Option[Int]): DataFrame = {
    val li = minQty.fold(t.lineitem)(q => t.lineitem.filter(col("l_quantity") > q))
    val pairs = t.orders.select("o_orderkey", "o_custkey")
      .join(li.select("l_orderkey", "l_suppkey", "l_quantity"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).cast("long").as("c"),
        (col("l_suppkey") * 2 + 1).cast("long").as("s"))
      .agg(min(col("l_quantity").cast("long")).as("w"))
    pairs.select(col("c").as("src"), col("s").as("dst"), col("w"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst"), col("w")))
  }

  private def weightedEdgesCte(minQty: Option[Int]): String = {
    val filter = minQty.fold("")(q => s" WHERE l_quantity > $q")
    s"""e0 AS MATERIALIZED (
         SELECT CAST(o_custkey * 2 AS BIGINT) AS c,
                CAST(l_suppkey * 2 + 1 AS BIGINT) AS s,
                MIN(CAST(l_quantity AS BIGINT)) AS w
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey$filter
         GROUP BY 1, 2),
       edges AS MATERIALIZED (
         SELECT c AS src, s AS dst, w FROM e0
         UNION ALL
         SELECT s, c, w FROM e0)"""
  }

  // g10 — weighted single-source SHORTEST PATHS over the sparse purchase
  // graph (the min-plus semiring — a different algorithm class from g06's
  // hop-counting BFS: the cheapest path can be hop-LONGER than the direct
  // edge; GraphSpec pins that case by hand). Edge weight = the pair's
  // minimum line quantity; seed = the smallest node (data-derived
  // identically on both engines). Frontier-driven Bellman-Ford runs until
  // a round improves nothing, records R, and the late-bound oracle
  // unrolls R rounds of FULL relaxation (round-for-round equal to the
  // frontier run — see Graph.ssspConverged). Distances are exact BIGINT
  // sums, so any dropped relaxation or order dependence hash-fails.
  private val g10Rounds = new RoundCounter(10)
  private val g10 = qGen("g10_weighted_sssp", g10Rounds) {
    val r = g10Rounds.get
    s"""WITH ${weightedEdgesCte(Some(48))},
        seeds AS MATERIALIZED (SELECT MIN(src) AS node FROM edges),
        ${Graph.ssspOracleCtes(r)}
        SELECT node, CAST(dist AS BIGINT) AS dist FROM d$r ORDER BY node"""
  } { t =>
    val edges = weightedPurchaseEdges(t, Some(48))
    val (dist, r) = Graph.ssspConverged(edges, edges.agg(min(col("src")).as("node")))
    g10Rounds.set(r)
    dist.orderBy("node")
  }

  // g11 — sampled-pivot CLOSENESS CENTRALITY over the sparse purchase
  // graph (Eppstein & Wang 2001 — the estimator that makes centrality
  // feasible at all: exact closeness is all-pairs BFS, O(n·m); K pivots
  // give ±ε·diameter error with K = O(log n/ε²) INDEPENDENT of graph
  // size). Pivots = the 8 smallest node ids (data-derived identically on
  // both engines); ONE frontier loop carries all 8 BFS frontiers keyed
  // (seed, node), runs to convergence, records R. Per node: the pivots
  // reaching it, their exact BIGINT distance sum, and the single-division
  // estimate ĉ(v) = (n−1)·K_v / (n·S_v). The late-bound oracle unrolls
  // R rounds of the per-seed recurrence, so a distance wrong for ANY
  // (pivot, node) pair — not just a biased average — hash-fails.
  private val g11Rounds = new RoundCounter(8)
  private val g11 = qGen("g11_closeness_sampled", g11Rounds) {
    val r = g11Rounds.get
    s"""WITH ${edgesCte(Some(48))},
        seeds AS MATERIALIZED (
          SELECT src AS node FROM edges GROUP BY 1 ORDER BY 1 LIMIT 8),
        ${Graph.bfsPerSeedOracleCtes(maxDepth = r)},
        agg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS n_reached,
                 CAST(SUM(dist) AS BIGINT) AS sum_dist
          FROM b$r GROUP BY 1),
        nn AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n FROM edges)
        SELECT node, n_reached, sum_dist,
               CAST((n - 1) * n_reached AS DOUBLE) /
               CAST(n * sum_dist AS DOUBLE) AS closeness
        FROM agg CROSS JOIN nn WHERE sum_dist > 0 ORDER BY node"""
  } { t =>
    val edges = purchaseEdges(t, Some(48))
    val seeds = edges.select("src").distinct().orderBy("src").limit(8)
      .select(col("src").as("node"))
    val (dists, r) = Graph.bfsPerSeedConverged(edges, seeds)
    g11Rounds.set(r)
    val nNodes = edges.agg(countDistinct(col("src")).as("n"))
    Graph.pivotCloseness(dists, nNodes).orderBy("node")
  }

  /** g03's rare-part co-purchase graph as canonical (x < y) pairs — the
    * triangle-bearing geometry the truss family needs (the customer–
    * supplier purchase graph is bipartite: no odd cycles, no triangles,
    * every k-truss trivially empty).
    */
  private def coPurchasePairs(t: Tables): DataFrame = {
    val rare = t.lineitem.filter(col("l_quantity") >= 49)
      .select("l_orderkey", "l_partkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("p"), col("o_custkey").as("c")).distinct()
    rare.as("a")
      .join(rare.as("b"), col("a.p") === col("b.p") && col("a.c") < col("b.c"))
      .select(col("a.c").as("x"), col("b.c").as("y")).distinct()
  }

  private val coPurchaseCte: String =
    """co0 AS (
         SELECT DISTINCT l_partkey AS p, o_custkey AS c
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity >= 49),
       t0 AS MATERIALIZED (
         SELECT DISTINCT a.c AS x, b.c AS y
         FROM co0 a JOIN co0 b ON a.p = b.p AND a.c < b.c)"""

  // g12 — 4-TRUSS of the rare-part co-purchase graph: EDGE-centric
  // peeling (Cohen 2008) — the 12th algorithm and a new class beside
  // g04's node peeling: every surviving edge must close ≥ 2 triangles
  // within the surviving set, removals cascade, rounds run until stable
  // (R recorded, late-bound oracle unrolls the identical wedge-join +
  // HAVING recurrence). The truss is the community backbone k-core
  // can't isolate — a hub with many non-mutual neighbors survives
  // degree peeling but carries no triangles. Output = the stable truss
  // edges WITH their support, so one wrong triangle count anywhere —
  // not just a wrong survivor set — hash-fails.
  private val g12Rounds = new RoundCounter(3)
  private val g12 = qGen("g12_ktruss", g12Rounds) {
    val r = g12Rounds.get
    s"""WITH $coPurchaseCte,
        ${Graph.kTrussOracleCtes(k = 4, rounds = r)}
        SELECT x, y, support FROM sup$r ORDER BY x, y"""
  } { t =>
    val (truss, r) = Graph.kTrussConverged(coPurchasePairs(t), k = 4)
    g12Rounds.set(r)
    truss.orderBy("x", "y")
  }

  val all: Seq[QueryDef] = Seq(g01, g02, g03, g04, g05, g06, g07, g08, g09, g10, g11, g12)
}
