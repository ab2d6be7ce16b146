package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-analytics QueryDefs (g*) — iterative algorithms over the
  * customer–supplier purchase graph (customers and suppliers are nodes,
  * an order line is an undirected edge). Both defs run a FIXED iteration
  * count of an exactly-replayable recurrence, so the DuckDB oracle unrolls
  * the same iterations as a CTE chain and hash-matches exactly — see
  * [[graft.operators.Graph]] for the fixed-point arithmetic that makes
  * PageRank order-independent.
  */
object GraphQueries {

  private def q(name: String, oracle: Option[String])(f: Tables => DataFrame): QueryDef =
    QueryDef(name, (s, dir) => f(Tables(s, dir)), oracle)

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
  // bipartite graph into real components). 15 min-label-propagation
  // rounds, fixed in both engines; GraphSpec proves 15 reaches the
  // fixpoint on the testdata graph.
  private val g02 = q("g02_connected_components", Some(
    s"""WITH ${edgesCte(Some(48))},
        ${Graph.ccOracleCtes(iterations = 15)}
        SELECT node, label AS component FROM l15 ORDER BY node""")) { t =>
    Graph.connectedComponents(purchaseEdges(t, Some(48)), iterations = 15)
      .orderBy("node")
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
  // (remove-degree-<3 until stable; 10 fixed rounds both engines —
  // GraphSpec proves 10 reaches the fixpoint on the testdata graph). The
  // surviving (node, within-core degree) rows are the dense backbone the
  // leaf-cascade strips away.
  private val g04 = q("g04_kcore", Some(
    s"""WITH ${edgesCte(Some(48))},
        ${Graph.kCoreOracleCtes(k = 3, rounds = 10)}
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM p10 GROUP BY 1 ORDER BY node""")) { t =>
    Graph.kCore(purchaseEdges(t, Some(48)), k = 3, rounds = 10)
      .orderBy("node")
  }

  // g05 — synchronous label-propagation communities over the sparse
  // purchase graph (g02's edge set): 4 fixed rounds, plurality labels with
  // count ties to the smallest label. The oracle unrolls the identical
  // rounds with the window-formulated argmax, so the runtime's
  // max(struct(count, -label)) plurality (no per-node window) must
  // reproduce the full labeling bit-for-bit.
  private val g05 = q("g05_label_propagation", Some(
    s"""WITH ${edgesCte(Some(48))},
        ${Graph.lpaOracleCtes(iterations = 4)}
        SELECT node, label AS community FROM p4 ORDER BY node""")) { t =>
    Graph.labelPropagation(purchaseEdges(t, Some(48)), iterations = 4)
      .orderBy("node")
  }

  // g06 — multi-source BFS over the sparse purchase graph: exact hop
  // distance from the nearest seeded customer (every 100th custkey) by
  // frontier expansion, 6 fixed rounds both engines (GraphSpec proves 6
  // reaches the fixpoint on the testdata graph — the sparse components
  // are shallow). Unreached nodes are absent by contract; the oracle
  // unrolls the same rounds, so a node reached late, twice, or at the
  // wrong distance hash-fails.
  private val g06 = q("g06_bfs_distances", Some(
    s"""WITH ${edgesCte(Some(48))},
        seeds AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS node
          FROM orders WHERE o_custkey % 100 = 0),
        ${Graph.bfsOracleCtes(maxDepth = 6)}
        SELECT node, CAST(dist AS INT) AS dist FROM b6 ORDER BY node""")) { t =>
    val seeds = t.orders.filter(col("o_custkey") % 100 === 0)
      .select((col("o_custkey") * 2).cast("long").as("node"))
    Graph.bfsDistances(purchaseEdges(t, Some(48)), seeds, maxDepth = 6)
      .orderBy("node")
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

  val all: Seq[QueryDef] = Seq(g01, g02, g03, g04, g05, g06, g07)
}
