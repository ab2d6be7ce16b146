package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed iterative graph analytics over an edge DataFrame — the
  * Pregel-without-Pregel shapes (PageRank, connected components) expressed
  * as per-iteration relational joins so Catalyst owns the physical plan.
  *
  * Edge contract: a DataFrame with long columns `src`, `dst`, one row per
  * DIRECTED edge. Undirected graphs pass both orientations (see
  * [[symmetrize]]). Nodes are the distinct `src` values — on a symmetrized
  * graph that is every endpoint, and every node has out-degree ≥ 1 (no
  * dangling-mass correction needed).
  *
  * Scale shape (both algorithms): the edge table — the 100 TB side — is
  * scanned once per iteration through an equi-join on `src` against the
  * node-sized state frame; state is [[Materialize]]d each iteration
  * (lineage would otherwise grow exponentially and a recompute would replay
  * every prior iteration), so failure recovery under a checkpoint dir
  * replays at most one iteration. Nothing is ever collected to the driver;
  * per-iteration state is one shuffle (the groupBy on `dst`) plus one
  * node-sized join. On a real cluster, bucketing the edge table by `src`
  * co-locates every iteration's join for free.
  *
  * Cross-engine determinism: PageRank runs in FIXED-POINT integer
  * arithmetic (rank scaled by 1e12, integer `div` everywhere), so an exact
  * integer answer replaces the order-dependent float sums a naive
  * implementation would produce — the DuckDB oracle unrolls the identical
  * integer recurrence and hash-matches bit-for-bit at any partitioning.
  */
object Graph {

  /** Rank scale: 1.0 of probability mass = 1e12 fixed-point units. Chosen
    * so 85 * totalMass stays far under 2^63 while keeping 12 significant
    * fractional digits.
    */
  val Scale: Long = 1000000000000L

  /** Both orientations of an undirected edge list (distinct input pairs). */
  def symmetrize(pairs: DataFrame, a: String, b: String): DataFrame = {
    val p = pairs.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst")).distinct()
    p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** One power-iteration round's CONTRIBUTION AGGREGATION — the shared
    * inner step of [[pageRank]] / [[pageRankConverged]] /
    * [[personalizedPageRank]], factored out so its skew posture is pinned
    * ONCE (GraphSpec): the `groupBy(dst)` sum plans a PARTIAL (map-side)
    * aggregate before the exchange, so a 10⁴-degree hub's fan-in
    * collapses to one row per map partition BEFORE it shuffles — per-key
    * shuffle volume is O(partitions), not O(degree), and power-law hubs
    * cannot straggle the round.
    */
  private[operators] def contribStep(e: DataFrame, ranks: DataFrame,
                                     degN: DataFrame): DataFrame =
    contribFromShares(e, ranks.join(degN, "node")
      .select(col("node"), expr("r div outdeg").as("share")))

  /** The contribution sum over a state frame that ALREADY carries each
    * node's out-share (r16 fusion, guide §2.4 "remove shuffles outright"):
    * the power-iteration loops carry `share = r div outdeg` IN the
    * materialized state — computed for free in the update projection, where
    * `outdeg` is already joined — so each round spends ONE edge-scan join +
    * the combined contribution sum, with no per-round ranks⋈degN join at
    * all. Arithmetic is unchanged (`share` is the identical integer), so
    * ranks are bit-identical to the unfused form (spec-pinned).
    */
  private[operators] def contribFromShares(e: DataFrame, shares: DataFrame): DataFrame =
    e.join(shares, e("src") === shares("node"))
      .groupBy(col("dst").as("node"))
      .agg(sum("share").as("contrib"))

  /** Fixed-point PageRank with damping `d = dampNum/100`.
    *
    * Recurrence (all integer arithmetic, `div` = floor division):
    * {{{
    *   r0(v)   = Scale div N
    *   share(u)= r(u) div outdeg(u)
    *   r'(v)   = (100-dampNum)*Scale div (100*N)
    *             + dampNum * sum_{u->v} share(u) div 100
    * }}}
    * Returns (node, rank_fp, rank) — the exact fixed-point rank and its
    * double rendering rank_fp / 1e12.
    */
  def pageRank(edges: DataFrame, iterations: Int, dampNum: Long = 85): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= 100)
    // the edge frame is consumed once per iteration plus the degree pass —
    // cut it ONCE so the (possibly join-derived) edge pipeline doesn't
    // replan and re-execute every round
    val e = Materialize.cut(edges)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    // node count as a broadcast scalar: no driver action, no collect
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    val degN = Materialize.cut(deg.crossJoin(broadcast(n)))
    var ranks = degN.select(col("node"),
      expr(s"${Scale}L div n_nodes").as("r"),
      expr(s"(${Scale}L div n_nodes) div outdeg").as("share"))
    for (_ <- 1 to iterations) {
      val contrib = contribFromShares(e, ranks.select("node", "share"))
      ranks = Materialize.cut(
        degN.join(contrib, Seq("node"), "left")
          .withColumn("r",
            expr(s"(${100 - dampNum} * ${Scale}L) div (100 * n_nodes)") +
              expr(s"($dampNum * coalesce(contrib, 0L)) div 100"))
          .select(col("node"), col("r"), expr("r div outdeg").as("share")))
    }
    ranks.select(col("node"), col("r").as("rank_fp"),
      (col("r") / lit(Scale.toDouble)).as("rank"))
  }

  /** Plan-evidence probe (r16): ONE [[pageRank]] round composed LAZILY —
    * the same contribution + update expressions the loop materializes per
    * round — so `explain` shows the per-round exchange/join structure that
    * the loop's cut frames (LogicalRDD leaves) hide. Not part of any query
    * path; consumed by [[graft.PlanDump]] only.
    */
  private[graft] def pageRankRoundProbe(edges: DataFrame,
                                        dampNum: Long = 85): DataFrame = {
    val e = Materialize.cut(edges)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    val degN = Materialize.cut(deg.crossJoin(broadcast(n)))
    val ranks = degN.select(col("node"),
      expr(s"${Scale}L div n_nodes").as("r"),
      expr(s"(${Scale}L div n_nodes) div outdeg").as("share"))
    val contrib = contribFromShares(e, ranks.select("node", "share"))
    degN.join(contrib, Seq("node"), "left")
      .withColumn("r",
        expr(s"(${100 - dampNum} * ${Scale}L) div (100 * n_nodes)") +
          expr(s"($dampNum * coalesce(contrib, 0L)) div 100"))
      .select(col("node"), col("r"), expr("r div outdeg").as("share"))
  }

  /** Plan-evidence probe for [[pageRankConverged]]'s per-round shape (r17):
    * ONE converged-loop round composed LAZILY — the state-carried
    * outdeg/n_nodes update join plus the observed residual — so `explain`
    * shows the per-round exchange/join structure the loop's cutFresh frames
    * hide. Consumed by [[graft.PlanDump]] only.
    */
  private[graft] def pageRankConvergedRoundProbe(edges: DataFrame,
                                                 dampNum: Long = 85): DataFrame = {
    val e = Materialize.cut(edges)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    val degN = Materialize.cut(deg.crossJoin(broadcast(n)))
    val ranks = degN.select(col("node"),
      expr(s"${Scale}L div n_nodes").as("r"),
      expr(s"(${Scale}L div n_nodes) div outdeg").as("share"),
      col("outdeg"), col("n_nodes"))
    val contrib = contribFromShares(e, ranks.select("node", "share"))
    ranks.select(col("node"), col("outdeg"), col("n_nodes"),
        col("r").as("old_r"))
      .join(contrib, Seq("node"), "left")
      .withColumn("r",
        expr(s"(${100 - dampNum} * ${Scale}L) div (100 * n_nodes)") +
          expr(s"($dampNum * coalesce(contrib, 0L)) div 100"))
      .select(col("node"), col("r"), expr("r div outdeg").as("share"),
        col("outdeg"), col("n_nodes"), col("old_r"))
  }

  /** DuckDB oracle fragment replaying the identical fixed-point recurrence:
    * unrolled CTE chain `r0 .. r{iterations}` over CTEs `edges(src,dst)`
    * and `deg(node,outdeg)` the caller provides. `//` is DuckDB floor
    * division — exact twin of Spark's `div` on the non-negative operands
    * used here.
    */
  def pageRankOracleCtes(iterations: Int, dampNum: Long = 85): String = {
    val n = "(SELECT CAST(COUNT(*) AS BIGINT) FROM deg)"
    val r0 = s"r0 AS MATERIALIZED (SELECT node, $Scale // $n AS r FROM deg)"
    val iters = (1 to iterations).map { i =>
      s"""r$i AS MATERIALIZED (
            SELECT d.node,
                   ((${100 - dampNum} * $Scale) // (100 * $n))
                   + (($dampNum * COALESCE(c.contrib, 0)) // 100) AS r
            FROM deg d LEFT JOIN (
              SELECT e.dst AS node, SUM(s.share) AS contrib
              FROM edges e JOIN (
                SELECT r.node, r.r // d2.outdeg AS share
                FROM r${i - 1} r JOIN deg d2 ON r.node = d2.node) s
                ON e.src = s.node
              GROUP BY 1) c ON d.node = c.node)"""
    }
    (r0 +: iters).mkString(",\n")
  }

  /** [[pageRank]] run TO RESIDUAL (VERDICT r12 #4): rounds continue until
    * max_v |r'(v) − r(v)| < `tolFp` (fixed-point units, Scale = 1e12 per
    * unit rank), so the iteration count is derived from the data instead
    * of fixed — the same convergence contract the fixpoint family
    * (components/k-core/LPA/BFS) got in r12, completing the story for the
    * power-iteration family. Returns (ranks, R); an oracle unrolls exactly
    * R rounds of the identical integer recurrence, and because the
    * recurrence is deterministic, the result is BIT-IDENTICAL to
    * [[pageRank]](edges, R) (spec-pinned).
    *
    * The residual rides the materialize action itself via
    * `Dataset.observe()` (VERDICT r14 #6): the state carries the previous
    * rank as `old_r` — since r17 read straight off the state's own `r`
    * column as the update's LEFT side, no extra join at all — and a
    * CollectMetrics node folds max|r'−r| into the SAME job that
    * checkpoints the state — ZERO extra probe jobs, convergence
    * detected at the earliest round (the r13 probe-cadence compromise
    * traded up-to-3 overshoot rounds for fewer probe joins; observe()
    * removes both costs). The recorded R is the EXECUTED round count, so
    * the late-bound oracle unrolls exactly what ran — bit-identity with
    * [[pageRank]](edges, R) is probe-mechanism-independent (the observed
    * column set is projected away before the state re-enters the
    * recurrence). The state additionally carries `outdeg`/`n_nodes` (r17,
    * guide §2.4), so the update never re-joins degN — one node-keyed join
    * per round total beyond the edge-scan contribution join.
    *
    * Because each round still references the state TWICE (contribution
    * step + the update's left side), the per-round state cut is
    * [[Materialize.cutFresh]] —
    * size-only join stats MULTIPLY for every non-semi join type, so a
    * twice-referenced state squares sizeInBytes per round (digit count
    * doubles; planning grinds into million-digit BigInt multiplication by
    * round ~20 — reproduced live in r15 before the reset). cutFresh
    * re-leafs the materialized rows with constant default stats, bounding
    * every round's planning cost regardless of the round shape.
    * Power iteration contracts the residual by ~damping per round
    * (0.85^R), so R ≈ log(r0/tol)/log(1/0.85) regardless of diameter —
    * ~20–40 rounds at practical tolerances, the same at 100× scale (the
    * initial rank Scale/N SHRINKS with N, so absolute tolerance needs
    * FEWER rounds on bigger graphs, never more). `maxRounds` is the
    * throwing runaway backstop, not a semantic knob.
    */
  def pageRankConverged(edges: DataFrame, tolFp: Long = 10000000L,
                        maxRounds: Int = 128,
                        dampNum: Long = 85): (DataFrame, Int) = {
    require(tolFp >= 1 && maxRounds >= 1 && dampNum >= 0 && dampNum <= 100)
    val e = Materialize.cut(edges)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    val degN = Materialize.cut(deg.crossJoin(broadcast(n)))
    // r17 fusion (guide §2.4, VERDICT r16 #3): the loop state carries
    // `outdeg` and `n_nodes` alongside (r, share), so the per-round update
    // is ONE node-keyed left join (state ⋈ contrib) instead of the r16
    // shape's TWO (degN ⋈ contrib, then ⋈ old ranks for the residual's
    // `old_r` — the previous rank now rides the state's own `r` column for
    // free). Arithmetic is unchanged: outdeg/n_nodes are the identical
    // integers degN carried, so ranks are bit-identical (parity-spec-pinned
    // against pageRank(edges, R)). Per round that removes one node-sized
    // join + its exchange AND the per-round degN broadcast rebuild.
    var ranks = degN.select(col("node"),
      expr(s"${Scale}L div n_nodes").as("r"),
      expr(s"(${Scale}L div n_nodes) div outdeg").as("share"),
      col("outdeg"), col("n_nodes"))
    // One lazy round over a state frame carrying (node, r, share, outdeg,
    // n_nodes): the update join + rank arithmetic, previous rank kept as
    // `old_r`, round-(k-1) rank (if `prev` is set) carried through as
    // `old_r0` so a 2-round batch can detect convergence at its FIRST round.
    def round(state: DataFrame, keepPrev: Boolean): DataFrame = {
      val contrib = contribFromShares(e, state.select("node", "share"))
      val lhs =
        if (keepPrev)
          state.select(col("node"), col("outdeg"), col("n_nodes"),
            col("r").as("old_r"), col("old_r").as("old_r0"))
        else
          state.select(col("node"), col("outdeg"), col("n_nodes"),
            col("r").as("old_r"))
      val upd = lhs.join(contrib, Seq("node"), "left")
        .withColumn("r",
          expr(s"(${100 - dampNum} * ${Scale}L) div (100 * n_nodes)") +
            expr(s"($dampNum * coalesce(contrib, 0L)) div 100"))
      val cols = Seq(col("node"), col("r"), expr("r div outdeg").as("share"),
        col("outdeg"), col("n_nodes"), col("old_r")) ++
        (if (keepPrev) Seq(col("old_r0")) else Nil)
      upd.select(cols: _*)
    }
    // TWO rounds per materialization (r17, VERDICT r16 #3 — the remaining
    // per-round cost was the cutFresh job itself): rounds 2k-1 and 2k
    // compose into ONE lazy plan, checkpointed once, with BOTH residuals
    // observed on the same action — max|r_{2k-1}−r_{2k-2}| (via the carried
    // old_r0/old_r columns) and max|r_{2k}−r_{2k-1}|. Convergence is
    // checked FIRST-ROUND-FIRST, so the stopping round R and the returned
    // ranks are identical to the one-round-per-job loop (round 2k-1's
    // ranks ride the materialized frame as `old_r`); the only extra work
    // on an odd-R stop is one discarded round — bounded by 1/R. Within the
    // batched plan the first round's subtree feeds both the second
    // contribution join and the update's left side; its exchanges are
    // IDENTICAL subtrees, so AQE's stage reuse computes each shuffle once
    // (only the node-sized post-exchange projections run twice).
    var rounds = 0
    var converged = false
    var result: DataFrame = ranks
    while (!converged) {
      val r1 = round(ranks, keepPrev = false)
      val obs = new org.apache.spark.sql.Observation(s"pr-residual-$rounds")
      val next = Materialize.cutFresh(
        round(r1, keepPrev = true)
          .observe(obs,
            max(abs(col("old_r") - col("old_r0"))).as("res1"),
            max(abs(col("r") - col("old_r"))).as("res2")))
      // Materialize.cut is eager, so the metrics are already published;
      // get() does not block here. On an EMPTY graph the observed
      // max(abs(...)) is null — treat it as converged (residual 0) instead
      // of an opaque cast NPE (ADVICE r15).
      def res(k: String): Long =
        Option(obs.get(k)).map(_.asInstanceOf[Long]).getOrElse(0L)
      rounds += 1
      if (res("res1") < tolFp) {
        converged = true
        // round 2k-1 converged: its ranks are the batch frame's `old_r`
        result = next.select(col("node"), col("old_r").as("r"))
      } else if (rounds >= maxRounds)
        // identical contract to the one-round loop: round `maxRounds`
        // unconverged throws — round maxRounds+1 (already computed in the
        // batch) must never rescue the run
        throw new IllegalStateException(
          s"pageRankConverged: residual still ≥ $tolFp after $maxRounds rounds " +
            "— raise maxRounds or loosen tolFp (damping bounds rounds at " +
            "~log(Scale/tol)/log(100/dampNum), independent of graph size)")
      else {
        rounds += 1
        if (res("res2") < tolFp) {
          converged = true
          result = next.select("node", "r")
        } else if (rounds >= maxRounds)
          throw new IllegalStateException(
            s"pageRankConverged: residual still ≥ $tolFp after $maxRounds rounds " +
              "— raise maxRounds or loosen tolFp (damping bounds rounds at " +
              "~log(Scale/tol)/log(100/dampNum), independent of graph size)")
        ranks = next.select("node", "r", "share", "outdeg", "n_nodes")
      }
    }
    (result.select(col("node"), col("r").as("rank_fp"),
      (col("r") / lit(Scale.toDouble)).as("rank")), rounds)
  }

  /** PERSONALIZED PageRank (Haveliwala 2002): the teleport mass lands only
    * on the SEED set instead of uniformly — rank becomes proximity to the
    * seeds, the random-walk-with-restart behind "related items" and seed
    * expansion. Same exact fixed-point integer recurrence as [[pageRank]]
    * (so the oracle unrolls it bit-for-bit), with the teleport term gated
    * by seed membership:
    * {{{
    *   r0(v)   = [v∈S] · (Scale div |S|)
    *   r'(v)   = [v∈S] · ((100−d)·Scale div (100·|S|))
    *             + d · Σ_{u→v} share(u) div 100
    * }}}
    * Seeds outside the graph carry no mass and are dropped (|S| counts
    * seeds IN the graph — otherwise the walk would silently leak teleport
    * mass). Same per-iteration scale shape as [[pageRank]].
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iterations: Int,
                           dampNum: Long = 85): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= 100)
    val e = Materialize.cut(edges)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val s = seeds.select(col("node").cast("long").as("node")).distinct()
      .join(deg.select("node"), Seq("node"), "left_semi")
    val ns = s.agg(count(lit(1)).as("n_seeds"))
    val degN = Materialize.cut(deg
      .join(s.withColumn("is_seed", lit(1L)), Seq("node"), "left")
      .na.fill(0L, Seq("is_seed"))
      .crossJoin(broadcast(ns)))
    var ranks = degN.select(col("node"),
      expr(s"is_seed * (${Scale}L div n_seeds)").as("r"),
      expr(s"(is_seed * (${Scale}L div n_seeds)) div outdeg").as("share"))
    for (_ <- 1 to iterations) {
      val contrib = contribFromShares(e, ranks.select("node", "share"))
      ranks = Materialize.cut(
        degN.join(contrib, Seq("node"), "left")
          .withColumn("r",
            expr(s"is_seed * ((${100 - dampNum} * ${Scale}L) div (100 * n_seeds))") +
              expr(s"($dampNum * coalesce(contrib, 0L)) div 100"))
          .select(col("node"), col("r"), expr("r div outdeg").as("share")))
    }
    ranks.select(col("node"), col("r").as("rank_fp"),
      (col("r") / lit(Scale.toDouble)).as("rank"))
  }

  /** DuckDB unroll of [[personalizedPageRank]] over caller-provided
    * `edges(src,dst)`, `deg(node,outdeg)`, and `seeds(node)` CTEs (seeds
    * must already be restricted to graph nodes, as the runtime does).
    */
  def pprOracleCtes(iterations: Int, dampNum: Long = 85): String = {
    val ns = "(SELECT CAST(COUNT(*) AS BIGINT) FROM seeds)"
    val r0 = s"""r0 AS MATERIALIZED (
      SELECT d.node,
             CASE WHEN s.node IS NULL THEN 0 ELSE $Scale // $ns END AS r
      FROM deg d LEFT JOIN seeds s ON d.node = s.node)"""
    val iters = (1 to iterations).map { i =>
      s"""r$i AS MATERIALIZED (
            SELECT d.node,
                   CASE WHEN s.node IS NULL THEN 0
                        ELSE (${100 - dampNum} * $Scale) // (100 * $ns) END
                   + (($dampNum * COALESCE(c.contrib, 0)) // 100) AS r
            FROM deg d
            LEFT JOIN seeds s ON d.node = s.node
            LEFT JOIN (
              SELECT e.dst AS node, SUM(sh.share) AS contrib
              FROM edges e JOIN (
                SELECT r.node, r.r // d2.outdeg AS share
                FROM r${i - 1} r JOIN deg d2 ON r.node = d2.node) sh
                ON e.src = sh.node
              GROUP BY 1) c ON d.node = c.node)"""
    }
    (r0 +: iters).mkString(",\n")
  }

  /** Connected components by min-label propagation: every node starts
    * labeled with its own id; each iteration every node takes the minimum
    * of its label and its neighbors' labels. After ≥ diameter iterations
    * the label is the component-wide minimum id. Returns (node, component).
    *
    * CONTRACT: `iterations` must be ≥ the graph diameter or the returned
    * labels are NOT components — they are a partial propagation, and
    * nothing here flags it. This fixed-round form exists for callers that
    * already know the diameter bound (tests, oracle twins); pipelines
    * should use [[connectedComponentsConverged]], which derives the round
    * count from the data and fails fast instead of under-iterating.
    * [[ccConverged]] is the a-posteriori guard for this form.
    */
  def connectedComponents(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1)
    val e = Materialize.cut(edges)
    val nodes = Materialize.cut(e.select("src").distinct())
    var labels = nodes.select(col("src").as("node"), col("src").as("label"))
    for (_ <- 1 to iterations) {
      val nbrMin = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst").as("node"))
        .agg(min("label").as("nbr_label"))
      labels = Materialize.cut(
        labels.join(nbrMin, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label")))
    }
    labels.select(col("node"), col("label").as("component"))
  }

  /** Min-label propagation TO THE FIXPOINT: same recurrence as
    * [[connectedComponents]], but the round count is derived from the data
    * — each round carries an `old_label` column through the materialized
    * state, so "did anything change" is one cheap filter+isEmpty probe on
    * a node-sized local-checkpointed frame (no extra shuffle, no edge
    * scan). Stops at the first round that changes nothing; the result is
    * therefore the true fixpoint at ANY graph diameter, and the reached
    * round count R is returned so an oracle can unroll exactly R rounds
    * (post-fixpoint rounds are idempotent, so any R' ≥ R also matches).
    *
    * `maxRounds` is a runaway backstop, not a semantic knob: hitting it
    * THROWS rather than silently emitting unconverged labels — the
    * failure mode VERDICT r11 flagged for the fixed-round form at 100×
    * scale. Diameter of real sparse graphs is O(log n); 64 rounds covers
    * any graph that isn't an adversarial path, and a caller that owns one
    * raises the backstop explicitly.
    *
    * Scale shape per round: identical to [[connectedComponents]] (one
    * edge-scan join + node-keyed min + node-sized left join) plus the
    * isEmpty probe, which reads only the already-materialized state.
    */
  def connectedComponentsConverged(edges: DataFrame,
                                   maxRounds: Int = 64): (DataFrame, Int) = {
    require(maxRounds >= 1)
    val e = Materialize.cut(edges)
    val nodes = Materialize.cut(e.select("src").distinct())
    var labels = nodes.select(col("src").as("node"), col("src").as("label"))
    var rounds = 0
    var changed = true
    while (changed) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponentsConverged: no fixpoint within $maxRounds rounds " +
            "— raise maxRounds (graph diameter exceeds the backstop)")
      val nbrMin = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst").as("node"))
        .agg(min("label").as("nbr_label"))
      // the "did anything change" probe rides the materialize action via
      // observe() (r17, §1.2 — the same zero-extra-jobs mechanism
      // pageRankConverged has used since r14): count of changed labels
      // folds into the SAME job that checkpoints the state, so the old
      // per-round filter+isEmpty driver job disappears. Detection value
      // identical (sum > 0 ⇔ the filter was non-empty; null on an empty
      // graph ⇒ 0 ⇒ fixpoint), so the recorded R is unchanged.
      val obs = new org.apache.spark.sql.Observation(s"cc-changed-$rounds")
      val next = Materialize.cut(
        labels.join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("label").as("old_label"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
          .observe(obs,
            sum(when(col("label") =!= col("old_label"), 1L).otherwise(0L))
              .as("n_changed")))
      rounds += 1
      changed = Option(obs.get("n_changed"))
        .map(_.asInstanceOf[Long]).getOrElse(0L) > 0
      labels = next.select("node", "label")
    }
    (labels.select(col("node"), col("label").as("component")), rounds)
  }

  /** Connected components by the ALTERNATING large-star / small-star
    * algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
    * and Beyond") — the O(log n)-round form of [[connectedComponentsConverged]]:
    * min-label propagation needs one round per unit of graph DIAMETER (a
    * 1000-hop chain at 100× scale is 1000 shuffle rounds), while the
    * star operations contract paths doubly-exponentially fast, so rounds
    * stay logarithmic on any geometry (GraphSpec pins a 41-node chain:
    * 40 min-label rounds vs ≤8 here, identical labels).
    *
    * Per round over the current directed (larger → smaller) edge set E:
    *   - LARGE-STAR: each center u computes m = min(Γ(u) ∪ {u}) over its
    *     full symmetric neighborhood and re-points every STRICTLY LARGER
    *     neighbor at m — {(v, m) : v ∈ Γ(u), v > u}; each undirected edge
    *     contributes exactly one output (from its smaller endpoint's
    *     view), so connectivity is preserved while long paths fold.
    *   - SMALL-STAR: each center a re-points its smaller neighbors (and
    *     itself) at m = min(N(a) ∪ {a}) over the DIRECTED smaller
    *     neighborhood — {(v, m) : v ∈ N(a) ∪ {a}, v ≠ m}.
    * Every output edge points strictly larger → smaller, so the state
    * stays canonical; the loop stops when a round leaves the edge SET
    * unchanged (count + one anti-join on the shrinking frame), at which
    * point E is a star forest: every node's parent IS its component min.
    * `maxRounds` is the same throwing backstop as the other converged
    * forms — 32 covers any graph below ~2^32 path length.
    *
    * Output: (node, component) for every endpoint of the input, component
    * = min node id in the component — bit-identical to
    * [[connectedComponentsConverged]] (spec-pinned), so the DuckDB oracle
    * can verify either form with the same round-free reachability query.
    *
    * Scale shape per round: two symmetric-neighborhood mins (map-side
    * combined, node-keyed) + two edge-frame joins, all on a frame that
    * only SHRINKS (toward one edge per non-root node); state is never
    * more than the current edge set, materialized once per round.
    */
  def connectedComponentsAlternating(edges: DataFrame,
                                     maxRounds: Int = 32): (DataFrame, Int) = {
    require(maxRounds >= 1)
    val nodes = Materialize.cut(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct())
    // canonical directed start: larger endpoint → smaller, no self loops
    var e = Materialize.cut(edges.select(
        greatest(col("src"), col("dst")).as("a"),
        least(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    var rounds = 0
    var stable = e.isEmpty
    while (!stable) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponentsAlternating: no fixpoint within $maxRounds rounds " +
            "— raise maxRounds (pathological geometry beyond the backstop)")
      // large-star over the symmetric view
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val lsMins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = sym.join(lsMins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")).distinct()
      // small-star over the directed (larger → smaller) view
      val ssMins = ls.groupBy("a").agg(min("b").as("m"))
      val ssNb = ls.join(ssMins, Seq("a"))
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
      val next = Materialize.cut(
        ssNb.union(ssMins.select(col("a"), col("m").as("b"))).distinct())
      rounds += 1
      // set equality on the canonical directed pairs: equal counts plus an
      // empty one-sided difference ⇒ identical sets (both are distinct)
      stable = next.count() == e.count() &&
        next.join(e, Seq("a", "b"), "left_anti").isEmpty
      e = next
    }
    val labels = nodes
      .join(e.select(col("a").as("node"), col("b").as("parent")), Seq("node"), "left")
      .select(col("node"), coalesce(col("parent"), col("node")).as("component"))
    (labels, rounds)
  }

  /** True when one more propagation step changes no label — i.e. the fixed
    * iteration count already reached the fixpoint.
    */
  def ccConverged(edges: DataFrame, iterations: Int): Boolean = {
    val a = connectedComponents(edges, iterations)
    val b = connectedComponents(edges, iterations + 1)
    a.join(b.withColumnRenamed("component", "component2"), "node")
      .filter(col("component") =!= col("component2"))
      .isEmpty
  }

  /** Exact TRIANGLE COUNT of an undirected simple graph, with the
    * degree-ordered orientation that makes it tractable at scale: every
    * edge orients from its lower-(degree, id) endpoint to the higher, so
    * each node's out-degree is O(√m) and the wedge join (the quadratic
    * step) is bounded by Σ outdeg² = O(m^1.5) — a plain id-ordered
    * orientation lets one low-id hub generate O(deg²) wedges. Each
    * triangle is counted exactly once (at its lowest-ordered vertex).
    *
    * Input: one row per undirected edge as (a, b) with a ≠ b (either
    * order, duplicates tolerated — normalized here). Output: one row
    * (n_nodes, n_edges, n_triangles).
    */
  def triangleCount(pairs: DataFrame, a: String = "src", b: String = "dst"): DataFrame = {
    // canonicalize BEFORE symmetrizing: an edge delivered in both
    // orientations must collapse to one undirected edge, not two
    val und = pairs.select(
      least(col(a).cast("long"), col(b).cast("long")).as("a"),
      greatest(col(a).cast("long"), col(b).cast("long")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val sym = symmetrize(und, "a", "b")
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // one comparable (deg, id) key as a STRUCT — struct ordering is
    // field-wise, so no id/degree magnitude can overflow or corrupt the
    // orientation the way a packed-long encoding silently would
    // (ADVICE r11: deg*2^32+node breaks at node ≥ 2^32 or deg ≥ 2^31)
    val keyed = deg.select(col("node"),
      struct(col("deg"), col("node")).as("okey"))
    // materialized once: the orientation join feeds four consumers
    // (edge count, both wedge sides, the closing semi join)
    val oriented = Materialize.cut(sym
      .join(keyed.select(col("node").as("src"), col("okey").as("skey")), Seq("src"))
      .join(keyed.select(col("node").as("dst"), col("okey").as("dkey")), Seq("dst"))
      .filter(col("skey") < col("dkey"))
      .select(col("src"), col("dst"), col("dkey")))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dkey") < col("e2.dkey"))
      .select(col("e1.dst").as("w_src"), col("e2.dst").as("w_dst"))
    val closed = wedges.join(
      oriented.select(col("src").as("w_src"), col("dst").as("w_dst")),
      Seq("w_src", "w_dst"), "left_semi")
    // three 1-row aggregates composed lazily — no driver actions
    keyed.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(oriented.agg(count(lit(1)).as("n_edges")))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }

  /** K-CORE of an undirected graph by iterative peeling: each round
    * removes every node whose CURRENT degree is < k (removals cascade —
    * a node can drop below k because its neighbors left). After enough
    * rounds the survivors are exactly the maximal subgraph of minimum
    * degree ≥ k — the standard dense-community / spam-farm detector.
    * Fixed `rounds` keeps the recurrence oracle-replayable;
    * [[kCoreConverged]] proves the fixpoint. Returns the surviving
    * (node, deg) — degrees WITHIN the core.
    *
    * Scale shape: each round is one degree aggregation + two semi-joins
    * of the shrinking edge set; edges [[Materialize]]d per round (same
    * recovery bound as the other iterative ops).
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = Materialize.cut(edges)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("node")
      e = Materialize.cut(
        e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi"))
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Iterative peeling TO THE FIXPOINT: same per-round shape as [[kCore]],
    * but peeling stops at the first round that removes no edge — detected
    * by one cheap count() on the just-materialized (local-checkpointed)
    * shrinking edge frame, so a cascade deeper than any fixed guess (a
    * long pendant path peels one layer per round) still fully resolves.
    * Returns (core, roundsRun); `p{roundsRun}` in [[kCoreOracleCtes]]
    * replays it exactly (the final round is a no-op on both engines, and
    * extra rounds stay no-ops — peeling is idempotent at the fixpoint).
    * Hitting `maxRounds` THROWS instead of returning a half-peeled
    * subgraph that is not a k-core.
    */
  def kCoreConvergedRun(edges: DataFrame, k: Int,
                        maxRounds: Int = 64): (DataFrame, Int) = {
    require(k >= 1 && maxRounds >= 1)
    var e = Materialize.cut(edges)
    var prev = e.count()
    var rounds = 0
    var changed = true
    while (changed) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"kCoreConvergedRun: peeling not stable within $maxRounds rounds " +
            "— raise maxRounds (cascade depth exceeds the backstop)")
      val keep = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("node")
      // surviving-edge count rides the materialize action via observe()
      // (r17, §1.2): no per-round count() job — identical value, same R
      val obs = new org.apache.spark.sql.Observation(s"kcore-n-$rounds")
      e = Materialize.cut(
        e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
          .observe(obs, count(lit(1)).as("n_edges")))
      rounds += 1
      val cur = Option(obs.get("n_edges"))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      changed = cur != prev
      prev = cur
    }
    (e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")), rounds)
  }

  /** True when one more peeling round removes nothing. */
  def kCoreConverged(edges: DataFrame, k: Int, rounds: Int): Boolean = {
    val a = kCore(edges, k, rounds).agg(count(lit(1)), sum("deg")).head()
    val b = kCore(edges, k, rounds + 1).agg(count(lit(1)), sum("deg")).head()
    a == b
  }

  /** Peeling oracle fragment: unrolled `p0 .. p{rounds}` over a
    * caller-provided `edges(src,dst)` CTE; the served result reads
    * `p{rounds}`.
    */
  def kCoreOracleCtes(k: Int, rounds: Int): String = {
    val p0 = "p0 AS MATERIALIZED (SELECT src, dst FROM edges)"
    val iters = (1 to rounds).map { i =>
      s"""k$i AS (SELECT src AS node FROM p${i - 1}
                  GROUP BY 1 HAVING COUNT(*) >= $k),
         p$i AS MATERIALIZED (
           SELECT e.src, e.dst FROM p${i - 1} e
           JOIN k$i a ON e.src = a.node
           JOIN k$i b ON e.dst = b.node)"""
    }
    (p0 +: iters).mkString(",\n")
  }

  /** Multi-source BFS: unweighted shortest-path distance from the nearest
    * seed, by frontier expansion — round d joins ONLY the frontier (nodes
    * first reached at d−1) against the edge table and anti-joins the
    * already-reached set, so total work is O(Σ frontier-adjacent edges),
    * never |V|·rounds. Returns (node, dist) for every node within
    * `maxDepth` hops of a seed; unreached nodes are absent (the caller
    * left-joins if it wants ∞ rows). Seeds outside the graph still report
    * dist 0 — they are valid single-node reachable sets.
    *
    * Fixed `maxDepth` keeps the recurrence oracle-replayable
    * ([[bfsOracleCtes]]); [[bfsConverged]] proves a fixpoint when the
    * caller wants full-reachability semantics. Directed as given —
    * [[symmetrize]] first for undirected graphs.
    *
    * Scale shape per round: one frontier-sized equi-join on `src` (the
    * 100 TB edge table's join key — bucketing edges by src co-locates every
    * round), one distinct, one anti-join against the node-sized reached
    * set; state [[Materialize.cut]] so lineage stays flat and executor
    * loss replays one round. No driver actions — empty late rounds cost
    * empty joins, not a per-round count.
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0)
    val e = Materialize.cut(edges)
    var reached = Materialize.cut(
      seeds.select(col("node").cast("long").as("node")).distinct()
        .withColumn("dist", lit(0)))
    var frontier = reached.select("node")
    for (d <- 1 to maxDepth) {
      val nbrs = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
      val fresh = nbrs.join(reached, Seq("node"), "left_anti")
        .withColumn("dist", lit(d))
      // ONE materialization per round: the next frontier re-derives from
      // the cut union by a narrow dist filter instead of its own cut
      reached = Materialize.cut(reached.unionByName(fresh))
      frontier = reached.filter(col("dist") === d).select("node")
    }
    reached
  }

  /** Frontier expansion until the frontier EMPTIES — full-reachability
    * BFS at any graph eccentricity, no depth guess. Same per-round shape
    * as [[bfsDistances]]; the stop probe is one filter+isEmpty on the
    * just-materialized node-sized reached set (the frontier is a narrow
    * filter of it — no extra shuffle, no edge scan). Returns
    * (reached, roundsRun), where the LAST round is the first that added
    * nothing — `b{roundsRun}` in [[bfsOracleCtes]] replays it exactly
    * (that final round is a no-op union on both engines). Hitting
    * `maxRounds` THROWS instead of returning distances that silently
    * stop short of the reachable set.
    */
  def bfsDistancesConverged(edges: DataFrame, seeds: DataFrame,
                            maxRounds: Int = 64): (DataFrame, Int) = {
    require(maxRounds >= 1)
    val e = Materialize.cut(edges)
    var reached = Materialize.cut(
      seeds.select(col("node").cast("long").as("node")).distinct()
        .withColumn("dist", lit(0)))
    var frontier = reached.select("node")
    var rounds = 0
    while (!frontier.isEmpty) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"bfsDistancesConverged: frontier alive after $maxRounds rounds " +
            "— raise maxRounds (graph eccentricity exceeds the backstop)")
      val nbrs = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
      val fresh = nbrs.join(reached, Seq("node"), "left_anti")
        .withColumn("dist", lit(rounds + 1))
      reached = Materialize.cut(reached.unionByName(fresh))
      rounds += 1
      frontier = reached.filter(col("dist") === rounds).select("node")
    }
    (reached, rounds)
  }

  /** True when one more BFS round reaches nothing new — i.e. `maxDepth`
    * already covers the seeds' full reachable set.
    */
  def bfsConverged(edges: DataFrame, seeds: DataFrame, maxDepth: Int): Boolean =
    bfsDistances(edges, seeds, maxDepth + 1)
      .filter(col("dist") === maxDepth + 1).isEmpty

  /** PER-SEED BFS to convergence — [[bfsDistancesConverged]] with the seed
    * identity kept in the state, the primitive behind sampled-pivot
    * centrality (Eppstein & Wang 2001): K pivots' full distance vectors in
    * ONE frontier loop, state keyed (seed, node) so the K searches share
    * every edge scan instead of running K jobs. Returns ((seed, node,
    * dist) for every reached pair, roundsRun) — rounds stop once a probe
    * finds no seed's frontier grew, so the recorded R is the max pivot
    * eccentricity rounded up to the probe cadence (trailing rounds are
    * no-ops) and the oracle's unroll replays every seed — and the no-op
    * tail — exactly.
    *
    * Scale shape per round: one frontier-sized equi-join on `src` (the
    * only edge-table touch), one distinct and one anti-join keyed
    * (seed, node) — state is ≤ K·|V| rows, the knob being K = O(log n/ε²)
    * for ±ε·diameter centrality error at ANY graph size. Hitting
    * `maxRounds` THROWS rather than emitting truncated distance sums
    * (a silently-short sum_dist would BIAS every estimate upward).
    */
  def bfsPerSeedConverged(edges: DataFrame, seeds: DataFrame,
                          maxRounds: Int = 64,
                          probeEvery: Int = 4): (DataFrame, Int) = {
    require(maxRounds >= 1 && probeEvery >= 1)
    val e = Materialize.cut(edges)
    var reached = Materialize.cut(
      seeds.select(col("node").cast("long").as("node")).distinct()
        .select(col("node").as("seed"), col("node"), lit(0).as("dist")))
    var frontier = reached.select("seed", "node")
    var rounds = 0
    // probe cadence: see [[ssspConverged]] (VERDICT r13 #6)
    var done = frontier.isEmpty
    while (!done) {
      val nbrs = e.join(frontier, e("src") === frontier("node"))
        .select(col("seed"), col("dst").as("node")).distinct()
      val fresh = nbrs.join(reached, Seq("seed", "node"), "left_anti")
        .withColumn("dist", lit(rounds + 1))
      reached = Materialize.cut(reached.unionByName(fresh))
      rounds += 1
      frontier = reached.filter(col("dist") === rounds).select("seed", "node")
      if (rounds % probeEvery == 0 || rounds >= maxRounds) {
        done = frontier.isEmpty
        if (!done && rounds >= maxRounds)
          throw new IllegalStateException(
            s"bfsPerSeedConverged: frontier alive after $maxRounds rounds " +
              "— raise maxRounds (pivot eccentricity exceeds the backstop)")
      }
    }
    (reached, rounds)
  }

  /** DuckDB unroll of [[bfsPerSeedConverged]]: `b0 .. b{maxDepth}` over
    * caller-provided `edges(src,dst)` and `seeds(node)` CTEs, state keyed
    * (seed, node); the served result reads `b{maxDepth}`.
    */
  def bfsPerSeedOracleCtes(maxDepth: Int): String = {
    val b0 =
      "b0 AS MATERIALIZED (SELECT DISTINCT node AS seed, node, 0 AS dist FROM seeds)"
    val iters = (1 to maxDepth).map { d =>
      s"""b$d AS MATERIALIZED (
            SELECT seed, node, dist FROM b${d - 1}
            UNION ALL
            SELECT f.seed, f.node, $d AS dist FROM (
              SELECT DISTINCT p.seed, e.dst AS node FROM edges e
              JOIN b${d - 1} p ON e.src = p.node AND p.dist = ${d - 1}) f
            WHERE NOT EXISTS (SELECT 1 FROM b${d - 1} r
                              WHERE r.seed = f.seed AND r.node = f.node))"""
    }
    (b0 +: iters).mkString(",\n")
  }

  /** Sampled-pivot CLOSENESS estimates from [[bfsPerSeedConverged]]'s
    * output: per node, the pivots reaching it, their exact BIGINT distance
    * sum, and ĉ(v) = (n−1)·K_v / (n·S_v) — the Eppstein-Wang estimator
    * with Σ_u d(v,u) ≈ (n/K_v)·S_v, exact integers until the single final
    * double division. Nodes no pivot reaches at positive distance are
    * absent (S_v = 0 has no finite closeness).
    */
  def pivotCloseness(perSeedDists: DataFrame, nNodes: DataFrame): DataFrame =
    perSeedDists.groupBy(col("node"))
      .agg(count(lit(1)).as("n_reached"), sum(col("dist").cast("long")).as("sum_dist"))
      .filter(col("sum_dist") > 0)
      .crossJoin(broadcast(nNodes))
      .select(col("node"), col("n_reached"), col("sum_dist"),
        (((col("n") - 1) * col("n_reached")).cast("double") /
          (col("n") * col("sum_dist")).cast("double")).as("closeness"))

  /** DuckDB unroll of [[bfsDistances]]: `b0 .. b{maxDepth}` over
    * caller-provided `edges(src,dst)` and `seeds(node)` CTEs; the served
    * result reads `b{maxDepth}`. Each b_d carries every node reached
    * within d hops exactly once, at its minimum distance.
    */
  def bfsOracleCtes(maxDepth: Int): String = {
    val b0 = "b0 AS MATERIALIZED (SELECT DISTINCT node, 0 AS dist FROM seeds)"
    val iters = (1 to maxDepth).map { d =>
      s"""b$d AS MATERIALIZED (
            SELECT node, dist FROM b${d - 1}
            UNION ALL
            SELECT f.node, $d AS dist FROM (
              SELECT DISTINCT e.dst AS node FROM edges e
              JOIN b${d - 1} p ON e.src = p.node AND p.dist = ${d - 1}) f
            WHERE NOT EXISTS (SELECT 1 FROM b${d - 1} r WHERE r.node = f.node))"""
    }
    (b0 +: iters).mkString(",\n")
  }

  /** K-TRUSS decomposition to convergence — EDGE-centric peeling (Cohen
    * 2008), a different algorithm class from [[kCore]]'s node peeling:
    * every surviving edge must close ≥ k−2 triangles WITHIN the surviving
    * set, so rounds alternate triangle-support counting and edge removal
    * until stable (removals cascade — losing one edge can starve
    * another's support). The truss is the community backbone degree-based
    * cores can't isolate: a hub with many non-mutual neighbors survives
    * k-core but carries no triangles.
    *
    * Input: canonical UNDIRECTED pairs (x < y, distinct). Per round: one
    * wedge join (edge ⋈ adjacency ⋈ adjacency — O(Σ_e deg) candidate
    * wedges, the m^1.5-bounded shape of [[triangleCount]]), one map-side-
    * combined count keyed on the edge, one filter. Zero-support edges
    * leave via the inner join itself (support 0 < k−2 for every k ≥ 3,
    * the identical rule on both engines). State is edge-sized and
    * [[Materialize.cut] per round; the stop probe is one count. Returns
    * ((x, y, support) of the stable truss, roundsRun) — the LAST round is
    * the first that removed nothing, so the reported support values are
    * the stable ones; hitting `maxRounds` THROWS rather than emitting a
    * half-peeled edge set.
    */
  def kTrussConverged(pairs: DataFrame, k: Int,
                      maxRounds: Int = 32): (DataFrame, Int) = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    var e = Materialize.cut(
      pairs.select(col("x").cast("long").as("x"), col("y").cast("long").as("y"))
        .filter(col("x") < col("y")).distinct())
    var n = e.count()
    var rounds = 0
    var stable = false
    var supported: DataFrame = null
    while (!stable) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"kTrussConverged: still peeling after $maxRounds rounds " +
            "— raise maxRounds (cascade depth exceeds the backstop)")
      val sym = e.select(col("x").as("u"), col("y").as("v"))
        .unionByName(e.select(col("y").as("u"), col("x").as("v")))
      val sup = e
        .join(sym.as("s1"), col("x") === col("s1.u"))
        .join(sym.as("s2"),
          col("y") === col("s2.u") && col("s1.v") === col("s2.v"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("support"))
      // surviving-edge count rides the materialize action via observe()
      // (r17, §1.2): no per-round count() job — identical value, same R
      val obs = new org.apache.spark.sql.Observation(s"ktruss-n-$rounds")
      supported = Materialize.cut(sup.filter(col("support") >= k - 2)
        .observe(obs, count(lit(1)).as("n_edges")))
      val m = Option(obs.get("n_edges"))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      rounds += 1
      if (m == n) stable = true
      n = m
      e = supported.select("x", "y")
    }
    (supported, rounds)
  }

  /** DuckDB unroll of [[kTrussConverged]]: `t0 .. t{rounds}` plus
    * `sup1 .. sup{rounds}` over a caller-provided `t0(x, y)` canonical-
    * pair CTE; the served result reads `sup{rounds}` (support ≥ k−2 —
    * the stable frame, since round `rounds` removed nothing).
    */
  def kTrussOracleCtes(k: Int, rounds: Int): String = {
    val iters = (1 to rounds).map { r =>
      s"""sym$r AS (SELECT x AS u, y AS v FROM t${r - 1}
                    UNION ALL SELECT y, x FROM t${r - 1}),
          sup$r AS MATERIALIZED (
            SELECT e.x, e.y, CAST(COUNT(*) AS BIGINT) AS support
            FROM t${r - 1} e
            JOIN sym$r s1 ON s1.u = e.x
            JOIN sym$r s2 ON s2.u = e.y AND s2.v = s1.v
            GROUP BY 1, 2
            HAVING COUNT(*) >= ${k - 2}),
          t$r AS (SELECT x, y FROM sup$r)"""
    }
    iters.mkString(",\n")
  }

  /** Weighted single-source shortest paths — frontier-driven Bellman-Ford
    * in the MIN-PLUS semiring ([[bfsDistancesConverged]]'s weighted
    * generalization, a different algorithm class: BFS counts hops, this
    * minimizes summed non-negative integer edge weights, so the best path
    * can be LONGER in hops than the direct edge). Each round relaxes only
    * edges out of nodes whose distance IMPROVED last round (SPFA-style);
    * the run stops when a round improves nothing — and that is a true
    * global fixpoint: a node not improved at round r had all its outgoing
    * relaxations applied with its final distance when it last improved,
    * so the frontier run is round-for-round EQUAL to full Bellman-Ford
    * relaxation (the oracle unrolls the full form — GraphSpec pins the
    * equality on a graph where the cheap path is hop-longer).
    *
    * Scale shape per round: one edge⋈frontier join (frontier shrinks as
    * distances settle), a map-side-combined `min` keyed on the
    * destination, and a node-keyed full merge; all intermediates are
    * node-sized, distances are exact BIGINT sums (no float order), and
    * per-round state is [[Materialize.cut]] so lineage stays flat. Rounds
    * are bounded by the weighted-path hop diameter; hitting `maxRounds`
    * THROWS instead of returning distances that silently stop short.
    * Returns (dist over the seeds' reachable component, roundsRun) — the
    * trailing rounds (at most the probe cadence) improve nothing, and the
    * oracle's d{roundsRun} replays them as no-op merges.
    */
  def ssspConverged(edges: DataFrame, seeds: DataFrame,
                    maxRounds: Int = 64,
                    probeEvery: Int = 4): (DataFrame, Int) = {
    require(maxRounds >= 1 && probeEvery >= 1)
    val e = Materialize.cut(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w")))
    var dist = Materialize.cut(
      seeds.select(col("node").cast("long").as("node")).distinct()
        .withColumn("dist", lit(0L)))
    var frontier = dist
    var rounds = 0
    // emptiness probed every `probeEvery` rounds (VERDICT r13 #6): skipped
    // probes trade ≤ probeEvery−1 no-op rounds (empty-frontier relaxations —
    // the joins see an empty side) for 4× fewer probe jobs; the recorded R
    // counts executed rounds, so the oracle's unroll replays the no-ops too.
    var done = frontier.isEmpty
    while (!done) {
      val cand = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("d"))
        .groupBy("node").agg(min("d").as("d"))
      val merged = Materialize.cut(
        dist.join(cand, Seq("node"), "full")
          .select(col("node"),
            least(coalesce(col("dist"), lit(Long.MaxValue)),
              coalesce(col("d"), lit(Long.MaxValue))).as("best"),
            (col("d").isNotNull &&
              (col("dist").isNull || col("d") < col("dist"))).as("improved")))
      rounds += 1
      frontier = merged.filter(col("improved"))
        .select(col("node"), col("best").as("dist"))
      dist = merged.select(col("node"), col("best").as("dist"))
      if (rounds % probeEvery == 0 || rounds >= maxRounds) {
        done = frontier.isEmpty
        if (!done && rounds >= maxRounds)
          throw new IllegalStateException(
            s"ssspConverged: distances still improving after $maxRounds rounds " +
              "— raise maxRounds (weighted hop diameter exceeds the backstop)")
      }
    }
    (dist, rounds)
  }

  /** DuckDB unroll of [[ssspConverged]] as FULL Bellman-Ford relaxation
    * (round-for-round equal to the frontier run — see the operator's
    * scaladoc): `d0 .. d{rounds}` over caller-provided `edges(src,dst,w)`
    * and `seeds(node)` CTEs; the served result reads `d{rounds}`.
    */
  def ssspOracleCtes(rounds: Int): String = {
    val d0 =
      "d0 AS MATERIALIZED (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM seeds)"
    val iters = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (
            SELECT node, MIN(dist) AS dist FROM (
              SELECT node, dist FROM d${r - 1}
              UNION ALL
              SELECT e.dst AS node, p.dist + e.w AS dist
              FROM edges e JOIN d${r - 1} p ON e.src = p.node) z
            GROUP BY node)"""
    }
    (d0 +: iters).mkString(",\n")
  }

  /** Synchronous LABEL PROPAGATION communities (Raghavan et al. 2007), the
    * modularity-flavored sibling of [[connectedComponents]]: each round,
    * every node adopts the label carried by the PLURALITY of its
    * neighbors — count ties break to the smallest label, so the update is
    * a pure function of the previous labeling and the run is deterministic
    * under any partitioning (the async/random-order variants of LPA are
    * not, which is why this is the sync form). Fixed `iterations` on both
    * engines: sync LPA can oscillate on bipartite structure rather than
    * converge, so the CONTRACT is the fixed round count, not a fixpoint —
    * the oracle unrolls the same rounds ([[lpaOracleCtes]]) and must
    * hash-match the full labeling.
    *
    * Scale shape per round: one exchange keyed on the destination node for
    * the (node, label) counts (map-side combined), a second node-keyed
    * aggregation for the plurality argmax — expressed as `max(struct(count,
    * -label))` so it rides a plain partial-merged aggregate, no per-node
    * window — then a left join back to carry isolated nodes unchanged.
    * Labels and intermediates are node-count-sized; per-round state is
    * [[Materialize.cut]] so lineage stays flat and executor loss replays
    * one round, not the whole history.
    */
  def labelPropagation(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1)
    val e = Materialize.cut(edges)
    val nodes = Materialize.cut(e.select("src").distinct())
    var labels = nodes.select(col("src").as("node"), col("src").as("label"))
    for (_ <- 1 to iterations) {
      val counts = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = counts
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("new_label"))
      labels = Materialize.cut(
        labels.join(best, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("new_label"), col("label")).as("label")))
    }
    labels.select(col("node"), col("label").as("community"))
  }

  /** Synchronous LPA run until the DYNAMICS STOP PRODUCING NEW STATES:
    * stops at the first round r with l_r = l_{r-1} (fixpoint) or
    * l_r = l_{r-2} (the period-2 oscillation sync LPA is known to enter
    * on bipartite structure — Raghavan et al. 2007 §3; once entered, the
    * labeling alternates between two states forever, so r is the first
    * round after which no new labeling can appear). Both probes are
    * node-sized reads of already-materialized state: the fixpoint check
    * is a filter+isEmpty on the carried `old_label` column, the cycle
    * check one node-keyed join run only on rounds that DID change.
    *
    * The stopping round R is a deterministic function of the data, so
    * the returned (labels, R) is exactly replayable: [[lpaOracleCtes]]
    * unrolled R rounds reproduces the labeling bit-for-bit. Hitting
    * `maxRounds` THROWS — with the period-2 guard this needs dynamics of
    * period ≥ 3, which sync plurality-LPA does not exhibit in practice;
    * the backstop is a runaway bound, not a tuning knob.
    */
  def labelPropagationConverged(edges: DataFrame,
                                maxRounds: Int = 64): (DataFrame, Int) = {
    require(maxRounds >= 1)
    val e = Materialize.cut(edges)
    val nodes = Materialize.cut(e.select("src").distinct())
    var labels = nodes.select(col("src").as("node"), col("src").as("label"))
    var prev2: DataFrame = null // l_{r-2} while computing l_r
    var rounds = 0
    var done = false
    while (!done) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"labelPropagationConverged: no fixpoint or 2-cycle within $maxRounds rounds")
      val counts = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = counts
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("new_label"))
      // fixpoint probe rides the materialize action via observe() (r17,
      // §1.2 — see connectedComponentsConverged): same detection value,
      // same R, one fewer driver job per round. The period-2 cycle check
      // below stays its own node-sized job — it only runs on rounds that
      // DID change, and it compares against prev2, which is not part of
      // this materialization.
      val obs = new org.apache.spark.sql.Observation(s"lpa-changed-$rounds")
      val next = Materialize.cut(
        labels.join(best, Seq("node"), "left")
          .select(col("node"), col("label").as("old_label"),
            coalesce(col("new_label"), col("label")).as("label"))
          .observe(obs,
            sum(when(col("label") =!= col("old_label"), 1L).otherwise(0L))
              .as("n_changed")))
      rounds += 1
      if (Option(obs.get("n_changed"))
            .map(_.asInstanceOf[Long]).getOrElse(0L) == 0L) done = true
      else if (prev2 != null &&
        next.select("node", "label")
          .join(prev2.withColumnRenamed("label", "label2"), "node")
          .filter(col("label") =!= col("label2")).isEmpty) done = true
      prev2 = labels.select("node", "label")
      labels = next.select("node", "label")
    }
    (labels.select(col("node"), col("label").as("community")), rounds)
  }

  /** DuckDB unroll of [[labelPropagation]] — plurality via a count-desc,
    * label-asc ROW_NUMBER (the window formulation the runtime deliberately
    * avoids; here it IS the spec).
    */
  def lpaOracleCtes(iterations: Int): String = {
    val l0 = "p0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges)"
    val iters = (1 to iterations).map { i =>
      s"""p$i AS MATERIALIZED (
            SELECT l.node, COALESCE(m.new_label, l.label) AS label
            FROM p${i - 1} l LEFT JOIN (
              SELECT node, label AS new_label FROM (
                SELECT e.dst AS node, p.label,
                       ROW_NUMBER() OVER (PARTITION BY e.dst
                         ORDER BY COUNT(*) DESC, p.label) AS rn
                FROM edges e JOIN p${i - 1} p ON e.src = p.node
                GROUP BY e.dst, p.label) z
              WHERE rn = 1) m ON l.node = m.node)"""
    }
    (l0 +: iters).mkString(",\n")
  }

  def ccOracleCtes(iterations: Int): String = {
    val l0 = "l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges)"
    val iters = (1 to iterations).map { i =>
      s"""l$i AS MATERIALIZED (
            SELECT l.node,
                   LEAST(l.label, COALESCE(m.nbr_label, l.label)) AS label
            FROM l${i - 1} l LEFT JOIN (
              SELECT e.dst AS node, MIN(p.label) AS nbr_label
              FROM edges e JOIN l${i - 1} p ON e.src = p.node
              GROUP BY 1) m ON l.node = m.node)"""
    }
    (l0 +: iters).mkString(",\n")
  }
}
