package graft

import org.apache.spark.sql.DataFrame

/** Per-round benchmark main (driver contract — prints ONE JSON line on stdout).
  *
  * Harness rules (fixes the r1/r2 measurement bugs):
  *   - queries run in DECLARED registration order, not Map iteration order;
  *   - one unmeasured warm-up pass absorbs JVM/codegen/parquet-footer warm-up
  *     so the first measured query isn't charged for it;
  *   - each query is measured `SPARK_GRAFT_REPS` times (default 3) and
  *     reported as the MEDIAN in `queries` plus the MIN in `queries_min`
  *     (VERDICT r13 #1: on a contended box the min is the closest thing to
  *     the uncontended truth, and the min↔median gap sizes the contention);
  *     temp workspaces are purged between reps so store-building defs
  *     never accumulate state across reps;
  *   - `delta_vs_prev` carries each def's median ratio vs the previous
  *     committed artifact (read from SPARK_GRAFT_BENCH_PREV, default the
  *     bench-out path before this run overwrites it), with
  *     `delta_median_vs_prev` (uniform box drift) and `n_delta_over_2x`
  *     (the all-reps-slow alarm) as tail-safe summaries;
  *   - execution is a noop-format write, which runs the FULL physical plan —
  *     `.count()` would let Catalyst eliminate top-level sorts and prune every
  *     column, leaving ORDER BY and projection cost unmeasured;
  *   - a query that throws is reported in a "failed" list and EXCLUDED from
  *     the per-query map and the total, so a crashed run can't masquerade as
  *     a fast one (ADVICE r2);
  *   - the metric JSON is the only stdout line (Spark logs go to stderr).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_REPS (measured
  * repetitions), SPARK_GRAFT_ONLY (comma-separated query-name filter, for
  * local iteration on a subset).
  *
  * READING AN ARTIFACT FROM A CONTENDED BOX (the driver shares its machine;
  * VERDICT r12 #8's playbook, so box noise never has to be re-litigated):
  *   1. Divide totals by `calib_sec` before comparing across artifacts —
  *      it is a pure single-thread JVM spin, so uniform box-speed drift
  *      scales it exactly as it scales every query (r12: driver and
  *      builder artifacts agreed within 1.3% after division, with raw
  *      totals 16% apart).
  *   2. A def whose `spread` EXCEEDS its median is contention, not plan:
  *      its raw rep times are in `noisy_reps` — the bimodal shape (two
  *      fast reps + one outlier) is scheduler/GC interference; a real plan
  *      regression moves every rep together.
  *   3. Known-sensitive def classes, in noise order: stateful/session ops
  *      (e05 session_window: state-store + GC sensitivity — r12 spread
  *      5.0 on a 4.75 median on the driver vs 0.42/0.93 on the builder,
  *      identical code), many-small-job iterative graph loops (g01–g09:
  *      dozens of sub-second jobs magnify per-job scheduling jitter),
  *      first-in-registration-order defs (inherit any residual warm-up).
  *   4. Cross-box comparisons are only valid on calib-normalized numbers
  *      of the SAME def set (`n_queries` guards the denominator).
  */
object Bench {

  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Single-thread deterministic spin score (VERDICT r11 #7): ~0.2 s of
    * pure JVM arithmetic (the PolyHash fold — JIT-warmed, no allocation,
    * no Spark), reported as `calib_sec` in the artifact. Uniform box-speed
    * drift (r10 1.2×, r11 1.17×) scales this number the same way it scales
    * every query, so a reader separates box drift from real regressions by
    * dividing — no cross-artifact archaeology.
    */
  private def calibrate(): Double = {
    val s = org.apache.spark.unsafe.types.UTF8String
      .fromString("graft-box-calibration-probe-0123456789abcdef")
    def pass(): Long = {
      var i = 0; var acc = 0L
      while (i < 3000000) {
        acc ^= graft.functions.PolyHashFns.polyHash(s, 9007199254740881L) + i
        i += 1
      }
      acc
    }
    pass() // JIT warm-up, unmeasured
    median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); pass(); (System.nanoTime() - t0) / 1e9
    })
  }

  /** The previous artifact's per-def medians, for `delta_vs_prev` (VERDICT
    * r13 #1): cross-round regressions must be visible IN the artifact, not
    * reconstructed by diffing rounds by hand — r13 carried a 68× outlier
    * (t24) that no within-run rule could flag because all its reps were
    * slow. Parsed with a two-line extractor (our own format, flat map);
    * any parse failure degrades to an empty map, never a crashed bench.
    */
  private def prevMedians(path: String): Map[String, Double] = try {
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val i = txt.indexOf("\"queries\":{")
    if (i < 0) Map.empty
    else "\"([^\"]+)\":([0-9.eE+\\-]+)".r
      .findAllMatchIn(txt.substring(i + 11, txt.indexOf('}', i)))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  } catch { case _: Throwable => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_last.json")
    // read BEFORE this run overwrites it: the driver benches once per round
    // from the committed tree, so the default prev IS the last committed
    // artifact; local iteration can pin SPARK_GRAFT_BENCH_PREV at a tag.
    val prev = prevMedians(sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", benchOut))
    val spark = GraftSession.getOrCreate()

    val defs = SparkEntry.defs.filter(d => only.forall(_.contains(d.name)))
    // warm-up: one full unmeasured pass in declared order.
    defs.foreach { d =>
      try exec(d.run(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench warmup] ${d.name}: ${e.getMessage}") }
    }
    val results: Seq[(String, Option[(Double, Double, Seq[Double])])] = defs.map { d =>
      val times = (1 to reps).flatMap { _ =>
        // drop any persisted cut-points a previous run registered, so each
        // measurement pays its query's full cost (warm JVM, cold data);
        // purge temp workspaces so a store-building def's rep N+1 never
        // inherits rep N's on-disk state (VERDICT r13 #9 — t38's reps grew
        // 11→45→93 s under load; growth must be box noise, never carryover)
        spark.catalog.clearCache()
        TempDirs.purgeAll()
        val t0 = System.nanoTime()
        try { exec(d.run(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${d.name}: ${e.getMessage}")
            None
        }
      }
      // median AND spread (max-min over the reps): the spread separates a
      // real plan regression from the documented ±30% box noise when
      // reading round-over-round deltas (VERDICT r7 #2)
      d.name -> (if (times.size == reps)
        Some((median(times), times.max - times.min, times.toSeq)) else None)
    }
    // Raw rep times for any def whose spread exceeds its median (VERDICT
    // r12 #2): a bimodal def (one 5 s rep against two 0.5 s reps — the
    // e05-under-contention shape) is self-explaining in the artifact
    // instead of needing a builder-box re-run to adjudicate. First in the
    // line = first truncated by the driver's stdout tail; the full line
    // always lands in bench_last.json.
    val noisy = results.collect {
      case (k, Some((m, s, ts))) if s > m =>
        "\"" + k + "\":" + ts.map(t => f"$t%.2f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val spreads = results.collect { case (k, Some((_, s, _))) => "\"" + k + "\":" + f"$s%.2f" }
      .mkString("{", ",", "}")
    val mins = results.collect { case (k, Some((_, _, ts))) => "\"" + k + "\":" + f"${ts.min}%.2f" }
      .mkString("{", ",", "}")
    val qs = results.collect { case (k, Some((v, _, _))) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2.map(_._1)).sum
    // cross-round regression signal (VERDICT r13 #1): per-def median ratio
    // vs the previous committed artifact, the summary ratio-median (box
    // drift moves it uniformly; a plan regression moves one def), and the
    // count of defs over 2× (the t24-shape alarm: all-reps-slow with no
    // within-run spread evidence)
    val deltas = results.collect {
      case (k, Some((m, _, _))) if prev.get(k).exists(_ > 0) => k -> (m / prev(k))
    }
    val deltaMap = deltas.map { case (k, r) => "\"" + k + "\":" + f"$r%.2f" }
      .mkString("{", ",", "}")
    val deltaMedian = if (deltas.isEmpty) 0.0 else median(deltas.map(_._2))
    val deltaOver2x = deltas.count(_._2 > 2.0)
    // Key order matters operationally: the driver archives only the LAST 2 kB
    // of stdout, and with 70+ queries the line exceeds that — so the headline
    // metric/value/unit go LAST to survive the tail truncation (every
    // BENCH_r{1..4}.json lost them at the front of the line); per-def spreads
    // are the most expendable and go first (the full line always lands in
    // bench_last.json regardless).
    val nQueries = results.count(_._2.isDefined)
    val calib = calibrate() // after the measured runs: a fully warmed JVM
    val line =
      f"""{"noisy_reps":$noisy,"delta_vs_prev":$deltaMap,"spread":$spreads,"queries_min":$mins,"queries":$qs,"failed":$failed,"sf":"$sfDir","n_queries":$nQueries,"delta_median_vs_prev":$deltaMedian%.2f,"n_delta_over_2x":$deltaOver2x,"calib_sec":$calib%.3f,"metric":"total","value":$total%.2f,"unit":"sec"}"""
    println(line)
    // Full, untruncated copy for the repo (the stdout tail is lossy). The
    // path is anchored (env-overridable), not CWD-relative — a run launched
    // outside the repo root must not strand the archived copy elsewhere.
    try {
      val w = new java.io.PrintWriter(benchOut)
      try w.println(line) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] $benchOut: ${e.getMessage}") }
    spark.stop()
  }
}
