package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine: a Spark (DataFrame-API) program plus, when
  * the semantics are ANSI-SQL-expressible, an equivalent DuckDB SQL oracle the
  * driver runs on the same parquet tables for the correctness gate.
  *
  * Determinism rules every QueryDef must follow (so oracle hashes match):
  *   - every output column aliased identically in Spark and SQL;
  *   - explicit ORDER BY on a deterministic, duplicate-free key set;
  *   - no raw float aggregation: sums go through DECIMAL (exact, order
  *     independent) and are cast back to DOUBLE — see [[graft.functions.Det]].
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** queries included in the per-round benchmark headline set */
    headline: Boolean = false,
    /** Late-bound oracle, resolved only when READ. [[graft.Verify]] runs
      * every query before it dumps `oracle_sql.json`, so a def whose
      * iteration count is data-derived (the run-to-convergence graph ops)
      * can record the reached round count R during its run and have the
      * oracle unroll exactly R rounds. Wins over `oracle` when set.
      */
    oracleGen: Option[() => String] = None,
    /** Whether the late-bound oracle is backed by a real run (ADVICE r12
      * #3): a [[oracleGen]] that closes over a [[RoundCounter]] still
      * seeded with its fallback would unroll the WRONG round count at any
      * scale where the data-derived R differs — the dump path must emit
      * no oracle for it (→ the driver's weaker rows-only check) rather
      * than a falsely-failing one. Defaults to true for static oracles.
      */
    oracleReady: () => Boolean = () => true) {

  /** The oracle SQL as the driver should see it right now. */
  def oracleText: Option[String] = oracleGen.map(_()).orElse(oracle)
}

/** Data-derived iteration count for adaptive defs: the run records the
  * reached round count; the late-bound oracle unrolls it. Tracks whether
  * any run actually set it, so a dump path can refuse to emit an oracle
  * unrolled from the seeded fallback (ADVICE r12 #3).
  */
final class RoundCounter(fallback: Int) {
  private val v = new java.util.concurrent.atomic.AtomicInteger(fallback)
  @volatile private var wasSet = false
  def set(r: Int): Unit = { v.set(r); wasSet = true }
  def get: Int = v.get
  /** True iff a run (not the seed) produced the current value. */
  def ran: Boolean = wasSet
}
