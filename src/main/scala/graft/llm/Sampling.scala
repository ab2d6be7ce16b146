package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data pipelines.
  *
  * Everything here keys decisions off a cryptographic-hash prefix of the
  * row's id plus a salt — NOT `DataFrame.sample` (partition-layout-dependent:
  * the same row can flip in/out of the sample when the input repartitions)
  * and NOT `rand()` (non-reproducible). A row's fate is a pure function of
  * (id, salt), so samples are stable across runs, cluster sizes, and
  * engines — which is what makes them oracle-checkable in DuckDB and, in
  * production, what makes a train/test split immune to pipeline re-runs.
  *
  * The decision predicate compares the first four hex chars of
  * `md5(id || ':' || salt)` against a threshold: 65536 equal-probability
  * buckets, rate = threshold/65536 — fine enough that per-mille rates
  * (0.001 → 66 buckets) don't quantize to zero (ADVICE r3). All narrow
  * maps — sampling 100 TB shuffles nothing.
  */
object Sampling {

  /** Four-hex-char md5 bucket of an id column (65536 uniform buckets). */
  def hashBucket(id: Column, salt: String): Column =
    substring(md5(concat(id.cast("string"), lit(":" + salt)).cast("binary")), 1, 4)

  /** Four-hex-char threshold for a keep rate. Rates that round to the full
    * 65536 buckets return "g000" — lexically above every hex bucket, so the
    * comparison keeps ALL rows (a naive "10000" would compare BELOW "ffff"
    * as a string and silently keep almost nothing at rate 1.0). Rates
    * outside [0,1] are an error, not a malformed threshold string.
    */
  private def hex2(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"sampling rate $rate outside [0, 1]")
    val buckets = math.round(rate * 65536)
    if (buckets >= 65536) "g000" else f"$buckets%04x"
  }

  /** Uniform deterministic sample: keep ~`rate` of rows keyed by `idCol`. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 salt: String = "sample"): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < lit(hex2(rate)))

  /** Stratified deterministic sample: per-stratum keep rates (domain-mixing
    * weights), unlisted strata use `defaultRate`. One narrow pass.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "strata"): DataFrame = {
    val threshold = rates.foldLeft(lit(hex2(defaultRate))) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(hex2(r))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < threshold)
  }

  /** Deterministic train/val/test assignment: bucket thresholds carve the
    * 256 hash buckets into contiguous ranges (defaults ≈ 80/10/10). The
    * same (id, salt) always lands in the same split — re-ingesting a
    * document can never migrate it from test into train.
    */
  def trainValTestSplit(df: DataFrame, idCol: String,
                        trainRate: Double = 0.8, valRate: Double = 0.1,
                        salt: String = "split"): DataFrame = {
    val b = hashBucket(col(idCol), salt)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(b < lit(hex2(trainRate)), "train")
          .when(b < lit(hex2(trainRate + valRate)), "val")
          .otherwise("test"))
  }

  // ---------------------------------------------------------------- oracles

  /** DuckDB twin of [[hashBucket]]. */
  def sqlHashBucket(idCol: String, salt: String): String =
    s"substring(md5($idCol::VARCHAR || ':$salt'), 1, 4)"

  /** DuckDB twin of the threshold (identical boundary semantics). */
  def sqlHex2(rate: Double): String = s"'${hex2(rate)}'"
}
