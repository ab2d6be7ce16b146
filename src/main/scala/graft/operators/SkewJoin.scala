package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: AQE's skew-join splitting handles most
  * cases at runtime (enabled in GraftSession), but a join against a
  * pathologically hot key set sometimes needs explicit salting — scatter the
  * big side's rows across `salt` sub-keys and replicate the small side once
  * per sub-key, so one hot key becomes `salt` evenly-sized tasks.
  */
object SkewJoin {

  /** Salted inner equi-join on `key`. Result equals `big.join(small, key)`
    * exactly (verified by SkewJoinSpec); only the partitioning changes.
    * `small` is replicated `salt`× — keep it the dimension side.
    */
  def salted(big: DataFrame, small: DataFrame, key: String, salt: Int = 8): DataFrame = {
    require(salt > 0)
    // deterministic scatter: hash the row's position-independent content
    // plus a per-row nonce (monotonic id) — any even spread works, the join
    // key semantics don't depend on which bucket a row lands in
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)).cast("int"))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
