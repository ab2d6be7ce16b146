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
    * exactly (verified by ScaleOpsSpec); only the partitioning changes.
    * `small` is replicated `salt`× — keep it the dimension side.
    *
    * The scatter is DETERMINISTIC and partition-independent: the salt is
    * `xxhash64` of the row's full content (every big-side column), so the
    * same row lands in the same bucket under any input layout — the
    * engine-wide reproducibility contract (Sampling, Packing) holds here
    * too, unlike a `monotonically_increasing_id` nonce whose value depends
    * on partition placement (ADVICE/VERDICT r5). Corollary: bit-identical
    * duplicate rows co-locate (they are indistinguishable by content); the
    * spread within a hot key comes from the non-key columns, which real
    * fact rows always carry.
    */
  def salted(big: DataFrame, small: DataFrame, key: String, salt: Int = 8): DataFrame = {
    require(salt > 0)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
