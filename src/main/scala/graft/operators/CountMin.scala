package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the frequency member
  * of the engine's mergeable-sketch family (HLL = distinct counts, Bloom =
  * membership, MinHash = similarity, Misra-Gries = exact heavy hitters):
  * approximate per-key counts in depth·width cells regardless of key
  * cardinality, with ONE-SIDED error (never an undercount; overcount
  * ≤ e·N/width with probability 1 − e^−depth).
  *
  * Representation: a (j, bucket, cnt) DataFrame — d·w rows max. Row j's
  * hash is `xxhash64(j, key) mod width` (Spark's codegen'd 64-bit hash;
  * distinct j values give the d independent-enough hash functions).
  *
  * Scale shape: the build explodes each row ×depth but map-side combine
  * collapses to the d·w cell grid BEFORE the exchange — the shuffle is
  * sketch-sized, not corpus-sized, whatever the key cardinality (the
  * reason to prefer CMS over an exact groupBy count at 100 TB of
  * unbounded keys). Merging is cell-wise ADDITION — associative and
  * commutative, so sketches of partitions/days combine to exactly the
  * whole-corpus sketch (NOT idempotent: a replayed append inflates, so a
  * persisted CMS store needs the TAG dedup of the VersionedStore
  * protocol, unlike the HLL store's register-max).
  */
object CountMin {

  def build(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1)
    df.select(col(keyCol).as("k"),
      explode(array((0 until depth).map(lit): _*)).as("j"))
      .withColumn("bucket", pmod(xxhash64(col("j"), col("k")), lit(width.toLong)))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of two sketches (same depth/width). Exactly the sketch
    * of the concatenated inputs.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("j", "bucket").agg(sum("cnt").as("cnt"))

  /** Point estimates for `keys` (distinct): (k, est) with
    * est = min over rows j of the key's cell. Never below the true count.
    */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    keys.select(col(keyCol).as("k")).distinct()
      .select(col("k"), explode(array((0 until depth).map(lit): _*)).as("j"))
      .withColumn("bucket", pmod(xxhash64(col("j"), col("k")), lit(width.toLong)))
      .join(sketch, Seq("j", "bucket"), "left")
      .groupBy("k").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
