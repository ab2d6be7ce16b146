package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Skew mitigation for equi-joins: AQE's skew-join splitting handles most
  * cases at runtime (enabled in GraftSession), but a join against a
  * pathologically hot key set sometimes needs explicit salting — scatter the
  * big side's rows across `salt` sub-keys and replicate the small side once
  * per sub-key, so one hot key becomes `salt` evenly-sized tasks.
  */
object SkewJoin {

  /** Salted inner equi-join on `key`. Result equals `big.join(small, key)`
    * exactly (verified by ScaleOpsSpec and the j01 DuckDB oracle); only the
    * partitioning changes. `small` is replicated `salt`× — keep it the
    * dimension side.
    *
    * The scatter is DETERMINISTIC and partition-independent: the salt is
    * `xxhash64` of the row's salt columns — `saltCols` if given, else every
    * big-side column — so the same row lands in the same bucket under any
    * input layout; the engine-wide reproducibility contract (Sampling,
    * Packing) holds here too, unlike a `monotonically_increasing_id` nonce
    * whose value depends on partition placement (ADVICE/VERDICT r5).
    *
    * Limitations the salt inherits from content hashing (ADVICE r6):
    *   - MapType columns are unhashable — rejected eagerly here (pass
    *     `saltCols` excluding them) instead of failing at analysis inside
    *     the join plan;
    *   - bit-identical duplicate rows co-locate (indistinguishable by
    *     content). The spread within a hot key comes from the non-key
    *     columns, which real fact rows carry; a caller whose hot rows ARE
    *     degenerate duplicates should add a disambiguating column (batch
    *     id, file offset) and name it in `saltCols` — reintroducing a
    *     partition-dependent nonce here would silently break
    *     reproducibility for everyone else.
    */
  def salted(big: DataFrame, small: DataFrame, key: String, salt: Int = 8,
             saltCols: Seq[String] = Nil): DataFrame = {
    require(salt > 0)
    val cols = if (saltCols.nonEmpty) saltCols else big.columns.toSeq
    val missing = cols.filterNot(big.columns.contains)
    require(missing.isEmpty, s"skewJoin: salt columns not in the big side: ${missing.mkString(", ")}")
    // xxhash64 rejects MapType anywhere in the column's type tree — check
    // recursively so nested maps (array<map<...>>, struct fields) are also
    // caught here with the saltCols hint, not deep in join analysis
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType       => true
      case ArrayType(et, _) => containsMap(et)
      case st: StructType   => st.fields.exists(f => containsMap(f.dataType))
      case _                => false
    }
    val unhashable = big.schema.fields
      .filter(f => cols.contains(f.name) && containsMap(f.dataType))
      .map(_.name)
    require(unhashable.isEmpty,
      s"skewJoin: MapType columns are not hashable — pass saltCols excluding: ${unhashable.mkString(", ")}")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(cols.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
