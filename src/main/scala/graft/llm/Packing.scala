package graft.llm

import graft.operators.PrefixSum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: lay documents end-to-end in
  * a deterministic order and cut the stream into fixed-token-budget bins —
  * the concat-and-chunk packing that turns a curated corpus into
  * context-window-sized training sequences (each bin is one sequence; a
  * document that straddles a boundary starts in its bin and continues into
  * the next, exactly like token-stream chunking in LM data loaders).
  *
  * Determinism: the layout order is (md5-hash-bucket, doc_id) — a pure
  * function of (doc_id, salt), like everything in [[Sampling]] — so the
  * same corpus always packs into the same bins regardless of partitioning,
  * cluster size, or engine (which is what makes the assignment
  * oracle-checkable). The global running token count goes through
  * [[graft.operators.PrefixSum]] — a range shuffle plus one long per
  * partition to the driver — NOT a single-partition window; packing 100 TB
  * shuffles each row once.
  */
object Packing {

  /** Assign each document its bin (training sequence id) and starting token
    * offset within that bin, for bins of `binTokens` whitespace tokens.
    * `bin_id = prefix ∕ binTokens`, `bin_offset = prefix mod binTokens`
    * where `prefix` is the total token count of all documents laid out
    * before this one (exact long arithmetic, no doubles).
    *
    * Contract: `doc_id` must be NON-NEGATIVE (corpus ids are unsigned in
    * practice; a '-' sign would sort before digits and break the decimal
    * padding's monotonicity). The pad width is 20 — the full unsigned
    * 64-bit decimal width — so NO representable id truncates (lpad
    * truncates oversized input, which would silently produce duplicate,
    * placement-dependent sort keys; ADVICE r5).
    */
  def packGreedy(documents: DataFrame, binTokens: Long,
                 salt: String = "pack"): DataFrame = {
    require(binTokens > 0, s"binTokens must be positive, got $binTokens")
    val scored = documents.select(
      col("doc_id"),
      Sampling.hashBucket(col("doc_id"), salt).as("bucket"),
      size(TextFns.tokens(col("text"))).as("n_tokens"))
      .withColumn("sort_key",
        concat(col("bucket"), lit("-"), lpad(col("doc_id").cast("string"), 20, "0")))
    PrefixSum.withRunningSum(scored, "sort_key", "n_tokens")
      .withColumn("prefix", col("running_sum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"prefix div ${binTokens}L").as("bin_id"),
        (col("prefix") % binTokens).as("bin_offset"))
  }

  /** Bin-level view of [[packGreedy]]: one row per training sequence with
    * its document count and the count of tokens that belong to documents
    * STARTING in the bin (boundary-straddling documents contribute their
    * full length to their starting bin here — the reconstruction-friendly
    * accounting; every bin except the last covers exactly `binTokens`
    * stream positions by construction).
    */
  def packBins(documents: DataFrame, binTokens: Long,
               salt: String = "pack"): DataFrame =
    packGreedy(documents, binTokens, salt)
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_started"))
}
