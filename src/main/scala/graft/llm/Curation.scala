package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the flagship composition of the
  * LLM-data operators — near-dup removal (keep each cluster's
  * representative), quality-score floor, language filter — producing the
  * curated corpus a pre-training pipeline would feed to tokenization.
  *
  * Every stage is an independently-oracled operator (d05 clusters, x03
  * quality, x02 lang-ID), so the composition is oracled END-TO-END as
  * QueryDef p01: DuckDB recomputes the full pipeline and the result
  * hash-matches.
  *
  * Scale shape: quality + lang come from the ONE fused row-local scoring
  * pass ([[TextAnalysis.scoreDocuments]] — the same stage the streaming
  * twin runs), so the corpus is scanned once for scoring, not once per
  * signal; dedup is the banded-LSH path (never all-pairs); the final
  * assembly is one anti-join on doc_id against the (small) non-rep set.
  */
object Curation {

  /** Curate a documents frame: drop near-dup non-representatives, keep docs
    * with quality ≥ `minQuality`, and (optionally) a single predicted
    * language.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.53,
             lang: Option[String] = Some("en"), dedupThreshold: Double = 0.8): DataFrame = {
    // non-representative members of near-dup clusters are the drop set;
    // representatives (rep == doc_id) and singletons survive
    val nonReps = Dedup.nearDupClusters(docs, dedupThreshold)
      .filter(col("doc_id") =!= col("rep"))
      .select("doc_id")
    TextAnalysis.scoreDocuments(docs)
      .join(nonReps, Seq("doc_id"), "left_anti")
      .filter(col("quality") >= minQuality)
      .filter(lang.map(l => col("predicted_lang") === l).getOrElse(lit(true)))
      .select("doc_id", "text", "quality", "predicted_lang")
  }

  /** Quantile-based quality filtering: keep documents whose quality score is
    * at or above their language's q-th quantile — "drop the worst 25% per
    * language" instead of a fixed global floor, so a language whose score
    * distribution sits lower isn't wiped out by one absolute constant (the
    * per-language-adaptive cousin of [[curate]]'s `minQuality`).
    *
    * Scale shape: scoring is the one fused narrow pass
    * ([[TextAnalysis.scoreDocuments]]); the per-language thresholds are a
    * groupBy over (lang, quality) pairs whose EXACT percentile buffer is
    * bounded by distinct quality values per language (fine here — scores
    * are small rationals; an unbounded-domain corpus would switch the
    * aggregate to `approx_percentile`, same plan shape); the threshold
    * frame is |languages| rows and BROADCASTS back onto the scored stream,
    * so the corpus is scanned once and shuffled never (score partials
    * excepted).
    */
  def quantileQualityFilter(docs: DataFrame, quantile: Double = 0.25): DataFrame = {
    require(quantile >= 0.0 && quantile <= 1.0, s"quantile $quantile outside [0, 1]")
    val scored = TextAnalysis.scoreDocuments(docs)
    val thresholds = scored.groupBy("predicted_lang")
      .agg(percentile(col("quality"), lit(quantile)).as("q_threshold"))
    scored.join(broadcast(thresholds), Seq("predicted_lang"))
      .filter(col("quality") >= col("q_threshold"))
      .select("doc_id", "predicted_lang", "quality", "q_threshold")
  }

  /** The full training-corpus build: benchmark decontamination → curation
    * (near-dup removal + quality floor + language filter) → deterministic
    * train/val/test assignment. One DataFrame program composing five
    * independently-oracled operators; oracled end-to-end as p02.
    *
    * Scale shape: ONE shingling pass over the corpus serves BOTH
    * decontamination and near-dup clustering (shingling is the dominant
    * narrow compute at 100 TB — running it per stage would double it);
    * the benchmark shingle set broadcasts; dedup is banded LSH; quality /
    * lang / split are narrow maps. The only text-carrying shuffles are the
    * doc_id-keyed joins of survivors.
    */
  def buildTrainingCorpus(docs: DataFrame, benchmark: DataFrame,
                          minQuality: Double = 0.53, lang: Option[String] = Some("en"),
                          dedupThreshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col("doc_id"), TextFns.shingles(col("text")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchSh = benchmark
      .select(explode(TextFns.shingles(col("text"))).as("shingle")).distinct()
    // materialize the contaminated-id list NOW (ids only): every later
    // consumer reads the checkpointed ids, so releasing the shingle cache
    // below cannot silently re-trigger a full re-shingling pass
    val contaminatedIds = graft.operators.Materialize.cut(
      sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(broadcast(benchSh), Seq("shingle"))
        .select("doc_id").distinct())
    val cleanSh = sh.join(contaminatedIds, Seq("doc_id"), "left_anti")
    // the clustering loop materializes eagerly (checkpointed labels), so
    // the shared shingle frame can be released as soon as it returns
    val nonReps = Dedup.nearDupClustersFromShingles(cleanSh, dedupThreshold)
      .filter(col("doc_id") =!= col("rep"))
      .select("doc_id")
    sh.unpersist()
    val cleanDocs = docs.join(contaminatedIds, Seq("doc_id"), "left_anti")
    TextAnalysis.scoreDocuments(cleanDocs)
      .join(nonReps, Seq("doc_id"), "left_anti")
      .filter(col("quality") >= minQuality)
      .filter(lang.map(l => col("predicted_lang") === l).getOrElse(lit(true)))
      .transform(Sampling.trainValTestSplit(_, "doc_id"))
      .select("doc_id", "quality", "predicted_lang", "split")
  }

  /** Per-source corpus report card — the curation-monitoring rollup every
    * mixture pipeline watches per ingest (what's in the pot, how much of
    * it survives the quality gate): docs, whitespace tokens, mean doc
    * length, and the Gopher keep fraction, per source. ONE narrow pass
    * ([[TextAnalysis.gopherRules]] carrying `source` — no self-join back
    * to the corpus) + one |sources|-keyed map-side-combined rollup; each
    * reported ratio is a single double division of exact integer counts,
    * so rows are bit-stable cross-engine.
    */
  def corpusReport(documents: DataFrame): DataFrame =
    TextAnalysis.gopherRules(documents, carryCols = Seq("source"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("total_tokens"),
        sum(when(col("keep_doc"), 1L).otherwise(0L)).as("n_keep"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_doc_tokens"),
        (col("n_keep").cast("double") / col("n_docs").cast("double"))
          .as("gopher_keep_frac"))

  /** SOFT deduplication — keep every document but DOWNWEIGHT duplicates by
    * their near-dup cluster size (weight = 1 / |cluster|, singletons 1.0),
    * the SoftDeDup / "sampling weight" alternative to [[curate]]'s hard
    * drop: a cluster of n near-identical documents contributes one
    * document's worth of expected training mass, spread over its variants,
    * instead of deleting n−1 of them outright (duplicate-driven
    * memorization falls without discarding the unique spans the variants
    * disagree on). Output: every input doc_id with its cluster_size and
    * weight — a sampling prior for [[graft.llm.Sampling]]'s hash gates or
    * an example-weight column for the training loader.
    *
    * Scale shape: clusters come from the banded-LSH path (never
    * all-pairs); the membership frame is cluster-members-sized — at real
    * dup rates a few percent of the corpus — so the corpus-side left join
    * broadcasts under AQE, and the size rollup is |clusters|-keyed with
    * map-side combine. The weight is one double division of exact integer
    * counts, bit-stable cross-engine.
    */
  def softDedupWeights(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val clusters = Dedup.nearDupClusters(docs, threshold)
    val sizes = clusters.groupBy("rep").agg(count(lit(1)).as("cluster_size"))
    val membership = clusters.join(sizes, "rep").select("doc_id", "cluster_size")
    docs.select("doc_id")
      .join(membership, Seq("doc_id"), "left")
      .na.fill(1L, Seq("cluster_size"))
      .withColumn("weight", lit(1.0) / col("cluster_size").cast("double"))
  }
}
