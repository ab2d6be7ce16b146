package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** LEAKAGE-FREE train/test split — the eval-hygiene upgrade of
    * [[trainValTestSplit]]: after the deterministic hash split, any
    * train/val document sharing ≥ `minShared` 3-shingles with ANY test
    * document is re-labeled `dropped` (it is a paraphrase/near-copy of
    * held-out data; training on it makes the test split dishonest —
    * Lee et al. 2022 §6.2 measure exactly this leakage). Test documents
    * are never dropped, so the eval set itself stays a pure function of
    * ids.
    *
    * Scale shape: the split is a narrow hash map; contamination screening
    * is [[Dedup.contaminationReport]]'s shape — the TEST side's distinct
    * shingles are the small side (an eval-sized fraction of the corpus)
    * joined against the train shingle stream, so the corpus text never
    * shuffles and no all-pairs comparison exists.
    */
  def leakFreeSplit(documents: DataFrame, minShared: Int = 1): DataFrame = {
    val sp = trainValTestSplit(documents, "doc_id")
    val contaminated = Dedup.contaminationReport(
      sp.filter(col("split") =!= "test"),
      sp.filter(col("split") === "test"))
      .filter(col("n_shared_shingles") >= minShared)
      .select(col("doc_id"), lit(true).as("leaks"))
    sp.join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("split") =!= "test" && col("leaks"), "dropped")
          .otherwise(col("split")).as("split"))
  }

  /** Per-source token-cap downsampling — the mixture-flattening step a
    * training-corpus build applies so no single source/domain dominates the
    * token budget (the C4/RefinedWeb per-domain cap, Raffel et al. 2020 /
    * Penedo et al. 2023). A source whose whitespace-token total exceeds
    * `capTokens` is thinned to an expected `capTokens` contribution; sources
    * under the cap pass whole. The keep decision is the deterministic
    * hash-bucket predicate, so the kept set is a pure function of
    * (doc_id, salt) — stable across runs, partitionings, and engines.
    *
    * The per-source bucket threshold derives in INTEGER arithmetic —
    * `capTokens·65536 div srcTokens` — identical in any engine, with no
    * float rounding anywhere on the decision path. Plan shape: one narrow
    * token-count pass, one map-side-combined aggregate producing |sources|
    * rows, an equi-join of the corpus against that tiny rate frame
    * (broadcast when it fits — AQE's call; |sources| can reach millions of
    * domains at 100 TB, where sort-merge on the source key is right), and
    * one narrow filter. Nothing corpus-sized shuffles.
    */
  def sourceCapSample(documents: DataFrame, capTokens: Long,
                      salt: String = "mix"): DataFrame = {
    require(capTokens > 0, s"capTokens $capTokens must be positive")
    val toks = documents.select(col("doc_id"), col("source"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val thr = toks.groupBy("source")
      .agg(sum("n_tok").as("src_tokens"))
      .withColumn("thresh",
        when(lit(capTokens) >= col("src_tokens"), lit("g000"))
          .otherwise(format_string("%04x",
            expr(s"(${capTokens}L * 65536L) div src_tokens"))))
    toks.join(thr, Seq("source"))
      .filter(hashBucket(col("doc_id"), salt) < col("thresh"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("src_tokens"), col("thresh"))
  }

  /** Per-source epoch-weighted repetition — the data-recipe step that
    * realizes "source S trains for e epochs" (LLaMA/GPT-style mixture
    * tables) as a materialized corpus: every document of a source with
    * factor e appears ⌊e⌋ times, plus one more copy for the
    * deterministically-chosen frac(e) of documents (hash-bucket predicate,
    * so the extra-copy set is a pure function of (doc_id, salt) — stable
    * across runs and engines). e < 1 degrades to plain downsampling
    * (⌊e⌋ = 0 and only the frac(e) bucket survives), so one operator
    * covers up- AND down-weighting. Copies carry a (doc_id, copy_idx) key
    * so downstream shuffles (packing, splits) treat them as distinct rows.
    *
    * Pure narrow map + bounded explode — upsampling 100 TB shuffles
    * nothing. The per-source factors are literals folded into ONE CASE
    * column; the integer copy count and the 4-hex threshold both derive in
    * driver-side exact arithmetic, no float on the row-level decision path.
    */
  def epochUpsample(documents: DataFrame, epochs: Map[String, Double],
                    defaultEpochs: Double = 1.0, salt: String = "epoch"): DataFrame = {
    (epochs.values.toSeq :+ defaultEpochs).foreach(e =>
      require(e >= 0.0 && e <= 100.0, s"epoch factor $e outside [0, 100]"))
    def base(e: Double): Int = math.floor(e).toInt
    def thr(e: Double): String = hex2(e - math.floor(e))
    val baseCol = epochs.foldLeft(lit(base(defaultEpochs))) {
      case (acc, (s, e)) => when(col("source") === s, lit(base(e))).otherwise(acc)
    }
    val thrCol = epochs.foldLeft(lit(thr(defaultEpochs))) {
      case (acc, (s, e)) => when(col("source") === s, lit(thr(e))).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("source"),
        (baseCol + when(hashBucket(col("doc_id"), salt) < thrCol, 1).otherwise(0))
          .cast("long").as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
  }

  /** Temperature-resampled language mix — the multilingual-corpus balancing
    * step (mT5 / XLM-R style, Xue et al. 2021): per-language sampling
    * weights w_l ∝ (language token count)^alpha flatten the natural
    * distribution toward uniform as alpha → 0, and each language is thinned
    * to an expected `budgetTokens`·w_l contribution via the deterministic
    * hash-bucket predicate. Languages whose implied rate reaches 1 pass
    * whole (low-resource languages keep everything — the point of
    * temperature sampling).
    *
    * Determinism: pow() is the one non-rational op, computed once per
    * LANGUAGE from a bit-identical integer input and quantized to
    * DECIMAL(28,6) before the (order-sensitive) weight-normalization sum —
    * the sum is then exact, and the rate = budget·pw / (Σpw·tokens) chain
    * is correctly-rounded double arithmetic on identical inputs, so both
    * engines derive the identical 4-hex threshold. The keep set is a pure
    * function of (doc_id, salt).
    *
    * Plan shape (p03's): one narrow pass tags (lang, n_tok) row-locally
    * (the [[TextAnalysis.predictedLang]] argmax — no join), one map-side-
    * combined aggregate produces the |languages|-row frame, the threshold
    * frame broadcasts back, one narrow filter. Nothing corpus-sized
    * shuffles.
    */
  def temperatureMix(documents: DataFrame, alpha: Double, budgetTokens: Long,
                     salt: String = "tmix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    require(budgetTokens > 0, s"budgetTokens $budgetTokens must be positive")
    val toks = documents.select(col("doc_id"),
      TextAnalysis.predictedLang(col("text")).as("lang"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val tot = toks.groupBy("lang").agg(sum("n_tok").as("lang_tokens"))
      .withColumn("pw",
        pow(col("lang_tokens").cast("double"), lit(alpha)).cast(DecimalType(28, 6)))
    val spw = tot.agg(sum("pw").as("spw"))
    val thr = tot.crossJoin(broadcast(spw))
      .withColumn("rate", least(lit(1.0),
        lit(budgetTokens.toDouble) * col("pw").cast("double")
          / (col("spw").cast("double") * col("lang_tokens").cast("double"))))
      .withColumn("thresh",
        when(col("rate") >= 1.0, lit("g000"))
          .otherwise(format_string("%04x", floor(col("rate") * 65536.0).cast("long"))))
      .select("lang", "lang_tokens", "thresh")
    toks.join(thr, Seq("lang"))
      .filter(hashBucket(col("doc_id"), salt) < col("thresh"))
      .select("doc_id", "lang", "n_tok", "lang_tokens", "thresh")
  }

  /** Deterministic global training order — the corpus-shuffle step a
    * training dataloader consumes: every row gets a dense 1..N position in
    * the order of a salted hash of its id (a reproducible permutation — the
    * same corpus and salt give the same order on any cluster, and a new
    * salt is a fresh epoch-level shuffle). The position is assigned
    * scale-safely: a global `ROW_NUMBER() OVER (ORDER BY hash)` would
    * funnel 100 TB through one task's window; instead the hash range-
    * partitions the corpus (disjoint ordered ranges per partition) and the
    * dense index comes from the shared prefix-sum machinery
    * ([[graft.operators.PrefixSum]] — per-partition counts are the only
    * driver traffic). Hash ties cannot occur (full 32-hex MD5 over
    * distinct ids).
    */
  def trainingOrder(documents: DataFrame, salt: String = "shuffle",
                    idCols: Seq[String] = Seq("doc_id")): DataFrame = {
    require(idCols.nonEmpty, "trainingOrder needs at least one id column")
    // composite ids (e.g. doc_id + copy_idx after epochUpsample) hash as a
    // ':'-joined key so every physical row gets its own position
    val key = concat_ws(":", idCols.map(c => col(c).cast("string")) :+ lit(salt): _*)
    val h = md5(key.cast("binary"))
    graft.operators.PrefixSum.withRunningSum(
      documents.select((idCols.map(col) :+ h.as("h") :+ lit(1L).as("one")): _*),
      orderCol = "h", valueCol = "one", outCol = "position")
      .select((idCols.map(col) :+ col("h") :+ col("position")): _*)
  }

  /** Exact-k per-group quota sample — "take exactly k documents per
    * source" (eval-set construction, per-domain audit samples): documents
    * rank by their salted id hash WITHIN each group and rank ≤ k survive,
    * so the quota is exact (groups under k pass whole), deterministic (a
    * pure function of (id, salt) — re-runs and engines agree), and
    * uniform-without-replacement within the group. Rate-based
    * [[stratifiedSample]] hits quotas only in expectation; this is the
    * exact-count twin. Rides the salted two-phase [[graft.operators
    * .TopKPerGroup]] machinery, so a hot group (one domain = half the
    * corpus) never funnels through a single task's window.
    */
  def quotaSample(df: DataFrame, groupCol: String, k: Int,
                  idCol: String = "doc_id", salt: String = "quota"): DataFrame = {
    require(k > 0, s"quota $k must be positive")
    val h = md5(concat(col(idCol).cast("string"), lit(":" + salt)).cast("binary"))
    graft.operators.TopKPerGroup.topKPerGroup(
      df.withColumn("__quota_h", h), Seq(groupCol), tieBreakCol = idCol,
      order = Seq(col("__quota_h"), col(idCol)), k = k, rankCol = "quota_rank")
      .drop("__quota_h")
  }

  /** Per-ROW-rate deterministic sample — the gate that turns a weight
    * COLUMN (acceptance probability in [0, 1], e.g.
    * [[Curation.softDedupWeights]]' 1/|cluster| or an exp-normalized DSIR
    * weight) into a kept subset: row kept iff its [[hashBucket]] falls
    * under `floor(weight·65536)` buckets. Same narrow-map/zero-shuffle
    * posture as [[hashSample]], but the threshold is computed per row from
    * the weight column instead of a compile-time constant; weights ≥ 1
    * keep unconditionally (the `"g000"` sentinel — see `hex2`), weights
    * ≤ 1/65536 keep nothing. floor (not round) so both engines truncate
    * identically regardless of half-way rounding conventions; the hex
    * threshold is lowercased to compare against md5's lowercase digits.
    * Deterministic in (id, salt): re-running the pipeline keeps the same
    * rows, and a cluster of n docs under soft-dedup weights keeps
    * Binomial(n, 1/n) of them — one in expectation.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     salt: String = "soft"): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < weightThreshold(col(weightCol)))

  private def weightThreshold(w: Column): Column =
    // clamp below at 0: a (contract-violating) negative weight would
    // floor to a negative long whose hex lpad-TRUNCATES to 'ffff' —
    // keeping nearly every row instead of none (ADVICE r11)
    when(w >= 1.0, lit("g000"))
      .otherwise(lpad(lower(hex(
        floor(greatest(w, lit(0.0)) * 65536).cast("long"))), 4, "0"))

  /** Exact-size weighted sample WITHOUT replacement — Efraimidis–Spirakis
    * priority sampling (Efraimidis & Spirakis 2006, "Weighted random
    * sampling with a reservoir"): each row draws a deterministic
    * pseudo-uniform u ∈ (0,1) from the salted md5 of its id (first 8 hex
    * chars → 2³² equal buckets, offset by ½ so u is never exactly 0 or 1)
    * and competes with priority u^(1/w); the k LARGEST priorities are a
    * weighted random sample without replacement with inclusion probability
    * increasing in w. [[weightedSample]]'s Bernoulli gate hits a target
    * only in expectation; this is the exact-budget twin (fixed selection
    * budgets: "pick exactly 100k docs, quality-weighted"). Deterministic
    * in (id, salt): re-runs, partitionings, and engines agree row-for-row.
    *
    * Scale shape: the priority is a pure narrow map and the global top-k
    * plans as TakeOrderedAndProject — per-partition partial top-k, then a
    * single k·|partitions| merge — never a global sort; sampling 100 TB
    * moves k rows per partition. The (priority desc, id) ordering is
    * total, so the k-th boundary is unambiguous; priorities are one
    * correctly-rounded pow() on bit-identical dyadic-rational inputs, and
    * adjacent priorities sit ~2⁻³² apart (orders of magnitude above any
    * cross-libm pow ulp), so the selected SET is engine-stable even where
    * the float hash-compare needs its epsilon. Rows with weight ≤ 0 (or
    * null) cannot be drawn (u^(1/w) is undefined) and are excluded, the
    * same fate a zero Bernoulli weight gets.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     salt: String = "prio"): DataFrame = {
    require(k > 0, s"sample size $k must be positive")
    df.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("priority", esPriority(idCol, weightCol, salt))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** The Efraimidis–Spirakis priority u^(1/w) with the deterministic
    * 8-hex-md5 uniform (see [[prioritySample]]).
    */
  private def esPriority(idCol: String, weightCol: String, salt: String): Column = {
    val u32 = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt)).cast("binary")), 1, 8), 16, 10).cast("long")
    val u = (u32.cast("double") + lit(0.5)) / lit(4294967296.0)
    pow(u, lit(1.0) / col(weightCol).cast("double"))
  }

  /** Per-GROUP exact-k weighted sample without replacement — the grouped
    * twin of [[prioritySample]] and the weighted twin of [[quotaSample]]:
    * within each group the k largest Efraimidis–Spirakis priorities
    * survive, so every group lands exactly min(k, |group|) rows drawn
    * proportional-to-weight ("40 docs per source, length-weighted" —
    * eval-set and audit-sample construction with non-uniform importance).
    * Rides the salted two-phase [[graft.operators.TopKPerGroup]], so a
    * hot group (one source = half the corpus) never funnels through a
    * single task's window; the (priority desc, id) order is total, so
    * ranks are engine-identical. Rows with weight ≤ 0/null are excluded
    * as in [[prioritySample]].
    */
  def prioritySamplePerGroup(df: DataFrame, groupCol: String, k: Int,
                             idCol: String = "doc_id",
                             weightCol: String = "weight",
                             salt: String = "gprio"): DataFrame = {
    require(k > 0, s"per-group sample size $k must be positive")
    val keyed = df.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("priority", esPriority(idCol, weightCol, salt))
    graft.operators.TopKPerGroup.topKPerGroup(
      keyed, Seq(groupCol), tieBreakCol = idCol,
      order = Seq(col("priority").desc, col(idCol)), k = k,
      rankCol = "priority_rank")
  }

  // ---------------------------------------------------------------- oracles

  /** DuckDB twin of [[hashBucket]]. */
  def sqlHashBucket(idCol: String, salt: String): String =
    s"substring(md5($idCol::VARCHAR || ':$salt'), 1, 4)"

  /** DuckDB twin of the threshold (identical boundary semantics). */
  def sqlHex2(rate: Double): String = s"'${hex2(rate)}'"

  /** DuckDB twin of [[weightedSample]]'s per-row threshold. */
  def sqlWeightThreshold(weightExpr: String): String =
    s"""CASE WHEN $weightExpr >= 1.0 THEN 'g000'
        ELSE lpad(to_hex(CAST(floor($weightExpr * 65536) AS BIGINT)), 4, '0') END"""

  /** DuckDB twin of [[prioritySample]]'s priority key. */
  def sqlPriority(idCol: String, weightExpr: String, salt: String): String =
    s"""pow((CAST('0x' || substring(md5($idCol::VARCHAR || ':$salt'), 1, 8) AS BIGINT) + 0.5)
           / 4294967296.0, 1.0 / CAST($weightExpr AS DOUBLE))"""

  /** Hard cap on the distinct-source collect in [[interleavedOrder]] — the
    * source/domain dimension is configuration-scale metadata (tens to
    * thousands), never data; a corpus-scale grouping column here is a
    * caller bug and fails fast instead of flooding the driver.
    */
  val MaxInterleaveSources = 65536

  /** Source-interleaved training order — the batch-composition complement
    * of [[trainingOrder]]: a pure hash shuffle makes the global order
    * uniform IN EXPECTATION, but any given window of it can still run
    * same-source; this order guarantees consecutive positions rotate
    * round-robin across sources (each source internally hash-shuffled),
    * the heterogeneous-batch recipe mixture training wants. Deterministic:
    * a pure function of (id, salt, source) — re-runs, engines, and
    * partitionings agree.
    *
    * Scale shape: the within-source rank rides the grouped two-phase
    * prefix sum (no per-source window funnel — sources are exactly the
    * low-cardinality keys that pattern exists for), the global position
    * rides the global prefix sum over a packed (rank × |S| + source-index)
    * long key, and the source dimension is a capped driver collect
    * ([[MaxInterleaveSources]]). Nothing corpus-sized funnels through one
    * task. `sourceCol` must be non-null (SQL PARTITION BY would make a
    * null its own group, but the packed key can't index it — filter or
    * coalesce nulls first).
    */
  def interleavedOrder(documents: DataFrame, sourceCol: String = "source",
                       idCol: String = "doc_id",
                       salt: String = "interleave"): DataFrame = {
    val srcRows = documents.select(col(sourceCol).cast("string"))
      .distinct().limit(MaxInterleaveSources + 1).collect()
    require(srcRows.length <= MaxInterleaveSources,
      s"interleavedOrder: more than $MaxInterleaveSources distinct sources — " +
        "this column is corpus data, not a source dimension")
    val sorted = srcRows.map(_.getString(0)).sorted
    val s = sorted.length
    val idxMap = map(sorted.zipWithIndex.flatMap {
      case (name, i) => Seq(lit(name), lit(i.toLong))
    }: _*)
    val ranked = graft.operators.PrefixSum.withGroupedRunningSum(
      documents.select(col(idCol), col(sourceCol),
        hashBucket(col(idCol), salt).as("hk"), lit(1L).as("one")),
      groupCols = Seq(sourceCol), orderCols = Seq("hk", idCol),
      valueCol = "one", outCol = "rn")
    val packed = ranked
      .withColumn("pos_key",
        col("rn") * lit(s.toLong) + element_at(idxMap, col(sourceCol).cast("string")))
    graft.operators.PrefixSum.withRunningSum(packed, "pos_key", "one", "pos")
      .select(col(idCol), col(sourceCol), col("rn"), col("pos"))
  }
}
