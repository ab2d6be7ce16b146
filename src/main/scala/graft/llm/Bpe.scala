package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary learning (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the tokenizer-
  * training step of a training-data pipeline, built Spark-first on the
  * classic scale trick: merges are learned from the WORD-FREQUENCY TABLE,
  * not the raw corpus. The corpus is touched exactly once (one shuffle to
  * build `(word, count)`); every merge iteration then runs over |vocab|
  * rows — bounded by the distinct-word count, which grows sublinearly in
  * corpus size (Heaps' law), so 100 TB of text trains at the cost of a
  * few GB of vocabulary. This is how single-node BPE trainers scale too;
  * here the per-iteration pair count is a map-side-combined Spark
  * aggregate and the argmax is a 1-row TakeOrdered, so the iteration state
  * that ever reaches the driver is ONE (pair, count) row per merge.
  *
  * Determinism: pair counts are exact integers and the argmax tie-breaks
  * by (count desc, left asc, right asc) — a total order, so the learned
  * merge sequence is a pure function of the corpus, identical across
  * runs, partitionings, and engines (the DuckDB oracle replays the whole
  * training loop as an unrolled CTE chain and must agree merge-for-merge).
  *
  * Merge application is the greedy left-to-right fold of classic BPE: a
  * single pass rebuilding the symbol list, merging each non-overlapping
  * (left, right) adjacency as it is encountered ("aaa" under (a,a) →
  * [aa, a]). Pair COUNTING counts every adjacent position (overlapping
  * included), matching the reference implementations.
  *
  * Tokenization reuses the trained vocabulary as a word → symbols cache
  * (every corpus word is in the vocab by construction): one narrow
  * explode + a broadcast join against the |vocab|-row symbol table —
  * the corpus never folds through the merge sequence itself. Unseen words
  * (tokenizing a NEW corpus with a trained model) fall back to character
  * symbols, the same behavior as an untrained word in a real tokenizer
  * before merge application.
  */
object Bpe {

  /** One learned merge: rank (1-based), the two symbols joined, and the
    * weighted pair count that won the iteration.
    */
  final case class Merge(mergeRank: Int, lhs: String, rhs: String, pairCount: Long)

  /** The trained model: the merge sequence plus the final word → symbols
    * vocabulary (the tokenization cache).
    */
  final case class Model(merges: Seq[Merge], vocab: DataFrame) {
    def mergesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.map(m => (m.mergeRank, m.lhs, m.rhs, m.pairCount))
        .toDF("merge_rank", "lhs", "rhs", "pair_count")
    }
  }

  /** Word-frequency vocabulary over whitespace tokens (lowercased — the
    * same [[TextFns.tokens]] convention the rest of the text tier uses).
    * The one corpus-sized shuffle in BPE training.
    */
  def wordVocab(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Greedy left-to-right application of one merge to a symbol list: one
    * fold rebuilding the list, consuming each (l, r) adjacency as met.
    */
  private[llm] def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, lit(Array.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** One fold applying a whole batch of SYMBOL-DISJOINT merges — exactly
    * equivalent to applying them sequentially (each [[applyMerge]] over the
    * previous result): disjointness means no merge can create, destroy, or
    * claim another's (l, r) adjacency (merging replaces two symbols with
    * one new symbol, never removes one), so the interleaved single-pass
    * consumption decisions match the sequential passes one-for-one. An
    * adjacency matches at most one batch pair (pairs are distinct), so the
    * when-chain order is immaterial.
    */
  private[llm] def applyMerges(syms: Column, ms: Seq[(String, String)]): Column = {
    require(ms.nonEmpty, "applyMerges: empty batch")
    aggregate(syms, lit(Array.empty[String]),
      (acc, x) => {
        val last = element_at(acc, -1)
        val merged = ms.foldLeft(lit(null).cast("string")) {
          case (e, (l, r)) =>
            when(last === lit(l) && x === lit(r), lit(l + r)).otherwise(e)
        }
        when(size(acc) > 0 && merged.isNotNull,
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(x)))
      })
  }

  /** Weighted adjacent-pair counts over the current symbol table (every
    * adjacent position counts, overlapping included — the classic
    * definition). Map-side combine reduces to |distinct pairs| rows.
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      // size < 2 guard: Spark's sequence(1, 0) is the DESCENDING [1, 0],
      // not empty — an unguarded transform would emit phantom null pairs
      // for every fully-merged single-symbol word
      .select(col("n"), explode(expr(
        """CASE WHEN size(syms) > 1
           THEN transform(sequence(1, size(syms) - 1),
                j -> struct(syms[j-1] AS l, syms[j] AS r))
           ELSE CAST(array() AS array<struct<l:string,r:string>>) END"""))
        .as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum("n").as("cnt"))

  /** Train `numMerges` BPE merges. EAGER: each iteration runs a Spark
    * aggregate over the vocabulary and collects exactly ONE (pair, count)
    * row (the argmax — a bounded driver materialization under the capped-
    * collect contract); the symbol table re-materializes through
    * [[graft.operators.Materialize.cut]] each iteration so iteration i
    * never replays folds 1..i-1. Stops early if the vocabulary runs out
    * of adjacent pairs (every word reduced to one symbol).
    */
  def train(documents: DataFrame, numMerges: Int,
            textCol: String = "text"): Model = {
    require(numMerges > 0 && numMerges <= 65536,
      s"numMerges $numMerges outside [1, 65536]")
    var vocab = graft.operators.Materialize.cut(
      wordVocab(documents, textCol)
        .withColumn("syms", split(col("word"), "")))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        vocab = graft.operators.Materialize.cut(
          vocab.withColumn("syms", applyMerge(col("syms"), l, r)))
        rank += 1
      }
    }
    Model(merges.result(), vocab.select("word", "n", "syms"))
  }

  /** [[train]] with BATCHED merge rounds (VERDICT r11 #4): instead of one
    * Spark job per merge (~32k jobs at a real vocab), each round collects
    * one ranked candidate slice and accepts a PREFIX of it — pairwise
    * symbol-disjoint pairs, each guarded so the batched sequence is
    * BIT-IDENTICAL to [[train]]'s sequential one (spec-pinned; x30/x31's
    * sequential-unrolled oracles hash-match the batched trainer unchanged).
    *
    * Why the guard gives exactness: applying merge p = (l, r) changes only
    * pair counts that involve l or r — counts of symbol-disjoint pairs are
    * untouched (no (a, b) adjacency with {a,b}∩{l,r}=∅ is created or
    * destroyed), pairs sharing a symbol only DECREASE (occurrences are
    * consumed, never added), and every pair p CREATES — (x, lr) / (lr, y) /
    * (lr, lr) — is count-bounded by an existing pair sharing a symbol with
    * p ((x, l), (r, y), (r, l) respectively: each created adjacency
    * consumed one such original adjacency). So the i-th batched pair is
    * sequential's i-th argmax provided (a) it is symbol-disjoint from the
    * batch so far (its own count and consumption set are untouched), (b) it
    * is the NEXT ranked pair (no skips — a skipped conflicting pair might
    * survive with its count intact and win), and (c) its count STRICTLY
    * exceeds every non-batch pair sharing a symbol with the batch so far —
    * the only pairs whose successors could newly outrank it (strictness
    * kills lex-order tie upsets). Pairs below the collect horizon are
    * bounded by the last collected count, so the guard closes over them
    * too.
    *
    * Three further conditions close the CONCATENATION-COLLISION holes
    * (symbol-string disjointness alone is not enough once a merge's l+r
    * can equal another symbol — ADVICE r12 #1, the (a,bc)/(abc,d) case):
    * (d) neither component of a candidate may have been CREATED by an
    * earlier pick of this batch — such a candidate's collected count is
    * stale-low (the earlier pick mints new occurrences of that symbol),
    * so ranking against it is meaningless; the batch stops before it.
    * (e) a pick whose concatenation l+r already EXISTS as a symbol (every
    * multi-char symbol is some prior accepted merge's concatenation, so
    * the accumulated merge history decides this exactly) is accepted —
    * its own count and the bound that admitted it are still sound — but
    * ENDS the batch: applying it inflates pairs involving l+r, whose
    * post-merge counts (old + newly minted) can exceed the threat max, so
    * no later pick's guard would be trustworthy. Duplicate concatenations
    * within one batch ((a,bc) and (ab,c) both minting "abc") hit the same
    * rule: the second is accepted and ends the batch, since a symbol fed
    * by two merges can push a created pair past any single threat bound.
    * (f) a candidate whose concatenation equals an EARLIER pick's
    * component is rejected (batch stops): the left-to-right fold in
    * [[applyMerges]] would let the earlier pick consume adjacencies this
    * pick creates mid-pass ((abc,d) picked before (a,bc) turns "a bc d"
    * into "abcd" in one pass, where sequential application yields
    * "abc d") — breaking bit-identity with [[train]].
    *
    * The batch stops at the first pair failing the guard — worst case
    * (every round degenerates to 1 merge) this IS sequential training with
    * a wider TakeOrdered; best case it cuts driver round-trips ~batch×.
    */
  def trainBatched(documents: DataFrame, numMerges: Int, batch: Int = 16,
                   textCol: String = "text"): Model =
    trainBatchedCounted(documents, numMerges, batch, textCol)._1

  /** [[trainBatched]] plus the measured round count (Spark job rounds spent
    * learning — the jobs/merge reduction is `merges.size / rounds`).
    */
  def trainBatchedCounted(documents: DataFrame, numMerges: Int,
                          batch: Int = 16,
                          textCol: String = "text"): (Model, Int) = {
    require(numMerges > 0 && numMerges <= 65536,
      s"numMerges $numMerges outside [1, 65536]")
    require(batch >= 1 && batch <= 1024, s"batch $batch outside [1, 1024]")
    var vocab = graft.operators.Materialize.cut(
      wordVocab(documents, textCol)
        .withColumn("syms", split(col("word"), "")))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var rounds = 0
    var exhausted = false
    // Every multi-char symbol in the vocabulary is the concatenation of
    // some accepted merge (symbols are only ever minted by merges), so
    // this set decides "does candidate l+r already exist?" exactly —
    // guard condition (e) — without touching the distributed vocab.
    val everCreated = scala.collection.mutable.Set.empty[String]
    while (rank <= numMerges && !exhausted) {
      val want = math.min(batch, numMerges - rank + 1)
      // 4× headroom so threat witnesses for a full batch usually sit inside
      // the collect; +1 detects truncation (→ the last count bounds every
      // uncollected pair). Still one bounded TakeOrdered per round.
      val horizon = 4 * want + 1
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(horizon).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      rounds += 1
      if (top.isEmpty) exhausted = true
      else {
        val selected =
          selectBatch(top.toIndexedSeq, want, top.length == horizon, everCreated)
        selected.foreach { case (l, r, cnt) =>
          merges += Merge(rank, l, r, cnt); rank += 1
          everCreated += l + r
        }
        vocab = graft.operators.Materialize.cut(
          vocab.withColumn("syms",
            applyMerges(col("syms"), selected.map(t => (t._1, t._2)))))
      }
    }
    (Model(merges.result(), vocab.select("word", "n", "syms")), rounds)
  }

  /** The batch-admission guard — conditions (a)–(f) of [[trainBatched]]'s
    * scaladoc — over one collected candidate slice (ranked (l, r, cnt)
    * triples). Returns the accepted PREFIX. Pure, so the collision cases
    * that no small corpus reaches under the global greedy merge order
    * (the (a,bc)/(abc,d) family — ADVICE r12 #1) are unit-testable
    * directly. `everCreated` holds the concatenation of every merge this
    * training run has accepted (= every multi-char symbol that can exist
    * in the vocabulary).
    */
  private[llm] def selectBatch(top: IndexedSeq[(String, String, Long)],
                               want: Int, truncated: Boolean,
                               everCreated: collection.Set[String])
      : Seq[(String, String, Long)] = {
    val horizonCnt = if (truncated) top.last._3 else Long.MinValue
    val sel = Seq.newBuilder[(String, String, Long)]
    val batchSyms = scala.collection.mutable.Set.empty[String]
    val createdThisBatch = scala.collection.mutable.Set.empty[String]
    var i = 0
    var n = 0
    var stop = false
    while (!stop && n < want && i < top.length) {
      val (l, r, cnt) = top(i)
      val cat = l + r
      val disjoint = n == 0 || (!batchSyms(l) && !batchSyms(r))
      // (d) components minted earlier this batch → this count is stale
      val freshComponents = !createdThisBatch(l) && !createdThisBatch(r)
      // (f) an earlier pick would consume adjacencies this pick mints
      // mid-fold — the single-pass applyMerges would diverge from
      // sequential application
      val noFoldHazard = !batchSyms(cat)
      lazy val threat = {
        var t = horizonCnt
        var j = i + 1
        while (j < top.length) {
          val (tl, tr, tc) = top(j)
          if ((batchSyms(tl) || batchSyms(tr)) && tc > t) t = tc
          j += 1
        }
        t
      }
      if (disjoint && freshComponents && noFoldHazard &&
          (n == 0 || cnt > threat)) {
        sel += ((l, r, cnt)); batchSyms += l; batchSyms += r
        n += 1; i += 1
        // (e) l+r already exists as a symbol (prior round or earlier
        // this batch): accept — its own admission bound is sound —
        // but end the batch; pairs involving l+r can now rise past
        // any threat computed from pre-batch counts.
        if (everCreated(cat) || createdThisBatch(cat)) stop = true
        createdThisBatch += cat
      } else stop = true
    }
    sel.result()
  }

  /** RELAXED batched trainer — the production 32k-vocab path (VERDICT r13
    * #8 follow-up, measured in BPE_SCALE_*_relaxed.json). The EXACT
    * batched trainer admits ~2 merges/round structurally: early symbols
    * are ~26 characters, top pairs densely share them, and exactness must
    * end the batch at the first candidate whose count doesn't dominate
    * every symbol-sharing pair (their counts genuinely move when the
    * batch applies). This mode drops the threat-dominance guard and
    * admits every SYMBOL-DISJOINT candidate in rank order up to `batch` —
    * the standard industrial relaxation (counts within a round are
    * batch-stale, so the merge SEQUENCE is not bit-identical to
    * sequential BPE; the merge QUALITY is equivalent in practice because
    * a deferred pair is simply re-ranked with fresh counts next round).
    * What still holds exactly:
    *   - symbol-disjointness per batch, so the one-pass [[applyMerges]]
    *     fold is unambiguous (each adjacency matches at most one pair);
    *   - no duplicate mints (a candidate whose concatenation already
    *     exists is SKIPPED, not fatal);
    *   - determinism: selection is a pure function of the ranked
    *     collect, itself deterministically ordered (cnt desc, l, r).
    * Round-trips collapse from ~merges/2 to ~merges/batch + ranking
    * truncation effects — the measured artifact carries the realized
    * number.
    */
  def trainBatchedRelaxed(documents: DataFrame, numMerges: Int, batch: Int = 256,
                          textCol: String = "text"): Model =
    trainBatchedRelaxedCounted(documents, numMerges, batch, textCol)._1

  def trainBatchedRelaxedCounted(documents: DataFrame, numMerges: Int,
                                 batch: Int = 256,
                                 textCol: String = "text"): (Model, Int) = {
    require(numMerges > 0 && numMerges <= 65536,
      s"numMerges $numMerges outside [1, 65536]")
    require(batch >= 1 && batch <= 1024, s"batch $batch outside [1, 1024]")
    var vocab = graft.operators.Materialize.cut(
      wordVocab(documents, textCol)
        .withColumn("syms", split(col("word"), "")))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var rounds = 0
    var exhausted = false
    val everCreated = scala.collection.mutable.Set.empty[String]
    while (rank <= numMerges && !exhausted) {
      val want = math.min(batch, numMerges - rank + 1)
      // 4× headroom: disjointness skips are common near the top of the
      // ranking, so the collect carries spares (same horizon as exact)
      val horizon = 4 * want + 1
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(horizon).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      rounds += 1
      val sel = selectBatchRelaxed(top.toIndexedSeq, want, everCreated)
      if (sel.isEmpty) exhausted = true
      else {
        sel.foreach { case (l, r, cnt) =>
          merges += Merge(rank, l, r, cnt); rank += 1
          everCreated += l + r
        }
        vocab = graft.operators.Materialize.cut(
          vocab.withColumn("syms",
            applyMerges(col("syms"), sel.map(t => (t._1, t._2)))))
      }
    }
    (Model(merges.result(), vocab.select("word", "n", "syms")), rounds)
  }

  /** Relaxed admission: every symbol-disjoint candidate in rank order,
    * skipping (never stopping on) duplicate mints and fold hazards. Pure,
    * like [[selectBatch]].
    */
  private[llm] def selectBatchRelaxed(top: IndexedSeq[(String, String, Long)],
                                      want: Int,
                                      everCreated: collection.Set[String])
      : Seq[(String, String, Long)] = {
    val sel = Seq.newBuilder[(String, String, Long)]
    val batchSyms = scala.collection.mutable.Set.empty[String]
    var i = 0
    var n = 0
    while (n < want && i < top.length) {
      val (l, r, cnt) = top(i)
      val cat = l + r
      val admissible =
        !batchSyms(l) && !batchSyms(r) && // disjoint → unambiguous fold
          !batchSyms(cat) &&              // no mid-fold self-feed
          !everCreated(cat)               // no duplicate mint
      if (admissible) {
        sel += ((l, r, cnt))
        batchSyms += l; batchSyms += r; batchSyms += cat
        n += 1
      }
      i += 1
    }
    sel.result()
  }

  /** Tokenize a corpus with a trained model: per-document BPE symbol count
    * and the symbol sequence, via the vocabulary cache (one narrow word
    * explode, one broadcast join, one rollup — the corpus never runs the
    * merge fold). Words absent from the vocabulary degrade to character
    * symbols row-locally.
    */
  def tokenCounts(documents: DataFrame, model: Model,
                  textCol: String = "text"): DataFrame = {
    val words = documents.select(col("doc_id"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("word_pos", "word")))
      .filter(length(col("word")) > 0)
    words
      .join(broadcast(model.vocab.select(col("word"), col("syms"))), Seq("word"), "left")
      .select(col("doc_id"), col("word_pos"),
        coalesce(col("syms"), split(col("word"), "")).as("syms"))
      .groupBy("doc_id")
      .agg(sum(size(col("syms"))).cast("long").as("n_bpe_symbols"),
        count(lit(1)).as("n_words"))
  }

  // ---------------------------------------------------------------- oracles

  /** DuckDB twin of the ENTIRE training loop, as an unrolled CTE chain:
    * stage i counts weighted adjacent pairs over the stage-(i-1) symbol
    * table, picks the (cnt desc, l, r) argmax, and rebuilds the symbols
    * with the same greedy left-to-right fold. `finalSelect` runs against
    * the last symbol stage (`s<numMerges>`) and the per-merge argmax rows
    * (`b1..b<numMerges>`).
    */
  def sqlTrainChain(table: String, textCol: String, numMerges: Int): String = {
    val v0 =
      s"""v0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
          FROM (SELECT unnest(string_split_regex(lower($textCol), '\\s+')) AS word
                FROM $table) z
          WHERE len(word) > 0 GROUP BY word),
          s0 AS (SELECT word, n, split(word, '') AS syms FROM v0)"""
    val stages = (1 to numMerges).map { i =>
      val p = i - 1
      s"""p$i AS (SELECT pr.l AS l, pr.r AS r, SUM(n) AS cnt FROM (
            SELECT n, unnest(list_transform(generate_series(1, len(syms) - 1),
              j -> {'l': syms[j], 'r': syms[j+1]})) AS pr
            FROM s$p) z GROUP BY 1, 2),
          b$i AS (SELECT l, r, CAST(cnt AS BIGINT) AS cnt FROM p$i
                  ORDER BY cnt DESC, l, r LIMIT 1),
          s$i AS (SELECT s.word, s.n,
            list_reduce(
              list_prepend(CAST([] AS VARCHAR[]), list_transform(s.syms, x -> [x])),
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
                          THEN list_append(acc[1:len(acc)-1], b.l || b.r)
                          ELSE list_concat(acc, x) END) AS syms
            FROM s$p s, b$i b)"""
    }
    (v0 +: stages).mkString("WITH ", ",\n", "")
  }

  /** DuckDB twin of [[Model.mergesDf]]: the b1..bN argmax rows stacked. */
  def sqlMerges(table: String, textCol: String, numMerges: Int): String = {
    val union = (1 to numMerges).map(i =>
      s"SELECT $i AS merge_rank, l AS lhs, r AS rhs, cnt AS pair_count FROM b$i")
      .mkString(" UNION ALL ")
    s"""${sqlTrainChain(table, textCol, numMerges)}
        SELECT merge_rank, lhs, rhs, pair_count FROM ($union) u
        ORDER BY merge_rank"""
  }

  /** DuckDB twin of [[tokenCounts]]: replay training, then join each
    * document's words against the final symbol stage.
    */
  def sqlTokenCounts(table: String, textCol: String, numMerges: Int): String =
    s"""${sqlTrainChain(table, textCol, numMerges)},
        dw AS (SELECT doc_id, word
               FROM (SELECT doc_id,
                       unnest(string_split_regex(lower($textCol), '\\s+')) AS word
                     FROM $table) z
               WHERE len(word) > 0)
        SELECT dw.doc_id,
          CAST(SUM(len(s.syms)) AS BIGINT) AS n_bpe_symbols,
          CAST(COUNT(*) AS BIGINT) AS n_words
        FROM dw JOIN s$numMerges s ON dw.word = s.word
        GROUP BY dw.doc_id ORDER BY dw.doc_id"""

  /** DuckDB twin of the RELAXED batched trainer (VERDICT r14 #7) — the
    * whole loop unrolled: per round, the ranked top-`4·want+1` candidate
    * window (the Spark collect's exact horizon and (cnt DESC, l, r)
    * order), then `want` ADMISSION CTEs replaying
    * [[selectBatchRelaxed]]'s sequential scan — selection j is the
    * lowest-ranked candidate whose symbols are disjoint from selections
    * 1..j−1's {l, r, l·r} and whose concatenation was never minted — and
    * ONE batch fold per round replaying [[applyMerges]] (membership test
    * against the round's pair list; disjointness makes the single pass ≡
    * sequential). STATIC SHAPE CONTRACT: the unroll assumes every round
    * admits exactly `want` merges (rounds = numMerges/batch, numMerges a
    * multiple of batch); the Spark def `require`s the realized shape, so
    * a corpus where admission stalls fails LOUDLY instead of drifting
    * from the oracle.
    */
  def sqlMergesRelaxed(table: String, textCol: String,
                       numMerges: Int, batch: Int): String = {
    require(numMerges % batch == 0,
      s"static relaxed oracle needs batch | numMerges; got $numMerges/$batch")
    val rounds = numMerges / batch
    val horizon = 4 * batch + 1
    val v0 =
      s"""v0 AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
          FROM (SELECT unnest(string_split_regex(lower($textCol), '\\s+')) AS word
                FROM $table) z
          WHERE len(word) > 0 GROUP BY word),
          s0 AS MATERIALIZED (SELECT word, n, split(word, '') AS syms FROM v0)"""
    def selName(i: Int, j: Int) = s"sel${i}_$j"
    // symbols claimed by this round's selections 1..j-1 (l, r, and the mint)
    def batchSymsUnion(i: Int, j: Int): String =
      (1 until j).flatMap { jj =>
        Seq(s"SELECT l AS s FROM ${selName(i, jj)}",
          s"SELECT r AS s FROM ${selName(i, jj)}",
          s"SELECT l || r AS s FROM ${selName(i, jj)}")
      }.mkString(" UNION ALL ")
    // every symbol minted by earlier rounds
    def priorCatsUnion(i: Int): String =
      (1 until i).flatMap { ii =>
        (1 to batch).map(jj => s"SELECT l || r AS s FROM ${selName(ii, jj)}")
      }.mkString(" UNION ALL ")
    val stages = (1 to rounds).map { i =>
      val p = i - 1
      val cand =
        s"""p$i AS MATERIALIZED (SELECT pr.l AS l, pr.r AS r, SUM(n) AS cnt FROM (
              SELECT n, unnest(list_transform(generate_series(1, len(syms) - 1),
                j -> {'l': syms[j], 'r': syms[j+1]})) AS pr
              FROM s$p) z GROUP BY 1, 2),
            cand$i AS MATERIALIZED (SELECT l, r, CAST(cnt AS BIGINT) AS cnt,
                              ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS rn
                       FROM p$i ORDER BY cnt DESC, l, r LIMIT $horizon)"""
      val sels = (1 to batch).map { j =>
        val conds = Seq.newBuilder[String]
        val bs = batchSymsUnion(i, j)
        if (bs.nonEmpty) {
          conds += s"c.l NOT IN ($bs)"
          conds += s"c.r NOT IN ($bs)"
        }
        val mintSources = Seq(bs, priorCatsUnion(i)).filter(_.nonEmpty)
        if (mintSources.nonEmpty)
          conds += s"c.l || c.r NOT IN (${mintSources.mkString(" UNION ALL ")})"
        val where = {
          val cs = conds.result()
          if (cs.isEmpty) "" else cs.mkString("WHERE ", " AND ", "")
        }
        s"""${selName(i, j)} AS MATERIALIZED (SELECT l, r, cnt, rn FROM cand$i c
            $where ORDER BY rn LIMIT 1)"""
      }
      val batList = (1 to batch).map(j => s"SELECT l, r FROM ${selName(i, j)}")
        .mkString(" UNION ALL ")
      val fold =
        s"""bat$i AS MATERIALIZED (SELECT list(l || chr(1) || r) AS prs FROM ($batList) z),
            s$i AS MATERIALIZED (SELECT s.word, s.n,
              list_reduce(
                list_prepend(CAST([] AS VARCHAR[]), list_transform(s.syms, x -> [x])),
                (acc, x) -> CASE WHEN len(acc) > 0
                                  AND list_contains(b.prs, acc[-1] || chr(1) || x[1])
                            THEN list_append(acc[1:len(acc)-1], acc[-1] || x[1])
                            ELSE list_concat(acc, x) END) AS syms
              FROM s$p s, bat$i b)"""
      (cand +: sels :+ fold).mkString(",\n")
    }
    val union = (for (i <- 1 to rounds; j <- 1 to batch) yield
      s"SELECT ${(i - 1) * batch + j} AS merge_rank, l AS lhs, r AS rhs, " +
        s"cnt AS pair_count FROM ${selName(i, j)}").mkString(" UNION ALL ")
    s"""${(v0 +: stages).mkString("WITH ", ",\n", "")}
        SELECT merge_rank, lhs, rhs, pair_count FROM ($union) u
        ORDER BY merge_rank"""
  }
}
