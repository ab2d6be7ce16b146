package graft.streaming

import java.sql.Timestamp

import graft.functions.Det._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event row for the typed streaming API (events.parquet schema with ts as
  * a proper timestamp). */
final case class EventRow(
    event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Per-user running aggregate maintained by the stateful operator. */
final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

/** A closed session emitted by [[StreamingOps.sessionsWithState]]. */
final case class SessionOut(
    user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

/** In-flight session state (epoch millis — timestamps don't encode well in
  * state stores across timezones). */
final case class SessionAcc(start: Long, last: Long, n: Long)

/** Structured-Streaming twins of the batch event operators
  * (graft.llm.Events): the SAME logical transformations run incrementally —
  * `readStream → transform → writeStream` with watermarks bounding state.
  *
  * Scale notes: windowed aggregation state is (window × event_type) rows,
  * bounded by the watermark horizon; the keyed state in
  * [[runningUserCounts]] is one small case class per user, partitioned by
  * the stream's groupBy key exactly like a shuffle.
  */
object StreamingOps {

  /** Tumbling 1-hour windowed counts/sums with a watermark: late events
    * beyond `watermark` are dropped and their windows finalized (state
    * eviction). Works unchanged on a batch frame (watermark is a no-op).
    */
  def windowedCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming SESSION windows — the streaming twin of the batch
    * `session_window` aggregation (e05): gap-based sessions per user,
    * state bounded by the event-time watermark. In append mode a session
    * emits exactly once, when the watermark passes its close (no event for
    * `gap` after its last one) — so downstream sees each finalized session
    * as an immutable row, the property a session-fact landing zone needs.
    * Works unchanged on a batch frame (watermark is a no-op), and the
    * batch ≡ stream agreement for closed sessions is spec-pinned.
    */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "1 hour"): DataFrame =
    graft.llm.Events.sessionWindows(events.withWatermark("ts", watermark), gap)

  /** Streaming exact dedup — the ingest twin of `graft.llm.Dedup.exact`:
    * drop events whose key was already seen, with state bounded by the
    * event-time watermark (`dropDuplicatesWithinWatermark` evicts seen-keys
    * older than the horizon, so state is O(keys per watermark window), not
    * O(all keys ever) — the property that keeps a 100 TB/day ingest
    * deduplicable). Works unchanged on a batch frame.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String] = Seq("event_id"),
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: join the event stream against a static
    * dimension frame — the streaming twin of the fact-build's dimension
    * lookups (P19/P20). The static side re-resolves per micro-batch and
    * broadcasts (dims are small by definition), so the stream never
    * shuffles: each micro-batch is a map-side hash join. Works unchanged
    * on a batch frame.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream join: purchases matched to same-user views at most
    * `horizon` older — the incremental form of the attribution join
    * (graft.llm.Events.asofViewAttribution's windowed cousin). Both sides
    * carry watermarks and the join predicate bounds event-time distance,
    * so each side's buffered state is evicted once the other side's
    * watermark passes the horizon — state stays O(events per horizon), the
    * property that makes a stream-stream join runnable forever.
    */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame,
                       horizon: String = "1 hour"): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", horizon)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    v.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"interval $horizon"))
      .select("user_id", "view_id", "view_ts", "purchase_id", "purchase_ts")
  }

  /** Stream-stream WATERMARKED interval join at the e26 horizon — the
    * streaming twin of [[graft.llm.Events.windowedConversion]]'s join stage
    * (VERDICT r11 #5): each signup matched to the same user's purchases
    * within `[signup_ts, signup_ts + horizon]` (closed interval — e26's
    * integer-microsecond boundary contract; the default horizon is e26's 7
    * days where [[viewPurchaseJoin]] runs the 1-hour view-attribution
    * shape). The FIRST-signup contract is the caller's: feed first
    * signups, exactly the per-user min e26's aggregate derives — a stream
    * cannot retroactively un-match a non-first signup.
    *
    * Both sides carry `horizon` watermarks and the predicate bounds
    * event-time distance, so buffered state evicts once the other side's
    * watermark passes the window — O(events per horizon), runnable
    * forever. APPEND-mode: a pair is emitted exactly once, when matched;
    * a LATE purchase (arriving after the watermark passed its signup's
    * window) is DROPPED, never retro-matched (spec-pinned — the batch
    * path is the replay for late data, the standard lambda split).
    */
  def conversionPairsStream(signups: DataFrame, purchases: DataFrame,
                            horizon: String = "7 days"): DataFrame = {
    val s = signups
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", horizon)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    s.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"interval $horizon"))
      .select("user_id", "signup_id", "signup_ts", "purchase_id", "purchase_ts")
  }

  /** [[conversionPairsStream]]'s LEFT OUTER form — the join surface inner
    * joins cannot express on streams: every signup row is emitted, with
    * its matched purchases when they exist and exactly ONE null-padded
    * row when the watermark PROVES no purchase arrived inside the
    * horizon. That proof is the point: a non-conversion is not knowable
    * until event time has passed the window's end, so outer rows emit
    * late by construction (one horizon behind the watermark) — the
    * streaming shape of e26's `n_signups` denominator, where the inner
    * join only ever yields the `n_converted` numerator. State bounds and
    * late-side drop semantics are identical to the inner form.
    */
  def conversionFunnelStream(signups: DataFrame, purchases: DataFrame,
                             horizon: String = "7 days"): DataFrame = {
    val s = signups
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", horizon)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    s.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"interval $horizon"),
      "left_outer")
      .select(col("user_id"), col("signup_id"), col("signup_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** Persisted conversion-pair store fed by [[conversionPairsStream]] — the
    * serving layout for windowed-conversion attribution on streams (each
    * pair lands exactly once; the e26 cohort rollup is one |days|-keyed
    * aggregate over the store plus the signup log). The store is
    * DAY-PARTITIONED on the purchase date (`conv_day=`, the event-log
    * layout): batch readers prune at listing time, the recovery anti-join
    * prunes to the straddling batch's own days, and `compactEvery` can
    * fold accrued per-batch small files through the warehouse's
    * crash-safe per-partition swap — without a partition layout a
    * long-lived stream accrues one file set per batch forever (the
    * VERDICT r8 #1 disease class).
    *
    * Replay safety is the engine-standard [[ReplayGuard]] protocol:
    * steady-state batches append with NO scan of the store; a replayed
    * fully-committed batch (crash between the mark write and Spark's
    * commit) is skipped outright; only the one batch that can straddle a
    * crash (first delivery after restart) pays a defensive anti-join on
    * the (signup_id, purchase_id) pair key — the join's output key,
    * unique by the event-id contract — PRUNED to the batch's own days.
    * Both crash windows are fault-injected in StreamingSpec.
    */
  def ingestConversionPairsStream(signups: DataFrame, purchases: DataFrame,
                                  storePath: String, checkpoint: String,
                                  horizon: String = "7 days",
                                  compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(storePath, checkpoint)
    guard.acquireLock() // one writer per sink — checked, not assumed
    val joined = conversionPairsStream(signups, purchases, horizon)
      .withColumn("pair_key",
        concat_ws(":", col("signup_id"), col("purchase_id")))
      .withColumn("conv_day", to_date(col("purchase_ts")))
    val step: (DataFrame, Long) => Unit = (batch, batchId) =>
      guard.posture(batchId) match {
        case Skip =>
          // the upstream join is STATEFUL: its state stores only commit
          // when the batch plan runs over every partition, and Spark 4
          // validates exactly that — so a skipped sink write must still
          // drain the batch (unlike the stateless-source maintainers)
          batch.foreach(_ => ())
        case p =>
          val spark = batch.sparkSession
          // guard files live under storePath — "dir exists" is not "store
          // has data"; look for partition directories (first post-start
          // delivery is ALWAYS Recover posture)
          val storeHasData = {
            val hp = new org.apache.hadoop.fs.Path(storePath)
            val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
            fs.exists(hp) &&
              fs.listStatus(hp).exists(_.getPath.getName.startsWith("conv_day="))
          }
          val batchP = batch.persist()
          try {
            val rows =
              if (p == Recover && storeHasData) {
                // recovery anti-join bounded to the batch's OWN days
                val days = batchP.select("conv_day").distinct()
                  .collect().map(_.getDate(0))
                if (days.isEmpty) batchP.limit(0)
                else batchP.join(
                  spark.read.parquet(storePath)
                    .filter(col("conv_day").isin(days.toSeq: _*))
                    .select("pair_key"),
                  Seq("pair_key"), "left_anti")
              } else batchP
            // full count, not isEmpty: limit(1) would leave join-state
            // partitions unprocessed (the same Spark 4 commit validation)
            if (rows.count() > 0)
              rows.hint("rebalance", col("conv_day"))
                .write.mode("append").partitionBy("conv_day").parquet(storePath)
            else batchP.foreach(_ => ()) // drain for the state-store commit
            guard.commit(batchId)
            if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
              graft.warehouse.ParquetWarehouse
                .compactPartitioned(spark, storePath, Seq("conv_day"))
          } finally { batchP.unpersist(); () }
      }
    joined.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Streaming corpus filter: the STATELESS half of the curation pipeline
    * (quality floor + language filter) applied to a document stream. Both
    * scores come from ONE narrow projection
    * ([[graft.llm.TextAnalysis.scoreDocuments]]) — joining the separately
    * derived quality/lang frames would be a stream-stream join, while the
    * row-local composition runs under Structured Streaming unchanged.
    * (Near-dup removal needs cross-document state and stays a batch/compact
    * step — the standard split in streaming ingest pipelines.)
    */
  def curateStream(documents: DataFrame, minQuality: Double = 0.53,
                   lang: Option[String] = Some("en")): DataFrame =
    graft.llm.TextAnalysis.scoreDocuments(documents)
      .filter(col("quality") >= minQuality)
      .filter(lang.map(l => col("predicted_lang") === l).getOrElse(lit(true)))

  /** Streaming JSONL document ingestion: the file-watch form of
    * [[graft.etl.JsonlExtract.readDocuments]] — `readStream` over a landing
    * directory with the SAME explicit schema (no inference pass) and
    * PERMISSIVE corrupt capture, so the three-way extract contract
    * (`normalizeDocuments` ∪ `corruptLines` ∪ `rejectedLines` — all narrow
    * filter/projections) composes onto the stream unchanged, as does
    * [[curateStream]] downstream. Each new file in `dir` becomes
    * micro-batch input; ingestion state is Spark's file-tracking log, no
    * operator state. (A production multi-sink split runs the three outputs
    * via `foreachBatch` on one pass; per-output queries re-read only the
    * source listing.)
    */
  def jsonlDocumentStream(spark: org.apache.spark.sql.SparkSession,
                          dir: String,
                          maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(graft.etl.JsonlExtract.DocumentSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Replay posture of a micro-batch, decided by [[ReplayGuard]]:
    *   - `Skip`:    batchId is at or below the committed high-water mark —
    *                the batch fully committed before a crash; do nothing.
    *   - `Recover`: first delivery since (re)start above the mark — it MAY
    *                be the replay of an attempt that crashed mid-append, so
    *                the appends must run key-idempotent (anti-join).
    *   - `Fresh`:   any later delivery in the same run — foreachBatch
    *                delivers each batchId once per run and the previous run
    *                never started a batch beyond the first uncommitted one,
    *                so the rows are guaranteed unseen: append WITHOUT
    *                scanning the store.
    */
  private[graft] sealed trait Posture
  private[graft] case object Skip extends Posture
  private[graft] case object Recover extends Posture
  private[graft] case object Fresh extends Posture

  /** Committed-batchId high-water mark for a foreachBatch sink — the O(1)
    * replay guard (VERDICT r7 #1). The mark is one tiny file beside the
    * sink, written AFTER the batch's appends with an atomic tmp+move, so:
    *   - steady state costs a single small-file write per micro-batch and
    *     NO scan of the store (the r7 guard anti-joined the store's entire
    *     key column every batch — O(index) forever, on an index that only
    *     grows);
    *   - a replay of a fully-committed batch (crash between the mark write
    *     and Spark's checkpoint commit) is skipped outright;
    *   - only the one batch that can straddle a crash (the first delivery
    *     after a restart, above the mark) pays the defensive anti-join.
    * One writer per sink, which foreachBatch already requires — the mark
    * file is that single writer's private state.
    *
    * The mark is SCOPED to the stream's stable query id (the `id` Spark
    * persists in the checkpoint's `metadata` file — constant across
    * restarts of the same checkpoint, fresh for a new or wiped one).
    * BatchIds only mean anything within one checkpoint lineage: a new
    * checkpoint renumbers from 0, and an unscoped mark would Skip — i.e.
    * silently DROP — every batch up to the old mark. A mark whose query
    * id doesn't match the current checkpoint — or whose batch field is
    * unreadable (a corrupted/hand-edited file, ADVICE r8) — is treated as
    * absent, so the stream falls back to the defensive Recover posture
    * rather than crashing every micro-batch.
    *
    * All mark/lock IO goes through [[graft.warehouse.AtomicPointer]]
    * (Hadoop FileContext), so the guard works on any filesystem with
    * atomic rename (local, HDFS), not just `java.nio` local paths
    * (VERDICT r8 missing #3).
    *
    * WRITER EXCLUSIVITY (VERDICT r8 #6): foreachBatch assumes one writer
    * per sink, and the mark is that writer's private state — two
    * concurrent streams on one sink would silently corrupt it (and race
    * their appends). [[acquireLock]] turns the assumption into a checked
    * one: an atomically-created lease file beside the sink names the
    * owning checkpoint. A second stream with a DIFFERENT checkpoint fails
    * fast while the lease is live; the SAME checkpoint re-acquires freely
    * (a restart of the same lineage IS the same logical writer — its
    * predecessor is necessarily dead, since one checkpoint dir cannot run
    * two live queries). Every commit refreshes the lease's mtime as a
    * heartbeat, so a crashed foreign writer's lease goes stale after
    * `lockTtlMs` (default 30 min) and may be broken — the standard
    * lease-with-TTL compromise on filesystems without locks.
    */
  private[graft] final class ReplayGuard(dir: String, checkpoint: String,
                                         name: String = "_streaming_hwm",
                                         lockTtlMs: Long = 30L * 60 * 1000) {
    import graft.warehouse.AtomicPointer
    private val file = s"$dir/$name"
    private val lockFile = s"$dir/${name}_lock"
    private var firstSinceStart = true

    /** The checkpoint's persisted query id; present by the time the first
      * micro-batch fires (Spark writes it at query start). */
    private def queryId: Option[String] =
      AtomicPointer.read(s"$checkpoint/metadata").flatMap(meta =>
        "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(meta).map(_.group(1)))

    private def committed: Long =
      AtomicPointer.read(file).map(_.trim.split("\\s+") match {
        case Array(qid, b) if queryId.contains(qid) =>
          // a matching-qid mark with a garbled batch field degrades to
          // Recover (-1), never a per-batch crash (ADVICE r8)
          scala.util.Try(b.toLong).getOrElse(-1L)
        case _ => -1L // other lineage (or unreadable) — never suppress
      }).getOrElse(-1L)

    /** Claim this sink for `checkpoint`'s stream, or throw if another live
      * checkpoint holds it. Call BEFORE starting the query.
      */
    def acquireLock(): Unit = {
      val mine = checkpoint
      def tryCreate(): Boolean = AtomicPointer.createExclusive(lockFile, mine)
      if (!tryCreate()) {
        val holder = AtomicPointer.read(lockFile).map(_.trim)
        val fresh = AtomicPointer.mtime(lockFile)
          .exists(System.currentTimeMillis() - _ < lockTtlMs)
        if (holder.contains(mine)) AtomicPointer.write(lockFile, mine) // re-acquire own lease
        else if (fresh) throw new IllegalStateException(
          s"streaming sink $dir is locked by checkpoint ${holder.getOrElse("?")} — " +
            "one writer per sink (start the second stream against its own sink, " +
            s"or wait out the ${lockTtlMs / 60000} min lease TTL if that writer is dead)")
        else { AtomicPointer.delete(lockFile); if (!tryCreate()) acquireLock() } // stale — break it
      }
    }

    def posture(batchId: Long): Posture = {
      val p =
        if (batchId <= committed) Skip
        else if (firstSinceStart) Recover
        else Fresh
      firstSinceStart = false
      p
    }

    /** Record the batch as fully committed (call after all appends), and
      * refresh the writer lease's heartbeat. */
    def commit(batchId: Long): Unit = {
      AtomicPointer.write(file, s"${queryId.getOrElse("unknown")} $batchId")
      AtomicPointer.write(lockFile, checkpoint)
    }
  }

  /** Continuous corpus ingestion with INCREMENTAL NEAR-DUP DEDUP — the
    * end-to-end production shape of a training-data pipeline: each
    * micro-batch of documents (e.g. from [[jsonlDocumentStream]], or
    * [[curateStream]]'s output) is
    *   1. near-dup-filtered AGAINST the persisted corpus index
    *      ([[graft.llm.Dedup.dedupAgainstIndex]] — bucket equi-join against
    *      the store, zero corpus re-shingling per batch);
    *   2. survivors appended to the corpus parquet AND to the index
    *      ([[graft.llm.Dedup.appendToCorpusIndex]]), so batch N+1 dedups
    *      against everything batch N added.
    * Initialize the index once with `Dedup.writeCorpusIndex` (an empty
    * corpus is fine). ALL cross-batch state lives in the persisted index;
    * Spark-side state is only the source's file-tracking log.
    *
    * REPLAY SAFETY (foreachBatch is at-least-once): a [[ReplayGuard]]
    * high-water mark beside the index makes the guard O(1) per micro-batch
    * (VERDICT r7 #1) — a replayed fully-committed batch is skipped; the one
    * batch that can straddle a crash (first delivery after restart) runs
    * the corpus append key-idempotent
    * ([[graft.warehouse.ParquetWarehouse.appendIdempotent]]) and relies on
    * dedupAgainstIndex dropping already-indexed survivors; every later
    * batch appends WITHOUT scanning the corpus (Round8OpsSpec asserts the
    * steady-state append plans no corpus scan). The index's two tables
    * commit ATOMICALLY (one versioned dir + pointer swap,
    * [[graft.llm.Dedup.writeCorpusIndex]]), so the r7 half-indexed-batch
    * window is closed.
    *
    * Within-batch near-dups follow the cross-corpus contract (d08/d09):
    * the batch is assumed pre-deduplicated within itself (compose
    * `Dedup.exact`/`nearDupClusters` upstream if not). Streamed results
    * are row-identical to running the same batches through the batch ops
    * sequentially (StreamingSpec asserts it, including the replay window).
    *
    * `compactEvery` > 0 folds the index's accumulated per-batch version
    * dirs ([[graft.llm.Dedup.compactCorpusIndex]]) every that-many
    * micro-batches — the versioned commit otherwise accrues one small dir
    * per batch forever. Compaction is itself an atomic pointer swap and
    * runs AFTER the batch's high-water mark commits, so a crash mid-fold
    * loses only the fold (retried at the next trigger), never ingest
    * progress or answers.
    */
  def ingestDedupedStream(docs: DataFrame, indexPath: String, corpusPath: String,
                          checkpoint: String, threshold: Double = 0.8,
                          shingleN: Int = 3,
                          compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(indexPath, checkpoint)
    guard.acquireLock() // one writer per sink — checked, not assumed (r8 #6)
    val step: (DataFrame, Long) => Unit = (batch, batchId) => guard.posture(batchId) match {
      case Skip => ()
      case p =>
        // within-batch key hygiene (ADVICE r8): the Fresh fast path appends
        // without any store scan, so an upstream batch violating the
        // unique-doc_id contract would land duplicate keys in the corpus —
        // dedup the batch's own keys here (a shuffle of the BATCH only;
        // cross-batch re-sends remain the documented contract)
        val survivors = graft.llm.Dedup
          .dedupAgainstIndex(batch.dropDuplicates("doc_id"), indexPath, threshold, shingleN)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (survivors.count() > 0) {
            if (p == Recover)
              graft.warehouse.ParquetWarehouse
                .appendIdempotent(survivors, corpusPath, "doc_id")
            else survivors.write.mode("append").parquet(corpusPath)
            graft.llm.Dedup.appendToCorpusIndex(survivors, indexPath, shingleN)
          }
          guard.commit(batchId)
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            graft.llm.Dedup.compactCorpusIndex(batch.sparkSession, indexPath)
        } finally { survivors.unpersist(); () }
    }
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Continuous DSIR-model maintenance: each micro-batch's bucket
    * histogram ([[graft.llm.TextAnalysis.dsirBucketCounts]] — a
    * |buckets|-row frame) appends to the versioned additive
    * [[graft.operators.CountStore]]; the serving model is refit from the
    * store's summed view whenever the caller wants
    * ([[graft.llm.TextAnalysis.dsirModelFromCounts]]), and incremental ≡
    * from-scratch exactly because histograms sum (the x27 def pins it at
    * the hash level). Per-batch work is one narrow scoring-free pass over
    * the batch plus a |buckets|-row write — the raw corpus is never
    * re-read.
    *
    * REPLAY SAFETY: additive state is the one sink where at-least-once
    * delivery is NOT repairable downstream — a double-appended histogram
    * double-counts and no read-side dedup can tell. So beyond the
    * [[ReplayGuard]] high-water mark (O(1) skip of fully-committed
    * replays), each version commits ATOMICALLY with a batch tag, and the
    * one batch that can straddle a crash (the first delivery after
    * restart) is checked against [[graft.operators.CountStore.hasTag]]
    * before appending — already-appended ⇒ only the mark is (re)committed.
    * `compactEvery` > 0 folds the version list every that-many batches,
    * AFTER the mark commits (a crash mid-fold loses only the fold).
    */
  def ingestDsirCountsStream(docs: DataFrame, storePath: String,
                             checkpoint: String, buckets: Int = 1024,
                             compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(storePath, checkpoint)
    guard.acquireLock()
    val step: (DataFrame, Long) => Unit = (batch, batchId) =>
      guard.posture(batchId) match {
        case Skip => ()
        case p =>
          val tag = s"batch-$batchId"
          val alreadyAppended =
            p == Recover && graft.operators.CountStore.hasTag(storePath, tag)
          if (!alreadyAppended)
            graft.operators.CountStore.append(
              graft.llm.TextAnalysis.dsirBucketCounts(batch, buckets),
              storePath, Some(tag))
          guard.commit(batchId)
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            graft.operators.CountStore.compact(batch.sparkSession, storePath)
      }
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Continuous QUANTILE-HISTOGRAM maintenance — the percentile twin of
    * [[ingestDsirCountsStream]] (same additive [[graft.operators
    * .CountStore]] protocol, same replay posture): each micro-batch folds
    * to a |keys|·|cent-buckets| histogram version, and percentile serves
    * ([[graft.operators.QuantileStore.serve]]) read ONLY the merged
    * histogram — the event stream is scanned once at ingest and never
    * again. Replay safety is the additive-state discipline: the
    * [[ReplayGuard]] high-water mark skips fully-committed replays O(1),
    * and the one batch that can straddle a crash is checked against the
    * store's committed batch TAG before appending (a double-appended
    * histogram shifts every percentile and no read-side dedup could
    * tell). `compactEvery` > 0 folds the version list every that-many
    * batches, AFTER the mark commits.
    */
  def ingestQuantilesStream(rows: DataFrame, storePath: String,
                            checkpoint: String, keyCol: String,
                            valueCol: String, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(storePath, checkpoint)
    guard.acquireLock()
    val step: (DataFrame, Long) => Unit = (batch, batchId) =>
      guard.posture(batchId) match {
        case Skip => ()
        case p =>
          val tag = s"batch-$batchId"
          val alreadyAppended =
            p == Recover && graft.operators.CountStore.hasTag(storePath, tag)
          if (!alreadyAppended)
            graft.operators.QuantileStore.append(
              batch, keyCol, valueCol, storePath, Some(tag))
          guard.commit(batchId)
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            graft.operators.CountStore.compact(batch.sparkSession, storePath)
      }
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Continuous inverted-index maintenance — the text-retrieval twin of
    * [[ingestDsirCountsStream]]: each micro-batch's postings land as one
    * bucket-partitioned version of the [[graft.llm.Search]] store, and
    * keyword queries serve from the committed versions (additive tf merge)
    * with NO corpus rescan, seeing each batch as soon as its pointer swap
    * lands. Same replay posture as every additive store: the ReplayGuard
    * high-water mark skips fully-committed replays O(1), and the one batch
    * that can straddle a crash (first delivery after restart) is checked
    * against the store's committed batch TAG before appending — a
    * double-appended posting would double tf and no read-side dedup could
    * tell (both crash windows fault-injected in StreamingSpec).
    */
  def ingestPostingsStream(docs: DataFrame, indexPath: String, checkpoint: String,
                           buckets: Int = graft.llm.Search.DefaultBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(indexPath, checkpoint)
    guard.acquireLock()
    val step: (DataFrame, Long) => Unit = (batch, batchId) =>
      guard.posture(batchId) match {
        case Skip => ()
        case p =>
          val tag = s"batch-$batchId"
          val alreadyAppended =
            p == Recover && graft.llm.Search.hasTag(indexPath, tag)
          if (!alreadyAppended)
            graft.llm.Search.appendToIndex(batch, indexPath, buckets,
              tag = Some(tag))
          guard.commit(batchId)
      }
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Continuous MANIFESTED-TABLE maintenance — the streaming write path of
    * scale layout #6 (t34/t35): each micro-batch appends through
    * [[graft.warehouse.ParquetWarehouse.appendManifested]], so point
    * probes serve each batch the instant its pointer swap lands, planning
    * O(1) files with no listing. Replay posture is the engine-standard
    * protocol, with one structural simplification: the manifest POINTER
    * is itself the atomic commit record, so the batch tag rides the
    * pointer (one rename commits data visibility AND the tag together —
    * no window between them). The crash cases:
    *   - crash before the pointer swap → the batch's files are orphans
    *     (invisible by t35's contract); the replay re-appends fresh files
    *     and commits them — rows exactly once, orphans reclaimed by
    *     [[graft.warehouse.ParquetWarehouse.vacuumManifested]];
    *   - crash between the pointer swap and the high-water-mark commit →
    *     the replayed batch finds its own tag on the pointer and only
    *     re-commits the mark — a blind re-append would double every row
    *     and no read-side dedup could tell.
    * Empty micro-batches commit the mark without minting a manifest
    * version.
    */
  def ingestManifestedStream(rows: DataFrame, storePath: String,
                             keyCol: String, checkpoint: String,
                             files: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(storePath, checkpoint)
    guard.acquireLock()
    val step: (DataFrame, Long) => Unit = (batch, batchId) =>
      guard.posture(batchId) match {
        case Skip => ()
        case p =>
          val tag = s"batch-$batchId"
          val alreadyCommitted = p == Recover &&
            graft.warehouse.ParquetWarehouse.manifestCommitTag(storePath)
              .contains(tag)
          if (!alreadyCommitted && !batch.isEmpty)
            graft.warehouse.ParquetWarehouse.appendManifested(
              batch, storePath, keyCol, files, tag = Some(tag))
          guard.commit(batchId)
      }
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Continuous RANKED-index maintenance — [[ingestPostingsStream]]'s twin
    * for the BM25 store (x48's versioned protocol driven by a stream):
    * each micro-batch of WHOLE documents appends dl-carrying postings plus
    * its exact-integer stats sidecar, and ranked serves
    * ([[graft.llm.Search.searchRankedIndexed]]) see the batch as soon as
    * its pointer swap lands — idf/avgdl move with every commit because the
    * per-version stats merge additively at query time. Same replay posture
    * as the conjunctive maintainer: O(1) mark skip + committed-TAG check
    * on the one straddling batch (a double-append would inflate BOTH tf
    * and the corpus stats — doubly unrepairable downstream).
    */
  def ingestRankedPostingsStream(docs: DataFrame, indexPath: String, checkpoint: String,
                                 buckets: Int = graft.llm.Search.DefaultBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(indexPath, checkpoint)
    guard.acquireLock()
    val step: (DataFrame, Long) => Unit = (batch, batchId) =>
      guard.posture(batchId) match {
        case Skip => ()
        case p =>
          val tag = s"batch-$batchId"
          val alreadyAppended =
            p == Recover && graft.llm.Search.hasTag(indexPath, tag)
          if (!alreadyAppended)
            graft.llm.Search.appendToRankedIndex(batch, indexPath, buckets,
              tag = Some(tag))
          guard.commit(batchId)
      }
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Continuous sketch-materialized-view maintenance — the sketch twin of
    * [[ingestDsirCountsStream]]: each micro-batch of events is sketched
    * per day ([[graft.llm.Events.dailyUserSketches]], |batch days| rows)
    * and appended to the [[graft.operators.SketchStore]]; rolling
    * distinct-user metrics then serve from the store with NO event rescan
    * ([[graft.llm.Events.rollingDistinctUsersFromStore]]) and see each
    * batch's users as soon as it commits. Replay posture: HLL union is
    * idempotent — re-appending a deterministic re-sketch of the SAME rows
    * cannot inflate any estimate (spec-proved) — so unlike the additive
    * count store, correctness does not hinge on the guard; the ReplayGuard
    * + TAG protocol still skips replays to bound version growth and to
    * defend the one real risk, a source whose replayed batch differs from
    * the original delivery. `compactEvery` folds versions so the read-side
    * union stays bounded on a long-lived stream.
    */
  def ingestDailySketchStream(events: DataFrame, storePath: String,
                              checkpoint: String, lgK: Int = 14,
                              compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(storePath, checkpoint)
    guard.acquireLock()
    val step: (DataFrame, Long) => Unit = (batch, batchId) =>
      guard.posture(batchId) match {
        case Skip => ()
        case p =>
          val tag = s"batch-$batchId"
          val alreadyAppended =
            p == Recover && graft.operators.SketchStore.hasTag(storePath, tag)
          if (!alreadyAppended)
            graft.operators.SketchStore.append(
              graft.llm.Events.dailyUserSketches(batch, lgK),
              storePath, Some(tag))
          guard.commit(batchId)
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            graft.operators.SketchStore.compact(batch.sparkSession, storePath)
      }
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Continuous SCD TYPE 2 dimension maintenance from an attribute-update
    * stream: each micro-batch applies [[graft.warehouse.ScdDim.applyBatch]]
    * per effective date (ascending — dims change on human cadence, so a
    * batch carries a handful of dates; the distinct-date collect is
    * date-count-bounded, never row-bounded) against the CURRENT published
    * dim and publishes the result as a new snapshot version.
    *
    * REPLAY SAFETY comes from SCD2's own semantics, no guard needed: a
    * re-delivered batch finds every update attribute-equal to the current
    * version and versions NOTHING (the no-op rule), so at-least-once
    * foreachBatch delivery converges to the exactly-once dim. Batch dates
    * must be non-decreasing across the stream (the SCD2 contract — late
    * retro-dated corrections are a rebuild, not an append).
    *
    * First batch bootstraps the dim: unseen business keys insert as first
    * current rows at their batch date. SINGLE-WRITER contract: the
    * read-apply-publish cycle is not concurrency-safe — exactly one
    * stream owns a dim root (the same contract every snapshot mutator in
    * ParquetWarehouse carries; unlike the guarded ingests there is no
    * lock file here because replays are already harmless).
    */
  def ingestScdDimStream(updates: DataFrame, root: String, checkpoint: String,
                         businessKey: Seq[String], attrs: Seq[String],
                         dateCol: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.warehouse.{ParquetWarehouse, ScdDim}
    val cols = businessKey ++ attrs
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val dates = batch.select(col(dateCol).cast("date").as("d")).distinct()
          .collect().map(_.getDate(0)).sortBy(_.getTime)
        if (dates.nonEmpty) {
          var dim = ParquetWarehouse.currentVersion(root) match {
            case Some(_) => ParquetWarehouse.readTable(spark, root, "dim")
            case None => ScdDim.initial(
              batch.filter(lit(false)).select(cols.map(col): _*),
              lit(dates.head.toString))
          }
          dates.foreach { d =>
            val b = batch
              .filter(col(dateCol).cast("date") === lit(d.toString).cast("date"))
              .select(cols.map(col): _*)
            dim = ScdDim.applyBatch(dim, b, businessKey, attrs, lit(d.toString))
          }
          ParquetWarehouse.publishSnapshot(root,
            Map("dim" -> graft.operators.Materialize.cut(dim)))
        }
        ()
      }
      .start()
  }

  /** Continuous vector-index maintenance: each micro-batch of embeddings is
    * assigned + int8-quantized against the STORED centroids and appended to
    * the cell-partitioned vectors table
    * ([[graft.llm.Similarity.appendToIvfIndex]]) — queries served from the
    * index see new vectors as soon as their batch commits, with the
    * centroid geometry fixed at [[graft.llm.Similarity.writeIvfIndex]]
    * time (initialize the index with a representative first corpus). The
    * per-batch work is the narrow fused build scan plus one by-cell
    * clustering exchange — no corpus re-scan, ever.
    *
    * REPLAY SAFETY (foreachBatch is at-least-once): a [[ReplayGuard]]
    * high-water mark beside the index replaces the r7 per-batch anti-join
    * over the store's ENTIRE vec_id column (O(index) per micro-batch,
    * forever) with an O(1) check — a replayed fully-committed batch is
    * skipped; only the first delivery after a restart (the one batch that
    * can straddle a crash) pays the defensive anti-join; steady-state
    * batches append with NO scan of the vectors table (Round8OpsSpec
    * asserts the plan). A duplicated vector would silently occupy two of
    * the k ranks at query time, hence the recovery guard. Requires
    * corpus-unique vec_ids, the same key contract every dedup-by-id
    * operator in the engine relies on (within-batch duplicates are
    * dropped here — ADVICE r8 — so only cross-batch re-sends can violate
    * it).
    *
    * `compactEvery` > 0 folds each cell directory's accumulated per-batch
    * small files ([[graft.llm.Similarity.compactIvfIndex]]) every
    * that-many micro-batches — without it a long-lived stream accrues
    * `batches × cells` files forever, and at 100 TB the footer/listing
    * overhead comes to dominate the probe-pruned scan that is the whole
    * point of the cell layout (VERDICT r8 #1; the same disease
    * compactEvery cures on the dedup index). Compaction runs AFTER the
    * batch's high-water mark commits, so a crash mid-fold loses only the
    * fold (retried at the next trigger), never ingest progress; served
    * answers are unchanged (per-partition atomic swap, Round9OpsSpec).
    */
  def ingestVectorsStream(embeddings: DataFrame, indexPath: String,
                          checkpoint: String,
                          compactEvery: Int = 0,
                          metaCols: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(indexPath, checkpoint)
    guard.acquireLock() // one writer per sink — checked, not assumed (r8 #6)
    val step: (DataFrame, Long) => Unit = (batch, batchId) => guard.posture(batchId) match {
      case Skip => ()
      case p =>
        val rows = ingestVectorRows(batch.dropDuplicates("vec_id"), indexPath,
          recover = p == Recover)
        // metaCols MUST match the store's build-time set — a maintainer
        // not told about them would strand a null-filled generation that
        // filtered serves silently drop; appendToIvfIndex's column
        // contract fails THIS batch loudly instead (spec-pinned)
        if (!rows.isEmpty)
          graft.llm.Similarity.appendToIvfIndex(rows, indexPath, metaCols = metaCols)
        guard.commit(batchId)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          graft.llm.Similarity.compactIvfIndex(batch.sparkSession, indexPath)
    }
    embeddings.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** [[ingestVectorsStream]] for a persisted MIPS index
    * ([[graft.llm.Similarity.writeMipsIndex]]): identical ReplayGuard
    * protocol and recovery anti-join, with ONE extra contract —
    * [[graft.llm.Similarity.appendToMipsIndex]] verifies each batch's max
    * squared norm against the index's frozen M² anchor and FAILS the
    * query rather than landing a longer vector in the wrong cell
    * geometry. That hard stop is deliberate: the augmentation is only
    * monotone in the inner product below M, so a violating stream must
    * surface (rebuild the index with the new corpus) instead of silently
    * degrading ranking quality forever after.
    */
  def ingestMipsVectorsStream(embeddings: DataFrame, indexPath: String,
                              checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(indexPath, checkpoint)
    guard.acquireLock() // one writer per sink — checked, not assumed
    val step: (DataFrame, Long) => Unit = (batch, batchId) => guard.posture(batchId) match {
      case Skip => ()
      case p =>
        val rows = ingestVectorRows(batch.dropDuplicates("vec_id"), indexPath,
          recover = p == Recover)
        if (!rows.isEmpty) graft.llm.Similarity.appendToMipsIndex(rows, indexPath)
        guard.commit(batchId)
    }
    embeddings.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** Continuous event-log landing into the day-partitioned store (the
    * [[graft.warehouse.ParquetWarehouse.writeEventsPartitioned]] layout,
    * streamed): each micro-batch derives event_date, clusters by it
    * (REBALANCE — hot days split across writers, cold days coalesce) and
    * APPENDS day-partitioned, so batch readers keep listing-time pruning
    * while the stream runs. This is the ingestion path an event log needs
    * at scale: the stream only ever touches the days present in the batch.
    *
    * Replay safety (foreachBatch is at-least-once): the same [[ReplayGuard]]
    * high-water mark as the corpus/vector ingests — steady-state batches
    * append with NO scan of the store; a replayed fully-committed batch is
    * skipped; only the first post-restart delivery pays the defensive
    * event_id anti-join, and that join is PRUNED to the batch's own days
    * (the `event_date IN (...)` partition filter), never the whole log.
    * Within-batch duplicate event_ids are dropped (the engine-wide
    * unique-key contract); `compactEvery` folds accrued per-batch small
    * files through the warehouse's crash-safe per-partition swap, after the
    * mark commits.
    */
  def ingestEventsStream(events: DataFrame, storePath: String, checkpoint: String,
                         compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val guard = new ReplayGuard(storePath, checkpoint)
    guard.acquireLock() // one writer per sink — checked, not assumed
    val step: (DataFrame, Long) => Unit = (batch0, batchId) => guard.posture(batchId) match {
      case Skip => ()
      case p =>
        val batch = batch0.dropDuplicates("event_id")
          .withColumn("event_date", to_date(col("ts")))
        val spark = batch0.sparkSession
        // the guard's lease/hwm files live under storePath, so "dir exists"
        // is not "store has data" — look for partition directories (the
        // first post-start batch is ALWAYS Recover posture)
        val storeHasData = {
          val hp = new org.apache.hadoop.fs.Path(storePath)
          val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.exists(hp) && fs.listStatus(hp).exists(_.getPath.getName.startsWith("event_date="))
        }
        val rows =
          if (p == Recover && storeHasData) {
            // recovery anti-join bounded to the straddling batch's OWN days
            val days = batch.select("event_date").distinct().collect().map(_.getDate(0))
            val stored = spark.read.parquet(storePath)
              .filter(col("event_date").isin(days.toSeq: _*)).select("event_id")
            batch.join(stored, Seq("event_id"), "left_anti")
          } else batch
        if (!rows.isEmpty)
          rows.hint("rebalance", col("event_date"))
            .write.mode("append").partitionBy("event_date").parquet(storePath)
        guard.commit(batchId)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          graft.warehouse.ParquetWarehouse
            .compactPartitioned(spark, storePath, Seq("event_date"))
    }
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(step)
      .start()
  }

  /** The rows a vector-ingest micro-batch appends: the batch itself in
    * steady state (no store scan — the plan Round8OpsSpec pins), or the
    * batch minus already-stored vec_ids for the crash-recovery delivery.
    */
  private[graft] def ingestVectorRows(batch: DataFrame, indexPath: String,
                                      recover: Boolean): DataFrame =
    if (recover)
      batch.join(
        batch.sparkSession.read.parquet(s"$indexPath/vectors").select("vec_id"),
        Seq("vec_id"), "left_anti")
    else batch

  /** Custom keyed state: per-user running (count, decimal-safe total) via
    * mapGroupsWithState — the Structured Streaming escape hatch for
    * aggregations the built-in operators can't express. Emits the updated
    * aggregate for every user touched in each micro-batch.
    */
  def runningUserCounts(events: Dataset[EventRow]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0))
          // cents-exact accumulation (values are 2dp): avoids float drift
          // across micro-batches the same way the batch path sums decimals
          val (n, cents) = rows.foldLeft((prev.n_events, math.round(prev.total_value * 100))) {
            case ((c, s), e) => (c + 1, s + math.round(e.value * 100))
          }
          val next = UserAgg(userId, n, cents / 100.0)
          state.update(next)
          next
      }
  }

  /** Gap-based sessionization as CUSTOM KEYED STATE with EVENT-TIME
    * TIMEOUTS via flatMapGroupsWithState — the session-emission semantics
    * the built-in `session_window` aggregate can't give you: a session row
    * is emitted EXACTLY ONCE, exactly when the watermark proves it closed
    * (either a later event opened the next session, or the event-time
    * timeout fired gap-after its last event). [[sessionWindowStream]] is
    * the built-in twin; this is the escape hatch for when the per-session
    * output needs custom shape or side effects.
    *
    * Semantics contract: events are folded in (ts, event_id) order within
    * each micro-batch; a late event that belongs BEFORE the open session's
    * start (possible inside the watermark horizon) starts/extends sessions
    * as if it were current — exactly-ordered replay is the batch path's
    * job (e02), not a streaming guarantee.
    *
    * Scale shape: state is ONE small case class per ACTIVE user (closed
    * sessions leave the store via the timeout), partitioned by user like
    * any keyed shuffle; emission is append-mode, so downstream sinks never
    * see a session twice.
    */
  def sessionsWithState(events: Dataset[EventRow],
                        gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId,
              new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.last <= gapMs =>
                  Some(SessionAcc(s.start, math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId,
                    new Timestamp(s.start), new Timestamp(s.last), s.n)
                  Some(SessionAcc(t, t, 1))
                case None => Some(SessionAcc(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must sit beyond the current watermark — a
              // session whose last event is already near the horizon
              // closes at the next possible instant instead of erroring
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
