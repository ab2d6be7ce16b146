package graft

import graft.llm.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN quality report (VERDICT r3 #2, r6 #3): measures the approximate tier
  * (s02 LSH, s03 IVF, s05 int8, s06 persisted IVF-int8) against exact
  * ground truth so recall is a graded artifact, not a trusted spec
  * parameter.
  *
  * Reported per index config:
  *   - `recall_at_10`: vs the exact top-10 over the same corpus — the
  *     standard ANN benchmark number;
  *   - `candidate_fraction`: measured |candidate pairs| / |all pairs| — the
  *     cost axis (an index is only "approximate" if this is ≪ 1). Reported
  *     for EVERY config including the persisted s06 index, where it is the
  *     number the cell-partitioned layout exists to minimize;
  *   - `twin_recall_at_1` (uniform geometry): plant a cos≈0.999 twin per
  *     query and require it back at rank 1 — the "is there an actual
  *     near-dup" regime ANN dedup runs in production.
  *
  * TWO GEOMETRIES, measured every round:
  *   - `uniform` (the testdata embeddings): near-uniform directions — exact
  *     top-10 cosines sit at ~60° angles, the ADVERSARIAL regime for
  *     sub-linear search. High recall here requires probing a large
  *     candidate fraction; the bare s02/s03 entries grade the REGISTERED
  *     def configs at that price, and the `*_lowcost` entries keep the
  *     scale-tuned low-fraction point on the curve measured.
  *   - `clustered` (`_clustered` entries): planted deterministic clusters —
  *     the geometry of real embedding corpora, where a document's nearest
  *     neighbors share its semantic cluster. This is the evidence for the
  *     claim the uniform numbers cannot show: on clustered data the
  *     LOW-COST configs reach recall ≥0.9 at a small candidate fraction —
  *     sub-linear AND accurate (VERDICT r6 #3 asks for ≥0.9 at ≤0.15).
  *
  * Usage: runMain graft.Recall <sfDir> [outFile]
  * Prints one JSON line; writes it to outFile when given.
  */
object Recall {

  private val TwinOffset = 10000000L

  /** splitmix-style deterministic unit value in [-0.5, 0.5], keyed by two
    * longs — partition-layout independent (same recipe as the LSH
    * hyperplanes, Similarity.planeComponent).
    */
  private def unit(a: Long, b: Long): Double = {
    var z = a * 0x9E3779B97F4A7C15L + b * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (java.lang.Math.floorMod(z, 1000003L).toDouble / 1000003.0) - 0.5
  }

  /** Deterministic clustered corpus: `k` planted cluster centers (uniform
    * direction per center), each vector = its cluster's center plus
    * per-component noise — the realistic embedding geometry where near
    * neighbors are in-cluster (in-cluster cosine ≈ 0.9, cross-cluster ≈ 0).
    * Everything is a pure function of (vec_id, dim), so the corpus CONTENT
    * is identical across runs and partitionings — and the partition COUNT
    * is pinned (not defaultParallelism) because the downstream k-means fit
    * accumulates float sums per partition: with the layout floating on the
    * session's core count, the fitted centers differed in low bits between
    * 8- and 32-core sessions, flipping a few cluster-boundary vectors
    * between cells and jittering the measured candidate_fraction round-over-
    * round (the r8→r9 RECALL drift — attributed ADVICE r9 #2; the fused
    * ivf_argmax was bit-stable throughout and is not on the training path).
    */
  def clusteredCorpus(spark: SparkSession, n: Long, k: Int = 20,
                      noiseScale: Double = 0.3): DataFrame = {
    import spark.implicits._
    val dim = Similarity.Dim
    spark.range(0L, n, 1L, 32).map { id =>
      val c = id % k
      val emb = Array.tabulate(dim) { d =>
        (unit(1000000L + c, d.toLong) + noiseScale * unit(id, d.toLong)).toFloat
      }
      (id, emb, "c" + c)
    }.toDF("vec_id", "embedding", "label")
  }

  def planted(embeddings: DataFrame): DataFrame = {
    val twins = embeddings.filter(col("vec_id") % 100 === 0).select(
      (col("vec_id") + TwinOffset).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * lit(1.05f)).otherwise(x)).as("embedding"),
      col("label"))
    embeddings.unionByName(twins)
  }

  /** All configs measured over one corpus; entry names get `suffix`.
    * `twins` adds the planted-twin rank-1 probe (uniform geometry only —
    * the twin regime is geometry-independent, so once is enough).
    */
  def measureOn(embs: DataFrame, suffix: String,
                twins: Boolean): Seq[(String, Seq[(String, Double)])] = {
    val spark = embs.sparkSession
    val pred = col("vec_id") % 100 === 0
    val n = embs.count()
    val nQ = embs.filter(pred).count()
    val allPairs = (nQ * (n - 1)).toDouble
    val exact = Similarity.bruteForceTopK(embs, pred, 10).localCheckpoint(true)

    lazy val corpus = planted(embs).localCheckpoint(true)
    val twinPred = pred && col("vec_id") < TwinOffset
    def twinRecall(approx: DataFrame): Double = {
      val top1 = approx.filter(col("rank") === 1)
      val hits = top1.filter(col("neighbor_id") === col("query_id") + TwinOffset).count()
      val total = top1.count()
      if (total == 0) 0.0 else hits.toDouble / total
    }

    def lshEntry(name: String, tables: Int, bits: Int, probeBits: Int = 0) = {
      val (cands, release) = Similarity.lshCandidatePairs(embs, pred, tables, bits, probeBits)
      val frac = try cands.count() / allPairs finally release()
      val recall = Similarity.recallAtK(exact,
        Similarity.lshTopK(embs, pred, 10, tables, bits, probeBits))
      val base = Seq("tables" -> tables.toDouble, "bits" -> bits.toDouble,
        "probe_bits" -> probeBits.toDouble,
        "recall_at_10" -> recall, "candidate_fraction" -> frac)
      (name + suffix) -> (if (twins)
        base :+ ("twin_recall_at_1" -> twinRecall(
          Similarity.lshTopK(corpus, twinPred, 10, tables, bits, probeBits)))
      else base)
    }

    // One centroid frame per (corpus, quantizer), shared by the registered
    // and lowcost entries and the twin probe — the k-means fit in
    // particular is an MLlib training job and must not re-run per entry
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    def memo(df: DataFrame): DataFrame = {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += df; df
    }
    lazy val sampledCents = memo(Similarity.ivfCentroids(embs))
    lazy val kmeansCents = memo(Similarity.ivfCentroidsKMeans(embs))
    lazy val sampledTwinCents = memo(Similarity.ivfCentroids(corpus))
    lazy val kmeansTwinCents = memo(Similarity.ivfCentroidsKMeans(corpus))

    def ivfEntry(name: String, nProbe: Int, cents: => DataFrame,
                 centsTwin: => DataFrame) = {
      val centroids = cents
      val assignedIds = Similarity.ivfAssign(embs, centroids).select("vec_id", "cell")
      val probes = Similarity.ivfProbes(embs, centroids, pred, nProbe)
        .select("query_id", "cell")
      val nCand = probes.join(assignedIds, Seq("cell"))
        .filter(col("query_id") =!= col("vec_id")).count()
      val recall = Similarity.recallAtK(exact,
        Similarity.ivfTopKWith(embs, centroids, pred, 10, nProbe))
      val base = Seq("n_probe" -> nProbe.toDouble,
        "recall_at_10" -> recall, "candidate_fraction" -> nCand / allPairs)
      (name + suffix) -> (if (twins)
        base :+ ("twin_recall_at_1" -> twinRecall(
          Similarity.ivfTopKWith(corpus, centsTwin, twinPred, 10, nProbe)))
      else base)
    }

    // int8-quantized brute force (s05): a compression path, not a pruning
    // one — candidate fraction is 1.0 by construction; the graded number is
    // how much ranking quality the 4× compression costs vs the float
    // ranking (and whether the planted twin still lands at rank 1).
    val quantEntry = {
      val recall = Similarity.recallAtK(exact,
        Similarity.bruteForceTopKQuantized(embs, pred, 10))
      val base = Seq("recall_at_10" -> recall, "candidate_fraction" -> 1.0)
      ("s05_knn_quantized" + suffix) -> (if (twins)
        base :+ ("twin_recall_at_1" -> twinRecall(
          Similarity.bruteForceTopKQuantized(corpus, twinPred, 10)))
      else base)
    }

    // sign-bit binary quantization (s17): the 1-bit end of the compression
    // ladder — candidate fraction 1.0 (the 8-byte-code scan touches every
    // row); the graded number is how much of the float ranking the Hamming
    // shortlist + exact re-rank keeps at 32× compression with zero trained
    // state.
    val binaryEntries = {
      def entry(name: String, shortlist: Int, twinProbe: Boolean) = {
        val recall = Similarity.recallAtK(exact,
          Similarity.knnBinaryReranked(embs, pred, 10, shortlist))
        val base = Seq("shortlist" -> shortlist.toDouble,
          "candidate_fraction" -> 1.0, "recall_at_10" -> recall)
        (name + suffix) -> (if (twins && twinProbe)
          base :+ ("twin_recall_at_1" -> twinRecall(
            Similarity.knnBinaryReranked(corpus, twinPred, 10, shortlist)))
        else base)
      }
      Seq(entry("s17_knn_binary", Similarity.BinaryShortlist, twinProbe = true),
        // the depth axis: 1-bit codes are coarse, so re-rank depth is the
        // knob — the sl200 point shows what doubling the pool buys back
        entry("s17_knn_binary_sl200", 200, twinProbe = false))
    }

    // product quantization (s08): like s05 a compression path (the ADC
    // scan touches every code, candidate fraction 1.0) — the graded
    // numbers are how much ranking quality the 64× compression costs raw
    // (the _adc entry) and how much of it the exact re-rank of the
    // 50-candidate shortlist buys back (the registered config). The
    // shortlist/k ratio bounds re-ranked recall: a true neighbor the ADC
    // ranking pushed below rank 50 is unrecoverable.
    // graded at two points on the compression/recall frontier: the
    // registered m=16 config (64-bit codes, 32× compression) and the
    // harder-compressed m=8 point (32-bit codes, 64×) that shows what the
    // extra 2× of compression costs on each geometry.
    val pqEntries = Seq(
      // the REGISTERED config serves KMEANS-TRAINED codebooks (VERDICT r10
      // #3): fitted entries tile each subspace's marginal where sampled
      // codebooks inherit the corpus's skew — measured r10: 0.96 vs 0.80
      // uniform re-ranked at equal compression
      ("s08_knn_pq", Similarity.PqSubspaces,
        (df: DataFrame) => Similarity.pqCodebooksKMeans(df, Similarity.PqSubspaces), true),
      // sampled-codebook baseline (the registered config through r10),
      // kept graded so the training win stays a measured number
      ("s08_knn_pq_sampled", Similarity.PqSubspaces,
        (df: DataFrame) => Similarity.pqCodebooks(df, Similarity.PqSubspaces), false),
      ("s08_knn_pq_m8", 8, (df: DataFrame) => Similarity.pqCodebooks(df, 8), false)
    ).flatMap { case (name, m, booksFn, twinProbe) =>
      val books = booksFn(embs)
      val adcRecall = Similarity.recallAtK(exact,
        Similarity.pqTopKWith(embs, books, pred, 10))
      val rrRecall = Similarity.recallAtK(exact,
        Similarity.pqTopKRerankedWith(embs, books, pred, 10))
      val base = Seq(
        "m" -> m.toDouble,
        "k_codebook" -> Similarity.PqCodebookSize.toDouble,
        "candidate_fraction" -> 1.0)
      Seq(
        (name + "_adc" + suffix) ->
          (base :+ ("recall_at_10" -> adcRecall)),
        (name + suffix) -> {
          val b = base ++ Seq(
            "shortlist" -> Similarity.PqShortlist.toDouble,
            "recall_at_10" -> rrRecall)
          if (twins && twinProbe)
            b :+ ("twin_recall_at_1" -> twinRecall(
              Similarity.pqTopKRerankedWith(corpus, booksFn(corpus), twinPred, 10)))
          else b
        })
    }

    // ANN MIPS via norm-augmentation (s18): exact ground truth is the
    // INNER-PRODUCT top-10 (s16's ranking, not the cosine `exact` frame —
    // MIPS is a different ordering); the candidate fraction is the probe
    // fan-out measured over the AUGMENTED geometry the operator actually
    // searches (Similarity.mipsAugmented), at the registered and lowcost
    // probe depths.
    val mipsEntries = {
      val exactMips = Similarity.mipsTopK(embs, pred, 10).localCheckpoint(true)
      val aug = Similarity.mipsAugmented(embs)
      val augCents = memo(Similarity.ivfCentroids(aug))
      val augIds = Similarity.ivfAssign(aug, augCents).select("vec_id", "cell")
      val augQ = Similarity.mipsAugmentedQueries(embs, pred)
      def entry(name: String, nProbe: Int) = {
        val probes = Similarity.ivfProbes(augQ, augCents, lit(true), nProbe)
          .select("query_id", "cell")
        val nCand = probes.join(augIds, Seq("cell"))
          .filter(col("query_id") =!= col("vec_id")).count()
        val recall = Similarity.recallAtK(exactMips,
          Similarity.mipsTopKIvf(embs, pred, 10, nProbe))
        (name + suffix) -> Seq(
          "n_probe" -> nProbe.toDouble,
          "recall_at_10" -> recall,
          "candidate_fraction" -> nCand / allPairs)
      }
      val inMem = Seq(entry("s18_knn_mips_ivf", Similarity.IvfProbesRegistered),
        entry("s18_knn_mips_ivf_lowcost", Similarity.IvfProbes))
      // persisted MIPS index (s19): same geometry served from the store —
      // recall additionally pays the int8 rounding of the stored codes
      val idxDir = java.nio.file.Files.createTempDirectory("graft-recall-mips")
      val stored = try {
        Similarity.writeMipsIndex(embs, idxDir.toString)
        val handle = new Similarity.MipsIndexHandle(spark, idxDir.toString)
        val storedIds = spark.read.parquet(s"${idxDir.toString}/vectors")
          .select(col("vec_id"), col("cell").cast("long").as("cell"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          Seq(("s19_knn_mips_indexed", Similarity.IvfProbesRegistered),
            ("s19_knn_mips_indexed_lowcost", Similarity.IvfProbes)).map {
            case (name, nProbe) =>
              val probes = Similarity.ivfProbes(augQ, handle.centroids, lit(true), nProbe)
                .select("query_id", "cell")
              val nCand = probes.join(storedIds, Seq("cell"))
                .filter(col("query_id") =!= col("vec_id")).count()
              val recall = Similarity.recallAtK(exactMips,
                handle.topK(embs.filter(pred), 10, nProbe))
              (name + suffix) -> Seq(
                "n_probe" -> nProbe.toDouble,
                "recall_at_10" -> recall,
                "candidate_fraction" -> nCand / allPairs)
          }
        } finally { storedIds.unpersist(); () }
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      inMem ++ stored
    }

    // metadata-FILTERED ANN (s21): pushed-filter IVF graded against the
    // exact FILTERED truth (s20's ranking) at two probe depths, beside
    // the post-filter foil — the design that filters an unfiltered top-k
    // after ranking and collapses for selective predicates (~1/m of the
    // k survive; the other true filtered neighbors were discarded before
    // the filter ran). Grading both makes the collapse a measured number.
    // The label filter is ~1/10 selective on the uniform corpus (labels
    // uncorrelated with geometry — the adversarial case) and one planted
    // cluster on the clustered corpus (filter ≈ cell, the friendly case).
    val filteredEntries = {
      val filterPred =
        if (embs.schema("label").dataType == org.apache.spark.sql.types.StringType)
          col("label") === "c3" else col("label") === 3
      val exactFiltered = Similarity
        .bruteForceTopKFiltered(embs, pred, filterPred, 10).localCheckpoint(true)
      val nFiltered = embs.filter(filterPred).count()
      val filteredPairs = (nQ * nFiltered).toDouble
      val assignedIds = Similarity.ivfAssign(embs.filter(filterPred), sampledCents)
        .select("vec_id", "cell")
      def entry(name: String, nProbe: Int) = {
        val probes = Similarity.ivfProbes(embs, sampledCents, pred, nProbe)
          .select("query_id", "cell")
        val nCand = probes.join(assignedIds, Seq("cell"))
          .filter(col("query_id") =!= col("vec_id")).count()
        val recall = Similarity.recallAtK(exactFiltered,
          Similarity.ivfTopKFilteredWith(embs, sampledCents, pred, filterPred, 10, nProbe))
        (name + suffix) -> Seq(
          "n_probe" -> nProbe.toDouble,
          "recall_at_10" -> recall,
          // vs ALL pairs (comparable to every other entry) and vs the
          // filtered-exact scan (the honest speedup over the s20 baseline)
          "candidate_fraction" -> nCand / allPairs,
          "filtered_fraction" -> (if (filteredPairs == 0) 0.0 else nCand / filteredPairs))
      }
      // the stored form (s22): label landed beside the int8 codes at
      // build time, predicate pushed into the cell-pruned parquet scan at
      // serve time — recall additionally pays the int8 rounding (like s06
      // vs s03)
      val storedEntry = {
        val idxDir = java.nio.file.Files.createTempDirectory("graft-recall-filt")
        try {
          Similarity.writeIvfIndex(embs, idxDir.toString, metaCols = Seq("label"))
          val approx = Similarity.ivfTopKQuantizedFromIndex(
            embs.filter(pred), idxDir.toString, 10,
            Similarity.IvfProbesRegistered, filter = Some(filterPred))
          ("s22_knn_filtered_indexed" + suffix) -> Seq(
            "n_probe" -> Similarity.IvfProbesRegistered.toDouble,
            "recall_at_10" -> Similarity.recallAtK(exactFiltered, approx))
        } finally {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
      // the ADAPTIVE serve (VERDICT r13 #4): probe depth widens per query
      // until the filtered candidate mass clears the floor — graded at the
      // LOWCOST probe floor, where the fixed-depth serve collapses on
      // filter-disjoint geometry; candidate fractions keep it honest (the
      // cost must stay well under the exact filtered scan)
      def adaptiveEntry(minCand: Int) = {
        val probes = Similarity.ivfFilteredAdaptiveProbes(embs, sampledCents,
          pred, filterPred, Similarity.IvfProbes, minCandidates = minCand)
          .select("query_id", "cell")
        val nCand = probes.join(assignedIds, Seq("cell"))
          .filter(col("query_id") =!= col("vec_id")).count()
        val recall = Similarity.recallAtK(exactFiltered,
          Similarity.ivfTopKFilteredAdaptiveWith(embs, sampledCents, pred,
            filterPred, 10, Similarity.IvfProbes, minCandidates = minCand))
        (s"s21_knn_filtered_adaptive_c$minCand" + suffix) -> Seq(
          "n_probe_floor" -> Similarity.IvfProbes.toDouble,
          "min_candidates" -> minCand.toDouble,
          "recall_at_10" -> recall,
          // the floor is an ABSOLUTE candidate budget: at these test SFs
          // the filtered corpora are 50–200 rows so filtered_fraction is
          // floor-dominated (≈ minCand/|filtered|); at scale it → 0 while
          // the fixed-depth serve's recall collapse is scale-independent
          "candidate_fraction" -> nCand / allPairs,
          "filtered_fraction" -> (if (filteredPairs == 0) 0.0 else nCand / filteredPairs))
      }
      Seq(
        entry("s21_knn_filtered_ivf", Similarity.IvfProbesRegistered),
        entry("s21_knn_filtered_ivf_lowcost", Similarity.IvfProbes),
        adaptiveEntry(80),
        adaptiveEntry(32),
        storedEntry,
        ("s21_knn_filtered_postfoil" + suffix) -> {
          val foil = Similarity.ivfTopKPostFiltered(
            embs, pred, filterPred, 10, Similarity.IvfProbesRegistered)
          Seq(
            "n_probe" -> Similarity.IvfProbesRegistered.toDouble,
            "recall_at_10" -> Similarity.recallAtK(exactFiltered, foil),
            // survivors per query out of k=10 — the collapse's other face
            "returned_per_query" ->
              (if (nQ == 0) 0.0 else foil.count().toDouble / nQ))
        })
    }

    // PCA-reduced shortlist + exact re-rank (s13): like PQ a compression
    // path (full candidate fraction, 4× fewer bytes per scanned row at
    // 64→16) — the graded number is how much ranking quality the float
    // projection keeps vs PQ's 4-bit codes at similar scan cost.
    // graded at two points on the dims/recall frontier: PCA's win is
    // SPECTRAL — on the clustered geometry 16 dims are perfect, on the
    // isotropic uniform geometry (no decay to exploit) recall tracks the
    // kept-variance fraction, so the 32-dim point shows the price curve
    def pcaEntry(dims: Int, name: String) = (name + suffix) -> {
      val recall = Similarity.recallAtK(exact,
        Similarity.pcaTopKReranked(embs, pred, 10, pcaDims = dims))
      Seq(
        "pca_dims" -> dims.toDouble,
        "shortlist" -> Similarity.PqShortlist.toDouble,
        "candidate_fraction" -> 1.0,
        "recall_at_10" -> recall)
    }
    val pcaEntries = Seq(
      pcaEntry(16, "s13_knn_pca"), pcaEntry(32, "s13_knn_pca_d32"))

    // IVF-ADC (s09): the candidate fraction is the probe fan-out (the s03
    // machinery) while the scanned bytes per candidate are the PQ codes —
    // recall is bounded by BOTH the probe coverage and the shortlist, so
    // the graded number shows what the multiplied cost cuts actually keep.
    val ivfPqEntries = {
      val sampledBooks = Similarity.pqCodebooks(embs, Similarity.PqSubspaces)
      val trainedBooks = Similarity.pqCodebooksKMeans(embs, Similarity.PqSubspaces)
      val assignedIds = Similarity.ivfAssign(embs, sampledCents)
        .select("vec_id", "cell")
      Seq(
        // trained-book variants isolate the PQ-training effect at fixed
        // cells (VERDICT r10 #3: "s09/s10 if the win carries")
        ("s09_knn_ivfpq", Similarity.IvfProbesRegistered, trainedBooks),
        ("s09_knn_ivfpq_sampled", Similarity.IvfProbesRegistered, sampledBooks),
        ("s09_knn_ivfpq_lowcost", Similarity.IvfProbes, trainedBooks)
      ).map { case (name, nProbe, books) =>
        val probes = Similarity.ivfProbes(embs, sampledCents, pred, nProbe)
          .select("query_id", "cell")
        val nCand = probes.join(assignedIds, Seq("cell"))
          .filter(col("query_id") =!= col("vec_id")).count()
        val recall = Similarity.recallAtK(exact,
          Similarity.ivfPqTopKWith(embs, sampledCents, books, pred, 10, nProbe))
        (name + suffix) -> Seq(
          "n_probe" -> nProbe.toDouble,
          "m" -> Similarity.PqSubspaces.toDouble,
          "shortlist" -> Similarity.PqShortlist.toDouble,
          "recall_at_10" -> recall,
          "candidate_fraction" -> nCand / allPairs)
      }
    }

    // persisted IVF-int8 index (s06): coarse recall bounded by the probe
    // fan-out (like s03) ON TOP of int8 fine ranking (like s05), served
    // from the cell-partitioned store. One index build per geometry; each
    // probe config reports recall AND the measured candidate fraction —
    // the number the partition-pruned layout exists to minimize.
    def ivfIndexEntries(configs: Seq[(String, Int)]) = {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-recall-ivfq")
      val idx = idxDir.toString
      try {
        Similarity.writeIvfIndex(embs, idx)
        // persisted (with a release below), not localCheckpointed: the r7
        // form left the checkpoint RDD cached until driver GC (ADVICE r7)
        val storedIds = spark.read.parquet(s"$idx/vectors")
          .select(col("vec_id"), col("cell").cast("long").as("cell"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val handle = new Similarity.IvfIndexHandle(spark, idx)
        try {
          configs.map { case (name, nProbe) =>
            val probes = Similarity.ivfProbes(embs, handle.centroids, pred, nProbe)
              .select("query_id", "cell")
            val nCand = probes.join(storedIds, Seq("cell"))
              .filter(col("query_id") =!= col("vec_id")).count()
            val approx = handle.topK(embs.filter(pred), 10, nProbe)
            (name + suffix) -> Seq("n_probe" -> nProbe.toDouble,
              "recall_at_10" -> Similarity.recallAtK(exact, approx),
              "candidate_fraction" -> nCand / allPairs)
          }
        } finally { storedIds.unpersist(); () }
      } finally {
        // the index is a full quantized copy of the corpus — don't leave
        // one under /tmp per geometry per round (ADVICE r7)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }

    // entry names ending in _lowcost are the scale-posture defaults (tiny
    // candidate fraction); the bare s02/s03/s06 entries measure the
    // REGISTERED def configs.
    Seq(
      lshEntry("s02_knn_lsh",
        Similarity.LshTablesRegistered, Similarity.LshBitsRegistered),
      lshEntry("s02_knn_lsh_lowcost", Similarity.LshTables, Similarity.LshBits),
      // multi-probe (VERDICT r7 #6): 1-bit-flip probing over wider codes.
      // The first entry is the uniform-regime point hitting recall ≥0.9 at
      // candidate fraction ≤0.3 (the registered exact-probe config pays
      // 0.545 for 0.94; the probe trades 4× more — narrow, codegen'd —
      // bucket projections for ~45% less candidate volume, the axis that
      // is the actual scan/shuffle cost at scale). The _lowcost entry is
      // the scale posture — on the clustered geometry it holds recall
      // ≥0.9 at 1/4 the lowcost exact config's TABLES and a lower
      // fraction (2 tables vs 8). Full measured frontier: SURVEY §8.
      lshEntry("s02_knn_lsh_multiprobe", 96, 12, probeBits = 12),
      lshEntry("s02_knn_lsh_multiprobe_lowcost", 2, 12, probeBits = 12),
      ivfEntry("s03_knn_ivf", Similarity.IvfProbesRegistered,
        sampledCents, sampledTwinCents),
      ivfEntry("s03_knn_ivf_lowcost", Similarity.IvfProbes,
        sampledCents, sampledTwinCents),
      // trained quantizer (VERDICT r7 #5): k-means cells tile the data, so
      // equal recall should cost a smaller candidate fraction where the
      // sampled quantizer inherits the corpus's skew
      ivfEntry("s03_knn_ivf_kmeans", Similarity.IvfProbesRegistered,
        kmeansCents, kmeansTwinCents),
      ivfEntry("s03_knn_ivf_kmeans_lowcost", Similarity.IvfProbes,
        kmeansCents, kmeansTwinCents),
      quantEntry) ++ binaryEntries ++ mipsEntries ++ filteredEntries ++ pcaEntries ++ pqEntries ++ ivfPqEntries ++ {
      val entries = ivfIndexEntries(Seq(
        "s06_knn_ivf_quantized_indexed" -> Similarity.IvfProbesRegistered,
        "s06_knn_ivf_quantized_indexed_lowcost" -> Similarity.IvfProbes))
      cached.foreach(_.unpersist())
      entries
    }
  }

  def measure(spark: SparkSession, sfDir: String): Seq[(String, Seq[(String, Double)])] = {
    val uniform = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRows = uniform.count()
    val clustered = clusteredCorpus(spark, nRows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try
      measureOn(uniform, "", twins = true) ++
        measureOn(clustered, "_clustered", twins = false)
    finally { uniform.unpersist(); clustered.unpersist(); () }
  }

  def toJson(m: Seq[(String, Seq[(String, Double)])]): String =
    m.map { case (k, v) =>
      "\"" + k + "\":" + v
        .map { case (mk, mv) => "\"" + mk + "\":" + f"$mv%.4f" }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.getOrCreate()
    val json = toJson(measure(spark, sfDir))
    println(json)
    if (args.length > 1)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), json + "\n")
    spark.stop()
  }
}
