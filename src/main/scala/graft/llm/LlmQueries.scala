package graft.llm

import graft.{QueryDef, Tables}
import graft.functions.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline QueryDefs: deduplication (d*), similarity search (s*),
  * text analysis (x*), event windows/sessions (e*). Oracled wherever DuckDB
  * can recompute the exact semantics; LSH-approximate variants (d03, s02)
  * are rows-only and verified by recall tests instead.
  */
object LlmQueries {

  private def q(name: String, oracle: Option[String], headline: Boolean = false)(
      f: Tables => DataFrame): QueryDef =
    QueryDef(name, (s: SparkSession, dir: String) => {
      // tolerate an events.parquet written as TIMESTAMP(NANOS): read as long,
      // Tables.microsTs converts (works under any driver-created session).
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      f(Tables(s, dir))
    }, oracle, headline)

  /** events with `ts` normalized to a microsecond timestamp whatever the
    * provider's parquet writer emitted (timestamp[us], TIMESTAMP(NANOS)-as-
    * long, or ntz) — see [[Tables.microsTs]].
    */
  private def eventsTs(t: Tables): DataFrame = Tables.microsTs(t.events, "ts")

  // ------------------------------------------------------------------ dedup

  // d01 — exact dedup via hash-groupBy (shuffles fingerprints, never text).
  private val d01 = q("d01_dedup_exact", Some(
    s"""SELECT min(doc_id) AS rep_id, fp AS fingerprint, CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM (SELECT doc_id, md5(${TextFns.sqlNormalized("text")}) AS fp FROM documents) z
        GROUP BY fp ORDER BY rep_id""")) { t =>
    Dedup.exact(t.documents).orderBy("rep_id")
  }

  // d02 — MinHash-LSH near-dup pairs, exact-Jaccard-verified at ≥0.8. The
  // oracle computes ALL qualifying pairs by sparse shingle equi-join (never
  // all-pairs), so a hash match proves the banded LSH missed nothing.
  private val d02 = q("d02_neardup_minhash", Some(
    s"""WITH sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT doc_a, doc_b,
                 CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
          FROM inter
          JOIN counts ca ON doc_a = ca.doc_id
          JOIN counts cb ON doc_b = cb.doc_id)
        SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8
        ORDER BY doc_a, doc_b"""), headline = true) { t =>
    Dedup.nearDupPairs(t.documents, threshold = 0.8).orderBy("doc_a", "doc_b")
  }

  // d03 — SimHash fingerprints, ORACLE-EXACT (VERDICT r13 #3): the base
  // hash is the engine-portable double poly fold (SimhashFns.tokenHash),
  // so DuckDB replays token hash → 64 ±1-vote tallies → sign-threshold
  // assembly bit-for-bit; a single flipped fingerprint bit hash-fails.
  private val d03 = q("d03_simhash", Some(
    s"""WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
          FROM documents)
        SELECT doc_id, simhash
        FROM (${graft.functions.SimhashFns.sqlSimhashFromTokens(
            "doc_id", "tok", "SELECT doc_id, tok FROM tok")}) fp
        ORDER BY doc_id""")) { t =>
    Dedup.simhash(t.documents).orderBy("doc_id")
  }

  // d10 — per-document boilerplate fraction (shingle doc-frequency ≥ 3 =
  // corpus boilerplate; the CCNet/RefinedWeb line-dedup signal at shingle
  // granularity). The oracle recomputes the full explode → doc-frequency →
  // back-join → ratio chain in DuckDB, so the fraction is hash-exact.
  private val d10 = q("d10_boilerplate_profile", Some(
    s"""WITH sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS n_docs FROM sh GROUP BY 1)
        SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN df.n_docs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
               CAST(SUM(CASE WHEN df.n_docs >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS boiler_ratio
        FROM sh s JOIN df USING (shingle)
        GROUP BY 1 ORDER BY doc_id""")) { t =>
    Dedup.boilerplateProfile(t.documents, minDocs = 3).orderBy("doc_id")
  }

  // d04 — embedding-cosine near-dup, metadata-blocked exact (block = label;
  // pairs within a block only — one shuffle by block, no corpus all-pairs).
  // Threshold 0.45 sits under this data's max pairwise cosine (~0.51) so
  // the output is non-trivial; cosines are strict left-to-right double
  // sums, bit-identical to DuckDB's list_dot_product.
  private val d04 = q("d04_embedding_neardup", Some(
    """SELECT a.label AS blk, a.vec_id AS vec_a, b.vec_id AS vec_b,
              list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
              (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
               sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos
       FROM embeddings a JOIN embeddings b
         ON a.label = b.label AND a.vec_id < b.vec_id
       WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
             (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.45
       ORDER BY vec_a, vec_b""")) { t =>
    Similarity.blockedNearDupPairs(t.embeddings, threshold = 0.45)
      .orderBy("vec_a", "vec_b")
  }

  // d05 — near-dup CLUSTERS: connected components over the verified pair
  // set (label propagation in Spark; recursive CTE in the oracle — tiny
  // components, so both converge immediately).
  private val d05 = q("d05_neardup_clusters", Some(
    s"""WITH RECURSIVE sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        qual AS (
          SELECT doc_a, doc_b FROM inter
          JOIN counts ca ON doc_a = ca.doc_id
          JOIN counts cb ON doc_b = cb.doc_id
          WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.8),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM qual
                  UNION SELECT doc_b, doc_a FROM qual),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        nodes AS (SELECT DISTINCT a FROM edges)
        SELECT n.a AS doc_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
        FROM nodes n LEFT JOIN reach r ON r.a = n.a
        GROUP BY n.a ORDER BY doc_id""")) { t =>
    Dedup.nearDupClusters(t.documents, threshold = 0.8)
  }

  // d12 — SemDeDup-style semantic dedup: one row per corpus VECTOR with its
  // cluster representative and a kept flag (min vec_id survives each
  // cosine-connected group within a block; singletons keep themselves).
  // The oracle recomputes the d04 pair formulation, the d05 recursive
  // closure, and the final membership join — so the kept/pruned decision
  // for every vector is hash-checked end to end.
  private val d12 = q("d12_semantic_dedup", Some(
    """WITH RECURSIVE pairs AS (
         SELECT a.vec_id AS va, b.vec_id AS vb
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.45),
       edges AS (SELECT va AS a, vb AS b FROM pairs UNION SELECT vb, va FROM pairs),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       nodes AS (SELECT DISTINCT a FROM edges),
       rep AS (
         SELECT n.a AS vec_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
         FROM nodes n LEFT JOIN reach r ON r.a = n.a GROUP BY n.a)
       SELECT e.vec_id, COALESCE(p.rep, e.vec_id) AS rep_id,
              CAST(CASE WHEN COALESCE(p.rep, e.vec_id) = e.vec_id THEN 1 ELSE 0 END AS BIGINT) AS kept
       FROM embeddings e LEFT JOIN rep p USING (vec_id)
       ORDER BY vec_id""")) { t =>
    Similarity.semanticDedup(t.embeddings, threshold = 0.45).orderBy("vec_id")
  }

  // d11 — EXACT sparse-Jaccard pair join (the recall-1.0 gold path): the
  // same inverted-index computation the d02 oracle runs in DuckDB,
  // expressed as a Spark plan. Registered alongside the LSH def so the
  // correctness artifact itself documents that the exact and probabilistic
  // paths agree on this corpus (both hash against the same oracle answer).
  private val d11 = q("d11_jaccard_pairs_exact", Some(
    s"""WITH sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT doc_a, doc_b,
                 CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
          FROM inter
          JOIN counts ca ON doc_a = ca.doc_id
          JOIN counts cb ON doc_b = cb.doc_id)
        SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8
        ORDER BY doc_a, doc_b""")) { t =>
    Dedup.exactJaccardPairs(t.documents, threshold = 0.8).orderBy("doc_a", "doc_b")
  }

  // d07 — MULTI-SIGNAL near-dup clusters: edges = text near-dups (j ≥ 0.8)
  // ∪ embedding near-dups (cos ≥ 0.45, blocked) over the shared doc/vec id
  // namespace; connected components over the union. The oracle recomputes
  // both signals (the d02 and d04 formulations verbatim) and the recursive
  // closure of their union.
  private val d07 = q("d07_multisignal_clusters", Some(
    s"""WITH RECURSIVE sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        qt AS (
          SELECT doc_a, doc_b FROM inter
          JOIN counts ca ON doc_a = ca.doc_id
          JOIN counts cb ON doc_b = cb.doc_id
          WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.8),
        qe AS (
          SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
                (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                 sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.45),
        qual AS (SELECT doc_a, doc_b FROM qt UNION SELECT doc_a, doc_b FROM qe),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM qual
                  UNION SELECT doc_b, doc_a FROM qual),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        nodes AS (SELECT DISTINCT a FROM edges)
        SELECT n.a AS doc_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
        FROM nodes n LEFT JOIN reach r ON r.a = n.a
        GROUP BY n.a ORDER BY doc_id""")) { t =>
    Dedup.multiSignalClusters(t.documents, t.embeddings)
  }

  // ------------------------------------------------------------- similarity

  // s01 — exact brute-force top-10 cosine for the query subset
  // (vec_id % 100 = 0). Cosines hash-compare as raw doubles: both engines
  // sum strictly left-to-right in double (verified bit-identical).
  private val s01 = q("s01_knn_bruteforce", Some(
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                  FROM embeddings WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        p AS (SELECT query_id, neighbor_id,
                     list_dot_product(qe, ce) /
                     (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
              FROM q, c WHERE query_id <> neighbor_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank"""), headline = true) { t =>
    Similarity.bruteForceTopK(t.embeddings, col("vec_id") % 100 === 0, k = 10)
      .orderBy("query_id", "rank")
  }

  // s11 — contrastive triplet mining (positives = top-3 exact cosine,
  // hard negatives = ranks 40-44): the embedding-training data-prep
  // recipe, one ranking pass + rank filter. Oracle = s01's exact ranking
  // with the same rank windows and label tag.
  private val s11 = q("s11_contrastive_triplets", Some(
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                  FROM embeddings WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        p AS (SELECT query_id, neighbor_id,
                     list_dot_product(qe, ce) /
                     (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
              FROM q, c WHERE query_id <> neighbor_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos,
               CASE WHEN rank <= 3 THEN 'positive' ELSE 'hard_negative' END AS label
        FROM r WHERE rank <= 3 OR rank BETWEEN 40 AND 44
        ORDER BY query_id, rank""")) { t =>
    Similarity.contrastiveTriplets(t.embeddings, col("vec_id") % 100 === 0,
      nPos = 3, hardFrom = 40, nNeg = 5)
      .orderBy("query_id", "rank")
  }

  // s12 — exact cosine RANGE search (radius ≥ 0.3 for the query subset):
  // the similarity-bounded complement of s01's count-bounded top-k. The
  // cosine is the same left-to-right double fold in both engines, so the
  // threshold boundary is exact.
  private val s12 = q("s12_range_search", Some(
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                  FROM embeddings WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        p AS (SELECT query_id, neighbor_id,
                     list_dot_product(qe, ce) /
                     (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
              FROM q, c WHERE query_id <> neighbor_id)
        SELECT query_id, neighbor_id, cos FROM p WHERE cos >= 0.3
        ORDER BY query_id, neighbor_id""")) { t =>
    Similarity.rangeSearch(t.embeddings, col("vec_id") % 100 === 0, threshold = 0.3)
      .orderBy("query_id", "neighbor_id")
  }

  // s02 — hyperplane-LSH bucketed ANN, THROUGH the hash gate (VERDICT r14
  // #4): the plane family is deterministic, so the oracle rebuilds it from
  // the inlined integer residues (LshFns.planeM — component =
  // m/1000003 − 0.5, the same IEEE double ops in both engines), recomputes
  // every bucket code with the identical left-to-right dot, replays the
  // same-bucket candidate join and the exact cosine re-rank. "Approximate"
  // here means approximate W.R.T. exact knn — the LSH computation itself
  // is deterministic and now exactly gated; recall vs s01 stays graded in
  // RECALL. Registered at the HIGH-RECALL config (48 tables × 6 bits —
  // recall@10 ≈ 0.93 on the near-uniform synthetic corpus, vs 0.105 at
  // the 8×8 low-cost default): a gate def should return defensible
  // neighbors. Degenerate embeddings (wrong length / null element) code
  // to all-zero buckets in the Spark expression; the corpus tables carry
  // none, so the oracle skips that branch.
  private def lshPlaneValues(nTables: Int, nBits: Int): String =
    (0 until nTables * nBits).map { p =>
      val ms = (0 until Similarity.Dim)
        .map(d => graft.functions.LshFns.planeM(p, d)).mkString("[", ",", "]")
      s"(${p / nBits},${p % nBits},$ms)"
    }.mkString(",")

  private val s02 = q("s02_knn_lsh", Some(
    s"""WITH planes AS (
          SELECT tbl, bit, list_transform(ms, m -> CAST(m AS DOUBLE)/1000003.0 - 0.5) AS pv
          FROM (VALUES ${lshPlaneValues(Similarity.LshTablesRegistered, Similarity.LshBitsRegistered)})
               AS t(tbl, bit, ms)),
        e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        codes AS MATERIALIZED (
          SELECT e.vec_id, p.tbl,
                 SUM(CASE WHEN list_dot_product(e.emb, p.pv) >= 0 THEN 1 << p.bit ELSE 0 END) AS bucket
          FROM e, planes p GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT qc.vec_id AS query_id, cc.vec_id AS neighbor_id
          FROM codes qc JOIN codes cc ON qc.tbl = cc.tbl AND qc.bucket = cc.bucket
          WHERE qc.vec_id % 100 = 0 AND qc.vec_id <> cc.vec_id),
        p AS (SELECT c.query_id, c.neighbor_id,
                     list_dot_product(qe.emb, ce.emb) /
                     (sqrt(list_dot_product(qe.emb, qe.emb)) * sqrt(list_dot_product(ce.emb, ce.emb))) AS cos
              FROM cand c JOIN e qe ON c.query_id = qe.vec_id
                          JOIN e ce ON c.neighbor_id = ce.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.lshTopK(t.embeddings, col("vec_id") % 100 === 0, k = 10,
      nTables = Similarity.LshTablesRegistered, nBits = Similarity.LshBitsRegistered)
      .orderBy("query_id", "rank")
  }

  // s03 — IVF bucketed ANN (cell-probe scale path), THROUGH the hash gate
  // (VERDICT r14 #5): the seeded-sample quantizer is now the
  // engine-portable affine scramble (Similarity.sampleHashSql — the d24
  // recipe), so the oracle replays centroid SELECTION, every cell
  // assignment (argmax cosine, ties to the smaller cell), the per-query
  // probe ranking, and the exact cosine top-k over probed cells.
  // Registered at nProbe=24 of 32 cells (recall@10 ≈ 0.97 vs 0.36 at the
  // 4-probe default); recall vs s01 stays graded in RECALL.
  private val s03 = q("s03_knn_ivf", Some(
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        cent AS MATERIALIZED (
          SELECT vec_id AS cell, emb AS c_emb FROM e
          ORDER BY ${Similarity.sampleHashSql("vec_id")}, vec_id
          LIMIT ${Similarity.IvfCells}),
        ac AS MATERIALIZED (
          SELECT e.vec_id, c.cell,
                 list_dot_product(e.emb, c.c_emb) /
                 (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) AS score
          FROM e, cent c),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac) z WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac WHERE vec_id % 100 = 0) z
          WHERE rn <= ${Similarity.IvfProbesRegistered}),
        p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
                     list_dot_product(qe.emb, ce.emb) /
                     (sqrt(list_dot_product(qe.emb, qe.emb)) * sqrt(list_dot_product(ce.emb, ce.emb))) AS cos
              FROM probes pr
              JOIN assign a ON pr.cell = a.cell AND pr.query_id <> a.vec_id
              JOIN e qe ON qe.vec_id = pr.query_id
              JOIN e ce ON ce.vec_id = a.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.ivfTopK(t.embeddings, col("vec_id") % 100 === 0, k = 10,
      nProbe = Similarity.IvfProbesRegistered)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------- text analysis

  private val x01 = q("x01_token_stats", Some(
    """SELECT doc_id,
        CAST(tl AS INT) AS n_chars,
        CAST(len(w) AS INT) AS n_tokens,
        CAST(len(list_distinct(w)) AS INT) AS n_distinct_tokens,
        CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS sum_token_len,
        CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_token_len,
        CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS type_token_ratio
        FROM (SELECT doc_id, len(text) AS tl, string_split_regex(lower(text), '\s+') AS w
              FROM documents) z
        ORDER BY doc_id""")) { t =>
    TextAnalysis.tokenStats(t.documents).orderBy("doc_id")
  }

  private val langHitsSql = TextAnalysis.Lexicons.map { case (lang, words) =>
    val lst = words.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(w, x -> x IN ($lst))) AS INT) AS ${lang}_hits"
  }.mkString(",\n        ")

  private val x02 = q("x02_lang_id", Some(
    s"""SELECT doc_id, $langHitsSql,
        CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
             WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
             WHEN de_hits >= fr_hits THEN 'de'
             ELSE 'fr' END AS predicted_lang
        FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents) z
        ORDER BY doc_id""")) { t =>
    TextAnalysis.langId(t.documents).orderBy("doc_id")
  }

  private val x03 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    q("x03_quality_score", Some(
      s"""WITH base AS (
            SELECT doc_id, len(text) AS n_chars,
                   string_split_regex(lower(text), '\\s+') AS w
            FROM documents),
          m AS (
            SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
                   CAST(len(w) AS INT) AS n_tokens,
                   CAST(len(list_distinct(w)) AS INT) AS n_distinct,
                   CAST(len(list_filter(w, x -> x IN ($enStops))) AS INT) AS n_stop,
                   CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS INT) AS n_shingles
            FROM base),
          s AS (
            SELECT *,
                   least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score,
                   CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS diversity,
                   CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
                   CASE WHEN n_tokens > 2
                        THEN CAST(n_shingles AS DOUBLE) / CAST(n_tokens - 2 AS DOUBLE)
                        ELSE 0.0 END AS uniq3
            FROM m)
          SELECT doc_id, n_chars, n_tokens, n_distinct, n_stop, n_shingles,
                 len_score, diversity, stop_ratio, uniq3,
                 (len_score + diversity + stop_ratio + uniq3) / 4.0 AS quality
          FROM s ORDER BY doc_id""")) { t =>
      TextAnalysis.qualityScore(t.documents).orderBy("doc_id")
    }
  }

  private val x04 = q("x04_fingerprints", Some(
    s"""SELECT doc_id, md5(n) AS fingerprint, CAST(len(n) AS INT) AS norm_len
        FROM (SELECT doc_id, ${TextFns.sqlNormalized("text")} AS n FROM documents) z
        ORDER BY doc_id""")) { t =>
    TextAnalysis.fingerprints(t.documents).orderBy("doc_id")
  }

  // x05 — corpus-level top-20 token bigrams (distinct per doc, so the count
  // is documents-containing, not raw occurrences).
  private val x05 = q("x05_top_bigrams", Some(
    s"""SELECT shingle AS ngram, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (${TextFns.sqlShingleRows("doc_id", "text", "documents", n = 2)}) z
        GROUP BY shingle ORDER BY n_docs DESC, ngram LIMIT 20""")) { t =>
    TextAnalysis.topNgrams(t.documents, n = 2, k = 20)
  }

  // x06 — whitespace vs BPE-ish-regex token counts per document.
  private val x06 = {
    val pat = TextAnalysis.BpePattern.replace("'", "''")
    q("x06_token_counts", Some(
      s"""SELECT doc_id,
          CAST(len(string_split_regex(lower(text), '\\s+')) AS INT) AS n_ws_tokens,
          CAST(len(regexp_extract_all(text, '$pat')) AS INT) AS n_bpe_tokens
          FROM documents ORDER BY doc_id""")) { t =>
      TextAnalysis.tokenCounts(t.documents).orderBy("doc_id")
    }
  }

  // x07 — polynomial rolling-hash fingerprints (bit-identical fold in both
  // engines; modulus keeps intermediates under int64 overflow).
  private val x07 = q("x07_rolling_hash", Some(
    s"""SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
          (h, c) -> (h * 31 + c) % ${TextAnalysis.RollMod}) AS rhash
        FROM documents ORDER BY doc_id""")) { t =>
    TextAnalysis.rollingHash(t.documents).orderBy("doc_id")
  }

  // x08 — within-document n-gram repetition fractions (Gopher-style quality
  // rules): pure narrow map, dup fraction = 1 - distinct/total per n.
  private val x08 = q("x08_repetition", Some(
    """WITH base AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
       m AS (SELECT doc_id,
               CAST(len(w) AS INT) AS n_tokens,
               CAST(greatest(len(w) - 1, 0) AS INT) AS tot_2grams,
               CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1]))) AS INT) AS dist_2grams,
               CAST(greatest(len(w) - 2, 0) AS INT) AS tot_3grams,
               CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS INT) AS dist_3grams
             FROM base)
       SELECT *,
         CASE WHEN tot_2grams > 0
              THEN 1.0 - CAST(dist_2grams AS DOUBLE) / CAST(tot_2grams AS DOUBLE)
              ELSE 0.0 END AS dup_2gram_frac,
         CASE WHEN tot_3grams > 0
              THEN 1.0 - CAST(dist_3grams AS DOUBLE) / CAST(tot_3grams AS DOUBLE)
              ELSE 0.0 END AS dup_3gram_frac
       FROM m ORDER BY doc_id""")) { t =>
    TextAnalysis.repetition(t.documents).orderBy("doc_id")
  }

  // x09 — PII scrubbing. The corpus itself is clean word-salad, so the def
  // derives a noisy variant IN-QUERY (deterministic per-doc injections of
  // emails / URLs / long digit runs — the DirtyTxns pattern) and the oracle
  // re-applies the identical injection + scrub chain: 500 distinct strings
  // hash-verify that both engines' regex replace semantics agree.
  private val x09 = {
    val noisySql =
      """text
         || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id::VARCHAR || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 4 = 0 THEN ' see https://example.com/d/' || doc_id::VARCHAR ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' ref ' || (doc_id + 10000000)::VARCHAR ELSE '' END"""
    val u = TextAnalysis.UrlPattern
    val e = TextAnalysis.EmailPattern
    val njoin = TextAnalysis.LongNumPattern
    q("x09_pii_scrub", Some(
      s"""WITH noisy AS (SELECT doc_id, $noisySql AS nt FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(nt, '$u')) AS INT) AS n_urls,
           CAST(len(regexp_extract_all(regexp_replace(nt, '$u', '<URL>', 'g'), '$e')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(regexp_replace(regexp_replace(nt, '$u', '<URL>', 'g'),
                '$e', '<EMAIL>', 'g'), '$njoin')) AS INT) AS n_longnums,
           regexp_replace(regexp_replace(regexp_replace(nt, '$u', '<URL>', 'g'),
                '$e', '<EMAIL>', 'g'), '$njoin', '<NUM>', 'g') AS scrubbed
         FROM noisy ORDER BY doc_id""")) { t =>
      val noisy = t.documents.select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" reach user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(""),
        when(col("doc_id") % 4 === 0,
          concat(lit(" see https://example.com/d/"), col("doc_id").cast("string")))
          .otherwise(""),
        when(col("doc_id") % 5 === 0,
          concat(lit(" ref "), (col("doc_id") + 10000000L).cast("string")))
          .otherwise("")).as("nt"))
      TextAnalysis.piiScrub(noisy, "nt").orderBy("doc_id")
    }
  }

  // x10 — deterministic stratified sampling (domain mixing): keep 50% of
  // 'en', 25% of every other language, keyed by an md5 bucket of doc_id —
  // stable across runs/partitionings, which is what makes it oracle-able.
  private val x10 = q("x10_stratified_sample", Some(
    s"""SELECT doc_id, lang, ${Sampling.sqlHashBucket("doc_id", "strata")} AS bucket
        FROM documents
        WHERE ${Sampling.sqlHashBucket("doc_id", "strata")} <
              CASE WHEN lang = 'en' THEN ${Sampling.sqlHex2(0.5)} ELSE ${Sampling.sqlHex2(0.25)} END
        ORDER BY doc_id""")) { t =>
    Sampling.stratifiedSample(t.documents, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.25)
      .select(col("doc_id"), col("lang"), Sampling.hashBucket(col("doc_id"), "strata").as("bucket"))
      .orderBy("doc_id")
  }

  // x11 — deterministic train/val/test split (~80/10/10): contiguous md5
  // bucket ranges, so re-ingesting a document can never migrate it across
  // splits.
  private val x11 = q("x11_train_split", Some(
    s"""SELECT doc_id, ${Sampling.sqlHashBucket("doc_id", "split")} AS bucket,
        CASE WHEN ${Sampling.sqlHashBucket("doc_id", "split")} < ${Sampling.sqlHex2(0.8)} THEN 'train'
             WHEN ${Sampling.sqlHashBucket("doc_id", "split")} < ${Sampling.sqlHex2(0.9)} THEN 'val'
             ELSE 'test' END AS split
        FROM documents ORDER BY doc_id""")) { t =>
    Sampling.trainValTestSplit(t.documents, "doc_id")
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")
  }

  // d06 — benchmark decontamination: corpus docs sharing any 3-shingle with
  // the held-out "benchmark" subset (doc_id % 50 = 0 here). The benchmark
  // shingle set broadcasts; corpus text never shuffles.
  private val d06 = q("d06_decontaminate", Some(
    s"""WITH sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
        FROM sh JOIN b USING (shingle)
        WHERE doc_id % 50 <> 0
        GROUP BY doc_id ORDER BY doc_id""")) { t =>
    Dedup.contaminationReport(
      t.documents.filter(col("doc_id") % 50 =!= 0),
      t.documents.filter(col("doc_id") % 50 === 0))
      .orderBy("doc_id")
  }

  // e11 — trailing-7-day rolling distinct users per observed day. The
  // Spark side inverts the overlapping window into an explode + two-level
  // distinct (no window function; see Events.rollingDistinctUsers); the
  // oracle computes the same thing the declarative way, by range join.
  private val e11 = q("e11_rolling_wau", Some(
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        days AS (SELECT DISTINCT day FROM ud)
        SELECT d.day AS win_day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_active_users
        FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1 ORDER BY win_day""")) { t =>
    Events.rollingDistinctUsers(eventsTs(t), windowDays = 7).orderBy("win_day")
  }

  // e12 — the sketch twin of e11 (per-day HLL sketches, associatively
  // merged per trailing window) — the 100 TB / wide-window path. No SQL
  // oracle (DataSketches HLL isn't replicable in DuckDB); accuracy is
  // spec-pinned against the exact e11 rollup instead (≤1% at lgK=14).
  private val e12 = QueryDef("e12_rolling_wau_sketch",
    (s: SparkSession, dir: String) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Events.rollingDistinctUsersSketch(eventsTs(Tables(s, dir)), windowDays = 7)
        .orderBy("win_day")
    },
    oracle = None)

  // e13 — daily event-volume anomaly z-scores (spike/drop detection per
  // event type) — q19's operator class applied to the event log. Every
  // float input is an exact integer, so the stats chain is bit-identical
  // cross-engine; ROUND(4) absorbs formatting.
  private val e13 = q("e13_daily_anomaly", Some(
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(COUNT(*) AS BIGINT) AS n_events
                      FROM events GROUP BY 1, 2),
        st AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(n_events) AS DOUBLE) AS s1,
                 CAST(SUM(n_events * n_events) AS DOUBLE) AS s2
               FROM daily GROUP BY 1)
        SELECT d.event_type, d.day, d.n_events,
               ROUND((d.n_events - s1 / n) /
                     NULLIF(sqrt((s2 - s1 * s1 / n) / (n - 1)), 0), 4) AS z_score
        FROM daily d JOIN st USING (event_type)
        ORDER BY event_type, day""")) { t =>
    Events.dailyCountAnomalies(eventsTs(t)).orderBy("event_type", "day")
  }

  // d13 — per-document benchmark-overlap FRACTION (the soft contamination
  // dashboard metric; d06 lists offenders, this scores everyone, zeros
  // included). Benchmark = every 50th doc, mirroring d06.
  private val d13 = q("d13_contamination_fraction", Some(
    s"""WITH sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
        c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0)
        SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_shared,
               CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS contamination
        FROM c LEFT JOIN b ON c.shingle = b.shingle
        GROUP BY 1 ORDER BY doc_id""")) { t =>
    Dedup.contaminationFraction(
      t.documents.filter(col("doc_id") % 50 =!= 0),
      t.documents.filter(col("doc_id") % 50 === 0))
      .orderBy("doc_id")
  }

  // ----------------------------------------------------------------- events

  private val e01 = q("e01_hourly_windows", Some(
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        ${sqlDsum("value")} AS total_value
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""),
    headline = true) { t =>
    Events.hourlyWindows(eventsTs(t)).orderBy("window_start", "event_type")
  }

  private val e02 = q("e02_sessionization", Some(
    s"""WITH e AS (SELECT *, epoch_us(ts) AS us FROM events),
        s AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
                             THEN 1 ELSE 0 END AS is_new
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s2 AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_id
               FROM s)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               ${sqlDsum("value")} AS total_value
        FROM s2 GROUP BY 1, 2 ORDER BY user_id, session_id""")) { t =>
    Events.sessionize(eventsTs(t)).orderBy("user_id", "session_id")
  }

  // e18 — cross-user session CO-PRESENCE via the grain-binned interval
  // RANGE JOIN (the inequality join Spark lacks natively — naive
  // formulation is a cartesian): sessions from e02's machinery, pairs of
  // OVERLAPPING sessions across distinct users counted per user pair.
  // The operator's first-shared-grain trick emits each qualifying pair
  // exactly once (no distinct), and the oracle recomputes the closed-
  // interval inequality join directly, so a pair duplicated by the
  // binning, lost at a grain boundary, or wrongly admitted hash-fails.
  private val e18 = q("e18_session_overlap", Some(
    s"""WITH e AS (SELECT *, epoch_us(ts) AS us FROM events),
        s AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
                             THEN 1 ELSE 0 END AS is_new
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s2 AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_id
               FROM s),
        sess AS (SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
                 FROM s2 GROUP BY 1, 2)
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               CAST(COUNT(*) AS BIGINT) AS n_overlaps
        FROM sess a JOIN sess b
          ON a.user_id < b.user_id
         AND a.s_us <= b.e_us AND b.s_us <= a.e_us
        GROUP BY 1, 2 ORDER BY user_a, user_b""")) { t =>
    val sess = Events.sessionize(eventsTs(t))
      .select(col("user_id"), col("session_id"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"))
    val a = sess.toDF("user_a", "sid_a", "a_start", "a_end")
    val b = sess.toDF("user_b", "sid_b", "b_start", "b_end")
    graft.operators.RangeJoin.overlapJoin(
        a, b, "a_start", "a_end", "b_start", "b_end",
        grainUs = 3600L * 1000000L)
      .filter(col("user_a") < col("user_b"))
      .groupBy("user_a", "user_b")
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy("user_a", "user_b")
  }

  // e03 — SLIDING 1-hour windows every 15 minutes: each event belongs to 4
  // overlapping windows; the oracle derives the same window starts by
  // integer bucket arithmetic on epoch microseconds.
  private val e03 = q("e03_sliding_windows", Some(
    s"""SELECT make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000) AS window_start,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        ${sqlDsum("value")} AS total_value
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) offsets
        GROUP BY 1 ORDER BY window_start""")) { t =>
    Events.slidingWindows(eventsTs(t))
  }

  // e04 — conversion funnel: users whose first purchase follows their first
  // signup (min-ts per event type, then an ordered comparison).
  private val e04 = q("e04_signup_purchase_funnel", Some(
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_signed_up,
              CAST(SUM(CASE WHEN first_purchase >= first_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
       FROM (
         SELECT user_id,
                min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
                min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
         FROM events GROUP BY user_id) z
       WHERE first_signup IS NOT NULL""")) { t =>
    Events.signupPurchaseFunnel(eventsTs(t))
  }

  // e05 — the built-in session_window operator must produce the SAME
  // sessions as the lag+running-sum formulation (e02): the oracle reuses
  // that chain, keyed by session start.
  private val e05 = q("e05_session_window", Some(
    s"""WITH e AS (SELECT *, epoch_us(ts) AS us FROM events),
        s AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
                             THEN 1 ELSE 0 END AS is_new
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s2 AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_id
               FROM s)
        SELECT user_id, min(ts) AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ${sqlDsum("value")} AS total_value
        FROM s2 GROUP BY user_id, session_id ORDER BY user_id, session_start""")) { t =>
    Events.sessionWindows(eventsTs(t)).orderBy("user_id", "session_start")
  }

  // e06 — as-of join (purchase → most recent prior view per user). The
  // oracle uses DuckDB's native ASOF JOIN; Spark expresses the same
  // semantics with the tagged-union running window (no range-join blowup).
  // view_ts is exposed as VARCHAR because it is legitimately NULL for
  // unattributed purchases (NaT can't be hash-compared).
  private val e06 = q("e06_asof_attribution", Some(
    """WITH v AS (SELECT user_id, ts, max(event_id) AS event_id
                  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
               v.event_id AS view_id, CAST(v.ts AS VARCHAR) AS view_ts
        FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY purchase_id""")) { t =>
    Events.asofViewAttribution(eventsTs(t)).orderBy("purchase_id")
  }

  // x12 — language-ADAPTIVE stopword ratio: each document scored against its
  // predicted language's lexicon (the quality refinement that stops an
  // English stopword list from penalizing non-English docs).
  private val x12 = q("x12_stop_ratio_by_lang", Some(
    s"""WITH m AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, $langHitsSql
               FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
                     FROM documents) z),
        p AS (SELECT *,
                CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                     WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                     WHEN de_hits >= fr_hits THEN 'de'
                     ELSE 'fr' END AS predicted_lang
              FROM m)
        SELECT doc_id, predicted_lang, n_tokens,
               CASE predicted_lang WHEN 'en' THEN en_hits WHEN 'es' THEN es_hits
                    WHEN 'de' THEN de_hits ELSE fr_hits END AS n_stop_predicted,
               CAST(CASE predicted_lang WHEN 'en' THEN en_hits WHEN 'es' THEN es_hits
                    WHEN 'de' THEN de_hits ELSE fr_hits END AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE) AS stop_ratio
        FROM p ORDER BY doc_id""")) { t =>
    TextAnalysis.stopRatioByLang(t.documents).orderBy("doc_id")
  }

  // x13 — TOKEN-BUDGET sampling: greedy-fill documents in deterministic
  // (hash-bucket, doc_id) order until the cumulative token count crosses the
  // budget (the crossing document is kept). The global running sum goes
  // through graft.operators.PrefixSum — the scale-safe two-pass prefix sum —
  // while the oracle uses the single-partition window formulation the
  // operator replaces, so the def cross-checks the decomposition itself.
  private val x13 = {
    val b = Sampling.sqlHashBucket("doc_id", "budget")
    q("x13_token_budget", Some(
      s"""WITH s AS (SELECT doc_id, $b AS bucket,
                 CAST(len(string_split_regex(lower(text), '\\s+')) AS INT) AS n_tokens
               FROM documents),
          r AS (SELECT *, SUM(n_tokens) OVER (
                  ORDER BY bucket || '-' || lpad(doc_id::VARCHAR, 20, '0')
                  ROWS UNBOUNDED PRECEDING) AS running_sum FROM s)
          SELECT doc_id, bucket, n_tokens, CAST(running_sum AS BIGINT) AS running_sum
          FROM r WHERE running_sum - n_tokens < 10000 ORDER BY doc_id""")) { t =>
      val scored = t.documents.select(
        col("doc_id"),
        Sampling.hashBucket(col("doc_id"), "budget").as("bucket"),
        size(TextFns.tokens(col("text"))).as("n_tokens"))
        .withColumn("sort_key",
          concat(col("bucket"), lit("-"), lpad(col("doc_id").cast("string"), 20, "0")))
      graft.operators.PrefixSum.withRunningSum(scored, "sort_key", "n_tokens")
        .filter(col("running_sum") - col("n_tokens") < 10000)
        .select("doc_id", "bucket", "n_tokens", "running_sum")
        .orderBy("doc_id")
    }
  }

  // e07 — multi-step ORDERED funnel (signup → view → purchase): step k
  // requires the first step-k event at/after the first qualifying
  // step-(k-1) event. Comparisons run at MICROSECOND precision in both
  // engines (events.parquet is ns; min() commutes with truncation, so
  // epoch_us on both sides of every >= matches Spark's us timestamps
  // exactly even when two events fall inside the same microsecond).
  private val e07 = q("e07_multistep_funnel", Some(
    """WITH w1 AS (
         SELECT user_id, ts, event_type,
                min(CASE WHEN event_type = 'signup' THEN ts END)
                  OVER (PARTITION BY user_id) AS t1
         FROM events),
       w2 AS (SELECT *,
                min(CASE WHEN event_type = 'view' AND epoch_us(ts) >= epoch_us(t1) THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
              FROM w1),
       w3 AS (SELECT *,
                min(CASE WHEN event_type = 'purchase' AND epoch_us(ts) >= epoch_us(t2) THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
              FROM w2),
       u AS (SELECT DISTINCT user_id, t1, t2, t3 FROM w3)
       SELECT CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
              CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_then_view,
              CAST(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_then_purchase
       FROM u""")) { t =>
    Events.multistepFunnel(eventsTs(t))
  }

  // e08 — JSON props extraction + rollup (VERDICT r9 #7): the `props` JSON
  // payload carried by every event, parsed with the codegen'd
  // get_json_object and rolled up per (event_type, k-decade). No ts use —
  // the def is encoding-independent by construction.
  private val e08 = q("e08_props_rollup", Some(
    s"""SELECT event_type,
        CAST(json_extract_string(props, '$$.k') AS BIGINT) // 10 AS k_decade,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        min(event_id) AS first_event,
        ${sqlDsum("value")} AS total_value
        FROM events GROUP BY 1, 2 ORDER BY event_type, k_decade""")) { t =>
    Events.propsRollup(t.events).orderBy("event_type", "k_decade")
  }

  // e09 — the day-partitioned EVENT STORE through the correctness gate
  // (t13's subject applied to the tier that actually hits 100 TB first):
  // write the events through writeEventsPartitioned (event_date= directory
  // layout, REBALANCE-clustered), read back ONE day — answered from
  // listing-time partition pruning, not row filters (WarehouseSpec asserts
  // the PartitionFilters plan) — and roll up per event type. The oracle
  // computes the same day off the UNPARTITIONED raw events, so a row lost
  // or duplicated by the partitioned write/read cycle hash-fails here.
  private val e09 = q("e09_partitioned_day_scan", Some(
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        ${sqlDsum("value")} AS total_value
        FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10'
        GROUP BY 1 ORDER BY event_type""")) { t =>
    val path = graft.TempDirs.scoped("graft-events-part") + "/events_by_day"
    graft.warehouse.ParquetWarehouse.writeEventsPartitioned(eventsTs(t), path)
    t.spark.read.parquet(path)
      .filter(col("event_date") === lit(java.sql.Date.valueOf("2024-01-10")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  // e10 — retention cohort matrix: each user joins the cohort of their
  // first active day; the matrix counts distinct users active per
  // (cohort day, day offset ≤ 7). Two keyed aggregations + one user_id
  // equi-join — no global window. The oracle recomputes first days,
  // offsets, and the distinct-user rollup end to end.
  private val e10 = q("e10_retention_cohorts", Some(
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        fd AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1)
        SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day, e.day) AS INT) AS offset_days,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM ev e JOIN fd f USING (user_id)
        WHERE date_diff('day', f.cohort_day, e.day) <= 7
        GROUP BY 1, 2 ORDER BY 1, 2""")) { t =>
    Events.retentionCohorts(eventsTs(t), maxOffsetDays = 7)
      .orderBy("cohort_day", "offset_days")
  }

  // ---------------------------------------------------------------- pipeline

  // p01 — END-TO-END curation: near-dup removal (cluster representatives
  // kept) + quality floor + language filter, the flagship composition of
  // d05/x03/x02. The oracle recomputes the ENTIRE pipeline (recursive-CTE
  // clusters, quality formula, lang argmax) so the composition — not just
  // the stages — is hash-verified.
  private val p01 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    q("p01_curate_corpus", Some(
      s"""WITH RECURSIVE sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
          counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          qual AS (
            SELECT doc_a, doc_b FROM inter
            JOIN counts ca ON doc_a = ca.doc_id
            JOIN counts cb ON doc_b = cb.doc_id
            WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.8),
          edges AS (SELECT doc_a AS a, doc_b AS b FROM qual
                    UNION SELECT doc_b, doc_a FROM qual),
          reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          nodes AS (SELECT DISTINCT a FROM edges),
          clusters AS (
            SELECT n.a AS doc_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
            FROM nodes n LEFT JOIN reach r ON r.a = n.a GROUP BY n.a),
          dropset AS (SELECT doc_id FROM clusters WHERE doc_id <> rep),
          base AS (SELECT doc_id, len(text) AS n_chars,
                          string_split_regex(lower(text), '\\s+') AS w
                   FROM documents),
          m AS (SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
                       CAST(len(w) AS INT) AS n_tokens,
                       CAST(len(list_distinct(w)) AS INT) AS n_distinct,
                       CAST(len(list_filter(w, x -> x IN ($enStops))) AS INT) AS n_stop,
                       CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS INT) AS n_shingles,
                       $langHitsSql
                FROM base),
          scored AS (
            SELECT doc_id,
                   (least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
                    + CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    + CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    + CASE WHEN n_tokens > 2
                           THEN CAST(n_shingles AS DOUBLE) / CAST(n_tokens - 2 AS DOUBLE)
                           ELSE 0.0 END) / 4.0 AS quality,
                   CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                        WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                        WHEN de_hits >= fr_hits THEN 'de'
                        ELSE 'fr' END AS predicted_lang
            FROM m)
          SELECT d.doc_id, d.text, s.quality, s.predicted_lang
          FROM documents d
          JOIN scored s ON d.doc_id = s.doc_id
          WHERE d.doc_id NOT IN (SELECT doc_id FROM dropset)
            AND s.quality >= 0.53 AND s.predicted_lang = 'en'
          ORDER BY d.doc_id"""), headline = true) { t =>
      Curation.curate(t.documents, minQuality = 0.53, lang = Some("en"))
        .orderBy("doc_id")
    }
  }

  // p02 — the FULL training-corpus build: decontaminate (vs the doc_id%50=0
  // benchmark subset) → curate (near-dup reps + quality floor + 'en') →
  // deterministic train/val/test split. The oracle recomputes the entire
  // composition — crucially the near-dup clusters form over the
  // DECONTAMINATED corpus (dropping a contaminated cluster member changes
  // downstream cluster membership), so stage ordering is hash-verified too.
  private val p02 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    val b = Sampling.sqlHashBucket("c.doc_id", "split")
    q("p02_training_corpus", Some(
      s"""WITH RECURSIVE sh0 AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
          bsh AS (SELECT DISTINCT shingle FROM sh0 WHERE doc_id % 50 = 0),
          contaminated AS (
            SELECT DISTINCT doc_id FROM sh0 JOIN bsh USING (shingle)
            WHERE doc_id % 50 <> 0),
          corpus AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id % 50 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
          sh AS (SELECT * FROM sh0 WHERE doc_id IN (SELECT doc_id FROM corpus)),
          counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          qual AS (
            SELECT doc_a, doc_b FROM inter
            JOIN counts ca ON doc_a = ca.doc_id
            JOIN counts cb ON doc_b = cb.doc_id
            WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.8),
          edges AS (SELECT doc_a AS a, doc_b AS b FROM qual
                    UNION SELECT doc_b, doc_a FROM qual),
          reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
          nodes AS (SELECT DISTINCT a FROM edges),
          clusters AS (
            SELECT n.a AS doc_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
            FROM nodes n LEFT JOIN reach r ON r.a = n.a GROUP BY n.a),
          dropset AS (SELECT doc_id FROM clusters WHERE doc_id <> rep),
          base AS (SELECT doc_id, len(text) AS n_chars,
                          string_split_regex(lower(text), '\\s+') AS w
                   FROM corpus),
          m AS (SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
                       CAST(len(w) AS INT) AS n_tokens,
                       CAST(len(list_distinct(w)) AS INT) AS n_distinct,
                       CAST(len(list_filter(w, x -> x IN ($enStops))) AS INT) AS n_stop,
                       CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS INT) AS n_shingles,
                       $langHitsSql
                FROM base),
          scored AS (
            SELECT doc_id,
                   (least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
                    + CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    + CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    + CASE WHEN n_tokens > 2
                           THEN CAST(n_shingles AS DOUBLE) / CAST(n_tokens - 2 AS DOUBLE)
                           ELSE 0.0 END) / 4.0 AS quality,
                   CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                        WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                        WHEN de_hits >= fr_hits THEN 'de'
                        ELSE 'fr' END AS predicted_lang
            FROM m)
          SELECT c.doc_id, s.quality, s.predicted_lang,
                 CASE WHEN $b < ${Sampling.sqlHex2(0.8)} THEN 'train'
                      WHEN $b < ${Sampling.sqlHex2(0.9)} THEN 'val'
                      ELSE 'test' END AS split
          FROM corpus c
          JOIN scored s ON c.doc_id = s.doc_id
          WHERE c.doc_id NOT IN (SELECT doc_id FROM dropset)
            AND s.quality >= 0.53 AND s.predicted_lang = 'en'
          ORDER BY c.doc_id""")) { t =>
      Curation.buildTrainingCorpus(
        t.documents.filter(col("doc_id") % 50 =!= 0),
        t.documents.filter(col("doc_id") % 50 === 0))
        .orderBy("doc_id")
    }
  }

  // p03 — per-source token-cap downsampling (mixture flattening): sources
  // over the 600-token cap thin to an expected 600-token contribution via
  // the deterministic hash-bucket predicate; the per-source threshold is
  // pure integer arithmetic (cap·65536 div srcTokens), so both engines
  // compute the identical keep boundary. The oracle recomputes the token
  // counts, per-source totals, thresholds, and the kept set end to end.
  private val p03 = q("p03_source_cap_sample", Some(
    s"""WITH toks AS (
          SELECT doc_id, source,
                 CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tok
          FROM documents),
        tot AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens
                FROM toks GROUP BY 1),
        thr AS (SELECT source, src_tokens,
                  CASE WHEN CAST(600 AS BIGINT) >= src_tokens THEN 'g000'
                       ELSE printf('%04x', (CAST(600 AS BIGINT) * 65536) // src_tokens)
                  END AS thresh
                FROM tot)
        SELECT t.doc_id, t.source, t.n_tok, h.src_tokens, h.thresh
        FROM toks t JOIN thr h USING (source)
        WHERE ${Sampling.sqlHashBucket("t.doc_id", "mix")} < h.thresh
        ORDER BY t.doc_id""")) { t =>
    Sampling.sourceCapSample(t.documents, capTokens = 600L).orderBy("doc_id")
  }

  // d08 — INCREMENTAL-INGEST dedup: near-dup matches of a NEW batch
  // (doc_id % 3 = 0) against the EXISTING corpus (doc_id % 3 ≠ 0) — the
  // cross-corpus variant that cleans each incoming crawl against everything
  // ingested before it without re-deduplicating the corpus. The oracle
  // computes ALL qualifying cross pairs by sparse shingle equi-join, so a
  // hash match proves the banded cross-LSH missed nothing.
  private val crossDedupOracle =
    s"""WITH sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        n AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 3 = 0),
        c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 3 <> 0),
        cn AS (SELECT doc_id, COUNT(*) AS k FROM n GROUP BY doc_id),
        cc AS (SELECT doc_id, COUNT(*) AS k FROM c GROUP BY doc_id),
        inter AS (
          SELECT n.doc_id AS new_id, c.doc_id AS corpus_id, COUNT(*) AS i
          FROM n JOIN c ON n.shingle = c.shingle
          GROUP BY 1, 2),
        pairs AS (
          SELECT new_id, corpus_id,
                 CAST(i AS DOUBLE) / CAST(cn.k + cc.k - i AS DOUBLE) AS jaccard
          FROM inter
          JOIN cn ON new_id = cn.doc_id
          JOIN cc ON corpus_id = cc.doc_id)
        SELECT new_id, corpus_id, jaccard FROM pairs WHERE jaccard >= 0.8
        ORDER BY new_id, corpus_id"""

  private val d08 = q("d08_incremental_dedup", Some(crossDedupOracle)) { t =>
    val (pairs, release) = Dedup.crossNearDupPairsWithCleanup(
      t.documents.filter(col("doc_id") % 3 === 0),
      t.documents.filter(col("doc_id") % 3 =!= 0),
      threshold = 0.8)
    try pairs.orderBy("new_id", "corpus_id").localCheckpoint(true)
    finally release()
  }

  // d09 — d08 through a PERSISTED corpus index: the corpus's band buckets
  // and shingle sets are written to parquet once (Dedup.writeCorpusIndex —
  // the "index the corpus once, join every batch against it" shape that
  // real incremental ingest runs at 100 TB), and the batch joins the STORED
  // index with no corpus re-shingling. Same oracle as d08: the pairs must
  // be hash-identical to the recompute-everything form. The def rebuilds
  // the index into a temp dir on each run, so the measured time INCLUDES
  // the one-time index cost; the per-batch query alone is the
  // read-index-and-join tail (asserted cheaper-in-plan by Round6OpsSpec:
  // the indexed plan scans no `text` column on the corpus side).
  private val d09 = q("d09_incremental_dedup_indexed", Some(crossDedupOracle)) { t =>
    val idx = graft.TempDirs.scoped("graft-dedup-idx")
    Dedup.writeCorpusIndex(t.documents.filter(col("doc_id") % 3 =!= 0), idx)
    val (pairs, release) = Dedup.crossNearDupPairsAgainstIndexWithCleanup(
      t.documents.filter(col("doc_id") % 3 === 0), idx, threshold = 0.8)
    try pairs.orderBy("new_id", "corpus_id").localCheckpoint(true)
    finally release()
  }

  // s04 — symmetric int8 quantization of the embedding column (the 4×
  // storage compression a 100 TB vector corpus applies before scan). The
  // quantized values THEMSELVES are emitted row-per-element and
  // hash-checked — rounding is written as floor(x·scale + 0.5) so both
  // engines evaluate the identical double expression.
  private val s04 = q("s04_embedding_quantize", Some(
    """WITH m AS (
         SELECT vec_id, embedding,
                list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mx
         FROM embeddings),
       u AS (
         SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS idx,
                unnest(embedding) AS x,
                CASE WHEN mx <> 0 THEN 127.0 / mx END AS scale
         FROM m)
       SELECT vec_id, CAST(idx AS INT) AS idx,
              CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INT) AS q
       FROM u ORDER BY vec_id, idx""")) { t =>
    Similarity.quantizeInt8(t.embeddings).orderBy("vec_id", "idx")
  }

  // s05 — brute-force top-10 over the INT8-QUANTIZED vectors (the consumer
  // of s04's compression: per-vector scales cancel inside cosine, so the
  // kernel is an integer dot product — exact in double in both engines, so
  // the quantized cosines hash-compare as raw doubles like s01's). Search
  // quality vs the float ranking (recall@10 of s05 against s01) is graded
  // per-round in the RECALL artifact.
  private val s05 = q("s05_knn_quantized", Some(
    """WITH pk AS (
         SELECT vec_id,
                list_transform(CAST(embedding AS DOUBLE[]),
                  x -> floor(x * scale + 0.5)) AS q
         FROM (SELECT vec_id, embedding,
                      CASE WHEN list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) <> 0
                           THEN 127.0 / list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))
                      END AS scale
               FROM embeddings) m),
        q AS (SELECT vec_id AS query_id, q AS qq FROM pk WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id AS neighbor_id, q AS qc FROM pk),
        p AS (SELECT query_id, neighbor_id,
                     list_dot_product(qq, qc) /
                     (sqrt(list_dot_product(qq, qq)) * sqrt(list_dot_product(qc, qc))) AS qcos
              FROM q, c WHERE query_id <> neighbor_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, qcos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.bruteForceTopKQuantized(t.embeddings, col("vec_id") % 100 === 0, k = 10)
      .orderBy("query_id", "rank")
  }

  // s06 — ANN served from a PERSISTED IVF index with int8-quantized
  // storage (FAISS-style IVF flat-int8 as parquet): centroids + quantized
  // codes written once (Similarity.writeIvfIndex — the index-once,
  // query-many-batches production shape, the ANN twin of d09's dedup
  // index), queries probe the stored centroids and fine-rank against the
  // probed cells' int8 codes — corpus floats never read at query time.
  // THROUGH the hash gate since r15: the stored serve is the s03 recipe
  // (scramble centroids, argmax assignment, probe ranking) scored with
  // s05's quantized cosine (int8 codes as exactly-representable doubles,
  // scales cancel) — the INDEX is only a layout, so the oracle recomputes
  // the identical answer with no store at all, which is itself the
  // served-equals-in-memory claim the spec pins, now hash-gated per run.
  // Recall stays graded per-round in RECALL (s06 entry). The def rebuilds
  // the index per run, so its bench time INCLUDES the build.
  private val s06 = q("s06_knn_ivf_quantized_indexed", Some(
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                                FROM embeddings),
        qk AS MATERIALIZED (
          SELECT vec_id, list_transform(emb, x -> floor(x * scale + 0.5)) AS q
          FROM (SELECT vec_id, emb,
                       CASE WHEN list_max(list_transform(emb, v -> abs(v))) <> 0
                            THEN 127.0 / list_max(list_transform(emb, v -> abs(v)))
                       END AS scale
                FROM e) z),
        cent AS MATERIALIZED (
          SELECT vec_id AS cell, emb AS c_emb FROM e
          ORDER BY ${Similarity.sampleHashSql("vec_id")}, vec_id
          LIMIT ${Similarity.IvfCells}),
        ac AS MATERIALIZED (
          SELECT e.vec_id, c.cell,
                 list_dot_product(e.emb, c.c_emb) /
                 (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) AS score
          FROM e, cent c),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac) z WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac WHERE vec_id % 100 = 0) z
          WHERE rn <= ${Similarity.IvfProbesRegistered}),
        p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
                     list_dot_product(qq.q, qc.q) /
                     (sqrt(list_dot_product(qq.q, qq.q)) * sqrt(list_dot_product(qc.q, qc.q))) AS qcos
              FROM probes pr
              JOIN assign a ON pr.cell = a.cell AND pr.query_id <> a.vec_id
              JOIN qk qq ON qq.vec_id = pr.query_id
              JOIN qk qc ON qc.vec_id = a.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, qcos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    val idx = graft.TempDirs.scoped("graft-ivf-idx")
    Similarity.writeIvfIndex(t.embeddings, idx)
    Similarity.ivfTopKQuantizedFromIndex(
      t.embeddings.filter(col("vec_id") % 100 === 0), idx,
      k = 10, nProbe = Similarity.IvfProbesRegistered)
      .orderBy("query_id", "rank")
  }

  // s07 — MULTI-PROBE hyperplane-LSH ANN (Lv et al., VLDB 2007): each query
  // probes its own bucket PLUS its Hamming-1 flip neighbors in smallest-
  // projection-margin order, per table — registered at the same
  // (96 tables × 12 bits, probeBits=12) point the RECALL artifact grades,
  // where r8 measured recall 0.90 at candidate fraction 0.298 on the
  // adversarial uniform geometry (the r7 #6 bar: ≥0.9 at ≤0.3 — roughly
  // half the candidate volume of s02's 48×6 exact-probe config at equal
  // recall). The probe expansion is query-side only: the corpus bucket
  // frame, its one shuffle, and any persisted bucket index are
  // byte-identical to the probeBits=0 path. Approximate → rows-only, like
  // s02; the curve point itself is graded per-round in the RECALL
  // artifact and probe-code bit-parity is spec-asserted (Round8OpsSpec).
  private val s07 = q("s07_knn_lsh_multiprobe", None) { t =>
    Similarity.lshTopK(t.embeddings, col("vec_id") % 100 === 0, k = 10,
      nTables = 96, nBits = 12, probeBits = 12)
      .orderBy("query_id", "rank")
  }

  // s08 — PRODUCT-QUANTIZED ANN with exact re-rank (Jégou et al. 2011):
  // corpus vectors compress to m=16 4-bit codes (8 bytes vs 256 — the
  // posture when even int8 vectors exceed the scan budget), queries score
  // the codes via per-query ADC lookup tables through the fused codegen'd
  // pq_encode/pq_adc expressions, and only the 50-candidate shortlist
  // re-attaches float embeddings for the exact cosine top-10. Registered
  // with KMEANS-TRAINED codebooks (VERDICT r10 #3): fitted entries tile
  // each subspace's marginal — measured 0.96 vs 0.80 uniform re-ranked
  // recall at equal compression (RECALL s08 vs s08_sampled); the fit runs
  // on a deterministic bounded sample, so training cost is corpus-size-
  // independent. Approximate → rows-only; recall graded per-round in
  // RECALL (s08 entries — raw ADC, re-ranked, and the sampled baseline)
  // and encode/ADC determinism spec-pinned in PqFnsSpec/Round10OpsSpec.
  private val s08 = q("s08_knn_pq", None) { t =>
    Similarity.pqTopKRerankedWith(t.embeddings,
      Similarity.pqCodebooksKMeans(t.embeddings),
      col("vec_id") % 100 === 0, k = 10, shortlist = Similarity.PqShortlist)
      .orderBy("query_id", "rank")
  }

  // s09 — IVF-ADC (FAISS's scale architecture): coarse cells bound WHICH
  // rows each query scans (~nProbe/C of the corpus), PQ codes bound the
  // BYTES per scanned row — the two orthogonal cost axes multiplied. One
  // narrow corpus pass fuses ivf_argmax cell assignment with pq_encode;
  // probed cells ADC-score, shortlist, exact-cosine re-rank. Approximate →
  // rows-only; recall + measured candidate fraction graded per-round in
  // RECALL (s09 entries).
  // Registered with kmeans-trained PQ books (the training win carries:
  // RECALL s09 0.92 vs s09_sampled 0.82 uniform at identical probe cost).
  private val s09 = q("s09_knn_ivfpq", None) { t =>
    Similarity.ivfPqTopKWith(t.embeddings,
      Similarity.ivfCentroids(t.embeddings),
      Similarity.pqCodebooksKMeans(t.embeddings),
      col("vec_id") % 100 === 0,
      k = 10, nProbe = Similarity.IvfProbesRegistered)
      .orderBy("query_id", "rank")
  }

  // s10 — PERSISTED IVF-PQ index (FAISS IVFPQ as parquet): centroids +
  // codebooks + cell-partitioned 8-byte codes written once, queries probe
  // the stored centroids and ADC-score ONLY the probed cells' directories
  // (literal partition predicate), then re-rank the shortlist with exact
  // cosine against the float corpus. The serving math is spec-pinned
  // byte-identical to s09's in-memory pipeline (Round10OpsSpec), so the
  // s09 RECALL entries grade this def too. The def rebuilds its index per
  // run, so its bench time INCLUDES the build.
  private val s10 = q("s10_knn_ivfpq_indexed", None) { t =>
    val idx = graft.TempDirs.scoped("graft-ivfpq-idx")
    Similarity.writeIvfPqIndex(t.embeddings, idx,
      booksIn = Some(Similarity.pqCodebooksKMeans(t.embeddings)))
    Similarity.ivfPqTopKFromIndex(
      t.embeddings.filter(col("vec_id") % 100 === 0), idx,
      k = 10, nProbe = Similarity.IvfProbesRegistered,
      rerankAgainst = Some(t.embeddings))
      .orderBy("query_id", "rank")
  }

  // s13 — PCA-reduced ANN with exact re-rank (FAISS PCAMatrix in front of
  // the scan): driver-fitted 64→16 projection on the bounded sample
  // (covariance + Jacobi, deterministic), corpus projected in a narrow
  // codegen'd map (4× fewer bytes per scanned row — the float analogue of
  // PQ's compression axis), reduced-space cosine shortlist, exact re-rank.
  // Approximate → rows-only; recall graded in RECALL (s13).
  private val s13 = q("s13_knn_pca", None) { t =>
    Similarity.pcaTopKReranked(t.embeddings, col("vec_id") % 100 === 0,
      k = 10, pcaDims = 16, shortlist = Similarity.PqShortlist)
      .orderBy("query_id", "rank")
  }

  // x14 — SEQUENCE PACKING: lay documents end-to-end in deterministic
  // (hash-bucket, doc_id) order and cut the token stream into 512-token
  // bins — each document gets its training-sequence id and starting offset.
  // The global prefix goes through the distributed PrefixSum operator; the
  // oracle is the single-partition window formulation it replaces.
  private val x14 = {
    val b = Sampling.sqlHashBucket("doc_id", "pack")
    q("x14_sequence_packing", Some(
      s"""WITH s AS (SELECT doc_id, $b AS bucket,
                 CAST(len(string_split_regex(lower(text), '\\s+')) AS INT) AS n_tokens
               FROM documents),
          r AS (SELECT *, SUM(n_tokens) OVER (
                  ORDER BY bucket || '-' || lpad(doc_id::VARCHAR, 20, '0')
                  ROWS UNBOUNDED PRECEDING) - n_tokens AS prefix FROM s)
          SELECT doc_id, n_tokens,
                 CAST(prefix // 512 AS BIGINT) AS bin_id,
                 CAST(prefix % 512 AS BIGINT) AS bin_offset
          FROM r ORDER BY doc_id""")) { t =>
      Packing.packGreedy(t.documents, binTokens = 512L).orderBy("doc_id")
    }
  }

  // x15 — QUANTILE-BASED quality filtering: keep documents at or above
  // their language's 25th quality percentile ("drop the worst quarter per
  // language") — the per-language-adaptive form of p01's fixed floor. The
  // oracle recomputes quality + lang argmax and DuckDB's quantile_cont,
  // which interpolates with the same lower+(upper−lower)·frac formula as
  // Spark's exact percentile.
  private val x15 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    q("x15_quality_quantile_filter", Some(
      s"""WITH base AS (SELECT doc_id, len(text) AS n_chars,
                   string_split_regex(lower(text), '\\s+') AS w
            FROM documents),
          m AS (SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
                   CAST(len(w) AS INT) AS n_tokens,
                   CAST(len(list_distinct(w)) AS INT) AS n_distinct,
                   CAST(len(list_filter(w, x -> x IN ($enStops))) AS INT) AS n_stop,
                   CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS INT) AS n_shingles,
                   $langHitsSql
                FROM base),
          scored AS (
            SELECT doc_id,
                   (least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
                    + CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    + CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    + CASE WHEN n_tokens > 2
                           THEN CAST(n_shingles AS DOUBLE) / CAST(n_tokens - 2 AS DOUBLE)
                           ELSE 0.0 END) / 4.0 AS quality,
                   CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                        WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                        WHEN de_hits >= fr_hits THEN 'de'
                        ELSE 'fr' END AS predicted_lang
            FROM m),
          thresholds AS (
            SELECT predicted_lang, quantile_cont(quality, 0.25) AS q_threshold
            FROM scored GROUP BY predicted_lang)
          SELECT s.doc_id, s.predicted_lang, s.quality, t.q_threshold
          FROM scored s JOIN thresholds t USING (predicted_lang)
          WHERE s.quality >= t.q_threshold
          ORDER BY s.doc_id""")) { t =>
      Curation.quantileQualityFilter(t.documents, quantile = 0.25).orderBy("doc_id")
    }
  }

  // x16 — unigram-LM surprisal (perplexity-style quality scoring with the
  // corpus itself as the model, CCNet-style). ln() is quantized to
  // DECIMAL(18,8) once per vocabulary entry; every downstream step is exact
  // decimal arithmetic, so the per-doc score is order-independent and
  // hash-comparable (see TextAnalysis.unigramSurprisal).
  private val unigramSurprisalOracleSql =
    """WITH dt AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) z
          GROUP BY 1, 2),
        freq AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS n_w FROM dt GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM freq),
        lut AS (SELECT tok,
                  CAST(ln(CAST(n_total AS DOUBLE) / CAST(n_w AS DOUBLE)) AS DECIMAL(18,8)) AS lnv
                FROM freq, tot)
        SELECT dt.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(c * lnv) AS DOUBLE) / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE), 4)
                 AS surprisal
        FROM dt JOIN lut USING (tok)
        GROUP BY 1 ORDER BY doc_id"""

  private val x16 = q("x16_unigram_surprisal", Some(unigramSurprisalOracleSql)) { t =>
    TextAnalysis.unigramSurprisal(t.documents).orderBy("doc_id")
  }

  // x37 — LEAKAGE-FREE train/test split: the x11 hash split, then any
  // train/val doc sharing ≥ 20 3-shingle occurrences with the test split
  // re-labels 'dropped' (Lee et al. 2022 §6.2's train-test leakage,
  // closed at split time). Test docs are never dropped. minShared = 20
  // sits above this low-vocabulary synthetic corpus's incidental-overlap
  // floor (median hit count 6, p99 19 — measured), so only the genuine
  // heavy-overlap tail drops; on a real corpus a shared 3-shingle is rare
  // and minShared = 1 is the right screen. The oracle recomputes the
  // split rule, the test shingle set, and the containment screen.
  private val x37 = q("x37_leakfree_split", Some(
    s"""WITH sp AS (
          SELECT doc_id, ${Sampling.sqlHashBucket("doc_id", "split")} AS bucket,
            CASE WHEN ${Sampling.sqlHashBucket("doc_id", "split")} < ${Sampling.sqlHex2(0.8)} THEN 'train'
                 WHEN ${Sampling.sqlHashBucket("doc_id", "split")} < ${Sampling.sqlHex2(0.9)} THEN 'val'
                 ELSE 'test' END AS split
          FROM documents),
        sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        b AS (SELECT DISTINCT shingle FROM sh JOIN sp USING (doc_id)
              WHERE sp.split = 'test'),
        hits AS (SELECT s.doc_id FROM sh s
                 JOIN sp p USING (doc_id) JOIN b USING (shingle)
                 WHERE p.split <> 'test'
                 GROUP BY s.doc_id HAVING COUNT(*) >= 20)
        SELECT sp.doc_id,
               CASE WHEN sp.split <> 'test'
                    AND sp.doc_id IN (SELECT doc_id FROM hits)
                    THEN 'dropped' ELSE sp.split END AS split
        FROM sp ORDER BY doc_id""")) { t =>
    Sampling.leakFreeSplit(t.documents, minShared = 20).orderBy("doc_id")
  }

  // x38 — Moore–Lewis cross-entropy-difference selection (in-domain =
  // source 'src0'): H_in − H_gen under two add-one-smoothed unigram LMs
  // sharing the general vocabulary. The oracle mirrors the x16 treatment
  // twice — each ln quantized to DECIMAL(18,8) from identical double
  // ratios, the per-token DIFFERENCE subtracted in exact decimal, doc
  // counts times the decimal difference accumulated exactly, one double
  // division at the end.
  private val x38 = q("x38_moore_lewis", Some(
    """WITH dt AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) z
          GROUP BY 1, 2),
        gen AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS n_gen FROM dt GROUP BY 1),
        ind AS (SELECT dt.tok, CAST(SUM(dt.c) AS BIGINT) AS n_in
                FROM dt JOIN documents d USING (doc_id)
                WHERE d.source = 'src0' GROUP BY 1),
        vocab AS (SELECT g.tok, g.n_gen, COALESCE(i.n_in, 0) AS n_in
                  FROM gen g LEFT JOIN ind i USING (tok)),
        tots AS (SELECT CAST(SUM(n_gen) AS BIGINT) AS n_gen_tot,
                        CAST(SUM(n_in) AS BIGINT) AS n_in_tot,
                        CAST(COUNT(*) AS BIGINT) AS v
                 FROM vocab),
        lut AS (SELECT tok,
                  CAST(ln(CAST(n_in_tot + v AS DOUBLE) / CAST(n_in + 1 AS DOUBLE)) AS DECIMAL(18,8))
                  - CAST(ln(CAST(n_gen_tot + v AS DOUBLE) / CAST(n_gen + 1 AS DOUBLE)) AS DECIMAL(18,8))
                    AS lnd
                FROM vocab, tots)
        SELECT dt.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(c * lnd) AS DOUBLE) / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE), 4)
                 AS ml_score
        FROM dt JOIN lut USING (tok)
        GROUP BY 1 ORDER BY doc_id""")) { t =>
    TextAnalysis.mooreLewisScore(t.documents, col("source") === "src0")
      .orderBy("doc_id")
  }

  // x36 — CCNet head/middle/tail quality buckets (Wenzek et al. 2020):
  // per-LANGUAGE surprisal terciles (head = most fluent third, the CCNet
  // keep slice). The per-lang rank rides the grouped PrefixSum — the
  // window formulation would funnel each language through one task. The
  // oracle recomputes the x16 scores, the per-lang window rank (fine at
  // oracle scale), and the same tercile arithmetic.
  private val x36 = q("x36_ccnet_buckets", Some(
    """WITH dt AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) z
          GROUP BY 1, 2),
        freq AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS n_w FROM dt GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM freq),
        lut AS (SELECT tok,
                  CAST(ln(CAST(n_total AS DOUBLE) / CAST(n_w AS DOUBLE)) AS DECIMAL(18,8)) AS lnv
                FROM freq, tot),
        sc AS (SELECT dt.doc_id,
                 ROUND(CAST(SUM(c * lnv) AS DOUBLE) / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE), 4)
                   AS surprisal
               FROM dt JOIN lut USING (tok) GROUP BY 1),
        sl AS (SELECT sc.doc_id, d.lang, sc.surprisal
               FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
        r AS (SELECT *,
                ROW_NUMBER() OVER (PARTITION BY lang ORDER BY surprisal, doc_id) AS rnk,
                COUNT(*) OVER (PARTITION BY lang) AS n
              FROM sl)
        SELECT doc_id, lang, surprisal,
               CASE ((rnk - 1) * 3) // n WHEN 0 THEN 'head'
                    WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
        FROM r ORDER BY doc_id""")) { t =>
    TextAnalysis.ccnetBuckets(t.documents).orderBy("doc_id")
  }

  // x28 — INCREMENTAL unigram-LM maintenance: the vocabulary histogram
  // lands in the CountStore in two batch appends and scoring reads the
  // summed model — x16's VERBATIM oracle hash-proves incremental ≡
  // from-scratch, this time on an UNBOUNDED (vocabulary) key space,
  // showing the additive-store pattern is not bucket-specific.
  private val x28 = q("x28_surprisal_incremental", Some(unigramSurprisalOracleSql)) { t =>
    val store = graft.TempDirs.scoped("graft-uni-idx")
    graft.operators.CountStore.write(
      TextAnalysis.unigramCounts(t.documents.filter(col("doc_id") % 2 === 0)), store)
    graft.operators.CountStore.append(
      TextAnalysis.unigramCounts(t.documents.filter(col("doc_id") % 2 === 1)), store)
    TextAnalysis.unigramSurprisalWith(
      t.documents, graft.operators.CountStore.read(t.spark, store))
      .orderBy("doc_id")
  }

  // x17 — overlapping token-window chunking (max 32, overlap 8): the
  // embedding/RAG prep primitive. Narrow map + explode, zero shuffle; the
  // oracle replays the same start-grid and slices in DuckDB list algebra.
  private val x17 = q("x17_chunk_overlap", Some(
    """WITH base AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
                     FROM documents),
        st AS (SELECT doc_id, w, unnest(range(0, greatest(1, len(w) - 8), 24)) AS start
               FROM base)
        SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
               CAST(len(w[start + 1 : start + 32]) AS INT) AS n_tokens,
               array_to_string(w[start + 1 : start + 32], ' ') AS chunk_text
        FROM st ORDER BY doc_id, chunk_id""")) { t =>
    TextAnalysis.chunkDocuments(t.documents, maxTokens = 32, overlapTokens = 8)
      .orderBy("doc_id", "chunk_id")
  }

  // x18 — deterministic global training order (dense 1..N positions in
  // salted-hash order) through the scale-safe prefix-sum path — the
  // operator a global ROW_NUMBER window would express unscalably. The
  // oracle IS that window (DuckDB's single node doesn't mind).
  private val x18 = q("x18_training_order", Some(
    s"""SELECT doc_id, md5(doc_id::VARCHAR || ':shuffle') AS h,
        CAST(ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR || ':shuffle')) AS BIGINT)
          AS position
        FROM documents ORDER BY doc_id""")) { t =>
    Sampling.trainingOrder(t.documents).orderBy("doc_id")
  }

  // x20 — per-document TF-IDF top-3 keywords: decimal-quantized IDF ×
  // exact counts, token-string tie-break — identical rankings in both
  // engines (the x16 determinism treatment applied to ranking).
  private val x20 = q("x20_tfidf_keywords", Some(
    """WITH dt AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) z
          GROUP BY 1, 2),
        dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1),
        nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        sc AS (SELECT doc_id, tok,
                 c * CAST(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS DECIMAL(18,8))
                   AS score
               FROM dt JOIN dfq USING (tok), nd),
        r AS (SELECT doc_id, tok, score,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS kw_rank
              FROM sc)
        SELECT doc_id, CAST(kw_rank AS INT) AS kw_rank, tok AS keyword,
               CAST(score AS DOUBLE) AS score
        FROM r WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""")) { t =>
    TextAnalysis.tfidfKeywords(t.documents, k = 3).orderBy("doc_id", "kw_rank")
  }

  // x19 — exact-k quota sample (10 docs per source): rank by salted id
  // hash within group, rank ≤ k survives — the exact-count twin of x10's
  // rate-based stratified sample, via the salted two-phase top-k.
  private val x19 = q("x19_quota_per_source", Some(
    """SELECT doc_id, source, CAST(quota_rank AS INT) AS quota_rank FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5(doc_id::VARCHAR || ':quota'), doc_id) AS quota_rank
          FROM documents) z
        WHERE quota_rank <= 10 ORDER BY doc_id""")) { t =>
    Sampling.quotaSample(t.documents, "source", k = 10)
      .select("doc_id", "source", "quota_rank")
      .orderBy("doc_id")
  }

  // p04 — temperature-resampled language mix (mT5-style, alpha = 0.3):
  // per-language weights ∝ tokens^alpha, thinned to an expected
  // budget·w_l contribution. pow() quantizes to decimal before the
  // normalization sum; the rest of the rate chain is correctly-rounded
  // double arithmetic on bit-identical inputs (see Sampling.temperatureMix).
  private val p04 = {
    val budget = 1500L
    q("p04_temperature_mix", Some(
      s"""WITH toks AS (
            SELECT doc_id,
                   CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                        WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                        WHEN de_hits >= fr_hits THEN 'de'
                        ELSE 'fr' END AS lang,
                   CAST(len(w) AS BIGINT) AS n_tok
            FROM (SELECT doc_id, w, $langHitsSql
                  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
                        FROM documents) y) z),
          tot AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens,
                    CAST(pow(CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE), 0.3) AS DECIMAL(28,6)) AS pw
                  FROM toks GROUP BY 1),
          s AS (SELECT SUM(pw) AS spw FROM tot),
          thr AS (SELECT lang, lang_tokens,
                    least(1.0, $budget.0 * CAST(pw AS DOUBLE)
                          / (CAST(spw AS DOUBLE) * CAST(lang_tokens AS DOUBLE))) AS rate
                  FROM tot, s),
          thx AS (SELECT lang, lang_tokens,
                    CASE WHEN rate >= 1.0 THEN 'g000'
                         ELSE printf('%04x', CAST(floor(rate * 65536.0) AS BIGINT)) END AS thresh
                  FROM thr)
          SELECT t.doc_id, t.lang, t.n_tok, h.lang_tokens, h.thresh
          FROM toks t JOIN thx h USING (lang)
          WHERE ${Sampling.sqlHashBucket("t.doc_id", "tmix")} < h.thresh
          ORDER BY t.doc_id""")) { t =>
      Sampling.temperatureMix(t.documents, alpha = 0.3, budgetTokens = budget)
        .orderBy("doc_id")
    }
  }

  // m01 — multimodal asset plumbing under the oracle gate: synthetic
  // assets (text bytes as payloads) through the per-partition batched
  // extractFeatures pass. The metadata/checksum path IS SQL-replicable
  // (MD5 over the same bytes, byte length, the 16-bin stub width for
  // non-decodable mimes), so the Dataset encoder + mapPartitions
  // machinery gets a hash-compare even though pixel/sample features are
  // graded by the sample-exact specs instead.
  private val m01 = q("m01_asset_features", Some(
    """SELECT doc_id AS asset_id, 'application/x-fake-' || lang AS mime,
        CAST(len(text) AS INT) AS n_bytes, md5(text) AS checksum,
        CAST(16 AS INT) AS n_features
        FROM documents ORDER BY asset_id""")) { t =>
    Multimodal.extractFeatures(Multimodal.syntheticAssets(t.documents))
      .select(col("asset_id"), col("mime"), col("n_bytes"), col("checksum"),
        size(col("features")).as("n_features"))
      .orderBy("asset_id")
  }

  // m05 — exact BINARY asset dedup through the gate (the crawl-stage
  // zero for media: identical bytes ⇒ identical asset, no normalization
  // — d01's keep-first shape, but over opaque payload BYTES, so only
  // 16-byte md5 digests ever reach an exchange; at 100 TB of media the
  // payloads staying put IS the operator). Duplicate payloads are
  // planted deterministically: every asset in a 4-block carries the
  // block head's payload (left join + coalesce handles absent heads
  // identically on both engines), so blocks collapse to one
  // representative with n_copies = block size. The oracle replays the
  // plant and the digest grouping; a payload hashed, routed, or counted
  // differently anywhere hash-fails.
  private val m05 = q("m05_binary_dedup", Some(
    """WITH b AS (SELECT doc_id, text FROM documents),
        w AS (SELECT d.doc_id AS asset_id, COALESCE(h.text, d.text) AS payload
              FROM b d LEFT JOIN b h ON h.doc_id = d.doc_id - (d.doc_id % 4))
        SELECT MIN(asset_id) AS rep_id, md5(payload) AS checksum,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM w GROUP BY md5(payload) ORDER BY rep_id""")) { t =>
    val docs = t.documents.select(col("doc_id"), col("text"))
    val heads = docs.select(col("doc_id").as("base_id"), col("text").as("base_text"))
    val assets = docs
      // `%` (truncated toward zero) matches DuckDB's `%` for negative ids
      // too; pmod would diverge (pmod(-3,4)=1 vs -3%4=-3) if ids go negative.
      .withColumn("base_id", col("doc_id") - (col("doc_id") % lit(4)))
      .join(heads, Seq("base_id"), "left")
      .select(col("doc_id").as("asset_id"),
        encode(coalesce(col("base_text"), col("text")), "UTF-8").as("payload"))
    Multimodal.exactBinaryDedup(assets).orderBy("rep_id")
  }

  // m02 — perceptual IMAGE dedup (rows-only like the other
  // non-SQL-expressible tiers — DuckDB cannot decode PNGs; MultimodalSpec
  // carries the semantics): a deterministic synthetic image corpus (one
  // PNG per doc_id, brightness-shifted twins every 25th id — byte-distinct
  // but hash-identical — and one-bit-perturbed variants every 50th), dHash
  // over real javax.imageio decode, banded-Hamming candidate pairs, exact
  // popcount verify. Every planted twin must pair with its base; unrelated
  // ids sit ~32 bits apart and never pair.
  private val m02 = q("m02_image_neardup", None) { t =>
    import t.spark.implicits._
    val assets = Multimodal.syntheticImageAssets(
      t.documents.select(col("doc_id")).as[Long])
    Multimodal.imageNearDupPairs(assets, maxHamming = 3)
      .orderBy("asset_a", "asset_b")
  }

  // m03 — perceptual AUDIO dedup (rows-only like m02: WAV decode is not
  // SQL-expressible): energy-delta sign hash over real JDK audio decode
  // (gain- and re-encode-invariant, spec-pinned), through the SAME
  // banded-Hamming candidate machinery as the image tier. Planted corpus:
  // gain-scaled twins (byte-different, Hamming 0) and one-bit-perturbed
  // twins (Hamming 1), every one recovered exactly (MultimodalHashSpec).
  private val m03 = q("m03_audio_neardup", None) { t =>
    import t.spark.implicits._
    val assets = Multimodal.syntheticAudioAssets(
      t.documents.select(col("doc_id")).as[Long])
    Multimodal.audioNearDupPairs(assets, maxHamming = 3)
      .orderBy("asset_a", "asset_b")
  }

  // p05 — epoch-weighted repetition (the mixture-table "source S trains
  // for e epochs" step): src0 ×2.5, src1 ×0.5, everything else ×1. The
  // fractional copy set is the deterministic hash bucket; frac thresholds
  // are exact 4-hex literals in both engines (0.5 → '8000').
  private val p05 = q("p05_epoch_upsample", Some(
    s"""WITH d AS (
          SELECT doc_id, source,
                 CASE WHEN source = 'src0' THEN 2
                      WHEN source = 'src1' THEN 0 ELSE 1 END
                 + CASE WHEN ${Sampling.sqlHashBucket("doc_id", "epoch")} <
                             CASE WHEN source = 'src0' THEN '8000'
                                  WHEN source = 'src1' THEN '8000'
                                  ELSE '0000' END
                        THEN 1 ELSE 0 END AS n_copies
          FROM documents)
        SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
               CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx
        FROM d WHERE n_copies > 0 ORDER BY doc_id, copy_idx""")) { t =>
    Sampling.epochUpsample(t.documents, Map("src0" -> 2.5, "src1" -> 0.5))
      .orderBy("doc_id", "copy_idx")
  }

  // p06 — per-source corpus report card (the curation-monitoring rollup):
  // docs / tokens / mean doc length / Gopher keep-fraction per source.
  // One narrow pass (gopherRules carrying source — no self-join) + one
  // |sources|-keyed rollup; every ratio is a single double division of
  // exact integer counts.
  private val p06 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    q("p06_corpus_report", Some(
      s"""WITH base AS (
            SELECT doc_id, source, text, string_split_regex(lower(text), '\\s+') AS w
            FROM documents),
          m AS (
            SELECT source,
              CAST(len(w) AS INT) AS n_words,
              CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS sum_word_len,
              CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS INT) AS n_alpha_words,
              CAST(len(text) - len(replace(text, '#', '')) AS INT)
                + CAST((len(text) - len(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS INT)
                AS n_symbols,
              CAST(len(list_filter(list_distinct(w), x -> x IN ($enStops))) AS INT)
                AS n_stop_distinct
            FROM base),
          k AS (
            SELECT source, n_words,
              ((n_words BETWEEN 50 AND 100000)
               AND CAST(sum_word_len AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0
               AND CAST(sum_word_len AS DOUBLE) / CAST(n_words AS DOUBLE) <= 10.0
               AND CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE) < 0.1
               AND CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.8
               AND n_stop_distinct >= 2) AS keep_doc
            FROM m)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(n_words) AS BIGINT) AS total_tokens,
            CAST(SUM(n_words) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_doc_tokens,
            CAST(SUM(CASE WHEN keep_doc THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS gopher_keep_frac
          FROM k GROUP BY source ORDER BY source""")) { t =>
      Curation.corpusReport(t.documents).orderBy("source")
    }
  }

  // x25 — DSIR importance weights (Xie et al. 2023): every document scored
  // by the log importance ratio of the English-labeled subset (the target
  // distribution) over the whole corpus, under hashed unigram features —
  // 1024 buckets via the x07 polynomial fold, Laplace-smoothed. The LUT is
  // bucket-bounded (the scale story: O(1024) model regardless of corpus
  // size); determinism is the x16/x24 quantized-ln + exact-decimal
  // treatment, hash arithmetic identical in both engines.
  private val dsirOracleSql =
    s"""WITH tb AS (
          SELECT doc_id,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
              (h, c) -> (h * 31 + c) % ${TextAnalysis.RollMod}) % 1024 AS b
          FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents) z),
        src AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ns FROM tb GROUP BY 1),
        stot AS (SELECT CAST(SUM(ns) AS BIGINT) AS n_src FROM src),
        ttb AS (
          SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
              (h, c) -> (h * 31 + c) % ${TextAnalysis.RollMod}) % 1024 AS b
          FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents WHERE lang = 'en') z),
        tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nt FROM ttb GROUP BY 1),
        ttot AS (SELECT CAST(SUM(nt) AS BIGINT) AS n_tgt FROM tgt),
        lut AS (
          SELECT src.b,
            CAST(ln(CAST(COALESCE(tgt.nt, 0) + 1 AS DOUBLE)
                    / CAST(n_tgt + 1024 AS DOUBLE)) AS DECIMAL(18,8))
            - CAST(ln(CAST(src.ns + 1 AS DOUBLE)
                      / CAST(n_src + 1024 AS DOUBLE)) AS DECIMAL(18,8)) AS lnr
          FROM src LEFT JOIN tgt ON src.b = tgt.b
          CROSS JOIN stot CROSS JOIN ttot),
        db AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM tb GROUP BY 1, 2)
        SELECT db.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          ROUND(CAST(SUM(CAST(c AS DECIMAL(12,0)) * lnr) AS DOUBLE), 4) AS dsir_logw
        FROM db JOIN lut ON db.b = lut.b
        GROUP BY 1 ORDER BY doc_id"""

  private val x25 = q("x25_dsir_weights", Some(dsirOracleSql)) { t =>
    TextAnalysis.dsirWeights(
      raw = t.documents, target = t.documents.filter(col("lang") === "en"),
      buckets = 1024).orderBy("doc_id")
  }

  // x27 — INCREMENTAL DSIR model maintenance: the raw-corpus bucket
  // histogram lands in the versioned additive CountStore in TWO batch
  // appends (even docs, then odd docs — nothing existing read or
  // rewritten per append), the model is fit from the store's summed view,
  // and the whole corpus is scored through the zero-shuffle narrow serve.
  // The oracle is x25's VERBATIM from-scratch formulation — histograms
  // sum associatively, so incremental ≡ batch bit-for-bit, and this def
  // PROVES it at the hash level.
  private val x27 = q("x27_dsir_incremental", Some(dsirOracleSql)) { t =>
    val store = graft.TempDirs.scoped("graft-dsir-idx")
    graft.operators.CountStore.write(
      TextAnalysis.dsirBucketCounts(t.documents.filter(col("doc_id") % 2 === 0)), store)
    graft.operators.CountStore.append(
      TextAnalysis.dsirBucketCounts(t.documents.filter(col("doc_id") % 2 === 1)), store)
    val lut = TextAnalysis.dsirModelFromCounts(
      graft.operators.CountStore.read(t.spark, store),
      TextAnalysis.dsirBucketCounts(t.documents.filter(col("lang") === "en")),
      buckets = 1024)
    TextAnalysis.dsirScoreNarrow(t.documents, lut).orderBy("doc_id")
  }

  // x26 — BM25 relevance scoring against a query term set (the
  // benchmark-targeted data-selection primitive): +1-IDF BM25 with
  // k1 = 1.25 / b = 0.75 (exact binary doubles — a 1.2 literal would
  // round differently between a Scala double sum and a DuckDB decimal
  // literal). 'shuffle' is deliberately absent from the corpus: an
  // unmatched term contributes nothing and the def proves it. Only
  // query-term token rows shuffle; zero-match docs emit bm25 = 0.0.
  private val x26 = q("x26_bm25_scoring", Some(
    """WITH base AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
          FROM documents),
        dl AS (SELECT doc_id, CAST(len(w) AS INT) AS dl FROM base),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
        dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS f
               FROM (SELECT doc_id, unnest(w) AS tok FROM base) z
               WHERE tok IN ('spark', 'join', 'window', 'shuffle')
               GROUP BY 1, 2),
        dft AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_t FROM dt GROUP BY 1),
        idf AS (SELECT tok,
                  CAST(ln((CAST(n_docs AS DOUBLE) - CAST(n_t AS DOUBLE) + 0.5)
                          / (CAST(n_t AS DOUBLE) + 0.5) + 1.0) AS DECIMAL(18,8)) AS idf
                FROM dft CROSS JOIN stats),
        sc AS (SELECT dt.doc_id,
                 SUM(idf * CAST(
                   (CAST(f AS DOUBLE) * 2.25)
                   / (CAST(f AS DOUBLE)
                      + 1.25 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                                / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))))
                   AS DECIMAL(18,8))) AS sdec
               FROM dt JOIN dl USING (doc_id) JOIN idf USING (tok)
               CROSS JOIN stats GROUP BY 1)
        SELECT d.doc_id, ROUND(COALESCE(CAST(sdec AS DOUBLE), 0.0), 4) AS bm25
        FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        ORDER BY d.doc_id""")) { t =>
    TextAnalysis.bm25Score(
      t.documents, queryTerms = Seq("spark", "join", "window", "shuffle"))
      .orderBy("doc_id")
  }

  // p07 — SOFT deduplication weights (the SoftDeDup / sampling-weight
  // alternative to p01's hard drop): every document keeps a row, near-dup
  // cluster members are downweighted to 1/|cluster| so each cluster
  // contributes one document's worth of expected training mass. The oracle
  // recomputes the full chain — exact-Jaccard pairs, recursive connected
  // components, cluster sizes, corpus left join — so a wrong cluster size
  // or a singleton misweighted hash-fails.
  private val p07 = q("p07_softdedup_weights", Some(
    s"""WITH RECURSIVE sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        qual AS (
          SELECT doc_a, doc_b FROM inter
          JOIN counts ca ON doc_a = ca.doc_id
          JOIN counts cb ON doc_b = cb.doc_id
          WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.8),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM qual
                  UNION SELECT doc_b, doc_a FROM qual),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        nodes AS (SELECT DISTINCT a FROM edges),
        cl AS (SELECT n.a AS doc_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
               FROM nodes n LEFT JOIN reach r ON r.a = n.a GROUP BY n.a),
        sz AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
               FROM cl GROUP BY 1)
        SELECT d.doc_id,
          COALESCE(sz.cluster_size, 1) AS cluster_size,
          1.0 / CAST(COALESCE(sz.cluster_size, 1) AS DOUBLE) AS weight
        FROM documents d
        LEFT JOIN cl ON d.doc_id = cl.doc_id
        LEFT JOIN sz ON cl.rep = sz.rep
        ORDER BY d.doc_id""")) { t =>
    Curation.softDedupWeights(t.documents, threshold = 0.8).orderBy("doc_id")
  }

  // p08 — the soft-dedup weights APPLIED: p07's 1/|cluster| acceptance
  // probabilities through the per-row deterministic hash gate, so a
  // cluster of n near-dups keeps Binomial(n, 1/n) members — one in
  // expectation — while singletons pass unconditionally (weight 1.0 rides
  // the 'g000' keep-all sentinel). The oracle recomputes the whole chain
  // including the md5 gate, so a hash, threshold, or boundary divergence
  // hash-fails.
  private val p08 = q("p08_softdedup_sample", Some(
    s"""WITH RECURSIVE sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        qual AS (
          SELECT doc_a, doc_b FROM inter
          JOIN counts ca ON doc_a = ca.doc_id
          JOIN counts cb ON doc_b = cb.doc_id
          WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.8),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM qual
                  UNION SELECT doc_b, doc_a FROM qual),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        nodes AS (SELECT DISTINCT a FROM edges),
        cl AS (SELECT n.a AS doc_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
               FROM nodes n LEFT JOIN reach r ON r.a = n.a GROUP BY n.a),
        sz AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
               FROM cl GROUP BY 1),
        w AS (
          SELECT d.doc_id,
            COALESCE(sz.cluster_size, 1) AS cluster_size,
            1.0 / CAST(COALESCE(sz.cluster_size, 1) AS DOUBLE) AS weight
          FROM documents d
          LEFT JOIN cl ON d.doc_id = cl.doc_id
          LEFT JOIN sz ON cl.rep = sz.rep)
        SELECT doc_id, cluster_size, weight FROM w
        WHERE ${Sampling.sqlHashBucket("doc_id", "soft")}
              < ${Sampling.sqlWeightThreshold("weight")}
        ORDER BY doc_id""")) { t =>
    Sampling.weightedSample(
      Curation.softDedupWeights(t.documents, threshold = 0.8),
      idCol = "doc_id", weightCol = "weight", salt = "soft")
      .orderBy("doc_id")
  }

  // x29 — EXACT heavy hitters without a distinct-key shuffle: per-partition
  // Misra-Gries candidates (bounded at partitions·⌈1/support⌉ — MG's drop
  // bound makes the union a provable superset of every ≥-support value) +
  // an exact broadcast-semi-join recount that removes the false positives.
  // support 0.2 over the language column is discriminating on this corpus:
  // only 'en' (~44%) qualifies; the tail languages (~13-15%) must NOT
  // appear even though MG certainly emitted them as candidates.
  private val x29 = q("x29_heavy_hitters", Some(
    """SELECT lang AS value, CAST(COUNT(*) AS BIGINT) AS n
       FROM documents GROUP BY 1
       HAVING CAST(COUNT(*) AS DOUBLE)
              >= 0.2 * (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents)
       ORDER BY value""")) { t =>
    graft.operators.HeavyHitters.frequentItems(t.documents, "lang", support = 0.2)
      .orderBy("value")
  }

  // x21 — the Gopher quality-rule battery (Rae et al. 2021): per-document
  // boolean verdicts (word count, mean word length, symbol ratio,
  // alpha-word fraction, stopword presence) + the integer-ratio metrics
  // behind them. Pure narrow map; every ratio is one double division of
  // integer counts, so the verdicts are bit-stable cross-engine.
  private val x21 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    q("x21_gopher_rules", Some(
      s"""WITH base AS (
            SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS w
            FROM documents),
          m AS (
            SELECT doc_id,
              CAST(len(w) AS INT) AS n_words,
              CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS sum_word_len,
              CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS INT) AS n_alpha_words,
              CAST(len(text) - len(replace(text, '#', '')) AS INT)
                + CAST((len(text) - len(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS INT)
                AS n_symbols,
              CAST(len(list_filter(list_distinct(w), x -> x IN ($enStops))) AS INT)
                AS n_stop_distinct
            FROM base),
          s AS (
            SELECT *,
              CAST(sum_word_len AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
              CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE) AS symbol_ratio,
              CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS alpha_frac
            FROM m)
          SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stop_distinct,
            (n_words BETWEEN 50 AND 100000) AS ok_word_count,
            (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS ok_mean_word_len,
            (symbol_ratio < 0.1) AS ok_symbol_ratio,
            (alpha_frac > 0.8) AS ok_alpha_words,
            (n_stop_distinct >= 2) AS ok_stopwords,
            ((n_words BETWEEN 50 AND 100000) AND mean_word_len >= 3.0
              AND mean_word_len <= 10.0 AND symbol_ratio < 0.1
              AND alpha_frac > 0.8 AND n_stop_distinct >= 2) AS keep_doc
          FROM s ORDER BY doc_id""")) { t =>
      TextAnalysis.gopherRules(t.documents).orderBy("doc_id")
    }
  }

  // x23 — the LINE-granularity Gopher rules (Rae et al. 2021 §A.1.1),
  // completing x21's battery: bullet-start and ellipsis-end line fractions
  // over a multi-line fixture corpus (the driver's documents table has no
  // newline structure — VERDICT r10 "What's missing" #3). Same determinism
  // treatment as x21: integer counts, one double division each, verdicts
  // vs rational constants; split keeps trailing empties in both engines.
  private val x23 = {
    val fixture = "/root/repo/fixtures/documents_multiline.jsonl"
    q("x23_gopher_line_rules", Some(
      s"""WITH base AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls
            FROM read_json('$fixture', format='newline_delimited',
                 columns={doc_id: 'BIGINT', text: 'VARCHAR'})),
          m AS (
            SELECT doc_id,
              CAST(len(ls) AS INT) AS n_lines,
              CAST(len(list_filter(ls, x -> regexp_matches(x, '^\\s*[-*•]\\s+'))) AS INT)
                AS n_bullet_lines,
              CAST(len(list_filter(ls, x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$$'))) AS INT)
                AS n_ellipsis_lines
            FROM base),
          s AS (
            SELECT *,
              CAST(n_bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) AS bullet_frac,
              CAST(n_ellipsis_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) AS ellipsis_frac
            FROM m)
          SELECT doc_id, n_lines, n_bullet_lines, n_ellipsis_lines,
            bullet_frac, ellipsis_frac,
            (bullet_frac <= 0.9) AS ok_bullet_lines,
            (ellipsis_frac <= 0.3) AS ok_ellipsis_lines,
            (bullet_frac <= 0.9 AND ellipsis_frac <= 0.3) AS keep_doc
          FROM s ORDER BY doc_id""")) { t =>
      val docs = t.spark.read.schema("doc_id LONG, text STRING").json(fixture)
      TextAnalysis.gopherLineRules(docs).orderBy("doc_id")
    }
  }

  // d14 — incremental EXACT dedup through a Bloom-filter pre-filter (the
  // semi-join pushdown shape): batch docs (doc_id % 3 = 0) that are NOT
  // already in the corpus by normalized fingerprint. The bloom path's
  // false positives die in the confirming anti-join, so the plain
  // anti-join oracle covers it exactly.
  private val d14 = q("d14_incremental_dedup_bloom", Some(
    s"""WITH f AS (SELECT doc_id, md5(${TextFns.sqlNormalized("text")}) AS fingerprint
                   FROM documents),
        n AS (SELECT doc_id, fingerprint FROM f WHERE doc_id % 3 = 0),
        c AS (SELECT fingerprint FROM f WHERE doc_id % 3 <> 0)
        SELECT n.doc_id, n.fingerprint FROM n
        WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.fingerprint = n.fingerprint)
        ORDER BY doc_id""")) { t =>
    Dedup.incrementalExactBloom(
      t.documents.filter(col("doc_id") % 3 === 0),
      t.documents.filter(col("doc_id") % 3 =!= 0),
      expectedItems = 1000000L)
      .orderBy("doc_id")
  }

  // Shared oracle prelude for d15/d16: positional 8-gram shingles with
  // multiplicity (1-based positions; docs under 8 tokens contribute none).
  private val sqlPositionalShingles8 =
    s"""t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents),
        sh AS (SELECT doc_id, unnest(generate_series(1, len(w) - 7)) AS pos, w
               FROM t WHERE len(w) >= 8),
        s2 AS (SELECT doc_id, pos, array_to_string(w[pos:pos+7], ' ') AS shingle FROM sh)"""

  // d15 — EXACT-SUBSTRING duplicate spans (Lee et al. 2022 §4.1, the
  // ExactSubstr audit view re-expressed relationally): maximal runs of
  // tokens covered by 8-gram shingles occurring >1 time in the corpus
  // (within-doc repeats included). Coverage runs merge marks with gap ≤ k
  // (a break at gap > k is exactly an uncovered token); the run window
  // partitions by doc_id — unbounded cardinality, no single-task funnel.
  private val d15 = q("d15_duplicate_spans", Some(
    s"""WITH $sqlPositionalShingles8,
        dup AS (SELECT shingle FROM s2 GROUP BY shingle HAVING COUNT(*) > 1),
        m AS (SELECT s2.doc_id, s2.pos FROM s2 JOIN dup USING (shingle)),
        l AS (SELECT doc_id, pos,
                LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS lagpos FROM m),
        g AS (SELECT doc_id, pos,
                SUM(CASE WHEN lagpos IS NULL OR pos - lagpos > 8 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
              FROM l)
        SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
               CAST(MAX(pos) + 7 AS INT) AS span_end,
               CAST(MAX(pos) + 8 - MIN(pos) AS INT) AS n_tokens
        FROM g GROUP BY doc_id, grp
        ORDER BY doc_id, span_start""")) { t =>
    Dedup.duplicateSpans(t.documents, k = 8).orderBy("doc_id", "span_start")
  }

  // d16 — exact substring dedup as a FILTER (keep-first): every redundant
  // duplicated occurrence's tokens are removed; the corpus-first occurrence
  // (min packed (doc_id, pos) key — ONE map-side-combined integer MIN, no
  // per-shingle rank window to funnel hot boilerplate) survives. Emits
  // every document (0 removed → text round-trips modulo tokenization).
  private val d16 = q("d16_exact_substring_dedup", Some(
    s"""WITH $sqlPositionalShingles8,
        occ AS (SELECT doc_id, pos, shingle, doc_id * 1048576 + pos AS okey FROM s2),
        f AS (SELECT shingle, MIN(okey) AS first_key
              FROM occ GROUP BY shingle HAVING COUNT(*) > 1),
        red AS (SELECT o.doc_id, unnest(generate_series(o.pos, o.pos + 7)) AS tpos
                FROM occ o JOIN f USING (shingle) WHERE o.okey <> f.first_key),
        cov AS (SELECT doc_id, list_sort(list(DISTINCT tpos)) AS cl FROM red GROUP BY doc_id)
        SELECT t.doc_id,
          CAST(CASE WHEN cov.cl IS NULL THEN 0 ELSE len(cov.cl) END AS INT) AS n_tokens_removed,
          COALESCE(array_to_string(list_filter(t.w,
            (x, i) -> cov.cl IS NULL OR NOT list_contains(cov.cl, i)), ' '), '')
            AS clean_text
        FROM t LEFT JOIN cov USING (doc_id)
        ORDER BY doc_id""")) { t =>
    Dedup.removeDuplicateSpans(t.documents, k = 8).orderBy("doc_id")
  }

  // d25 — d16's 100 TB form: the ROLLING-HASH shuffle key (VERDICT r11
  // #2). Shingle strings never reach an exchange — each occurrence
  // shuffles its 8-byte polynomial hash (the x07 fold, mod 2^53-111, so
  // both engines compute identical values and the oracle stays
  // hash-exact); ~k× less shuffle volume, identical keep-first span
  // semantics. PlanSpec pins that no exchange carries a shingle string.
  private val d25 = q("d25_substring_dedup_hashed", Some(
    s"""WITH $sqlPositionalShingles8,
        occ AS (SELECT doc_id, pos,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(split(shingle, ''), c -> CAST(ascii(c) AS BIGINT))),
                  (h, c) -> (h * 31 + c) % ${TextAnalysis.RollMod}) AS hsh,
                doc_id * 1048576 + pos AS okey FROM s2),
        f AS (SELECT hsh, MIN(okey) AS first_key
              FROM occ GROUP BY hsh HAVING COUNT(*) > 1),
        red AS (SELECT o.doc_id, unnest(generate_series(o.pos, o.pos + 7)) AS tpos
                FROM occ o JOIN f USING (hsh) WHERE o.okey <> f.first_key),
        cov AS (SELECT doc_id, list_sort(list(DISTINCT tpos)) AS cl FROM red GROUP BY doc_id)
        SELECT t.doc_id,
          CAST(CASE WHEN cov.cl IS NULL THEN 0 ELSE len(cov.cl) END AS INT) AS n_tokens_removed,
          COALESCE(array_to_string(list_filter(t.w,
            (x, i) -> cov.cl IS NULL OR NOT list_contains(cov.cl, i)), ' '), '')
            AS clean_text
        FROM t LEFT JOIN cov USING (doc_id)
        ORDER BY doc_id""")) { t =>
    Dedup.removeDuplicateSpansHashed(t.documents, k = 8).orderBy("doc_id")
  }

  // d26 — d15's 100 TB form (the d25 treatment applied to the AUDIT
  // view): the duplicated-shingle set keys on the 8-byte rolling hash, so
  // no exchange carries shingle text; span semantics identical, oracle
  // hash-exact via the engine-portable fold.
  private val d26 = q("d26_duplicate_spans_hashed", Some(
    s"""WITH $sqlPositionalShingles8,
        occ AS (SELECT doc_id, pos,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(split(shingle, ''), c -> CAST(ascii(c) AS BIGINT))),
                  (h, c) -> (h * 31 + c) % ${TextAnalysis.RollMod}) AS hsh
                FROM s2),
        dup AS (SELECT hsh FROM occ GROUP BY hsh HAVING COUNT(*) > 1),
        m AS (SELECT occ.doc_id, occ.pos FROM occ JOIN dup USING (hsh)),
        l AS (SELECT doc_id, pos,
                LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS lagpos FROM m),
        g AS (SELECT doc_id, pos,
                SUM(CASE WHEN lagpos IS NULL OR pos - lagpos > 8 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
              FROM l)
        SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
               CAST(MAX(pos) + 7 AS INT) AS span_end,
               CAST(MAX(pos) + 8 - MIN(pos) AS INT) AS n_tokens
        FROM g GROUP BY doc_id, grp
        ORDER BY doc_id, span_start""")) { t =>
    Dedup.duplicateSpansHashed(t.documents, k = 8).orderBy("doc_id", "span_start")
  }

  // d17 — EXACT LINE-LEVEL dedup, keep-first (the Dolma/CCNet stage
  // between document and substring dedup), over the multi-line fixture
  // corpus (the synthetic documents table has no newline structure):
  // corpus-duplicated lines survive only at their corpus-first
  // (doc_id, line_no); every doc is emitted with its surviving lines in
  // order. Same packed-key MIN shape as d16 — no per-line rank window.
  private val d17 = {
    val fixture = "/root/repo/fixtures/documents_multiline.jsonl"
    q("d17_line_dedup", Some(
      s"""WITH t AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls
            FROM read_json('$fixture', format='newline_delimited',
                 columns={doc_id: 'BIGINT', text: 'VARCHAR'})),
          l AS (SELECT doc_id, unnest(generate_series(1, len(ls))) AS line_no, ls FROM t),
          o AS (SELECT doc_id, line_no, ls[line_no] AS line,
                       doc_id * 1048576 + line_no AS okey FROM l),
          f AS (SELECT line, MIN(okey) AS first_key
                FROM o GROUP BY line HAVING COUNT(*) > 1),
          red AS (SELECT o.doc_id, o.line_no FROM o JOIN f USING (line)
                  WHERE o.okey <> f.first_key),
          rl AS (SELECT doc_id, list_sort(list(line_no)) AS rl FROM red GROUP BY doc_id)
          SELECT t.doc_id,
            CAST(CASE WHEN rl.rl IS NULL THEN 0 ELSE len(rl.rl) END AS INT)
              AS n_lines_removed,
            COALESCE(array_to_string(list_filter(t.ls,
              (x, i) -> rl.rl IS NULL OR NOT list_contains(rl.rl, i)), chr(10)), '')
              AS clean_text
          FROM t LEFT JOIN rl USING (doc_id)
          ORDER BY doc_id""")) { t =>
      val docs = t.spark.read.schema("doc_id LONG, text STRING").json(fixture)
      Dedup.dedupLines(docs).orderBy("doc_id")
    }
  }

  // e14 — per-user inter-arrival stats (activity cadence: engagement /
  // bot-detection / churn features): consecutive-event gaps in integer
  // microseconds, rolled up to count / min / max / exact interpolated
  // median (emitted in µs — exact in double, so no rounding needed).
  // One user_id shuffle feeds window AND rollup.
  private val e14 = q("e14_interarrival", Some(
    """WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
          FROM events)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap) AS BIGINT) AS max_gap_us,
               CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap) AS DOUBLE)
                 AS median_gap_us
        FROM g WHERE gap IS NOT NULL
        GROUP BY user_id ORDER BY user_id""")) { t =>
    Events.interarrivalStats(eventsTs(t)).orderBy("user_id")
  }

  // e17 — first-order event-transition matrix (path analysis: "what do
  // users do next after X"): per-user time-ordered consecutive type pairs
  // (user_id-partitioned LAG, event_id tie-break), corpus rollup to
  // (prev, next) counts + row-normalized transition probability (one
  // double division of exact counts; |types|-sized broadcast normalizer).
  private val e17 = q("e17_event_transitions", Some(
    """WITH s AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS prev_type
          FROM events),
        p AS (SELECT prev_type, event_type AS next_type,
                     CAST(COUNT(*) AS BIGINT) AS n_transitions
              FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT prev_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from
              FROM p GROUP BY 1)
        SELECT p.prev_type, p.next_type, p.n_transitions,
               CAST(p.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p_transition
        FROM p JOIN t USING (prev_type)
        ORDER BY prev_type, next_type""")) { t =>
    Events.eventTransitions(eventsTs(t)).orderBy("prev_type", "next_type")
  }

  // x22 — bigram-LM surprisal (KenLM-style conditional scoring, x16's
  // transition-probability upgrade): avg −ln c(w1 w2)/c(w1 ·) per doc.
  // Same determinism treatment as x16: quantized ln LUT, exact decimal
  // accumulation, one final division + ROUND(4).
  private val x22 = q("x22_bigram_surprisal", Some(
    """WITH db AS (
          SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1])) AS bg
                FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
                      FROM documents) z0) z
          GROUP BY 1, 2),
        bf AS (SELECT bg, CAST(SUM(c) AS BIGINT) AS n_bg FROM db GROUP BY 1),
        cf AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(n_bg) AS BIGINT) AS n_ctx
               FROM bf GROUP BY 1),
        lut AS (SELECT bg,
                  CAST(ln(CAST(n_ctx AS DOUBLE) / CAST(n_bg AS DOUBLE)) AS DECIMAL(18,8)) AS lnv
                FROM bf JOIN cf ON string_split(bg, ' ')[1] = cf.w1)
        SELECT db.doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               ROUND(CAST(SUM(c * lnv) AS DOUBLE) / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE), 4)
                 AS bg_surprisal
        FROM db JOIN lut USING (bg)
        GROUP BY 1 ORDER BY doc_id""")) { t =>
    TextAnalysis.bigramSurprisal(t.documents).orderBy("doc_id")
  }

  // x24 — CROSS-CORPUS bigram scoring with STUPID BACKOFF (Brants et al.
  // 2007; the CCNet shape: a reference half trains the model, the other
  // half is scored against it, so unseen bigrams/words exercise the
  // α-discounted unigram and OOV-floor tiers). Same determinism treatment
  // as x16/x22: per-model-entry quantized-ln LUTs, exact decimal
  // accumulation, one division + ROUND(4).
  private val x24 = q("x24_stupid_backoff", Some(
    """WITH mw AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
                   FROM documents WHERE doc_id % 2 = 0),
        sw AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
               FROM documents WHERE doc_id % 2 = 1),
        mb AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1])) AS bg FROM mw),
        bf AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_bg FROM mb GROUP BY 1),
        cf AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(n_bg) AS BIGINT) AS n_ctx
               FROM bf GROUP BY 1),
        bglut AS (SELECT bg,
                    CAST(ln(CAST(n_ctx AS DOUBLE) / CAST(n_bg AS DOUBLE)) AS DECIMAL(18,8)) AS ln_bg
                  FROM bf JOIN cf ON string_split(bg, ' ')[1] = cf.w1),
        mu AS (SELECT unnest(w) AS tok FROM mw),
        uf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_w FROM mu GROUP BY 1),
        nt AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_tok FROM uf),
        unilut AS (SELECT tok AS w2,
                     CAST(ln(2.5 * CAST(n_tok AS DOUBLE) / CAST(n_w AS DOUBLE)) AS DECIMAL(18,8)) AS ln_uni
                   FROM uf, nt),
        oov AS (SELECT CAST(ln(2.5 * CAST(n_tok AS DOUBLE)) AS DECIMAL(18,8)) AS ln_oov FROM nt),
        db AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c
               FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1])) AS bg FROM sw) z
               GROUP BY 1, 2)
        SELECT db.doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
          ROUND(CAST(SUM(c * COALESCE(ln_bg, ln_uni, ln_oov)) AS DOUBLE)
                / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE), 4) AS sb_surprisal
        FROM db LEFT JOIN bglut USING (bg)
        LEFT JOIN unilut ON string_split(db.bg, ' ')[2] = unilut.w2
        CROSS JOIN oov
        GROUP BY 1 ORDER BY doc_id""")) { t =>
    TextAnalysis.stupidBackoffScore(
      t.documents.filter(col("doc_id") % 2 === 1),
      t.documents.filter(col("doc_id") % 2 === 0))
      .orderBy("doc_id")
  }

  // e15 — per-day top-3 event types by volume (deterministic ties by type
  // name): the per-group top-k ranking runs over the pre-aggregated
  // (day, type) frame, never event-sized data.
  private val e15 = q("e15_daily_top_types", Some(
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type,
                        CAST(COUNT(*) AS BIGINT) AS n_events
                      FROM events GROUP BY 1, 2),
        r AS (SELECT *, CAST(row_number() OVER
                (PARTITION BY day ORDER BY n_events DESC, event_type) AS INT) AS rnk
              FROM daily)
        SELECT day, event_type, n_events, rnk FROM r WHERE rnk <= 3
        ORDER BY day, rnk""")) { t =>
    Events.dailyTopTypes(eventsTs(t), k = 3).orderBy("day", "rnk")
  }

  // e16 — signup→purchase conversion latency per signup-day cohort (e04's
  // funnel + the time dimension): integer-µs lags, exact median per cohort
  // (e14's un-divided-median determinism treatment).
  private val e16 = q("e16_conversion_lag", Some(
    """WITH f AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
          FROM events GROUP BY user_id),
        c AS (SELECT CAST(first_signup AS DATE) AS cohort_day,
                     epoch_us(first_purchase) - epoch_us(first_signup) AS lag_us
              FROM f
              WHERE first_signup IS NOT NULL AND first_purchase >= first_signup)
        SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_converted,
               CAST(MIN(lag_us) AS BIGINT) AS min_lag_us,
               CAST(MAX(lag_us) AS BIGINT) AS max_lag_us,
               CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY lag_us) AS DOUBLE)
                 AS median_lag_us
        FROM c GROUP BY cohort_day ORDER BY cohort_day""")) { t =>
    Events.conversionLag(eventsTs(t)).orderBy("cohort_day")
  }

  // d27 — d17's 100 TB form (the d25/d26 treatment at LINE granularity):
  // lines hash map-side through the poly_hash fold and only the 8-byte
  // key reaches the count/join exchanges — line text never shuffles;
  // keep-first semantics identical, oracle hash-exact via the same
  // engine-portable fold over each line.
  private val d27 = {
    val fixture = "/root/repo/fixtures/documents_multiline.jsonl"
    q("d27_line_dedup_hashed", Some(
      s"""WITH t AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls
            FROM read_json('$fixture', format='newline_delimited',
                 columns={doc_id: 'BIGINT', text: 'VARCHAR'})),
          l AS (SELECT doc_id, unnest(generate_series(1, len(ls))) AS line_no, ls FROM t),
          o AS (SELECT doc_id, line_no,
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(split(ls[line_no], ''), c -> CAST(ascii(c) AS BIGINT))),
                         (h, c) -> (h * 31 + c) % ${TextAnalysis.RollMod}) AS lh,
                       doc_id * 1048576 + line_no AS okey FROM l),
          f AS (SELECT lh, MIN(okey) AS first_key
                FROM o GROUP BY lh HAVING COUNT(*) > 1),
          red AS (SELECT o.doc_id, o.line_no FROM o JOIN f USING (lh)
                  WHERE o.okey <> f.first_key),
          rl AS (SELECT doc_id, list_sort(list(line_no)) AS rl FROM red GROUP BY doc_id)
          SELECT t.doc_id,
            CAST(CASE WHEN rl.rl IS NULL THEN 0 ELSE len(rl.rl) END AS INT)
              AS n_lines_removed,
            COALESCE(array_to_string(list_filter(t.ls,
              (x, i) -> rl.rl IS NULL OR NOT list_contains(rl.rl, i)), chr(10)), '')
              AS clean_text
          FROM t LEFT JOIN rl USING (doc_id)
          ORDER BY doc_id""")) { t =>
      val docs = t.spark.read.schema("doc_id LONG, text STRING").json(fixture)
      Dedup.dedupLinesHashed(docs).orderBy("doc_id")
    }
  }

  // d18 — embedding-space decontamination (the semantic twin of d06's
  // n-gram benchmark decontamination, for paraphrased eval leakage that
  // shares no shingle): corpus vectors whose MAX cosine against the
  // broadcast benchmark subset (vec_id % 100 = 0) reaches 0.3, with the
  // count of matching benchmark vectors. The oracle recomputes every
  // pairwise cosine, the max/count aggregate, and the threshold boundary —
  // both engines fold the dot left-to-right in double (s01's bit-identical
  // contract), so a single mis-scored pair hash-fails.
  private val d18 = q("d18_semantic_decontaminate", Some(
    """WITH b AS (SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS be
                  FROM embeddings WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
              FROM embeddings WHERE vec_id % 100 <> 0),
        p AS (SELECT vec_id,
                list_dot_product(ce, be) /
                (sqrt(list_dot_product(ce, ce)) * sqrt(list_dot_product(be, be))) AS cos
              FROM c, b),
        a AS (SELECT vec_id, max(cos) AS max_cos,
                CAST(sum(CASE WHEN cos >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_bench_hits
              FROM p GROUP BY vec_id)
        SELECT vec_id, max_cos, n_bench_hits FROM a WHERE max_cos >= 0.3
        ORDER BY vec_id""")) { t =>
    Similarity.semanticDecontaminate(t.embeddings, col("vec_id") % 100 === 0,
      threshold = 0.3).orderBy("vec_id")
  }

  // p09 — exact-budget weighted corpus selection: EXACTLY k = 100 documents
  // drawn with probability ∝ token count via Efraimidis–Spirakis priority
  // sampling (deterministic u from the salted id hash, priority u^(1/w),
  // distributed top-k — see Sampling.prioritySample). p08's Bernoulli gate
  // hits a budget only in expectation; this is the fixed-budget twin. The
  // oracle recomputes u, the pow key, and the top-100 boundary with the
  // (priority DESC, doc_id) total order, so a hash, arithmetic, or
  // tie-break divergence hash-fails.
  private val p09 = q("p09_priority_sample", Some(
    s"""WITH w AS (SELECT doc_id,
            CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tok
          FROM documents),
        p AS (SELECT doc_id, n_tok,
            ${Sampling.sqlPriority("doc_id", "n_tok", "prio")} AS priority
          FROM w WHERE n_tok > 0)
        SELECT doc_id, n_tok, priority FROM p
        ORDER BY priority DESC, doc_id LIMIT 100""")) { t =>
    Sampling.prioritySample(
      t.documents.select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tok")),
      idCol = "doc_id", weightCol = "n_tok", k = 100)
  }

  // x30 — BPE vocabulary learning (Sennrich et al. 2016): the first 10
  // merges trained from the corpus word-frequency table (the classic scale
  // trick — iterations run over |vocab| rows, the corpus shuffles once).
  // Registered through the BATCHED trainer (VERDICT r11 #4: top-B
  // symbol-disjoint merges per driver round-trip, guard-proven equal to
  // sequential) — the oracle still replays SEQUENTIAL training as an
  // unrolled CTE chain (pair counts, (cnt desc, l, r) argmax, greedy
  // left-to-right fold), so the batching exactness claim itself is what
  // hash-verifies here; a single divergent merge anywhere hash-fails.
  private val x30 = q("x30_bpe_merges",
    Some(Bpe.sqlMerges("documents", "text", numMerges = 10))) { t =>
    Bpe.trainBatched(t.documents, numMerges = 10, batch = 8)
      .mergesDf(t.documents.sparkSession)
      .orderBy("merge_rank")
  }

  // x31 — BPE tokenization through the trained vocabulary CACHE: per-doc
  // symbol counts come from one word explode + a broadcast join against
  // the |vocab|-row final symbol table — the corpus never runs the merge
  // fold (production tokenizer-application shape). Oracle: replay
  // sequential training, join the final symbol stage (the batched
  // trainer's final vocab must agree symbol-for-symbol).
  private val x31 = q("x31_bpe_tokenize",
    Some(Bpe.sqlTokenCounts("documents", "text", numMerges = 10))) { t =>
    Bpe.tokenCounts(t.documents,
      Bpe.trainBatched(t.documents, numMerges = 10, batch = 8))
      .orderBy("doc_id")
  }

  // x51 — the RELAXED batched BPE trainer through the correctness gate
  // (VERDICT r14 #7: the production 32k-vocab path shipped in r14 with
  // spec pins but no oracled def). The oracle independently replays the
  // relaxed loop — ranked candidate window at the collect's exact horizon,
  // the sequential symbol-disjoint admission scan, the one-pass batch fold
  // — so a divergence in ANY admitted merge, its rank, or its winning
  // count hash-fails. The unrolled SQL assumes full rounds
  // (rounds = merges/batch); the Spark side REQUIREs the realized shape so
  // a corpus where admission stalls fails loudly instead of silently
  // drifting from the oracle (Bpe.sqlMergesRelaxed scaladoc).
  private val x51 = q("x51_bpe_merges_relaxed",
    Some(Bpe.sqlMergesRelaxed("documents", "text", numMerges = 8, batch = 4))) { t =>
    val (model, rounds) =
      Bpe.trainBatchedRelaxedCounted(t.documents, numMerges = 8, batch = 4)
    require(rounds == 2 && model.merges.size == 8,
      s"x51 static-oracle contract violated: rounds=$rounds " +
        s"merges=${model.merges.size} (expected 2 full rounds of 4)")
    model.mergesDf(t.documents.sparkSession).orderBy("merge_rank")
  }

  // x50 — interpolated KNESER-NEY bigram surprisal (the smoothing KenLM
  // ships — what CCNet-style perplexity filters actually run; x24's
  // stupid backoff is the cheap foil): unseen-pair mass comes from the
  // CONTINUATION distribution N1+(·w)/B, so a frequent-but-predictable
  // word ("Francisco", only ever after "San") backs off near zero where
  // count-based smoothing overrates it. D = 3/4 clears every probability
  // to a ratio of two exact BIGINTs ((4c−3)·B + 3·N1p(u)·Ncont(w) over
  // 4·B·c(u)); per-context normalization Σ_w P(w|u) = 1 is spec-pinned.
  // Determinism is the x16/x24 treatment (integer-ratio doubles, one ln,
  // DECIMAL(18,8) quantize, exact accumulation, ONE ROUND(4)); the
  // oracle replays train counts, all three KN statistics, the scoring
  // ladder, and the fold verbatim. Train = even docs, score = odd docs.
  private val x50 = q("x50_kneser_ney", Some(
    """WITH mw AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
                   FROM documents WHERE doc_id % 2 = 0),
        sw AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
               FROM documents WHERE doc_id % 2 = 1),
        mb AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1])) AS bg FROM mw),
        bf AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_bg FROM mb GROUP BY 1),
        bfs AS (SELECT bg, n_bg, string_split(bg, ' ')[1] AS w1,
                       string_split(bg, ' ')[2] AS w2 FROM bf),
        ctx AS (SELECT w1, CAST(SUM(n_bg) AS BIGINT) AS n_ctx,
                       CAST(COUNT(*) AS BIGINT) AS n1p FROM bfs GROUP BY 1),
        cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_cont FROM bfs GROUP BY 1),
        nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM bf),
        bglut AS (SELECT bg,
                    CAST(ln(CAST(4 * b * n_ctx AS DOUBLE) /
                            CAST((4 * n_bg - 3) * b + 3 * n1p * n_cont AS DOUBLE))
                      AS DECIMAL(18,8)) AS ln_kn
                  FROM bfs JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN nb),
        oov AS (SELECT CAST(ln(CAST(4 * b AS DOUBLE)) AS DECIMAL(18,8)) AS ln_oov FROM nb),
        db AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c
               FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1])) AS bg FROM sw) z
               GROUP BY 1, 2),
        sc AS (SELECT db.doc_id, db.c,
                 COALESCE(bglut.ln_kn,
                   CASE WHEN ctx.n_ctx IS NOT NULL AND cont.n_cont IS NOT NULL
                        THEN CAST(ln(CAST(4 * nb.b * ctx.n_ctx AS DOUBLE) /
                                     CAST(3 * ctx.n1p * cont.n_cont AS DOUBLE))
                               AS DECIMAL(18,8))
                        ELSE oov.ln_oov END) AS lnv
               FROM db LEFT JOIN bglut USING (bg)
               LEFT JOIN ctx ON string_split(db.bg, ' ')[1] = ctx.w1
               LEFT JOIN cont ON string_split(db.bg, ' ')[2] = cont.w2
               CROSS JOIN nb CROSS JOIN oov)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               ROUND(CAST(SUM(c * lnv) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 4) AS kn_surprisal
        FROM sc GROUP BY 1 ORDER BY doc_id""")) { t =>
    TextAnalysis.kneserNeyScore(
      t.documents.filter(col("doc_id") % 2 === 1),
      t.documents.filter(col("doc_id") % 2 === 0))
      .orderBy("doc_id")
  }

  // x49 — tokenizer FERTILITY per language (the mixture-design metric a
  // multilingual tokenizer is judged by): BPE symbols per whitespace word
  // + bytes per symbol, rolled up by the corpus's language tag (en
  // fertility anchors low — the merges train on the en-dominated corpus;
  // zh pays the most positions per word). The word explode joins the
  // broadcast vocab, the language tag rides the doc_id equi-join,
  // everything collapses to a |langs|-keyed rollup; ratios are single
  // double divisions of exact integer sums. Oracle: x31's
  // sequential-unrolled training chain feeding the same per-word symbol
  // counts, joined to the lang column.
  private val x49 = q("x49_tokenizer_fertility", Some(
    s"""${Bpe.sqlTrainChain("documents", "text", 10)},
        dw AS (SELECT doc_id, word
               FROM (SELECT doc_id,
                       unnest(string_split_regex(lower(text), '\\s+')) AS word
                     FROM documents) z
               WHERE len(word) > 0),
        ws AS (SELECT dw.doc_id, CAST(len(s.syms) AS BIGINT) AS n_syms,
                      CAST(strlen(dw.word) AS BIGINT) AS nb
               FROM dw JOIN s10 s ON dw.word = s.word)
        SELECT d.lang,
               CAST(COUNT(DISTINCT ws.doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(n_syms) AS BIGINT) AS n_symbols,
               CAST(SUM(nb) AS BIGINT) AS n_bytes,
               CAST(SUM(n_syms) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility,
               CAST(SUM(nb) AS DOUBLE) / CAST(SUM(n_syms) AS DOUBLE) AS bytes_per_symbol
        FROM ws JOIN documents d ON ws.doc_id = d.doc_id
        GROUP BY 1 ORDER BY 1""")) { t =>
    TextAnalysis.tokenizerFertility(t.documents,
      Bpe.trainBatched(t.documents, numMerges = 10, batch = 8))
      .orderBy("lang")
  }

  // p10 — per-source exact-quota WEIGHTED selection: exactly 15 documents
  // per source drawn with probability ∝ token count (x19's uniform quota
  // with Efraimidis–Spirakis weights; TopKPerGroup keeps a hot source off
  // a single task's window). The oracle recomputes the priorities and the
  // per-source rank boundary with the same total order.
  // p11 — DoReMi-style domain reweighting (Xie et al. 2023): one
  // multiplicative-weights round over the source mixture — domains whose
  // text the reference (corpus-unigram) model finds harder than average
  // get up-weighted from the token-share baseline, w_s ∝ n_tokens_s ·
  // exp(0.1·(L_s − L̄)), normalized. The complement of p04's temperature
  // mix (a FIXED flattening): DoReMi moves weight by measured model
  // difficulty, the modern mixture-design loop. Exact decimal loss sums
  // off the x16 LUT, one exp per DOMAIN quantized DECIMAL(18,12), exact
  // decimal normalizer, one double division per output; the oracle
  // replays the LM, both loss levels, the update, and the normalization.
  private val p11 = q("p11_doremi_weights", Some(
    """WITH dt AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) z
          GROUP BY 1, 2),
        freq AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS n_w FROM dt GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM freq),
        lut AS (SELECT tok,
                  CAST(ln(CAST(n_total AS DOUBLE) / CAST(n_w AS DOUBLE)) AS DECIMAL(18,8)) AS lnv
                FROM freq, tot),
        pd AS (SELECT dt.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, SUM(c * lnv) AS sdec
               FROM dt JOIN lut USING (tok) GROUP BY 1),
        ps AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, SUM(sdec) AS sdec
               FROM pd JOIN documents d USING (doc_id) GROUP BY 1),
        g AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS g_tokens, SUM(sdec) AS g_sdec FROM ps),
        sc AS (SELECT source, n_docs, n_tokens,
                      CAST(sdec AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS l_s,
                      CAST(g_sdec AS DOUBLE) / CAST(g_tokens AS DOUBLE) AS l_bar
               FROM ps CROSS JOIN g),
        u AS (SELECT source, n_docs, n_tokens, l_s,
                     CAST(n_tokens AS DECIMAL(18,0)) *
                     CAST(exp(0.1 * (l_s - l_bar)) AS DECIMAL(18,12)) AS unnorm
              FROM sc),
        z AS (SELECT SUM(unnorm) AS z FROM u)
        SELECT source, n_docs, n_tokens, ROUND(l_s, 4) AS mean_surprisal,
               ROUND(CAST(unnorm AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight
        FROM u CROSS JOIN z ORDER BY source""")) { t =>
    TextAnalysis.doremiMixtureWeights(t.documents).orderBy("source")
  }

  private val p10 = q("p10_priority_per_source", Some(
    s"""WITH w AS (SELECT doc_id, source,
            CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tok
          FROM documents),
        p AS (SELECT doc_id, source, n_tok,
            ${Sampling.sqlPriority("doc_id", "n_tok", "gprio")} AS priority
          FROM w WHERE n_tok > 0),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY priority DESC, doc_id) AS priority_rank FROM p)
        SELECT doc_id, source, n_tok, priority, CAST(priority_rank AS INT) AS priority_rank
        FROM r WHERE priority_rank <= 15 ORDER BY doc_id""")) { t =>
    Sampling.prioritySamplePerGroup(
      t.documents.select(col("doc_id"), col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tok")),
      groupCol = "source", k = 15, weightCol = "n_tok")
      .orderBy("doc_id")
  }

  // d19 — asymmetric containment pairs (excerpt/quotation detection, the
  // one-sided Jaccard the near-dup tier structurally cannot see): 8-token
  // excerpts are PLANTED at doc_id+1e6 for every 25th document, so the
  // def must find containment 1.0 pairs whose symmetric Jaccard is tiny;
  // corpus near-dups surface in both directions too. The oracle
  // recomputes the full sparse-intersection chain over the augmented
  // corpus.
  private val d19 = q("d19_containment_pairs", Some(
    s"""WITH aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000,
                 array_to_string(list_slice(string_split_regex(text, '\\s+'), 1, 8), ' ')
          FROM documents WHERE doc_id % 25 = 0),
        sh AS (${TextFns.sqlShingleRows("doc_id", "text", "aug")}),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS inner_id, b.doc_id AS outer_id, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
        SELECT inner_id, outer_id,
               CAST(i AS DOUBLE) / CAST(c.n AS DOUBLE) AS containment
        FROM inter JOIN counts c ON inner_id = c.doc_id
        WHERE CAST(i AS DOUBLE) / CAST(c.n AS DOUBLE) >= 0.8
        ORDER BY inner_id, outer_id""")) { t =>
    val excerpts = t.documents.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(col("text"), "\\s+"), 1, 8), " ").as("text"))
    Dedup.containmentPairs(
      t.documents.select("doc_id", "text").unionByName(excerpts))
      .orderBy("inner_id", "outer_id")
  }

  // d20 — canonical-copy selection: near-dup clusters (d05's oracled
  // machinery) resolved to a KEEP decision per document — the cluster's
  // best copy by the x03 quality score survives, ties break to the
  // smallest doc_id, singletons keep themselves. The oracle recomposes
  // the recursive closure, the full quality formula, and the argmax, so
  // a wrong survivor anywhere hash-fails.
  private val d20 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    q("d20_canonical_selection", Some(
      s"""WITH RECURSIVE sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        qpairs AS (
          SELECT doc_a, doc_b FROM inter
          JOIN counts ca ON doc_a = ca.doc_id
          JOIN counts cb ON doc_b = cb.doc_id
          WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.8),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM qpairs
                  UNION SELECT doc_b, doc_a FROM qpairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        cnodes AS (SELECT DISTINCT a FROM edges),
        cl AS (SELECT n.a AS doc_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
               FROM cnodes n LEFT JOIN reach r ON r.a = n.a GROUP BY n.a),
        qb AS (SELECT doc_id, len(text) AS n_chars,
                      string_split_regex(lower(text), '\\s+') AS w
               FROM documents),
        qm AS (SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
                      CAST(len(w) AS INT) AS n_tokens,
                      CAST(len(list_distinct(w)) AS INT) AS n_distinct,
                      CAST(len(list_filter(w, x -> x IN ($enStops))) AS INT) AS n_stop,
                      CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS INT) AS n_shingles
               FROM qb),
        qs AS (SELECT doc_id,
                 (least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
                  + CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  + CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  + CASE WHEN n_tokens > 2
                         THEN CAST(n_shingles AS DOUBLE) / CAST(n_tokens - 2 AS DOUBLE)
                         ELSE 0.0 END) / 4.0 AS quality
               FROM qm),
        member AS (SELECT d.doc_id, COALESCE(cl.rep, d.doc_id) AS rep, qs.quality
                   FROM documents d
                   LEFT JOIN cl ON d.doc_id = cl.doc_id
                   JOIN qs ON d.doc_id = qs.doc_id),
        mq AS (SELECT rep, MAX(quality) AS best_quality FROM member GROUP BY 1),
        canon AS (SELECT m.rep, MIN(m.doc_id) AS canonical_id
                  FROM member m JOIN mq ON m.rep = mq.rep AND m.quality = mq.best_quality
                  GROUP BY 1)
        SELECT m.doc_id, m.rep, m.quality, c.canonical_id,
               m.doc_id = c.canonical_id AS is_canonical
        FROM member m JOIN canon c ON m.rep = c.rep
        ORDER BY doc_id""")) { t =>
      Dedup.canonicalPerCluster(t.documents, threshold = 0.8).orderBy("doc_id")
    }
  }

  // s14 — margin-based bitext mining (Artetxe & Schwenk 2019, the
  // CCMatrix pipeline shape): best-margin cross-group pair per query
  // vector, margins normalized by DECIMAL-exact k-neighborhood means so
  // the ≥ boundary is engine-identical. The oracle recomputes every
  // cosine, both neighborhood rankings, the means, and the best-pair
  // rank — a single mis-ranked neighbor anywhere hash-fails.
  private val s14 = q("s14_bitext_margin", Some(
    """WITH a AS (SELECT vec_id AS x_id, CAST(embedding AS DOUBLE[]) AS xe
                  FROM embeddings WHERE label = 0),
        b AS (SELECT vec_id AS y_id, CAST(embedding AS DOUBLE[]) AS ye
              FROM embeddings WHERE label = 1),
        p AS (SELECT x_id, y_id,
                list_dot_product(xe, ye) /
                (sqrt(list_dot_product(xe, xe)) * sqrt(list_dot_product(ye, ye))) AS cos
              FROM a, b),
        rx AS (SELECT x_id, y_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY cos DESC, y_id) AS r FROM p),
        mx AS (SELECT x_id,
                 CAST(SUM(CAST(cos AS DECIMAL(18,12))) AS DOUBLE) / 4 AS mu_x
               FROM rx WHERE r <= 4 GROUP BY x_id),
        ry AS (SELECT x_id, y_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY cos DESC, x_id) AS r FROM p),
        my AS (SELECT y_id,
                 CAST(SUM(CAST(cos AS DECIMAL(18,12))) AS DOUBLE) / 4 AS mu_y
               FROM ry WHERE r <= 4 GROUP BY y_id),
        m AS (SELECT p.x_id, p.y_id, p.cos,
                p.cos / ((mx.mu_x + my.mu_y) / 2) AS margin
              FROM p JOIN mx USING (x_id) JOIN my USING (y_id)),
        best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x_id
                   ORDER BY margin DESC, y_id) AS br FROM m)
        SELECT x_id, y_id, cos, margin FROM best
        WHERE br = 1 AND margin >= 1.0 ORDER BY x_id""")) { t =>
    Similarity.marginMining(t.embeddings, labelA = 0, labelB = 1,
      k = 4, threshold = 1.0).orderBy("x_id")
  }

  // x32 — unicode cleanup (the normalization pass between raw web
  // extraction and tokenization): typographic chars map to ASCII via one
  // char-for-char translate, zero-width and C0/DEL control chars are
  // removed, each class counted from exact character-length deltas. Noise
  // is INJECTED deterministically (curly quotes + em dash + ZWSP on
  // doc_id%3, NBSP + curly apostrophe on %4, BEL on %5) so the def is
  // discriminating; the oracle replays injection and scrub char-for-char.
  private val x32 = q("x32_unicode_scrub", Some(
    """WITH noisy AS (SELECT doc_id, text
          || CASE WHEN doc_id % 3 = 0
               THEN ' ' || chr(8220) || 'quoted' || chr(8212) || 'text' || chr(8221) || chr(8203)
               ELSE '' END
          || CASE WHEN doc_id % 4 = 0
               THEN ' menu' || chr(160) || 'item' || chr(8217) || 's' ELSE '' END
          || CASE WHEN doc_id % 5 = 0 THEN ' bell' || chr(7) || 'end' ELSE '' END
          AS nt FROM documents),
        f AS (SELECT chr(8220)||chr(8221)||chr(8216)||chr(8217)||chr(8211)||chr(8212)||chr(160) AS mfrom),
        m AS (SELECT doc_id,
                CAST(length(nt) - length(translate(nt, mfrom, '')) AS INT) AS n_mapped,
                translate(nt, mfrom, '""''''-- ') AS t1
              FROM noisy, f),
        z AS (SELECT doc_id, n_mapped, t1,
                regexp_replace(t1, '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g') AS t2
              FROM m),
        c AS (SELECT doc_id, n_mapped,
                CAST(length(t1) - length(t2) AS INT) AS n_zero_width, t2,
                regexp_replace(t2, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS scrubbed
              FROM z)
        SELECT doc_id, n_mapped, n_zero_width,
          CAST(length(t2) - length(scrubbed) AS INT) AS n_controls, scrubbed
        FROM c ORDER BY doc_id""")) { t =>
    val noisy = t.documents.select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        lit(" \u201Cquoted\u2014text\u201D\u200B")).otherwise(""),
      when(col("doc_id") % 4 === 0,
        lit(" menu\u00A0item\u2019s")).otherwise(""),
      when(col("doc_id") % 5 === 0, lit(" bell\u0007end")).otherwise(""))
      .as("nt"))
    TextAnalysis.unicodeScrub(noisy, "nt").orderBy("doc_id")
  }

  // x33 — PMI collocations (Church & Hanks 1990): corpus bigrams with ≥ 5
  // occurrences scored by ln(p(ab)/(p(a)p(b))) — the phrase-mining signal.
  // Exact integer counts feed a fixed IEEE expression tree; ln is
  // quantized to DECIMAL(18,8) per bigram (the x16/x22 treatment), so the
  // score column hash-matches exactly.
  private val x33 = q("x33_pmi_collocations", Some(
    """WITH w AS (SELECT string_split_regex(lower(text), '\s+') AS w FROM documents),
       bgr AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1])) AS bg FROM w),
       bf AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_pair FROM bgr GROUP BY 1),
       uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_w
              FROM (SELECT unnest(w) AS tok FROM w) z GROUP BY 1),
       tot AS (SELECT (SELECT SUM(n_pair) FROM bf) AS n_bi,
                      (SELECT SUM(n_w) FROM uc) AS n_uni)
       SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
              n_pair,
              CAST(CAST(ln(
                (CAST(n_pair AS DOUBLE) / CAST(n_bi AS DOUBLE)) /
                ((CAST(a.n_w AS DOUBLE) / CAST(n_uni AS DOUBLE))
                 * (CAST(b.n_w AS DOUBLE) / CAST(n_uni AS DOUBLE)))
              ) AS DECIMAL(18,8)) AS DOUBLE) AS pmi
       FROM bf CROSS JOIN tot
       JOIN uc a ON a.tok = string_split(bg, ' ')[1]
       JOIN uc b ON b.tok = string_split(bg, ' ')[2]
       WHERE n_pair >= 5
       ORDER BY w1, w2""")) { t =>
    TextAnalysis.pmiCollocations(t.documents, minCount = 5).orderBy("w1", "w2")
  }

  // x34 — DISTRIBUTED LOGISTIC-REGRESSION TRAINING through the correctness
  // gate: 3 batch-GD steps over the x03 quality features learn the
  // n_chars>300 label, then the final model scores every document. The
  // oracle replays the ENTIRE training trajectory (quantized sigmoids,
  // exact decimal gradient sums, fixed IEEE weight updates) as an unrolled
  // CTE chain — a single mis-accumulated gradient term in any iteration
  // shifts the weights and hash-fails every prediction.
  private val x34 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    q("x34_quality_lr", Some(
      s"""WITH qb AS (SELECT doc_id, len(text) AS n_chars,
                      string_split_regex(lower(text), '\\s+') AS w
               FROM documents),
        qm AS (SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
                      CAST(len(w) AS INT) AS n_tokens,
                      CAST(len(list_distinct(w)) AS INT) AS n_distinct,
                      CAST(len(list_filter(w, x -> x IN ($enStops))) AS INT) AS n_stop,
                      CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS INT) AS n_shingles
               FROM qb),
        feats AS MATERIALIZED (SELECT doc_id,
                 least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score,
                 CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS diversity,
                 CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
                 CASE WHEN n_tokens > 2
                      THEN CAST(n_shingles AS DOUBLE) / CAST(n_tokens - 2 AS DOUBLE)
                      ELSE 0.0 END AS uniq3,
                 CAST(CASE WHEN n_chars > ${QualityModel.LabelThreshold}
                      THEN 1 ELSE 0 END AS DOUBLE) AS y
               FROM qm),
        ${QualityModel.gradientDescentOracleCtes(iterations = 3)}
        ${QualityModel.predictOracleSelect(iterations = 3)}""")) { t =>
      QualityModel.trainAndPredict(t.documents, iterations = 3).orderBy("doc_id")
    }
  }

  // x35 — Zipf-law fit of the token distribution (corpus-health
  // diagnostic: natural text has slope ≈ −1): exact least squares of
  // ln(freq) on ln(rank) with quantized lns and exact-decimal regression
  // sums; the global frequency rank rides PrefixSum (a ROW_NUMBER window
  // would single-task the vocabulary).
  private val x35 = q("x35_zipf_fit", Some(
    """WITH uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_w
          FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) z GROUP BY 1),
       r AS (SELECT n_w, ROW_NUMBER() OVER (ORDER BY n_w DESC, tok) AS rnk FROM uc),
       pts AS (SELECT CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(18,8)) AS x,
                      CAST(ln(CAST(n_w AS DOUBLE)) AS DECIMAL(18,8)) AS y
               FROM r),
       s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
                    SUM(x) AS sx, SUM(y) AS sy,
                    SUM(x * y) AS sxy, SUM(x * x) AS sxx
             FROM pts),
       fit AS (SELECT n_vocab, sx, sy,
                 (CAST(n_vocab AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n_vocab AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
               FROM s)
       SELECT n_vocab, slope,
              (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
              / CAST(n_vocab AS DOUBLE) AS intercept
       FROM fit""")) { t =>
    TextAnalysis.zipfFit(t.documents)
  }

  // s15 — DISTRIBUTED K-MEANS TRAINING through the correctness gate:
  // 3 Lloyd iterations (k = 8, init = the 8 smallest vec_ids) over the
  // embedding corpus, then the final model labels every vector. The oracle
  // unrolls the ENTIRE trajectory — init, every assignment (exact
  // left-to-right dots, ties to smaller cid), every exact-decimal centroid
  // update — so one mis-assigned vector in any iteration moves a centroid
  // and hash-fails the final labeling.
  private val s15 = q("s15_kmeans_assign", Some(
    s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
        ${KMeans.kmeansOracleCtes(k = 8, iterations = 3)}
        SELECT vec_id, cid FROM af ORDER BY vec_id""")) { t =>
    KMeans.trainAndAssign(t.embeddings, k = 8, iterations = 3).orderBy("vec_id")
  }

  // d21 — SemDeDup PROPER (Abbas et al. 2023): near-dup search blocked by
  // the LEARNED s15 k-means clusters instead of d12's given labels — the
  // no-natural-blocking-column scale path. The oracle replays the full
  // k-means trajectory, the within-cluster cosine pairs, the recursive
  // closure, and the keep decision, so a drifted centroid OR a wrong
  // survivor hash-fails.
  private val d21 = q("d21_semdedup_kmeans", Some(
    s"""WITH RECURSIVE emb AS (SELECT vec_id, embedding FROM embeddings),
        ${KMeans.kmeansOracleCtes(k = 8, iterations = 3)},
        ec AS MATERIALIZED (
          SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev, a.cid
          FROM emb e JOIN af a ON e.vec_id = a.vec_id),
        pairs AS (
          SELECT x.vec_id AS va, y.vec_id AS vb
          FROM ec x JOIN ec y ON x.cid = y.cid AND x.vec_id < y.vec_id
          WHERE list_dot_product(x.ev, y.ev) /
                (sqrt(list_dot_product(x.ev, x.ev)) * sqrt(list_dot_product(y.ev, y.ev)))
                >= 0.45),
        edges AS (SELECT va AS a, vb AS b FROM pairs UNION SELECT vb, va FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        cnodes AS (SELECT DISTINCT a FROM edges),
        rep AS (SELECT n.a AS vec_id, LEAST(n.a, COALESCE(MIN(r.b), n.a)) AS rep
                FROM cnodes n LEFT JOIN reach r ON r.a = n.a GROUP BY n.a)
        SELECT e.vec_id, COALESCE(rep.rep, e.vec_id) AS rep_id,
               CAST(CASE WHEN COALESCE(rep.rep, e.vec_id) = e.vec_id
                    THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM emb e LEFT JOIN rep ON e.vec_id = rep.vec_id
        ORDER BY e.vec_id""")) { t =>
    Similarity.semDeDupKMeans(t.embeddings, k = 8, iterations = 3, threshold = 0.45)
      .orderBy("vec_id")
  }

  // e20 — event-type frequencies from a COUNT-MIN SKETCH, side by side
  // with the exact counts (rows-only: xxhash64 has no DuckDB twin, like
  // d03; CountMinSpec grades the one-sided error and exactly-additive
  // merge). At this key cardinality and width the estimates are exact;
  // the sketch's value is that its build shuffles d·w cells however many
  // distinct keys 100 TB of events carries.
  private val e20 = q("e20_event_freq_cms", None) { t =>
    val ev = eventsTs(t)
    val sketch = graft.operators.CountMin.build(ev, "event_type")
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("exact"))
    graft.operators.CountMin.estimate(sketch, ev, "event_type")
      .withColumnRenamed("k", "event_type")
      .join(exact, Seq("event_type"))
      .select(col("event_type"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy("event_type")
  }

  // e19 — rolling WAU served from the PERSISTED sketch store (rows-only
  // like e12: HLL estimates have no SQL oracle): the event log is sketched
  // per ingested batch (here two appends splitting the users, so every day
  // exists in BOTH versions — the split-day union case), and the query
  // reads |days| sketch rows, never an event (plan-pinned in
  // SketchStoreSpec). Estimates == e12's direct path exactly (union is
  // register-wise max — idempotent, so even double-appends cannot inflate),
  // and ±1% of e11's exact counts (spec-graded).
  private val e19 = q("e19_wau_sketch_store", None) { t =>
    val ev = eventsTs(t)
    val root = graft.TempDirs.scoped("graft-skstore")
    graft.operators.SketchStore.write(
      Events.dailyUserSketches(ev.filter(col("user_id") % 2 === 0)), root)
    graft.operators.SketchStore.append(
      Events.dailyUserSketches(ev.filter(col("user_id") % 2 =!= 0)), root,
      tag = Some("batch-2"))
    Events.rollingDistinctUsersFromStore(t.spark, root, windowDays = 7)
      .orderBy("win_day")
  }

  // x39 — conjunctive keyword search served from the PERSISTED inverted
  // index (llm/Search): postings built once (term+doc-sized exchange, the
  // document text never shuffles), laid out by md5 term bucket, the query
  // reading ONLY its terms' buckets (partition pruning, plan-pinned in
  // SearchSpec) with the term equalities pushed into the parquet scan. The
  // oracle recomputes the AND-match and exact tf sum straight from the
  // corpus, so an index-layout bug (wrong bucket, lost posting) hash-fails
  // rather than mis-ranking.
  private val keywordSearchOracleSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
                  FROM documents),
       m AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM w WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2)
       SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS total_tf
       FROM m GROUP BY doc_id HAVING COUNT(*) = 3 ORDER BY doc_id"""

  private val x39 = q("x39_keyword_search", Some(keywordSearchOracleSql)) { t =>
    val idx = graft.TempDirs.scoped("graft-text-idx")
    Search.writeIndex(t.documents, idx)
    Search.searchAll(t.spark, idx, Seq("spark", "window", "merge")).orderBy("doc_id")
  }

  // x42 — INCREMENTAL index maintenance for the x39 postings store: the
  // corpus lands in two appends (even/odd doc halves) under the store
  // family's staged-version + CURRENT-pointer protocol (bucket layout
  // preserved INSIDE each version, so pruning survives versioning), and
  // the serve merges versions by additive tf. x39's VERBATIM oracle
  // hash-proves incremental ≡ from-scratch — the x27/x28/d08 pattern, now
  // for the text-retrieval store.
  private val x42 = q("x42_search_incremental", Some(keywordSearchOracleSql)) { t =>
    val idx = graft.TempDirs.scoped("graft-text-idx-inc")
    Search.initIndex(t.documents.filter(col("doc_id") % 2 === 0), idx)
    Search.appendToIndex(t.documents.filter(col("doc_id") % 2 === 1), idx)
    Search.searchAllIndexed(t.spark, idx, Seq("spark", "window", "merge"))
      .orderBy("doc_id")
  }

  // x40 — blocklist screening (the Dolma/C4 banned-phrase tagger): distinct
  // blocked phrases present per document as exact word-boundary matches,
  // keep = zero hits. One narrow shingle-intersection map per phrase
  // LENGTH (not per phrase), blocklist shipped as plan literals — zero
  // exchanges (plan-pinned in Round12OpsSpec). The oracle recomputes both
  // shingle granularities and the distinct-hit count, so a word-boundary
  // bug (substring match, cross-token match) hash-fails. One phrase is
  // deliberately absent from the corpus vocabulary: it must change nothing.
  private val x40 = q("x40_blocklist_screen", Some(
    s"""WITH s1 AS (${TextFns.sqlShingleRows("doc_id", "text", "documents", 1)}),
        s2 AS (${TextFns.sqlShingleRows("doc_id", "text", "documents", 2)}),
        hits AS (
          SELECT doc_id FROM s1 WHERE shingle IN ('hash')
          UNION ALL
          SELECT doc_id FROM s2 WHERE shingle IN ('big table', 'slow scan', 'forbidden junk')),
        h AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM hits GROUP BY 1)
        SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
               COALESCE(h.n, 0) = 0 AS keep
        FROM documents d LEFT JOIN h USING (doc_id) ORDER BY d.doc_id""")) { t =>
    TextAnalysis.blocklistScreen(t.documents,
      Seq("hash", "big table", "slow scan", "forbidden junk"))
      .orderBy("doc_id")
  }

  // d22 — URL-keyed dedup (the crawl pipeline's stage zero). The word-salad
  // corpus has no URLs, so the def injects one per document (the x09
  // pattern): 37 logical pages dressed in host-case, trailing-slash, and
  // tracking-query variants that canonicalization must collapse — and the
  // path case must SURVIVE lowercasing (RFC 3986: host is case-insensitive,
  // path isn't). The oracle replays injection, extraction, every
  // canonicalization regex, and the keep-first verdict character for
  // character.
  private val d22 = {
    val u = TextAnalysis.UrlPattern
    q("d22_url_dedup", Some(
      s"""WITH noisy AS (
            SELECT doc_id,
              text || ' visit https://' ||
              CASE WHEN doc_id % 2 = 0 THEN 'Example.COM' ELSE 'example.com' END ||
              '/Page/' || CAST(doc_id % 37 AS VARCHAR) ||
              CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
              CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&ref=9' ELSE '' END AS nt
            FROM documents),
          nq AS (SELECT doc_id,
                   regexp_replace(regexp_extract(nt, '$u', 0), '[?#].*$$', '') AS v
                 FROM noisy),
          keyed AS (SELECT doc_id,
                      regexp_replace(
                        lower(regexp_extract(v, '^(https?://[^/]*)', 1)) ||
                        regexp_extract(v, '^https?://[^/]*(.*)$$', 1),
                        '/$$', '') AS canon_url
                    FROM nq),
          f AS (SELECT canon_url, MIN(doc_id) AS first_id FROM keyed GROUP BY 1)
          SELECT k.doc_id, k.canon_url, k.doc_id = f.first_id AS keep
          FROM keyed k JOIN f USING (canon_url) ORDER BY k.doc_id""")) { t =>
      val noisy = t.documents.select(col("doc_id"), concat(
        col("text"), lit(" visit https://"),
        when(col("doc_id") % 2 === 0, "Example.COM").otherwise("example.com"),
        lit("/Page/"), (col("doc_id") % 37).cast("string"),
        when(col("doc_id") % 3 === 0, "/").otherwise(""),
        when(col("doc_id") % 5 === 0, "?utm_source=feed&ref=9").otherwise(""))
        .as("nt"))
      Dedup.urlDedup(noisy, "nt").orderBy("doc_id")
    }
  }

  // x41 — source-interleaved training order: consecutive positions rotate
  // round-robin across the 20 sources (each internally hash-shuffled) —
  // the heterogeneous-batch guarantee x18's plain hash shuffle gives only
  // in expectation. Runtime plan: grouped prefix sum (within-source rank)
  // + global prefix sum over the packed key — zero windows; the oracle IS
  // the two-window formulation, so the scale-safe plan must reproduce the
  // funnel plan's rows bit-for-bit.
  private val x41 = q("x41_interleaved_order", Some(
    """WITH r AS (
         SELECT doc_id, source,
                CAST(ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY substring(md5(doc_id::VARCHAR || ':interleave'), 1, 4),
                              doc_id) AS BIGINT) AS rn
         FROM documents)
       SELECT doc_id, source, rn,
              CAST(ROW_NUMBER() OVER (ORDER BY rn, source) AS BIGINT) AS pos
       FROM r ORDER BY doc_id""")) { t =>
    Sampling.interleavedOrder(t.documents).orderBy("doc_id")
  }

  // s16 — exact MIPS top-k (unnormalized-embedding retrieval): the oracle
  // re-ranks by raw list_dot_product, so the def proves inner-product
  // ordering differs from cosine's ONLY through the engine's own exact
  // ranking — magnitude-sensitive retrieval, the recommendation-scoring
  // shape. The norm-augmentation reduction onto the cosine ANN tier is the
  // documented 100 TB path (Similarity.mipsTopK scaladoc).
  private val s16 = q("s16_knn_mips", Some(
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                  FROM embeddings WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        p AS (SELECT query_id, neighbor_id, list_dot_product(qe, ce) AS ip
              FROM q, c WHERE query_id <> neighbor_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ip
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.mipsTopK(t.embeddings, col("vec_id") % 100 === 0, k = 10)
      .orderBy("query_id", "rank")
  }

  // s17 — sign-bit BINARY-quantized ANN, THROUGH the hash gate (VERDICT
  // r14 #4: exact integer arithmetic end-to-end): one long per 64-dim
  // vector (32× compression, no trained state), xor+popcount Hamming
  // shortlist, exact cosine re-rank — the 1-bit end of the compression
  // ladder s04 (int8) and s08 (PQ) started. The oracle never rebuilds the
  // 64-bit code (bit 63 would overflow DuckDB's checked BIGINT) — it maps
  // signs to ±1 doubles, where hamming = (64 − dot)/2 exactly (small-int
  // double sums are exact), replays the (hamming ASC, neighbor_id)
  // shortlist of 100 and the cosine re-rank. Recall vs s01 stays graded
  // in RECALL.
  private val s17 = q("s17_knn_binary", Some(
    s"""WITH e AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CASE WHEN x > 0 THEN 1.0 ELSE -1.0 END) AS sgn
          FROM embeddings),
        h AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     CAST((${Similarity.Dim} - list_dot_product(q.sgn, c.sgn)) / 2 AS BIGINT) AS ham
              FROM e q JOIN e c ON q.vec_id <> c.vec_id
              WHERE q.vec_id % 100 = 0),
        sl AS (SELECT query_id, neighbor_id FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ham, neighbor_id) AS hrank
                 FROM h) z
               WHERE hrank <= ${Similarity.BinaryShortlist}),
        p AS (SELECT s.query_id, s.neighbor_id,
                     list_dot_product(qe.emb, ce.emb) /
                     (sqrt(list_dot_product(qe.emb, qe.emb)) * sqrt(list_dot_product(ce.emb, ce.emb))) AS cos
              FROM sl s JOIN e qe ON s.query_id = qe.vec_id
                        JOIN e ce ON s.neighbor_id = ce.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.knnBinaryReranked(t.embeddings, col("vec_id") % 100 === 0, k = 10)
      .orderBy("query_id", "rank")
  }

  // s18 — ANN MIPS (VERDICT r11 #3): s16's sublinear form via the
  // norm-augmentation reduction onto the IVF cosine tier — corpus vectors
  // augment to norm exactly M, queries zero-pad, augmented cosine becomes
  // monotone in the true inner product, and the coarse cells prune the
  // scan to ~nProbe/C. Probed candidates rank by the TRUE inner product
  // over the original embeddings (s16's exact tie order; full-probe ≡ s16
  // spec-pinned). THROUGH the hash gate since r15: every augmentation
  // step is exact replayable arithmetic — M² is a double max, the
  // augmented component rounds through FLOAT32 exactly as Spark's
  // `.cast("float")` does (CAST(… AS REAL) in DuckDB), and the scramble
  // centroids/assignment/probes follow the s03 recipe in the augmented
  // geometry. Recall vs s16 stays graded in RECALL at two probe depths.
  private val s18 = q("s18_knn_mips_ivf", Some(
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                                FROM embeddings),
        m AS MATERIALIZED (SELECT MAX(list_dot_product(emb, emb)) AS m2 FROM e),
        aug AS MATERIALIZED (
          SELECT e.vec_id, e.emb,
                 list_append(e.emb, CAST(CAST(
                   sqrt(greatest(m.m2 - list_dot_product(e.emb, e.emb), 0.0))
                   AS REAL) AS DOUBLE)) AS aemb
          FROM e, m),
        cent AS MATERIALIZED (
          SELECT vec_id AS cell, aemb AS c_emb FROM aug
          ORDER BY ${Similarity.sampleHashSql("vec_id")}, vec_id
          LIMIT ${Similarity.IvfCells}),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT a.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                     list_dot_product(a.aemb, c.c_emb) /
                     (sqrt(list_dot_product(a.aemb, a.aemb)) * sqrt(list_dot_product(c.c_emb, c.c_emb)))
                     DESC, c.cell) AS rn
            FROM aug a, cent c) z WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT q.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                     list_dot_product(q.qaug, c.c_emb) /
                     (sqrt(list_dot_product(q.qaug, q.qaug)) * sqrt(list_dot_product(c.c_emb, c.c_emb)))
                     DESC, c.cell) AS rn
            FROM (SELECT vec_id, list_append(emb, 0.0) AS qaug FROM e
                  WHERE vec_id % 100 = 0) q, cent c) z
          WHERE rn <= ${Similarity.IvfProbesRegistered}),
        p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
                     list_dot_product(qe.emb, ce.emb) AS ip
              FROM probes pr
              JOIN assign a ON pr.cell = a.cell AND pr.query_id <> a.vec_id
              JOIN e qe ON qe.vec_id = pr.query_id
              JOIN e ce ON ce.vec_id = a.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ip
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.mipsTopKIvf(t.embeddings, col("vec_id") % 100 === 0, k = 10,
      nProbe = Similarity.IvfProbesRegistered)
      .orderBy("query_id", "rank")
  }

  // s19 — MIPS served from a PERSISTED index (the s06 pattern in the
  // augmented geometry, completing the MIPS ladder s16→s18→s19): build
  // once (augmented-space centroids + int8 codes of the original floats,
  // cell-partitioned; M² anchor frozen in the _M2 sidecar — an append
  // with a longer vector FAILS FAST instead of silently landing in the
  // wrong geometry), serve with a literal-pruned cell scan and the
  // dequantized inner product (scales must NOT cancel — MIPS is
  // magnitude-sensitive). Rows-only; recall vs exact s16 graded in
  // RECALL at two probe depths.
  // THROUGH the hash gate since r15: s18's augmented-geometry probe
  // machinery scored with the DEQUANTIZED inner product (scales must NOT
  // cancel in MIPS — ip ≈ q·(code/scale)); the M² anchor round-trips
  // through Double.toString exactly, so serve-side geometry equals
  // build-side bit-for-bit and the whole serve is replayable arithmetic.
  private val s19 = q("s19_knn_mips_indexed", Some(
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                                FROM embeddings),
        m AS MATERIALIZED (SELECT MAX(list_dot_product(emb, emb)) AS m2 FROM e),
        aug AS MATERIALIZED (
          SELECT e.vec_id, e.emb,
                 list_append(e.emb, CAST(CAST(
                   sqrt(greatest(m.m2 - list_dot_product(e.emb, e.emb), 0.0))
                   AS REAL) AS DOUBLE)) AS aemb
          FROM e, m),
        pk AS MATERIALIZED (
          SELECT vec_id, scale, list_transform(emb, x -> floor(x * scale + 0.5)) AS q
          FROM (SELECT vec_id, emb,
                       CASE WHEN list_max(list_transform(emb, v -> abs(v))) <> 0
                            THEN 127.0 / list_max(list_transform(emb, v -> abs(v)))
                       END AS scale
                FROM e) z),
        cent AS MATERIALIZED (
          SELECT vec_id AS cell, aemb AS c_emb FROM aug
          ORDER BY ${Similarity.sampleHashSql("vec_id")}, vec_id
          LIMIT ${Similarity.IvfCells}),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT a.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                     list_dot_product(a.aemb, c.c_emb) /
                     (sqrt(list_dot_product(a.aemb, a.aemb)) * sqrt(list_dot_product(c.c_emb, c.c_emb)))
                     DESC, c.cell) AS rn
            FROM aug a, cent c) z WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT q.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                     list_dot_product(q.qaug, c.c_emb) /
                     (sqrt(list_dot_product(q.qaug, q.qaug)) * sqrt(list_dot_product(c.c_emb, c.c_emb)))
                     DESC, c.cell) AS rn
            FROM (SELECT vec_id, list_append(emb, 0.0) AS qaug FROM e
                  WHERE vec_id % 100 = 0) q, cent c) z
          WHERE rn <= ${Similarity.IvfProbesRegistered}),
        p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
                     list_dot_product(qe.emb, qc.q) / qc.scale AS ip
              FROM probes pr
              JOIN assign a ON pr.cell = a.cell AND pr.query_id <> a.vec_id
              JOIN e qe ON qe.vec_id = pr.query_id
              JOIN pk qc ON qc.vec_id = a.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ip
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    val idx = graft.TempDirs.scoped("graft-mips-idx")
    Similarity.writeMipsIndex(t.embeddings, idx)
    Similarity.mipsTopKFromIndex(
      t.embeddings.filter(col("vec_id") % 100 === 0), idx,
      k = 10, nProbe = Similarity.IvfProbesRegistered)
      .orderBy("query_id", "rank")
  }

  // s20 — exact metadata-FILTERED top-k (the vector-DB "filtered search"
  // workload: neighbors restricted to label = 3 — in production a
  // language, source, or license-class predicate). The filter lands on
  // the candidate side BEFORE the scoring cross join (1/m selectivity
  // cuts the scored pairs by m — never score-then-discard); same total
  // (cos desc, neighbor_id) order as s01, so the oracle is s01's SQL
  // with the candidate CTE filtered.
  private val s20 = q("s20_knn_filtered", Some(
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                  FROM embeddings WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
              FROM embeddings WHERE label = 3),
        p AS (SELECT query_id, neighbor_id,
                     list_dot_product(qe, ce) /
                     (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
              FROM q, c WHERE query_id <> neighbor_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.bruteForceTopKFiltered(t.embeddings,
      col("vec_id") % 100 === 0, col("label") === 3, k = 10)
      .orderBy("query_id", "rank")
  }

  // s21 — filter-PUSHED IVF ANN (s20's sublinear form): the predicate
  // applies inside the cell-pruned candidate scan (on the persisted
  // layout: a pushed parquet filter within probed cells), centroids stay
  // corpus-wide so cell geometry is filter-independent. THROUGH the hash
  // gate since r15 (the s03 recipe + the filter): the oracle replays the
  // corpus-wide scramble-sampled centroids, the filtered corpus's cell
  // assignment, the probe ranking, and the exact cosine top-k. RECALL
  // still grades it vs the exact filtered truth at two probe depths AND
  // grades the post-filter foil, so the classic recall collapse
  // (filtering an unfiltered top-k after ranking) stays a measured
  // number. Full-probe ≡ s20 spec-pinned.
  private val s21 = q("s21_knn_filtered_ivf", Some(
    s"""WITH e AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                                FROM embeddings),
        cent AS MATERIALIZED (
          SELECT vec_id AS cell, emb AS c_emb FROM e
          ORDER BY ${Similarity.sampleHashSql("vec_id")}, vec_id
          LIMIT ${Similarity.IvfCells}),
        ac AS MATERIALIZED (
          SELECT e.vec_id, e.label, c.cell,
                 list_dot_product(e.emb, c.c_emb) /
                 (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) AS score
          FROM e, cent c),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac WHERE label = 3) z WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac WHERE vec_id % 100 = 0) z
          WHERE rn <= ${Similarity.IvfProbesRegistered}),
        p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
                     list_dot_product(qe.emb, ce.emb) /
                     (sqrt(list_dot_product(qe.emb, qe.emb)) * sqrt(list_dot_product(ce.emb, ce.emb))) AS cos
              FROM probes pr
              JOIN assign a ON pr.cell = a.cell AND pr.query_id <> a.vec_id
              JOIN e qe ON qe.vec_id = pr.query_id
              JOIN e ce ON ce.vec_id = a.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.ivfTopKFiltered(t.embeddings,
      col("vec_id") % 100 === 0, col("label") === 3, k = 10,
      nProbe = Similarity.IvfProbesRegistered)
      .orderBy("query_id", "rank")
  }

  // s26 — ADAPTIVE-probe filtered ANN (VERDICT r13 #4, s21's fix for the
  // filter-disjoint geometry where any fixed probe depth collapses): each
  // query widens its probe ring until the ring holds ≥ minCandidates
  // filter-passing rows, so cost is bounded by candidate COUNT and recall
  // holds on both geometries (RECALL s21_adaptive entries). THROUGH the
  // hash gate since r15: the "data-derived" probe depth is itself exact
  // replayable arithmetic — the oracle recomputes the per-cell filtered
  // mass, each query's full cell ranking, the cumulative-mass depth rule
  // (floor 4, first rank whose cum ≥ 32, capped at C), and the exact
  // cosine top-k over each query's OWN ring. A wrong depth anywhere
  // changes some query's candidate set and hash-fails.
  private val s26 = q("s26_knn_filtered_adaptive", Some(
    s"""WITH e AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                                FROM embeddings),
        cent AS MATERIALIZED (
          SELECT vec_id AS cell, emb AS c_emb FROM e
          ORDER BY ${Similarity.sampleHashSql("vec_id")}, vec_id
          LIMIT ${Similarity.IvfCells}),
        ac AS MATERIALIZED (
          SELECT e.vec_id, e.label, c.cell,
                 list_dot_product(e.emb, c.c_emb) /
                 (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) AS score
          FROM e, cent c),
        assign AS MATERIALIZED (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac WHERE label = 3) z WHERE rn = 1),
        cellcnt AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_filt FROM assign GROUP BY 1),
        ranked AS MATERIALIZED (
          SELECT query_id, cell, rnk,
                 SUM(COALESCE(n_filt, 0)) OVER (PARTITION BY query_id ORDER BY rnk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM (SELECT vec_id AS query_id, cell,
                       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rnk
                FROM ac WHERE vec_id % 100 = 0) r
          LEFT JOIN cellcnt USING (cell)),
        probes AS (
          SELECT query_id, cell FROM (
            SELECT query_id, cell, rnk,
                   GREATEST(${Similarity.IvfProbes},
                     COALESCE(MIN(CASE WHEN cum >= 32 THEN rnk END)
                                OVER (PARTITION BY query_id),
                              MAX(rnk) OVER (PARTITION BY query_id))) AS depth
            FROM ranked) z WHERE rnk <= depth),
        p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
                     list_dot_product(qe.emb, ce.emb) /
                     (sqrt(list_dot_product(qe.emb, qe.emb)) * sqrt(list_dot_product(ce.emb, ce.emb))) AS cos
              FROM probes pr
              JOIN assign a ON pr.cell = a.cell AND pr.query_id <> a.vec_id
              JOIN e qe ON qe.vec_id = pr.query_id
              JOIN e ce ON ce.vec_id = a.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Similarity.ivfTopKFilteredAdaptive(t.embeddings,
      col("vec_id") % 100 === 0, col("label") === 3, k = 10,
      nProbeFloor = Similarity.IvfProbes, minCandidates = 32)
      .orderBy("query_id", "rank")
  }

  // s22 — filtered search from the PERSISTED IVF index (s21's claim made
  // a stored fact): the index is built with the label attribute landed
  // beside each vector's int8 codes (metaCols), and the serve-time
  // predicate reaches the parquet scan as a pushed DATA filter inside the
  // probed cells' partition-pruned directories — Round13OpsSpec pins both
  // plan facts (PartitionFilters on cell, dataFilters on label) and the
  // full-probe equivalence to an index built over the pre-filtered
  // corpus. Rows-only like the other stored tiers; recall graded in
  // RECALL beside s21's in-memory form.
  // THROUGH the hash gate since r15: s06's stored-serve oracle with the
  // metadata predicate applied to the candidate side — per-vector cell
  // assignment is independent of every other vector, so filtering the
  // stored rows at serve time is identical to filtering before
  // assignment, and the whole serve is replayable arithmetic.
  private val s22 = q("s22_knn_filtered_indexed", Some(
    s"""WITH e AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                                FROM embeddings),
        qk AS MATERIALIZED (
          SELECT vec_id, list_transform(emb, x -> floor(x * scale + 0.5)) AS q
          FROM (SELECT vec_id, emb,
                       CASE WHEN list_max(list_transform(emb, v -> abs(v))) <> 0
                            THEN 127.0 / list_max(list_transform(emb, v -> abs(v)))
                       END AS scale
                FROM e) z),
        cent AS MATERIALIZED (
          SELECT vec_id AS cell, emb AS c_emb FROM e
          ORDER BY ${Similarity.sampleHashSql("vec_id")}, vec_id
          LIMIT ${Similarity.IvfCells}),
        ac AS MATERIALIZED (
          SELECT e.vec_id, e.label, c.cell,
                 list_dot_product(e.emb, c.c_emb) /
                 (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) AS score
          FROM e, cent c),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac WHERE label = 3) z WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
            FROM ac WHERE vec_id % 100 = 0) z
          WHERE rn <= ${Similarity.IvfProbesRegistered}),
        p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
                     list_dot_product(qq.q, qc.q) /
                     (sqrt(list_dot_product(qq.q, qq.q)) * sqrt(list_dot_product(qc.q, qc.q))) AS qcos
              FROM probes pr
              JOIN assign a ON pr.cell = a.cell AND pr.query_id <> a.vec_id
              JOIN qk qq ON qq.vec_id = pr.query_id
              JOIN qk qc ON qc.vec_id = a.vec_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, qcos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    val idx = graft.TempDirs.scoped("graft-filt-idx")
    Similarity.writeIvfIndex(t.embeddings, idx, metaCols = Seq("label"))
    Similarity.ivfTopKQuantizedFromIndex(
      t.embeddings.filter(col("vec_id") % 100 === 0), idx,
      k = 10, nProbe = Similarity.IvfProbesRegistered,
      filter = Some(col("label") === 3))
      .orderBy("query_id", "rank")
  }

  // s24 — DELETE lifecycle for the persisted vector index (the takedown/
  // GDPR path every production vector DB needs): build the IVF int8
  // store, tombstone every 7th id (deleteFromIvfIndex — a metadata write,
  // no data file opened), serve THROUGH the store at full probe. Deleted
  // vectors must never rank and every live vector must still rank in
  // exact quantized-cosine order, so the oracle is s05's quantized
  // brute-force SQL with the candidate CTE filtered to the live set —
  // a tombstone missed anywhere, or a live row lost by the delete path,
  // hash-fails. Round13bOpsSpec pins the MoR/purge equivalence (purge
  // rewrites ONLY touched cells, drops fully-emptied dirs, serves
  // identically) and partial-probe delete masking; bounded-tombstone
  // serving is the documented cadence contract (purge folds the
  // anti-join state away).
  private val s24 = q("s24_knn_index_deletes", Some(
    """WITH pk AS (
         SELECT vec_id,
                list_transform(CAST(embedding AS DOUBLE[]),
                  x -> floor(x * scale + 0.5)) AS q
         FROM (SELECT vec_id, embedding,
                      CASE WHEN list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) <> 0
                           THEN 127.0 / list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))
                      END AS scale
               FROM embeddings) m),
        q AS (SELECT vec_id AS query_id, q AS qq FROM pk WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id AS neighbor_id, q AS qc FROM pk WHERE vec_id % 7 <> 0),
        p AS (SELECT query_id, neighbor_id,
                     list_dot_product(qq, qc) /
                     (sqrt(list_dot_product(qq, qq)) * sqrt(list_dot_product(qc, qc))) AS qcos
              FROM q, c WHERE query_id <> neighbor_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, qcos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    val idx = graft.TempDirs.scoped("graft-del-idx")
    Similarity.writeIvfIndex(t.embeddings, idx)
    Similarity.deleteFromIvfIndex(
      t.embeddings.filter(col("vec_id") % 7 === 0).select("vec_id"), idx)
    Similarity.ivfTopKQuantizedFromIndex(
      t.embeddings.filter(col("vec_id") % 100 === 0), idx,
      k = 10, nProbe = Similarity.IvfCells)
      .orderBy("query_id", "rank")
  }

  // s25 — vector UPSERT (the re-embedding path: a model refresh
  // re-encodes every 13th vector — here the deterministic stand-in is
  // the reversed embedding, exact in float and in SQL's list_reverse):
  // tombstone → purge → append composed from the store's own primitives
  // (tombstones mask by ID, so the fold must land before the new copy —
  // Similarity.upsertIvfIndex documents idempotence under retry at every
  // crash window). Serve at full probe through the upserted store must
  // equal exact quantized brute force over the UPDATED corpus: a stale
  // copy surviving, both copies ranking, or the new geometry landing in
  // an unprobed cell all hash-fail. Completes the store's CRUD story:
  // write/append (s06), delete (s24), upsert (here), compact, vacuum.
  private val s25 = q("s25_knn_index_upsert", Some(
    """WITH u AS (
         SELECT vec_id,
                CASE WHEN vec_id % 13 = 0 THEN list_reverse(embedding)
                     ELSE embedding END AS embedding
         FROM embeddings),
        pk AS (
         SELECT vec_id,
                list_transform(CAST(embedding AS DOUBLE[]),
                  x -> floor(x * scale + 0.5)) AS q
         FROM (SELECT vec_id, embedding,
                      CASE WHEN list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) <> 0
                           THEN 127.0 / list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))
                      END AS scale
               FROM u) m),
        q AS (SELECT vec_id AS query_id, q AS qq FROM pk WHERE vec_id % 100 = 0),
        c AS (SELECT vec_id AS neighbor_id, q AS qc FROM pk),
        p AS (SELECT query_id, neighbor_id,
                     list_dot_product(qq, qc) /
                     (sqrt(list_dot_product(qq, qq)) * sqrt(list_dot_product(qc, qc))) AS qcos
              FROM q, c WHERE query_id <> neighbor_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rank
              FROM p)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, qcos
        FROM r WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    val idx = graft.TempDirs.scoped("graft-ups-idx")
    Similarity.writeIvfIndex(t.embeddings, idx)
    Similarity.upsertIvfIndex(
      t.embeddings.filter(col("vec_id") % 13 === 0)
        .withColumn("embedding", reverse(col("embedding"))), idx)
    val corpus = t.embeddings.withColumn("embedding",
      when(col("vec_id") % 13 === 0, reverse(col("embedding")))
        .otherwise(col("embedding")))
    Similarity.ivfTopKQuantizedFromIndex(
      corpus.filter(col("vec_id") % 100 === 0), idx,
      k = 10, nProbe = Similarity.IvfCells)
      .orderBy("query_id", "rank")
  }

  // s23 — HYBRID retrieval with reciprocal-rank fusion (Cormack et al.
  // 2009): the lexical ranking (token-set Jaccard vs the query document)
  // and the semantic ranking (embedding cosine) fuse as
  // 1/(60+r_lex) + 1/(60+r_sem) — rank fusion needs no cross-retriever
  // score calibration, which is why it is the production default for
  // lexical+vector stacks. Corpus = documents ⋈ embeddings (only items
  // carrying both signals); both rankings are total orders over the same
  // candidate universe, the fusion is two integer-rank reciprocals added
  // in fixed order, and all three window ranks share ONE query_id
  // exchange. The oracle replays both rankings and the fusion arithmetic
  // verbatim, so a rank off by one anywhere hash-fails.
  private val s23 = q("s23_hybrid_rrf", Some(
    """WITH corp AS (
          SELECT d.doc_id,
                 list_distinct(list_filter(
                   string_split_regex(lower(d.text), '\s+'), t -> len(t) > 0)) AS tk,
                 CAST(e.embedding AS DOUBLE[]) AS emb
          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        q AS (SELECT doc_id AS query_id, tk AS q_tk, emb AS q_emb
              FROM corp WHERE doc_id % 100 = 0),
        sc AS (SELECT q.query_id, c.doc_id AS neighbor_id,
                 CAST(len(list_intersect(q.q_tk, c.tk)) AS DOUBLE) /
                 CAST(len(list_distinct(list_concat(q.q_tk, c.tk))) AS DOUBLE) AS jacc,
                 list_dot_product(q.q_emb, c.emb) /
                 (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
                  sqrt(list_dot_product(c.emb, c.emb))) AS cos
               FROM q, corp c WHERE c.doc_id <> q.query_id),
        r AS (SELECT *,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY jacc DESC, neighbor_id) AS lex_rank,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS sem_rank
              FROM sc),
        f AS (SELECT query_id, neighbor_id,
                CAST(1 AS DOUBLE) / CAST(60 + lex_rank AS DOUBLE) +
                CAST(1 AS DOUBLE) / CAST(60 + sem_rank AS DOUBLE) AS rrf,
                lex_rank, sem_rank
              FROM r),
        rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rank
               FROM f)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, rrf,
               CAST(lex_rank AS INT) AS lex_rank, CAST(sem_rank AS INT) AS sem_rank
        FROM rr WHERE rank <= 10 ORDER BY query_id, rank""")) { t =>
    Search.hybridRrf(t.documents, t.embeddings,
      col("doc_id") % 100 === 0, k = 10)
      .orderBy("query_id", "rank")
  }

  // m04 — video FRAME SAMPLING plumbing (rows-only, like the rest of the
  // m tier: the container is the deterministic GVID stand-in — no video
  // codec ships with the JDK — but the Spark-side schema, per-partition
  // batch shape, row-local corrupt-container degradation, and the
  // gradient-sign frame hash feeding the shared banded-Hamming machinery
  // are all real and spec-pinned). Every 50th asset is truncated and must
  // contribute zero rows without failing the pass.
  private val m04 = q("m04_video_frames", None) { t =>
    import t.spark.implicits._
    val assets = Multimodal.syntheticVideoAssets(
      t.documents.select(col("doc_id")).as[Long])
    Multimodal.sampleFrames(assets, everyK = 4)
      .orderBy("asset_id", "frame_idx")
  }

  // e21 — position-based multi-touch attribution (the fractional-credit
  // generalization of e06's last-touch as-of): 40/20/40 first/middle/last
  // credit across each purchase's lookback touches. The interval predicate
  // rides the user_id equi-join; the position windows partition on
  // purchase_id (high cardinality — bounded partitions, no funnel).
  // Credits are single double divisions; the oracle recomputes the join,
  // both windows, and every CASE arm.
  private val e21 = q("e21_multitouch_attribution", Some(
    """WITH tch AS (SELECT user_id, ts, event_id AS touch_id, event_type
                    FROM events WHERE event_type IN ('view', 'click')),
        p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id
              FROM events WHERE event_type = 'purchase'),
        j AS (SELECT p.purchase_id, t.touch_id, t.event_type, t.ts
              FROM p JOIN tch t ON p.user_id = t.user_id
                AND t.ts <= p.p_ts AND t.ts >= p.p_ts - INTERVAL 48 HOUR),
        r AS (SELECT *,
                CAST(ROW_NUMBER() OVER (PARTITION BY purchase_id ORDER BY ts, touch_id) AS BIGINT) AS position,
                CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches
              FROM j)
        SELECT purchase_id, touch_id, event_type, position, n_touches,
               CASE WHEN n_touches = 1 THEN CAST(1.0 AS DOUBLE)
                    WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
                    WHEN position = 1 OR position = n_touches THEN CAST(0.4 AS DOUBLE)
                    ELSE CAST(0.2 AS DOUBLE) / CAST(n_touches - 2 AS DOUBLE) END AS credit
        FROM r ORDER BY purchase_id, position""")) { t =>
    Events.multiTouchAttribution(eventsTs(t)).orderBy("purchase_id", "position")
  }

  // x43 — corpus DRIFT report between two snapshots (md5-hash doc halves
  // standing in for recrawl N and N+1 — the synthetic sources are
  // id-parity-aligned, so a parity split would put each source wholly on
  // one side): per-source doc/token counts both
  // sides plus the total-variation distance between the unigram
  // distributions — computed EXACTLY by clearing denominators
  // (Σ|c_a·N_b − c_b·N_a| is an integer, decimal-summed), leaving one
  // double division per source where a float Σ|p−q| would be
  // accumulation-order-dependent. The oracle replays the split, both
  // count frames, the full-outer vocabulary join, and the cleared-
  // denominator arithmetic.
  private val x43 = q("x43_corpus_drift", Some(
    """WITH o AS (SELECT * FROM documents
               WHERE substring(md5(doc_id::VARCHAR || ':drift'), 1, 4) < '8000'),
        nw AS (SELECT * FROM documents
               WHERE substring(md5(doc_id::VARCHAR || ':drift'), 1, 4) >= '8000'),
        ca AS (SELECT source, tok, CAST(COUNT(*) AS DECIMAL(18,0)) AS c_a
               FROM (SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok FROM o) z
               WHERE tok <> '' GROUP BY 1, 2),
        cb AS (SELECT source, tok, CAST(COUNT(*) AS DECIMAL(18,0)) AS c_b
               FROM (SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok FROM nw) z
               WHERE tok <> '' GROUP BY 1, 2),
        ta AS (SELECT d.source, CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS docs_old, t.toks_a
               FROM o d LEFT JOIN (SELECT source, CAST(SUM(c_a) AS DECIMAL(18,0)) AS toks_a
                                   FROM ca GROUP BY 1) t ON d.source = t.source
               GROUP BY 1, 3),
        tb AS (SELECT d.source, CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS docs_new, t.toks_b
               FROM nw d LEFT JOIN (SELECT source, CAST(SUM(c_b) AS DECIMAL(18,0)) AS toks_b
                                    FROM cb GROUP BY 1) t ON d.source = t.source
               GROUP BY 1, 3),
        j AS (SELECT COALESCE(ca.source, cb.source) AS source,
                     COALESCE(ca.tok, cb.tok) AS tok,
                     COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
              FROM ca FULL OUTER JOIN cb ON ca.source = cb.source AND ca.tok = cb.tok),
        tv AS (SELECT j.source,
                      SUM(ABS(j.c_a * tb.toks_b - j.c_b * ta.toks_a)) AS tv_num
               FROM j JOIN ta ON j.source = ta.source JOIN tb ON j.source = tb.source
               GROUP BY 1)
        SELECT ta.source, ta.docs_old, tb.docs_new,
               CAST(COALESCE(ta.toks_a, 0) AS BIGINT) AS tokens_old,
               CAST(COALESCE(tb.toks_b, 0) AS BIGINT) AS tokens_new,
               CAST(tv.tv_num AS DOUBLE)
                 / NULLIF(2.0 * CAST(ta.toks_a AS DOUBLE) * CAST(tb.toks_b AS DOUBLE), 0.0)
                 AS tv_unigram
        FROM ta FULL OUTER JOIN tb ON ta.source = tb.source
        LEFT JOIN tv ON ta.source = tv.source
        ORDER BY ta.source""")) { t =>
    TextAnalysis.corpusDrift(
      t.documents.filter(Sampling.hashBucket(col("doc_id"), "drift") < lit("8000")),
      t.documents.filter(Sampling.hashBucket(col("doc_id"), "drift") >= lit("8000")))
      .orderBy("source")
  }

  // d23 — SimHash near-dup pairs by banded Hamming search (Manku et al.
  // 2007): candidate generation IS the 8-byte fingerprint (no shingle
  // pass, the cheapest near-dup exchange in the tier), pigeonhole banding
  // recall 1.0, exact popcount verify; one banded-Hamming implementation
  // serves text + image + audio. ORACLE-EXACT (VERDICT r13 #3): the
  // portable fingerprint lets DuckDB recompute EVERY fingerprint and then
  // enumerate ALL pairs at Hamming ≤ 3 by brute force — a hash match
  // proves the 4×16 pigeonhole banding dropped no qualifying pair (the
  // recall-1.0 claim, now gate-checked, not just spec-pinned).
  private val d23 = q("d23_simhash_neardup", Some(
    s"""WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
          FROM documents),
        fp AS (${graft.functions.SimhashFns.sqlSimhashFromTokens(
            "doc_id", "tok", "SELECT doc_id, tok FROM tok")})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY doc_a, doc_b""")) { t =>
    Dedup.simhashNearDupPairs(t.documents, maxHamming = 3)
      .orderBy("doc_a", "doc_b")
  }

  // x44 — per-SOURCE quality quantiles (the distribution monitor p06's
  // mean-based report card can't see: a source whose mean holds while its
  // tail collapses): exact interpolated p25/median/p75 of the x03 quality
  // score per source. The score carries source through the narrow scoring
  // pass (no doc_id join-back); grouped exact percentile inherits q24's
  // buffering contract with ~|corpus|/|sources| values per group.
  private val x44 = {
    val enStops = TextAnalysis.Lexicons.head._2.map(w => s"'$w'").mkString(", ")
    q("x44_source_quality_quantiles", Some(
      s"""WITH base AS (
            SELECT doc_id, source, len(text) AS n_chars,
                   string_split_regex(lower(text), '\\s+') AS w
            FROM documents),
          m AS (
            SELECT doc_id, source, n_chars,
                   len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
                   len(list_filter(w, x -> x IN ($enStops))) AS n_stop,
                   len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS n_shingles
            FROM base),
          s AS (
            SELECT source,
                   (least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
                    + CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    + CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    + CASE WHEN n_tokens > 2
                           THEN CAST(n_shingles AS DOUBLE) / CAST(n_tokens - 2 AS DOUBLE)
                           ELSE 0.0 END) / 4.0 AS quality
            FROM m)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY quality) AS p25,
                 PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY quality) AS median,
                 PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY quality) AS p75
          FROM s GROUP BY 1 ORDER BY source""")) { t =>
      TextAnalysis.qualityScore(t.documents, carryCols = Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          percentile(col("quality"), lit(0.25)).as("p25"),
          percentile(col("quality"), lit(0.5)).as("median"),
          percentile(col("quality"), lit(0.75)).as("p75"))
        .orderBy("source")
    }
  }

  // x45 — BM25 top-k RETRIEVAL from the persisted ranked index: x26's
  // scorer served from x39's store (OR semantics — the ranked complement
  // of the conjunctive serve). Postings carry their document's length
  // (the search-engine denormalization: no corpus-sized doc-length join
  // at query time), corpus stats live in an exact-integer sidecar, df
  // recounts over the pruned matching-rows scan, and the top-k is a
  // TakeOrderedAndProject totally ordered by (score desc, doc_id). The
  // oracle recomputes BM25 from the raw corpus with x26's exact treatment
  // (quantized DECIMAL(18,8) idf × saturation, exact decimal cross-term
  // sum, ROUND(4)) and takes the same totally-ordered top-k — so a lost
  // posting, wrong dl, stale sidecar, or mispruned bucket all hash-fail.
  private val bm25SearchOracleSql: String =
    """WITH base AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
          FROM documents),
        dl AS (SELECT doc_id, CAST(len(w) AS INT) AS dl FROM base),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
        dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS f
               FROM (SELECT doc_id, unnest(w) AS tok FROM base) z
               WHERE tok IN ('spark', 'join', 'window', 'shuffle')
               GROUP BY 1, 2),
        dft AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_t FROM dt GROUP BY 1),
        idf AS (SELECT tok,
                  CAST(ln((CAST(n_docs AS DOUBLE) - CAST(n_t AS DOUBLE) + 0.5)
                          / (CAST(n_t AS DOUBLE) + 0.5) + 1.0) AS DECIMAL(18,8)) AS idf
                FROM dft CROSS JOIN stats),
        sc AS (SELECT dt.doc_id,
                 SUM(idf * CAST(
                   (CAST(f AS DOUBLE) * 2.25)
                   / (CAST(f AS DOUBLE)
                      + 1.25 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                                / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))))
                   AS DECIMAL(18,8))) AS sdec
               FROM dt JOIN dl USING (doc_id) JOIN idf USING (tok)
               CROSS JOIN stats GROUP BY 1)
        SELECT doc_id, ROUND(CAST(sdec AS DOUBLE), 4) AS bm25
        FROM sc ORDER BY bm25 DESC, doc_id LIMIT 25"""

  private val x45 = q("x45_bm25_search", Some(bm25SearchOracleSql)) { t =>
    val idx = graft.TempDirs.scoped("graft-ranked-idx")
    Search.writeRankedIndex(t.documents, idx)
    Search.searchRanked(t.spark, idx,
      Seq("spark", "join", "window", "shuffle"), k = 25)
  }

  // x48 — INCREMENTAL maintenance of the x45 ranked store: the corpus
  // lands in two appends (even/odd doc halves — documents arrive WHOLE,
  // the ranked store's batch contract) under the staged-version +
  // CURRENT-pointer protocol; serve merges postings by additive tf and
  // corpus stats by exact-integer Σ of the per-version sidecars. x45's
  // VERBATIM oracle hash-proves incremental ≡ from-scratch — the x42
  // pattern, now for RANKED retrieval (idf/avgdl must come out identical
  // from merged stats, not just the tf sums).
  private val x48 = q("x48_bm25_incremental", Some(bm25SearchOracleSql)) { t =>
    val idx = graft.TempDirs.scoped("graft-ranked-inc")
    Search.initRankedIndex(t.documents.filter(col("doc_id") % 2 === 0), idx)
    Search.appendToRankedIndex(t.documents.filter(col("doc_id") % 2 === 1), idx)
    Search.searchRankedIndexed(t.spark, idx,
      Seq("spark", "join", "window", "shuffle"), k = 25)
  }

  // e22 — hour-of-day seasonality per event type: 24-bin histogram
  // collapsed to (n, exact χ² vs uniform, peak hour, peak share). The χ²
  // numerator (24·Σobs² − n²) is exact DECIMAL(38,0) integer arithmetic
  // (x43's cleared-denominator treatment — a float Σ(obs−e)²/e would be
  // accumulation-order-dependent), one double division per type; peak via
  // max(struct), ties to the smaller hour. The oracle replays the same
  // cleared form in HUGEINT.
  private val e22 = q("e22_hourly_seasonality", Some(
    """WITH h AS (
         SELECT event_type, EXTRACT(hour FROM ts) AS hr,
                CAST(COUNT(*) AS HUGEINT) AS c
         FROM events GROUP BY 1, 2),
       s AS (SELECT event_type, SUM(c) AS n, SUM(c * c) AS sum_sq
             FROM h GROUP BY 1),
       p AS (SELECT event_type, hr AS peak_hour, c AS peak_c,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c DESC, hr) AS rn
             FROM h)
       SELECT s.event_type, CAST(n AS BIGINT) AS n_events,
              ROUND(CAST(24 * sum_sq - n * n AS DOUBLE) / CAST(n AS DOUBLE), 4) AS chi2,
              CAST(p.peak_hour AS BIGINT) AS peak_hour,
              ROUND(CAST(peak_c AS DOUBLE) / CAST(n AS DOUBLE), 4) AS peak_share
       FROM s JOIN p USING (event_type) WHERE rn = 1 ORDER BY event_type""")) { t =>
    Events.hourlySeasonality(eventsTs(t)).orderBy("event_type")
  }

  // e23 — audience overlap matrix: exact |users(A) ∩ users(B)| + Jaccard
  // per event-type pair (the co-engagement matrix; the exact baseline the
  // HLL sketch tier can't intersect without compounding
  // inclusion–exclusion error). One distinct (user, type) pass, a
  // user-keyed pair join bounded by |types|² per user, a |types|²-keyed
  // rollup; the oracle recomputes audiences, intersections, and the
  // division.
  private val e23 = q("e23_audience_overlap", Some(
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
       p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
             FROM ut a JOIN ut b ON a.user_id = b.user_id
               AND a.event_type < b.event_type
             GROUP BY 1, 2),
       s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1)
       SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
              ROUND(CAST(n_both AS DOUBLE) / CAST(sa.n + sb.n - n_both AS DOUBLE), 4)
                AS jaccard
       FROM p JOIN s sa ON p.type_a = sa.event_type
              JOIN s sb ON p.type_b = sb.event_type
       ORDER BY type_a, type_b""")) { t =>
    Events.audienceOverlap(eventsTs(t)).orderBy("type_a", "type_b")
  }

  // e25 — CUSUM change-point per event type: the day where the cumulative
  // deviation from the mean daily volume peaks (Page 1954 — the
  // level-shift detector e13's pointwise z-scores can't see). Exact by
  // clearing denominators: S_t = D·cum_t − t·T is pure integers (the x43
  // treatment); argmax |S_t| ties to the earliest day via max(struct)
  // with a negated epoch-day key; ONE double division per type at the
  // end. The oracle replays the windowed integer recurrence.
  private val e25 = q("e25_changepoint", Some(
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                    CAST(COUNT(*) AS BIGINT) AS c
                  FROM events GROUP BY 1, 2),
       s AS (SELECT event_type, day, c,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
               SUM(c) OVER w AS cum,
               COUNT(*) OVER p AS n_days,
               SUM(c) OVER p AS total
             FROM d
             WINDOW w AS (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING),
                    p AS (PARTITION BY event_type)),
       v AS (SELECT event_type, day, n_days, total,
               n_days * cum - t * total AS sdev
             FROM s),
       r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY ABS(sdev) DESC, day) AS rn
             FROM v)
       SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
              CAST(total AS BIGINT) AS n_events, day AS cp_day,
              CAST(sdev AS BIGINT) AS s_at_peak,
              ROUND(CAST(ABS(sdev) AS DOUBLE)
                    / CAST(n_days * total AS DOUBLE), 6) AS score
       FROM r WHERE rn = 1 ORDER BY event_type""")) { t =>
    Events.changePoints(eventsTs(t)).orderBy("event_type")
  }

  // e26 — WINDOWED conversion funnel: per signup cohort day, the fraction
  // of first-signup users who purchase within 7 days (e04's unbounded
  // funnel bounded — a conversion a year later doesn't count). Interval
  // closed on both ends in exact integer microseconds; the oracle replays
  // first-signup, the bounded join, and the distinct-conversion rollup.
  private val e26 = q("e26_windowed_conversion", Some(
    """WITH f AS (SELECT user_id, MIN(epoch_us(ts)) AS s_us
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
       c AS (SELECT DISTINCT e.user_id
             FROM events e JOIN f ON e.user_id = f.user_id
             WHERE e.event_type = 'purchase'
               AND epoch_us(e.ts) >= f.s_us
               AND epoch_us(e.ts) <= f.s_us + 604800000000)
       SELECT CAST(make_timestamp(f.s_us) AS DATE) AS cohort_day,
              CAST(COUNT(*) AS BIGINT) AS n_signups,
              CAST(COUNT(c.user_id) AS BIGINT) AS n_converted,
              ROUND(CAST(COUNT(c.user_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS cvr
       FROM f LEFT JOIN c ON f.user_id = c.user_id
       GROUP BY 1 ORDER BY cohort_day""")) { t =>
    Events.windowedConversion(eventsTs(t)).orderBy("cohort_day")
  }

  // d24 — MinHash-ESTIMATED near-dup pairs: the at-scale verify path when
  // even candidate-restricted exact-Jaccard is too expensive — est_j =
  // matching-signature-component fraction, unbiased with std-err
  // √(j(1−j)/64). ORACLE-EXACT (VERDICT r13 #3): the portable signature
  // family (MinhashFns — affine maps over the poly-fold base hash) lets
  // DuckDB recompute every signature, replay the 16×4 banding as a raw
  // slice-equality join, and re-derive the estimator; output parity is
  // EXACT, not probabilistic — any pair at est_j ≥ 0.8 has ≤ 12 mismatched
  // components, so ≥ 4 of 16 bands are intact and BOTH engines surface it
  // (pigeonhole). The measured estimate error vs exact Jaccard stays
  // spec-pinned in DedupSpec.
  private val d24 = {
    val k = Dedup.MinhashBands * Dedup.MinhashRows
    q("d24_neardup_estimated", Some(
      s"""WITH sh AS (${TextFns.sqlShingleRows("doc_id", "text", "documents")}),
          comp AS (${graft.functions.MinhashFns.sqlSigComponents(
              "doc_id", "SELECT doc_id, shingle FROM sh", k)}),
          band AS (SELECT doc_id, s // ${Dedup.MinhashRows} AS band,
                          list(v ORDER BY s) AS slice
                   FROM comp GROUP BY doc_id, (s // ${Dedup.MinhashRows})),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM band a JOIN band b
                     ON a.band = b.band AND a.slice = b.slice
                        AND a.doc_id < b.doc_id),
          est AS (SELECT c.doc_a, c.doc_b,
                         CAST(SUM(CASE WHEN ca.v = cb.v THEN 1 ELSE 0 END) AS DOUBLE)
                           / ${k}.0 AS est_j
                  FROM cand c
                  JOIN comp ca ON ca.doc_id = c.doc_a
                  JOIN comp cb ON cb.doc_id = c.doc_b AND cb.s = ca.s
                  GROUP BY 1, 2)
          SELECT doc_a, doc_b, est_j FROM est WHERE est_j >= 0.8
          ORDER BY doc_a, doc_b""")) { t =>
      Dedup.estimatedNearDupPairs(t.documents, threshold = 0.8)
        .orderBy("doc_a", "doc_b")
    }
  }

  // e24 — recency-weighted trending score per event type: counts decayed
  // by 0.5^(age_days/7) against the corpus's newest day. Weights are
  // pow-of-identical-doubles quantized to DECIMAL(18,12) (the x16
  // treatment), accumulation exact decimal — the oracle replays the same
  // quantize-then-sum, so a float Σ would hash-fail on accumulation order.
  private val e24 = q("e24_trending_decay", Some(
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                    CAST(COUNT(*) AS BIGINT) AS c
                  FROM events GROUP BY 1, 2),
       r AS (SELECT MAX(day) AS ref_day FROM d),
       w AS (SELECT event_type, c,
               CAST(pow(0.5, CAST(datediff('day', day, ref_day) AS DOUBLE) / 7.0)
                    AS DECIMAL(18,12)) AS w
             FROM d CROSS JOIN r)
       SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_events,
              ROUND(CAST(SUM(CAST(c AS DECIMAL(12,0)) * w) AS DOUBLE), 4) AS decayed
       FROM w GROUP BY 1 ORDER BY event_type""")) { t =>
    Events.trendingDecay(eventsTs(t)).orderBy("event_type")
  }

  // e27 — per-type value percentiles served from the PERSISTED quantile-
  // histogram store (operators/QuantileStore): the event log lands in
  // three appends (event_id % 3 — mirrors batch arrival), each folding to
  // a |types|·|cent-buckets| histogram version under the CountStore
  // protocol, and the serve reads ONLY the merged histogram — never an
  // event. Ranks are integer arithmetic on cumulative counts ((q·(n−1))
  // div 100 / mod 100), doubles only in the final lo + frac·(hi−lo)
  // render; the oracle quantizes identically and replays the identical
  // rank/interpolation formulas (no built-in percentile on either side),
  // so a lost bucket, a double-counted append, or any interpolation drift
  // hash-fails. At 100 TB: appends shuffle bucket partials, the serve is
  // a metadata-scale rollup, and the quantization scale is the documented
  // accuracy knob (exact for quantized values, ±½ bucket of raw).
  private val e27 = q("e27_quantile_store", Some(
    s"""WITH h AS (
          SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vcents,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        histcum AS (
          SELECT event_type, vcents, cnt,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY vcents) AS cum
          FROM h),
        ${graft.operators.QuantileStore.quantileOracleTail("event_type", Seq(25, 50, 75, 90))}
        ORDER BY event_type, pct""")) { t =>
    val ev = eventsTs(t)
    val root = graft.TempDirs.scoped("graft-qstore")
    graft.operators.QuantileStore.write(
      ev.filter(col("event_id") % 3 === 0), "event_type", "value", root)
    graft.operators.QuantileStore.append(
      ev.filter(col("event_id") % 3 === 1), "event_type", "value", root)
    graft.operators.QuantileStore.append(
      ev.filter(col("event_id") % 3 === 2), "event_type", "value", root)
    graft.operators.QuantileStore.serve(t.spark, root, Seq(25, 50, 75, 90))
      .orderBy("event_type", "pct")
  }

  // e28 — ROLLING 7-day value percentiles (p50/p90 per window day) via
  // HISTOGRAM MERGE — the sliding-window order statistic that defeats
  // naive engines at scale (a per-window re-sort is O(|window| log) per
  // day over raw events): daily cent-bucket histograms are built ONCE
  // (one map-side-combined pass over the event log), each window is the
  // ADDITIVE merge of its ≤7 daily histograms (the associativity e27's
  // store banks on, here as a bounded |days|·7·|buckets| range join),
  // and the e27 rank/interpolation arithmetic serves the percentiles —
  // raw events are never revisited. The oracle replays the identical
  // bucketing, window merge, and shared interpolation formulas
  // (QuantileStore.quantileOracleTail), so a day leaking into the wrong
  // window or a drifted rank hash-fails.
  private val e28 = q("e28_rolling_quantiles", Some(
    s"""WITH d AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(floor(value * 100) AS BIGINT) AS vcents,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        days AS (SELECT DISTINCT day AS win_day FROM d),
        h AS (SELECT win_day, vcents, CAST(SUM(cnt) AS BIGINT) AS cnt
              FROM days JOIN d ON d.day >= win_day - 6 AND d.day <= win_day
              GROUP BY 1, 2),
        histcum AS (
          SELECT win_day, vcents, cnt,
                 SUM(cnt) OVER (PARTITION BY win_day ORDER BY vcents) AS cum
          FROM h),
        ${graft.operators.QuantileStore.quantileOracleTail("win_day", Seq(50, 90))}
        ORDER BY win_day, pct""")) { t =>
    // the daily histogram materializes ONCE: deriving the window-day list
    // from the lazy frame would re-plan a SECOND full event-log scan
    // (column pruning makes the two subtrees differ, so no exchange
    // reuse) — at 100 TB the one-scan contract is the operator's point
    val daily = graft.operators.Materialize.cut(eventsTs(t)
      .groupBy(to_date(col("ts")).as("day"),
        floor(col("value") * 100).cast("long").as("vcents"))
      .agg(count(lit(1)).cast("long").as("cnt")))
    val days = daily.select(col("day").as("win_day")).distinct()
    // window membership by EXPLODE-to-grain + EQUI semi-join (r17, §3 /
    // the RangeJoin binning idea): each daily row contributes to exactly
    // the ≤7 window days [day, day+6], so expanding those and semi-joining
    // the observed-day list replaces the old range-predicate join — which
    // planned as a broadcast nested loop, O(|daily|·|days|) comparisons,
    // quadratic in the day span at scale — with |daily|·7 rows and one
    // equi join. Row set identical: (win_day ∈ days, day ∈ [win_day−6,
    // win_day]) ⇔ (win_day ∈ [day, day+6] ∩ days).
    val hist = daily
      .withColumn("win_day",
        explode(sequence(col("day"), date_add(col("day"), 6))))
      .join(days, Seq("win_day"), "left_semi")
      .groupBy("win_day", "vcents").agg(sum("cnt").as("cnt"))
    graft.operators.QuantileStore.quantilesOf(hist, "win_day", Seq(50, 90))
      .orderBy("win_day", "pct")
  }

  // x46 — readability battery (Flesch reading ease + FK grade): exact
  // integer sentence/word/vowel-group counts, and EXACT INTEGER scoring —
  // each score is one common-denominator rational over the counts,
  // rounded half-away-from-zero in integer arithmetic ((num·10⁴ ± den/2)
  // // den; DuckDB `//` truncates toward zero exactly like Spark's `div`,
  // verified on negatives) and rendered as the exact double scaled/10⁴.
  // ROUND(double, 4) was the round-12 form and split 4.4262 vs 4.4263 on
  // a half-boundary document at sf0.1 — Spark rounds the exact binary
  // expansion, DuckDB scales in floating point. The oracle replays the
  // identical integer formula, so a regex divergence, a different floor,
  // or any arithmetic drift hash-fails. The corpus is punctuation-light
  // word salad, so most docs floor at one sentence; the injected '. '
  // suffix on every 6th doc exercises the sentence counter.
  private val x46 = q("x46_readability", Some(
    """WITH noisy AS (
         SELECT doc_id,
           text || CASE WHEN doc_id % 6 = 0 THEN ' end. Really end! ok?' ELSE '' END AS nt
         FROM documents),
       c AS (
         SELECT doc_id,
           CAST(GREATEST(len(regexp_extract_all(nt, '[.!?]+')), 1) AS BIGINT) AS s,
           CAST(len(string_split_regex(lower(nt), '\s+')) AS BIGINT) AS w,
           CAST(list_sum(list_transform(string_split_regex(lower(nt), '\s+'),
             x -> GREATEST(len(regexp_extract_all(x, '[aeiouy]+')), 1))) AS BIGINT) AS y
         FROM noisy),
       f AS (
         SELECT doc_id, s, w, y,
           206835 * w * s - 1015 * w * w - 84600 * y * s AS fnum,
           1000 * w * s AS fden,
           39 * w * w + 1180 * y * s - 1559 * w * s AS knum,
           100 * w * s AS kden
         FROM c)
       SELECT doc_id,
         s AS n_sentences, w AS n_words, y AS n_syllables,
         CAST((fnum * 10000 + CASE WHEN fnum >= 0 THEN fden // 2 ELSE -(fden // 2) END)
              // fden AS DOUBLE) / 10000.0 AS flesch,
         CAST((knum * 10000 + CASE WHEN knum >= 0 THEN kden // 2 ELSE -(kden // 2) END)
              // kden AS DOUBLE) / 10000.0 AS fk_grade
       FROM f ORDER BY doc_id""")) { t =>
    val noisy = t.documents.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 6 === 0, lit(" end. Really end! ok?")).otherwise(""))
      .as("nt"))
    TextAnalysis.readability(noisy, "nt").orderBy("doc_id")
  }

  // x47 — vocabulary profile: corpus Zipf-concentration diagnostics
  // (token total, vocab size, hapax count/fraction, top-10/top-100 token
  // share) — all exact integer counts with one double division each; the
  // top-k boundary is totally ordered (count desc, term) in both engines,
  // so a tie at rank 100 can't diverge.
  private val x47 = q("x47_vocab_profile", Some(
    """WITH tc AS (
         SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_w
         FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
               FROM documents) z
         GROUP BY 1),
       tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_vocab,
                 CAST(SUM(CASE WHEN n_w = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
               FROM tc),
       t10 AS (SELECT CAST(SUM(n_w) AS BIGINT) AS top10 FROM
                 (SELECT n_w FROM tc ORDER BY n_w DESC, tok LIMIT 10) a),
       t100 AS (SELECT CAST(SUM(n_w) AS BIGINT) AS top100 FROM
                 (SELECT n_w FROM tc ORDER BY n_w DESC, tok LIMIT 100) b)
       SELECT n_tokens, n_vocab, n_hapax,
              ROUND(CAST(n_hapax AS DOUBLE) / CAST(n_vocab AS DOUBLE), 4) AS hapax_frac,
              ROUND(CAST(top10 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS top10_share,
              ROUND(CAST(top100 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS top100_share
       FROM tot CROSS JOIN t10 CROSS JOIN t100""")) { t =>
    TextAnalysis.vocabularyProfile(t.documents)
  }

  val all: Seq[QueryDef] =
    Seq(d01, d02, d03, d04, d05, d06, d07, d08, d09, d10, d11, d12, d13, d14, d15, d16, d17, d18, d19, d20, d21, d22, d23, d24, d25, d26, d27,
      s01, s02, s03, s04, s05, s06, s07, s08, s09, s10, s11, s12, s13, s14, s15, s16, s17, s18, s19, s20, s21, s22, s23, s24, s25, s26,
      x01, x02, x03, x04, x05, x06, x07, x08, x09, x10, x11, x12, x13, x14, x15, x16, x17, x18, x19, x20, x21, x22, x23, x24, x25, x26, x27, x28, x29, x30, x31, x32, x33, x34, x35, x36, x37, x38, x39, x40, x41, x42, x43, x44, x45, x46, x47, x48, x49, x50, x51,
      e01, e02, e03, e04, e05, e06, e07, e08, e09, e10, e11, e12, e13, e14, e15, e16, e17, e18, e19, e20, e21, e22, e23, e24, e25, e26, e27, e28,
      p01, p02, p03, p04, p05, p06, p07, p08, p09, p10, p11, m01, m02, m03, m04, m05)
}
