package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{EventOps, MultimodalOps, RelationalOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §2.7/§7.
  *
  * Every query is a pure (SparkSession, sfDir) => DataFrame; each with an
  * entry in [[oracleSql]] is hash-compared by the driver against DuckDB on
  * the same parquet tables (columns sorted by name, so aliases match on
  * both sides; numeric aggregates are decimal-exact → double, see
  * [[graft.Num]]). Queries without an oracle (approx/hash-defined output)
  * get the driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's materialized-view downsampling (gauge-avg + counter-sum
    * branches unioned, SURVEY.md §2.4 D1/D2).
    */
  def entry(spark: SparkSession): DataFrame =
    EventOps.downsampleLts(spark, "/root/testdata/sf0.001")

  /** Ingest-time work run once per dataset before queries are timed — the
    * analog of the reference's insert-time index maintenance (bloom skip
    * indexes are built by ClickHouse at write, not per query). Queries also
    * self-build lazily; this hook just keeps index builds out of bench
    * timings.
    */
  def prepare(spark: SparkSession, dir: String): Unit =
    prepareTimed(spark, dir): Unit

  /** [[prepare]] with per-artifact wall-clock (r11): the bench records
    * the amortized ingest cost next to the query timings it buys —
    * q_kmeans's ~40 ms serving read is honest only alongside the fit's
    * ~1 s ingest cost. Names are stable identifiers for the sidecar's
    * `prepare_breakdown` map; the compact metric line carries the total
    * as `prepare_ms`.
    */
  def prepareTimed(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val steps: Seq[(String, () => Any)] = Seq(
      "tag_index" -> (() => graft.operators.TagIndex.ensure(spark, dir)),
      "text_index" -> (() => graft.operators.TextIndex.ensure(spark, dir)),
      "lsh_index" -> (() =>
        graft.operators.VectorOps.cachedLshIndex(spark, dir, maxBucket = 100000)),
      "lsh_occupancy" -> (() => graft.operators.VectorOps.lshOccupancy(spark, dir)),
      "ivf_codebook" -> (() => graft.operators.VectorOps.trainedCodebook(spark, dir)),
      "ivf_assigned" -> (() => graft.operators.VectorOps.cachedIvfAssigned(spark, dir)),
      "pq_assigned" -> (() => graft.operators.VectorOps.cachedPqAssigned(spark, dir)),
      "query_vecs" -> (() => graft.operators.VectorOps.cachedQueryVecs(spark, dir)),
      "corpus_route" -> (() => graft.plans.CorpusRoute.ensureArtifacts(spark, dir)),
      // the per-day KMV-state rollup q_distinct_approx and its SQL twin
      // are served from (r13 — sketch-partial MV routing)
      "kmv_route" -> (() => graft.plans.KmvRoute.ensureArtifacts(spark, dir)),
      // the per-(type, day) exact-histogram rollup q_percentiles_approx
      // is served from (r14 — quantile-partial MV routing)
      "quantile_route" -> (() =>
        graft.plans.QuantileRoute.ensureArtifacts(spark, dir)),
      "bpe_rules" -> (() => graft.operators.TextOps.trainedBpeRules(spark, dir, 10)),
      // built via the maintained path (prefix build + appendTo + compact)
      "winnow_index" -> (() => graft.operators.WinnowIndex.ensure(spark, dir)),
      "vector_exactsig" -> (() => graft.operators.VectorIndex.ensureExactSig(spark, dir)),
      // per-modality perceptual-hash artifacts (r13): media is decoded
      // and hashed HERE, once per dataset — the near-dup queries then
      // band-join stored 16-byte rows instead of re-decoding the corpus
      "media_hash_image" -> (() =>
        graft.operators.MediaHashIndex.ensure(spark, dir,
          graft.operators.MediaHashIndex.Image)),
      "media_hash_audio" -> (() =>
        graft.operators.MediaHashIndex.ensure(spark, dir,
          graft.operators.MediaHashIndex.Audio)),
      // the exact-fit models behind q_kmeans / q_ann_ivf_exactsig /
      // q_ann_pq_exactsig — trained once per dataset at ingest like the
      // float codebooks above
      "kmeans_fit" -> (() => graft.operators.VectorOps.kmeansFit(spark, dir, 8, 5)),
      "pq_fit" -> (() => graft.operators.VectorOps.cachedPqFit(spark, dir)),
      // the SQL front door's views (§3.3) — each q_sql_* query also
      // re-registers unconditionally (views are session state prepare
      // cannot own), this step just makes the surface reachable from
      // plain spark.sql right after ingest
      "sql_views" -> (() => SqlFrontDoor.registerViews(spark, dir)))
    steps.map { case (name, run) =>
      val t0 = System.nanoTime()
      // per-step, not all-or-nothing: one failed build must not discard
      // the completed steps' timings (the record would then claim
      // prepare was free while the failed artifact rebuilds inside a
      // TIMED query window — the exact distortion prepare_ms exists to
      // prevent); the failure still lands loudly on stderr and the
      // affected queries' own lazy builds surface it
      try run()
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[prepare] $name failed: $e")
      }
      name -> (System.nanoTime() - t0) / 1000000L
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // yamon-analog event-stream surface (SURVEY.md §2.7)
    "q_scan_filter" -> EventOps.scanFilter _,
    "q_bucket_avg" -> EventOps.bucketAvg _,
    "q_bucket_sum" -> EventOps.bucketSum _,
    "q_tag_filter" -> EventOps.tagFilter _,
    "q_downsample_lts" -> EventOps.downsampleLts _,
    "q_topk" -> EventOps.topK _,
    "q_rate" -> EventOps.rate _,
    "q_session" -> EventOps.session _,
    "q_join_enrich" -> EventOps.joinEnrich _,
    "q_distinct_daily" -> EventOps.distinctDaily _,
    // SQL front-door twins (§3.3 — the reference's real query surface is
    // external SQL): authored as spark.sql TEXT over the registered
    // views, same oracles as their DSL twins, plan identity PlanSpec-pinned
    "q_sql_bucket_avg" -> SqlFrontDoor.sqlBucketAvg _,
    "q_sql_bucket_sum" -> SqlFrontDoor.sqlBucketSum _,
    "q_sql_downsample" -> SqlFrontDoor.sqlDownsampleLts _,
    "q_sql_topk" -> SqlFrontDoor.sqlTopK _,
    "q_sql_rate" -> SqlFrontDoor.sqlRate _,
    "q_sql_session" -> SqlFrontDoor.sqlSession _,
    "q_sql_tag_filter" -> SqlFrontDoor.sqlTagFilter _,
    "q_sql_distinct_approx" -> SqlFrontDoor.sqlDistinctApprox _,
    "q_sql_percentiles_approx" -> SqlFrontDoor.sqlPercentilesApprox _,
    "q_sql_route_stats" -> SqlFrontDoor.sqlRouteStats _,
    // the index-served RETRIEVAL class through the front door (r13):
    // BM25 top-k authored as SQL text over the registered text-index
    // views, same oracle as q_bm25_indexed, term-shard pruning
    // PlanSpec-pinned to survive the SQL face
    "q_sql_bm25_indexed" -> SqlFrontDoor.sqlBm25Indexed _,
    "q_sql_winnow_match" -> SqlFrontDoor.sqlWinnowMatch _,
    "q_sql_phrase_search" -> SqlFrontDoor.sqlPhraseSearch _,
    "q_sql_hybrid_search" -> SqlFrontDoor.sqlHybridSearch _,
    "q_distinct_approx" -> EventOps.distinctApprox _,
    "q_log_level_hist" -> EventOps.logLevelHist _,
    "q_set_except" -> EventOps.setExcept _,
    "q_anti_join" -> EventOps.antiJoin _,
    "q_asof_purchase" -> EventOps.asofPurchase _,
    "q_range_nearby" -> EventOps.rangeNearbyPurchases _,
    "q_percentiles" -> EventOps.valuePercentiles _,
    "q_percentiles_approx" -> EventOps.valuePercentilesApprox _,
    "q_rollup" -> EventOps.rollupCounts _,
    "q_pivot_daily" -> EventOps.pivotDaily _,
    // relational parity (ClickHouse-SQL-class capability, SURVEY.md §2.6)
    "q1_pricing" -> RelationalOps.pricingSummary _,
    "q3_shipping_priority" -> RelationalOps.shippingPriority _,
    "q4_order_priority" -> RelationalOps.orderPriority _,
    "q5_region_revenue" -> RelationalOps.regionRevenue _,
    "q_brand_volume" -> RelationalOps.brandVolume _,
    "q_window_first_shipments" -> RelationalOps.supplierFirstShipments _,
    // training-data pipeline: text (SURVEY.md §7.5)
    "q_text_stats" -> TextOps.textStats _,
    "q_route_stats" -> ((s, d) => graft.plans.CorpusRoute.routedStats(s, d)),
    "q_dedup_exact" -> TextOps.dedupExact _,
    "q_fingerprint" -> TextOps.fingerprint _,
    "q_quality_score" -> TextOps.qualityScore _,
    "q_lang_id" -> TextOps.langIdHeuristic _,
    "q_pii_scrub" -> TextOps.piiScrub _,
    "q_lm_score" -> TextOps.lmScore _,
    "q_nb_quality" -> TextOps.nbQuality _,
    "q_dsir_select" -> ((s, d) => TextOps.dsirSelect(s, d)),
    "q_filter_funnel" -> TextOps.filterFunnel _,
    "q_perplexity_bucket" -> TextOps.perplexityBuckets _,
    "q_budget_select" -> ((s, d) => TextOps.budgetSelect(s, d)),
    "q_corpus_diff" -> TextOps.corpusDiff _,
    "q_oov_rate" -> ((s, d) => TextOps.oovRate(s, d)),
    "q_top_ngrams" -> ((s, d) => TextOps.topNgrams(s, d)),
    "q_winnow" -> ((s, d) => TextOps.winnowFingerprints(s, d)),
    "q_winnow_overlap" -> ((s, d) => TextOps.winnowOverlap(s, d)),
    "q_winnow_clusters" -> ((s, d) => TextOps.winnowClusters(s, d)),
    "q_winnow_match" -> ((s, d) => TextOps.winnowMatch(s, d)),
    "q_winnow_match_indexed" -> ((s, d) => TextOps.winnowMatchIndexed(s, d)),
    "q_winnow_snippet" -> ((s, d) => TextOps.winnowSnippet(s, d)),
    "q_rag_chunks" -> ((s, d) => TextOps.ragChunks(s, d)),
    "q_chunk_search" -> ((s, d) => TextOps.chunkSearch(s, d)),
    "q_bm25_topk" -> ((s, d) => TextOps.bm25TopK(s, d)),
    "q_bm25_indexed" -> ((s, d) => graft.operators.TextIndex.bm25TopKIndexed(s, d)),
    "q_phrase_search" -> ((s, d) => graft.operators.TextIndex.phraseSearch(s, d)),
    "q_index_terms" -> ((s, d) => graft.operators.TextIndex.termStats(s, d)),
    "q_shard_pack" -> ((s, d) => TextOps.shardPack(s, d)),
    "q_source_overlap" -> ((s, d) => TextOps.sourceOverlap(s, d)),
    "q_dup_profile" -> TextOps.dupProfile _,
    "q_corpus_stats" -> TextOps.corpusStats _,
    "q_vocab_growth" -> ((s, d) => TextOps.vocabGrowth(s, d)),
    "q_tfidf_terms" -> ((s, d) => TextOps.tfidfTerms(s, d)),
    "q_token_jaccard" -> TextOps.tokenJaccard _,
    "q_ngram_jaccard" -> TextOps.ngramJaccard _,
    "q_containment" -> ((s, d) => TextOps.containment(s, d)),
    "q_dedup_clusters" -> ((s, d) => TextOps.dedupClusters(s, d)),
    "q_quality_survivor" -> TextOps.qualitySurvivor _,
    "q_minhash_lsh" -> TextOps.minhashLsh _,
    "q_minhash_shingle" -> TextOps.minhashShingle _,
    "q_token_counts" -> TextOps.tokenCounts _,
    "q_sample_hash" -> TextOps.hashSample _,
    "q_sample_stratified" -> ((s, d) => TextOps.stratifiedSample(s, d)),
    "q_sample_temperature" -> ((s, d) => TextOps.temperatureSample(s, d)),
    "q_decontaminate" -> ((s, d) => TextOps.decontaminate(s, d)),
    "q_simhash" -> TextOps.simhash _,
    "q_minhash_profile" -> TextOps.minhashProfile _,
    "q_repetition" -> TextOps.repetitionSignals _,
    "q_chunk_dedup" -> ((s, d) => TextOps.chunkDedup(s, d)),
    "q_boilerplate" -> ((s, d) => TextOps.boilerplateChunks(s, d)),
    "q_dup_spans" -> ((s, d) => TextOps.dupSpans(s, d)),
    "q_span_scrub" -> ((s, d) => TextOps.spanScrub(s, d)),
    "q_contam_spans" -> ((s, d) => TextOps.contamSpans(s, d)),
    "q_incr_spans" -> ((s, d) => TextOps.incrSpans(s, d)),
    "q_pack_sequences" -> ((s, d) => TextOps.packSequences(s, d)),
    "q_vocab_df" -> ((s, d) => TextOps.vocabDocFreq(s, d)),
    "q_split_assign" -> TextOps.splitAssign _,
    "q_merge_pairs" -> ((s, d) => TextOps.mergePairs(s, d)),
    "q_incremental_dedup" -> TextOps.incrementalDedup _,
    "q_corpus_mix" -> ((s, d) => TextOps.corpusMix(s, d)),
    // training-data pipeline: embeddings
    "q_cosine_topk" -> VectorOps.cosineTopK _,
    "q_embed_near_dup" -> VectorOps.embeddingNearDup _,
    "q_embed_clusters" -> VectorOps.embedClusters _,
    "q_embed_prune" -> VectorOps.embedPrune _,
    "q_hybrid_dedup" -> ((s, d) => VectorOps.hybridNearDup(s, d)),
    "q_embed_incr_dedup" -> ((s, d) => VectorOps.incrEmbedDedup(s, d)),
    "q_bpe_merges" -> ((s, d) => TextOps.bpeMerges(s, d)),
    "q_bpe_tokens" -> ((s, d) => TextOps.bpeTokenCounts(s, d)),
    "q_corpus_build" -> TextOps.corpusBuild _,
    "q_knn_join" -> ((s, d) => VectorOps.knnJoin(s, d)),
    "q_knn_blocked" -> ((s, d) => VectorOps.knnBlocked(s, d)),
    "q_kmeans" -> ((s, d) => VectorOps.kmeansAssign(s, d)),
    "q_filtered_topk" -> VectorOps.filteredTopK _,
    "q_hybrid_search" -> ((s, d) => VectorOps.hybridSearch(s, d)),
    "q_ann_filtered" -> ((s, d) => VectorOps.annIvfFiltered(s, d)),
    "q_ann_lsh" -> ((s, d) => VectorOps.annLshTuned(s, d, budget = 0.6)),
    "q_ann_lsh_exactsig" -> ((s, d) => VectorOps.annLshExactSig(s, d)),
    "q_ann_sig_indexed" -> ((s, d) => VectorOps.annLshExactSigIndexed(s, d)),
    "q_ann_ivf_exactsig" -> ((s, d) => VectorOps.annIvfExactSig(s, d)),
    "q_ann_ivf" -> ((s, d) => VectorOps.annIvf(s, d)),
    "q_ann_pq_exactsig" -> ((s, d) => VectorOps.annPqExactSig(s, d)),
    "q_ann_pq" -> ((s, d) => VectorOps.annPq(s, d)),
    // training-data pipeline: multimodal (real BMP/WAV container decode; rows-only)
    "q_media_pipeline" -> MultimodalOps.mediaPipeline _,
    "q_media_codecs" -> MultimodalOps.mediaCodecPipeline _,
    // perceptual near-dup (band join over native exact-integer hashes;
    // rows-only — the hashes are packing/codec-defined; MultimodalSpec
    // pins both bit-exactly + banded ≡ brute-force + recall floors)
    "q_image_neardup" -> ((s, d) => MultimodalOps.imageNearDup(s, d)),
    "q_audio_neardup" -> ((s, d) => MultimodalOps.audioNearDup(s, d)),
    // the same near-dup reports SERVED FROM the maintained per-modality
    // hash artifact (r13 — ingest-amortized: the corpus is decoded once
    // at ingest, queries read 16-byte (media_id, h) rows; rows-only,
    // MediaHashIndexSpec pins indexed ≡ recompute on the full corpus)
    "q_image_neardup_indexed" ->
      ((s, d) => graft.operators.MediaHashIndex.imageNearDupIndexed(s, d)),
    "q_audio_neardup_indexed" ->
      ((s, d) => graft.operators.MediaHashIndex.audioNearDupIndexed(s, d)),
  )

  private val stopList = "('the','a','an','of','and','to','in','is','it','on','for')"

  /** Shared CTE chain for the winnowing oracles (q_winnow /
    * q_winnow_overlap / q_winnow_clusters): word-3-gram hashes (first
    * 15 md5 hex chars as a 60-bit int — the conv ↔ 0x-cast pair),
    * 4-hash windows with each window's min (`wins`), and the distinct
    * per-document selected fingerprint set (`sel`). One source of truth
    * so a hash/window tweak cannot drift the three oracles apart.
    */
  private def winnowChain(pfx: String, src: String): String =
    s"""${pfx}toks AS (SELECT doc_id, string_split(text, ' ') AS tk
      |              FROM $src WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 6),
      |${pfx}h AS (SELECT doc_id, i, CAST(concat('0x', substr(md5(
      |        concat_ws(' ', tk[i], tk[i+1], tk[i+2])), 1, 15)) AS BIGINT) AS hv
      |      FROM (SELECT doc_id, tk, unnest(range(1, len(tk)-1)) AS i FROM ${pfx}toks)),
      |${pfx}wins AS (SELECT doc_id, i AS j,
      |    MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
      |    COUNT(*) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
      |  FROM ${pfx}h),
      |${pfx}sel AS (SELECT DISTINCT w.doc_id, w.wmin AS fp FROM ${pfx}wins w WHERE w.wn = 4)""".stripMargin

  private val winnowCtes = winnowChain("", "documents")

  /** Shared CTE chain for the embedding connected-components oracles
    * (q_embed_clusters report + q_embed_prune scrub): label-blocked
    * cosine pairs, symmetric edge closure, and the component-minimum
    * canonical per vector, materialized as `canon`.
    */
  private val embedClusterCtes =
    """WITH RECURSIVE flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |                generate_subscripts(embedding, 1) AS i FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY 1),
      |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |         FROM embeddings a JOIN embeddings b
      |         ON a.label = b.label AND a.vec_id < b.vec_id),
      |dotp AS (SELECT p.vec_a, p.vec_b, SUM(fa.x*fb.x) AS dp
      |         FROM cand p JOIN flat fa ON fa.vec_id = p.vec_a
      |         JOIN flat fb ON fb.vec_id = p.vec_b AND fb.i = fa.i
      |         GROUP BY 1, 2),
      |jp AS (SELECT vec_a, vec_b FROM dotp
      |       JOIN nrm na ON na.vec_id = vec_a JOIN nrm nb ON nb.vec_id = vec_b
      |       WHERE ROUND(dp/(na.nrm*nb.nrm), 4) >= 0.35),
      |edges AS (SELECT vec_a AS a, vec_b AS b FROM jp UNION SELECT vec_b, vec_a FROM jp),
      |reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |canon AS (SELECT v.vec_id, LEAST(v.vec_id, COALESCE(MIN(r.b), v.vec_id)) AS canonical
      |          FROM embeddings v LEFT JOIN reach r ON r.a = v.vec_id
      |          GROUP BY v.vec_id)""".stripMargin

  /** Shared by q_bm25_topk and q_bm25_indexed — the index-served path
    * must reproduce the raw-scan recompute bit-for-bit. Mirrors
    * bm25FromHits' fixed double chain verbatim: rational idf
    * (2N-2df+1)/(2df+1) from exact integers, norm = dl/(T/N),
    * den = tf + 1.2*(0.25 + 0.75*norm), s = idf * (tf*2.2)/den,
    * positional slots summed in literal order s1+s2+s3.
    */
  /** Shared by q_hybrid_search and q_sql_hybrid_search — RRF fusion of
    * the bm25 CTE chain (depth 50) with exact-cosine ranks for query
    * vectors 1-3; 1/(60+rank) terms are exact double divisions summed
    * in the Spark side's literal order (lex + vec). ONE definition so
    * the two front doors' twin claim holds by construction.
    */
  private val hybridOracleSql: String =
    """WITH q(qid, pos, term) AS (VALUES
      |    (1, 1, 'spark'), (1, 2, 'query'), (1, 3, 'join'),
      |    (2, 1, 'hash'), (2, 2, 'table'), (2, 3, 'scan'),
      |    (3, 1, 'dup'), (3, 2, 'merge'), (3, 3, 'stream')),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents WHERE text IS NOT NULL),
      |dt AS MATERIALIZED (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |hits AS (SELECT q.qid, q.pos, dt.term, dt.doc_id, dt.tf FROM dt JOIN q USING (term)),
      |dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM hits GROUP BY 1),
      |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
      |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
      |sc AS (SELECT h.qid, h.pos, h.doc_id,
      |    (CAST(2 * s.n - 2 * f.df + 1 AS DOUBLE) / CAST(2 * f.df + 1 AS DOUBLE)) *
      |      ((CAST(h.tf AS DOUBLE) * 2.2) /
      |        (CAST(h.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |          (CAST(l.dl AS DOUBLE) / (CAST(s.t AS DOUBLE) / CAST(s.n AS DOUBLE)))))) AS s
      |  FROM hits h JOIN dfreq f USING (term) JOIN dl l USING (doc_id) CROSS JOIN stats s),
      |per AS (SELECT qid, doc_id,
      |    COALESCE(MAX(CASE WHEN pos = 1 THEN s END), 0.0) +
      |      COALESCE(MAX(CASE WHEN pos = 2 THEN s END), 0.0) +
      |      COALESCE(MAX(CASE WHEN pos = 3 THEN s END), 0.0) AS score
      |  FROM sc GROUP BY 1, 2),
      |lex AS (SELECT qid, doc_id, rb FROM (
      |    SELECT qid, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rb
      |    FROM per) WHERE rb <= 50),
      |flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |                generate_subscripts(embedding, 1) AS i FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY 1),
      |dotp AS (SELECT qv.vec_id AS qid, f.vec_id AS doc_id, SUM(qv.x*f.x) AS dp
      |         FROM flat qv JOIN flat f ON qv.i = f.i
      |         WHERE qv.vec_id IN (1, 2, 3) AND qv.vec_id <> f.vec_id GROUP BY 1, 2),
      |vec AS (SELECT qid, doc_id, rc FROM (
      |    SELECT qid, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY qid
      |        ORDER BY ROUND(dp/(nq.nrm*nn.nrm), 4) DESC, doc_id) AS rc
      |    FROM dotp JOIN nrm nq ON nq.vec_id = qid JOIN nrm nn ON nn.vec_id = doc_id)
      |  WHERE rc <= 50),
      |fused AS (SELECT COALESCE(l.qid, v.qid) AS qid,
      |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
      |    COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + l.rb AS DOUBLE), 0.0) +
      |      COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + v.rc AS DOUBLE), 0.0) AS rrf
      |  FROM lex l FULL OUTER JOIN vec v ON l.qid = v.qid AND l.doc_id = v.doc_id),
      |rk AS (SELECT CAST(qid AS BIGINT) AS qid, doc_id, rrf,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
      |  FROM fused)
      |SELECT qid, rank, doc_id, rrf FROM rk WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  /** Shared by q_phrase_search and q_sql_phrase_search — naive
    * token-window phrase scan per workload phrase; both index-served
    * faces must reproduce these occurrence counts exactly.
    */
  private val phraseOracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
      |              FROM documents WHERE text IS NOT NULL),
      |hits AS (
      |  SELECT CAST(1 AS BIGINT) AS qid, doc_id,
      |    CAST(len(list_filter(range(1, greatest(len(tk)-1, 0)+1),
      |      i -> tk[i] = 'value' AND tk[i+1] = 'table')) AS BIGINT) AS n_occur
      |  FROM toks
      |  UNION ALL
      |  SELECT 2, doc_id,
      |    CAST(len(list_filter(range(1, greatest(len(tk)-1, 0)+1),
      |      i -> tk[i] = 'fast' AND tk[i+1] = 'merge')) AS BIGINT)
      |  FROM toks
      |  UNION ALL
      |  SELECT 3, doc_id,
      |    CAST(len(list_filter(range(1, greatest(len(tk)-2, 0)+1),
      |      i -> tk[i] = 'key' AND tk[i+1] = 'agg' AND tk[i+2] = 'row')) AS BIGINT)
      |  FROM toks)
      |SELECT qid, doc_id, n_occur FROM hits WHERE n_occur > 0
      |ORDER BY qid, doc_id""".stripMargin

  private val bm25OracleSql: String =
    """WITH q(qid, pos, term) AS (VALUES
      |    (1, 1, 'spark'), (1, 2, 'query'), (1, 3, 'join'),
      |    (2, 1, 'hash'), (2, 2, 'table'), (2, 3, 'scan'),
      |    (3, 1, 'dup'), (3, 2, 'merge'), (3, 3, 'stream')),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents WHERE text IS NOT NULL),
      |dt AS MATERIALIZED (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |hits AS (SELECT q.qid, q.pos, dt.term, dt.doc_id, dt.tf FROM dt JOIN q USING (term)),
      |dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM hits GROUP BY 1),
      |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
      |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
      |sc AS (SELECT h.qid, h.pos, h.doc_id,
      |    (CAST(2 * s.n - 2 * f.df + 1 AS DOUBLE) / CAST(2 * f.df + 1 AS DOUBLE)) *
      |      ((CAST(h.tf AS DOUBLE) * 2.2) /
      |        (CAST(h.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |          (CAST(l.dl AS DOUBLE) / (CAST(s.t AS DOUBLE) / CAST(s.n AS DOUBLE)))))) AS s
      |  FROM hits h JOIN dfreq f USING (term) JOIN dl l USING (doc_id) CROSS JOIN stats s),
      |per AS (SELECT qid, doc_id,
      |    COALESCE(MAX(CASE WHEN pos = 1 THEN s END), 0.0) +
      |      COALESCE(MAX(CASE WHEN pos = 2 THEN s END), 0.0) +
      |      COALESCE(MAX(CASE WHEN pos = 3 THEN s END), 0.0) AS score
      |  FROM sc GROUP BY 1, 2),
      |rk AS (SELECT CAST(qid AS BIGINT) AS qid,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
      |    doc_id, score FROM per)
      |SELECT qid, rank, doc_id, score FROM rk WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  /** The winnow ingest-gate triage report: probe slice (doc_id ≡ 0
    * mod 3) vs the corpus slice's distinct fingerprint set; TOTAL over
    * the probe slice — an unwinnowable document reports (0, 0). Shared
    * by q_winnow_match (per-query recompute) and
    * q_winnow_match_indexed (served from the maintained WinnowIndex
    * artifact) — both must equal this raw-recompute.
    */
  private val winnowMatchOracleSql: String =
    s"""WITH $winnowCtes,
      |cfps AS (SELECT DISTINCT fp FROM sel WHERE doc_id % 3 <> 0),
      |pd AS (SELECT s.doc_id, COUNT(*) AS n_fp, COUNT(c.fp) AS n_matched
      |  FROM sel s LEFT JOIN cfps c USING (fp)
      |  WHERE s.doc_id % 3 = 0 GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(COALESCE(pd.n_fp, 0) AS BIGINT) AS n_fp,
      |  CAST(COALESCE(pd.n_matched, 0) AS BIGINT) AS n_matched
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |WHERE d.doc_id % 3 = 0 ORDER BY d.doc_id""".stripMargin

  /** The paste-sized snippet membership triage (q_winnow_snippet): the
    * probe is the first 12 tokens of the 5 lowest probe-slice documents
    * — a handful of fingerprints whose ranges prune the artifact read
    * to a fraction of the shards on the Spark side
    * ([[graft.operators.TextOps.winnowSnippet]] through
    * `WinnowIndex.membershipFps`); this oracle recomputes the same
    * report from RAW documents, so the green row proves the PRUNED
    * serving path (manifest boundaries, partition filters and all)
    * against first principles, exactly as q_winnow_match_indexed does
    * for the full-read path.
    */
  private val winnowSnippetOracleSql: String =
    s"""WITH snip AS (SELECT doc_id,
      |    array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ') AS text
      |  FROM documents WHERE doc_id % 3 = 0 AND doc_id <= 12),
      |${winnowChain("p", "snip")},
      |$winnowCtes,
      |cfps AS (SELECT DISTINCT fp FROM sel WHERE doc_id % 3 <> 0),
      |pd AS (SELECT s.doc_id, COUNT(*) AS n_fp, COUNT(c.fp) AS n_matched
      |  FROM psel s LEFT JOIN cfps c USING (fp) GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(COALESCE(pd.n_fp, 0) AS BIGINT) AS n_fp,
      |  CAST(COALESCE(pd.n_matched, 0) AS BIGINT) AS n_matched
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |WHERE d.doc_id % 3 = 0 AND d.doc_id <= 12 ORDER BY d.doc_id""".stripMargin

  /** The cross-engine 60-bit hash ([[graft.operators.TextOps.h60]]) in
    * DuckDB form — first 15 md5 hex chars as a BIGINT. Shared by the r10
    * minhash/simhash/KMV oracle tiers (the winnow/sampler pair).
    */
  private def h60Sql(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"

  /** 16-function md5-tier minhash signature of a string-list expression:
    * position i = min over elements of h60("i|" || elem) — replays
    * [[graft.operators.TextOps.MinHashMd5]] exactly (multiplicity- and
    * distinct-invariant, so the Spark side's array_distinct needs no
    * mirror here).
    */
  private def minhashSigSql(elems: String): String =
    (0 until 16).map(i =>
      s"list_min(list_transform($elems, t -> ${h60Sql(s"'$i|' || t")}))")
      .mkString("[\n        ", ",\n        ", "]")

  /** The 4 band buckets as (band, bucket) structs: bucket = h60 of the
    * comma-joined signature slice (decimal rendering of BIGINTs matches
    * Spark's cast-to-string exactly).
    */
  private val minhashBandsSql: String =
    (0 until 4).map { b =>
      val slice = (b * 4 + 1 to b * 4 + 4).map(i => s"sig[$i]").mkString(", ")
      s"{'b': $b, 'v': ${h60Sql(s"concat_ws(',', $slice)")}}"
    }.mkString("[\n        ", ",\n        ", "]")

  private val minhashAgreeSql: String =
    (1 to 16).map(i => s"(CASE WHEN a.sig[$i] = b.sig[$i] THEN 1 ELSE 0 END)")
      .mkString("\n          + ")

  /** Full md5-tier minhash-LSH replay: signatures → band buckets →
    * distinct colliding pairs → exact signature agreement ≥ 0.9. The
    * Spark side's signature-group collapse is a pure evaluation
    * strategy — identical signatures share all four buckets and agree
    * 16/16, so the collapsed intra pairs (est 1.0) and this direct
    * formulation produce the same rows.
    */
  private def minhashLshOracleSql(elemsSql: String): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
      |              FROM documents WHERE text IS NOT NULL),
      |elems AS (SELECT doc_id, $elemsSql AS es FROM toks),
      |sigs AS MATERIALIZED (SELECT doc_id, ${minhashSigSql("es")} AS sig FROM elems),
      |bands AS (SELECT doc_id, u.b AS band, u.v AS bucket
      |          FROM (SELECT doc_id, unnest($minhashBandsSql) AS u FROM sigs)),
      |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |         FROM bands x JOIN bands y
      |         ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
      |est AS (SELECT c.doc_a, c.doc_b,
      |          ($minhashAgreeSql) / 16.0 AS est_jaccard
      |        FROM cand c JOIN sigs a ON a.doc_id = c.doc_a
      |        JOIN sigs b ON b.doc_id = c.doc_b)
      |SELECT doc_a, doc_b, est_jaccard FROM est
      |WHERE est_jaccard >= 0.9 ORDER BY doc_a, doc_b""".stripMargin

  /** The shared scoring/ranking tail of the exactsig oracles — the SQL
    * face of `VectorOps.exactSigRank`: exact-cosine over raw embeddings
    * rounded to 4 dp, top-10 per query by (cosine DESC, nid). Appended
    * after a CTE chain that ends in `cand(qid, nid)` — however the twin
    * produced its candidate set, the ranking contract is this one text.
    */
  private val exactSigRankSql: String =
      """flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |           generate_subscripts(embedding, 1) AS i FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY 1),
        |dotp AS (SELECT c.qid, c.nid, SUM(fa.x*fb.x) AS dp
        |         FROM cand c JOIN flat fa ON fa.vec_id = c.qid
        |         JOIN flat fb ON fb.vec_id = c.nid AND fb.i = fa.i
        |         GROUP BY 1, 2),
        |sc AS (SELECT qid, nid, ROUND(dp/(nq.nrm*nn.nrm), 4) AS cosine
        |       FROM dotp JOIN nrm nq ON nq.vec_id = qid JOIN nrm nn ON nn.vec_id = nid),
        |rk AS (SELECT qid, nid, cosine,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS BIGINT) AS rn
        |       FROM sc)
        |SELECT qid, nid, cosine, rn FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  /** The exactsig oracle — md5-derived integer ±1 hyperplanes over
    * 1e-7-quantized int64 embeddings (projection signs exact by integer
    * commutativity — the q_kmeans toolkit), bucket-collision candidates,
    * rounded exact-cosine ranking. Shared by q_ann_lsh_exactsig (raw
    * recompute) and q_ann_sig_indexed (served from the
    * maintained VectorIndex artifact) — the index-served path must
    * reproduce this raw-recompute ranking bit-for-bit.
    */
  private val annLshExactSigOracleSql: String =
      """WITH planes AS MATERIALIZED (
        |  SELECT tt.t, jj.j, ii.i,
        |    (CAST('0x' || substr(md5(tt.t || ',' || jj.j || ',' || ii.i), 1, 15) AS BIGINT) % 3) - 1 AS w
        |  FROM range(4) AS tt(t), range(8) AS jj(j), range(64) AS ii(i)),
        |q AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * 10000000.0) AS BIGINT) AS qx
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |proj AS (SELECT q.vec_id, p.t, p.j, SUM(q.qx * p.w) AS s
        |         FROM q JOIN planes p ON p.i = q.i - 1 GROUP BY 1, 2, 3),
        |codes AS MATERIALIZED (
        |  SELECT vec_id, t, SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS code
        |  FROM proj GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT qc.vec_id AS qid, nc.vec_id AS nid
        |         FROM codes qc JOIN codes nc ON qc.t = nc.t AND qc.code = nc.code
        |         WHERE qc.vec_id < 5 AND nc.vec_id <> qc.vec_id)""".stripMargin +
      ",\n" + exactSigRankSql

  /** DuckDB integer squared-L2 between a quantized row `qa.xq` and a
    * centroid `ca.cent` — the `LongL2Sq` kernel's SQL face, exact by
    * integer commutativity.
    */
  private def kmeansDistSql(qa: String, ca: String): String =
    s"CAST(list_sum(list_transform(list_zip($qa.xq, $ca.cent), " +
      "z -> (z[1] - z[2])*(z[1] - z[2]))) AS BIGINT)"

  /** The exact int64 k-means fit (`VectorOps.kmeansFitOver`) unrolled
    * as a chained-CTE prefix — quantized corpus `q`, md5-ordered init
    * `c0`, `iters` Lloyd rounds ending at the final centroids
    * `c$iters` — shared by q_kmeans (the assignment face) and
    * q_ann_ivf_exactsig (the coarse-quantizer face), so both oracles
    * replay ONE fit. Exactness argument at the q_kmeans entry.
    */
  private def kmeansOracleCtes(k: Int, iters: Int): String = {
    val initOrd =
      "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT), vec_id"
    val base =
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id, [CAST(trunc(CAST(x AS DOUBLE)*10000000.0) AS BIGINT) FOR x IN embedding] AS xq
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |c0 AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY $initOrd) - 1 AS cid, xq AS cent
         |  FROM q ORDER BY $initOrd LIMIT $k)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""a$r AS MATERIALIZED (
         |  SELECT q.vec_id, q.xq, c.cid, ${kmeansDistSql("q", "c")} AS dist
         |  FROM q, c${r - 1} c
         |  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY dist, c.cid) = 1),
         |s$r AS MATERIALIZED (
         |  SELECT cid, i, SUM(x) AS s, COUNT(*) AS n FROM (
         |    SELECT cid, unnest(generate_series(1, len(xq))) AS i, unnest(xq) AS x FROM a$r)
         |  GROUP BY 1, 2),
         |c$r AS MATERIALIZED (
         |  SELECT p.cid, CASE WHEN u.cid IS NULL THEN p.cent ELSE u.cent END AS cent
         |  FROM c${r - 1} p LEFT JOIN (
         |    SELECT cid, list(CAST(floor((2*s + n) / (2.0*n)) AS BIGINT) ORDER BY i) AS cent
         |    FROM s$r GROUP BY cid) u USING (cid))""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** The batched multi-subspace exact-int64 PQ fit
    * (`VectorOps.pqFitQ`) unrolled as a chained-CTE prefix — quantized
    * corpus `q`, per-subspace views `sub`/`p0` (seeds = the `codes`
    * md5-smallest vectors, sliced), `iters` Lloyd rounds ending at
    * codebooks `p$iters`. The kmeansOracleCtes shape with (s, cid)
    * replacing cid everywhere; exactness argument at q_ann_pq_exactsig.
    */
  private def pqOracleCtes(subs: Int, subDim: Int, codes: Int,
      iters: Int): String = {
    val initOrd =
      "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT), vec_id"
    def dist(xa: String, ca: String) =
      s"CAST(list_sum(list_transform(list_zip($xa.sx, $ca.cent), " +
        "z -> (z[1] - z[2])*(z[1] - z[2]))) AS BIGINT)"
    val base =
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id, [CAST(trunc(CAST(x AS DOUBLE)*10000000.0) AS BIGINT) FOR x IN embedding] AS xq
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |seed AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY $initOrd) - 1 AS cid, xq
         |  FROM q ORDER BY $initOrd LIMIT $codes),
         |sub AS MATERIALIZED (
         |  SELECT q.vec_id, ss.s, list_slice(q.xq, ss.s*$subDim+1, ss.s*$subDim+$subDim) AS sx
         |  FROM q, range($subs) ss(s)),
         |p0 AS MATERIALIZED (
         |  SELECT ss.s, seed.cid, list_slice(seed.xq, ss.s*$subDim+1, ss.s*$subDim+$subDim) AS cent
         |  FROM seed, range($subs) ss(s))""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""a$r AS MATERIALIZED (
         |  SELECT sub.vec_id, sub.s, sub.sx, c.cid, ${dist("sub", "c")} AS dist
         |  FROM sub JOIN p${r - 1} c ON c.s = sub.s
         |  QUALIFY row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY dist, c.cid) = 1),
         |s$r AS MATERIALIZED (
         |  SELECT s, cid, i, SUM(x) AS sm, COUNT(*) AS n FROM (
         |    SELECT s, cid, unnest(generate_series(1, len(sx))) AS i, unnest(sx) AS x FROM a$r)
         |  GROUP BY 1, 2, 3),
         |p$r AS MATERIALIZED (
         |  SELECT p.s, p.cid, CASE WHEN u.cid IS NULL THEN p.cent ELSE u.cent END AS cent
         |  FROM p${r - 1} p LEFT JOIN (
         |    SELECT s, cid, list(CAST(floor((2*sm + n) / (2.0*n)) AS BIGINT) ORDER BY i) AS cent
         |    FROM s$r GROUP BY s, cid) u ON u.s = p.s AND u.cid = p.cid)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  def oracleSql: Map[String, String] = Map(
    "q_scan_filter" ->
      """SELECT event_id, ts, user_id, value FROM events
        |WHERE event_type = 'error'
        |  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q_bucket_avg" ->
      """SELECT date_trunc('minute', ts) AS bucket, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_value,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_bucket_sum" ->
      """SELECT date_trunc('minute', ts) AS bucket, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the SQL-authored twins answer to the SAME oracles as their DSL
    // faces — the engine front door changes, the contract does not
    "q_sql_bucket_avg" ->
      """SELECT date_trunc('minute', ts) AS bucket, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_value,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sql_bucket_sum" ->
      """SELECT date_trunc('minute', ts) AS bucket, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sql_downsample" ->
      """SELECT * FROM (
        |  SELECT date_trunc('minute', ts) AS bucket, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS value,
        |    'gauge' AS kind
        |  FROM events WHERE event_type IN ('view','click') GROUP BY 1, 2
        |  UNION ALL
        |  SELECT date_trunc('minute', ts) AS bucket, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value,
        |    'counter' AS kind
        |  FROM events WHERE event_type NOT IN ('view','click') GROUP BY 1, 2
        |) ORDER BY bucket, event_type""".stripMargin,
    "q_tag_filter" -> tagFilterOracle,
    "q_downsample_lts" ->
      """SELECT * FROM (
        |  SELECT date_trunc('minute', ts) AS bucket, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS value,
        |    'gauge' AS kind
        |  FROM events WHERE event_type IN ('view','click') GROUP BY 1, 2
        |  UNION ALL
        |  SELECT date_trunc('minute', ts) AS bucket, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value,
        |    'counter' AS kind
        |  FROM events WHERE event_type NOT IN ('view','click') GROUP BY 1, 2
        |) ORDER BY bucket, event_type""".stripMargin,
    // the r12 SQL-authored twins (window / session / top-k classes)
    // answer to the SAME oracles as their DSL faces — shared defs
    // (the tagFilterOracle pattern), never two copies to keep in sync
    "q_topk" -> topKOracle,
    "q_sql_topk" -> topKOracle,
    "q_sql_rate" -> rateOracle,
    "q_sql_session" -> sessionOracle,
    "q_sql_tag_filter" -> tagFilterOracle,
    "q_rate" -> rateOracle,
    "q_session" -> sessionOracle,
    "q_join_enrich" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_distinct_daily" ->
      """SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_log_level_hist" ->
      """SELECT CASE WHEN value < 50 THEN 'low'
        |            WHEN value < 150 THEN 'mid' ELSE 'high' END AS level,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_set_except" ->
      """SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'error'
        |ORDER BY user_id, day""".stripMargin,
    "q_anti_join" ->
      """SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events e
        |WHERE event_type = 'click'
        |  AND NOT EXISTS (SELECT 1 FROM events p
        |                  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
        |                    AND CAST(p.ts AS DATE) = CAST(e.ts AS DATE))
        |ORDER BY user_id, day""".stripMargin,
    "q_asof_purchase" ->
      """SELECT e.event_id, e.user_id, e.ts, p.pv
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS pv FROM events
        |                WHERE event_type = 'purchase' GROUP BY 1, 2) p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q_range_nearby" ->
      """SELECT e.event_id, COUNT(p.pts) AS n_nearby
        |FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT ts AS pts FROM events WHERE event_type = 'purchase') p
        |  ON ABS(epoch_us(e.ts) - epoch_us(p.pts)) <= 300000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 4) AS p95,
        |  ROUND(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the engine's deterministic quantile summary replays exactly (r14):
    // exact per-type histogram, integer band-compression at b=2048, rank
    // ceil(p·n) — the same pure-integer walk QHistMergeAgg runs, so the
    // sketch face is hash-checked, not rows-only (and the ROUTED serving
    // path is hash-identical by the histogram monoid). ONE oracle def
    // shared with the SQL-authored twin (the r13-ADVICE rule).
    "q_percentiles_approx" -> qhistPercentilesOracle,
    "q_sql_percentiles_approx" -> qhistPercentilesOracle,
    "q_rollup" ->
      """SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |FROM events GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,
    "q_pivot_daily" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  COUNT(CASE WHEN event_type='click' THEN 1 END) AS "click",
        |  COUNT(CASE WHEN event_type='error' THEN 1 END) AS "error",
        |  COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS "purchase",
        |  COUNT(CASE WHEN event_type='signup' THEN 1 END) AS "signup",
        |  COUNT(CASE WHEN event_type='view' THEN 1 END) AS "view"
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  SUM(l_quantity)/COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_brand_volume" ->
      """SELECT p_brand, SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_first_shipments" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, rn FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |                       ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 2 ORDER BY l_suppkey, rn""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)/COUNT(*) AS avg_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Spark side is REQUIRED (builder-asserted) to serve this from the
    // CorpusRoute rollup; the oracle recomputes from raw — a green row is
    // the external proof that MV routing is bit-identical
    // ONE oracle def shared by the DSL face and its r14 SQL-text twin
    // (the tagFilterOracle rule)
    "q_route_stats" -> corpusStatsOracle,
    "q_sql_route_stats" -> corpusStatsOracle,
    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN tok IN $stopList THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS stop_ratio,
        |  CAST(SUM(length(tok)) AS DOUBLE)/COUNT(*) AS avg_tok_len,
        |  COUNT(*) AS n_tokens
        |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_budget_select" ->
      // greedy token-budget pruning: quality order (stop ratio desc,
      // doc_id), exact integer prefix sum, straddling doc kept
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents WHERE text IS NOT NULL),
        |q AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN tok IN $stopList THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS ratio,
        |    COUNT(*) AS n_tokens
        |  FROM tok GROUP BY doc_id),
        |c AS (SELECT doc_id, n_tokens, COALESCE(SUM(n_tokens) OVER (
        |    ORDER BY ratio DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_tokens
        |  FROM q)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens, cum_tokens < 20000 AS kept
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_corpus_diff" ->
      // snapshot diff on fingerprint manifests; || null-propagates like
      // Spark's concat, IS NOT DISTINCT FROM like <=>
      """WITH v1 AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 7 <> 0),
        |v2 AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN v1.fp IS NOT DISTINCT FROM v2.fp THEN 'same'
        |       ELSE 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" ->
      """WITH r AS (SELECT doc_id, concat(coalesce(text, ''),
        |  CASE WHEN doc_id % 2 = 0 THEN concat(' contact u', CAST(doc_id AS VARCHAR), '@example.com') ELSE '' END,
        |  CASE WHEN doc_id % 3 = 0 THEN concat(' from 10.0.', CAST(doc_id % 250 AS VARCHAR), '.7') ELSE '' END,
        |  CASE WHEN doc_id % 5 = 0 THEN concat(' call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END) AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |  len(regexp_extract_all(raw, '\b\d{3}-\d{4}\b')) AS n_phone,
        |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS scrub_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_corpus_stats" ->
      s"""WITH d AS (SELECT lang, text IS NOT NULL AS has_text,
        |  CASE WHEN text IS NOT NULL THEN CAST(len(string_split(text, ' ')) AS BIGINT) ELSE 0 END AS n_tokens,
        |  CASE WHEN text IS NOT NULL THEN CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) ELSE 0 END AS tok_len_sum,
        |  CASE WHEN text IS NOT NULL THEN md5(text) END AS fp
        |  FROM documents)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN has_text THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(CASE WHEN has_text THEN 1 ELSE 0 END) - COUNT(DISTINCT fp) AS BIGINT) AS n_dupes,
        |  CAST(SUM(CASE WHEN has_text AND n_tokens >= ${TextOps.QualityMinTokens}
        |    AND tok_len_sum >= ${TextOps.QualityMinAvgTokLen} * n_tokens
        |    AND tok_len_sum <= ${TextOps.QualityMaxAvgTokLen} * n_tokens
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE) /
        |    NULLIF(CAST(CAST(SUM(CASE WHEN has_text THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE), 0) AS avg_tokens
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q_vocab_growth" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |dt AS (SELECT doc_id, term, COUNT(*) AS tf FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs) GROUP BY 1, 2),
        |fs AS (SELECT term, MIN(doc_id) AS fd FROM dt GROUP BY 1),
        |dtok AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM dt GROUP BY 1),
        |mx AS (SELECT MAX(doc_id) + 1 AS m FROM docs),
        |cps AS (SELECT i, (i * (SELECT m FROM mx) + 9) // 10 AS cp FROM range(1, 11) t(i)),
        |cum AS (SELECT i, cp, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |          CAST(SUM(n_tokens) AS BIGINT) AS cum_tokens
        |        FROM cps JOIN dtok ON doc_id < cp GROUP BY 1, 2),
        |voc AS (SELECT i, cp, CAST(COUNT(*) AS BIGINT) AS vocab_size
        |        FROM cps JOIN fs ON fd < cp GROUP BY 1, 2)
        |SELECT CAST(cum.i AS BIGINT) AS i, CAST(cum.cp AS BIGINT) AS cp,
        |  n_docs, cum_tokens, vocab_size
        |FROM cum JOIN voc USING (i, cp) ORDER BY i""".stripMargin,
    "q_lm_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents WHERE text IS NOT NULL),
        |dt AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM dt GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(CAST(SUM(CAST(tf AS HUGEINT) * CAST(c AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) AS sum_tf,
        |  (CAST(CAST(SUM(CAST(tf AS HUGEINT) * CAST(c AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) /
        |    CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE)) / CAST((SELECT t FROM tot) AS DOUBLE) AS avg_prob
        |FROM dt JOIN cnt USING (term) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_perplexity_bucket" ->
      // lm_score's exact avg_prob chain, ranked by the deterministic
      // total order (avg_prob DESC, doc_id); the tercile is explicit
      // integer arithmetic on the rank — the same formula the Spark side
      // computes from its distributed prefix-offset rank, NOT a native
      // ntile on either engine
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents WHERE text IS NOT NULL),
        |dt AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM dt GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
        |per AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    (CAST(CAST(SUM(CAST(tf AS HUGEINT) * CAST(c AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) /
        |      CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE)) / CAST((SELECT t FROM tot) AS DOUBLE) AS avg_prob
        |  FROM dt JOIN cnt USING (term) GROUP BY doc_id),
        |rk AS (SELECT doc_id, n_tokens, avg_prob,
        |    CAST(ROW_NUMBER() OVER (ORDER BY avg_prob DESC, doc_id) AS BIGINT) AS rank,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM per) AS n FROM per)
        |SELECT doc_id, n_tokens, avg_prob, rank,
        |  CAST(((rank - 1) * 3) // n + 1 AS BIGINT) AS bucket
        |FROM rk ORDER BY doc_id""".stripMargin,
    "q_oov_rate" ->
      // top-25 vocabulary by (total frequency DESC, term); exact integer
      // counts, one double division for the rate
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents WHERE text IS NOT NULL),
        |lt AS (SELECT lang, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |vocab AS (SELECT term FROM (SELECT term, SUM(tf) AS c FROM lt GROUP BY 1)
        |          ORDER BY c DESC, term LIMIT 25)
        |SELECT lang, CAST(SUM(tf) AS BIGINT) AS total_tokens,
        |  CAST(SUM(CASE WHEN term NOT IN (SELECT term FROM vocab) THEN tf ELSE 0 END) AS BIGINT) AS oov_tokens,
        |  CAST(SUM(CASE WHEN term NOT IN (SELECT term FROM vocab) THEN tf ELSE 0 END) AS DOUBLE) /
        |    CAST(SUM(tf) AS DOUBLE) AS oov_rate
        |FROM lt GROUP BY lang ORDER BY lang""".stripMargin,
    "q_top_ngrams" ->
      // word 5-grams via the same range/list_transform window builder as
      // the 3-gram jaccard oracle; sub-window documents carry no gram
      // (len(tk) >= 5 on both engines)
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 5),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-4+1),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))) AS gram FROM toks),
        |pd AS (SELECT gram, doc_id, COUNT(*) AS c FROM g GROUP BY 1, 2)
        |SELECT gram, CAST(SUM(c) AS BIGINT) AS occurrences,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM pd GROUP BY gram
        |ORDER BY occurrences DESC, n_docs DESC, gram LIMIT 20""".stripMargin,
    "q_winnow" ->
      // MOSS winnowing: each window's min selected with the RIGHTMOST
      // tie position (MAX pos among in-window minima); DISTINCT
      // collapses repeated selections (CTE chain shared via winnowCtes)
      s"""WITH $winnowCtes,
        |selp AS (SELECT w.doc_id, MAX(p.i) AS pos, w.wmin AS fp
        |  FROM wins w JOIN h p ON p.doc_id = w.doc_id
        |    AND p.i BETWEEN w.j AND w.j + 3 AND p.hv = w.wmin
        |  WHERE w.wn = 4
        |  GROUP BY w.doc_id, w.j, w.wmin)
        |SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp
        |FROM selp ORDER BY doc_id, pos""".stripMargin,
    "q_winnow_match" -> winnowMatchOracleSql,
    // the index-served twin recomputes the SAME report from raw
    // documents — a green row is a standing consistency proof for the
    // maintained WinnowIndex artifact (the q_bm25_indexed pattern)
    "q_winnow_match_indexed" -> winnowMatchOracleSql,
    // the SQL-text face serves from the same maintained fingerprint
    // set — same raw-recompute oracle (the q_bm25_indexed sharing rule)
    "q_sql_winnow_match" -> winnowMatchOracleSql,
    // the range-PRUNED serving path (snippet micro-probe through the
    // manifest's partition filters) against the same first-principles
    // recompute — the pruning regime's standing consistency proof
    "q_winnow_snippet" -> winnowSnippetOracleSql,
    "q_winnow_overlap" ->
      // the MOSS match step: pairs sharing >= 2 distinct selected
      // fingerprints, fingerprints in more than 16 docs suppressed
      s"""WITH $winnowCtes,
        |kept AS (SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 16)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |JOIN kept k ON k.fp = a.fp
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY doc_a, doc_b""".stripMargin,
    "q_winnow_clusters" ->
      // the winnow_overlap pair graph closed transitively (the
      // dedup_clusters recursive-CTE pattern over winnow matches)
      s"""WITH RECURSIVE $winnowCtes,
        |kept AS (SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 16),
        |jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  JOIN kept kk ON kk.fp = a.fp
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM jp UNION SELECT doc_b, doc_a FROM jp),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS canonical
        |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "q_rag_chunks" ->
      // stride-64/48 token windows; DuckDB's list slice clamps at the
      // document end exactly like Spark's slice; starts stop once a
      // window reaches the end (s <= max(1, n-64+48)) so no chunk is
      // fully contained in its predecessor
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents WHERE text IS NOT NULL),
        |st AS (SELECT doc_id, tk,
        |    unnest(range(1, greatest(len(tk)-16, 1)+1, 48)) AS s FROM toks),
        |ch AS (SELECT doc_id, s AS start_tok,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) AS chunk_id,
        |    tk[s:s+63] AS chunk FROM st)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(len(chunk) AS BIGINT) AS n_tok,
        |  array_to_string(chunk, ' ') AS chunk_text
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    "q_chunk_search" ->
      // the bm25 chain at CHUNK grain: the rag_chunks CTE produces the
      // corpus (packed key doc_id*1000+chunk_id), then the same scoring
      // chain as bm25OracleSql; provenance unpacks on output
      """WITH q(qid, pos, term) AS (VALUES
        |    (1, 1, 'spark'), (1, 2, 'query'), (1, 3, 'join'),
        |    (2, 1, 'hash'), (2, 2, 'table'), (2, 3, 'scan'),
        |    (3, 1, 'dup'), (3, 2, 'merge'), (3, 3, 'stream')),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |         FROM documents WHERE text IS NOT NULL),
        |st AS (SELECT doc_id, tk,
        |    unnest(range(1, greatest(len(tk)-16, 1)+1, 48)) AS s FROM toks),
        |chunks AS (SELECT doc_id * 1000 +
        |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) AS cid,
        |    tk[s:s+63] AS ctk FROM st),
        |tok AS (SELECT cid AS doc_id, unnest(ctk) AS term FROM chunks),
        |dt AS MATERIALIZED (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |hits AS (SELECT q.qid, q.pos, dt.term, dt.doc_id, dt.tf FROM dt JOIN q USING (term)),
        |dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM hits GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
        |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
        |sc AS (SELECT h.qid, h.pos, h.doc_id,
        |    (CAST(2 * s.n - 2 * f.df + 1 AS DOUBLE) / CAST(2 * f.df + 1 AS DOUBLE)) *
        |      ((CAST(h.tf AS DOUBLE) * 2.2) /
        |        (CAST(h.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |          (CAST(l.dl AS DOUBLE) / (CAST(s.t AS DOUBLE) / CAST(s.n AS DOUBLE)))))) AS s
        |  FROM hits h JOIN dfreq f USING (term) JOIN dl l USING (doc_id) CROSS JOIN stats s),
        |per AS (SELECT qid, doc_id,
        |    COALESCE(MAX(CASE WHEN pos = 1 THEN s END), 0.0) +
        |      COALESCE(MAX(CASE WHEN pos = 2 THEN s END), 0.0) +
        |      COALESCE(MAX(CASE WHEN pos = 3 THEN s END), 0.0) AS score
        |  FROM sc GROUP BY 1, 2),
        |rk AS (SELECT CAST(qid AS BIGINT) AS qid,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        |    doc_id, score FROM per)
        |SELECT qid, rank, doc_id // 1000 AS doc_id, doc_id % 1000 AS chunk_id, score
        |FROM rk WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "q_bm25_topk" -> bm25OracleSql,
    // the index-served path must match the raw-scan recompute bit-for-bit
    // — the oracle doubles as external proof the index is consistent
    "q_bm25_indexed" -> bm25OracleSql,
    // the SQL-text face serves from the same maintained index and must
    // reproduce the same raw-recompute answer — ONE oracle definition
    // for all three BM25 faces, by construction
    "q_sql_bm25_indexed" -> bm25OracleSql,
    "q_phrase_search" -> phraseOracleSql,
    // the SQL-text face reads the same positional index — one oracle
    // definition for both front doors, by construction
    "q_sql_phrase_search" -> phraseOracleSql,
    "q_index_terms" ->
      // raw-corpus recompute of the index's maintained terms table —
      // the standing consistency proof for the inverted-index artifact
      """WITH tok AS (SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents WHERE text IS NOT NULL))
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |FROM tok GROUP BY term ORDER BY df DESC, term LIMIT 50""".stripMargin,
    "q_dsir_select" ->
      // mirrors dsirSelect's exact-arithmetic contract: integer (HUGEINT)
      // tf*count sums cast to double ONCE, fixed multiply/divide chain in
      // the same operand order, md5-derived selection uniform
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term FROM documents WHERE text IS NOT NULL),
        |dt AS (SELECT doc_id, source, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
        |cnt AS (SELECT term,
        |    CAST(SUM(CASE WHEN source = 'src0' THEN tf ELSE 0 END) AS BIGINT) AS c_t,
        |    CAST(SUM(CASE WHEN source <> 'src0' THEN tf ELSE 0 END) AS BIGINT) AS c_r
        |  FROM dt GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS tt, CAST(SUM(c_r) AS BIGINT) AS tr FROM cnt),
        |per AS (SELECT doc_id,
        |    CAST(CAST(SUM(CAST(tf AS HUGEINT) * CAST(c_t AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) AS s_t,
        |    CAST(CAST(SUM(CAST(tf AS HUGEINT) * CAST(c_r AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) AS s_r,
        |    CAST(SUM(tf) AS BIGINT) AS n_tokens
        |  FROM dt JOIN cnt USING (term) WHERE source <> 'src0' GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  (s_t * CAST((SELECT tr FROM tot) AS DOUBLE)) / (s_r * CAST((SELECT tt FROM tot) AS DOUBLE)) AS weight,
        |  CAST(concat('0x', substr(md5(concat('dsir:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0
        |    < 0.5 * ((s_t * CAST((SELECT tr FROM tot) AS DOUBLE)) / (s_r * CAST((SELECT tt FROM tot) AS DOUBLE))) AS selected
        |FROM per ORDER BY doc_id""".stripMargin,
    "q_filter_funnel" ->
      // gate predicates verbatim from corpusGates, avg-length bounds as
      // integer cross-multiplication (the nbQuality label formulation)
      """WITH t AS (SELECT doc_id, text,
        |    CASE WHEN text IS NOT NULL THEN len(string_split(text, ' ')) END AS n_tok,
        |    CASE WHEN text IS NOT NULL THEN list_sum(list_transform(string_split(text, ' '), x -> length(x))) END AS len_sum,
        |    substr(md5(concat(CAST(doc_id AS VARCHAR), ':', COALESCE(text, ''))), 1, 1) AS hx
        |  FROM documents),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s0,
        |    CAST(SUM(CASE WHEN text IS NOT NULL AND n_tok >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(SUM(CASE WHEN text IS NOT NULL AND n_tok >= 10 AND len_sum >= 3 * n_tok THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        |    CAST(SUM(CASE WHEN text IS NOT NULL AND n_tok >= 10 AND len_sum >= 3 * n_tok AND len_sum <= 15 * n_tok THEN 1 ELSE 0 END) AS BIGINT) AS s3,
        |    CAST(SUM(CASE WHEN text IS NOT NULL AND n_tok >= 10 AND len_sum >= 3 * n_tok AND len_sum <= 15 * n_tok AND hx < '8' THEN 1 ELSE 0 END) AS BIGINT) AS s4
        |  FROM t)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'has_text' AS rule, n AS n_in, n - s0 AS n_fail, s0 AS n_out FROM f
        |  UNION ALL SELECT 2, 'min_tokens', s0, s0 - s1, s1 FROM f
        |  UNION ALL SELECT 3, 'avg_tok_len_min', s1, s1 - s2, s2 FROM f
        |  UNION ALL SELECT 4, 'avg_tok_len_max', s2, s2 - s3, s3 FROM f
        |  UNION ALL SELECT 5, 'hash_gate', s3, s3 - s4, s4 FROM f)
        |ORDER BY stage""".stripMargin,
    "q_nb_quality" ->
      // class-conditional unigram quality classifier trained on the
      // shared gate heuristic; fixed double chain (sum/n)/(T+V)*prior
      // mirrors TextOps.nbQuality verbatim
      """WITH tok AS MATERIALIZED (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |dt AS MATERIALIZED (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |lab AS MATERIALIZED (
        |  SELECT doc_id, CASE WHEN SUM(tf) >= 10
        |      AND CAST(SUM(tf * length(term)) AS DOUBLE)
        |        / CAST(SUM(tf) AS DOUBLE) >= 3.0
        |      AND CAST(SUM(tf * length(term)) AS DOUBLE)
        |        / CAST(SUM(tf) AS DOUBLE) <= 15.0
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS label
        |  FROM dt GROUP BY doc_id),
        |cnt AS MATERIALIZED (
        |  SELECT term,
        |    CAST(SUM(CASE WHEN label = 1 THEN tf ELSE 0 END) AS BIGINT) AS c_hi,
        |    CAST(SUM(CASE WHEN label = 0 THEN tf ELSE 0 END) AS BIGINT) AS c_lo
        |  FROM dt JOIN lab USING (doc_id) GROUP BY term),
        |tot AS (SELECT CAST(SUM(c_hi) AS BIGINT) AS t_hi,
        |          CAST(SUM(c_lo) AS BIGINT) AS t_lo,
        |          CAST(COUNT(*) AS BIGINT) AS v FROM cnt),
        |pri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |          CAST(SUM(label) AS BIGINT) AS n_hi FROM lab),
        |sc AS (SELECT doc_id,
        |    CAST(SUM(CAST(tf AS HUGEINT) * CAST(c_hi + 1 AS HUGEINT))
        |      AS DECIMAL(38,0)) AS s_hi,
        |    CAST(SUM(CAST(tf AS HUGEINT) * CAST(c_lo + 1 AS HUGEINT))
        |      AS DECIMAL(38,0)) AS s_lo,
        |    CAST(SUM(tf) AS BIGINT) AS n_toks
        |  FROM dt JOIN cnt USING (term) GROUP BY doc_id),
        |p AS (SELECT sc.doc_id,
        |    ((CAST(s_hi AS DOUBLE) / CAST(n_toks AS DOUBLE))
        |      / CAST(t_hi + v AS DOUBLE))
        |      * (CAST(n_hi AS DOUBLE) / CAST(n AS DOUBLE)) AS p_hi,
        |    ((CAST(s_lo AS DOUBLE) / CAST(n_toks AS DOUBLE))
        |      / CAST(t_lo + v AS DOUBLE))
        |      * (CAST(n - n_hi AS DOUBLE) / CAST(n AS DOUBLE)) AS p_lo
        |  FROM sc, tot, pri)
        |SELECT lab.doc_id, lab.label, p.p_hi, p.p_lo,
        |  CASE WHEN p.p_hi > p.p_lo THEN CAST(1 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS pred
        |FROM lab JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents WHERE text IS NOT NULL),
        |dt AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY 1),
        |nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM dt),
        |s AS (SELECT doc_id, term, tf, df,
        |  CAST(tf * (SELECT n FROM nd) AS DOUBLE) / CAST(df AS DOUBLE) AS score
        |  FROM dt JOIN dfreq USING (term)),
        |r AS (SELECT *, CAST(row_number() OVER
        |  (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rk FROM s)
        |SELECT doc_id, rk, term, tf, df, score FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "q_lang_id" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |r AS (SELECT doc_id, lang,
        |  CAST(SUM(CASE WHEN tok IN $stopList THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS ratio
        |  FROM tok GROUP BY 1, 2)
        |SELECT lang, CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'other' END AS lang_guess,
        |  COUNT(*) AS n
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_token_jaccard" ->
      """WITH tok AS (SELECT DISTINCT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |         FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) AS jaccard
        |FROM pair JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.95
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_embed_clusters" ->
      s"""$embedClusterCtes
        |SELECT vec_id, canonical FROM canon ORDER BY vec_id""".stripMargin,
    "q_embed_prune" ->
      // scrub face of the cluster report: component-minimum survivors
      // with their cluster sizes, labels fetched off the survivor row
      s"""$embedClusterCtes,
        |sz AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_members
        |       FROM canon GROUP BY 1)
        |SELECT v.vec_id, v.label, sz.n_members
        |FROM embeddings v JOIN sz ON sz.canonical = v.vec_id
        |ORDER BY v.vec_id""".stripMargin,
    "q_kmeans" -> {
      // Exact replay of the quantized-integer Lloyd fit
      // (VectorOps.kmeansFitOver): every step is int64 — quantization is
      // the identical IEEE double multiply + truncate, distances are
      // integer Σ(x−c)², centroid means round by an exact floor-division
      // rule — so the fixed iteration count unrolls as chained CTEs (the
      // q_bpe_merges precedent) and the assignment matches HASH-EXACTLY.
      // Init ordering uses the cross-engine md5/60-bit family; QUALIFY
      // row_number mirrors the struct-ordered (dist, cid) argmin. The
      // oracle's floor((2S+n)/(2.0n)) is exact while |2S+n| < 2^53 —
      // ~1e4 above the sf0.01 data (the Spark side uses Math.floorDiv,
      // exact at any int64). Every CTE is MATERIALIZED so round r's
      // result evaluates once, not once per downstream reference.
      val iters = 5
      kmeansOracleCtes(8, iters) + ",\n" +
        s"""af AS (
           |  SELECT q.vec_id, c.cid, ${kmeansDistSql("q", "c")} AS dist
           |  FROM q, c$iters c
           |  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY dist, c.cid) = 1)
           |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, dist AS dist_q
           |FROM af ORDER BY vec_id""".stripMargin
    },
    "q_ann_ivf_exactsig" -> {
      // IVF with the q_kmeans fit as its coarse quantizer: the SAME
      // unrolled-CTE codebook, assignment (rank-1) and probing
      // (rank-nProbe) as the same (dist, cid)-ordered integer argmin,
      // candidates = the probed lists' members, ranking = the shared
      // exactsig tail — candidate generation replays end-to-end
      val iters = 5
      kmeansOracleCtes(8, iters) + ",\n" +
        s"""af AS MATERIALIZED (
           |  SELECT q.vec_id, c.cid, ${kmeansDistSql("q", "c")} AS dist
           |  FROM q, c$iters c
           |  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY dist, c.cid) = 1),
           |probe AS (
           |  SELECT q.vec_id AS qid, c.cid, ${kmeansDistSql("q", "c")} AS dist
           |  FROM q, c$iters c WHERE q.vec_id < 5
           |  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY dist, c.cid) <= 2),
           |cand AS (SELECT DISTINCT p.qid, a.vec_id AS nid
           |         FROM probe p JOIN af a USING (cid) WHERE a.vec_id <> p.qid)""".stripMargin +
        ",\n" + exactSigRankSql
    },
    "q_ann_pq_exactsig" -> {
      // PQ compressed scan with the exact-int64 multi-subspace fit
      // (VectorOps.pqFitQ) as codebook trainer: encoding is the same
      // (dist, cid)-ordered integer argmin against the final codebooks,
      // query LUTs are integer dots lut(qid, s, cid) = q_s·c, ADC is the
      // 8-row integer SUM per (qid, nid) — all exact, so the pool
      // (top-32 by (adc DESC, nid), matching the two-phase Spark rank)
      // and therefore the candidate set replay end-to-end; ranking is
      // the shared exactsig tail. Overflow: LUT entries ≤ 8·1e14, ADC
      // sums 8 of them — DuckDB's HUGEINT sum and Spark's exact long
      // sum agree three orders under the long budget.
      val iters = 3
      pqOracleCtes(8, 8, 16, iters) + ",\n" +
        s"""enc AS MATERIALIZED (
           |  SELECT sub.vec_id, sub.s, c.cid,
           |    CAST(list_sum(list_transform(list_zip(sub.sx, c.cent), z -> (z[1] - z[2])*(z[1] - z[2]))) AS BIGINT) AS dist
           |  FROM sub JOIN p$iters c ON c.s = sub.s
           |  QUALIFY row_number() OVER (PARTITION BY sub.vec_id, sub.s ORDER BY dist, c.cid) = 1),
           |lut AS MATERIALIZED (
           |  SELECT sq.vec_id AS qid, c.s, c.cid,
           |    CAST(list_sum(list_transform(list_zip(sq.sx, c.cent), z -> z[1]*z[2])) AS BIGINT) AS v
           |  FROM sub sq JOIN p$iters c ON c.s = sq.s WHERE sq.vec_id < 5),
           |adc AS MATERIALIZED (
           |  SELECT l.qid, e.vec_id AS nid, SUM(l.v) AS adc
           |  FROM enc e JOIN lut l ON l.s = e.s AND l.cid = e.cid
           |  WHERE e.vec_id <> l.qid
           |  GROUP BY 1, 2),
           |cand AS (SELECT qid, nid FROM adc
           |         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) <= 32)""".stripMargin +
        ",\n" + exactSigRankSql
    },
    "q_bpe_merges" -> {
      // Merge replay as delimiter-wrapped string replace: each token is
      // wrapped in  (absent from the data), so the sequence reads
      // <U>t1<UU>t2<UU>t3<U> and one merge round is a single replace of
      // <U>p1<UU>p2<U> with <U>p1 p2<U> — SQL replace scans left-to-right
      // non-overlapping over the source, which IS greedy BPE apply
      // semantics (runs: 'a a a a' merges twice, 'a a a' once). The k=10
      // rounds unroll as chained CTEs; top pair per round via scalar
      // subqueries, ties on (p1, p2) like the Spark side. Every CTE is
      // MATERIALIZED: DuckDB inlines plain CTEs per reference, and with
      // w_r referenced 4x by round r+1 the inlined tree (and its
      // parquet-scan fan-out) grows ~4^k — materialization makes each
      // round evaluate exactly once.
      val U = "\u001f" // ASCII unit separator, absent from the data
      val S = U + U // inter-token separator: trailing wrap + leading wrap
      val k = 10
      // empty tokens are dropped on BOTH engines (TextOps.bpeToks): the
      // wrap encoding is injective only over non-empty symbols, so an
      // empty symbol's merge pattern could match mid-separator. COALESCE
      // makes an exhausted round (empty w_r -> NULL scalar subqueries ->
      // NULL replace) a no-op instead of nulling every later round.
      val base =
        s"""WITH tk0 AS MATERIALIZED (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
           |  FROM documents WHERE text IS NOT NULL),
           |s1 AS MATERIALIZED (SELECT '$U' || array_to_string(toks, '$S') || '$U' AS seq
           |  FROM tk0 WHERE len(toks) >= 2)""".stripMargin
      val rounds = (1 to k).map { r =>
        val step =
          s"""t$r AS MATERIALIZED (SELECT string_split(trim(seq, '$U'), '$S') AS toks FROM s$r),
             |g$r AS MATERIALIZED (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t$r),
             |w$r AS MATERIALIZED (SELECT toks[i] AS p1, toks[i + 1] AS p2, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM g$r GROUP BY 1, 2 ORDER BY n DESC, p1, p2 LIMIT 1)""".stripMargin
        if (r == k) step
        else step + "," + "\n" +
          s"""s${r + 1} AS MATERIALIZED (SELECT COALESCE(replace(seq,
             |  '$U' || (SELECT p1 FROM w$r) || '$S' || (SELECT p2 FROM w$r) || '$U',
             |  '$U' || (SELECT p1 FROM w$r) || ' ' || (SELECT p2 FROM w$r) || '$U'), seq) AS seq
             |  FROM s$r)""".stripMargin
      }
      val out = (1 to k)
        .map(r => s"SELECT CAST($r AS BIGINT) AS round, p1, p2, n FROM w$r")
        .mkString("\nUNION ALL\n")
      (base +: rounds).mkString(",\n") + "\n" + out + "\nORDER BY round"
    },
    "q_bpe_tokens" -> {
      // the same training ladder as q_bpe_merges (singleton docs ride
      // along — they contribute zero pairs, so the learned rules are
      // identical), with doc_id/n_ws carried through every replay round
      // and the k-th rule APPLIED too; the final count splits the raw
      // delimiter string (no trim — end wraps never form a separator),
      // mirroring the Spark side's k nested bpe_merge_step calls.
      val U = "\u001f" // ASCII unit separator, absent from the data
      val S = U + U
      val k = 10
      val base =
        s"""WITH tk0 AS MATERIALIZED (SELECT doc_id,
           |  list_filter(string_split(text, ' '), t -> t <> '') AS toks
           |  FROM documents WHERE text IS NOT NULL),
           |s1 AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_ws,
           |  '$U' || array_to_string(toks, '$S') || '$U' AS seq
           |  FROM tk0 WHERE len(toks) >= 1)""".stripMargin
      val rounds = (1 to k).map { r =>
        s"""t$r AS MATERIALIZED (SELECT string_split(trim(seq, '$U'), '$S') AS toks FROM s$r),
           |g$r AS MATERIALIZED (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t$r),
           |w$r AS MATERIALIZED (SELECT toks[i] AS p1, toks[i + 1] AS p2, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM g$r GROUP BY 1, 2 ORDER BY n DESC, p1, p2 LIMIT 1),
           |s${r + 1} AS MATERIALIZED (SELECT doc_id, n_ws, COALESCE(replace(seq,
           |  '$U' || (SELECT p1 FROM w$r) || '$S' || (SELECT p2 FROM w$r) || '$U',
           |  '$U' || (SELECT p1 FROM w$r) || ' ' || (SELECT p2 FROM w$r) || '$U'), seq) AS seq
           |  FROM s$r)""".stripMargin
      }
      (base +: rounds).mkString(",\n") + "\n" +
        s"""SELECT doc_id, n_ws AS n_ws_tokens,
           |  CAST(len(string_split(seq, '$S')) AS BIGINT) AS n_bpe_tokens,
           |  CAST(n_ws AS DOUBLE) / CAST(len(string_split(seq, '$S')) AS DOUBLE) AS compression
           |FROM s${k + 1} ORDER BY doc_id""".stripMargin
    },
    "q_hybrid_dedup" -> {
      // vec_dot accumulates sum += (double)a[i] * (double)b[i] in index
      // order; an explicit left-associative 64-term sum makes DuckDB
      // evaluate the identical IEEE operation sequence, so the unrounded
      // cosine (and the >= gate on it) is bit-exact across engines —
      // no ROUND needed, unlike the SUM-reassociated embed oracles
      def dotSql(a: String, b: String): String = (1 to 64)
        .map(i => s"CAST($a.embedding[$i] AS DOUBLE)*CAST($b.embedding[$i] AS DOUBLE)")
        .mkString(" + ")
      s"""WITH tok AS (SELECT DISTINCT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |         FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b,
        |  CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) AS jaccard
        |  FROM pair JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.95),
        |sc AS (SELECT doc_a, doc_b, jaccard,
        |  (${dotSql("ea", "eb")}) /
        |    (sqrt(${dotSql("ea", "ea")}) * sqrt(${dotSql("eb", "eb")})) AS cosine
        |  FROM jp JOIN embeddings ea ON ea.vec_id = doc_a
        |          JOIN embeddings eb ON eb.vec_id = doc_b)
        |SELECT doc_a, doc_b, jaccard, cosine FROM sc
        |WHERE cosine >= 0.2 ORDER BY doc_a, doc_b""".stripMargin
    },
    "q_embed_incr_dedup" -> {
      // same exact-arithmetic contract as q_hybrid_dedup: explicit
      // left-associative 64-term dot sums replay vec_dot's IEEE sequence,
      // so the unrounded cosine and its >= gate match bit-for-bit
      def dotSql(a: String, b: String): String = (1 to 64)
        .map(i => s"CAST($a.embedding[$i] AS DOUBLE)*CAST($b.embedding[$i] AS DOUBLE)")
        .mkString(" + ")
      s"""WITH sc AS (SELECT n.vec_id AS vec_new, c.vec_id AS vec_corpus,
        |  (${dotSql("n", "c")}) /
        |    (sqrt(${dotSql("n", "n")}) * sqrt(${dotSql("c", "c")})) AS cosine
        |  FROM embeddings n JOIN embeddings c ON n.label = c.label
        |  WHERE n.vec_id % 10 = 9 AND c.vec_id % 10 <> 9)
        |SELECT vec_new, vec_corpus, cosine FROM sc
        |WHERE cosine >= 0.35 ORDER BY vec_new, vec_corpus""".stripMargin
    },
    "q_corpus_build" ->
      s"""WITH RECURSIVE tok AS (SELECT DISTINCT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |         FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b
        |       FROM pair JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |       WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.95),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM jp UNION SELECT doc_b, doc_a FROM jp),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |canon AS (SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS canonical
        |          FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id),
        |stats AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |            CAST(list_sum(list_transform(string_split(text, ' '),
        |              t -> length(t))) AS DOUBLE) / len(string_split(text, ' ')) AS avg_tok_len
        |          FROM documents WHERE text IS NOT NULL)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d
        |JOIN canon c ON c.doc_id = d.doc_id AND c.doc_id = c.canonical
        |JOIN stats s ON s.doc_id = d.doc_id
        |WHERE s.n_tokens >= ${TextOps.QualityMinTokens}
        |  AND s.avg_tok_len BETWEEN ${TextOps.QualityMinAvgTokLen}.0 AND ${TextOps.QualityMaxAvgTokLen}.0
        |  AND substring(md5(concat(d.doc_id, ':', COALESCE(d.text, ''))), 1, 1) < '8'
        |ORDER BY d.doc_id""".stripMargin,
    "q_containment" ->
      // naive ordered-pair containment over distinct word-3-gram shingle
      // sets (the ngram_jaccard window builder); the score is one double
      // division mirrored by the Spark side
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2, 1)+1),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh FROM toks)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |         FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |         GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(common AS DOUBLE) / sa.sz AS containment
        |FROM pair JOIN sz sa ON sa.doc_id = doc_a
        |WHERE CAST(common AS DOUBLE) / sa.sz >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-2, 1)+1),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh FROM toks)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |         FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) AS jaccard
        |FROM pair JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_clusters" ->
      """WITH RECURSIVE tok AS (SELECT DISTINCT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |         FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b
        |       FROM pair JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |       WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.95),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM jp UNION SELECT doc_b, doc_a FROM jp),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS canonical
        |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "q_quality_survivor" ->
      // the dedup_clusters recursive closure + per-cluster argmax by
      // (raw token count DESC, doc_id) — exact integers, engine-identical
      """WITH RECURSIVE tok AS (SELECT DISTINCT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |         FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b
        |       FROM pair JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |       WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.95),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM jp UNION SELECT doc_b, doc_a FROM jp),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS canonical
        |         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) GROUP BY 1),
        |best AS (SELECT c.canonical, c.doc_id AS survivor,
        |    ROW_NUMBER() OVER (PARTITION BY c.canonical
        |      ORDER BY COALESCE(nt.n, 0) DESC, c.doc_id) AS rk
        |  FROM comp c LEFT JOIN nt ON nt.doc_id = c.doc_id)
        |SELECT c.doc_id, b.survivor, c.doc_id = b.survivor AS kept
        |FROM comp c JOIN best b ON b.canonical = c.canonical AND b.rk = 1
        |ORDER BY c.doc_id""".stripMargin,
    "q_token_counts" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(concat(CAST(doc_id AS VARCHAR), ':', COALESCE(text, ''))), 1, 1) = '0'
        |ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """SELECT lang, rk, doc_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(concat(CAST(doc_id AS VARCHAR), ':', COALESCE(text, ''))), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    s[CAST(i AS INT)] || ' ' || s[CAST(i AS INT) + 1] || ' ' || s[CAST(i AS INT) + 2] AS g
        |  FROM toks, UNNEST(range(1, greatest(len(s) - 1, 1))) AS t(i)
        |),
        |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
        |SELECT doc_id, COUNT(*) AS shared_ngrams
        |FROM grams JOIN ev USING (g)
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id HAVING COUNT(*) >= 3
        |ORDER BY doc_id""".stripMargin,
    "q_sample_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang FROM documents d JOIN c USING (lang)
        |WHERE CAST(concat('0x', substr(md5(concat(CAST(d.doc_id AS VARCHAR), ':', COALESCE(d.text, ''))), 1, 8)) AS BIGINT)
        |        / 4294967296.0
        |      < least(1.0, 3.0 / sqrt(CAST(n_s AS DOUBLE)))
        |ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents WHERE text IS NOT NULL),
        |tw AS (SELECT doc_id, unnest(tk) AS w FROM toks),
        |wc AS (SELECT doc_id, MAX(n) AS top_token_n FROM
        |         (SELECT doc_id, w, COUNT(*) AS n FROM tw GROUP BY 1, 2)
        |       GROUP BY 1),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
        |         i -> tk[i] || ' ' || tk[i+1])) AS b FROM toks),
        |bc AS (SELECT doc_id, MAX(n) AS top_bigram_n FROM
        |         (SELECT doc_id, b, COUNT(*) AS n FROM bg GROUP BY 1, 2)
        |       GROUP BY 1)
        |SELECT t.doc_id, len(tk) AS n_tokens,
        |  len(list_distinct(tk)) AS n_distinct,
        |  wc.top_token_n, COALESCE(bc.top_bigram_n, 0) AS top_bigram_n
        |FROM toks t JOIN wc USING (doc_id) LEFT JOIN bc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_chunk_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents WHERE text IS NOT NULL),
        |ch AS (SELECT DISTINCT doc_id,
        |         array_to_string(list_slice(tk, (i-1)*16+1, least(i*16, len(tk))), ' ') AS chunk
        |       FROM toks, UNNEST(range(1, CAST(ceil(len(tk)/16.0) AS BIGINT) + 1)) AS t(i)),
        |fo AS (SELECT chunk, MIN(doc_id) AS first_doc FROM ch GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  COUNT(CASE WHEN first_doc < doc_id THEN 1 END) AS n_dup_chunks
        |FROM ch JOIN fo USING (chunk)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |              FROM documents WHERE text IS NOT NULL),
        |ch AS (SELECT DISTINCT doc_id,
        |         array_to_string(list_slice(tk, (i-1)*16+1, least(i*16, len(tk))), ' ') AS chunk
        |       FROM toks, UNNEST(range(1, CAST(ceil(len(tk)/16.0) AS BIGINT) + 1)) AS t(i))
        |SELECT chunk, COUNT(*) AS df FROM ch
        |GROUP BY 1 HAVING COUNT(*) >= 2
        |ORDER BY df DESC, chunk LIMIT 20""".stripMargin,
    "q_dup_spans" -> {
      // w = 8: flag every position covered by a w-token window occurring
      // >= 2 times corpus-wide; merge overlapping windows (gap <= w)
      // into maximal spans. Tokens = non-empty whitespace tokens (the
      // bpeToks convention; the space-joined window is injective only
      // over non-empty symbols).
      val w = 8
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |occ AS MATERIALIZED (
         |  SELECT doc_id, i, array_to_string(toks[i:i+${w - 1}], ' ') AS gram
         |  FROM tok, UNNEST(range(1, len(toks) - ${w - 2})) AS u(i)),
         |flag AS MATERIALIZED (
         |  SELECT doc_id, i FROM (
         |    SELECT doc_id, i, COUNT(*) OVER (PARTITION BY gram) AS n FROM occ)
         |  WHERE n >= 2),
         |grp AS (
         |  SELECT doc_id, i, SUM(CASE WHEN i > prev + $w THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY i) AS g
         |  FROM (SELECT doc_id, i,
         |          LAG(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM flag)),
         |spans AS (SELECT doc_id, MIN(i) AS s, MAX(i) + ${w - 1} AS e
         |          FROM grp GROUP BY doc_id, g),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         |          CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
         |        FROM spans GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  COALESCE(a.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
         |  COALESCE(a.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens
         |FROM tok t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "q_span_scrub" -> {
      // keep-first: ROW_NUMBER over (doc_id, i) per window keeps the
      // first occurrence; later occurrences' covered tokens are removed
      // and the doc is rebuilt from kept tokens (single-space canonical)
      val w = 8
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |occ AS MATERIALIZED (
         |  SELECT doc_id, i, array_to_string(toks[i:i+${w - 1}], ' ') AS gram
         |  FROM tok, UNNEST(range(1, len(toks) - ${w - 2})) AS u(i)),
         |sc AS MATERIALIZED (
         |  SELECT doc_id, i FROM (
         |    SELECT doc_id, i, COUNT(*) OVER (PARTITION BY gram) AS n,
         |      ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
         |    FROM occ)
         |  WHERE n >= 2 AND rn > 1),
         |grp AS (
         |  SELECT doc_id, i, SUM(CASE WHEN i > prev + $w THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY i) AS g
         |  FROM (SELECT doc_id, i,
         |          LAG(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM sc)),
         |spans AS (SELECT doc_id, MIN(i) AS s, MAX(i) + ${w - 1} AS e
         |          FROM grp GROUP BY doc_id, g),
         |cov AS (SELECT doc_id, UNNEST(range(s, e + 1)) AS p FROM spans),
         |pos AS (SELECT doc_id, UNNEST(toks) AS tk,
         |          UNNEST(range(1, len(toks) + 1)) AS p FROM tok),
         |kept AS (SELECT pos.doc_id, pos.p, pos.tk FROM pos LEFT JOIN cov
         |           ON pos.doc_id = cov.doc_id AND pos.p = cov.p
         |         WHERE cov.p IS NULL),
         |reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |          string_agg(tk, ' ' ORDER BY p) AS scrubbed_text
         |        FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  CAST(len(t.toks) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_scrubbed,
         |  COALESCE(r.scrubbed_text, '') AS scrubbed_text
         |FROM tok t LEFT JOIN reb r USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "q_contam_spans" -> {
      // maximal corpus-doc spans covered by any eval-slice n-gram
      // (eval = doc_id % 97 == 0, the decontaminate convention); w = 3
      val w = 3
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |ev AS MATERIALIZED (
         |  SELECT DISTINCT array_to_string(toks[i:i+${w - 1}], ' ') AS gram
         |  FROM tok, UNNEST(range(1, len(toks) - ${w - 2})) AS u(i)
         |  WHERE doc_id % 97 = 0),
         |occ AS MATERIALIZED (
         |  SELECT doc_id, i, array_to_string(toks[i:i+${w - 1}], ' ') AS gram
         |  FROM tok, UNNEST(range(1, len(toks) - ${w - 2})) AS u(i)
         |  WHERE doc_id % 97 <> 0),
         |flag AS MATERIALIZED (
         |  SELECT occ.doc_id, occ.i FROM occ JOIN ev USING (gram)),
         |grp AS (
         |  SELECT doc_id, i, SUM(CASE WHEN i > prev + $w THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY i) AS g
         |  FROM (SELECT doc_id, i,
         |          LAG(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM flag)),
         |spans AS (SELECT doc_id, MIN(i) AS s, MAX(i) + ${w - 1} AS e
         |          FROM grp GROUP BY doc_id, g),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contam_spans,
         |          CAST(SUM(e - s + 1) AS BIGINT) AS contam_tokens
         |        FROM spans GROUP BY doc_id)
         |SELECT a.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  a.n_contam_spans, a.contam_tokens
         |FROM agg a JOIN tok t USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "q_incr_spans" -> {
      // new batch (doc_id % 10 == 9, the incrementalDedup slice) vs the
      // existing corpus' window-key set; w = 8, history never re-deduped
      val w = 8
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |ex AS MATERIALIZED (
         |  SELECT DISTINCT array_to_string(toks[i:i+${w - 1}], ' ') AS gram
         |  FROM tok, UNNEST(range(1, len(toks) - ${w - 2})) AS u(i)
         |  WHERE doc_id % 10 <> 9),
         |occ AS MATERIALIZED (
         |  SELECT doc_id, i, array_to_string(toks[i:i+${w - 1}], ' ') AS gram
         |  FROM tok, UNNEST(range(1, len(toks) - ${w - 2})) AS u(i)
         |  WHERE doc_id % 10 = 9),
         |flag AS MATERIALIZED (
         |  SELECT occ.doc_id, occ.i FROM occ JOIN ex USING (gram)),
         |grp AS (
         |  SELECT doc_id, i, SUM(CASE WHEN i > prev + $w THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY i) AS g
         |  FROM (SELECT doc_id, i,
         |          LAG(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM flag)),
         |spans AS (SELECT doc_id, MIN(i) AS s, MAX(i) + ${w - 1} AS e
         |          FROM grp GROUP BY doc_id, g),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         |          CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
         |        FROM spans GROUP BY doc_id)
         |SELECT a.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  a.n_dup_spans, a.dup_tokens
         |FROM agg a JOIN tok t USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "q_dup_profile" ->
      // cluster-size histogram over the exact near-dup components (the
      // q_dedup_clusters recursive-CTE labeling) with redundant-token
      // volume = cluster tokens minus the canonical survivor's
      """WITH RECURSIVE tok AS (SELECT DISTINCT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |         FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b
        |       FROM pair JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |       WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.95),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM jp UNION SELECT doc_b, doc_a FROM jp),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |lab AS (SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS canonical
        |        FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |        GROUP BY d.doc_id),
        |ntok AS (SELECT doc_id,
        |           CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT) AS n_tokens
        |         FROM documents),
        |cl AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS k,
        |         CAST(SUM(n_tokens) AS BIGINT) AS toks,
        |         CAST(SUM(CASE WHEN lab.doc_id = canonical THEN n_tokens ELSE 0 END)
        |           AS BIGINT) AS keep
        |       FROM lab JOIN ntok ON ntok.doc_id = lab.doc_id GROUP BY canonical)
        |SELECT k AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(SUM(k) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks - keep) AS BIGINT) AS redundant_tokens
        |FROM cl GROUP BY k ORDER BY cluster_size""".stripMargin,
    "q_source_overlap" ->
      // 16-token chunk sharing between source pairs + chunk-set Jaccard;
      // chunk starts 1, 17, … with the final partial chunk truncated,
      // the chunkDedup convention
      """WITH tok AS MATERIALIZED (
        |  SELECT source, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |cs AS MATERIALIZED (
        |  SELECT DISTINCT source, array_to_string(toks[i:i+15], ' ') AS chunk
        |  FROM tok, UNNEST(range(1, len(toks) + 1, 16)) AS u(i)),
        |n AS MATERIALIZED (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nf FROM cs GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |        CAST(COUNT(*) AS BIGINT) AS shared_chunks
        |      FROM cs a JOIN cs b ON a.chunk = b.chunk AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT source_a, source_b, shared_chunks,
        |  CAST(shared_chunks AS DOUBLE)
        |    / CAST(na.nf + nb.nf - shared_chunks AS DOUBLE) AS jaccard
        |FROM p JOIN n na ON na.source = source_a
        |       JOIN n nb ON nb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "q_shard_pack" ->
      // seeded md5 global shuffle order, token-budget shard cuts; the
      // (k, doc_id) order and the :42 seed mirror TextOps.shardPack
      """WITH d AS (SELECT doc_id,
        |        md5(CAST(doc_id AS VARCHAR) || ':42') AS k,
        |        len(string_split(text, ' ')) AS n_tokens
        |      FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY k, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |      FROM d)
        |SELECT doc_id, n_tokens,
        |  cum_before // 4096 AS shard,
        |  cum_before % 4096 AS shard_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        |           FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |      FROM d)
        |SELECT doc_id, n_tokens,
        |  cum_before // 512 AS first_seq,
        |  (cum_before + n_tokens - 1) // 512 AS last_seq,
        |  cum_before % 512 AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_vocab_df" ->
      """WITH tok AS (SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS term
        |             FROM documents WHERE text IS NOT NULL),
        |df AS (SELECT lang, term, COUNT(*) AS df FROM tok GROUP BY 1, 2),
        |rk AS (SELECT lang, term, df,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY df DESC, term) AS rn
        |       FROM df)
        |SELECT lang, rn, term, df FROM rk WHERE rn <= 10
        |ORDER BY lang, rn""".stripMargin,
    "q_incremental_dedup" ->
      """WITH tok AS (SELECT DISTINCT doc_id, tok FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |cp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |       FROM tok a JOIN tok b ON a.tok = b.tok
        |       WHERE a.doc_id % 10 = 9 AND b.doc_id % 10 <> 9
        |       GROUP BY 1, 2),
        |near_drop AS (SELECT DISTINCT doc_a FROM cp
        |  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |  WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.95),
        |exact_drop AS (SELECT d.doc_id FROM documents d
        |  WHERE d.doc_id % 10 = 9 AND EXISTS (
        |    SELECT 1 FROM documents e WHERE e.doc_id % 10 <> 9 AND e.text = d.text)),
        |first_in_batch AS (SELECT MIN(doc_id) AS doc_id
        |  FROM documents WHERE doc_id % 10 = 9 GROUP BY text)
        |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
        |JOIN first_in_batch f ON f.doc_id = d.doc_id
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM exact_drop)
        |  AND d.doc_id NOT IN (SELECT doc_a FROM near_drop)
        |ORDER BY d.doc_id""".stripMargin,
    "q_merge_pairs" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS tk
        |              FROM documents WHERE text IS NOT NULL),
        |bg AS (SELECT unnest(list_transform(range(1, len(tk)),
        |         i -> tk[i] || ' ' || tk[i+1])) AS pair FROM toks)
        |SELECT pair, COUNT(*) AS n FROM bg
        |GROUP BY 1 ORDER BY n DESC, pair LIMIT 10""".stripMargin,
    "q_split_assign" ->
      """SELECT doc_id, lang,
        |  CASE WHEN u < 0.98 THEN 'train' WHEN u < 0.99 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |  CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':', COALESCE(text, ''))), 1, 8)) AS BIGINT)
        |    / 4294967296.0 AS u
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_corpus_mix" ->
      """WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS s
        |         FROM documents WHERE text IS NOT NULL),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    s[CAST(i AS INT)] || ' ' || s[CAST(i AS INT) + 1] || ' ' || s[CAST(i AS INT) + 2] AS g
        |  FROM toks, UNNEST(range(1, greatest(len(s) - 1, 1))) AS t(i)
        |),
        |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
        |contam AS (SELECT doc_id FROM grams JOIN ev USING (g)
        |           WHERE doc_id % 97 <> 0
        |           GROUP BY doc_id HAVING COUNT(*) >= 3),
        |tw AS (SELECT doc_id, unnest(s) AS w FROM toks),
        |wc AS (SELECT doc_id, MAX(n) AS top_n FROM
        |         (SELECT doc_id, w, COUNT(*) AS n FROM tw GROUP BY 1, 2)
        |       GROUP BY 1),
        |sz AS (SELECT doc_id, len(s) AS n_tokens FROM toks),
        |clean AS (SELECT d.doc_id, d.lang, d.text FROM documents d
        |          JOIN keep USING (doc_id)
        |          JOIN wc USING (doc_id) JOIN sz USING (doc_id)
        |          WHERE d.doc_id % 97 <> 0
        |            AND d.doc_id NOT IN (SELECT doc_id FROM contam)
        |            AND wc.top_n * 5 <= sz.n_tokens),
        |c AS (SELECT lang, COUNT(*) AS n_s FROM clean GROUP BY lang)
        |SELECT cl.doc_id, cl.lang FROM clean cl JOIN c USING (lang)
        |WHERE CAST(concat('0x', substr(md5(concat(CAST(cl.doc_id AS VARCHAR), ':', COALESCE(cl.text, ''))), 1, 8)) AS BIGINT)
        |        / 4294967296.0
        |      < least(1.0, 3.0 / sqrt(CAST(n_s AS DOUBLE)))
        |ORDER BY doc_id""".stripMargin,
    "q_knn_blocked" ->
      // the exactness tier of the kNN graph: same-label blocks, exact
      // cosine (SUM-reassociation absorbed by the shared ROUND-4), the
      // cosineTopK deterministic (cosine DESC, nid) rank order
      """WITH flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                generate_subscripts(embedding, 1) AS i FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY 1),
        |cand AS (SELECT a.vec_id AS qid, b.vec_id AS nid
        |         FROM embeddings a JOIN embeddings b
        |         ON a.label = b.label AND a.vec_id <> b.vec_id),
        |dotp AS (SELECT c.qid, c.nid, SUM(fa.x*fb.x) AS dp
        |         FROM cand c JOIN flat fa ON fa.vec_id = c.qid
        |         JOIN flat fb ON fb.vec_id = c.nid AND fb.i = fa.i
        |         GROUP BY 1, 2),
        |sc AS (SELECT qid, nid, ROUND(dp/(na.nrm*nb.nrm), 4) AS cosine
        |       FROM dotp JOIN nrm na ON na.vec_id = qid JOIN nrm nb ON nb.vec_id = nid),
        |rk AS (SELECT qid, nid, cosine,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS BIGINT) AS rk
        |       FROM sc)
        |SELECT qid AS vec_id, rk, nid, cosine FROM rk WHERE rk <= 3
        |ORDER BY vec_id, rk""".stripMargin,
    "q_cosine_topk" ->
      """WITH flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                generate_subscripts(embedding, 1) AS i FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY 1),
        |dotp AS (SELECT q.vec_id AS qid, f.vec_id AS nid, SUM(q.x*f.x) AS dp
        |         FROM flat q JOIN flat f ON q.i = f.i
        |         WHERE q.vec_id < 5 AND q.vec_id <> f.vec_id GROUP BY 1, 2),
        |sc AS (SELECT qid, nid, ROUND(dp/(nq.nrm*nn.nrm), 4) AS cosine
        |       FROM dotp JOIN nrm nq ON nq.vec_id = qid JOIN nrm nn ON nn.vec_id = nid),
        |rk AS (SELECT qid, nid, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
        |       FROM sc)
        |SELECT qid, nid, cosine, rn FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin,
    "q_hybrid_search" -> hybridOracleSql,
    // the SQL-text face fuses the same legs — one oracle definition for
    // both front doors, by construction
    "q_sql_hybrid_search" -> hybridOracleSql,
    "q_filtered_topk" ->
      // cosine_topk restricted to the query's target label class
      // (label = qid); rounded cosine absorbs float summation order
      """WITH flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                generate_subscripts(embedding, 1) AS i FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY 1),
        |dotp AS (SELECT q.vec_id AS qid, f.vec_id AS nid, SUM(q.x*f.x) AS dp
        |         FROM flat q JOIN flat f ON q.i = f.i
        |         JOIN embeddings e ON e.vec_id = f.vec_id
        |         WHERE q.vec_id < 5 AND q.vec_id <> f.vec_id
        |           AND e.label = CAST(q.vec_id AS INTEGER)
        |         GROUP BY 1, 2),
        |sc AS (SELECT qid, nid, ROUND(dp/(nq.nrm*nn.nrm), 4) AS cosine
        |       FROM dotp JOIN nrm nq ON nq.vec_id = qid JOIN nrm nn ON nn.vec_id = nid),
        |rk AS (SELECT qid, nid, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
        |       FROM sc)
        |SELECT qid, nid, cosine, rn FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin,
    "q_ann_filtered" ->
      // the adaptive filtered-ANN is spec-pinned EXACTLY equal to
      // filteredTopK (FilteredAnnSpec: the brute path by construction,
      // the probe path at full depth; at the verify scale every class
      // sits under the selectivity threshold, so the exact-class plan
      // runs) — the oracle is therefore the same exact-filtered SQL
      """WITH flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                generate_subscripts(embedding, 1) AS i FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY 1),
        |dotp AS (SELECT q.vec_id AS qid, f.vec_id AS nid, SUM(q.x*f.x) AS dp
        |         FROM flat q JOIN flat f ON q.i = f.i
        |         JOIN embeddings e ON e.vec_id = f.vec_id
        |         WHERE q.vec_id < 5 AND q.vec_id <> f.vec_id
        |           AND e.label = CAST(q.vec_id AS INTEGER)
        |         GROUP BY 1, 2),
        |sc AS (SELECT qid, nid, ROUND(dp/(nq.nrm*nn.nrm), 4) AS cosine
        |       FROM dotp JOIN nrm nq ON nq.vec_id = qid JOIN nrm nn ON nn.vec_id = nid),
        |rk AS (SELECT qid, nid, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
        |       FROM sc)
        |SELECT qid, nid, cosine, rn FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin,
    "q_embed_near_dup" ->
      """WITH flat AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                generate_subscripts(embedding, 1) AS i FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY 1),
        |pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |          FROM embeddings a JOIN embeddings b
        |          ON a.label = b.label AND a.vec_id < b.vec_id),
        |dotp AS (SELECT p.vec_a, p.vec_b, SUM(fa.x*fb.x) AS dp
        |         FROM pairs p JOIN flat fa ON fa.vec_id = p.vec_a
        |         JOIN flat fb ON fb.vec_id = p.vec_b AND fb.i = fa.i
        |         GROUP BY 1, 2)
        |SELECT vec_a, vec_b, cosine FROM (
        |  SELECT vec_a, vec_b, ROUND(dp/(na.nrm*nb.nrm), 4) AS cosine
        |  FROM dotp JOIN nrm na ON na.vec_id = vec_a JOIN nrm nb ON nb.vec_id = vec_b)
        |WHERE cosine >= 0.35 ORDER BY vec_a, vec_b""".stripMargin,
    // ---- r10 md5-tier conversions: the hash-defined families replayed
    // exactly (the r9 WinnowMd5/WinnowXx precedent applied to minhash,
    // simhash and the KMV sketch; production xxhash64 tiers remain as
    // parameters, spec-pinned structure-identical) ----
    "q_minhash_lsh" -> minhashLshOracleSql("ts"),
    "q_minhash_shingle" ->
      // word-3-gram strings with the partial-window rule: out-of-range
      // list indexes are NULL and concat_ws skips them — exactly
      // TextOps.gramStrings' try_element_at + concat_ws pair
      minhashLshOracleSql("list_transform(" +
        "range(0, greatest(len(ts) - 3, 0) + 1), " +
        "i -> concat_ws(' ', ts[i+1], ts[i+2], ts[i+3]))"),
    "q_minhash_profile" -> {
      val mins = (0 until 16).map(i =>
        s"min(${h60Sql(s"'$i|' || t")}) AS m$i").mkString(",\n        ")
      val agree = (0 until 16)
        .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
        .mkString("\n          + ")
      // min over every token occurrence = min over the language's token
      // SET (the Spark side folds per-doc signatures by element-wise min;
      // min distributes over the union, so both sides agree exactly)
      s"""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t
        |             FROM documents WHERE text IS NOT NULL),
        |sigs AS (SELECT lang,
        |        $mins
        |  FROM tok GROUP BY lang)
        |SELECT a.lang AS lang_a, b.lang AS lang_b,
        |  ($agree) / 16.0 AS est_jaccard
        |FROM sigs a JOIN sigs b ON a.lang < b.lang
        |ORDER BY lang_a, lang_b""".stripMargin
    },
    "q_simhash" ->
      // the SimHash64Expr bit-vote fold replayed per bit: each token-hash
      // occurrence votes ±1 per bit position, positive votes set the bit
      // (60-bit md5-tier hashes leave bits 60-63 all-minus → 0, exactly
      // the Spark fold's behavior); then the 8×8-bit band self-join over
      // DISTINCT fingerprints and exact hamming ≤ 8 verification
      s"""WITH hs AS (SELECT doc_id,
        |    list_transform(string_split(text, ' '), t -> ${h60Sql("t")}) AS hv
        |  FROM documents WHERE text IS NOT NULL),
        |votes AS (SELECT doc_id, b,
        |    SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
        |  FROM (SELECT doc_id, unnest(hv) AS h FROM hs)
        |  CROSS JOIN (SELECT unnest(range(60)) AS b) GROUP BY 1, 2),
        |fps AS MATERIALIZED (SELECT doc_id,
        |    CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS fp
        |  FROM votes GROUP BY 1),
        |intra AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 0 AS hamming
        |          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |dfp AS (SELECT DISTINCT fp FROM fps),
        |bands AS (SELECT fp, b, (fp >> (b * 8)) & 255 AS bv
        |          FROM dfp CROSS JOIN (SELECT unnest(range(8)) AS b)),
        |fpair AS (SELECT DISTINCT x.fp AS fa, y.fp AS fb
        |          FROM bands x JOIN bands y
        |          ON x.b = y.b AND x.bv = y.bv AND x.fp < y.fp),
        |near AS (SELECT fa, fb, bit_count(xor(fa, fb)) AS hamming FROM fpair
        |         WHERE bit_count(xor(fa, fb)) <= 8),
        |inter AS (SELECT least(x.doc_id, y.doc_id) AS doc_a,
        |                 greatest(x.doc_id, y.doc_id) AS doc_b, n.hamming
        |          FROM near n JOIN fps x ON x.fp = n.fa JOIN fps y ON y.fp = n.fb)
        |SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
        |FROM (SELECT * FROM intra UNION ALL SELECT * FROM inter)
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_ann_lsh_exactsig" -> annLshExactSigOracleSql,
    // the index-served twin must reproduce the raw-recompute ranking
    // bit-for-bit — the same oracle IS the standing consistency proof
    // for the maintained VectorIndex artifact (the q_bm25_indexed role)
    "q_ann_sig_indexed" -> annLshExactSigOracleSql,
    "q_distinct_approx" -> kmvDailyOracle,
    // the SQL-authored twin answers to the SAME sketch-replay oracle —
    // the custom-aggregate class through the front door
    "q_sql_distinct_approx" -> kmvDailyOracle,
  )

  /** The routed corpus-stats oracle — DuckDB recomputes the per-lang
    * panel from the RAW documents table, so a green row is an
    * end-to-end proof that the CorpusRoute rewrite (which serves it
    * from the maintained rollup) is bit-identical; shared by the DSL
    * row and its SQL-text twin.
    */
  private def corpusStatsOracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)/COUNT(*) AS avg_tokens
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** The deterministic quantile-summary oracle (r14) — DuckDB replays
    * the identical integer walk QHistMergeAgg runs (exact per-type
    * histogram → cumulative weights → band = ceil(c·b/n) in integer
    * division → last value per band → rank ceil(p·n) against the kept
    * set), shared by the DSL row and its SQL-text twin.
    */
  private def qhistPercentilesOracle: String = {
    // parameters interpolated from the ONE shared definition, so the
    // oracle can never drift from the faces it checks (review-found, r14)
    val b = graft.operators.EventOps.qhistB
    val Seq(bp50, bp95, bp99) = graft.operators.EventOps.qhistBps
    s"""WITH hist AS (
      |  SELECT event_type, value AS v, CAST(COUNT(*) AS BIGINT) AS w
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, v,
      |    CAST(SUM(w) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS c,
      |    CAST(SUM(w) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM hist),
      |kept AS (
      |  SELECT event_type, MAX(v) AS v, MAX(c) AS c, MAX(n) AS n
      |  FROM cum GROUP BY event_type, (c * $b + n - 1) // n)
      |SELECT event_type,
      |  ROUND(MIN(CASE WHEN c >= (n * $bp50 + 9999) // 10000 THEN v END), 4) AS p50,
      |  ROUND(MIN(CASE WHEN c >= (n * $bp95 + 9999) // 10000 THEN v END), 4) AS p95,
      |  ROUND(MIN(CASE WHEN c >= (n * $bp99 + 9999) // 10000 THEN v END), 4) AS p99
      |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The top-k / rate / session oracles, each ONE definition shared by
    * the DSL row and its SQL-text twin (the tagFilterOracle rule): the
    * "same oracle as the DSL face" claim must hold by construction,
    * never by duplicated strings staying in sync (r13 ADVICE).
    */
  private def topKOracle: String =
    """SELECT event_type, COUNT(*) AS cnt FROM events
      |GROUP BY 1 ORDER BY cnt DESC, event_type LIMIT 3""".stripMargin

  private def rateOracle: String =
    """SELECT user_id, event_id, delta FROM (
      |  SELECT user_id, event_id,
      |    value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
      |  FROM events) t
      |WHERE delta IS NOT NULL ORDER BY user_id, event_id""".stripMargin

  private def sessionOracle: String =
    """WITH x AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** The D6 tag predicate recomputed from RAW events (the index is a
    * Spark-side serving artifact the oracle must not depend on). ONE
    * definition shared by the DSL row and its r12 SQL-text twin — the
    * twin claim ("same oracle as the DSL face") holds by construction,
    * never by two copies staying in sync.
    */
  private def tagFilterOracle: String =
    """SELECT event_id, user_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      |ORDER BY event_id""".stripMargin

  /** The KmvAgg md5-tier sketch replayed: k-th smallest DISTINCT h60
    * per day; below k the sketch IS the exact distinct-hash count, at k
    * the exact-integer floor estimate (k-1)*2^53 // ((h_k>>7)+1) — both
    * regimes integer arithmetic both engines floor identically. Shared
    * by the DSL row and its r12 SQL-text twin.
    */
  private def kmvDailyOracle: String =
    s"""WITH h AS (SELECT CAST(ts AS DATE) AS day,
      |    ${h60Sql("CAST(user_id AS VARCHAR)")} AS hv
      |  FROM events),
      |d AS (SELECT DISTINCT day, hv FROM h),
      |r AS (SELECT day, hv,
      |    ROW_NUMBER() OVER (PARTITION BY day ORDER BY hv) AS rn,
      |    COUNT(*) OVER (PARTITION BY day) AS nd FROM d)
      |SELECT day,
      |  CASE WHEN MAX(nd) < 64 THEN MAX(nd)
      |       ELSE (63::BIGINT * (1::BIGINT << 53))
      |            // ((MAX(CASE WHEN rn = 64 THEN hv END) >> 7) + 1)
      |  END AS approx_users
      |FROM r GROUP BY day ORDER BY day""".stripMargin
}
