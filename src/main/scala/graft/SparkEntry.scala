package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.regionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational (SURVEY §2 R1–R14)
    "q1_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q_product_search" -> ((s, d) => Relational.productSearch(s, d)),
    "q_fuzzy_search" -> ((s, d) => Relational.fuzzySearch(s, d)),
    "q_category_search" -> ((s, d) => Relational.categorySearch(s, d)),
    "q_broad_search" -> ((s, d) => Relational.broadSearch(s, d)),
    "q_catalog_page" -> ((s, d) => Relational.catalogPage(s, d)),
    "q_product_bm25" -> ((s, d) => Relational.productBm25(s, d)),
    "q_product_by_sku" -> ((s, d) => Relational.productBySku(s, d)),
    "q_customer_list" -> ((s, d) => Relational.customerList(s, d)),
    "q_order_form" -> ((s, d) => Relational.orderFormProducts(s, d)),
    "q_check_stock" -> ((s, d) => Relational.checkStock(s, d)),
    "q_user_orders" -> ((s, d) => Relational.userOrders(s, d)),
    "q_all_orders" -> ((s, d) => Relational.allOrders(s, d)),
    "q_order_status_counts" -> ((s, d) => Relational.orderStatusCounts(s, d)),
    "q_cancel_eligible" -> ((s, d) => Relational.cancelEligible(s, d)),
    "q_top_customers" -> ((s, d) => Relational.topCustomers(s, d)),
    "q_revenue_by_category" -> ((s, d) => Relational.revenueByCategory(s, d)),
    // partial re-aggregation of base+delta merges to the full rollup
    // exactly (decimal partials) ⇒ shares R10's full-table oracle
    "q_mv_incremental" -> ((s, d) => Relational.revenueByCategoryIncremental(s, d)),
    "q_top_products" -> ((s, d) => Relational.topProducts(s, d)),
    "q_region_revenue" -> ((s, d) => Relational.regionRevenue(s, d)),
    "q_segment_stats" -> ((s, d) => Relational.segmentStats(s, d)),
    "q_order_priority_dist" -> ((s, d) => Relational.orderPriorityDist(s, d)),
    "q_running_revenue" -> ((s, d) => Relational.runningRevenue(s, d)),
    "q_top_per_category" -> ((s, d) => Relational.topPerCategory(s, d)),
    "q_cohort_retention" -> ((s, d) => Relational.cohortRetention(s, d)),
    "q_order_percentiles" -> ((s, d) => Relational.orderPercentiles(s, d)),
    "q_approx_distinct" -> ((s, d) => Relational.approxDistinct(s, d)),
    "q_approx_percentiles" -> ((s, d) => Relational.approxPercentiles(s, d)),
    "q_nation_trade" -> ((s, d) => Relational.nationTrade(s, d)),
    "q_market_share" -> ((s, d) => Relational.marketShare(s, d)),
    "q_rollup_revenue" -> ((s, d) => Relational.rollupRevenue(s, d)),
    "q_cube_revenue" -> ((s, d) => Relational.cubeRevenue(s, d)),
    "q_segment_status_pivot" -> ((s, d) => Relational.segmentStatusPivot(s, d)),
    "q_segment_status_unpivot" -> ((s, d) => Relational.segmentStatusUnpivot(s, d)),
    // Text analysis (SURVEY §2 T1–T4)
    "t_lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "t_quality_score" -> ((s, d) => TextOps.qualityScore(s, d)),
    "t_token_count" -> ((s, d) => TextOps.tokenCount(s, d)),
    "t_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    "t_hash_sample" -> ((s, d) => Sampling.hashSample(s, d)),
    "t_stratified_sample" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "t_source_mix" -> ((s, d) => Sampling.sourceMix(s, d)),
    "t_repetition" -> ((s, d) => TextOps.repetition(s, d)),
    "t_pii_redact" -> ((s, d) => TextOps.piiRedact(s, d)),
    "t_vocab" -> ((s, d) => TextOps.vocab(s, d)),
    "t_bm25" -> ((s, d) => TextOps.bm25(s, d)),
    "t_quality_tiers" -> ((s, d) => TextOps.qualityTiers(s, d)),
    "t_tfidf_keywords" -> ((s, d) => TextOps.tfidfKeywords(s, d)),
    "t_unigram_logprob" -> ((s, d) => TextOps.unigramLogprob(s, d)),
    "t_bigram_logprob" -> ((s, d) => TextOps.bigramLogprob(s, d)),
    "t_kn_logprob" -> ((s, d) => TextOps.knLogprob(s, d)),
    // r16: the trigram extension (one more backoff level, same stats shape)
    "t_kn3_logprob" -> ((s, d) => TextOps.kn3Logprob(s, d)),
    "t_quality_classifier" -> ((s, d) => TextOps.qualityClassifier(s, d)),
    "t_more_like_this" -> ((s, d) => TextOps.moreLikeThis(s, d)),
    "t_ppl_buckets" -> ((s, d) => TextOps.pplBuckets(s, d)),
    "t_gopher_rules" -> ((s, d) => TextOps.gopherRules(s, d)),
    "t_entropy" -> ((s, d) => TextOps.wordEntropy(s, d)),
    "t_winnow" -> ((s, d) => TextOps.winnow(s, d)),
    "t_winnow_pairs" -> ((s, d) => TextOps.winnowPairs(s, d)),
    "d_decontaminate_spans" -> ((s, d) => TextOps.decontaminateSpans(s, d)),
    "d_decontaminate_rewrite" -> ((s, d) => TextOps.decontaminateRewrite(s, d)),
    // Dedup (SURVEY §2 D1–D5)
    "d_exact_dedup" -> ((s, d) => Dedup.exactDedup(s, d)),
    "d_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "d_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "d_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "d_ngram_jaccard_lsh" -> ((s, d) => Dedup.ngramJaccardLsh(s, d)),
    "d_embedding_neardup" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    // hash-matched since r7: the sign-bit hyperplanes are md5-derived and
    // deterministic — the oracle replays all 96 planes, the band buckets,
    // and the exact cosine re-rank in SQL
    "d_embedding_neardup_lsh" -> ((s, d) => Dedup.embeddingNearDupLsh(s, d)),
    "d_decontaminate" -> ((s, d) => Dedup.decontaminate(s, d)),
    // Bloom prefilter + exact confirm join ⇒ output identical to D6 (no
    // false negatives; FPs die in the join), so it shares D6's oracle
    "d_decontaminate_bloom" -> ((s, d) => Dedup.decontaminateBloom(s, d)),
    "d_decontaminate_semantic" -> ((s, d) => Dedup.decontaminateSemantic(s, d)),
    "d_dup_clusters" -> ((s, d) => Dedup.dupClusters(s, d)),
    "d_cross_dedup" -> ((s, d) => Dedup.crossDedup(s, d)),
    "d_dup_spans" -> ((s, d) => Dedup.dupSpans(s, d)),
    "d_line_dedup" -> ((s, d) => Dedup.lineDedup(s, d)),
    // k-means-seeded cluster scope ⇒ rows-only (V4b's argument); the
    // planted-fixture spec pins group semantics + the keeper choice
    "d_semdedup" -> ((s, d) => Dedup.semDedup(s, d)),
    // Vector (SURVEY §2 V1–V6)
    "v_cosine_topk" -> ((s, d) => VectorOps.cosineTopK(s, d)),
    "v_semantic_cache" -> ((s, d) => VectorOps.semanticCache(s, d)),
    "v_knn_per_label" -> ((s, d) => VectorOps.knnPerLabel(s, d)),
    "v_lsh_ann" -> ((s, d) => VectorOps.lshAnn(s, d)),
    "v_ann_recall" -> ((s, d) => VectorOps.annRecall(s, d)),
    "v_ann_recall_family" -> ((s, d) => VectorOps.annRecallFamily(s, d)),
    "v_embedding_drift" -> ((s, d) => Drift.embeddingDrift(s, d)),
    "v_ivf_ann" -> ((s, d) => VectorOps.ivfAnn(s, d)),
    // k-means + PQ-codebook seeded ⇒ honestly rows-only like V4b/V10
    "v_ivfpq_ann" -> ((s, d) => VectorOps.ivfpqAnn(s, d)),
    "v_chunk_text" -> ((s, d) => VectorOps.chunkText(s, d)),
    "v_chunk_recursive" -> ((s, d) => VectorOps.chunkRecursive(s, d)),
    "v_dedup_chunks" -> ((s, d) => VectorOps.dedupChunks(s, d)),
    "v_label_centroids" -> ((s, d) => VectorOps.labelCentroids(s, d)),
    "v_quantize_int8" -> ((s, d) => VectorOps.quantizeInt8(s, d)),
    "v_maxsim" -> ((s, d) => VectorOps.maxSim(s, d)),
    "v_mmr_rerank" -> ((s, d) => VectorOps.mmrRerank(s, d)),
    "v_hybrid_search" -> ((s, d) => VectorOps.hybridSearch(s, d)),
    "v_bq_ann" -> ((s, d) => VectorOps.bqAnn(s, d)),
    // rows-only by design: PQ codebooks are float-trained (ADC is
    // approximate); the spec pins recall vs exact top-k on the corpus
    "v_pq_ann" -> ((s, d) => VectorOps.pqAnn(s, d)),
    // Multimodal (SURVEY §2 M1–M2)
    "m_binary_meta" -> ((s, d) => Multimodal.binaryMeta(s, d)),
    "m_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    // byte-loop perceptual hashing has no SQL twin ⇒ rows-only; the spec
    // pins clone collapse, planted small-edit detection, and scatter
    "m_phash_dedup" -> ((s, d) => Multimodal.phashDedup(s, d)),
    "m_feature_extract" -> ((s, d) => Multimodal.featureExtract(s, d)),
    "m_segment_plan" -> ((s, d) => Multimodal.segmentPlan(s, d)),
    "m_resize_plan" -> ((s, d) => Multimodal.resizePlan(s, d)),
    // Graph (SURVEY §2 G1–G7)
    "g_copurchase_edges" -> ((s, d) => GraphOps.copurchaseEdges(s, d)),
    "g_degree" -> ((s, d) => GraphOps.degree(s, d)),
    "g_two_hop" -> ((s, d) => GraphOps.twoHop(s, d)),
    "g_cat_hierarchy_rollup" -> ((s, d) => GraphOps.hierarchyRollup(s, d)),
    "g_pagerank" -> ((s, d) => GraphOps.pageRank(s, d)),
    "g_pagerank_weighted" -> ((s, d) => GraphOps.pageRankWeighted(s, d)),
    "g_connected_components" -> ((s, d) => GraphOps.connectedComponents(s, d)),
    "g_node_similarity" -> ((s, d) => GraphOps.nodeSimilarity(s, d)),
    // hash-matched since r7: the banded MinHash is md5-derived and fully
    // deterministic, so the oracle replays the 24 permutations + band
    // join + exact re-rank in SQL (the D4b argument — a fixed fact of
    // the data, not a coin flip); the planted-fixture spec still pins
    // recall on a true near-identical neighborhood
    "g_node_similarity_lsh" -> ((s, d) => GraphOps.nodeSimilarityLsh(s, d)),
    "g_adamic_adar" -> ((s, d) => GraphOps.adamicAdar(s, d)),
    "g_adamic_adar_lsh" -> ((s, d) => GraphOps.adamicAdarLsh(s, d)),
    "g_betweenness" -> ((s, d) => GraphOps.betweenness(s, d)),
    "g_closeness" -> ((s, d) => GraphOps.closeness(s, d)),
    "g_kcore" -> ((s, d) => GraphOps.kCore(s, d)),
    "g_triangle_count" -> ((s, d) => GraphOps.triangleCount(s, d)),
    "g_shortest_paths" -> ((s, d) => GraphOps.shortestPaths(s, d)),
    "g_weighted_paths" -> ((s, d) => GraphOps.weightedPaths(s, d)),
    "g_also_bought" -> ((s, d) => GraphOps.alsoBought(s, d)),
    "g_communities" -> ((s, d) => GraphOps.communities(s, d)),
    "g_recommend_user" -> ((s, d) => GraphOps.recommendForUser(s, d)),
    "g_ppr" -> ((s, d) => GraphOps.personalizedPageRank(s, d)),
    // HLL-sketch estimates (float) ⇒ rows-only like q_approx_distinct
    "g_reach_profile" -> ((s, d) => GraphOps.reachProfile(s, d)),
    "g_harmonic_all" -> ((s, d) => GraphOps.harmonicAll(s, d)),
    "g_modularity" -> ((s, d) => GraphOps.modularity(s, d)),
    "g_louvain" -> ((s, d) => GraphOps.louvain(s, d)),
    "g_louvain_multi" -> ((s, d) => GraphOps.louvainMulti(s, d)),
    // r16: FastRP embeddings, unpivoted to (part, dim, val) scalars —
    // the all-BIGINT chain replays exactly (fastRpOracle below)
    "g_fastrp" -> ((s, d) => GraphOps.fastRp(s, d)),
    // r16: per-sweep Louvain convergence monitor (moved counts + Q) —
    // always the full budget; the early exit lives in louvainOf itself
    "g_louvain_trace" -> ((s, d) => GraphOps.louvainTrace(s, d)),
    "g_hits" -> ((s, d) => GraphOps.hits(s, d)),
    "g_random_walks" -> ((s, d) => GraphOps.randomWalks(s, d)),
    "g_node2vec" -> ((s, d) => GraphOps.node2vecWalks(s, d)),
    // Pipeline composition (SURVEY §2 P1–P2)
    "p_corpus_clean" -> ((s, d) => pipeline.CorpusPipeline.corpusClean(s, d)),
    "p_pack_tokens" -> ((s, d) => Packing.packTokens(s, d)),
    "p_train_mix" -> ((s, d) => pipeline.CorpusPipeline.trainMix(s, d)),
    "p_split_leakproof" -> ((s, d) => pipeline.CorpusPipeline.splitLeakproof(s, d)),
    "p_data_card" -> ((s, d) => pipeline.CorpusPipeline.dataCard(s, d)),
    "p_quality_checks" -> ((s, d) => pipeline.CorpusPipeline.qualityChecks(s, d)),
    "p_dsir_sample" -> ((s, d) => Sampling.dsirSample(s, d)),
    "p_temperature_sample" -> ((s, d) => Sampling.temperatureSample(s, d)),
    "p_drift_psi" -> ((s, d) => Drift.psiDrift(s, d)),
    // iterative vocab-state rewriting has no scalar SQL replay ⇒
    // rows-only; the spec carries a single-JVM reference fold + the
    // classic known-merges fixture
    "t_bpe_merges" -> ((s, d) => Bpe.bpeMerges(s, d)),
    // inherits T15's rows-only status (the trained merge table is the
    // input); spec: reference fold + zero-merge identity + monotonicity
    "t_bpe_encode" -> ((s, d) => Bpe.bpeEncode(s, d)),
    "p_shuffle_shards" -> ((s, d) => Sampling.shuffleShards(s, d)),
    "p_curriculum" -> ((s, d) => Sampling.curriculum(s, d)),
    "p_mix_budget" -> ((s, d) => Sampling.mixBudget(s, d)),
    // token arrays have no scalar SQL replay ⇒ rows-only; the spec pins
    // reassembly identity + shard determinism + the packing invariants.
    // r16: the CONTRACT entry is the all-scalar digest projection — the
    // driver's pandas comparator crashes on array columns (ADVICE r15
    // #1), so arrays stay behind tokenizeShards/writeTokenShards and the
    // entry ships xxhash64 digests of them instead.
    "p_tokenize_shards" -> ((s, d) => pipeline.CorpusPipeline.tokenizeShardsDigest(s, d)),
    "p_zorder_layout" -> ((s, d) => Layout.zorderLayout(s, d)),
    // best-fit-decreasing needs the whole open-bins vector as fold state
    // — no scalar recursive-CTE replay ⇒ rows-only; the ScalaCheck spec
    // carries reference equality + validity + never-worse-than-greedy
    "p_pack_bestfit" -> ((s, d) => Packing.packTokensBestFit(s, d)),
    // Streaming batch-equivalents (SURVEY §2 S1–S4)
    "s_window_agg" -> ((s, d) => streaming.EventOps.windowAggQuery(s, d)),
    "s_sliding_agg" -> ((s, d) => streaming.EventOps.slidingAggQuery(s, d)),
    "s_sessionize" -> ((s, d) => streaming.EventOps.sessionizeQuery(s, d)),
    "s_funnel" -> ((s, d) => streaming.EventOps.funnelQuery(s, d)),
    "s_event_dedup" -> ((s, d) => streaming.EventOps.eventDedupQuery(s, d)),
    "s_recent_history" -> ((s, d) => streaming.EventOps.recentHistoryQuery(s, d)),
    "s_props_stats" -> ((s, d) => streaming.EventOps.propsStatsQuery(s, d)),
    "s_enrich" -> ((s, d) => streaming.EventOps.enrichQuery(s, d)),
    "s_attribution" -> ((s, d) => streaming.EventOps.attributionQuery(s, d)),
    "s_attribution_outer" -> ((s, d) => streaming.EventOps.attributionOuterQuery(s, d)),
    "s_scd2_dim" -> ((s, d) => streaming.EventOps.scd2Query(s, d)),
    "s_value_anomaly" -> ((s, d) => streaming.EventOps.valueAnomalyQuery(s, d)),
    // Transactional write-path folds (SURVEY §2 / VERDICT r2 missing #1)
    "s_place_order" -> ((s, d) => streaming.OrderFold.placeOrderQuery(s, d)),
    "s_transitions" -> ((s, d) => streaming.EventOps.transitionsQuery(s, d)),
    // Temporal joins (SURVEY §2 J1–J3)
    "j_asof_attribution" -> ((s, d) => TemporalJoins.asofAttribution(s, d)),
    "j_asof_forward" -> ((s, d) => TemporalJoins.asofForward(s, d)),
    "j_range_promo" -> ((s, d) => TemporalJoins.promoRangeJoin(s, d)),
    "j_interval_overlap" -> ((s, d) => TemporalJoins.sessionOverlapCount(s, d)),
    "j_scd2_lookup" -> ((s, d) => TemporalJoins.scd2Lookup(s, d)),
    "v_matryoshka" -> ((s, d) => VectorOps.matryoshkaAnn(s, d)),
    // float-fitted (covariance eigensolve) ⇒ rows-only like the k-means
    // family; the spec pins orthonormality, variance identities, and
    // planted-direction recovery
    "v_pca" -> ((s, d) => VecPca.pcaProject(s, d)),
    // r8f: trend/segmentation/engagement series
    "q_revenue_trend" -> ((s, d) => Relational.revenueTrend(s, d)),
    "q_rfm_segments" -> ((s, d) => Relational.rfmSegments(s, d)),
    "s_rolling_actives" -> ((s, d) => streaming.EventOps.rollingActivesQuery(s, d)),
    // DataSketches HLL binaries have no DuckDB twin ⇒ rows-only; the
    // spec pins estimate error vs S18's exact series, register-max
    // mergeability, and partitioning invariance
    "s_rolling_actives_hll" -> ((s, d) => streaming.EventOps.rollingActivesHllQuery(s, d)),
    "s_audience_overlap" -> ((s, d) => streaming.EventOps.audienceOverlapQuery(s, d)),
  )

  /** Exact-definition SQL for the n-gram Jaccard relation — the oracle of
    * BOTH d_ngram_jaccard (exact inverted-index join) and
    * d_ngram_jaccard_lsh (MinHash band candidates + exact re-rank). */
  private val ngramJaccardOracle: String =
    """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1,len(w)), i -> w[i]||' '||w[i+1])) s
      |       FROM d WHERE len(w) >= 2),
      |rare AS (SELECT s FROM sh0 GROUP BY s
      |         HAVING COUNT(*) <= 0.2 * (SELECT COUNT(*) FROM documents)),
      |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare ON sh0.s = rare.s),
      |sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
      |pr AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) ni
      |       FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
      |SELECT da AS doc_a, db AS doc_b, ROUND(CAST(ni AS DOUBLE)/(sa.n+sb.n-ni),6) AS jacc
      |FROM pr JOIN sz sa ON da=sa.doc_id JOIN sz sb ON db=sb.doc_id
      |WHERE CAST(ni AS DOUBLE)/(sa.n+sb.n-ni) >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  /** The MinHash band-bucket pair pipeline (word-3-gram shingles, 16
    * perms, 4 bands) as reusable CTEs ending in `mpairs(doc_a, doc_b,
    * n_bands)` — shared by the d_minhash_lsh oracle and the cluster
    * closure built on top of it. */
  private val minhashPairsCtes: String =
    """d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |   unnest(list_transform(range(1,len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])) s
      | FROM d WHERE len(w) >= 3),
      |h AS (SELECT doc_id, CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % 1000000007 AS hv FROM sh),
      |mh AS (SELECT doc_id, j, MIN(((2*j+1)*hv + 17*j+3) % 1000000007) AS m
      |       FROM h CROSS JOIN (SELECT unnest(range(0,16)) AS j) js GROUP BY doc_id, j),
      |bands AS (SELECT doc_id, j//4 AS band,
      |   concat_ws(',', CAST(MAX(CASE WHEN j%4=0 THEN m END) AS VARCHAR),
      |                  CAST(MAX(CASE WHEN j%4=1 THEN m END) AS VARCHAR),
      |                  CAST(MAX(CASE WHEN j%4=2 THEN m END) AS VARCHAR),
      |                  CAST(MAX(CASE WHEN j%4=3 THEN m END) AS VARCHAR)) AS sig
      | FROM mh GROUP BY doc_id, j//4),
      |mpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
      | FROM bands a JOIN bands b ON a.band=b.band AND a.sig=b.sig AND a.doc_id<b.doc_id
      | GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** G24 oracle: the synchronous ΔQ-greedy Louvain sweeps unrolled as a
    * CTE chain lab0 → lab1 → … (the G19 unrolled-pass precedent: one
    * sweep reads the label frame three ways — current label, community
    * stats, vote join — which a recursive CTE's single self-reference
    * can't express). Every arithmetic step mirrors GraphOps.louvainOf
    * verbatim: BIGINT k_v / Σ_tot / k_{v,c}; ONE shared double gain
    * expression rounded at 6dp and normalized (+ 0.0) so no −0.0 exists
    * to order differently; argmax by (gain DESC, stay-first, community
    * ASC); and the direction-alternation predicate (odd sweeps adopt
    * only smaller labels, even sweeps only larger — the swap-cycle
    * breaker documented at GraphOps.louvainOf).
    *
    * Every CTE is MATERIALIZED: DuckDB INLINES non-recursive CTEs, and
    * each sweep references lab{i−1} six ways — inlined, lab5 expands to
    * ~6⁵ scans of lineitem (measured: the un-hinted form exhausts file
    * descriptors before it finishes); materialized, the chain runs each
    * sweep once, 0.2 s at sf0.001. */
  /** One Louvain level's sweeps as a MATERIALIZED CTE block chain:
    * label frames $lp0 → $lp{sweeps} over arc frame `arcs` and degree
    * frame `deg`; `tag` keeps the kt/kvc/cand/sc names unique across
    * levels. The arithmetic mirrors GraphOps.louvainOf verbatim (the
    * G24 doc above). */
  private def louvainSweepCtes(sweeps: Int, lp: String, arcs: String,
      deg: String, tag: String): String =
    (1 to sweeps).map { i =>
      val p = i - 1
      val dir = if (i % 2 == 1) "cd.c <= l.lbl" else "cd.c >= l.lbl"
      s"""kt$tag$i AS MATERIALIZED (SELECT l.lbl c, SUM(d.kv) ktot
         |  FROM $lp$p l JOIN $deg d ON l.v = d.v GROUP BY 1),
         |kvc$tag$i AS MATERIALIZED (SELECT a.dst v, l.lbl c, SUM(a.w) kvc
         |  FROM $arcs a JOIN $lp$p l ON a.src = l.v GROUP BY 1, 2),
         |cand$tag$i AS MATERIALIZED (SELECT v, c, MAX(kvc) kvc FROM (
         |    SELECT v, c, kvc FROM kvc$tag$i
         |    UNION ALL SELECT v, lbl c, 0 kvc FROM $lp$p) GROUP BY 1, 2),
         |sc$tag$i AS MATERIALIZED (SELECT cd.v, cd.c,
         |    ROUND(CAST(cd.kvc AS DOUBLE)/m.m -
         |      (CAST(kt.ktot - CASE WHEN cd.c = l.lbl THEN d.kv ELSE 0 END AS DOUBLE)/(2*m.m))
         |      * (CAST(d.kv AS DOUBLE)/m.m), 6) + 0.0 AS gain,
         |    CASE WHEN cd.c = l.lbl THEN 0 ELSE 1 END nc
         |  FROM cand$tag$i cd JOIN $lp$p l ON cd.v = l.v JOIN $deg d ON cd.v = d.v
         |    JOIN kt$tag$i kt ON cd.c = kt.c CROSS JOIN m
         |  WHERE $dir),
         |$lp$i AS MATERIALIZED (SELECT v, c lbl FROM (
         |    SELECT v, c, ROW_NUMBER() OVER (PARTITION BY v ORDER BY gain DESC, nc, c) rk
         |    FROM sc$tag$i) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")

  /** Shared base for the Louvain oracles: co-purchase edges, mirrored
    * arcs, degrees, m, identity labels. */
  private val louvainBase: String =
    """WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
      |e AS MATERIALIZED (SELECT a.pk src, b.pk dst, COUNT(*) AS w FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
      |arcs AS MATERIALIZED (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),
      |deg AS MATERIALIZED (SELECT src v, SUM(w) kv FROM arcs GROUP BY 1),
      |m AS MATERIALIZED (SELECT CAST(SUM(w) AS DOUBLE) m FROM e),
      |lab0 AS MATERIALIZED (SELECT v, v lbl FROM deg)""".stripMargin

  private def louvainOracle(sweeps: Int): String =
    s"""$louvainBase,
       |${louvainSweepCtes(sweeps, "lab", "arcs", "deg", "")}
       |SELECT v AS part, lbl AS community FROM lab$sweeps ORDER BY part""".stripMargin

  /** G24b oracle: the level-1 chain, then the textbook contraction
    * (inter-community edges summed, self-loops dropped from the edge
    * frame but kept in the supernode DEGREE via deg2 = summed original
    * degrees, m unchanged), then the same sweep chain on the coarsened
    * frames, and the composed mapping. */
  private def louvainMultiOracle(sweeps: Int): String =
    s"""$louvainBase,
       |${louvainSweepCtes(sweeps, "lab", "arcs", "deg", "")},
       |e2 AS MATERIALIZED (SELECT LEAST(a.lbl, b.lbl) src, GREATEST(a.lbl, b.lbl) dst, SUM(e.w) w
       |  FROM e JOIN lab$sweeps a ON e.src = a.v JOIN lab$sweeps b ON e.dst = b.v
       |  WHERE a.lbl <> b.lbl GROUP BY 1, 2),
       |arcs2 AS MATERIALIZED (SELECT src, dst, w FROM e2 UNION ALL SELECT dst, src, w FROM e2),
       |deg2 AS MATERIALIZED (SELECT l.lbl v, SUM(d.kv) kv FROM lab$sweeps l JOIN deg d ON l.v = d.v GROUP BY 1),
       |l20 AS MATERIALIZED (SELECT v, v lbl FROM deg2),
       |${louvainSweepCtes(sweeps, "l2", "arcs2", "deg2", "b")}
       |SELECT l1.v AS part, lx.lbl AS community
       |FROM lab$sweeps l1 JOIN l2$sweeps lx ON l1.lbl = lx.v ORDER BY part""".stripMargin

  /** G24c oracle (r16): the same sweep chain, with per-sweep statistics
    * read off each label frame — moved = exact changed-label count vs
    * the previous frame; q from the EXACT integer pieces (Σ intra
    * weight, Σ k_tot²) in the ONE shared double expression
    * sw/m − sk2/(4m²), 6dp + 0.0 (summing per-community q_terms would
    * reassociate double addition across engines — the integer pieces
    * cannot). */
  private def louvainTraceOracle(sweeps: Int): String = {
    val rows = (1 to sweeps).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS sweep,
         |  (SELECT COUNT(*) FROM lab$i a JOIN lab${i - 1} b ON a.v = b.v AND a.lbl <> b.lbl) AS moved,
         |  ROUND(CAST((SELECT COALESCE(SUM(e.w), 0) FROM e JOIN lab$i x ON e.src = x.v JOIN lab$i y ON e.dst = y.v WHERE x.lbl = y.lbl) AS DOUBLE)/m.m
         |    - CAST((SELECT COALESCE(SUM(kt*kt), 0) FROM (SELECT SUM(d.kv) kt FROM lab$i l JOIN deg d ON l.v = d.v GROUP BY l.lbl)) AS DOUBLE)/(4.0*m.m*m.m), 6) + 0.0 AS q
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$louvainBase,
       |${louvainSweepCtes(sweeps, "lab", "arcs", "deg", "")}
       |SELECT * FROM (
       |$rows
       |) ORDER BY sweep""".stripMargin
  }

  /** G25 oracle (r16): the FastRP integer chain replayed as MATERIALIZED
    * CTEs — hash-signed {+SCALE, −SCALE, 0} init (density 1/3), `rounds`
    * floor-divided neighbor-sum rounds over the mirrored arcs, unit-weight
    * round sum, unpivoted to (part, dim, val). Every state value is a
    * BIGINT; the only double is the per-round quotient Σx/deg, whose
    * operands are integers < 2⁵³ — the SAME IEEE value in both engines,
    * so floor() agrees bit-for-bit and no 6dp rounding is needed
    * anywhere. MATERIALIZED throughout (the G24 lesson: DuckDB inlines
    * non-recursive CTEs; each round reads its predecessor `dim`+1 ways). */
  private def fastRpOracle(dim: Int, rounds: Int,
      scale: Long = 1000000L): String = {
    val initCols = (0 until dim).map(k =>
      s"CASE CAST(('0x'||substr(md5('frp:'||CAST(src AS VARCHAR)||':$k'),1,15)) AS BIGINT) % 6 " +
      s"WHEN 0 THEN CAST($scale AS BIGINT) WHEN 1 THEN CAST(-$scale AS BIGINT) ELSE CAST(0 AS BIGINT) END AS x$k")
      .mkString(",\n  ")
    val roundCtes = (1 to rounds).map { r =>
      val cols = (0 until dim).map(k =>
        s"CAST(floor(CAST(SUM(x.x$k) AS DOUBLE)/CAST(d.deg AS DOUBLE)) AS BIGINT) AS x$k")
        .mkString(",\n  ")
      s"""fx$r AS MATERIALIZED (SELECT a.dst AS v,
         |  $cols
         |  FROM arcs a JOIN fx${r - 1} x ON x.v = a.src JOIN deg d ON d.src = a.dst
         |  GROUP BY a.dst, d.deg)""".stripMargin
    }.mkString(",\n")
    val embCols = (0 until dim).map(k =>
      (1 to rounds).map(r => s"fx$r.x$k").mkString(" + ") + s" AS x$k")
      .mkString(",\n  ")
    val joins = (2 to rounds).map(r => s"JOIN fx$r ON fx1.v = fx$r.v").mkString(" ")
    val unpivot = (0 until dim).map(k =>
      s"SELECT v AS part, CAST($k AS BIGINT) AS dim, x$k AS val FROM emb")
      .mkString("\n  UNION ALL ")
    s"""WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
       |e AS MATERIALIZED (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
       |arcs AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM arcs GROUP BY src),
       |fx0 AS MATERIALIZED (SELECT src AS v,
       |  $initCols
       |  FROM deg),
       |$roundCtes,
       |emb AS MATERIALIZED (SELECT fx1.v AS v,
       |  $embCols
       |  FROM fx1 $joins)
       |$unpivot
       |ORDER BY part, dim""".stripMargin
  }

  /** DuckDB-dialect equivalents of `queries`, same column names (driver
    * compares after sorting columns by name). Money sums go through
    * DECIMAL(18,6) on both engines so results are bit-identical. */
  def oracleSql: Map[String, String] = Map(
    "g_louvain" -> louvainOracle(5),
    "g_louvain_multi" -> louvainMultiOracle(5),
    "g_louvain_trace" -> louvainTraceOracle(5),
    "g_fastrp" -> fastRpOracle(8, 3),
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*), 4) AS avg_qty,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*), 4) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_product_search" ->
      """SELECT p_partkey, p_name, p_retailprice, score FROM (
        | SELECT p_partkey, p_name, p_retailprice,
        |  (CASE WHEN contains(lower(p_name),'red') THEN 1 ELSE 0 END
        |   + CASE WHEN contains(lower(p_name),'bolt') THEN 1 ELSE 0 END) AS score
        | FROM part) t WHERE score >= 1
        |ORDER BY score DESC, p_partkey LIMIT 10""".stripMargin,
    "q_fuzzy_search" ->
      """WITH toks AS (
        | SELECT p_partkey, p_name, p_retailprice, tok FROM (
        |  SELECT p_partkey, p_name, p_retailprice,
        |   unnest(string_split_regex(lower(p_name), '[^a-z]+')) AS tok
        |  FROM part) WHERE tok <> ''
        |), d AS (
        | SELECT p_partkey, MIN(p_name) AS p_name,
        |  MIN(p_retailprice) AS p_retailprice,
        |  MIN(levenshtein(tok, 'bolte')) AS d0,
        |  MIN(levenshtein(tok, 'gizmmo')) AS d1
        | FROM toks GROUP BY p_partkey
        |)
        |SELECT p_partkey, p_name, p_retailprice,
        | CAST((CASE WHEN d0<=2 THEN 1 ELSE 0 END)
        |     + (CASE WHEN d1<=2 THEN 1 ELSE 0 END) AS BIGINT) AS terms_matched,
        | CAST((CASE WHEN d0<=2 THEN d0 ELSE 0 END)
        |     + (CASE WHEN d1<=2 THEN d1 ELSE 0 END) AS BIGINT) AS total_dist
        |FROM d
        |WHERE (CASE WHEN d0<=2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN d1<=2 THEN 1 ELSE 0 END) >= 1
        |ORDER BY terms_matched DESC, total_dist ASC, p_partkey LIMIT 10""".stripMargin,
    "q_category_search" ->
      """SELECT p_partkey, p_name, p_type, p_retailprice FROM part
        |WHERE contains(lower(p_type), 'small') ORDER BY p_partkey""".stripMargin,
    "q_broad_search" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_partkey LIMIT 10""".stripMargin,
    "q_catalog_page" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_partkey > 100 ORDER BY p_partkey LIMIT 10""".stripMargin,
    // Product BM25: the same Okapi formulation (and float-parity rules)
    // as t_bm25, over p_name tokens with query terms red/bolt.
    "q_product_bm25" ->
      """WITH d AS (SELECT p_partkey, p_name, string_split(lower(p_name),' ') w FROM part),
        |dd AS (SELECT p_partkey, p_name, CAST(len(w) AS DOUBLE) dl, w FROM d),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) n,
        |        CAST(SUM(len(w)) AS DOUBLE)/COUNT(*) avgdl FROM d),
        |tf AS (SELECT p_partkey, p_name, dl, wrd, CAST(COUNT(*) AS DOUBLE) tf
        |       FROM (SELECT p_partkey, p_name, dl, unnest(w) wrd FROM dd) x
        |       WHERE wrd IN ('red','bolt') GROUP BY p_partkey, p_name, dl, wrd),
        |dfx AS (SELECT wrd, CAST(COUNT(*) AS DOUBLE) df FROM tf GROUP BY wrd),
        |ts AS (SELECT t.p_partkey, t.p_name,
        |        ROUND(ln((st.n - dfx.df + 0.5)/(dfx.df + 0.5) + 1.0)
        |          * (t.tf * 2.2)
        |          / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / st.avgdl)), 6) term_score
        |       FROM tf t JOIN dfx ON t.wrd = dfx.wrd CROSS JOIN st)
        |SELECT p_partkey, p_name,
        |  ROUND(CAST(SUM(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE), 6) AS bm25,
        |  COUNT(*) AS n_terms
        |FROM ts GROUP BY p_partkey, p_name
        |ORDER BY bm25 DESC, p_partkey LIMIT 10""".stripMargin,
    "q_product_by_sku" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part WHERE p_partkey = 42""".stripMargin,
    "q_customer_list" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM customer ORDER BY c_custkey DESC""".stripMargin,
    "q_order_form" ->
      """SELECT p_partkey AS sku, p_name AS name, p_retailprice AS price,
        | p_type AS category
        |FROM part ORDER BY category, name, sku""".stripMargin,
    "q_check_stock" ->
      """WITH m AS (
        | SELECT p_partkey, p_name, p_size,
        |  CASE WHEN contains(lower(p_name), 'red bolt turbo') THEN 1
        |       WHEN contains(lower(p_name),'red') AND contains(lower(p_name),'bolt') THEN 2
        |       WHEN contains(lower(p_name),'red') THEN 3 END AS stage
        | FROM part)
        |SELECT stage, p_partkey, p_name, p_size*10 AS stock_qty
        |FROM m WHERE stage = (SELECT MIN(stage) FROM m WHERE stage IS NOT NULL)
        |ORDER BY p_partkey LIMIT 1""".stripMargin,
    "q_user_orders" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice,
        | l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey = 42
        |ORDER BY o_orderdate DESC, o_orderkey, l_linenumber""".stripMargin,
    "q_all_orders" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate, o_totalprice,
        | l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY o_orderdate DESC, o_orderkey, l_linenumber""".stripMargin,
    "q_order_status_counts" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_amount
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_cancel_eligible" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders
        |WHERE o_custkey = 42 AND o_orderstatus IN ('O','P')
        |ORDER BY o_orderkey""".stripMargin,
    "q_top_customers" ->
      """SELECT c_custkey, c_name, revenue, n_orders FROM (
        | SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |        COUNT(*) AS n_orders
        | FROM orders GROUP BY o_custkey) j JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q_revenue_by_category" ->
      """SELECT p_type,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    // R28 merges decimal partials exactly, so the full-table SQL is its
    // oracle too (verbatim R10)
    "q_mv_incremental" ->
      """SELECT p_type,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q_top_products" ->
      """SELECT p_partkey, p_name, total_qty, revenue FROM (
        | SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
        |        CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        | FROM lineitem GROUP BY l_partkey) a JOIN part ON l_partkey = p_partkey
        |ORDER BY total_qty DESC, p_partkey LIMIT 10""".stripMargin,
    "q_region_revenue" ->
      """SELECT r_name,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        | JOIN customer ON o_custkey=c_custkey
        | JOIN nation ON c_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_segment_stats" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal,
        | ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*),4) AS avg_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_order_priority_dist" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_running_revenue" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey < 20
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_top_per_category" ->
      """SELECT p_type, rn, p_partkey, p_name, total_qty FROM (
        | SELECT p_type, p_partkey, p_name, total_qty,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY p_type ORDER BY total_qty DESC, p_partkey) AS BIGINT) rn
        | FROM (SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) total_qty
        |       FROM lineitem GROUP BY l_partkey) a
        | JOIN part ON l_partkey = p_partkey) t
        |WHERE rn <= 3 ORDER BY p_type, rn""".stripMargin,
    "q_cohort_retention" ->
      """SELECT cohort_month, order_month, COUNT(DISTINCT o_custkey) AS n_active FROM (
        | SELECT o.o_custkey, f.cohort_month, date_trunc('month', o.o_orderdate) AS order_month
        | FROM orders o JOIN (
        |   SELECT o_custkey ck, date_trunc('month', MIN(o_orderdate)) cohort_month
        |   FROM orders GROUP BY o_custkey) f
        | ON o.o_custkey = f.ck) t
        |GROUP BY cohort_month, order_month ORDER BY cohort_month, order_month""".stripMargin,
    "q_order_percentiles" ->
      """SELECT c_mktsegment,
        | ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        | ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_nation_trade" ->
      """SELECT supp_nation, cust_nation, l_year,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM (
        | SELECT n1.n_name supp_nation, n2.n_name cust_nation,
        |        CAST(year(l_shipdate) AS INTEGER) l_year, l_extendedprice, l_discount
        | FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |  JOIN supplier ON l_suppkey=s_suppkey
        |  JOIN nation n1 ON s_nationkey=n1.n_nationkey
        |  JOIN customer ON o_custkey=c_custkey
        |  JOIN nation n2 ON c_nationkey=n2.n_nationkey
        | WHERE (n1.n_name='NATION_1' AND n2.n_name='NATION_2')
        |    OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1')) t
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_market_share" ->
      """SELECT o_year, nation_revenue, total_revenue,
        | ROUND(nation_revenue/total_revenue, 6) AS mkt_share
        |FROM (
        | SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(CASE WHEN sn='NATION_3' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END
        |                AS DECIMAL(18,6))) AS DOUBLE) AS nation_revenue,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        | FROM (
        |  SELECT n1.n_name sn, o_orderdate, l_extendedprice, l_discount
        |  FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |   JOIN supplier ON l_suppkey=s_suppkey
        |   JOIN nation n1 ON s_nationkey=n1.n_nationkey
        |   JOIN customer ON o_custkey=c_custkey
        |   JOIN nation n2 ON c_nationkey=n2.n_nationkey
        |   JOIN region ON n2.n_regionkey=r_regionkey
        |  WHERE r_name='ASIA') t
        | GROUP BY 1) t2 ORDER BY o_year""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines,
        | CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
        |FROM lineitem JOIN supplier ON l_suppkey=s_suppkey
        | JOIN nation ON s_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_cube_revenue" ->
      """SELECT c_mktsegment, o_orderpriority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders,
        | CAST(GROUPING(c_mktsegment, o_orderpriority) AS BIGINT) AS gid
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)
        |ORDER BY gid, c_mktsegment ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_segment_status_pivot" ->
      """SELECT c_mktsegment,
        | COUNT(*) FILTER (WHERE o_orderstatus='F') AS n_f,
        | COUNT(*) FILTER (WHERE o_orderstatus='O') AS n_o,
        | COUNT(*) FILTER (WHERE o_orderstatus='P') AS n_p
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // Unpivot mirror: enumerating segment × status keeps the zero-count
    // cells the wide form materializes, so pivot∘unpivot is the identity.
    "q_segment_status_unpivot" ->
      """SELECT c_mktsegment, st AS o_orderstatus,
        | COUNT(*) FILTER (WHERE o_orderstatus = st) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |CROSS JOIN (SELECT unnest(['F','O','P']) st) s
        |GROUP BY c_mktsegment, st ORDER BY c_mktsegment, st""".stripMargin,
    "t_vocab" ->
      """WITH w AS (SELECT unnest(string_split(lower(text),' ')) wrd FROM documents),
        |c AS (SELECT wrd, COUNT(*) tf FROM w GROUP BY wrd),
        |tot AS (SELECT SUM(tf) tot FROM c),
        |top AS (SELECT wrd, tf FROM c ORDER BY tf DESC, wrd LIMIT 100)
        |SELECT wrd, tf,
        | CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, wrd) AS BIGINT) AS rk,
        | ROUND(CAST(SUM(tf) OVER (ORDER BY tf DESC, wrd ROWS UNBOUNDED PRECEDING) AS DOUBLE)/tot, 6) AS cum_coverage
        |FROM top, tot ORDER BY rk""".stripMargin,
    // BM25: identical literal constants and arithmetic shape both engines;
    // per-term scores round to 6 then sum through DECIMAL.
    "t_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |dd AS (SELECT doc_id, CAST(len(w) AS DOUBLE) dl, w FROM d),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) n,
        |        CAST(SUM(len(w)) AS DOUBLE)/COUNT(*) avgdl FROM d),
        |tf AS (SELECT doc_id, dl, wrd, CAST(COUNT(*) AS DOUBLE) tf
        |       FROM (SELECT doc_id, dl, unnest(w) wrd FROM dd) x
        |       WHERE wrd IN ('spark','data','table') GROUP BY doc_id, dl, wrd),
        |dfx AS (SELECT wrd, CAST(COUNT(*) AS DOUBLE) df FROM tf GROUP BY wrd),
        |ts AS (SELECT t.doc_id,
        |        ROUND(ln((st.n - dfx.df + 0.5)/(dfx.df + 0.5) + 1.0)
        |          * (t.tf * 2.2)
        |          / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / st.avgdl)), 6) term_score
        |       FROM tf t JOIN dfx ON t.wrd = dfx.wrd CROSS JOIN st)
        |SELECT doc_id,
        |  ROUND(CAST(SUM(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE), 6) AS bm25,
        |  COUNT(*) AS n_terms
        |FROM ts GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,
    // Quality tiers: quartile cuts round to 4dp (the quality score's own
    // precision) to absorb interpolation-order float diff, as in R18.
    "t_quality_tiers" ->
      """WITH q AS (
        | SELECT doc_id,
        |  ROUND(CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of','and'))) AS DOUBLE)
        |     / len(string_split(lower(text),' '))
        |   - CAST(length(regexp_replace(text,'[^.,;:!?]','','g')) AS DOUBLE) / length(text)
        |   + LEAST(1.0, CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0), 4) AS quality
        | FROM documents),
        |c AS (SELECT ROUND(quantile_cont(quality, 0.25), 4) c1,
        |             ROUND(quantile_cont(quality, 0.5), 4) c2,
        |             ROUND(quantile_cont(quality, 0.75), 4) c3 FROM q)
        |SELECT doc_id, quality,
        | CAST(CASE WHEN quality > c3 THEN 4 WHEN quality > c2 THEN 3
        |           WHEN quality > c1 THEN 2 ELSE 1 END AS BIGINT) AS tier
        |FROM q CROSS JOIN c ORDER BY doc_id""".stripMargin,
    "t_tfidf_keywords" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(lower(text),' ')) wrd FROM documents),
        |tf AS (SELECT doc_id, wrd, COUNT(*) tf FROM w GROUP BY 1,2),
        |dfx AS (SELECT wrd, CAST(COUNT(*) AS DOUBLE) df FROM tf GROUP BY wrd),
        |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) nd FROM documents),
        |sc AS (SELECT t.doc_id, t.wrd, t.tf, ROUND(t.tf * log10(nd.nd / dfx.df), 6) score
        |       FROM tf t JOIN dfx ON t.wrd = dfx.wrd CROSS JOIN nd),
        |rk AS (SELECT *, CAST(ROW_NUMBER() OVER
        |         (PARTITION BY doc_id ORDER BY score DESC, wrd) AS BIGINT) rk FROM sc)
        |SELECT doc_id, wrd, tf, score, rk FROM rk WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    // Unigram logprob: per-word logprob rounds to 6, per-row term rounds
    // to 6 and sums through DECIMAL (order-independent). The mean stays
    // un-rounded — exact decimal sum + one IEEE division is bit-identical
    // on both engines, while ROUND at a .5 tie is not (sf0.001 probe).
    "t_unigram_logprob" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(lower(text),' ')) wrd FROM documents),
        |tf AS (SELECT doc_id, wrd, COUNT(*) tf FROM w GROUP BY 1,2),
        |wf AS (SELECT wrd, SUM(tf) cf FROM tf GROUP BY wrd),
        |tot AS (SELECT CAST(SUM(cf) AS DOUBLE) tot FROM wf),
        |t AS (SELECT tf.doc_id, tf.tf,
        |        CAST(ROUND(tf.tf * ROUND(log10(CAST(wf.cf AS DOUBLE)/tot.tot), 6), 6)
        |          AS DECIMAL(18,6)) term
        |      FROM tf JOIN wf ON tf.wrd = wf.wrd CROSS JOIN tot)
        |SELECT doc_id,
        |  CAST(SUM(term) AS DOUBLE)/CAST(SUM(tf) AS BIGINT) AS mean_logprob,
        |  CAST(SUM(tf) AS BIGINT) AS n_tokens
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Bigram logprob: same float discipline as the unigram oracle —
    // 6dp terms, DECIMAL sum, un-rounded final division.
    "t_bigram_logprob" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1,len(w)),
        |         i -> {'w1': w[i], 's': w[i]||' '||w[i+1]})) u
        |       FROM d WHERE len(w) >= 2),
        |tf AS (SELECT doc_id, u.w1 w1, u.s s, COUNT(*) tf FROM bg GROUP BY 1,2,3),
        |cf AS (SELECT s, SUM(tf) cf FROM tf GROUP BY s),
        |c1 AS (SELECT w1, SUM(tf) c1 FROM tf GROUP BY w1),
        |t AS (SELECT tf.doc_id, tf.tf,
        |        CAST(ROUND(tf.tf * ROUND(log10(CAST(cf.cf AS DOUBLE)/CAST(c1.c1 AS DOUBLE)), 6), 6)
        |          AS DECIMAL(18,6)) term
        |      FROM tf JOIN cf ON tf.s = cf.s JOIN c1 ON tf.w1 = c1.w1)
        |SELECT doc_id,
        |  CAST(SUM(term) AS DOUBLE)/CAST(SUM(tf) AS BIGINT) AS mean_logprob,
        |  CAST(SUM(tf) AS BIGINT) AS n_bigrams
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Kneser-Ney bigram: the same bigram-count frame feeds prefix totals
    // + distinct-successor counts (one GROUP BY w1) and the continuation
    // counts (GROUP BY w2); N1+(..) = SUM(n1w1). The P expression is
    // written in the exact operation order of the Spark column —
    // (cf−D)/c1 + D·n1w1/c1·(n1w2/n1all) — then the T11 float
    // discipline: 6dp log term, tf-scaled re-round, DECIMAL sum.
    "t_kn_logprob" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1,len(w)),
        |         i -> {'w1': w[i], 'w2': w[i+1]})) u
        |       FROM d WHERE len(w) >= 2),
        |tf AS (SELECT doc_id, u.w1 w1, u.w2 w2, COUNT(*) tf FROM bg GROUP BY 1,2,3),
        |cf AS (SELECT w1, w2, SUM(tf) cf FROM tf GROUP BY 1,2),
        |pre AS (SELECT w1, SUM(cf) c1, COUNT(*) n1w1 FROM cf GROUP BY w1),
        |suf AS (SELECT w2, COUNT(*) n1w2 FROM cf GROUP BY w2),
        |tot AS (SELECT CAST(SUM(n1w1) AS DOUBLE) n1all FROM pre),
        |t AS (SELECT tf.doc_id, tf.tf,
        |        CAST(ROUND(tf.tf * ROUND(log10(
        |          (CAST(cf.cf AS DOUBLE) - 0.75) / CAST(pre.c1 AS DOUBLE) +
        |          0.75 * CAST(pre.n1w1 AS DOUBLE) / CAST(pre.c1 AS DOUBLE) *
        |          (CAST(suf.n1w2 AS DOUBLE) / tot.n1all)), 6), 6)
        |          AS DECIMAL(18,6)) term
        |      FROM tf JOIN cf ON tf.w1 = cf.w1 AND tf.w2 = cf.w2
        |        JOIN pre ON tf.w1 = pre.w1 JOIN suf ON tf.w2 = suf.w2
        |        CROSS JOIN tot)
        |SELECT doc_id,
        |  CAST(SUM(term) AS DOUBLE)/CAST(SUM(tf) AS BIGINT) AS mean_logprob,
        |  CAST(SUM(tf) AS BIGINT) AS n_bigrams
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // T19c (r16): the trigram KN chain — the T19 oracle extended one
    // level: trigram types via the same GROUP BY ladder (cf3 → ctx →
    // continuation cc → mid), the bigram continuation floor re-derived
    // from bigram TYPES (bcf: COUNT(*) = T19's Σ n1w1 ≡ n1all), and the
    // single recursive P expression mirroring TextOps.kn3P verbatim.
    "t_kn3_logprob" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |tg AS (SELECT doc_id, unnest(list_transform(range(1,len(w)-1),
        |         i -> {'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]})) u
        |       FROM d WHERE len(w) >= 3),
        |tf AS (SELECT doc_id, u.w1 w1, u.w2 w2, u.w3 w3, COUNT(*) tf FROM tg GROUP BY 1,2,3,4),
        |cf3 AS (SELECT w1, w2, w3, SUM(tf) c3 FROM tf GROUP BY 1,2,3),
        |ctx AS (SELECT w1, w2, SUM(c3) c12, COUNT(*) n12 FROM cf3 GROUP BY 1,2),
        |cc AS (SELECT w2, w3, COUNT(*) cc23 FROM cf3 GROUP BY 1,2),
        |mid AS (SELECT w2, SUM(cc23) ccmid, COUNT(*) nsucc2 FROM cc GROUP BY 1),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1,len(w)),
        |         i -> {'w1': w[i], 'w2': w[i+1]})) u
        |       FROM d WHERE len(w) >= 2),
        |bcf AS (SELECT u.w1 w1, u.w2 w2 FROM bg GROUP BY 1,2),
        |suf AS (SELECT w2 w3, COUNT(*) n1w3 FROM bcf GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) n1all FROM bcf),
        |t AS (SELECT tf.doc_id, tf.tf,
        |        CAST(ROUND(tf.tf * ROUND(log10(
        |          (CAST(cf3.c3 AS DOUBLE) - 0.75) / CAST(ctx.c12 AS DOUBLE) +
        |          0.75 * CAST(ctx.n12 AS DOUBLE) / CAST(ctx.c12 AS DOUBLE) * (
        |            (CAST(cc.cc23 AS DOUBLE) - 0.75) / CAST(mid.ccmid AS DOUBLE) +
        |            0.75 * CAST(mid.nsucc2 AS DOUBLE) / CAST(mid.ccmid AS DOUBLE) *
        |            (CAST(suf.n1w3 AS DOUBLE) / tot.n1all))), 6), 6)
        |          AS DECIMAL(18,6)) term
        |      FROM tf JOIN cf3 ON tf.w1 = cf3.w1 AND tf.w2 = cf3.w2 AND tf.w3 = cf3.w3
        |        JOIN ctx ON tf.w1 = ctx.w1 AND tf.w2 = ctx.w2
        |        JOIN cc ON tf.w2 = cc.w2 AND tf.w3 = cc.w3
        |        JOIN mid ON tf.w2 = mid.w2
        |        JOIN suf ON tf.w3 = suf.w3
        |        CROSS JOIN tot)
        |SELECT doc_id,
        |  CAST(SUM(term) AS DOUBLE)/CAST(SUM(tf) AS BIGINT) AS mean_logprob,
        |  CAST(SUM(tf) AS BIGINT) AS n_trigrams
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Naive-Bayes quality classifier: class-conditional word counts in
    // one aggregate, add-one smoothing, 6dp logodds terms through the
    // DECIMAL sum, prior added in the final rounded double.
    "t_quality_classifier" ->
      """WITH toks AS (SELECT doc_id, source IN ('src0','src1','src2') pos,
        |         unnest(string_split(lower(text),' ')) wrd FROM documents),
        |tf AS (SELECT doc_id, pos, wrd, COUNT(*) tf FROM toks GROUP BY 1,2,3),
        |wf AS (SELECT wrd, SUM(CASE WHEN pos THEN tf ELSE 0 END) cpos,
        |              SUM(CASE WHEN NOT pos THEN tf ELSE 0 END) cneg
        |       FROM tf GROUP BY wrd),
        |docs AS (SELECT SUM(CASE WHEN source IN ('src0','src1','src2') THEN 1 ELSE 0 END) npos,
        |                SUM(CASE WHEN source IN ('src0','src1','src2') THEN 0 ELSE 1 END) nneg
        |         FROM documents),
        |st AS (SELECT SUM(cpos) tpos, SUM(cneg) tneg, COUNT(*) v FROM wf),
        |pr AS (SELECT log10(CAST(npos AS DOUBLE)/CAST(nneg AS DOUBLE)) lp_prior FROM docs),
        |lo AS (SELECT wrd,
        |         ROUND(log10(CAST(cpos + 1 AS DOUBLE)/CAST(tpos + v AS DOUBLE)) -
        |               log10(CAST(cneg + 1 AS DOUBLE)/CAST(tneg + v AS DOUBLE)), 6) logodds
        |       FROM wf CROSS JOIN st),
        |t AS (SELECT tf.doc_id, tf.tf,
        |        CAST(ROUND(tf.tf * lo.logodds, 6) AS DECIMAL(18,6)) term
        |      FROM tf JOIN lo ON tf.wrd = lo.wrd)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  ROUND(pr.lp_prior + CAST(SUM(term) AS DOUBLE), 6) AS score,
        |  ROUND(pr.lp_prior + CAST(SUM(term) AS DOUBLE), 6) > 0 AS pred_quality
        |FROM t CROSS JOIN pr GROUP BY doc_id, pr.lp_prior ORDER BY doc_id""".stripMargin,
    // More-like-this: same df-capped bigram sets as the Jaccard family,
    // fixed query doc 42, |∩| over the distinct capped shingles.
    "t_more_like_this" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1,len(w)), i -> w[i]||' '||w[i+1])) s
        |       FROM d WHERE len(w) >= 2),
        |rare AS (SELECT s FROM sh0 GROUP BY s
        |         HAVING COUNT(*) <= 0.2 * (SELECT COUNT(*) FROM documents)),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare ON sh0.s = rare.s),
        |sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |q AS (SELECT s FROM sh WHERE doc_id = 42),
        |qn AS (SELECT COUNT(*) qn FROM q),
        |ni AS (SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) n_shared
        |       FROM sh JOIN q ON sh.s = q.s WHERE sh.doc_id <> 42 GROUP BY sh.doc_id)
        |SELECT ni.doc_id, ni.n_shared,
        |  ROUND(CAST(ni.n_shared AS DOUBLE)/(sz.n + qn.qn - ni.n_shared), 6) AS jacc
        |FROM ni JOIN sz ON ni.doc_id = sz.doc_id CROSS JOIN qn
        |ORDER BY jacc DESC, ni.doc_id LIMIT 10""".stripMargin,
    // CCNet tercile buckets over the T11 score: the rank replay is a
    // plain ROW_NUMBER window (exact semantics of Ranking.rowNumberWithin,
    // which the Spark side computes without a per-group window); bucket
    // edges are integer comparisons (3·rk vs n) — no division to round.
    "t_ppl_buckets" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(lower(text),' ')) wrd FROM documents),
        |tf AS (SELECT doc_id, wrd, COUNT(*) tf FROM w GROUP BY 1,2),
        |wf AS (SELECT wrd, SUM(tf) cf FROM tf GROUP BY wrd),
        |tot AS (SELECT CAST(SUM(cf) AS DOUBLE) tot FROM wf),
        |t AS (SELECT tf.doc_id, tf.tf,
        |        CAST(ROUND(tf.tf * ROUND(log10(CAST(wf.cf AS DOUBLE)/tot.tot), 6), 6)
        |          AS DECIMAL(18,6)) term
        |      FROM tf JOIN wf ON tf.wrd = wf.wrd CROSS JOIN tot),
        |lp AS (SELECT doc_id, CAST(SUM(term) AS DOUBLE)/CAST(SUM(tf) AS BIGINT) mean_logprob
        |       FROM t GROUP BY doc_id),
        |j AS (SELECT lp.doc_id, d.lang, lp.mean_logprob
        |      FROM lp JOIN documents d ON lp.doc_id = d.doc_id),
        |n AS (SELECT lang, COUNT(*) n FROM j GROUP BY lang),
        |r AS (SELECT j.doc_id, j.lang, j.mean_logprob, n.n,
        |        ROW_NUMBER() OVER (PARTITION BY j.lang
        |          ORDER BY j.mean_logprob DESC, j.doc_id) rk
        |      FROM j JOIN n ON j.lang = n.lang)
        |SELECT doc_id, lang, mean_logprob,
        |  CASE WHEN rk*3 <= n THEN 'head'
        |       WHEN rk*3 <= n*2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    "s_attribution" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts, event_type FROM events),
        |v AS (SELECT user_id vu, event_id view_id, ts vts FROM e WHERE event_type='view'),
        |p AS (SELECT user_id pu, event_id purchase_id, ts pts FROM e WHERE event_type='purchase')
        |SELECT pu AS user_id, purchase_id, pts, view_id, vts
        |FROM p JOIN v ON pu=vu AND vts <= pts AND vts >= pts - INTERVAL 1 HOUR
        |ORDER BY user_id, purchase_id, view_id""".stripMargin,
    // Outer attribution: NULLS FIRST pinned explicitly — Spark sorts
    // nulls first by default, DuckDB last.
    "s_attribution_outer" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts, event_type FROM events),
        |v AS (SELECT user_id vu, event_id view_id, ts vts FROM e WHERE event_type='view'),
        |p AS (SELECT user_id pu, event_id purchase_id, ts pts FROM e WHERE event_type='purchase')
        |SELECT pu AS user_id, purchase_id, pts, view_id, vts
        |FROM p LEFT JOIN v ON pu=vu AND vts <= pts AND vts >= pts - INTERVAL 1 HOUR
        |ORDER BY user_id, purchase_id, view_id ASC NULLS FIRST""".stripMargin,
    "t_lang_id" ->
      """SELECT doc_id, en_hits, de_hits, fr_hits,
        | CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
        |      WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
        |      WHEN fr_hits > 0 THEN 'fr' ELSE 'und' END AS pred_lang, lang
        |FROM (
        | SELECT doc_id, lang,
        |  len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of'))) AS en_hits,
        |  len(list_filter(string_split(lower(text),' '), w -> w IN ('der','die','und'))) AS de_hits,
        |  len(list_filter(string_split(lower(text),' '), w -> w IN ('le','la','et'))) AS fr_hits
        | FROM documents) t ORDER BY doc_id""".stripMargin,
    "t_quality_score" ->
      """SELECT doc_id, len_chars, n_words, n_punct, stop_hits,
        | ROUND(CAST(stop_hits AS DOUBLE)/n_words - CAST(n_punct AS DOUBLE)/len_chars
        |   + LEAST(1.0, CAST(n_words AS DOUBLE)/100.0), 4) AS quality
        |FROM (
        | SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars,
        |  CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(text,'[^.,;:!?]','','g')) AS BIGINT) AS n_punct,
        |  CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS stop_hits
        | FROM documents) t ORDER BY doc_id""".stripMargin,
    "t_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(text),' +')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text,'[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(string_split(lower(text),' '))),' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_hash_sample" ->
      """SELECT doc_id, lang, text FROM documents
        |WHERE CAST(('0x'||substr(md5('sample:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 20
        |ORDER BY doc_id""".stripMargin,
    "t_stratified_sample" ->
      """SELECT lang, rk, doc_id FROM (
        | SELECT lang, doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY CAST(('0x'||substr(md5('strat:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT), doc_id)
        |   AS BIGINT) rk
        | FROM documents) t
        |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin,
    // T5c: cap = ceil(share·N/#sources); over-cap sources keep their cap
    // lowest hash draws — deterministic, so the kept SET mirrors exactly.
    "t_source_mix" ->
      """WITH cap AS (
        | SELECT CAST(ceil(0.6 * COUNT(*) / COUNT(DISTINCT source)) AS BIGINT) AS cap
        | FROM documents)
        |SELECT source, doc_id FROM (
        | SELECT source, doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY CAST(('0x'||substr(md5('mix:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT), doc_id)
        |   AS BIGINT) rk
        | FROM documents) t, cap
        |WHERE rk <= cap ORDER BY source, doc_id""".stripMargin,
    "d_exact_dedup" ->
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "d_minhash_lsh" -> (s"WITH $minhashPairsCtes\n" +
      """SELECT doc_a, doc_b, n_bands FROM mpairs ORDER BY doc_a, doc_b"""),
    // Near-dup clusters: transitive closure of the (small, sparse)
    // MinHash pair graph — pairwise removal is not transitive; the
    // cluster id is the smallest reachable doc_id, singletons are their
    // own cluster.
    "d_dup_clusters" -> (s"WITH RECURSIVE $minhashPairsCtes,\n" +
      """arcs AS (SELECT doc_a s, doc_b dd FROM mpairs
        |          UNION ALL SELECT doc_b, doc_a FROM mpairs),
        |reach AS (
        |  SELECT s AS node, dd AS r FROM arcs
        |  UNION
        |  SELECT reach.node, arcs.dd FROM reach JOIN arcs ON arcs.s = reach.r
        |),
        |lbl AS (SELECT node, LEAST(node, MIN(r)) lbl FROM reach GROUP BY node)
        |SELECT d.doc_id, COALESCE(l.lbl, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN lbl l ON d.doc_id = l.node
        |ORDER BY d.doc_id""".stripMargin),
    "d_simhash" ->
      """WITH wd AS (SELECT doc_id, unnest(string_split(lower(text),' ')) wrd FROM documents),
        |h AS (SELECT doc_id, CAST(('0x'||substr(md5(wrd),1,8)) AS BIGINT) h_lo,
        |             CAST(('0x'||substr(md5(wrd),9,8)) AS BIGINT) h_hi FROM wd),
        |v AS (SELECT doc_id, i, SUM(CASE WHEN
        |        (CASE WHEN i < 32 THEN h_lo // (1::BIGINT << i)
        |              ELSE h_hi // (1::BIGINT << (i - 32)) END) % 2 = 1
        |        THEN 1 ELSE -1 END) vote
        |      FROM h CROSS JOIN (SELECT unnest(range(0,64)) i) t GROUP BY doc_id, i),
        |fp AS (SELECT doc_id,
        |        CAST(SUM(CASE WHEN vote > 0 AND i < 32 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) fp_lo,
        |        CAST(SUM(CASE WHEN vote > 0 AND i >= 32 THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) fp_hi
        |       FROM v GROUP BY doc_id),
        |bd AS (SELECT doc_id, fp_lo, fp_hi, k,
        |        CASE WHEN k < 2 THEN (fp_lo // (1::BIGINT << CAST(16*k AS INTEGER))) % 65536
        |             ELSE (fp_hi // (1::BIGINT << CAST(16*(k-2) AS INTEGER))) % 65536 END bv
        |       FROM fp CROSS JOIN (SELECT unnest(range(0,4)) k) t)
        |SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b,
        | CAST(bit_count(xor(a.fp_lo, b.fp_lo)) + bit_count(xor(a.fp_hi, b.fp_hi)) AS BIGINT) hamming
        |FROM bd a JOIN bd b ON a.k=b.k AND a.bv=b.bv AND a.doc_id<b.doc_id
        |WHERE bit_count(xor(a.fp_lo,b.fp_lo)) + bit_count(xor(a.fp_hi,b.fp_hi)) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |   unnest(list_transform(range(1,len(w)-3), i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) s
        | FROM d WHERE len(w) >= 5),
        |bsh AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 = 0),
        |tsh AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0)
        |SELECT t.doc_id, CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs,
        |       CAST(COUNT(DISTINCT t.s) AS BIGINT) AS n_shingles_hit
        |FROM tsh t JOIN bsh b ON t.s = b.s
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // D6c emits exactly D6's result (sketch prefilter + exact confirm):
    // same oracle, verbatim.
    "d_decontaminate_bloom" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |   unnest(list_transform(range(1,len(w)-3), i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) s
        | FROM d WHERE len(w) >= 5),
        |bsh AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 = 0),
        |tsh AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0)
        |SELECT t.doc_id, CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs,
        |       CAST(COUNT(DISTINCT t.s) AS BIGINT) AS n_shingles_hit
        |FROM tsh t JOIN bsh b ON t.s = b.s
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // Label centroids: components round to 6dp, sum through DECIMAL,
    // mean = one un-rounded IEEE division (see t_unigram_logprob note).
    "v_label_centroids" ->
      """WITH e AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |xr AS (SELECT label, unnest(list_transform(range(1, len(v)+1),
        |         i -> {'dim': i - 1, 'xd': ROUND(v[i], 6)})) u FROM e),
        |x AS (SELECT label, CAST(u.dim AS BIGINT) dim,
        |        CAST(u.xd AS DECIMAL(18,6)) xd FROM xr)
        |SELECT label, dim,
        |  CAST(SUM(xd) AS DOUBLE)/COUNT(*) AS mean,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    // Cross-dedup: D4's capped-shingle Jaccard, asymmetric new×old split.
    "d_cross_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1,len(w)), i -> w[i]||' '||w[i+1])) s
        |       FROM d WHERE len(w) >= 2),
        |rare AS (SELECT s FROM sh0 GROUP BY s
        |         HAVING COUNT(*) <= 0.2 * (SELECT COUNT(*) FROM documents)),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare ON sh0.s = rare.s),
        |sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |pr AS (SELECT a.doc_id dn, b.doc_id do_, COUNT(*) ni
        |       FROM sh a JOIN sh b ON a.s=b.s
        |       WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7 GROUP BY 1,2)
        |SELECT dn AS doc_new, do_ AS doc_old,
        |  ROUND(CAST(ni AS DOUBLE)/(sa.n+sb.n-ni),6) AS jacc
        |FROM pr JOIN sz sa ON dn=sa.doc_id JOIN sz sb ON do_=sb.doc_id
        |WHERE CAST(ni AS DOUBLE)/(sa.n+sb.n-ni) >= 0.5
        |ORDER BY doc_new, doc_old""".stripMargin,
    // D10: positional 5-grams (NO distinct — repeats count), a position
    // is dup iff its gram occurs >1 time corpus-wide; short docs emit
    // n_grams = 0 via the left join.
    "d_dup_spans" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1,len(w)-3), i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) s
        |      FROM d WHERE len(w) >= 5),
        |pd AS (SELECT doc_id, s, COUNT(*) c FROM g GROUP BY doc_id, s),
        |gl AS (SELECT s, SUM(c) cnt FROM pd GROUP BY s),
        |r AS (SELECT pd.doc_id, SUM(pd.c) gr, SUM(CASE WHEN gl.cnt > 1 THEN pd.c ELSE 0 END) du
        |      FROM pd JOIN gl USING (s) GROUP BY pd.doc_id)
        |SELECT d.doc_id,
        | CAST(COALESCE(r.gr, 0) AS BIGINT) AS n_grams,
        | CAST(COALESCE(r.du, 0) AS BIGINT) AS n_dup,
        | COALESCE(ROUND(CAST(r.du AS DOUBLE)/r.gr, 6), 0.0) AS dup_frac
        |FROM d LEFT JOIN r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // D12: non-overlapping 8-word segments (1-based inclusive list
    // slice ≡ Spark's slice(w, i*8+1, 8), both end-clamped); a segment
    // is boilerplate iff it occurs in ≥2 distinct docs; string_agg
    // skips the removed (NULLed) segments and orders by position, and
    // an all-boilerplate doc rebuilds to '' via the COALESCE.
    "d_line_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(range(0, CAST(ceil(len(w)/8.0) AS BIGINT)),
        |          i -> {'pos': i, 'seg': array_to_string(w[(i*8+1):(i*8+8)], ' ')})) st
        |      FROM d),
        |segs AS (SELECT doc_id, st.pos AS pos, st.seg AS seg FROM g),
        |f AS (SELECT seg FROM (SELECT seg, COUNT(DISTINCT doc_id) df FROM segs GROUP BY seg)
        |      WHERE df >= 2)
        |SELECT s.doc_id,
        | CAST(COUNT(*) AS BIGINT) AS n_segments,
        | CAST(SUM(CASE WHEN f.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        | COALESCE(string_agg(CASE WHEN f.seg IS NULL THEN s.seg END, ' ' ORDER BY s.pos), '') AS clean_text
        |FROM segs s LEFT JOIN f ON s.seg = f.seg
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // Semantic decontamination: train×eval cosine through the same
    // list_transform dot-product shape as d_embedding_neardup.
    "d_decontaminate_semantic" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) nrm FROM e),
        |p AS (SELECT t.vec_id,
        |        ROUND(list_sum(list_transform(range(1,len(t.v)+1), i -> t.v[i]*b.v[i]))/(t.nrm*b.nrm), 6) sim
        |      FROM n t JOIN n b ON t.vec_id % 10 <> 0 AND b.vec_id % 10 = 0)
        |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits, MAX(sim) AS max_sim
        |FROM p WHERE sim >= 0.35 GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "t_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |wn AS (SELECT doc_id, CAST(len(w) AS BIGINT) n_words,
        |        CAST(len(list_distinct(w)) AS BIGINT) n_distinct FROM d),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1,len(w)), i -> w[i]||' '||w[i+1])) s
        |       FROM d WHERE len(w) >= 2),
        |bgc AS (SELECT doc_id, s, COUNT(*) c FROM bg GROUP BY 1,2),
        |bgm AS (SELECT doc_id, MAX(c) max_bg, SUM(c) n_bg FROM bgc GROUP BY doc_id)
        |SELECT w.doc_id AS doc_id, w.n_words,
        |  ROUND(1.0 - CAST(n_distinct AS DOUBLE)/n_words, 6) AS dup_word_frac,
        |  ROUND(CAST(max_bg AS DOUBLE)/n_bg, 6) AS top_bigram_frac
        |FROM wn w JOIN bgm ON w.doc_id = bgm.doc_id ORDER BY w.doc_id""".stripMargin,
    // T16: the Gopher doc-quality rules; integer/double signals only
    // (rule flags as 0/1 BIGINT), bigram mass reuses T6's expression.
    "t_gopher_rules" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |base AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) n_words,
        |  ROUND(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)/len(w), 6) mean_wlen,
        |  ROUND(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)/len(w), 6) frac_alpha,
        |  CAST((CASE WHEN list_contains(w,'the') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(w,'be') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(w,'to') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(w,'and') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(w,'of') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(w,'that') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(w,'have') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(w,'with') THEN 1 ELSE 0 END) AS BIGINT) n_stop
        | FROM d),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1,len(w)), i -> w[i]||' '||w[i+1])) s
        |       FROM d WHERE len(w) >= 2),
        |bgc AS (SELECT doc_id, s, COUNT(*) c FROM bg GROUP BY 1,2),
        |bgm AS (SELECT doc_id, ROUND(CAST(MAX(c) AS DOUBLE)/SUM(c), 6) tbf FROM bgc GROUP BY doc_id),
        |r AS (SELECT b.doc_id, b.n_words, b.mean_wlen, b.frac_alpha, b.n_stop,
        |  COALESCE(m.tbf, 0.0) top_bigram_frac,
        |  CASE WHEN b.n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END r_words,
        |  CASE WHEN b.mean_wlen BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END r_wlen,
        |  CASE WHEN b.frac_alpha >= 0.8 THEN 1 ELSE 0 END r_alpha,
        |  CASE WHEN b.n_stop >= 2 THEN 1 ELSE 0 END r_stop,
        |  CASE WHEN COALESCE(m.tbf, 0.0) <= 0.2 THEN 1 ELSE 0 END r_bigram
        |  FROM base b LEFT JOIN bgm m USING (doc_id))
        |SELECT doc_id, n_words, mean_wlen, frac_alpha, n_stop, top_bigram_frac,
        | CAST(r_words AS BIGINT) AS r_words, CAST(r_wlen AS BIGINT) AS r_wlen,
        | CAST(r_alpha AS BIGINT) AS r_alpha, CAST(r_stop AS BIGINT) AS r_stop,
        | CAST(r_bigram AS BIGINT) AS r_bigram,
        | CAST(5 - r_words - r_wlen - r_alpha - r_stop - r_bigram AS BIGINT) AS n_failed,
        | CAST(CASE WHEN r_words + r_wlen + r_alpha + r_stop + r_bigram = 5 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM r ORDER BY doc_id""".stripMargin,
    // T17: Shannon entropy of the word histogram; T11's float
    // discipline (6dp decimal terms — association-order-free sum).
    "t_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(lower(text),' ')) wrd FROM documents),
        |tf AS (SELECT doc_id, wrd, COUNT(*) tf FROM t GROUP BY 1,2),
        |n AS (SELECT doc_id, SUM(tf) n_words, COUNT(*) n_distinct FROM tf GROUP BY doc_id),
        |tm AS (SELECT tf.doc_id,
        |         SUM(CAST(ROUND(tf.tf * ln(CAST(tf.tf AS DOUBLE)/n.n_words), 6) AS DECIMAL(18,6))) tsum
        |       FROM tf JOIN n USING (doc_id) GROUP BY tf.doc_id)
        |SELECT n.doc_id,
        | CAST(n.n_words AS BIGINT) AS n_words,
        | CAST(n.n_distinct AS BIGINT) AS n_distinct,
        | ROUND(-CAST(tsum AS DOUBLE)/n.n_words, 6) AS entropy,
        | ROUND(CASE WHEN n.n_distinct > 1
        |   THEN (-CAST(tsum AS DOUBLE)/n.n_words)/ln(CAST(n.n_distinct AS DOUBLE))
        |   ELSE 0.0 END, 6) AS norm_entropy
        |FROM n JOIN tm USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    // T18: winnowing (k=3 grams, w=4 windows) — rightmost window min
    // via list_position over the reversed slice; 1-based inclusive
    // slices ≡ Spark's slice(hs, j, 4); (doc, pos) is unique (the fp
    // IS hs[pos]) so DISTINCT + the order-by give a total order.
    "t_winnow" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') wds FROM documents),
        |h AS (SELECT doc_id, list_transform(range(1, len(wds) - 1), i ->
        |        CAST(('0x'||substr(md5(wds[i]||' '||wds[i+1]||' '||wds[i+2]),1,15)) AS BIGINT)) hs
        |      FROM d WHERE len(wds) >= 6),
        |u AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) - 2), j ->
        |        {'pos': j + 4 - list_position(list_reverse(hs[j:j+3]), list_min(hs[j:j+3])),
        |         'fp': list_min(hs[j:j+3])})) st
        |      FROM h)
        |SELECT DISTINCT doc_id, CAST(st.pos AS BIGINT) AS pos, st.fp AS fp
        |FROM u ORDER BY doc_id, pos""".stripMargin,
    // T18b: the MOSS pair matcher over the same winnow CTE chain —
    // per-(fp, doc) postings with position extents, df-capped (≤ 10
    // docs per fingerprint), cross-doc equi-join, pairs with ≥ 2
    // distinct shared fingerprints.
    "t_winnow_pairs" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') wds FROM documents),
        |h AS (SELECT doc_id, list_transform(range(1, len(wds) - 1), i ->
        |        CAST(('0x'||substr(md5(wds[i]||' '||wds[i+1]||' '||wds[i+2]),1,15)) AS BIGINT)) hs
        |      FROM d WHERE len(wds) >= 6),
        |u AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) - 2), j ->
        |        {'pos': j + 4 - list_position(list_reverse(hs[j:j+3]), list_min(hs[j:j+3])),
        |         'fp': list_min(hs[j:j+3])})) st
        |      FROM h),
        |w AS (SELECT DISTINCT doc_id, CAST(st.pos AS BIGINT) pos, st.fp fp FROM u),
        |post AS (SELECT fp, doc_id, MIN(pos) lo, MAX(pos) hi FROM w GROUP BY 1, 2),
        |keep AS (SELECT * FROM post QUALIFY COUNT(*) OVER (PARTITION BY fp) <= 10)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared,
        |  MIN(a.lo) AS a_lo, MAX(a.hi) AS a_hi,
        |  MIN(b.lo) AS b_lo, MAX(b.hi) AS b_hi
        |FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // D6d replays the same winnow postings + df-cap, joined across the
    // train/bench boundary (doc_id % 10) instead of the a<b triangle.
    "d_decontaminate_spans" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') wds FROM documents),
        |h AS (SELECT doc_id, list_transform(range(1, len(wds) - 1), i ->
        |        CAST(('0x'||substr(md5(wds[i]||' '||wds[i+1]||' '||wds[i+2]),1,15)) AS BIGINT)) hs
        |      FROM d WHERE len(wds) >= 6),
        |u AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) - 2), j ->
        |        {'pos': j + 4 - list_position(list_reverse(hs[j:j+3]), list_min(hs[j:j+3])),
        |         'fp': list_min(hs[j:j+3])})) st
        |      FROM h),
        |w AS (SELECT DISTINCT doc_id, CAST(st.pos AS BIGINT) pos, st.fp fp FROM u),
        |post AS (SELECT fp, doc_id, MIN(pos) lo, MAX(pos) hi FROM w GROUP BY 1, 2),
        |keep AS (SELECT * FROM post QUALIFY COUNT(*) OVER (PARTITION BY fp) <= 10)
        |SELECT a.doc_id AS train_doc, b.doc_id AS bench_doc,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared,
        |  MIN(a.lo) AS train_lo, MAX(a.hi) AS train_hi,
        |  MIN(b.lo) AS bench_lo, MAX(b.hi) AS bench_hi
        |FROM keep a JOIN keep b ON a.fp = b.fp
        |  AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY train_doc, bench_doc""".stripMargin,
    // D6e replays the winnow chain + df-cap, then EDITS: train positions
    // whose fp a bench doc also selected expand to padded word covers
    // [pos-3, pos+5] (w-1 each side of the k-word gram), and contaminated
    // docs rebuild via the d_line_dedup string_agg pattern; clean docs
    // pass the original text column through untouched.
    "d_decontaminate_rewrite" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') wds FROM documents),
        |h AS (SELECT doc_id, list_transform(range(1, len(wds) - 1), i ->
        |        CAST(('0x'||substr(md5(wds[i]||' '||wds[i+1]||' '||wds[i+2]),1,15)) AS BIGINT)) hs
        |      FROM d WHERE len(wds) >= 6),
        |u AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) - 2), j ->
        |        {'pos': j + 4 - list_position(list_reverse(hs[j:j+3]), list_min(hs[j:j+3])),
        |         'fp': list_min(hs[j:j+3])})) st
        |      FROM h),
        |w AS (SELECT DISTINCT doc_id, CAST(st.pos AS BIGINT) pos, st.fp fp FROM u),
        |cap AS (SELECT fp FROM (SELECT fp, COUNT(DISTINCT doc_id) df FROM w GROUP BY fp) WHERE df <= 10),
        |bf AS (SELECT DISTINCT fp FROM w WHERE doc_id % 10 = 0 AND fp IN (SELECT fp FROM cap)),
        |m AS (SELECT doc_id, pos FROM w WHERE doc_id % 10 <> 0 AND fp IN (SELECT fp FROM bf)),
        |mc AS (SELECT doc_id, COUNT(*) nm FROM m GROUP BY doc_id),
        |rmv AS (SELECT DISTINCT doc_id, unnest(range(greatest(pos - 3, 1), pos + 6)) i FROM m),
        |ow AS (SELECT doc_id, string_split(text, ' ') ws FROM documents
        |       WHERE doc_id IN (SELECT doc_id FROM m)),
        |ww AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
        |         i -> {'i': i, 'wrd': ws[i]})) st FROM ow),
        |wk AS (SELECT ww.doc_id, ww.st.i AS i, ww.st.wrd AS wrd, r.i AS ri
        |       FROM ww LEFT JOIN rmv r ON ww.doc_id = r.doc_id AND ww.st.i = r.i),
        |rb AS (SELECT doc_id,
        |         SUM(CASE WHEN ri IS NOT NULL THEN 1 ELSE 0 END) nr,
        |         COALESCE(string_agg(CASE WHEN ri IS NULL THEN wrd END, ' ' ORDER BY i), '') ct
        |       FROM wk GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(len(string_split(t.text, ' ')) AS BIGINT) AS n_words,
        |  CAST(COALESCE(mc.nm, 0) AS BIGINT) AS n_matched,
        |  CAST(COALESCE(rb.nr, 0) AS BIGINT) AS n_removed,
        |  COALESCE(rb.ct, t.text) AS clean_text
        |FROM documents t LEFT JOIN mc USING (doc_id) LEFT JOIN rb USING (doc_id)
        |WHERE t.doc_id % 10 <> 0 ORDER BY t.doc_id""".stripMargin,
    "t_pii_redact" ->
      """WITH aug AS (SELECT doc_id,
        |  text || CASE WHEN doc_id % 3 = 0 THEN ' Contact user' || CAST(doc_id AS VARCHAR) || '@shop.example.com for details.' ELSE '' END
        |       || CASE WHEN doc_id % 4 = 0 THEN ' Call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.' ELSE '' END AS t
        | FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS red_h
        |FROM aug ORDER BY doc_id""".stripMargin,
    "d_ngram_jaccard" -> ngramJaccardOracle,
    // D4b produces the identical relation through MinHash band candidates
    // + exact re-rank, so the exact-definition SQL is its oracle too.
    "d_ngram_jaccard_lsh" -> ngramJaccardOracle,
    "d_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) nrm FROM e),
        |p AS (SELECT a.vec_id va, b.vec_id vb,
        |   ROUND(list_sum(list_transform(range(1,len(a.v)+1), i -> a.v[i]*b.v[i]))/(a.nrm*b.nrm), 6) sim
        | FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT va AS vec_a, vb AS vec_b, sim FROM p WHERE sim >= 0.35 ORDER BY vec_a, vec_b""".stripMargin,
    // D5b replay: the md5-derived hyperplanes (VectorOps.hyperplanes),
    // 16 bands × 6 sign bits, band-bucket candidates, exact cosine
    // re-rank — bit-for-bit the distributed plan's arithmetic (the
    // 15-hex-char md5 prefix parses via per-digit shifts; plane values
    // and dot products use the same IEEE double ops in the same order).
    "d_embedding_neardup_lsh" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) nrm FROM e),
        |u AS (SELECT vec_id, list_transform(v, x -> x/nrm) uv FROM n),
        |pl AS (SELECT CAST(p AS INT) p, list_transform(range(0,64), i ->
        |        CAST(list_sum(list_transform(range(1,16), c ->
        |          (strpos('0123456789abcdef', substring(md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), CAST(c AS INT), 1))-1)::BIGINT << CAST(4*(15-c) AS INT)
        |        )) % 2001 AS DOUBLE) / 1000.0 - 1.0) plane
        |       FROM range(0,96) t(p)),
        |sb AS (SELECT u.vec_id, pl.p // 6 k,
        |        CASE WHEN list_sum(list_transform(range(1,65), i -> u.uv[CAST(i AS INT)]*pl.plane[CAST(i AS INT)])) >= 0
        |             THEN (1 << CAST(pl.p % 6 AS INT)) ELSE 0 END sbit
        |       FROM u CROSS JOIN pl),
        |sig AS (SELECT vec_id, k, SUM(sbit) bv FROM sb GROUP BY vec_id, k),
        |cand AS (SELECT DISTINCT a.vec_id va, b.vec_id vb FROM sig a
        |         JOIN sig b ON a.k=b.k AND a.bv=b.bv AND a.vec_id<b.vec_id),
        |p2 AS (SELECT c.va, c.vb,
        |        ROUND(list_sum(list_transform(range(1,len(na.v)+1), i -> na.v[i]*nb.v[i]))/(na.nrm*nb.nrm),6) sim
        |       FROM cand c JOIN n na ON na.vec_id=c.va JOIN n nb ON nb.vec_id=c.vb)
        |SELECT va AS vec_a, vb AS vec_b, sim FROM p2 WHERE sim >= 0.35 ORDER BY vec_a, vec_b""".stripMargin,
    // V4 replay: same md5-derived hyperplanes as D5b above but the ANN
    // configuration (16 bands × 8 bits, multi-probe Hamming radius 1
    // within a band), then the exact cosine re-rank and top-5. The
    // sign-bit signatures are deterministic, so the "approximate" path
    // replays exactly — what stays approximate is recall vs V1, which
    // the planted-fixture spec covers.
    "v_lsh_ann" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) nrm FROM e),
        |u AS (SELECT vec_id, list_transform(v, x -> x/nrm) uv FROM n),
        |pl AS (SELECT CAST(p AS INT) p, list_transform(range(0,64), i ->
        |        CAST(list_sum(list_transform(range(1,16), c ->
        |          (strpos('0123456789abcdef', substring(md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), CAST(c AS INT), 1))-1)::BIGINT << CAST(4*(15-c) AS INT)
        |        )) % 2001 AS DOUBLE) / 1000.0 - 1.0) plane
        |       FROM range(0,128) t(p)),
        |sb AS (SELECT u.vec_id, pl.p // 8 k,
        |        CASE WHEN list_sum(list_transform(range(1,65), i -> u.uv[CAST(i AS INT)]*pl.plane[CAST(i AS INT)])) >= 0
        |             THEN (1 << CAST(pl.p % 8 AS INT)) ELSE 0 END sbit
        |       FROM u CROSS JOIN pl),
        |sig AS (SELECT vec_id, k, SUM(sbit) bv FROM sb GROUP BY vec_id, k),
        |qs AS (SELECT k, bv qbv FROM sig WHERE vec_id = 0),
        |cand AS (SELECT DISTINCT s.vec_id FROM sig s JOIN qs ON s.k = qs.k
        |         WHERE s.vec_id <> 0 AND bit_count(xor(s.bv, qs.qbv)) <= 1),
        |q AS (SELECT v qv, nrm qnrm FROM n WHERE vec_id = 0)
        |SELECT n.vec_id,
        |  ROUND(list_sum(list_transform(range(1,len(n.v)+1), i -> n.v[i]*qv[i]))/(n.nrm*qnrm), 6) AS sim
        |FROM n JOIN cand ON n.vec_id = cand.vec_id, q
        |ORDER BY sim DESC, n.vec_id LIMIT 5""".stripMargin,
    // V18 replay: per-dim decimal sums via the 1-based range-index
    // pattern (the established embeddings unnest), float→double→decimal
    // cast chain matching the Spark side exactly.
    "v_embedding_drift" ->
      """WITH x AS (SELECT CAST(i - 1 AS BIGINT) dim,
        |    CASE WHEN vec_id % 2 = 0 THEN 'ref' ELSE 'cur' END side,
        |    CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(28,12)) xd
        |  FROM embeddings, (SELECT unnest(range(1, 65)) i) t),
        |a AS (SELECT dim,
        |    SUM(xd) FILTER (WHERE side = 'ref') s_ref,
        |    COUNT(*) FILTER (WHERE side = 'ref') n_ref,
        |    SUM(xd) FILTER (WHERE side = 'cur') s_cur,
        |    COUNT(*) FILTER (WHERE side = 'cur') n_cur
        |  FROM x GROUP BY dim),
        |m AS (SELECT dim,
        |    ROUND(CAST(s_ref AS DOUBLE) / n_ref, 6) mean_ref,
        |    ROUND(CAST(s_cur AS DOUBLE) / n_cur, 6) mean_cur FROM a),
        |sh AS (SELECT dim, mean_ref, mean_cur,
        |    ROUND(mean_cur - mean_ref, 6) shift FROM m)
        |SELECT dim, mean_ref, mean_cur, shift,
        |  ROUND(sqrt(CAST(SUM(CAST(shift * shift AS DECIMAL(28,12))) OVER () AS DOUBLE)), 6) AS l2_shift
        |FROM sh ORDER BY dim""".stripMargin,
    // V17 replay: the exact leg is V1's relation paneled over the first
    // 8 vectors; the LSH leg replays V4's md5-derived hyperplanes and
    // multi-probe candidates paneled; recall joins the two top-5 sets.
    "v_ann_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) nrm FROM e),
        |u AS (SELECT vec_id, list_transform(v, x -> x/nrm) uv FROM n),
        |q AS (SELECT vec_id query_id, v qv, nrm qnrm FROM n WHERE vec_id < 8),
        |c AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 8),
        |sims AS (SELECT q.query_id, c.vec_id,
        |  ROUND(list_sum(list_transform(range(1,len(c.v)+1), i -> c.v[i]*q.qv[i]))/(c.nrm*q.qnrm), 6) sim
        | FROM c, q),
        |ex AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) rn FROM sims) t WHERE rn <= 5),
        |pl AS (SELECT CAST(p AS INT) p, list_transform(range(0,64), i ->
        |        CAST(list_sum(list_transform(range(1,16), cc ->
        |          (strpos('0123456789abcdef', substring(md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), CAST(cc AS INT), 1))-1)::BIGINT << CAST(4*(15-cc) AS INT)
        |        )) % 2001 AS DOUBLE) / 1000.0 - 1.0) plane
        |       FROM range(0,128) t(p)),
        |sb AS (SELECT u.vec_id, pl.p // 8 k,
        |        CASE WHEN list_sum(list_transform(range(1,65), i -> u.uv[CAST(i AS INT)]*pl.plane[CAST(i AS INT)])) >= 0
        |             THEN (1 << CAST(pl.p % 8 AS INT)) ELSE 0 END sbit
        |       FROM u CROSS JOIN pl),
        |sig AS (SELECT vec_id, k, SUM(sbit) bv FROM sb GROUP BY vec_id, k),
        |qs AS (SELECT vec_id query_id, k, bv qbv FROM sig WHERE vec_id < 8),
        |cand AS (SELECT DISTINCT qs.query_id, s.vec_id FROM sig s JOIN qs ON s.k = qs.k
        |         WHERE s.vec_id >= 8 AND bit_count(xor(s.bv, qs.qbv)) <= 1),
        |lt AS (SELECT query_id, vec_id FROM (
        |  SELECT sims.query_id, sims.vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY sims.query_id ORDER BY sim DESC, sims.vec_id) rn
        |  FROM sims JOIN cand ON sims.query_id = cand.query_id AND sims.vec_id = cand.vec_id) t
        | WHERE rn <= 5),
        |hit AS (SELECT ex.query_id, COUNT(*) n FROM ex
        |        JOIN lt ON ex.query_id = lt.query_id AND ex.vec_id = lt.vec_id
        |        GROUP BY ex.query_id)
        |SELECT qq.query_id, CAST(COALESCE(hit.n, 0) AS BIGINT) AS n_hit,
        |  ROUND(CAST(COALESCE(hit.n, 0) AS DOUBLE) / 5, 4) AS recall
        |FROM (SELECT DISTINCT query_id FROM q) qq LEFT JOIN hit USING (query_id)
        |ORDER BY query_id""".stripMargin,
    // V13 replay: sign bits are a pure function of the store, so the
    // whole "approximate" path replays exactly — pack 32 sign bits per
    // word (lo/hi, the D3 two-half precedent: a 64-bit list_sum rebuild
    // would overflow BIGINT at bit 63), Hamming = popcount of the XORs,
    // candidate budget = 50 best (ham, vec_id), then exact cosine top-5.
    "v_bq_ann" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |sg AS (SELECT vec_id,
        |        CAST(list_sum(list_transform(range(1,33), i ->
        |          CASE WHEN v[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) lo,
        |        CAST(list_sum(list_transform(range(33,65), i ->
        |          CASE WHEN v[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) hi
        |       FROM e),
        |qs AS (SELECT lo qlo, hi qhi FROM sg WHERE vec_id = 0),
        |cand AS (SELECT sg.vec_id,
        |          CAST(bit_count(xor(sg.lo, qs.qlo)) + bit_count(xor(sg.hi, qs.qhi)) AS INT) ham
        |         FROM sg, qs WHERE sg.vec_id <> 0
        |         ORDER BY ham, sg.vec_id LIMIT 50),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) nrm FROM e),
        |q AS (SELECT v qv, nrm qnrm FROM n WHERE vec_id = 0)
        |SELECT n.vec_id, cand.ham,
        |  ROUND(list_sum(list_transform(range(1,len(n.v)+1), i -> n.v[i]*qv[i]))/(n.nrm*qnrm), 6) AS sim
        |FROM n JOIN cand ON n.vec_id = cand.vec_id, q
        |ORDER BY sim DESC, n.vec_id LIMIT 5""".stripMargin,
    // V14 replay: the prefix pass is a slice — v[1:16] cosine, top-50
    // budget with (psim desc, vec_id) tie-break, then the full-width
    // exact re-rank. Deterministic, so it hash-matches like V13.
    "v_matryoshka" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) nrm FROM e),
        |pre AS (SELECT vec_id, v[1:16] pv,
        |         sqrt(list_sum(list_transform(v[1:16], x -> x*x))) pnrm FROM e),
        |qp AS (SELECT pv qpv, pnrm qpnrm FROM pre WHERE vec_id = 0),
        |cand AS (SELECT pre.vec_id,
        |          ROUND(list_sum(list_transform(range(1,17), i -> pre.pv[CAST(i AS INT)]*qp.qpv[CAST(i AS INT)]))/(pre.pnrm*qp.qpnrm), 6) psim
        |         FROM pre, qp WHERE pre.vec_id <> 0
        |         ORDER BY psim DESC, pre.vec_id LIMIT 50),
        |q AS (SELECT v qv, nrm qnrm FROM n WHERE vec_id = 0)
        |SELECT n.vec_id, cand.psim,
        |  ROUND(list_sum(list_transform(range(1,len(n.v)+1), i -> n.v[i]*qv[i]))/(n.nrm*qnrm), 6) AS sim
        |FROM n JOIN cand ON n.vec_id = cand.vec_id, q
        |ORDER BY sim DESC, n.vec_id LIMIT 5""".stripMargin,
    // Hybrid RRF fusion: both legs are the existing t_more_like_this /
    // v_cosine_topk relations at N=20 (query 42); RRF terms round to 6dp
    // DECIMAL before the sum so the fused ranking is engine-identical.
    // 1.0 must be cast to DOUBLE (a bare 1.0 is DECIMAL in DuckDB and
    // DECIMAL/BIGINT division is not IEEE).
    "v_hybrid_search" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text),' ') w FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1,len(w)), i -> w[i]||' '||w[i+1])) s
        |       FROM d WHERE len(w) >= 2),
        |rare AS (SELECT s FROM sh0 GROUP BY s
        |         HAVING COUNT(*) <= 0.2 * (SELECT COUNT(*) FROM documents)),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare ON sh0.s = rare.s),
        |sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |q AS (SELECT s FROM sh WHERE doc_id = 42),
        |qn AS (SELECT COUNT(*) qn FROM q),
        |ni AS (SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) n_shared
        |       FROM sh JOIN q ON sh.s = q.s WHERE sh.doc_id <> 42 GROUP BY sh.doc_id),
        |mlt AS (SELECT ni.doc_id,
        |         ROUND(CAST(ni.n_shared AS DOUBLE)/(sz.n + qn.qn - ni.n_shared), 6) AS jacc
        |        FROM ni JOIN sz ON ni.doc_id = sz.doc_id CROSS JOIN qn
        |        ORDER BY jacc DESC, ni.doc_id LIMIT 20),
        |lex AS (SELECT doc_id id, CAST(ROW_NUMBER() OVER (ORDER BY jacc DESC, doc_id) AS BIGINT) lex_rank FROM mlt),
        |e AS (SELECT vec_id, list_transform(embedding, x->CAST(x AS DOUBLE)) v FROM embeddings),
        |nv AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x->x*x))) nrm FROM e),
        |qv AS (SELECT v qv, nrm qnrm FROM nv WHERE vec_id = 42),
        |cs AS (SELECT vec_id,
        |        ROUND(list_sum(list_transform(range(1,len(v)+1), i->v[i]*qv[i]))/(nrm*qnrm),6) AS sim
        |       FROM nv, qv WHERE vec_id <> 42 ORDER BY sim DESC, vec_id LIMIT 20),
        |vec AS (SELECT vec_id id, CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) vec_rank FROM cs)
        |SELECT COALESCE(lex.id, vec.id) AS id, lex.lex_rank, vec.vec_rank,
        |  ROUND(CAST(COALESCE(CAST(ROUND(CAST(1 AS DOUBLE)/(60 + lex.lex_rank), 6) AS DECIMAL(18,6)), 0)
        |           + COALESCE(CAST(ROUND(CAST(1 AS DOUBLE)/(60 + vec.vec_rank), 6) AS DECIMAL(18,6)), 0) AS DOUBLE), 6) AS rrf
        |FROM lex FULL JOIN vec ON lex.id = vec.id
        |ORDER BY rrf DESC, id LIMIT 10""".stripMargin,
    "v_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x->CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x->x*x))) nrm FROM e),
        |q AS (SELECT v qv, nrm qnrm FROM n WHERE vec_id=0)
        |SELECT vec_id,
        | ROUND(list_sum(list_transform(range(1,len(v)+1), i->v[i]*qv[i]))/(nrm*qnrm),6) AS sim
        |FROM n, q WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin,
    "v_semantic_cache" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x->CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x->x*x))) nrm FROM e),
        |q AS (SELECT vec_id query_id, v qv, nrm qnrm FROM n WHERE vec_id < 5),
        |c AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 5),
        |sim AS (SELECT q.query_id, c.vec_id,
        |  ROUND(list_sum(list_transform(range(1,len(c.v)+1), i->c.v[i]*q.qv[i]))/(c.nrm*q.qnrm),6) sim
        | FROM c, q),
        |r AS (SELECT query_id, vec_id, sim,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) rn FROM sim)
        |SELECT query_id, vec_id AS cache_id, sim FROM r WHERE rn=1 AND sim >= 0.25
        |ORDER BY query_id""".stripMargin,
    "v_knn_per_label" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x->CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x->x*x))) nrm FROM e),
        |q AS (SELECT vec_id query_id, v qv, nrm qnrm FROM n WHERE vec_id < 10),
        |c AS (SELECT vec_id, label, v, nrm FROM n WHERE vec_id >= 10),
        |sim AS (SELECT q.query_id, c.label, c.vec_id,
        |  ROUND(list_sum(list_transform(range(1,len(c.v)+1), i->c.v[i]*q.qv[i]))/(c.nrm*q.qnrm),6) sim
        | FROM c, q),
        |r AS (SELECT query_id, label, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id, label ORDER BY sim DESC, vec_id) AS BIGINT) rn
        | FROM sim)
        |SELECT query_id, label, vec_id, sim, rn FROM r WHERE rn <= 3
        |ORDER BY query_id, label, rn""".stripMargin,
    "v_chunk_text" ->
      """SELECT doc_id, chunk_id,
        | substr(text, CAST(chunk_id*150+1 AS INTEGER), 200) AS chunk_text
        |FROM (
        | SELECT doc_id, text, unnest(range(0, (length(text)-1)//150 + 1)) AS chunk_id
        | FROM documents) t
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // V5b: word-offset arithmetic mirrored exactly — window starts snap
    // forward to a word start, ends snap back to the last fitting word
    // end, contained windows drop, survivors renumber densely.
    "v_chunk_recursive" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        |w0 AS (SELECT doc_id, unnest(range(1, len(ws)+1)) AS pos, unnest(ws) AS word FROM d),
        |w AS (SELECT doc_id, pos,
        |  COALESCE(SUM(length(word)+1) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wstart,
        |  COALESCE(SUM(length(word)+1) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + length(word) AS wend
        | FROM w0),
        |cands AS (SELECT doc_id, text, unnest(range(0, (length(text)-1)//150 + 1)) AS c
        |          FROM documents),
        |starts AS (
        | SELECT cands.doc_id, text, c, MIN(w.wstart) AS cstart
        | FROM cands JOIN w ON w.doc_id = cands.doc_id AND w.wstart >= c*150
        | GROUP BY cands.doc_id, text, c),
        |ends AS (
        | SELECT starts.doc_id, text, c, cstart, MAX(w.wend) AS cend
        | FROM starts JOIN w ON w.doc_id = starts.doc_id AND w.wstart >= cstart
        |  AND (w.wend <= cstart + 200 OR w.wstart = cstart)
        | GROUP BY starts.doc_id, text, c, cstart),
        |kept AS (
        | SELECT * FROM (
        |  SELECT doc_id, text, c, cstart, cend,
        |   COALESCE(MAX(cend) OVER (PARTITION BY doc_id ORDER BY c
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS prev_end
        |  FROM ends) WHERE cend > prev_end)
        |SELECT doc_id,
        | CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c) - 1 AS BIGINT) AS chunk_id,
        | substring(text, CAST(cstart + 1 AS INTEGER), CAST(cend - cstart AS INTEGER)) AS chunk_text
        |FROM kept ORDER BY doc_id, chunk_id""".stripMargin,
    "v_dedup_chunks" ->
      """SELECT md5(lower(trim(text))) AS norm_h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "v_quantize_int8" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) mx FROM e),
        |q AS (SELECT vec_id, mx, list_transform(v, x -> CAST(round(x * 127.0 / mx) AS INTEGER)) q FROM m)
        |SELECT vec_id, ROUND(mx, 6) AS scale,
        |  CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
        |  CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS q_self_dot
        |FROM q ORDER BY vec_id""".stripMargin,
    // Greedy MMR replayed as a recursive CTE: the working set carries one
    // row per remaining candidate with its max-sim-to-selected (md), the
    // picked row is chosen by RANK() in the recursive term, and md updates
    // pointwise against the picked row — aggregation-free recursion, the
    // same family as the place_order fold. λ/1−λ appear as literals on
    // both engines (1−0.7 in binary64 ≠ the literal 0.3).
    "v_mmr_rerank" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x->CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x->x*x))) nrm FROM e),
        |q AS (SELECT v qv, nrm qnrm FROM n WHERE vec_id = 0),
        |cand AS (SELECT vec_id, v, nrm,
        |   ROUND(list_sum(list_transform(range(1,len(v)+1), i->v[i]*qv[i]))/(nrm*qnrm),6) simq
        | FROM n, q WHERE vec_id <> 0
        | ORDER BY simq DESC, vec_id LIMIT 50),
        |pairs AS (SELECT a.vec_id pa, b.vec_id pb,
        |   ROUND(list_sum(list_transform(range(1,len(a.v)+1), i->a.v[i]*b.v[i]))/(a.nrm*b.nrm),6) ps
        | FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
        |sel AS (
        |  SELECT 1 AS step, vec_id, simq, CAST(0.0 AS DOUBLE) md,
        |         (vec_id = (SELECT vec_id FROM cand ORDER BY simq DESC, vec_id LIMIT 1)) picked
        |  FROM cand
        |  UNION ALL
        |  SELECT s.step + 1, s.vec_id, s.simq, GREATEST(s.md, p.ps) md,
        |     RANK() OVER (ORDER BY ROUND(0.7*s.simq - 0.3*GREATEST(s.md, p.ps), 6) DESC, s.vec_id) = 1
        |  FROM sel s
        |  JOIN (SELECT vec_id FROM sel WHERE picked) w ON true
        |  JOIN pairs p ON p.pa = s.vec_id AND p.pb = w.vec_id
        |  WHERE s.step < 5 AND NOT s.picked
        |)
        |SELECT CAST(step AS BIGINT) AS rank, vec_id, simq AS sim,
        |  ROUND(0.7*simq - 0.3*md, 6) AS mmr
        |FROM sel WHERE picked ORDER BY rank""".stripMargin,
    // MaxSim: per-(query-vec, label) max over 6-rounded cosines, then a
    // DECIMAL-stabilized sum — identical rounding discipline both engines.
    "v_maxsim" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x->CAST(x AS DOUBLE)) v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x->x*x))) nrm FROM e),
        |q AS (SELECT vec_id qid, v qv, nrm qnrm FROM n WHERE vec_id < 5),
        |c AS (SELECT vec_id, label, v, nrm FROM n WHERE vec_id >= 5),
        |sim AS (SELECT q.qid, c.label,
        |  ROUND(list_sum(list_transform(range(1,len(c.v)+1), i->c.v[i]*q.qv[i]))/(c.nrm*q.qnrm),6) s
        | FROM c, q),
        |mx AS (SELECT qid, label, MAX(s) ms FROM sim GROUP BY qid, label)
        |SELECT label, ROUND(CAST(SUM(CAST(ms AS DECIMAL(18,6))) AS DOUBLE), 6) AS maxsim
        |FROM mx GROUP BY label ORDER BY maxsim DESC, label LIMIT 5""".stripMargin,
    "m_binary_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id%2=0 THEN 'image' ELSE 'audio' END AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) % 1280 + 1 AS width,
        | CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) % 720 + 1 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Resize plan: pure-integer half-up rounding ((x*224 + m//2) // m) —
    // no float division anywhere, so both engines agree bit-for-bit.
    "m_resize_plan" ->
      """WITH meta AS (
        | SELECT doc_id,
        |  CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) % 1280 + 1 AS width,
        |  CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) % 720 + 1 AS height
        | FROM documents WHERE doc_id % 2 = 0),
        |p AS (SELECT doc_id, width, height, LEAST(width, height) m FROM meta),
        |r AS (SELECT doc_id, width, height, m,
        |  CAST((width * 224 + m // 2) // m AS BIGINT) rw,
        |  CAST((height * 224 + m // 2) // m AS BIGINT) rh FROM p)
        |SELECT doc_id, width, height, rw, rh,
        | CAST((rw - 224) // 2 AS BIGINT) AS crop_x,
        | CAST((rh - 224) // 2 AS BIGINT) AS crop_y,
        | m < 224 AS upscaled
        |FROM r ORDER BY doc_id""".stripMargin,
    "m_feature_extract" ->
      """SELECT doc_id,
        | CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
        | CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
        | CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
        | CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_other
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m_segment_plan" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) % 600 + 10 AS duration_s
        | FROM documents)
        |SELECT doc_id, CAST(seg_id AS BIGINT) AS seg_id,
        |  CAST(seg_id * 30 AS BIGINT) AS start_s,
        |  CAST(LEAST((seg_id + 1) * 30, duration_s) AS BIGINT) AS end_s,
        |  CAST(duration_s AS BIGINT) AS duration_s
        |FROM (SELECT doc_id, duration_s,
        |        unnest(range(0, (duration_s - 1) // 30 + 1)) AS seg_id FROM m) t
        |ORDER BY doc_id, seg_id""".stripMargin,
    "g_copurchase_edges" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem)
        |SELECT a.pk AS src, b.pk AS dst, COUNT(*) AS weight
        |FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk
        |GROUP BY a.pk, b.pk ORDER BY src, dst""".stripMargin,
    // Association rules on the mirrored edge list: lift divides two exact
    // BIGINT products in one IEEE op, ranking orders by the ROUNDED lift
    // (+ dst) so tie-breaks agree across engines.
    "g_also_bought" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT ok) n_orders FROM lp),
        |ic AS (SELECT pk, COUNT(*) n_ord FROM lp GROUP BY pk),
        |e AS (SELECT a.pk src, b.pk dst, COUNT(*) w
        |      FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |r AS (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),
        |sc AS (SELECT r.src, r.dst, r.w weight,
        |         ROUND(CAST(r.w AS DOUBLE)/n.n_orders, 6) support,
        |         ROUND(CAST(r.w AS DOUBLE)/a.n_ord, 6) confidence,
        |         ROUND(CAST(r.w*n.n_orders AS DOUBLE)/CAST(a.n_ord*b.n_ord AS DOUBLE), 6) lift
        |       FROM r JOIN ic a ON r.src=a.pk JOIN ic b ON r.dst=b.pk CROSS JOIN n),
        |rk AS (SELECT *, CAST(ROW_NUMBER() OVER
        |         (PARTITION BY src ORDER BY lift DESC, dst) AS BIGINT) rk FROM sc)
        |SELECT src, dst, weight, support, confidence, lift, rk
        |FROM rk WHERE rk <= 3 ORDER BY src, rk""".stripMargin,
    // G11: recursive-CTE replay of the synchronous LPA rounds — votes are
    // BIGINT weight sums (no float), argmax per node by (vote desc, label
    // asc) mirrors the Spark window's tie-break exactly.
    // Personalized recommendations: mirrored arcs = the a.pk<>b.pk join;
    // score is an exact BIGINT sum (outer CAST — SUM(BIGINT) is HUGEINT
    // in DuckDB, the p_data_card lesson).
    "g_recommend_user" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |own AS (SELECT DISTINCT lp.pk FROM orders o JOIN lp ON o.o_orderkey = lp.ok
        |        WHERE o.o_custkey = 1),
        |e AS (SELECT a.pk src, b.pk dst, CAST(COUNT(*) AS BIGINT) w
        |      FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk <> b.pk GROUP BY 1, 2)
        |SELECT e.dst AS part, CAST(SUM(e.w) AS BIGINT) AS score, COUNT(*) AS n_links
        |FROM e JOIN own ON e.src = own.pk
        |WHERE e.dst NOT IN (SELECT pk FROM own)
        |GROUP BY e.dst ORDER BY score DESC, part LIMIT 10""".stripMargin,
    "g_communities" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst, COUNT(*) AS w FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),
        |lab AS (
        |  SELECT 0 AS it, src AS v, src AS lbl FROM (SELECT DISTINCT src FROM arcs)
        |  UNION ALL
        |  SELECT it, v, lbl FROM (
        |    SELECT it, v, lbl, ROW_NUMBER() OVER (PARTITION BY it, v
        |        ORDER BY vote DESC, lbl) AS rk
        |    FROM (
        |      SELECT DISTINCT l.it + 1 AS it, a.dst AS v, l.lbl AS lbl,
        |        SUM(a.w) OVER (PARTITION BY a.dst, l.lbl) AS vote
        |      FROM lab l JOIN arcs a ON a.src = l.v
        |      WHERE l.it < 5)
        |  ) WHERE rk = 1
        |)
        |SELECT v AS part, lbl AS community FROM lab WHERE it = 5
        |ORDER BY part""".stripMargin,
    // G23: the G11 recursive-CTE LPA replay hands the final labels to
    // the Newman-Girvan aggregates; w_in/k_tot/n_nodes stay BIGINT and
    // q_term is the one shared double expression rounded at 6dp.
    "g_modularity" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst, COUNT(*) AS w FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),
        |lab AS (
        |  SELECT 0 AS it, src AS v, src AS lbl FROM (SELECT DISTINCT src FROM arcs)
        |  UNION ALL
        |  SELECT it, v, lbl FROM (
        |    SELECT it, v, lbl, ROW_NUMBER() OVER (PARTITION BY it, v
        |        ORDER BY vote DESC, lbl) AS rk
        |    FROM (
        |      SELECT DISTINCT l.it + 1 AS it, a.dst AS v, l.lbl AS lbl,
        |        SUM(a.w) OVER (PARTITION BY a.dst, l.lbl) AS vote
        |      FROM lab l JOIN arcs a ON a.src = l.v
        |      WHERE l.it < 5)
        |  ) WHERE rk = 1
        |),
        |fin AS (SELECT v, lbl FROM lab WHERE it = 5),
        |deg AS (SELECT src v, SUM(w) k FROM arcs GROUP BY 1),
        |m AS (SELECT CAST(SUM(w) AS DOUBLE) m FROM e),
        |win AS (SELECT la.lbl c, SUM(e.w) w_in FROM e JOIN fin la ON e.src = la.v
        |        JOIN fin lb ON e.dst = lb.v WHERE la.lbl = lb.lbl GROUP BY 1),
        |kt AS (SELECT fin.lbl c, COUNT(*) n_nodes, SUM(deg.k) k_tot
        |       FROM fin JOIN deg ON fin.v = deg.v GROUP BY 1)
        |SELECT kt.c AS community, CAST(kt.n_nodes AS BIGINT) AS n_nodes,
        |  CAST(COALESCE(win.w_in, 0) AS BIGINT) AS w_in,
        |  CAST(kt.k_tot AS BIGINT) AS k_tot,
        |  ROUND(CAST(COALESCE(win.w_in, 0) AS DOUBLE)/m.m -
        |    (CAST(kt.k_tot AS DOUBLE)/(2*m.m))*(CAST(kt.k_tot AS DOUBLE)/(2*m.m)), 6) AS q_term
        |FROM kt LEFT JOIN win ON kt.c = win.c CROSS JOIN m
        |ORDER BY community""".stripMargin,
    "g_degree" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2)
        |SELECT part, COUNT(*) AS degree
        |FROM (SELECT src AS part FROM e UNION ALL SELECT dst FROM e) u
        |GROUP BY part ORDER BY part""".stripMargin,
    // Node similarity: Jaccard over neighbor sets via the shared-neighbor
    // inverted index — the same candidate pattern as the Jaccard dedup.
    // VALIDITY: this exact-Jaccard oracle holds only below the operator's
    // Σdeg² pair-work budget (5e8 — all of sf≤0.1); above it the call
    // reroutes to the probabilistic LSH twin (logged) and would not hash-
    // match. The correctness harness runs at sf0.01, well inside budget.
    "g_node_similarity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |nb AS (SELECT src a, dst nb FROM e UNION ALL SELECT dst, src FROM e),
        |deg AS (SELECT a, COUNT(*) d FROM nb GROUP BY a),
        |cm AS (SELECT x.a pa, y.a pb, COUNT(*) n_common
        |       FROM nb x JOIN nb y ON x.nb = y.nb AND x.a < y.a GROUP BY 1,2)
        |SELECT cm.pa AS part_a, cm.pb AS part_b, cm.n_common,
        |  ROUND(CAST(cm.n_common AS DOUBLE)/(da.d + db.d - cm.n_common), 6) AS jacc
        |FROM cm JOIN deg da ON cm.pa = da.a JOIN deg db ON cm.pb = db.a
        |ORDER BY jacc DESC, part_a, part_b LIMIT 20""".stripMargin,
    // G13 replay: the same wedge join as G9 with the shared neighbor's
    // degree on the arc row; 1/ln(d) rounds to 6dp then sums as DECIMAL
    // (order-independent). CAST(1 AS DOUBLE) keeps the division IEEE (a
    // bare 1.0 is DECIMAL in DuckDB).
    "g_adamic_adar" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |nb AS (SELECT src a, dst nb FROM e UNION ALL SELECT dst, src FROM e),
        |deg AS (SELECT a, COUNT(*) d FROM nb GROUP BY a),
        |ar AS (SELECT nb.a, nb.nb, deg.d dnb FROM nb JOIN deg ON nb.nb = deg.a),
        |cm AS (SELECT x.a pa, y.a pb, COUNT(*) n_common,
        |        SUM(CAST(ROUND(CAST(1 AS DOUBLE)/ln(x.dnb), 6) AS DECIMAL(18,6))) aas
        |       FROM ar x JOIN ar y ON x.nb = y.nb AND x.a < y.a GROUP BY 1,2)
        |SELECT pa AS part_a, pb AS part_b, n_common,
        |  ROUND(CAST(aas AS DOUBLE), 6) AS aa_score
        |FROM cm ORDER BY aa_score DESC, part_a, part_b LIMIT 20""".stripMargin,
    // G13b replay: the G9b MinHash band replay (same 24 md5-derived
    // permutations, 12 bands of 2) generates the candidate pairs, then
    // the EXACT AA score on each candidate — common neighbors from the
    // pair's neighbor join, each weighted 1/ln(deg(z)) rounded to 6dp
    // and summed as DECIMAL (order-independent, engine-identical).
    "g_adamic_adar_lsh" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |nb AS (SELECT src a, dst nb FROM e UNION ALL SELECT dst, src FROM e),
        |hv AS (SELECT a, (list_sum(list_transform(range(1,16), c ->
        |        (strpos('0123456789abcdef', substring(md5(CAST(nb AS VARCHAR)), CAST(c AS INT), 1))-1)::BIGINT << CAST(4*(15-c) AS INT)
        |       )) % 1000000007) hv FROM nb),
        |mh AS (SELECT a, j, MIN(((2*j+1)*hv + 17*j+3) % 1000000007) m
        |       FROM hv CROSS JOIN range(0,24) t(j) GROUP BY a, j),
        |sigs AS (SELECT a, j//2 band, string_agg(CAST(m AS VARCHAR), ',' ORDER BY j) sig
        |         FROM mh GROUP BY a, j//2),
        |cand AS (SELECT DISTINCT x.a pa, y.a pb FROM sigs x
        |         JOIN sigs y ON x.band=y.band AND x.sig=y.sig AND x.a<y.a),
        |deg AS (SELECT a, COUNT(*) d FROM nb GROUP BY a),
        |nc AS (SELECT c.pa, c.pb, COUNT(*) n_common,
        |        SUM(CAST(ROUND(CAST(1 AS DOUBLE)/ln(dz.d), 6) AS DECIMAL(18,6))) aas
        |       FROM cand c JOIN nb n1 ON n1.a = c.pa JOIN nb n2 ON n2.a = c.pb AND n2.nb = n1.nb
        |       JOIN deg dz ON dz.a = n1.nb
        |       GROUP BY c.pa, c.pb)
        |SELECT pa AS part_a, pb AS part_b, n_common,
        |  ROUND(CAST(aas AS DOUBLE), 6) AS aa_score
        |FROM nc ORDER BY aa_score DESC, part_a, part_b LIMIT 20""".stripMargin,
    // G19 replay: forward BFS with path counts as a recursive CTE (the
    // G5 window-SUM trick; re-discovered rows at dist > min are junk that
    // only breeds junk — any predecessor adjacent to a node v with a row
    // at minDist(v)-1 must itself sit at exactly that level, so the
    // min-dist slice `lv` carries the true σ), then the backward
    // dependency accumulation UNROLLED over the 8-hop horizon (one
    // chained CTE per level, deepest first — each level's δ needs only
    // the level below, and levels past the eccentricity are empty
    // frames that contribute COALESCE(·,0)). Every expression shape
    // mirrors the Spark loop: CAST(σ)/CAST(σw)·(1.0+δw), per-source δ
    // rounds to 6dp and sums as DECIMAL across sources.
    "g_betweenness" -> {
      val bw = (7 to 0 by -1).map { k =>
        s"""d$k AS (SELECT l.s, l.v, l.sigma,
           |  COALESCE(SUM(CAST(l.sigma AS DOUBLE)/CAST(w.sigma AS DOUBLE)*(1.0+w.delta)), 0.0) AS delta
           | FROM lv l
           | LEFT JOIN arcs a ON a.src = l.v
           | LEFT JOIN d${k + 1} w ON w.s = l.s AND w.v = a.dst
           | WHERE l.dist = $k GROUP BY l.s, l.v, l.sigma)""".stripMargin
      }.mkString(",\n")
      val all = (0 to 8).map(k => s"SELECT * FROM d$k").mkString(" UNION ALL ")
      s"""WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
         |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
         |arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
         |srcs AS (SELECT DISTINCT src v FROM arcs ORDER BY v LIMIT 3),
         |fw AS (
         |  SELECT 0 AS dist, v AS s, v AS v, CAST(1 AS BIGINT) AS sigma FROM srcs
         |  UNION ALL
         |  SELECT DISTINCT dist, s, v2 AS v, sigma FROM (
         |    SELECT f.dist + 1 AS dist, f.s, a.dst AS v2,
         |      CAST(SUM(f.sigma) OVER (PARTITION BY f.s, a.dst) AS BIGINT) AS sigma
         |    FROM fw f JOIN arcs a ON a.src = f.v
         |    WHERE f.dist < 8) z
         |),
         |md AS (SELECT s, v, MIN(dist) d FROM fw GROUP BY s, v),
         |lv AS (SELECT f.s, f.v, f.dist, f.sigma FROM fw f
         |       JOIN md ON f.s = md.s AND f.v = md.v AND f.dist = md.d),
         |d8 AS (SELECT s, v, sigma, CAST(0.0 AS DOUBLE) AS delta FROM lv WHERE dist = 8),
         |$bw,
         |ad AS ($all)
         |SELECT v AS part,
         |  ROUND(CAST(SUM(CAST(ROUND(delta, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS bc
         |FROM ad WHERE v <> s GROUP BY v
         |ORDER BY bc DESC, part LIMIT 20""".stripMargin
    },
    // G20 replay: the G8 BFS CTE + one aggregation — n/Σd as one double
    // division of exact BIGINTs, harmonic as 6dp-rounded DECIMAL terms.
    "g_closeness" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT src part FROM arcs),
        |lm AS (SELECT part FROM nodes ORDER BY part LIMIT 3),
        |bfs AS (
        |  SELECT part AS landmark, part, 0 AS hops FROM lm
        |  UNION
        |  SELECT b.landmark, a.dst, b.hops + 1 FROM bfs b JOIN arcs a ON a.src = b.part
        |  WHERE b.hops < 8
        |),
        |d AS (SELECT part, landmark, CAST(MIN(hops) AS BIGINT) hops
        |      FROM bfs GROUP BY part, landmark)
        |SELECT part, COUNT(*) AS n_reached,
        |  ROUND(CAST(COUNT(*) AS DOUBLE)/SUM(hops), 6) AS closeness,
        |  ROUND(CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE)/hops, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS harmonic
        |FROM d WHERE hops > 0 GROUP BY part ORDER BY part""".stripMargin,
    // G14 replay: synchronous peel as a bounded recursive CTE carrying the
    // surviving ARC set (the node set can't recurse — both endpoints must
    // be checked, and a recursive term may reference the CTE once; on the
    // mirrored arc frame each endpoint's current degree is a window COUNT,
    // the G5 window-aggregation trick). Rounds past the fixpoint are
    // no-ops, so the iter=20 slice IS the core (Spark stops at the
    // fixpoint; the spec pins convergence depth ≪ 20).
    "g_kcore" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |nb AS (SELECT src a, dst b FROM e UNION ALL SELECT dst, src FROM e),
        |surv(iter, a, b) AS (
        |  SELECT 0, a, b FROM nb
        |  UNION ALL
        |  SELECT t.iter + 1, t.a, t.b FROM (
        |    SELECT iter, a, b,
        |      COUNT(*) OVER (PARTITION BY a) da,
        |      COUNT(*) OVER (PARTITION BY b) db
        |    FROM surv) t
        |  WHERE t.iter < 20 AND t.da >= 80 AND t.db >= 80)
        |SELECT a AS part, COUNT(*) AS core_deg FROM surv WHERE iter = 20
        |GROUP BY a ORDER BY part""".stripMargin,
    // G9b replay: Dedup.minhashBandSigs' 24 md5-derived permutations over
    // each node's neighbor set (12 bands of 2), band-bucket candidates,
    // exact Jaccard re-rank — deterministic, so the LSH output is a fixed
    // fact of the data and replays exactly in SQL.
    "g_node_similarity_lsh" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |nb AS (SELECT src a, dst nb FROM e UNION ALL SELECT dst, src FROM e),
        |hv AS (SELECT a, (list_sum(list_transform(range(1,16), c ->
        |        (strpos('0123456789abcdef', substring(md5(CAST(nb AS VARCHAR)), CAST(c AS INT), 1))-1)::BIGINT << CAST(4*(15-c) AS INT)
        |       )) % 1000000007) hv FROM nb),
        |mh AS (SELECT a, j, MIN(((2*j+1)*hv + 17*j+3) % 1000000007) m
        |       FROM hv CROSS JOIN range(0,24) t(j) GROUP BY a, j),
        |sigs AS (SELECT a, j//2 band, string_agg(CAST(m AS VARCHAR), ',' ORDER BY j) sig
        |         FROM mh GROUP BY a, j//2),
        |cand AS (SELECT DISTINCT x.a pa, y.a pb FROM sigs x
        |         JOIN sigs y ON x.band=y.band AND x.sig=y.sig AND x.a<y.a),
        |deg AS (SELECT a, COUNT(*) d FROM nb GROUP BY a),
        |nc AS (SELECT c.pa, c.pb, COUNT(*) n_common
        |       FROM cand c JOIN nb n1 ON n1.a = c.pa JOIN nb n2 ON n2.a = c.pb AND n2.nb = n1.nb
        |       GROUP BY c.pa, c.pb)
        |SELECT nc.pa AS part_a, nc.pb AS part_b, nc.n_common,
        |  ROUND(CAST(nc.n_common AS DOUBLE)/(da.d + db.d - nc.n_common), 6) AS jacc
        |FROM nc JOIN deg da ON nc.pa=da.a JOIN deg db ON nc.pb=db.a
        |ORDER BY jacc DESC, part_a, part_b LIMIT 20""".stripMargin,
    "g_two_hop" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |nb AS (SELECT DISTINCT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<>b.pk),
        |seed AS (SELECT p_partkey FROM part WHERE p_type='PROMO')
        |SELECT x.part, p2.p_name, p2.p_type FROM (
        | SELECT DISTINCT nb.dst AS part FROM nb JOIN seed ON nb.src=seed.p_partkey
        | WHERE nb.dst NOT IN (SELECT p_partkey FROM seed)) x
        |JOIN part p2 ON x.part = p2.p_partkey
        |ORDER BY part""".stripMargin,
    // Triangle counting IS SQL-expressible on the canonical (src<dst) edge
    // list: each triangle appears exactly once as a<b<c via the 3-way
    // join; per-node counts credit all three corners. GraphX's
    // triangleCount canonicalizes to the same orientation internally.
    "g_triangle_count" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |tr AS (SELECT e1.src a, e1.dst b, e2.dst c
        |       FROM e e1 JOIN e e2 ON e2.src = e1.dst
        |       JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |pn AS (SELECT a AS part FROM tr UNION ALL SELECT b FROM tr UNION ALL SELECT c FROM tr),
        |nodes AS (SELECT src part FROM e UNION SELECT dst FROM e)
        |SELECT n.part, CAST(COALESCE(cnt, 0) AS BIGINT) AS triangles
        |FROM nodes n LEFT JOIN (SELECT part, COUNT(*) cnt FROM pn GROUP BY part) c ON n.part = c.part
        |ORDER BY n.part""".stripMargin,
    // Landmark BFS as a bounded recursive CTE (hop cap 8 ≫ the graph's
    // 3-hop landmark eccentricity; MIN(hops) collapses re-discoveries).
    // Matches GraphX ShortestPaths: unreachable (landmark, node) pairs
    // simply produce no row.
    "g_shortest_paths" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT src part FROM arcs),
        |lm AS (SELECT part FROM nodes ORDER BY part LIMIT 3),
        |bfs AS (
        |  SELECT part AS landmark, part, 0 AS hops FROM lm
        |  UNION
        |  SELECT b.landmark, a.dst, b.hops + 1 FROM bfs b JOIN arcs a ON a.src = b.part
        |  WHERE b.hops < 8
        |)
        |SELECT part, landmark, CAST(MIN(hops) AS BIGINT) AS hops
        |FROM bfs GROUP BY part, landmark ORDER BY part, landmark""".stripMargin,
    // G5 graduated (r6): GraphX staticPageRank IS oracle-able — the exact
    // update (r ← 0.15 + (1.0-0.15)·Σ r·(1/deg), init 1.0, 10 iterations)
    // replays as a recursive CTE whose recursive term aggregates via a
    // window SUM + DISTINCT collapse; 6dp rounding absorbs double-sum
    // association order. Mirror the runtime expression shapes exactly:
    // rank * (1.0/deg) (not rank/deg) and (1.0 - 0.15) (not 0.85).
    "g_pagerank" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |darcs AS (SELECT src, dst, 1.0/COUNT(*) OVER (PARTITION BY src) AS rdeg FROM arcs),
        |pr AS (
        |  SELECT 0 AS it, src AS v, CAST(1.0 AS DOUBLE) AS r FROM (SELECT DISTINCT src FROM arcs)
        |  UNION ALL
        |  SELECT DISTINCT it, dst AS v, r FROM (
        |    SELECT p.it + 1 AS it, a.dst,
        |      0.15 + (1.0 - 0.15) * SUM(p.r * a.rdeg) OVER (PARTITION BY a.dst) AS r
        |    FROM pr p JOIN darcs a ON a.src = p.v
        |    WHERE p.it < 10)
        |)
        |SELECT v AS part, ROUND(r, 6) AS rank FROM pr WHERE it = 10
        |ORDER BY rank DESC, part LIMIT 20""".stripMargin,
    // G16: G5's recursive-CTE replay with a seed-biased teleport — pv puts
    // 1.0/|S| (one IEEE division, same on both engines) on customer 1's
    // in-graph parts; the per-round update 0.15·pv + 0.85·Σ(r·rdeg)
    // mirrors the Spark expression shape term-for-term (r9: the Spark
    // arc frame precomputes rdeg = 1.0/deg and multiplies, exactly this
    // darcs shape — no division-vs-reciprocal ulp gap), 6dp both sides.
    "g_ppr" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |darcs AS (SELECT src, dst, 1.0/COUNT(*) OVER (PARTITION BY src) AS rdeg FROM arcs),
        |sd AS (SELECT DISTINCT l.l_partkey pk FROM lineitem l
        |       JOIN orders o ON l.l_orderkey = o.o_orderkey
        |       WHERE o.o_custkey = 1 AND l.l_partkey IN (SELECT src FROM arcs)),
        |c AS (SELECT COUNT(*) n FROM sd),
        |pv AS (SELECT v.src AS v,
        |         CASE WHEN s.pk IS NOT NULL THEN 1.0/CAST(c.n AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS pv
        |       FROM (SELECT DISTINCT src FROM arcs) v
        |       LEFT JOIN sd s ON v.src = s.pk CROSS JOIN c),
        |pr AS (
        |  SELECT 0 AS it, v, CAST(pv AS DOUBLE) AS r FROM pv
        |  UNION ALL
        |  SELECT DISTINCT it, v2 AS v, r FROM (
        |    SELECT p.it + 1 AS it, a.dst AS v2,
        |      0.15 * pv.pv + 0.85 * SUM(p.r * a.rdeg) OVER (PARTITION BY a.dst) AS r
        |    FROM pr p JOIN darcs a ON a.src = p.v JOIN pv ON pv.v = a.dst
        |    WHERE p.it < 10)
        |)
        |SELECT v AS part, ROUND(r, 6) AS ppr FROM pr WHERE it = 10
        |ORDER BY ppr DESC, part LIMIT 20""".stripMargin,
    // G17: HITS replay — the bipartite arc frame pre-expands to
    // (qkind,qid)→(okind,oid) rows so the recursive CTE's single
    // self-reference is an equi-join producing BOTH new vectors per
    // round (Jacobi update); per-node raw = deg-bounded window SUM,
    // normalizer = order-independent MAX window per kind, 6dp.
    "g_hits" ->
      """WITH RECURSIVE ed AS (SELECT DISTINCT o.o_custkey u, l.l_partkey p
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edk AS (SELECT 'h' qkind, u qid, 'a' okind, p oid FROM ed
        |        UNION ALL SELECT 'a', p, 'h', u FROM ed),
        |hits AS (
        |  SELECT 0 AS it, kind, id, CAST(1.0 AS DOUBLE) AS v FROM (
        |    SELECT 'h' kind, u AS id FROM (SELECT DISTINCT u FROM ed)
        |    UNION ALL
        |    SELECT 'a', p FROM (SELECT DISTINCT p FROM ed)) z
        |  UNION ALL
        |  SELECT it, kind, id, raw / MAX(raw) OVER (PARTITION BY kind) AS v FROM (
        |    SELECT DISTINCT q.it + 1 AS it, e.okind AS kind, e.oid AS id,
        |      SUM(q.v) OVER (PARTITION BY e.okind, e.oid) AS raw
        |    FROM hits q JOIN edk e ON q.kind = e.qkind AND q.id = e.qid
        |    WHERE q.it < 6) w
        |)
        |SELECT id AS part, ROUND(v, 6) AS authority FROM hits
        |WHERE it = 6 AND kind = 'a'
        |ORDER BY authority DESC, part LIMIT 20""".stripMargin,
    // G18: the walk corpus replays exactly — the per-hop choice is the
    // r-th smallest neighbor with r = h64(start, walk, step) mod degree
    // (r9: indexed selection from the sorted adjacency list — one hash
    // per walk-step, no per-neighbor scoring), pure integer arithmetic
    // on both engines.
    "g_random_walks" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |adj AS (SELECT src, list_sort(list(dst)) nbrs, COUNT(*) deg FROM arcs GROUP BY src),
        |vs AS (SELECT src v FROM adj),
        |wk AS (
        |  SELECT v AS start, CAST(w AS BIGINT) AS walk, 0 AS step, v AS node
        |  FROM vs CROSS JOIN (SELECT unnest(range(0, 2)) w) t
        |  UNION ALL
        |  SELECT q.start, q.walk, q.step + 1 AS step,
        |    a.nbrs[CAST(CAST(('0x'||substr(md5('w:'||CAST(q.start AS VARCHAR)||':'||CAST(q.walk AS VARCHAR)
        |      ||':'||CAST(q.step + 1 AS VARCHAR)),1,15)) AS BIGINT) % a.deg AS INT) + 1] AS node
        |  FROM wk q JOIN adj a ON a.src = q.node
        |  WHERE q.step < 4
        |)
        |SELECT start, walk, step, node FROM wk
        |ORDER BY start, walk, step""".stripMargin,
    // G18b: the biased-walk replay is ALL integer arithmetic — each
    // candidate is classed return/common/outward via the carried prev
    // (common = LEFT JOIN membership probe on the arcs), the class
    // weights (1,4,16) cumulative-sum over dst order, and the picked
    // neighbor is the row whose [cum−w, cum) interval contains
    // h64 mod Σw. No ln/pow ⇒ no libm ulp risk between engines; the
    // dead-end guard (Σw=0 → all-ones weights) replays identically.
    "g_node2vec" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |vs AS (SELECT DISTINCT src v FROM arcs),
        |wk AS (
        |  SELECT v AS start, CAST(w AS BIGINT) AS walk, 0 AS step, v AS node, v AS prev
        |  FROM vs CROSS JOIN (SELECT unnest(range(0, 2)) w) t
        |  UNION ALL
        |  SELECT start, walk, step, nd AS node, newprev AS prev FROM (
        |    SELECT start, walk, step, nd, newprev, w2, h,
        |      SUM(w2) OVER (PARTITION BY start, walk ORDER BY nd) AS cum,
        |      SUM(w2) OVER (PARTITION BY start, walk) AS tot
        |    FROM (
        |      SELECT start, walk, step, nd, newprev, h,
        |        CASE WHEN SUM(w0) OVER (PARTITION BY start, walk) = 0
        |             THEN 1 ELSE w0 END AS w2
        |      FROM (
        |        SELECT q.start, q.walk, q.step + 1 AS step, a.dst AS nd,
        |          q.node AS newprev,
        |          CASE WHEN a.dst = q.prev THEN 1
        |               WHEN c.src IS NOT NULL THEN 4
        |               ELSE 16 END AS w0,
        |          CAST(('0x'||substr(md5('n2v:'||CAST(q.start AS VARCHAR)||':'||CAST(q.walk AS VARCHAR)
        |            ||':'||CAST(q.step + 1 AS VARCHAR)),1,15)) AS BIGINT) AS h
        |        FROM wk q JOIN arcs a ON a.src = q.node
        |        LEFT JOIN arcs c ON c.src = q.prev AND c.dst = a.dst
        |        WHERE q.step < 4) z1) z2) z3
        |  WHERE cum - w2 <= h % tot AND h % tot < cum
        |)
        |SELECT start, walk, step, node FROM wk
        |ORDER BY start, walk, step""".stripMargin,
    // G5b: same recursive-CTE replay with weight-normalized contributions
    // (CAST(w)/CAST(sum w) mirrors the Spark double division bit-for-bit).
    "g_pagerank_weighted" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst, COUNT(*) AS w FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),
        |darcs AS (SELECT src, dst,
        |  CAST(w AS DOUBLE)/CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE) AS rw FROM arcs),
        |pr AS (
        |  SELECT 0 AS it, src AS v, CAST(1.0 AS DOUBLE) AS r FROM (SELECT DISTINCT src FROM arcs)
        |  UNION ALL
        |  SELECT DISTINCT it, dst AS v, r FROM (
        |    SELECT p.it + 1 AS it, a.dst,
        |      0.15 + (1.0 - 0.15) * SUM(p.r * a.rw) OVER (PARTITION BY a.dst) AS r
        |    FROM pr p JOIN darcs a ON a.src = p.v
        |    WHERE p.it < 10)
        |)
        |SELECT v AS part, ROUND(r, 6) AS rank FROM pr WHERE it = 10
        |ORDER BY rank DESC, part LIMIT 20""".stripMargin,
    // G6 graduated (r6): GraphX connectedComponents converges to the min
    // vertex id per component; the oracle propagates min labels with the
    // same window-aggregate recursive-CTE trick (UNION dedup terminates —
    // labels only improve, so the working table drains at the fixpoint).
    "g_connected_components" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |arcs AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT src AS v FROM arcs),
        |lbl AS (
        |  SELECT v, v AS l FROM nodes
        |  UNION
        |  SELECT DISTINCT dst AS v, l FROM (
        |    SELECT a.dst, MIN(p.l) OVER (PARTITION BY a.dst) AS l
        |    FROM lbl p JOIN arcs a ON a.src = p.v)
        |)
        |SELECT component, COUNT(*) AS size FROM (
        |  SELECT v, MIN(l) AS component FROM lbl GROUP BY v)
        |GROUP BY component ORDER BY size DESC, component""".stripMargin,
    "g_cat_hierarchy_rollup" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey=s_suppkey
        | JOIN nation ON s_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    // Near-dup removal is CLUSTER-based (r4): the Jaccard pair graph
    // closes transitively (recursive CTE) and every doc except its
    // component's minimum is dropped — mirrors dupClustersOf in the
    // Spark pipeline.
    "p_corpus_clean" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text, string_split(lower(text),' ') w FROM documents),
        |keep_exact AS (SELECT MIN(doc_id) doc_id FROM documents GROUP BY md5(text)),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1,len(w)), i -> w[i]||' '||w[i+1])) s
        |        FROM d WHERE len(w) >= 2),
        |rare AS (SELECT s FROM sh0 GROUP BY s
        |         HAVING COUNT(*) <= 0.2 * (SELECT COUNT(*) FROM documents)),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare ON sh0.s = rare.s),
        |sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |pr AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) ni
        |       FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |jp AS (SELECT da, db
        |  FROM pr JOIN sz sa ON da=sa.doc_id JOIN sz sb ON db=sb.doc_id
        |  WHERE CAST(ni AS DOUBLE)/(sa.n+sb.n-ni) >= 0.5),
        |arcs AS (SELECT da s, db dd FROM jp UNION ALL SELECT db, da FROM jp),
        |reach AS (
        |  SELECT s AS node, dd AS r FROM arcs
        |  UNION
        |  SELECT reach.node, arcs.dd FROM reach JOIN arcs ON arcs.s = reach.r
        |),
        |losers AS (SELECT node AS doc_id FROM reach GROUP BY node HAVING MIN(r) < node),
        |quality AS (SELECT doc_id, text FROM d
        |  WHERE CAST(len(list_filter(w, x -> x IN ('the','a','of','and'))) AS DOUBLE) / len(w) >= 0.05),
        |survivors AS (SELECT q.doc_id, q.text FROM quality q
        |  JOIN keep_exact k ON q.doc_id = k.doc_id
        |  WHERE q.doc_id NOT IN (SELECT doc_id FROM losers))
        |SELECT doc_id, chunk_id,
        | substr(text, CAST(chunk_id*150+1 AS INTEGER), 200) AS chunk_text
        |FROM (SELECT doc_id, text, unnest(range(0, (length(text)-1)//150 + 1)) AS chunk_id
        |      FROM survivors) t
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // Greedy sequence packing is a per-(lang, shard) fold — recursive CTE
    // replay, the same oracle pattern as s_place_order.
    "p_pack_tokens" ->
      """WITH RECURSIVE
        |d AS (SELECT lang,
        |        CAST(CAST(('0x'||substr(md5('pack:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 4 AS INTEGER) shard,
        |        doc_id,
        |        CAST(len(string_split_regex(trim(text),' +')) AS BIGINT) tokens
        |      FROM documents),
        |r AS (SELECT lang, shard, doc_id, tokens,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS BIGINT) rn
        |      FROM d),
        |st AS (
        |  SELECT lang, shard, CAST(0 AS BIGINT) rn, CAST(0 AS BIGINT) doc_id,
        |         CAST(0 AS BIGINT) tokens, CAST(1 AS BIGINT) bin_id, CAST(0 AS BIGINT) fill
        |  FROM (SELECT DISTINCT lang, shard FROM r) g
        |  UNION ALL
        |  SELECT r.lang, r.shard, r.rn, r.doc_id, r.tokens,
        |    CASE WHEN st.fill > 0 AND st.fill + r.tokens > 200 THEN st.bin_id + 1 ELSE st.bin_id END,
        |    CASE WHEN st.fill > 0 AND st.fill + r.tokens > 200 THEN r.tokens ELSE st.fill + r.tokens END
        |  FROM st JOIN r ON r.lang = st.lang AND r.shard = st.shard AND r.rn = st.rn + 1
        |)
        |SELECT lang, shard, doc_id, tokens, bin_id, fill AS fill_after
        |FROM st WHERE rn > 0 ORDER BY lang, shard, doc_id""".stripMargin,
    // P3b: the training-mixture composition — mix cap + exact-dedup keep
    // + quality floor, then the same greedy-packing recursive-CTE replay
    // as p_pack_tokens over the surviving documents.
    "p_train_mix" ->
      """WITH RECURSIVE
        |cap AS (SELECT CAST(ceil(0.6 * COUNT(*) / COUNT(DISTINCT source)) AS BIGINT) AS cap
        |        FROM documents),
        |mix AS (SELECT doc_id FROM (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY CAST(('0x'||substr(md5('mix:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT), doc_id)
        |   AS BIGINT) rk FROM documents) t, cap WHERE rk <= cap),
        |keep_exact AS (SELECT MIN(doc_id) doc_id FROM documents GROUP BY md5(text)),
        |q AS (SELECT doc_id FROM (SELECT doc_id, string_split(lower(text),' ') w FROM documents)
        |  WHERE CAST(len(list_filter(w, x -> x IN ('the','a','of','and'))) AS DOUBLE) / len(w) >= 0.05),
        |surv AS (SELECT dd.* FROM documents dd
        |  JOIN mix ON dd.doc_id = mix.doc_id
        |  JOIN keep_exact k ON dd.doc_id = k.doc_id
        |  JOIN q ON dd.doc_id = q.doc_id),
        |d AS (SELECT lang,
        |        CAST(CAST(('0x'||substr(md5('pack:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 4 AS INTEGER) shard,
        |        doc_id,
        |        CAST(len(string_split_regex(trim(text),' +')) AS BIGINT) tokens
        |      FROM surv),
        |r AS (SELECT lang, shard, doc_id, tokens,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS BIGINT) rn
        |      FROM d),
        |st AS (
        |  SELECT lang, shard, CAST(0 AS BIGINT) rn, CAST(0 AS BIGINT) doc_id,
        |         CAST(0 AS BIGINT) tokens, CAST(1 AS BIGINT) bin_id, CAST(0 AS BIGINT) fill
        |  FROM (SELECT DISTINCT lang, shard FROM r) g
        |  UNION ALL
        |  SELECT r.lang, r.shard, r.rn, r.doc_id, r.tokens,
        |    CASE WHEN st.fill > 0 AND st.fill + r.tokens > 200 THEN st.bin_id + 1 ELSE st.bin_id END,
        |    CASE WHEN st.fill > 0 AND st.fill + r.tokens > 200 THEN r.tokens ELSE st.fill + r.tokens END
        |  FROM st JOIN r ON r.lang = st.lang AND r.shard = st.shard AND r.rn = st.rn + 1
        |)
        |SELECT lang, shard, doc_id, tokens, bin_id, fill AS fill_after
        |FROM st WHERE rn > 0 ORDER BY lang, shard, doc_id""".stripMargin,
    // P4: D7's component closure + a deterministic md5 draw on the
    // CLUSTER id — near-dup docs share a cluster, hence a split.
    "p_split_leakproof" -> (s"WITH RECURSIVE $minhashPairsCtes,\n" +
      """arcs AS (SELECT doc_a s, doc_b dd FROM mpairs
        |          UNION ALL SELECT doc_b, doc_a FROM mpairs),
        |reach AS (
        |  SELECT s AS node, dd AS r FROM arcs
        |  UNION
        |  SELECT reach.node, arcs.dd FROM reach JOIN arcs ON arcs.s = reach.r
        |),
        |lbl AS (SELECT node, LEAST(node, MIN(r)) lbl FROM reach GROUP BY node),
        |cl AS (SELECT d.doc_id, COALESCE(l.lbl, d.doc_id) AS cluster_id
        |       FROM documents d LEFT JOIN lbl l ON d.doc_id = l.node)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN CAST(('0x'||substr(md5('split:'||CAST(cluster_id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 90 THEN 'train'
        |       WHEN CAST(('0x'||substr(md5('split:'||CAST(cluster_id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM cl ORDER BY doc_id""".stripMargin),
    // P6: DSIR replay — unigram likelihood-ratio weights (add-1
    // smoothing, 6dp-rounded lns, decimal term sums) + the deterministic
    // Gumbel-max draw from the md5 hash; decimal key ⇒ identical order.
    "p_dsir_sample" ->
      """WITH w AS (SELECT doc_id, lang, unnest(string_split(lower(text),' ')) w FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) tf FROM w GROUP BY doc_id, w),
        |cnt AS (SELECT w, COUNT(*) cs, SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) ct FROM w GROUP BY w),
        |st AS (SELECT SUM(cs) ns, SUM(ct) nt, COUNT(*) v FROM cnt),
        |t AS (SELECT tf.doc_id,
        |        CAST(ROUND(tf.tf * ROUND(ln(CAST(cnt.ct+1 AS DOUBLE)/(st.nt+st.v))
        |                               - ln(CAST(cnt.cs+1 AS DOUBLE)/(st.ns+st.v)), 6), 6)
        |             AS DECIMAL(18,6)) term
        |      FROM tf JOIN cnt USING (w) CROSS JOIN st),
        |lw AS (SELECT doc_id, SUM(term) logw FROM t GROUP BY doc_id),
        |g AS (SELECT doc_id, logw,
        |       logw + CAST(ROUND(-ln(-ln((CAST(('0x'||substr(md5('dsir:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) + 0.5)
        |                                  / 1152921504606846976.0)), 6) AS DECIMAL(18,6)) gkey
        |      FROM lw)
        |SELECT doc_id, CAST(logw AS DOUBLE) AS logw, CAST(gkey AS DOUBLE) AS gkey
        |FROM g ORDER BY gkey DESC, doc_id LIMIT 100""".stripMargin,
    // P9: temperature-scaled source quotas — s_i = round(n_i^0.5, 6) as
    // DECIMAL (exact share sum), quota_i = floor(200·(s_i/S)) with the
    // divide-then-multiply order written identically on both engines
    // (IEEE double), membership = the per-source lowest-hash rank.
    "p_temperature_sample" ->
      """WITH w AS (SELECT source, COUNT(*) n FROM documents GROUP BY source),
        |ws AS (SELECT source, CAST(ROUND(pow(CAST(n AS DOUBLE), 0.5), 6) AS DECIMAL(18,6)) sw FROM w),
        |t AS (SELECT SUM(sw) tw FROM ws),
        |q AS (SELECT source, CAST(FLOOR(200 * (CAST(sw AS DOUBLE) / CAST(tw AS DOUBLE))) AS BIGINT) quota
        |      FROM ws, t),
        |r AS (SELECT source, doc_id,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY source
        |         ORDER BY CAST(('0x'||substr(md5('temp:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT), doc_id)
        |        AS BIGINT) rk
        |      FROM documents)
        |SELECT r.source, r.rk, r.doc_id FROM r JOIN q USING (source)
        |WHERE r.rk <= q.quota ORDER BY source, rk""".stripMargin,
    // P10: PSI replay — integer epoch-micro midpoint split, fixed-width
    // clamped bins, Laplace-smoothed shares with every operand cast to
    // DOUBLE before +0.5 (a bare BIGINT + 0.5 is DECIMAL arithmetic in
    // DuckDB — not IEEE), 6dp-rounded terms, exact DECIMAL total.
    "p_drift_psi" ->
      """WITH span AS (SELECT MIN(epoch_us(ts)) t0, MAX(epoch_us(ts)) t1 FROM events),
        |m AS (SELECT t0 + (t1 - t0) // 2 AS mid FROM span),
        |b AS (SELECT CAST(LEAST(GREATEST(FLOOR(value / CAST(25.0 AS DOUBLE)), 0.0), 19.0) AS INT) bin,
        |       CASE WHEN epoch_us(ts) < m.mid THEN 'base' ELSE 'cur' END side
        |      FROM events, m),
        |c AS (SELECT bin,
        |       SUM(CASE WHEN side='base' THEN 1 ELSE 0 END) n_base,
        |       SUM(CASE WHEN side='cur' THEN 1 ELSE 0 END) n_cur
        |      FROM b GROUP BY bin),
        |p AS (SELECT bin, CAST(n_base AS BIGINT) n_base, CAST(n_cur AS BIGINT) n_cur,
        |       (CAST(n_base AS DOUBLE) + 0.5) / (CAST(SUM(n_base) OVER () AS DOUBLE) + 10.0) pp,
        |       (CAST(n_cur AS DOUBLE) + 0.5) / (CAST(SUM(n_cur) OVER () AS DOUBLE) + 10.0) qq
        |      FROM c),
        |tm AS (SELECT bin, n_base, n_cur, ROUND((pp - qq) * ln(pp / qq), 6) psi_term FROM p)
        |SELECT bin, n_base, n_cur, psi_term,
        |  ROUND(CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) OVER () AS DOUBLE), 6) AS psi_total
        |FROM tm ORDER BY bin""".stripMargin,
    // P7: shard = md5 draw % 8, pos = rank of the same draw within the
    // shard — the whole layout rides one deterministic hash, so both
    // engines produce the identical shuffle.
    "p_shuffle_shards" ->
      """SELECT CAST(h % 8 AS INT) AS shard,
        | CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS BIGINT) AS pos,
        | doc_id
        |FROM (SELECT doc_id,
        |        CAST(('0x'||substr(md5('shuffle:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS h
        |      FROM documents) t
        |ORDER BY shard, pos""".stripMargin,
    // P13: P9's temperature discipline (6dp DECIMAL weights, identical
    // IEEE share products) over per-source token counts.
    "p_mix_budget" ->
      """WITH t AS (SELECT source, CAST(SUM(len(string_split(text,' '))) AS BIGINT) n_tokens
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, n_tokens,
        |        CAST(ROUND(pow(CAST(n_tokens AS DOUBLE), 0.5), 6) AS DECIMAL(18,6)) sw
        |      FROM t),
        |s AS (SELECT SUM(sw) tw FROM w),
        |q AS (SELECT w.source, w.n_tokens,
        |        ROUND(CAST(w.sw AS DOUBLE)/CAST(s.tw AS DOUBLE), 6) AS share,
        |        CAST(FLOOR(1000000 * (CAST(w.sw AS DOUBLE)/CAST(s.tw AS DOUBLE))) AS BIGINT) AS quota
        |      FROM w CROSS JOIN s)
        |SELECT source, n_tokens, share, quota, rate,
        |  CAST(CEIL(rate) AS BIGINT) AS epochs
        |FROM (SELECT *, ROUND(CAST(quota AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6) AS rate
        |      FROM q) ORDER BY source""".stripMargin,
    // P12: the T13 tier CTE assigns the phase, then the P7 shard/pos
    // window replays inside each (phase, shard) group.
    "p_curriculum" ->
      """WITH q AS (
        | SELECT doc_id,
        |  ROUND(CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('the','a','of','and'))) AS DOUBLE)
        |     / len(string_split(lower(text),' '))
        |   - CAST(length(regexp_replace(text,'[^.,;:!?]','','g')) AS DOUBLE) / length(text)
        |   + LEAST(1.0, CAST(len(string_split(lower(text),' ')) AS DOUBLE)/100.0), 4) AS quality
        | FROM documents),
        |c AS (SELECT ROUND(quantile_cont(quality, 0.25), 4) c1,
        |             ROUND(quantile_cont(quality, 0.5), 4) c2,
        |             ROUND(quantile_cont(quality, 0.75), 4) c3 FROM q),
        |t AS (SELECT doc_id,
        |        CAST(CASE WHEN quality > c3 THEN 4 WHEN quality > c2 THEN 3
        |                  WHEN quality > c1 THEN 2 ELSE 1 END AS BIGINT) AS phase,
        |        CAST(('0x'||substr(md5('curriculum:'||CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS h
        |      FROM q CROSS JOIN c)
        |SELECT phase, CAST(h % 8 AS INT) AS shard,
        | CAST(ROW_NUMBER() OVER (PARTITION BY phase, h % 8 ORDER BY h, doc_id) - 1 AS BIGINT) AS pos,
        | doc_id
        |FROM t ORDER BY phase, shard, pos""".stripMargin,
    // P8: z-order replay — per-dim ROW_NUMBER → equal-depth 8-bit bucket
    // (exact integer floor division), Morton interleave as plain bit
    // arithmetic, shard = equal-depth cut of the z rank. All-integer.
    "p_zorder_layout" ->
      """WITH l AS (SELECT o_orderkey ok, o_orderdate od, o_custkey ck FROM orders),
        |n AS (SELECT COUNT(*) n FROM l),
        |rd AS (SELECT ok, ROW_NUMBER() OVER (ORDER BY od, ok) - 1 AS r FROM l),
        |rp AS (SELECT ok, ROW_NUMBER() OVER (ORDER BY ck, ok) - 1 AS r FROM l),
        |b AS (SELECT rd.ok, (rd.r*256)//n.n AS bd, (rp.r*256)//n.n AS bp
        |      FROM rd JOIN rp ON rd.ok=rp.ok CROSS JOIN n),
        |z AS (SELECT ok, CAST(
        |   ((bd>>0)&1)*2+((bd>>1)&1)*8+((bd>>2)&1)*32+((bd>>3)&1)*128
        |  +((bd>>4)&1)*512+((bd>>5)&1)*2048+((bd>>6)&1)*8192+((bd>>7)&1)*32768
        |  +((bp>>0)&1)*1+((bp>>1)&1)*4+((bp>>2)&1)*16+((bp>>3)&1)*64
        |  +((bp>>4)&1)*256+((bp>>5)&1)*1024+((bp>>6)&1)*4096+((bp>>7)&1)*16384
        |  AS BIGINT) AS z FROM b),
        |zr AS (SELECT ok, z, ROW_NUMBER() OVER (ORDER BY z, ok) - 1 AS r FROM z)
        |SELECT ok, z, CAST((zr.r*16)//n.n AS BIGINT) AS shard
        |FROM zr CROSS JOIN n ORDER BY ok""".stripMargin,
    // P11: the metrics row replays as plain aggregates; thresholds CAST
    // to DOUBLE on both engines (bare 1.0 is DECIMAL in either SQL
    // dialect), pass decided from the 6dp-rounded metric.
    "p_quality_checks" ->
      """WITH m AS (SELECT COUNT(*) n, COUNT(DISTINCT doc_id) n_ids,
        |  SUM(CASE WHEN text IS NOT NULL AND len(text) > 0 THEN 1 ELSE 0 END) n_text,
        |  SUM(CASE WHEN lang IS NOT NULL AND len(lang) = 2 THEN 1 ELSE 0 END) n_lang,
        |  SUM(CASE WHEN n_chars = len(text) THEN 1 ELSE 0 END) n_consis,
        |  SUM(CASE WHEN source IS NOT NULL AND len(source) > 0 THEN 1 ELSE 0 END) n_src
        | FROM documents)
        |SELECT rule, ROUND(metric, 6) AS metric, threshold,
        |  ROUND(metric, 6) >= threshold AS pass
        |FROM (
        | SELECT 'chars_consistent' AS rule, CAST(n_consis AS DOUBLE)/nullif(CAST(n AS DOUBLE), CAST(0.0 AS DOUBLE)) AS metric, CAST(1.0 AS DOUBLE) AS threshold FROM m
        | UNION ALL SELECT 'doc_id_unique', CAST(n_ids AS DOUBLE)/nullif(CAST(n AS DOUBLE), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE) FROM m
        | UNION ALL SELECT 'lang_wellformed', CAST(n_lang AS DOUBLE)/nullif(CAST(n AS DOUBLE), CAST(0.0 AS DOUBLE)), CAST(0.99 AS DOUBLE) FROM m
        | UNION ALL SELECT 'row_count', CAST(n AS DOUBLE), CAST(1.0 AS DOUBLE) FROM m
        | UNION ALL SELECT 'source_complete', CAST(n_src AS DOUBLE)/nullif(CAST(n AS DOUBLE), CAST(0.0 AS DOUBLE)), CAST(0.99 AS DOUBLE) FROM m
        | UNION ALL SELECT 'text_complete', CAST(n_text AS DOUBLE)/nullif(CAST(n AS DOUBLE), CAST(0.0 AS DOUBLE)), CAST(0.999 AS DOUBLE) FROM m
        |) z ORDER BY rule""".stripMargin,
    "p_data_card" ->
      """SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
        | COUNT(*) AS n_docs,
        | CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        | COUNT(DISTINCT md5(text)) AS n_unique,
        | ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6) AS dup_frac,
        | COUNT(DISTINCT lang) AS n_langs,
        | ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
        |FROM documents GROUP BY ROLLUP(source) ORDER BY source""".stripMargin,
    "s_window_agg" ->
      """SELECT make_timestamp(CAST(floor(epoch(ts)/300)*300*1000000 AS BIGINT)) AS win_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // sliding 10-min/5-min windows: every event belongs to exactly two
    // windows, generated by the k∈{0,1} unnest
    "s_sliding_agg" ->
      """SELECT make_timestamp(CAST((floor(epoch(ts)/300) - k)*300*1000000 AS BIGINT)) AS win_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest(range(0,2)) AS k) t
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "s_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events),
        |l AS (SELECT user_id, event_id, ts,
        |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) pts FROM e),
        |n AS (SELECT user_id, event_id, ts,
        |  CASE WHEN pts IS NULL OR epoch_us(ts)-epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END ns FROM l),
        |ss AS (SELECT user_id, ts,
        |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) sess_id
        | FROM n)
        |SELECT user_id, sess_id, COUNT(*) AS n_events, MIN(ts) AS sess_start, MAX(ts) AS sess_end
        |FROM ss GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,
    "s_funnel" ->
      """SELECT funnel_stage, COUNT(*) AS n_users FROM (
        | SELECT user_id,
        |  CASE WHEN mv IS NOT NULL AND mc > mv AND mp > mc THEN 3
        |       WHEN mv IS NOT NULL AND mc > mv THEN 2
        |       WHEN mv IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage
        | FROM (
        |  SELECT user_id,
        |   MIN(CASE WHEN event_type='view' THEN ts END) mv,
        |   MIN(CASE WHEN event_type='click' THEN ts END) mc,
        |   MIN(CASE WHEN event_type='purchase' THEN ts END) mp
        |  FROM events GROUP BY user_id) t) t2
        |GROUP BY funnel_stage ORDER BY funnel_stage""".stripMargin,
    "s_event_dedup" ->
      """SELECT user_id, event_type,
        | date_trunc('minute', CAST(ts AS TIMESTAMP)) AS win_minute,
        | MIN(event_id) AS first_event_id, COUNT(*) AS n_dups
        |FROM events GROUP BY 1,2,3 ORDER BY user_id, event_type, win_minute""".stripMargin,
    "s_recent_history" ->
      """WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) ts FROM events),
        |mx AS (SELECT MAX(epoch_us(ts)) max_us FROM e),
        |live AS (SELECT e.* FROM e, mx WHERE epoch_us(ts) >= max_us - 86400000000),
        |r AS (SELECT user_id, event_id, event_type, ts,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS BIGINT) rn
        | FROM live)
        |SELECT user_id, rn, event_id, ts, event_type FROM r WHERE rn <= 10
        |ORDER BY user_id, rn""".stripMargin,
    "s_props_stats" ->
      """SELECT event_type, COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
        | MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type, TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) k
        |      FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Anomaly flags: values pass through DECIMAL so windowed sums are
    // exact at any frame-evaluation order; mean/σ derive from the exact
    // sums through the identical IEEE expression shape; the flag compares
    // UNROUNDED quantities on both engines.
    "s_value_anomaly" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts, value,
        |            CAST(value AS DECIMAL(18,6)) vd FROM events),
        |w AS (SELECT event_id, user_id, value,
        |        COUNT(vd) OVER fr AS n,
        |        SUM(vd) OVER fr AS sum_d,
        |        SUM(vd*vd) OVER fr AS sumsq_d
        |      FROM e WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, value,
        |  ROUND(CAST(sum_d AS DOUBLE)/n, 6) AS mean,
        |  ROUND(sqrt(GREATEST(0.0,
        |    (CAST(sumsq_d AS DOUBLE) - CAST(sum_d AS DOUBLE)*CAST(sum_d AS DOUBLE)/n)/(n-1))), 6) AS sigma,
        |  abs(value - CAST(sum_d AS DOUBLE)/n) > 3.0*sqrt(GREATEST(0.0,
        |    (CAST(sumsq_d AS DOUBLE) - CAST(sum_d AS DOUBLE)*CAST(sum_d AS DOUBLE)/n)/(n-1))) AS is_anomaly
        |FROM w WHERE n >= 3 ORDER BY event_id""".stripMargin,
    "s_enrich" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        | c_name, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY user_id, event_id""".stripMargin,
    "s_scd2_dim" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts, event_type FROM events),
        |l AS (SELECT user_id, event_id, ts, event_type,
        |       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev FROM e),
        |ch AS (SELECT user_id, ts, event_type AS state, event_id FROM l
        |       WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
        |  state, ts AS eff_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
        |FROM ch ORDER BY user_id, version""".stripMargin,
    // S16: lag pairs → |types|² count frame; the probability divides two
    // exact counts with both operands cast DOUBLE (IEEE on both engines).
    "s_transitions" ->
      """WITH l AS (SELECT user_id, ts, event_id, event_type,
        |       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_type
        |      FROM events),
        |c AS (SELECT prev_type, event_type, COUNT(*) n FROM l
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, CAST(n AS BIGINT) AS n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
        |FROM c ORDER BY prev_type, event_type""".stripMargin,
    // J3: the dim replay is s_scd2_dim's CTE over the NON-purchase stream
    // (the activity-state dimension); the lookup itself is the half-open
    // interval LEFT join (empty [t,t) intervals from same-instant double
    // changes match nothing, so at most one version per purchase — the
    // Spark side's carry-forward keeps the max version at equal ts, and
    // a purchase before any activity keeps null version/state).
    "j_scd2_lookup" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts, event_type, value FROM events),
        |a AS (SELECT * FROM e WHERE event_type <> 'purchase'),
        |l AS (SELECT user_id, event_id, ts, event_type,
        |       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev FROM a),
        |ch AS (SELECT user_id, ts, event_type AS state, event_id FROM l
        |       WHERE prev IS NULL OR prev <> event_type),
        |dim AS (SELECT user_id,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
        |         state, ts AS eff_from,
        |         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
        |        FROM ch),
        |f AS (SELECT user_id, event_id purchase_id, ts, value FROM e WHERE event_type = 'purchase')
        |SELECT f.user_id, f.purchase_id, f.ts, dim.version, dim.state, f.value
        |FROM f LEFT JOIN dim ON f.user_id = dim.user_id
        | AND dim.eff_from <= f.ts AND (dim.eff_to IS NULL OR f.ts < dim.eff_to)
        |ORDER BY f.user_id, f.ts, purchase_id""".stripMargin,
    // The place_order greedy fold (accept iff qty fits remaining stock,
    // rejects consume nothing) is a per-key recursion — expressed in
    // DuckDB as a recursive CTE stepping through each part's request log.
    "s_place_order" ->
      """WITH RECURSIVE
        |req AS (SELECT l_partkey pk, l_quantity qty,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber) AS BIGINT) rn
        |        FROM lineitem),
        |st AS (
        |  SELECT p_partkey pk, CAST(0 AS BIGINT) rn, CAST(p_size*10 AS DOUBLE) avail,
        |         CAST(0 AS DOUBLE) qty, FALSE acc
        |  FROM part
        |  UNION ALL
        |  SELECT r.pk, r.rn,
        |    CASE WHEN r.qty <= st.avail THEN st.avail - r.qty ELSE st.avail END,
        |    r.qty, r.qty <= st.avail
        |  FROM st JOIN req r ON r.pk = st.pk AND r.rn = st.rn + 1
        |)
        |SELECT pk AS part, COUNT(*) AS n_requests,
        |  CAST(COUNT(*) FILTER (WHERE acc) AS BIGINT) AS n_accepted,
        |  CAST(COUNT(*) FILTER (WHERE NOT acc) AS BIGINT) AS n_rejected,
        |  CAST(SUM(CAST(CASE WHEN acc THEN qty ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS qty_accepted,
        |  CAST(MIN(avail) AS DOUBLE) AS stock_left
        |FROM st WHERE rn > 0 GROUP BY pk ORDER BY part""".stripMargin,
    // As-of join expressed as the same carry-forward window on both
    // engines (portable; DuckDB's ASOF JOIN keyword would match too).
    "j_asof_attribution" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts,
        |             CASE WHEN event_type='view' THEN 0 ELSE 1 END tag
        |           FROM events WHERE event_type IN ('view','purchase')),
        |w AS (SELECT *,
        |  LAST_VALUE(CASE WHEN tag=0 THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) view_id,
        |  LAST_VALUE(CASE WHEN tag=0 THEN ts END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) view_ts
        | FROM e)
        |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, view_id, view_ts,
        |  epoch_us(ts) - epoch_us(view_ts) AS lag_us
        |FROM w WHERE tag=1 ORDER BY user_id, purchase_ts, purchase_id""".stripMargin,
    // Forward as-of with tolerance: the DESC carry-forward window mirrors
    // the Spark plan exactly; the CASE nulls out matches past the 1 h bar.
    "j_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts,
        |             CASE WHEN event_type='view' THEN 0 ELSE 1 END tag
        |           FROM events WHERE event_type IN ('view','purchase')),
        |w AS (SELECT *,
        |  LAST_VALUE(CASE WHEN tag=1 THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts DESC, tag DESC, event_id DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) p_id,
        |  LAST_VALUE(CASE WHEN tag=1 THEN ts END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts DESC, tag DESC, event_id DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) p_ts
        | FROM e),
        |m AS (SELECT user_id, event_id AS view_id, ts AS view_ts, p_id, p_ts,
        |        epoch_us(p_ts) - epoch_us(ts) AS gap_us
        |      FROM w WHERE tag=0)
        |SELECT user_id, view_id, view_ts,
        |  CASE WHEN gap_us <= 3600000000 THEN p_id END AS purchase_id,
        |  CASE WHEN gap_us <= 3600000000 THEN p_ts END AS purchase_ts,
        |  CASE WHEN gap_us <= 3600000000 THEN gap_us END AS lag_us
        |FROM m ORDER BY user_id, view_ts, view_id""".stripMargin,
    // Interval-overlap join: the oracle states the overlap predicate
    // directly on the session intervals (sessions = the s_sessionize
    // CTE chain); the Spark side proves the grid-bucketed equi-join with
    // the count-once-at-the-later-start rule computes the same relation.
    "j_interval_overlap" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events),
        |l AS (SELECT user_id, event_id, ts,
        |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) pts FROM e),
        |n AS (SELECT user_id, event_id, ts,
        |  CASE WHEN pts IS NULL OR epoch_us(ts)-epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END ns FROM l),
        |ss AS (SELECT user_id, ts,
        |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) sess_id
        | FROM n),
        |sess AS (SELECT user_id, sess_id, epoch_us(MIN(ts)) lo, epoch_us(MAX(ts)) hi
        |         FROM ss GROUP BY user_id, sess_id)
        |SELECT s.user_id, s.sess_id, COUNT(o.user_id) AS n_concurrent
        |FROM sess s LEFT JOIN sess o
        |  ON o.user_id <> s.user_id AND s.lo <= o.hi AND o.lo <= s.hi
        |GROUP BY s.user_id, s.sess_id
        |ORDER BY s.user_id, s.sess_id""".stripMargin,
    // Range join: the oracle states the interval condition directly; the
    // Spark side proves the bucketed equi-join computes the same relation.
    "j_range_promo" ->
      """WITH promos(promo_id, start_ts, end_ts) AS (VALUES
        |  (1, TIMESTAMP '1995-02-01', TIMESTAMP '1995-07-01'),
        |  (2, TIMESTAMP '1996-11-15', TIMESTAMP '1997-02-15'),
        |  (3, TIMESTAMP '1997-01-01', TIMESTAMP '1998-01-01'),
        |  (4, TIMESTAMP '1997-06-10', TIMESTAMP '1997-06-20'),
        |  (5, TIMESTAMP '1999-12-01', TIMESTAMP '2000-03-01'))
        |SELECT promo_id, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN promos
        |  ON l_shipdate >= start_ts AND l_shipdate < end_ts
        |GROUP BY promo_id ORDER BY promo_id""".stripMargin,
    // G15: recursive-CTE replay of the fixed Bellman-Ford rounds — the
    // working table carries the full distance frame each round (cost-0
    // self-loops keep settled nodes alive), the per-(landmark,node) min
    // via the window-rank trick (aggregation is illegal in a recursive
    // term; g_kcore's precedent). Exact BIGINT costs ⇒ identical on
    // both engines.
    "g_weighted_paths" ->
      """WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
        |e AS (SELECT a.pk src, b.pk dst, COUNT(*) w FROM lp a JOIN lp b ON a.ok=b.ok AND a.pk<b.pk GROUP BY 1,2),
        |nodes AS (SELECT DISTINCT n FROM (SELECT src n FROM e UNION ALL SELECT dst FROM e) u),
        |arcs AS (SELECT * FROM (
        |  SELECT src a, dst b, CAST(1000000 AS BIGINT) // w c FROM e
        |  UNION ALL SELECT dst, src, CAST(1000000 AS BIGINT) // w FROM e
        |  UNION ALL SELECT n, n, CAST(0 AS BIGINT) FROM nodes) u),
        |lm AS (SELECT n FROM nodes ORDER BY n LIMIT 3),
        |bf(iter, lmk, node, dist) AS (
        |  SELECT 0, n, n, CAST(0 AS BIGINT) FROM lm
        |  UNION ALL
        |  SELECT t.iter + 1, t.lmk, t.node, t.dist FROM (
        |    SELECT b.iter iter, b.lmk lmk, a.b node, b.dist + a.c dist,
        |      ROW_NUMBER() OVER (PARTITION BY b.lmk, a.b ORDER BY b.dist + a.c) rn
        |    FROM bf b JOIN arcs a ON a.a = b.node
        |    WHERE b.iter < 6) t
        |  WHERE t.rn = 1)
        |SELECT lmk AS landmark, node AS part, dist AS wcost
        |FROM bf WHERE iter = 6 ORDER BY landmark, part""".stripMargin,
    // R26: the windowed sums run on the exact DECIMAL daily revenue (a
    // sliding float sum's association order is engine-internal); only
    // the final ma7/wow is one IEEE division, rounded 6dp.
    "q_revenue_trend" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |       SUM(CAST(o_totalprice AS DECIMAL(18,6))) rev
        |      FROM orders GROUP BY 1)
        |SELECT day, CAST(rev AS DOUBLE) AS revenue,
        |  ROUND(CAST(SUM(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS ma7,
        |  ROUND(CAST(rev AS DOUBLE) / CAST(LAG(rev, 7) OVER (ORDER BY day) AS DOUBLE), 6) AS wow
        |FROM daily ORDER BY day""".stripMargin,
    // R27: quintile membership is integer arithmetic on (rank, n); the
    // oracle's plain ROW_NUMBER windows replay the scale-safe
    // rowNumberWithin ranks exactly (specced equivalence).
    "q_rfm_segments" ->
      """WITH base AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) last_order,
        |       COUNT(*) n_orders, SUM(CAST(o_totalprice AS DECIMAL(18,6))) rev
        |      FROM orders GROUP BY 1),
        |nn AS (SELECT COUNT(*) n FROM base),
        |r AS (SELECT b.o_custkey, b.last_order, b.n_orders,
        |       CAST(b.rev AS DOUBLE) revenue,
        |       ROW_NUMBER() OVER (ORDER BY b.last_order DESC, b.o_custkey) rk_r,
        |       ROW_NUMBER() OVER (ORDER BY b.n_orders DESC, b.o_custkey) rk_f,
        |       ROW_NUMBER() OVER (ORDER BY CAST(b.rev AS DOUBLE) DESC, b.o_custkey) rk_m
        |      FROM base b),
        |q AS (SELECT r.*, nn.n,
        |       CASE WHEN rk_r*5<=n THEN 1 WHEN rk_r*5<=2*n THEN 2
        |            WHEN rk_r*5<=3*n THEN 3 WHEN rk_r*5<=4*n THEN 4 ELSE 5 END b_r,
        |       CASE WHEN rk_f*5<=n THEN 1 WHEN rk_f*5<=2*n THEN 2
        |            WHEN rk_f*5<=3*n THEN 3 WHEN rk_f*5<=4*n THEN 4 ELSE 5 END b_f,
        |       CASE WHEN rk_m*5<=n THEN 1 WHEN rk_m*5<=2*n THEN 2
        |            WHEN rk_m*5<=3*n THEN 3 WHEN rk_m*5<=4*n THEN 4 ELSE 5 END b_m
        |      FROM r CROSS JOIN nn)
        |SELECT o_custkey AS c_custkey, last_order,
        |  CAST(n_orders AS BIGINT) AS n_orders, revenue,
        |  b_r AS r_bucket, b_f AS f_bucket, b_m AS m_bucket,
        |  CAST(b_r AS VARCHAR)||CAST(b_f AS VARCHAR)||CAST(b_m AS VARCHAR) AS rfm
        |FROM q ORDER BY c_custkey""".stripMargin,
    // S18: the rolling distinct replay — day-range join over the DEDUPED
    // (day,user) pair frame, never over raw events.
    // S20: the KMV sketch is a pure fact of the data (bottom-k of a
    // deterministic md5-derived hash), so the oracle replays the sketch
    // itself: same bottom-k sets, same exact-regime CASE branches, same
    // (k−1)·2^60/θ estimator expression, 6dp.
    "s_audience_overlap" ->
      """WITH uh AS (SELECT DISTINCT event_type t,
        |        CAST(('0x'||substr(md5('aud:'||CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) h FROM events),
        |km AS (SELECT t, h FROM (
        |        SELECT t, h, ROW_NUMBER() OVER (PARTITION BY t ORDER BY h) rk FROM uh) z
        |       WHERE rk <= 64),
        |pt AS (SELECT t, COUNT(*) n, MAX(h) kth FROM km GROUP BY t),
        |pe AS (SELECT t, CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
        |         ELSE 63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END est FROM pt),
        |pairs AS (SELECT a.t ta, b.t tb FROM pt a JOIN pt b ON a.t < b.t),
        |pu AS (SELECT ta, tb, h, COUNT(*) sides FROM km
        |       JOIN pairs ON km.t = ta OR km.t = tb GROUP BY 1, 2, 3),
        |pr AS (SELECT ta, tb, h, sides FROM (
        |        SELECT ta, tb, h, sides,
        |          ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) rk FROM pu) z
        |       WHERE rk <= 64),
        |pa AS (SELECT ta, tb, COUNT(*) ku, MAX(h) kthu,
        |         SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) nboth
        |       FROM pr GROUP BY 1, 2)
        |SELECT ta AS t_a, tb AS t_b,
        |  ROUND(ea.est, 6) AS est_a, ROUND(eb.est, 6) AS est_b,
        |  ROUND(CASE WHEN ku < 64 THEN CAST(ku AS DOUBLE)
        |    ELSE 63.0 * 1152921504606846976.0 / CAST(kthu AS DOUBLE) END, 6) AS est_union,
        |  ROUND(CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE), 6) AS est_jaccard,
        |  ROUND(CAST(nboth AS DOUBLE) / CAST(ku AS DOUBLE)
        |    * (CASE WHEN ku < 64 THEN CAST(ku AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0 / CAST(kthu AS DOUBLE) END), 6) AS est_intersection
        |FROM pa JOIN pe ea ON ea.t = ta JOIN pe eb ON eb.t = tb
        |ORDER BY t_a, t_b""".stripMargin,
    "s_rolling_actives" ->
      """WITH du AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) d, user_id FROM events),
        |days AS (SELECT DISTINCT d AS day FROM du),
        |dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) dau FROM du GROUP BY 1),
        |w AS (SELECT days.day, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) active_7d
        |      FROM days JOIN du ON du.d BETWEEN days.day - 6 AND days.day GROUP BY 1)
        |SELECT dau.day, dau.dau, w.active_7d
        |FROM dau JOIN w ON dau.day = w.day ORDER BY dau.day""".stripMargin,
  )
}
