package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every query name maps 1:1 to a SURVEY §2 line; oracleSql carries the
  * DuckDB-equivalent ANSI SQL for the hash-compare gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    MarketOps.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. event ingestion & organization
    "a1_latest_event_per_user"  -> EventOps.latestEventPerUser _,
    "a2_last_height_per_type"   -> EventOps.lastHeightPerType _,
    "a3_event_counts_by_type"   -> EventOps.eventCountsByType _,
    "a4_hourly_rollup"          -> EventOps.hourlyRollup _,
    "a5_sessionize"             -> EventOps.sessionize _,
    "a6_state_fold"             -> EventOps.stateFold _,
    "a7_funnel"                 -> EventOps.funnel _,
    "a8_dedup_events"           -> EventOps.dedupEvents _,
    "a9_stream_hourly"          -> graft.streaming.EventStream.streamHourly _,
    "a10_stream_state"          -> graft.streaming.EventStream.streamState _,
    "a11_props_stats"           -> EventOps.propsStats _,
    "a12_asof_attribution"      -> EventOps.asofAttribution _,
    "a13_stream_join"           -> graft.streaming.EventStream.streamJoin _,
    "a14_stream_asof"           -> graft.streaming.EventStream.streamAsof _,
    "a15_stream_asof_ooo"       -> graft.streaming.EventStream.streamAsofOoo _,
    "a16_retention_cohorts"     -> EventOps.retentionCohorts _,
    // a17: JoinFns.saltedJoin exercised on the 5-value event_type key —
    // result-identical to the plain join the oracle replays
    "a17_salted_type_join"      -> ((s: SparkSession, d: String) => EventOps.saltedTypeJoin(s, d)),
    "a18_hourly_anomaly"        -> ((s: SparkSession, d: String) => EventOps.hourlyAnomaly(s, d)),
    "a19_stream_anomaly"        -> graft.streaming.EventStream.streamAnomaly _,
    // C. deduplication
    "c1_dedup_exact"            -> DedupOps.dedupExact _,
    "c2_dedup_minhash"          -> ((s: SparkSession, d: String) => DedupOps.dedupMinhash(s, d)),
    "c3_dedup_simhash"          -> ((s: SparkSession, d: String) => DedupOps.dedupSimhash(s, d)),
    "c4_ngram_jaccard"          -> ((s: SparkSession, d: String) => DedupOps.ngramJaccard(s, d)),
    "c5_dedup_embedding"        -> ((s: SparkSession, d: String) => DedupOps.dedupEmbedding(s, d)),
    "c6_dedup_clusters"         -> ((s: SparkSession, d: String) => DedupOps.dedupClusters(s, d)),
    "c7_cdc_chunks"             -> ((s: SparkSession, d: String) => DedupOps.cdcChunks(s, d)),
    "c8_dup_spans"              -> ((s: SparkSession, d: String) => DedupOps.dupSpans(s, d)),
    "c9_semdedup"               -> ((s: SparkSession, d: String) => DedupOps.semDedup(s, d)),
    "c10_dedup_cut"             -> ((s: SparkSession, d: String) => DedupOps.dedupCut(s, d)),
    "c11_semdedup_hier"         -> ((s: SparkSession, d: String) => DedupOps.semDedupHier(s, d)),
    // c12: incremental exact-normalized dedup — sharded-bloom
    // membership gate in front of the exact verify join (the bloom
    // only prunes, never decides, so the oracle replays it as a plain
    // normalized-key join)
    "c12_bloom_dedup"           -> ((s: SparkSession, d: String) => DedupOps.bloomDedup(s, d)),
    // c12b (round 14): c12 over the LANDED shard-bloom + fingerprint
    // store (ensureBloom gate) — the history corpus is never read;
    // the recurring per-recrawl membership-gate cost, driver-checked
    "c12b_bloom_indexed"        -> ((s: SparkSession, d: String) => {
      graft.sources.Warehouse.ensureBloom(s, d)
      graft.sources.Warehouse.bloomDedupIndexed(s, d) }),
    // D. similarity search
    "d1_ann_bruteforce"         -> ((s: SparkSession, d: String) => SimOps.annBruteforce(s, d)),
    "d2_ann_lsh"                -> ((s: SparkSession, d: String) => SimOps.annLsh(s, d)),
    "d3_embedding_stats"        -> SimOps.embeddingStats _,
    "d4_ann_topk_agg"           -> ((s: SparkSession, d: String) => SimOps.annTopKAgg(s, d)),
    "d5_ann_ivf"                -> ((s: SparkSession, d: String) => SimOps.annIvf(s, d)),
    "d6_ann_range"              -> ((s: SparkSession, d: String) => SimOps.annRange(s, d)),
    "d7_ann_filtered"           -> ((s: SparkSession, d: String) => SimOps.annFiltered(s, d)),
    "d8_embedding_quantize"     -> SimOps.embeddingQuantize _,
    // F. multimodal plumbing (stubbed decoder; rows-only + spec)
    "f1_multimodal_meta"        -> MultimodalOps.multimodalMeta _,
    "f2_frame_sample"           -> ((s: SparkSession, d: String) => MultimodalOps.frameSample(s, d)),
    "f3_media_by_lang"          -> MultimodalOps.mediaByLang _,
    "f4_audio_windows"          -> ((s: SparkSession, d: String) => MultimodalOps.audioWindows(s, d)),
    "f5_resize_images"          -> ((s: SparkSession, d: String) => MultimodalOps.resizeImages(s, d)),
    // f6: perceptual-hash image near-dup (real ImageIO aHash arm;
    // deterministic simhash stub is the live arm on synthetic data)
    "f6_image_neardup"          -> ((s: SparkSession, d: String) => MultimodalOps.imageNearDup(s, d)),
    // f7: the incremental form — arriving image batch vs the standing
    // catalog only (the crawler gate; landed twin in Warehouse)
    "f7_image_neardup_incr"     -> ((s: SparkSession, d: String) => MultimodalOps.imageNearDupIncremental(s, d)),
    // f7b (round 14): f7 over the LANDED standing index — ensurePhash
    // gates the build (first touch pays it), the probe hashes ONLY the
    // arriving batch; f7 stays registered as the index-recompute foil
    "f7b_image_indexed"         -> ((s: SparkSession, d: String) => {
      graft.sources.Warehouse.ensurePhash(s, d)
      graft.sources.Warehouse.imageNearDupIndexed(s, d) }),
    // f8 (round 12): audio near-dup — delta-sign fingerprints over the
    // f4 window grid through the f6 band/cap/verify machinery
    "f8_audio_neardup"          -> ((s: SparkSession, d: String) => MultimodalOps.audioNearDup(s, d)),
    // f8b (round 13): incremental audio near-dup — arriving batch
    // labeled against the standing catalog only (the f7 split on f8's
    // fingerprints); landed/streaming forms in Warehouse.buildAudio +
    // CorpusStream.audioGate
    "f8b_audio_neardup_incr"    -> ((s: SparkSession, d: String) => MultimodalOps.audioNearDupIncremental(s, d)),
    // f8c (round 14): f8b over the LANDED standing index (ensureAudio
    // gate; only the arriving batch fingerprints per run)
    "f8c_audio_indexed"         -> ((s: SparkSession, d: String) => {
      graft.sources.Warehouse.ensureAudio(s, d)
      graft.sources.Warehouse.audioNearDupIndexed(s, d) }),
    // P. pipeline compositions
    "p1_corpus_prep"            -> ((s: SparkSession, d: String) => PipelineOps.corpusPrep(s, d)),
    "p2_decontaminate"          -> ((s: SparkSession, d: String) => PipelineOps.decontaminate(s, d)),
    "p3_fuzzy_dedup"            -> ((s: SparkSession, d: String) => PipelineOps.fuzzyDedup(s, d)),
    "p4_stratified_sample"      -> ((s: SparkSession, d: String) => PipelineOps.stratifiedSample(s, d)),
    "p5_stream_ingest"          -> graft.streaming.CorpusStream.streamIngest _,
    "p6_token_budget_mix"       -> ((s: SparkSession, d: String) => PipelineOps.tokenBudgetMix(s, d)),
    "p7_temperature_mix"        -> ((s: SparkSession, d: String) => PipelineOps.temperatureMix(s, d)),
    "p8_sequence_pack"          -> ((s: SparkSession, d: String) => PipelineOps.sequencePack(s, d)),
    "p9_filter_funnel"          -> ((s: SparkSession, d: String) => PipelineOps.filterFunnel(s, d)),
    "p10_holdout_split"         -> PipelineOps.holdoutSplit _,
    // incremental (cross-batch) fuzzy dedup: arriving docs labeled
    // against the standing corpus' LSH band index
    "p11_incremental_dedup"     -> ((s: SparkSession, d: String) => DedupOps.incrementalMinhash(s, d)),
    // p11b (round 14): p11 over the LANDED standing index
    // (ensureMinhash gate; the batch side alone computes per run —
    // the ×100-measured 6.7× vs 23.3× production curve, now
    // driver-checked like e16b/d12)
    "p11b_incremental_indexed"  -> ((s: SparkSession, d: String) => {
      graft.sources.Warehouse.ensureMinhash(s, d)
      graft.sources.Warehouse.incrementalMinhashIndexed(s, d) }),
    // b56 (round 13): the reference's OrderAndTokenCountCheck cron
    // (data-check.service.ts:24) as a reconciliation query
    "b56_consistency_audit"     -> ((s: SparkSession, d: String) => MarketOps.consistencyAudit(s, d)),
    // source-level (domain) filtering: per-source volume/dup/quality
    // verdicts against a self-calibrating median cut
    "p12_source_filter"         -> PipelineOps.sourceFilter _,
    // E. text analysis
    "e1_token_stats"            -> TextOps.tokenStats _,
    "e2_quality_score"          -> TextOps.qualityScore _,
    "e3_lang_id"                -> TextOps.langId _,
    "e4_fingerprint"            -> TextOps.fingerprint _,
    "e5_rolling_fingerprint"    -> TextOps.rollingFingerprint _,
    "e6_ngram_freq"             -> ((s: SparkSession, d: String) => TextOps.ngramFreq(s, d)),
    "e7_dup_ngram_ratio"        -> ((s: SparkSession, d: String) => TextOps.dupNgramRatio(s, d)),
    "e8_pii_scrub"              -> TextOps.piiScrub _,
    "e9_para_dedup"             -> ((s: SparkSession, d: String) => TextOps.paraDedup(s, d)),
    "e10_top_ngram_share"       -> TextOps.topNgramShare _,
    "e11_unigram_logprob"       -> ((s: SparkSession, d: String) => TextOps.unigramLogprob(s, d)),
    "e12_gopher_rules"          -> TextOps.gopherRules _,
    "e13_bigram_logprob"        -> ((s: SparkSession, d: String) => TextOps.bigramLogprob(s, d)),
    // e14 (round 10): learned byte-level BPE token accounting.
    // Hash-green since round 12: the encode replays in DuckDB as a
    // recursive CTE with the trained merges interpolated as literals
    // (TextOps.bpeOracleSql, dumped via oracleSqlFor); TextOpsSpec's
    // doc-by-doc JVM recompute stays as the independent check.
    "e14_bpe_token_stats"       -> ((s: SparkSession, d: String) => TextOps.bpeTokenStats(s, d)),
    "e14b_bpe_accounting"       -> TextOps.bpeAccounting _,
    "e15_word_entropy"          -> TextOps.wordEntropy _,
    // e16 (round 12): BM25 ranked retrieval — the inverted-index
    // keyword search b7/b25's LIKE filters stop short of
    "e16_bm25_search"           -> ((s: SparkSession, d: String) => RetrievalOps.bm25Search(s, d)),
    // e16b (round 13): the same search through the LANDED term-bucketed
    // posting index (Warehouse.buildPostings) — probe-only per run, the
    // d10→d12 amortization applied to text retrieval
    "e16b_bm25_indexed"         -> ((s: SparkSession, d: String) => graft.sources.Warehouse.bm25Indexed(s, d)),
    // e16c (round 14): the DELETION demo — retract the doc_id % 17
    // slice via Warehouse.deleteDocs (tombstones + exact stats delta)
    // and probe the same landed index; hash-identical to BM25 over a
    // corpus that never held the deleted docs (own what-if scope, so
    // e16b is untouched)
    "e16c_bm25_deleted"         -> ((s: SparkSession, d: String) => RetrievalOps.bm25SearchDeleted(s, d)),
    // e16z (round 15): the landed BM25 probe over the deterministic
    // Zipf-vocabulary corpus (sources.ZipfCheck — synthesized, so the
    // sf dir is unused) — correctness on a NON-degenerate vocabulary
    // hash-proven through the standard DuckDB gate, whose replay
    // re-derives the corpus itself in SQL
    "e16z_bm25_zipf"            -> ((s: SparkSession, _: String) => RetrievalOps.bm25SearchZipf(s)),
    // e17 (round 12): learned NB quality classifier (counts-based
    // training replayed relationally in the oracle, the e3 pattern)
    "e17_quality_classifier"    -> ((s: SparkSession, d: String) => TextOps.qualityClassifier(s, d)),
    // e17b (round 13): scoring through the LANDED weight table
    // (Warehouse.buildNbModel) — no retraining pass per run; e17 stays
    // registered as the oracled one-shot foil
    "e17b_quality_indexed"      -> ((s: SparkSession, d: String) => TextOps.qualityClassifierIndexed(s, d)),
    // d17 (round 12): hybrid keyword+vector retrieval, RRF-fused over
    // e16's BM25 machinery and d13's fixed-|Q| IVF ranking
    "d17_hybrid_retrieval"      -> ((s: SparkSession, d: String) => RetrievalOps.hybridRetrieval(s, d)),
    // d17b (round 13): the same fusion with BOTH lists probing landed
    // indexes (posting table + IVF lists) — kills d17's three per-run
    // corpus passes; d17 stays registered as the oracled one-shot foil
    "d17b_hybrid_indexed"       -> ((s: SparkSession, d: String) => RetrievalOps.hybridRetrievalIndexed(s, d)),
    "d9_pq_quantize"            -> ((s: SparkSession, d: String) => SimOps.pqQuantize(s, d)),
    "d10_ann_ivfpq"             -> ((s: SparkSession, d: String) => SimOps.annIvfPq(s, d)),
    "d11_ann_incremental"       -> ((s: SparkSession, d: String) => SimOps.annIvfIncremental(s, d)),
    // d12: the LANDED-index probe (ensureIvf + DPP-pruned posting-list
    // scan) — first run in a JVM builds, later runs probe only
    "d12_ann_indexed"           -> ((s: SparkSession, d: String) => graft.sources.Warehouse.annIndexed(s, d)),
    // d12b (round 14): the vector-side deletion demo — deleteDocs on
    // the vec_id % 17 slice, then d12's probe (tombstoned vectors drop
    // from the posting hits before ADC; routing/codebook untouched)
    "d12b_ann_deleted"          -> ((s: SparkSession, d: String) => graft.sources.Warehouse.annIndexedDeleted(s, d)),
    // d13-d15 (round 10): the FIXED-|Q| production forms of d5/d10/d12.
    // The qmod batches grow with the corpus (|Q| = N/50), so their
    // scaled cost is Q·scan — quadratic in SF by WORKLOAD definition;
    // these hold the batch at SimOps.FixedQBatch vectors at any SF,
    // the curve a production deployment actually rides (query traffic
    // doesn't grow because the corpus did)
    "d13_ann_ivf_fixedq"        -> ((s: SparkSession, d: String) => SimOps.annIvf(s, d, nq = SimOps.FixedQBatch)),
    "d14_ann_ivfpq_fixedq"      -> ((s: SparkSession, d: String) => SimOps.annIvfPq(s, d, nq = SimOps.FixedQBatch)),
    "d15_ann_indexed_fixedq"    -> ((s: SparkSession, d: String) => graft.sources.Warehouse.annIndexed(s, d, nq = SimOps.FixedQBatch)),
    // d16: kNN label propagation over the fixed-|Q| batch — the
    // auto-labeling/label-audit application of the d4 TopK machinery
    "d16_knn_classify"          -> ((s: SparkSession, d: String) => SimOps.knnClassify(s, d)),
    // d16b (round 12): the same classification through the LANDED
    // IVF-PQ index — neighbor search = d15's DPP-pruned probe, vote
    // tail shared with d16; the exact d16 stays as the recall foil
    "d16b_knn_indexed"          -> ((s: SparkSession, d: String) => graft.sources.Warehouse.knnClassifyIndexed(s, d)),
    // B. marketplace/analytics
    "b1_pricing_summary"        -> MarketOps.pricingSummary _,
    "b2_top_sellers"            -> MarketOps.topSellers _,
    "b3_marketplace_listing"    -> MarketOps.marketplaceListing _,
    "b4_latest_order_per_customer" -> MarketOps.latestOrderPerCustomer _,
    "b5_collection_stats"       -> MarketOps.collectionStats _,
    "b6_revenue_by_nation"      -> MarketOps.revenueByNation _,
    "b7_keyword_search"         -> MarketOps.keywordSearch _,
    "b8_price_histogram"        -> MarketOps.priceHistogram _,
    "b9_union_history"          -> MarketOps.unionHistory _,
    "b10_earned_by_customer"    -> MarketOps.earnedByCustomer _,
    "b11_running_volume"        -> MarketOps.runningVolume _,
    "b12_first_sale"            -> MarketOps.firstSale _,
    "b13_attribute_facets"      -> MarketOps.attributeFacets _,
    "b14_priority_share"        -> MarketOps.priorityShare _,
    "b15_recent_listings"       -> MarketOps.recentListings _,
    "b16_token_history"         -> ((s: SparkSession, d: String) => MarketOps.tokenHistory(s, d)),
    "b17_user_transactions"     -> ((s: SparkSession, d: String) => MarketOps.userTransactions(s, d)),
    "b18_price_history_token"   -> ((s: SparkSession, d: String) => MarketOps.priceHistoryToken(s, d)),
    "b19_customer_profile"      -> MarketOps.customerProfile _,
    "b20_supplier_portfolio"    -> MarketOps.supplierPortfolio _,
    "b21_latest_bids"           -> MarketOps.latestBids _,
    "b22_collection_directory"  -> MarketOps.collectionDirectory _,
    "b23_platform_counts"       -> MarketOps.platformCounts _,
    // b24 is sketch-based (HLL++/quantile); its driver-checked output
    // is the exact columns + in-bound booleans (see the operator doc),
    // so the approximation is hash-gated without the oracle needing to
    // reproduce sketch internals.
    "b24_collection_stats_sketch" -> MarketOps.collectionStatsApprox _,
    "b25_global_search"         -> ((s: SparkSession, d: String) => MarketOps.globalSearch(s, d)),
    "b26_token_detail"          -> ((s: SparkSession, d: String) => MarketOps.tokenDetail(s, d)),
    "b27_collection_browse"     -> ((s: SparkSession, d: String) => MarketOps.collectionBrowse(s, d)),
    "b28_user_income_series"    -> ((s: SparkSession, d: String) => MarketOps.userIncomeSeries(s, d)),
    // per-wallet activity family (reference app.service.ts:1656-1935)
    "b29_wallet_listed"         -> ((s: SparkSession, d: String) => MarketOps.walletListed(s, d)),
    "b30_wallet_bids"           -> ((s: SparkSession, d: String) => MarketOps.walletBids(s, d)),
    "b31_wallet_minted"         -> ((s: SparkSession, d: String) => MarketOps.walletMinted(s, d)),
    "b32_wallet_sold"           -> ((s: SparkSession, d: String) => MarketOps.walletSold(s, d)),
    "b33_wallet_collections"    -> ((s: SparkSession, d: String) => MarketOps.walletCollections(s, d)),
    // pagination contracts: {total, data} and keyset cursor
    "b34_marketplace_page"      -> MarketOps.marketplacePage _,
    "b35_keyset_page"           -> ((s: SparkSession, d: String) => MarketOps.keysetPage(s, d)),
    "b36_marketplace_sorted"    -> ((s: SparkSession, d: String) => MarketOps.marketplaceSorted(s, d, sortMode = 4)),
    "b37_marketplace_default"   -> ((s: SparkSession, d: String) => MarketOps.marketplaceSorted(s, d)),
    // point lookup + burn-excluded directory (app.service.ts:758, :779)
    "b38_order_detail"          -> ((s: SparkSession, d: String) => MarketOps.orderDetail(s, d)),
    "b39_nft_directory"         -> ((s: SparkSession, d: String) => MarketOps.nftDirectory(s, d)),
    "b40_collection_detail"     -> ((s: SparkSession, d: String) => MarketOps.collectionDetail(s, d)),
    // feeds-channel directory + pool rewards (app.service.ts:2415, :2351)
    "b41_feeds_channels"        -> ((s: SparkSession, d: String) => MarketOps.feedsChannels(s, d)),
    "b42_pool_rewards"          -> MarketOps.poolRewards _,
    "b43_today_earned"          -> MarketOps.todayEarned _,
    "b44_earned_list"           -> ((s: SparkSession, d: String) => MarketOps.earnedList(s, d)),
    "b45_v1_wallet_market"      -> ((s: SparkSession, d: String) => MarketOps.v1WalletMarket(s, d)),
    // final two query-shaped endpoints: DID point lookup + latest rate
    // (app.service.ts:356, :39)
    "b46_did_lookup"            -> ((s: SparkSession, d: String) => MarketOps.didLookup(s, d)),
    "b47_latest_rate"           -> ((s: SparkSession, d: String) => MarketOps.latestRate(s, d)),
    // b48/b49 (round 9): the last two reference query semantics —
    // rate-conversion volume + the raw per-token price list
    "b48_trading_volume_rates"  -> MarketOps.tradingVolumeRates _,
    "b49_token_price_history_raw" -> ((s: SparkSession, d: String) => MarketOps.tokenPriceHistoryRaw(s, d)),
    // b50 (round 10): the 4-way transaction-feed union page —
    // listTransactions' per-branch filter + truncate-before-lookup
    // contract (b9/b16/b17 only exercised two-way unions)
    "b50_transactions_union"    -> ((s: SparkSession, d: String) => MarketOps.transactionsUnion(s, d)),
    // b51-b55 (round 10): getSortOfToken's remaining sort modes as
    // registered pages (mode 4 = b36, default arm = b37; mode 6 shares
    // mode 2's ordering under fixed-duration listings)
    "b51_sorted_created_desc"   -> ((s: SparkSession, d: String) => MarketOps.marketplaceSorted(s, d, sortMode = 1)),
    "b52_sorted_oldest"         -> ((s: SparkSession, d: String) => MarketOps.marketplaceSorted(s, d, sortMode = 2)),
    "b53_sorted_created_asc"    -> ((s: SparkSession, d: String) => MarketOps.marketplaceSorted(s, d, sortMode = 3)),
    "b54_sorted_price_desc"     -> ((s: SparkSession, d: String) => MarketOps.marketplaceSorted(s, d, sortMode = 5)),
    "b55_sorted_ending_soon"    -> ((s: SparkSession, d: String) => MarketOps.marketplaceSorted(s, d, sortMode = 6)),
  )

  /** Shared DuckDB prelude for the f-family oracles: rebuilds
    * MultimodalOps' media table + stub decode in SQL. The stub's
    * checksum is Md5Hash64.hashBytes(payload) and the payload IS the
    * document text's UTF-8 bytes, so `u` (the unsigned form, HUGEINT)
    * parses md5(text)'s first 16 hex chars; `s` re-signs it to Spark's
    * BIGINT checksum. Modality = pmod(md5hash64(source), 3) exactly as
    * mediaTable computes it. The pick() arithmetic: Java `h >>> k`
    * becomes `u // 2^k` (nonneg), and the shift-0 arm keeps Java's
    * trunc-% + normalize on the SIGNED value (DuckDB % is trunc too).
    * The real WAV/BMP/PNG decode arms never fire on the synthetic
    * corpus (no text starts with their magic bytes — checked per SF),
    * so the stub is the whole story for the oracle.
    */
  private def mediaMetaSql: String =
    """md0 AS (SELECT doc_id, lang, length(text)::BIGINT AS n_bytes,
           md5(text) AS mt, md5(source) AS msrc FROM documents),
       hx AS (SELECT doc_id, lang, n_bytes,
           list_reduce(list_transform(generate_series(1, 16),
             i -> (strpos('0123456789abcdef', substr(mt, i::INT, 1)) - 1)::HUGEINT),
             (a, x) -> a * 16 + x) AS u,
           list_reduce(list_transform(generate_series(1, 16),
             i -> (strpos('0123456789abcdef', substr(msrc, i::INT, 1)) - 1)::HUGEINT),
             (a, x) -> a * 16 + x) AS usrc
         FROM md0),
       sx AS (SELECT doc_id, lang, n_bytes, u,
           CASE WHEN u >= 9223372036854775808::HUGEINT
                THEN (u - 18446744073709551616::HUGEINT)::BIGINT
                ELSE u::BIGINT END AS s,
           ((CASE WHEN usrc >= 9223372036854775808::HUGEINT
                  THEN (usrc - 18446744073709551616::HUGEINT)::BIGINT
                  ELSE usrc::BIGINT END % 3) + 3) % 3 AS mty
         FROM hx),
       meta AS (SELECT doc_id, lang,
           ['image','audio','video'][(mty + 1)::INT] AS media_type,
           n_bytes, u, s AS checksum,
           CASE mty WHEN 0 THEN (16 + ((s % 4096 + 4096) % 4096))::INT
                    WHEN 1 THEN 0
                    ELSE (320 + ((s % 1920 + 1920) % 1920))::INT
             END AS width,
           CASE mty WHEN 0 THEN (16 + ((u // 4096) % 4096))::INT
                    WHEN 1 THEN 0
                    ELSE (240 + ((u // 4096) % 1080))::INT
             END AS height,
           CASE mty WHEN 0 THEN 3
                    WHEN 1 THEN (1 + ((s % 2 + 2) % 2))::INT
                    ELSE 3
             END AS channels,
           CASE mty WHEN 0 THEN 0::BIGINT
                    WHEN 1 THEN (1000 + ((u // 256) % 600000))::BIGINT
                    ELSE (1000 + ((u // 16777216) % 7200000))::BIGINT
             END AS duration_ms
         FROM sx)"""

  /** f8's stub-fingerprint replay through `sg` (doc_id, afp,
    * n_windows) — a WITH-clause fragment shared by f8's one-shot and
    * f8b's incremental split so the fingerprint SQL has one source of
    * truth (the bm25Postings convention). f4's window-field derivation
    * (same HUGEINT wrap-around multiply), pairwise delta-sign bits,
    * packed with the f6 bit_or idiom.
    */
  private def audioFpSql: String =
    s"""$mediaMetaSql,
       au AS (SELECT doc_id, u, greatest(duration_ms, 1000) AS dur
              FROM meta WHERE media_type = 'audio'),
       wn AS (SELECT doc_id, u,
              least((dur - 1000) // 500 + 1, 65) AS n FROM au),
       wx AS (SELECT doc_id, u, unnest(generate_series(0, n - 1)) AS i
              FROM wn),
       wv AS (SELECT doc_id, i,
           xor(((u // 65536) % 65536)::BIGINT,
               (((i::HUGEINT * ${java.lang.Long
                   .toUnsignedString(0xD6E8FEB86659FD93L)}::HUGEINT)
                 % 18446744073709551616::HUGEINT // 65536) % 65536)::BIGINT)
             AS w
         FROM wx),
       fb AS (SELECT a.doc_id, a.i AS bit,
           CASE WHEN b.w > a.w THEN 1 ELSE 0 END AS bitv
         FROM wv a JOIN wv b ON a.doc_id = b.doc_id AND b.i = a.i + 1
         WHERE a.i < 64),
       bits AS (SELECT doc_id,
           bit_or(CASE WHEN bitv = 1 THEN
             CASE WHEN bit = 63 THEN (-9223372036854775808)::BIGINT
                  ELSE 1::BIGINT << bit::INT END
             ELSE 0 END) AS afp
         FROM fb GROUP BY doc_id),
       sg AS (SELECT wn.doc_id, coalesce(bits.afp, 0) AS afp,
                     wn.n::INT AS n_windows
              FROM wn LEFT JOIN bits USING (doc_id))"""

  /** The Manku C(6,3) block-combination banding replay shared by the
    * c3/f6/f7/f8-family oracles — GENERATED from
    * [[operators.DedupOps.simhashBlocks]]/[[operators.DedupOps.simhashCombos]]
    * so both engines band from one definition (drift between the Spark
    * layout and the replay is a compile-time impossibility, the
    * bm25Postings convention). `combosSql` is a derived VALUES table
    * (band, i, j, k) carrying 1-based positions into the 6-element
    * block list; `b6Sql` extracts the blocks off a packed 64-bit
    * signature column (DuckDB's `>>` on BIGINT is arithmetic, the mask
    * strips the sign fill — same as Spark's shiftright+bitwiseAND);
    * `blockKeySql` packs a combination's 3 block values into fixed
    * 11-bit slots, identical arithmetic to `simhashBandCols`.
    */
  private val combosSql: String =
    operators.DedupOps.simhashCombos.zipWithIndex
      .map { case (c, b) => s"($b, ${c(0) + 1}, ${c(1) + 1}, ${c(2) + 1})" }
      .mkString("(VALUES ", ", ", ") AS combos(band, i, j, k)")
  private def b6Sql(sig: String): String =
    operators.DedupOps.simhashBlocks
      .map { case (st, w) => s"($sig >> $st) & ${(1L << w) - 1}" }
      .mkString("[", ", ", "]")
  private val blockKeySql: String = "(b6[i] << 22) | (b6[j] << 11) | b6[k]"

  /** The dir-aware oracle map Verify/VerifyOne actually dump: the
    * static `oracleSql` plus entries whose SQL interpolates
    * DATA-DERIVED constants (e14's trained merge table — training is
    * iterative-global argmax, not relational algebra, so unlike e3's
    * profiles it cannot re-derive inside the SQL). Falls back to the
    * static map (e14 rows-only) when the corpus defeats the replay
    * (non-ASCII text or zero trained merges — see TextOps.bpeOracleSql).
    */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] = {
    val base = oracleSql ++
      TextOps.bpeOracleSql(spark, sfDir).map("e14_bpe_token_stats" -> _)
    // f8-family seam guard (the bpeOracleSql convention applied to
    // audio): the registered oracles replay only the STUB fingerprint
    // arm, so if any corpus payload parses as real PCM16 WAV the Spark
    // query and the DuckDB replay would legitimately diverge — detect
    // that at dump time and fall back to the rows-only check instead
    // of failing the driver gate opaquely.
    if (operators.MultimodalOps.hasRealWav(spark, sfDir))
      base - "f8_audio_neardup" - "f8b_audio_neardup_incr" -
        "f8c_audio_indexed"
    else base
  }

  // d12 probes the LANDED index built at the registered d10
  // parameters, so the SAME replay hash-gates both paths — sharing the
  // string (not copying it) makes oracle drift between them impossible.
  def oracleSql: Map[String, String] =
    baseOracleSql +
      ("d12_ann_indexed" -> baseOracleSql("d10_ann_ivfpq")) +
      // e16b probes the LANDED posting index built from the same corpus
      // at the same tokenization, so the SAME replay hash-gates both —
      // sharing the string (not copying it) makes drift impossible
      ("e16b_bm25_indexed" -> baseOracleSql("e16_bm25_search")) +
      // e17b scores through the LANDED weight table trained on the
      // same corpus (parquet roundtrips doubles bit-exactly), so the
      // SAME replay hash-gates both
      ("e17b_quality_indexed" -> baseOracleSql("e17_quality_classifier")) +
      // a19 is a18 through the streaming rollup — one replay gates both
      ("a19_stream_anomaly" -> baseOracleSql("a18_hourly_anomaly")) +
      // b55 (ending-soonest under fixed-duration listings) IS mode 2's
      // ordering — getSortOfToken maps both to listing-date ascending,
      // so one replay gates both registered arms
      ("b55_sorted_ending_soon" -> baseOracleSql("b52_sorted_oldest")) +
      // d13/d14/d15: the d5/d10 replays with the query predicate
      // swapped from the qmod sample to the fixed md5-salted batch —
      // DERIVED from the base strings (not copied), so the fixed-Q
      // oracles can never drift from the one-shot ones; d15 probes the
      // landed index built at d10's parameters, so it shares d14's
      // derived replay exactly as d12 shares d10's
      ("d13_ann_ivf_fixedq" -> fixedqOracle(baseOracleSql("d5_ann_ivf"))) +
      ("d14_ann_ivfpq_fixedq" -> fixedqOracle(baseOracleSql("d10_ann_ivfpq"))) +
      ("d15_ann_indexed_fixedq" -> fixedqOracle(baseOracleSql("d10_ann_ivfpq"))) +
      // d16b: the landed-index classify — neighbor list = d14/d15's
      // derived fixed-|Q| IVF-PQ replay, vote/report = d16's SQL shape
      // wrapped around it (knnVoteOracle). Derived, never copied, so
      // it can't drift from either parent.
      ("d16b_knn_indexed" ->
        knnVoteOracle(fixedqOracle(baseOracleSql("d10_ann_ivfpq")))) +
      // d17: hybrid fusion — text side = the shared BM25 replay with
      // more-like-this query terms (top-8 by tf from the posting table
      // itself), vector side = d13's derived fixed-|Q| IVF replay
      // re-cut to the 20-deep list, RRF-fused with explicit ::DOUBLE
      // arithmetic (DuckDB decimal division would otherwise diverge
      // from Spark's double division)
      ("d17_hybrid_retrieval" -> d17OracleSql) +
      // d17b probes the LANDED posting + IVF indexes built from the
      // same corpus at the same tokenization/routing, so the SAME
      // replay hash-gates both (the d12/e16b sharing convention)
      ("d17b_hybrid_indexed" -> d17OracleSql) +
      // round 14: the remaining landed probes as driver-checked rows —
      // each is result-identical to its registered one-shot parent
      // (WarehouseSpec pins probe ≡ one-shot for all four), so the
      // parent's replay hash-gates both (the d12/e16b convention)
      ("c12b_bloom_indexed" -> baseOracleSql("c12_bloom_dedup")) +
      ("p11b_incremental_indexed" -> baseOracleSql("p11_incremental_dedup")) +
      ("f7b_image_indexed" -> baseOracleSql("f7_image_neardup_incr")) +
      ("f8c_audio_indexed" -> baseOracleSql("f8b_audio_neardup_incr")) +
      // round 14 deletion demos: DERIVED from the parents' replays by
      // filtering the deleted slice out of exactly the place the
      // tombstone layer removes it — e16c's corpus CTE (stats, df and
      // candidates all re-derive downstream of it, mirroring the
      // delta-corrected landedStats + pre-df anti-join), d12b's
      // candidate membership alone (routing/codebook/queries stay
      // corpus-true, mirroring the pre-ADC anti-join). require-guarded
      // like d17's derivation so a reworded parent fails loud.
      ("e16c_bm25_deleted" -> e16cOracleSql) +
      ("d12b_ann_deleted" -> d12bOracleSql)

  /** e16c: e16's replay over a corpus that never held the deleted
    * slice — the corpus CTE gains the slice filter; stats, df and
    * candidates re-derive downstream exactly as the engine's
    * delta-corrected landedStats + pre-df tombstone anti-join do.
    */
  private lazy val e16cOracleSql: String = {
    val parent = baseOracleSql("e16_bm25_search")
    val cut = parent.replace(
      "FROM documents WHERE text IS NOT NULL),",
      "FROM documents WHERE text IS NOT NULL AND doc_id % 17 <> 0),")
    require(cut != parent,
      "e16c corpus-cut rewrite missed: e16 replay's corpus CTE was reworded")
    cut
  }

  /** d12b: d10's replay with the deleted slice filtered out of the
    * CANDIDATE membership only — routing (ct/asg sample), codebook and
    * the query batch stay corpus-true, exactly like the landed index's
    * pre-ADC tombstone anti-join.
    */
  private lazy val d12bOracleSql: String = {
    val parent = baseOracleSql("d10_ann_ivfpq")
    val cut = parent.replace(
      "AND asg.vec_id <> prb.query_id),",
      "AND asg.vec_id <> prb.query_id AND asg.vec_id % 17 <> 0),")
    require(cut != parent,
      "d12b candidate-cut rewrite missed: d10 replay's dd CTE was reworded")
    cut
  }

  private lazy val d17OracleSql: String = {
        val parent = fixedqOracle(baseOracleSql("d5_ann_ivf"))
        val vecSql = parent.replace("WHERE rnk <= 10", "WHERE rnk <= 20")
        // fail LOUD here, not as an opaque verify-time hash mismatch:
        // if the parent replay is ever reworded the substitution above
        // silently no-ops and d17's list depth drifts from listK=20
        require(vecSql != parent,
          "d17 listK rewrite missed: d5 replay no longer ends 'WHERE rnk <= 10'")
        s"""WITH $bm25Postings,
           qids AS (SELECT vec_id AS query_id FROM embeddings
                    ORDER BY md5(vec_id::VARCHAR || 'q'), vec_id
                    LIMIT ${operators.SimOps.FixedQBatch}),
           qdf AS (SELECT term, count(*)::DOUBLE AS qdf FROM post
                   GROUP BY 1),
           qt AS (SELECT query_id, term FROM (
                    SELECT p.doc_id AS query_id, p.term,
                      row_number() OVER (PARTITION BY p.doc_id
                        ORDER BY p.tf * ln((st.n + 1.0::DOUBLE)
                                           / (qdf.qdf + 1.0::DOUBLE)) DESC,
                                 p.term) AS tr
                    FROM post p JOIN qids ON p.doc_id = qids.query_id
                      JOIN qdf ON p.term = qdf.term CROSS JOIN st)
                  WHERE tr <= 8),
           ${bm25Scoring(exclSelf = true)},
           txt AS (SELECT query_id, doc_id, rnk FROM rb WHERE rnk <= 20),
           vec AS ($vecSql),
           fused AS (SELECT coalesce(txt.query_id, vec.query_id) AS query_id,
               coalesce(txt.doc_id, vec.cand_id) AS doc_id,
               coalesce(1.0::DOUBLE / (60.0::DOUBLE + txt.rnk), 0.0::DOUBLE)
                 + coalesce(1.0::DOUBLE / (60.0::DOUBLE + vec.rnk),
                            0.0::DOUBLE) AS rrf,
               txt.rnk AS text_rank, vec.rnk AS vec_rank
             FROM txt FULL JOIN vec ON txt.query_id = vec.query_id
                                   AND txt.doc_id = vec.cand_id),
           fr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf DESC, doc_id) AS rnk FROM fused)
           SELECT query_id, rnk, doc_id, round(rrf, 6) AS rrf_score,
                  text_rank, vec_rank
           FROM fr WHERE rnk <= 10 ORDER BY query_id, rnk"""
      }

  /** Wrap a d-family top-k replay (query_id, cand_id, rnk, cosine) in
    * d16's vote/report SQL: majority vote over the neighbor labels
    * (vote ties by smallest label — the same total order the Spark
    * knnVoteTail uses), actual-vs-predicted over the fixed md5-salted
    * batch. DuckDB nests the parent replay's WITH inside the knn CTE.
    */
  private def knnVoteOracle(knnSql: String): String =
    s"""WITH knn AS ($knnSql),
       q AS (SELECT vec_id AS query_id, label AS qlabel FROM embeddings
             ORDER BY md5(vec_id::VARCHAR || 'q'), vec_id
             LIMIT ${operators.SimOps.FixedQBatch}),
       v AS (SELECT knn.query_id, emb.label, count(*) AS votes
             FROM knn JOIN embeddings emb ON knn.cand_id = emb.vec_id
             GROUP BY 1, 2),
       pr AS (SELECT query_id, label AS predicted_label, votes,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY votes DESC, label) AS rr FROM v)
       SELECT q.query_id, q.qlabel AS actual_label, pr.predicted_label,
              pr.votes, pr.predicted_label = q.qlabel AS agrees
       FROM q JOIN pr ON q.query_id = pr.query_id AND pr.rr = 1
       ORDER BY q.query_id"""

  /** The BM25 replay's corpus half (d → stats → posting table) — a
    * WITH-clause fragment shared by e16 and d17 so the inverted-index
    * SQL has one source of truth. Query-side CTEs (must define a `qt`
    * with (query_id, term)) slot between this and [[bm25Scoring]];
    * e16's `qt` precedes it (literal workload), d17's follows it
    * (query terms come FROM the posting table).
    */
  private def bm25Postings: String =
    """d AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                        w -> w <> '') AS toks
            FROM documents WHERE text IS NOT NULL),
       st AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)::DOUBLE) AS avgdl
              FROM d),
       post AS (SELECT term, doc_id, dl, count(*)::DOUBLE AS tf
                FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                      FROM d)
                GROUP BY 1, 2, 3)"""

  /** The BM25 replay's scoring half: df over the query-term slice,
    * per-(query, doc) Lucene-idf BM25 contributions, sorted-fold
    * score, per-query rank. k1/(k1+1) interpolate through a
    * string-cast so the SQL double is bit-identical to the Scala one
    * regardless of decimal-literal conversion paths.
    */
  private def bm25Scoring(exclSelf: Boolean): String = {
    val k1p1 = s"'${RetrievalOps.K1 + 1.0}'::DOUBLE"
    val k1 = s"'${RetrievalOps.K1}'::DOUBLE"
    val oneMinusB = s"'${1.0 - RetrievalOps.B}'::DOUBLE"
    val b = s"'${RetrievalOps.B}'::DOUBLE"
    s"""dfs AS (SELECT term, count(*)::DOUBLE AS df FROM post
             WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
       contrib AS (SELECT qt.query_id, post.doc_id, post.term,
           ln((st.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
           * (post.tf * $k1p1
              / (post.tf + $k1 * ($oneMinusB + $b * post.dl::DOUBLE
                                                 / st.avgdl))) AS s
         FROM post JOIN qt USING (term) JOIN dfs USING (term) CROSS JOIN st
         ${if (exclSelf) "WHERE post.doc_id <> qt.query_id" else ""}),
       sc AS (SELECT query_id, doc_id,
           list_reduce(list_prepend(0.0::DOUBLE, list_transform(
             list_sort(list(struct_pack(term := term, s := s))), x -> x.s)),
             (acc, x) -> acc + x) AS score,
           count(*)::BIGINT AS n_terms
         FROM contrib GROUP BY 1, 2),
       rb AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS rnk FROM sc)"""
  }

  /** Swap a d-family replay's query-batch predicate (`vec_id % 50 = 0`,
    * which selects N/50 queries) for the fixed-size md5-salted batch
    * d13/d14/d15 run — the SAME batch SimOps.fixedQueryBatch selects.
    * String-transforming the existing replay keeps one source of truth
    * for the whole IVF/PQ pipeline SQL.
    */
  private def fixedqOracle(base: String): String =
    base.replace("WHERE vec_id % 50 = 0",
      "WHERE vec_id IN (SELECT vec_id FROM e ORDER BY " +
        s"md5(vec_id::VARCHAR || 'q'), vec_id LIMIT ${operators.SimOps.FixedQBatch})")

  private lazy val baseOracleSql: Map[String, String] = Map(
    // A-module rule: ALL time logic on epoch-ms longs in both engines
    // (epoch_ms(ts) here ≡ unix_millis(cast) in Spark) — the parquet ns
    // precision never reaches a comparison. Sort key = lexicographic
    // (ms, event_id): Spark orders a struct, DuckDB a zero-padded
    // fixed-width string — identical order at any event_id magnitude
    // (an arithmetic ms*K+event_id packing breaks once event_id >= K).
    "a1_latest_event_per_user" ->
      """SELECT user_id,
         arg_max(event_id, printf('%019d|%019d', epoch_ms(ts), event_id)) AS last_event_id,
         arg_max(event_type, printf('%019d|%019d', epoch_ms(ts), event_id)) AS last_event_type,
         arg_max(value, printf('%019d|%019d', epoch_ms(ts), event_id)) AS last_value,
         max(epoch_ms(ts)) AS last_ms
         FROM events GROUP BY user_id ORDER BY user_id""",
    "a2_last_height_per_type" ->
      """SELECT event_type, max(event_id) AS last_height,
         max(epoch_ms(ts)) AS last_ms, count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",
    "a3_event_counts_by_type" ->
      """SELECT event_type, count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         round(sum(value), 2) AS total_value,
         round(avg(value), 4) AS avg_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "a4_hourly_rollup" ->
      """SELECT CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) * 3600000 AS hour_ms,
         count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1 ORDER BY hour_ms""",
    "a5_sessionize" ->
      """WITH x AS (
           SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
             CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                    OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
         ), y AS (
           -- CAST: DuckDB sums INTEGER into HUGEINT, which the driver's
           -- hasher formats differently from Spark's BIGINT (r2 false-FAIL)
           SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
             ORDER BY ms, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM x
         )
         SELECT user_id, session_id,
           min(ms) AS session_start_ms, max(ms) AS session_end_ms,
           count(*) AS n_events, round(sum(value), 2) AS session_value
         FROM y GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    "a6_state_fold" ->
      """SELECT user_id,
         count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
         count(*) FILTER (WHERE event_type = 'view') AS n_view,
         count(*) FILTER (WHERE event_type = 'click') AS n_click,
         count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
         count(*) FILTER (WHERE event_type = 'error') AS n_error,
         round(sum(value), 2) AS total_value,
         arg_max(event_type, printf('%019d|%019d', epoch_ms(ts), event_id)) AS current_state,
         max(epoch_ms(ts)) AS state_ms
         FROM events GROUP BY user_id ORDER BY user_id""",
    "a7_funnel" ->
      """WITH s AS (SELECT user_id, min(epoch_ms(ts)) AS signup_ms
                    FROM events WHERE event_type = 'signup' GROUP BY user_id),
         v AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS view_ms
               FROM events e JOIN s ON e.user_id = s.user_id
               WHERE e.event_type = 'view' AND epoch_ms(e.ts) > s.signup_ms
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS purchase_ms
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > v.view_ms
               GROUP BY e.user_id)
         SELECT s.user_id, signup_ms, view_ms, purchase_ms,
           CAST(1 + CASE WHEN view_ms IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN purchase_ms IS NOT NULL THEN 1 ELSE 0 END
                AS INTEGER) AS stage
         FROM s LEFT JOIN v ON s.user_id = v.user_id
                LEFT JOIN p ON s.user_id = p.user_id
         ORDER BY s.user_id""",
    "a8_dedup_events" ->
      """SELECT min(event_id) AS event_id, user_id, event_type,
         epoch_ms(ts) AS ms, count(*) AS dup_count
         FROM events GROUP BY user_id, event_type, epoch_ms(ts)
         ORDER BY event_id""",
    // a9/a10 stream the same results a4/a6 compute in batch — the
    // streaming paths verify against the identical oracles.
    "a9_stream_hourly" ->
      """SELECT CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) * 3600000 AS hour_ms,
         count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1 ORDER BY hour_ms""",
    "a10_stream_state" ->
      """SELECT user_id,
         count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
         count(*) FILTER (WHERE event_type = 'view') AS n_view,
         count(*) FILTER (WHERE event_type = 'click') AS n_click,
         count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
         count(*) FILTER (WHERE event_type = 'error') AS n_error,
         round(sum(value), 2) AS total_value,
         arg_max(event_type, printf('%019d|%019d', epoch_ms(ts), event_id)) AS current_state,
         max(epoch_ms(ts)) AS state_ms
         FROM events GROUP BY user_id ORDER BY user_id""",
    // c1/c4/c6 are exact and string-based → oracled; c2's shingle
    // hash and band key, and c3's word hash, are md5-derived since
    // round 7 exactly so their full signature/banding pipelines
    // replay in DuckDB (below). c5's hyperplane LSH replays too: the
    // planes are FIXED-SEED LITERAL arrays baked into the Spark plan
    // (VectorFns.plane), so the oracle interpolates the same
    // constants via VectorFns.planeValues and re-runs the identical
    // double left-fold projection (list_reduce — Spark's aggregate
    // starts at 0.0 and 0.0+x1 == x1, so the fold orders coincide; a
    // sign flip would need a projection within 1 ulp of 0).
    "c5_dedup_embedding" -> {
      val planeRows = (0 until 12).map { p =>
        graft.functions.VectorFns.planeValues(p, 64)
          .mkString(s"($p, [", ",", "]::DOUBLE[])")
      }.mkString(",")
      s"""WITH pl(p, pv) AS (VALUES $planeRows),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         nr AS (SELECT vec_id,
             sqrt(list_reduce(list_transform(emb, v -> v * v),
                              (a, x) -> a + x)) AS nrm FROM e),
         pj AS (SELECT vec_id, p,
             list_reduce(list_transform(list_zip(emb, pv),
                                        z -> z[1] * z[2]),
                         (a, x) -> a + x) AS pr
           FROM e CROSS JOIN pl),
         ky AS (SELECT vec_id, p // 4 AS band,
             sum(CASE WHEN pr > 0 THEN 1::BIGINT << (p % 4)::INT
                      ELSE 0 END)::BIGINT AS bkey
           FROM pj GROUP BY 1, 2),
         cap AS (SELECT * FROM (
             SELECT ky.*, count(*) OVER (PARTITION BY band, bkey) AS n
             FROM ky) WHERE n <= 1024),
         pr2 AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
                 FROM cap x JOIN cap y ON x.band = y.band
                   AND x.bkey = y.bkey AND x.vec_id < y.vec_id),
         cs AS (SELECT a_id, b_id,
             list_reduce(list_transform(list_zip(ea.emb, eb.emb),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (na.nrm * nb.nrm) AS cos
           FROM pr2 JOIN e ea ON a_id = ea.vec_id
                    JOIN e eb ON b_id = eb.vec_id
                    JOIN nr na ON a_id = na.vec_id
                    JOIN nr nb ON b_id = nb.vec_id)
         SELECT a_id, b_id, round(cos, 6) AS cosine FROM cs
         ORDER BY cosine DESC, a_id, b_id LIMIT 50"""
    },
    // c2: the 128 (a,b) permutation constants interpolate straight
    // from TextFns.minhashPerms so Scala and SQL can never drift; the
    // shingle hash needs only md5hash64 mod 2^31, and since the hi
    // half is ≡ 0 (2^32 ≡ 0 mod 2^31) that is just the LOW 8 hex
    // chars parsed (list_reduce fold) and masked. Band key = md5 of
    // the comma-joined 4-slice — the exact string Spark hashes.
    "c2_dedup_minhash" -> {
      val permRows = graft.functions.TextFns.minhashPerms(128).zipWithIndex
        .map { case ((a, b), i) => s"($i,$a,$b)" }.mkString(",")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
         g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [] END) AS gs FROM t),
         sh AS (SELECT doc_id,
             list_reduce(list_transform(generate_series(9, 16),
               i -> (strpos('0123456789abcdef', substr(m, i::INT, 1)) - 1)::BIGINT),
               (acc, x) -> acc * 16 + x) & 2147483647 AS h
           FROM (SELECT doc_id, md5(unnest(gs)) AS m FROM g)),
         perms(i, pa, pb) AS (VALUES $permRows),
         sv AS (SELECT doc_id, i, min((pa * h + pb) % 2147483648) AS v
                FROM sh CROSS JOIN perms GROUP BY 1, 2),
         sg AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sv GROUP BY 1),
         bx AS (SELECT doc_id, band,
             md5(array_to_string(
               list_slice(sig, band * 4 + 1, band * 4 + 4), ',')) AS bkey
           FROM sg CROSS JOIN
             (SELECT unnest(generate_series(0, 31)) AS band)),
         cap AS (SELECT * FROM (
             SELECT bx.*, count(*) OVER (PARTITION BY band, bkey) AS n
             FROM bx) WHERE n <= 64),
         pr AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
                FROM cap x JOIN cap y ON x.band = y.band
                  AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         est AS (SELECT a_id, b_id,
             round(list_sum(list_transform(list_zip(sa.sig, sb.sig),
               p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) / 128.0, 4)
               AS est_jaccard
           FROM pr JOIN sg sa ON a_id = sa.doc_id
                   JOIN sg sb ON b_id = sb.doc_id)
         SELECT a_id, b_id, est_jaccard FROM est
         ORDER BY est_jaccard DESC, a_id, b_id LIMIT 50"""
    },
    // c3: md5hash64 = first 16 md5 hex chars as two 32-bit halves
    // (hex digit parsed via strpos over the lowercase alphabet, bit b
    // living in digit (63-b)/4 at bit b%4); per-bit ±1 votes summed,
    // sig packed via bit_or (bit 63 as the min-long literal — DuckDB
    // errors on 1<<63); Manku C(6,3) block-combination pigeonhole
    // bands (round 16 — was 4×16 contiguous, whose 65,536-key bands
    // still cap-collapse at ~4M docs): 6 blocks of 11/11/11/11/10/10
    // bits, 20 bands keyed by 3 block values packed into fixed 11-bit
    // slots — the identical shift-and-mask arithmetic both engines
    // share; bucket cap 64, distinct pairs, hamming = bit_count(xor),
    // top-100 on the full deterministic (hamming, a, b) key.
    "c3_dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents WHERE text IS NOT NULL),
         h AS (SELECT doc_id, md5(tok) AS m FROM t),
         bv AS (SELECT doc_id, b,
             CASE WHEN ((strpos('0123456789abcdef',
                                substr(m, ((63 - b) // 4 + 1)::INT, 1)) - 1)
                        >> (b % 4)::INT) & 1 = 1 THEN 1 ELSE -1 END AS v
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)),
         s AS (SELECT doc_id, b, sum(v) AS sv FROM bv GROUP BY 1, 2),
         sg AS (SELECT doc_id,
             bit_or(CASE WHEN sv > 0 THEN
               CASE WHEN b = 63 THEN (-9223372036854775808)::BIGINT
                    ELSE 1::BIGINT << b::INT END
               ELSE 0 END) AS sig
           FROM s GROUP BY 1),
         blk AS (SELECT doc_id, sig, ${b6Sql("sig")} AS b6 FROM sg),
         e AS (SELECT doc_id, sig, band, $blockKeySql AS bkey
           FROM blk CROSS JOIN $combosSql),
         cap AS (SELECT * FROM (
             SELECT e.*, count(*) OVER (PARTITION BY band, bkey) AS n FROM e)
           WHERE n <= 64),
         p AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
             CAST(bit_count(xor(x.sig, y.sig)) AS INT) AS hamming
           FROM cap x JOIN cap y ON x.band = y.band AND x.bkey = y.bkey
             AND x.doc_id < y.doc_id)
         SELECT a_id, b_id, hamming FROM p
         ORDER BY hamming, a_id, b_id LIMIT 100""",
    "c1_dedup_exact" ->
      """SELECT doc_id, md5(text) AS fp,
         count(*) OVER (PARTITION BY md5(text)) AS dup_count,
         (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS is_canonical
         FROM documents ORDER BY doc_id""",
    // c4: exact word-3-gram Jaccard over the df-capped shingle
    // vocabulary — the same distinct-(doc, shingle) rows, df window,
    // inverted-index join and (rounded jaccard desc, a, b) tiebreak as
    // the Spark plan; both engines sort on the 6dp-rounded value.
    "c4_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                 ELSE [] END)) AS shingle
               FROM t),
         capped AS (SELECT doc_id, shingle FROM (
             SELECT doc_id, shingle,
                    count(*) OVER (PARTITION BY shingle) AS df FROM g)
           WHERE df <= 100),
         sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY 1),
         i AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter
               FROM capped x JOIN capped y
                 ON x.shingle = y.shingle AND x.doc_id < y.doc_id
               GROUP BY 1, 2)
         SELECT a_id, b_id,
           round(inter::DOUBLE / (sa.n + sb.n - inter), 6) AS jaccard
         FROM i JOIN sizes sa ON a_id = sa.doc_id
                JOIN sizes sb ON b_id = sb.doc_id
         ORDER BY jaccard DESC, a_id, b_id LIMIT 50""",
    // p1: the corpus-prep composition — c6's CC closure + e2's quality
    // formula chained exactly as the Spark plan chains them. Integer
    // sums cast to BIGINT (DuckDB sum() yields HUGEINT, which the
    // driver's hasher formats differently).
    "p1_corpus_prep" ->
      """WITH RECURSIVE
         toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         chunks AS (
           SELECT DISTINCT doc_id, cfp FROM (
             SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(t), 8),
                      s -> md5(array_to_string(list_slice(t, s, s + 7), ' '))))
                      AS cfp
             FROM toks WHERE len(t) > 0)),
         capped AS (
           SELECT doc_id, cfp FROM (
             SELECT doc_id, cfp, count(*) OVER (PARTITION BY cfp) AS df
             FROM chunks)
           WHERE df <= 100),
         prs AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM capped x JOIN capped y
             ON x.cfp = y.cfp AND x.doc_id < y.doc_id),
         edges AS (SELECT a, b FROM prs
                   UNION ALL SELECT b AS a, a AS b FROM prs),
         reach(src, dst) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         comp AS (SELECT src AS doc_id, min(dst) AS cluster_id
                  FROM reach GROUP BY src),
         q AS (
           SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
             round(0.25 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                 + 0.25 * (1.0 - len(list_filter(string_split(text, ' '),
                     t -> t IN ('the','a','of','to','and')))::DOUBLE
                     / len(string_split(text, ' ')))
                 + 0.25 * (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                     / length(text))
                 + 0.25 * len(list_distinct(string_split(text, ' ')))::DOUBLE
                     / len(string_split(text, ' ')), 4) AS quality
           FROM documents),
         kept AS (
           SELECT q.doc_id, q.lang, q.n_tokens, q.quality, comp.cluster_id
           FROM q JOIN comp USING (doc_id) WHERE q.quality >= 0.72),
         reps AS (SELECT cluster_id, min(doc_id) AS doc_id
                  FROM kept GROUP BY cluster_id)
         SELECT lang, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                round(avg(quality), 6) AS avg_quality
         FROM kept JOIN reps USING (cluster_id, doc_id)
         GROUP BY lang ORDER BY lang""",
    // p9: the same CTE chain as p1 (quality formula, chunk-fingerprint
    // edges, recursive-CTE components, min-id representatives), read
    // out as per-stage totals instead of the final per-lang rollup.
    "p9_filter_funnel" ->
      """WITH RECURSIVE
         toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         chunks AS (
           SELECT DISTINCT doc_id, cfp FROM (
             SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(t), 8),
                      s -> md5(array_to_string(list_slice(t, s, s + 7), ' '))))
                      AS cfp
             FROM toks WHERE len(t) > 0)),
         capped AS (
           SELECT doc_id, cfp FROM (
             SELECT doc_id, cfp, count(*) OVER (PARTITION BY cfp) AS df
             FROM chunks)
           WHERE df <= 100),
         prs AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM capped x JOIN capped y
             ON x.cfp = y.cfp AND x.doc_id < y.doc_id),
         edges AS (SELECT a, b FROM prs
                   UNION ALL SELECT b AS a, a AS b FROM prs),
         reach(src, dst) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         comp AS (SELECT src AS doc_id, min(dst) AS cluster_id
                  FROM reach GROUP BY src),
         q AS (
           SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             round(0.25 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                 + 0.25 * (1.0 - len(list_filter(string_split(text, ' '),
                     t -> t IN ('the','a','of','to','and')))::DOUBLE
                     / len(string_split(text, ' ')))
                 + 0.25 * (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                     / length(text))
                 + 0.25 * len(list_distinct(string_split(text, ' ')))::DOUBLE
                     / len(string_split(text, ' ')), 4) AS quality
           FROM documents),
         kept AS (
           SELECT q.doc_id, q.n_tokens, q.quality, comp.cluster_id
           FROM q JOIN comp USING (doc_id) WHERE q.quality >= 0.72),
         reps AS (SELECT cluster_id, min(doc_id) AS doc_id
                  FROM kept GROUP BY cluster_id)
         SELECT 0 AS stage_id, 'raw' AS stage,
                count(*)::BIGINT AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM q
         UNION ALL
         SELECT 1, 'quality', count(*)::BIGINT,
                CAST(sum(n_tokens) AS BIGINT) FROM kept
         UNION ALL
         SELECT 2, 'dedup', count(*)::BIGINT,
                CAST(sum(n_tokens) AS BIGINT)
         FROM kept JOIN reps USING (cluster_id, doc_id)
         ORDER BY stage_id""",
    // p10: c2's md5 lower-half parse (chars 9-16 = the long's low 32
    // bits), 31-bit mask, mod 1000 — same bucket on both engines.
    "p10_holdout_split" ->
      """WITH b AS (SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             list_reduce(list_transform(generate_series(9, 16),
               i -> (strpos('0123456789abcdef',
                            substr(md5(doc_id::VARCHAR), i::INT, 1))
                     - 1)::BIGINT),
               (acc, x) -> acc * 16 + x) & 2147483647 AS h
           FROM documents)
         SELECT doc_id, n_tokens,
           CASE WHEN h % 1000 < 10 THEN 'test'
                WHEN h % 1000 < 60 THEN 'val'
                ELSE 'train' END AS split
         FROM b ORDER BY doc_id""",
    // p11: c2's replay with a batch split — existing docs (id%10!=0)
    // form the capped band index, arriving docs (id%10==0) probe it;
    // label = best standing partner with est >= 0.5, NULL = novel.
    "p11_incremental_dedup" -> {
      val permRows = graft.functions.TextFns.minhashPerms(128).zipWithIndex
        .map { case ((a, b), i) => s"($i,$a,$b)" }.mkString(",")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
         g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [] END) AS gs FROM t),
         sh AS (SELECT doc_id,
             list_reduce(list_transform(generate_series(9, 16),
               i -> (strpos('0123456789abcdef', substr(m, i::INT, 1)) - 1)::BIGINT),
               (acc, x) -> acc * 16 + x) & 2147483647 AS h
           FROM (SELECT doc_id, md5(unnest(gs)) AS m FROM g)),
         perms(i, pa, pb) AS (VALUES $permRows),
         sv AS (SELECT doc_id, i, min((pa * h + pb) % 2147483648) AS v
                FROM sh CROSS JOIN perms GROUP BY 1, 2),
         sg AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sv GROUP BY 1),
         bx AS (SELECT doc_id, band,
             md5(array_to_string(
               list_slice(sig, band * 4 + 1, band * 4 + 4), ',')) AS bkey
           FROM sg CROSS JOIN
             (SELECT unnest(generate_series(0, 31)) AS band)),
         ex AS (SELECT * FROM (
             SELECT b2.*, count(*) OVER (PARTITION BY band, bkey) AS n
             FROM bx b2 WHERE b2.doc_id % 10 != 0) WHERE n <= 64),
         nw AS (SELECT * FROM bx WHERE doc_id % 10 = 0),
         pr AS (SELECT DISTINCT nw.doc_id AS doc_id, ex.doc_id AS ex_id
                FROM nw JOIN ex ON nw.band = ex.band AND nw.bkey = ex.bkey),
         est AS (SELECT pr.doc_id, pr.ex_id,
             round(list_sum(list_transform(list_zip(sa.sig, sb.sig),
               p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) / 128.0, 4)
               AS est
           FROM pr JOIN sg sa ON pr.doc_id = sa.doc_id
                   JOIN sg sb ON pr.ex_id = sb.doc_id),
         best AS (SELECT doc_id, ex_id, est, row_number()
               OVER (PARTITION BY doc_id ORDER BY est DESC, ex_id) AS rk
           FROM est WHERE est >= 0.5)
         SELECT doc_id, b.ex_id AS dup_of, b.est AS est_jaccard
         FROM (SELECT doc_id FROM documents
               WHERE text IS NOT NULL AND doc_id % 10 = 0) d
         LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
         ORDER BY doc_id"""
    },
    // p12: e2's raw quality formula aggregated per source, exact
    // distinct-fingerprint dup rate, and the self-calibrating median
    // cut (DuckDB median == quantile_cont(0.5) == Spark's exact
    // interpolating percentile; inputs are round-6 stable).
    "p12_source_filter" ->
      """WITH t AS (SELECT source, md5(text) AS fp, text,
                    string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
         q AS (SELECT source, fp,
             0.25 * least(len(toks) / 100.0, 1.0)
           + 0.25 * (1.0 - len(list_filter(toks, t -> t IN ('the','a','of','to','and')))::DOUBLE / len(toks))
           + 0.25 * (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text))
           + 0.25 * len(list_distinct(toks))::DOUBLE / len(toks) AS q
           FROM t),
         per AS (SELECT source, count(*) AS n_docs,
                 count(DISTINCT fp) AS n_distinct,
                 round(avg(q), 6) AS mean_quality
                 FROM q GROUP BY source),
         m AS (SELECT median(mean_quality) AS med FROM per)
         SELECT source, n_docs, n_distinct,
           round((n_docs - n_distinct)::DOUBLE / n_docs, 6) AS dup_rate,
           mean_quality, mean_quality >= med AS kept
         FROM per, m ORDER BY source""",
    // c6: connected components — DuckDB computes the same 8-token
    // chunk-fingerprint edges, then closes them with a recursive-CTE
    // reachability fixpoint (identity ∪ one-hop extension, UNION
    // dedup terminates); component = min reachable id. Tiny graphs at
    // verify SF keep the closure quadratic-in-cluster-size cheap.
    "c6_dedup_clusters" ->
      """WITH RECURSIVE
         toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         chunks AS (
           SELECT DISTINCT doc_id, cfp FROM (
             SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(t), 8),
                      s -> md5(array_to_string(list_slice(t, s, s + 7), ' '))))
                      AS cfp
             FROM toks WHERE len(t) > 0)),
         capped AS (
           SELECT doc_id, cfp FROM (
             SELECT doc_id, cfp, count(*) OVER (PARTITION BY cfp) AS df
             FROM chunks)
           WHERE df <= 100),
         pairs AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM capped x JOIN capped y
             ON x.cfp = y.cfp AND x.doc_id < y.doc_id),
         edges AS (SELECT a, b FROM pairs
                   UNION ALL SELECT b AS a, a AS b FROM pairs),
         reach(src, dst) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         comp AS (SELECT src AS doc_id, min(dst) AS cluster_id
                  FROM reach GROUP BY src)
         SELECT doc_id, cluster_id,
                count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         FROM comp ORDER BY doc_id""",
    // D-module: exact double cosine reproduced in DuckDB via
    // list_zip/list_transform/list_sum over ::DOUBLE[] casts — the same
    // sequential fold Spark's aggregate() runs, so values match to the
    // 6dp round. d2's hyperplane LSH replays since round 7 exactly
    // like c5 (literal planes via VectorFns.planeValues, list_reduce
    // left fold), plus the multi-probe query fan-out: each query band
    // key XORs {0, 1, 2, 4, 8} (self + the four hamming-1 neighbors
    // of the 4-bit key) — the same explode Spark builds.
    "d2_ann_lsh" -> {
      val planeRows = (0 until 16).map { p =>
        graft.functions.VectorFns.planeValues(p, 64)
          .mkString(s"($p, [", ",", "]::DOUBLE[])")
      }.mkString(",")
      s"""WITH pl(p, pv) AS (VALUES $planeRows),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         nr AS (SELECT vec_id,
             sqrt(list_reduce(list_transform(emb, v -> v * v),
                              (a, x) -> a + x)) AS nrm FROM e),
         pj AS (SELECT vec_id, p,
             list_reduce(list_transform(list_zip(emb, pv),
                                        z -> z[1] * z[2]),
                         (a, x) -> a + x) AS pr
           FROM e CROSS JOIN pl),
         ky AS (SELECT vec_id, p // 4 AS band,
             sum(CASE WHEN pr > 0 THEN 1::BIGINT << (p % 4)::INT
                      ELSE 0 END)::BIGINT AS bkey
           FROM pj GROUP BY 1, 2),
         qk AS (SELECT ky.vec_id AS query_id, band,
                       xor(bkey, fl.f) AS bkey
                FROM ky CROSS JOIN (VALUES (0::BIGINT), (1), (2), (4), (8))
                  AS fl(f)
                WHERE ky.vec_id % 50 = 0),
         pr2 AS (SELECT DISTINCT qk.query_id, ky.vec_id AS cand_id
                 FROM ky JOIN qk ON ky.band = qk.band
                   AND ky.bkey = qk.bkey AND ky.vec_id <> qk.query_id),
         cs AS (SELECT query_id, cand_id,
             list_reduce(list_transform(list_zip(ec.emb, eq.emb),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nc.nrm * nq.nrm) AS cos
           FROM pr2 JOIN e ec ON cand_id = ec.vec_id
                    JOIN e eq ON query_id = eq.vec_id
                    JOIN nr nc ON cand_id = nc.vec_id
                    JOIN nr nq ON query_id = nq.vec_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id) AS rnk FROM cs)
         SELECT query_id, cand_id, rnk, round(cos, 6) AS cosine
         FROM r WHERE rnk <= 10 ORDER BY query_id, rnk"""
    },
    // d16: d1's exact-cosine rank over the fixed md5-salted batch,
    // then a majority vote over the k=10 neighbor labels (vote ties
    // break by smallest label, cosine ties by cand_id — total orders
    // in both engines).
    "d16_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
                    FROM embeddings
                    ORDER BY md5(vec_id::VARCHAR || 'q'), vec_id
                    LIMIT ${operators.SimOps.FixedQBatch}),
         p AS (SELECT q.query_id, e.vec_id AS cand_id, e.label,
           list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qe::DOUBLE[]),
                                   x -> x[1] * x[2]))
           / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v * v)))
            * sqrt(list_sum(list_transform(q.qe::DOUBLE[], v -> v * v)))) AS cos
           FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id) AS rnk FROM p),
         v AS (SELECT query_id, label, count(*) AS votes
               FROM r WHERE rnk <= 10 GROUP BY 1, 2),
         pr AS (SELECT query_id, label AS predicted_label, votes,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY votes DESC, label) AS rr FROM v)
         SELECT q.query_id, q.qlabel AS actual_label, pr.predicted_label,
                pr.votes, pr.predicted_label = q.qlabel AS agrees
         FROM q JOIN pr ON q.query_id = pr.query_id AND pr.rr = 1
         ORDER BY q.query_id""",
    "d1_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                    FROM embeddings WHERE vec_id % 50 = 0),
         p AS (SELECT q.query_id, e.vec_id AS cand_id,
           list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qe::DOUBLE[]),
                                   x -> x[1] * x[2]))
           / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v * v)))
            * sqrt(list_sum(list_transform(q.qe::DOUBLE[], v -> v * v)))) AS cos
           FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id) AS rnk FROM p)
         SELECT query_id, cand_id, rnk, round(cos, 6) AS cosine
         FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // d5 (round 7): at the registered defaults the whole IVF path is
    // deterministic SQL — centroids are the 32 smallest
    // (md5(vec_id), vec_id) vectors (the same md5-rank sample d9's
    // oracle replays), soft assignment keeps each vector's 2 nearest
    // cells, probes keep each query's 8, and the match+dedup+top-k is
    // ordinary relational algebra over bit-exact double cosine folds.
    "d5_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                    FROM embeddings),
         nr AS (SELECT vec_id,
             sqrt(list_reduce(list_transform(emb, v -> v * v),
                              (a, x) -> a + x)) AS nrm FROM e),
         ct AS (SELECT e.vec_id AS cent_id, emb AS ce, nrm AS cnrm
                FROM e JOIN nr ON e.vec_id = nr.vec_id
                ORDER BY md5(e.vec_id::VARCHAR), e.vec_id LIMIT 64),
         sc AS (SELECT e.vec_id, ct.cent_id,
             list_reduce(list_transform(list_zip(e.emb, ct.ce),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nr.nrm * ct.cnrm) AS csim
           FROM e JOIN nr ON e.vec_id = nr.vec_id CROSS JOIN ct),
         asg AS (SELECT vec_id, cent_id FROM sc
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cent_id) <= 4),
         prb AS (SELECT vec_id AS query_id, cent_id FROM sc
                 WHERE vec_id % 50 = 0
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cent_id) <= 8),
         dd AS (SELECT DISTINCT prb.query_id, asg.vec_id AS cand_id
                FROM asg JOIN prb ON asg.cent_id = prb.cent_id
                  AND asg.vec_id <> prb.query_id),
         cs AS (SELECT query_id, cand_id,
             list_reduce(list_transform(list_zip(ec.emb, eq.emb),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nc.nrm * nq.nrm) AS cos
           FROM dd JOIN e ec ON cand_id = ec.vec_id
                   JOIN e eq ON query_id = eq.vec_id
                   JOIN nr nc ON cand_id = nc.vec_id
                   JOIN nr nq ON query_id = nq.vec_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id) AS rnk FROM cs)
         SELECT query_id, cand_id, rnk, round(cos, 6) AS cosine
         FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // d11 (round 8): d5's IVF replay with the centroid sample drawn
    // from the STANDING corpus only (vec_id % 17 <> 0) — the frozen
    // routing an incremental upsert leaves untouched; every vector
    // (standing + batch) is soft-assigned through those centroids and
    // every 50th vector probes, so the SQL is d5's with one WHERE.
    "d11_ann_incremental" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                    FROM embeddings),
         nr AS (SELECT vec_id,
             sqrt(list_reduce(list_transform(emb, v -> v * v),
                              (a, x) -> a + x)) AS nrm FROM e),
         ct AS (SELECT e.vec_id AS cent_id, emb AS ce, nrm AS cnrm
                FROM e JOIN nr ON e.vec_id = nr.vec_id
                WHERE e.vec_id % 17 <> 0
                ORDER BY md5(e.vec_id::VARCHAR), e.vec_id LIMIT 64),
         sc AS (SELECT e.vec_id, ct.cent_id,
             list_reduce(list_transform(list_zip(e.emb, ct.ce),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nr.nrm * ct.cnrm) AS csim
           FROM e JOIN nr ON e.vec_id = nr.vec_id CROSS JOIN ct),
         asg AS (SELECT vec_id, cent_id FROM sc
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cent_id) <= 4),
         prb AS (SELECT vec_id AS query_id, cent_id FROM sc
                 WHERE vec_id % 50 = 0
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cent_id) <= 8),
         dd AS (SELECT DISTINCT prb.query_id, asg.vec_id AS cand_id
                FROM asg JOIN prb ON asg.cent_id = prb.cent_id
                  AND asg.vec_id <> prb.query_id),
         cs AS (SELECT query_id, cand_id,
             list_reduce(list_transform(list_zip(ec.emb, eq.emb),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nc.nrm * nq.nrm) AS cos
           FROM dd JOIN e ec ON cand_id = ec.vec_id
                   JOIN e eq ON query_id = eq.vec_id
                   JOIN nr nc ON cand_id = nc.vec_id
                   JOIN nr nq ON query_id = nq.vec_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id) AS rnk FROM cs)
         SELECT query_id, cand_id, rnk, round(cos, 6) AS cosine
         FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // d10 (round 7): d5's IVF routing + d9's md5-rank 256-entry PQ
    // codebook replay, composed end-to-end: encode = per-(vec,sub)
    // argmin of dist = sn + cn − 2·dot with ascending-cent_id
    // tie-break (PqNearestCentroid's strict `<` over id-sorted
    // entries), ADC = Σ_j dot(q_j, ce_j) / (√Σ_j cn_j · ‖q‖),
    // shortlist = top rerank·k by (adc_cos, cand_id), then the exact
    // rerank re-reads full vectors — final scores are the same
    // bit-exact cosine folds d1 hashes.
    "d10_ann_ivfpq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                    FROM embeddings),
         nr AS (SELECT vec_id,
             sqrt(list_reduce(list_transform(emb, v -> v * v),
                              (a, x) -> a + x)) AS nrm FROM e),
         ct AS (SELECT e.vec_id AS cent_id, emb AS ce, nrm AS cnrm
                FROM e JOIN nr ON e.vec_id = nr.vec_id
                ORDER BY md5(e.vec_id::VARCHAR), e.vec_id LIMIT 64),
         sc AS (SELECT e.vec_id, ct.cent_id,
             list_reduce(list_transform(list_zip(e.emb, ct.ce),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nr.nrm * ct.cnrm) AS csim
           FROM e JOIN nr ON e.vec_id = nr.vec_id CROSS JOIN ct),
         asg AS (SELECT vec_id, cent_id FROM sc
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cent_id) <= 4),
         prb AS (SELECT vec_id AS query_id, cent_id FROM sc
                 WHERE vec_id % 50 = 0
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cent_id) <= 8),
         dd AS (SELECT DISTINCT prb.query_id, asg.vec_id AS cand_id
                FROM asg JOIN prb ON asg.cent_id = prb.cent_id
                  AND asg.vec_id <> prb.query_id),
         sub AS (SELECT vec_id, unnest(generate_series(0, 7)) AS sub_j,
             unnest(list_transform(generate_series(0, 7),
               j -> list_slice(emb, (j*8 + 1)::INT, (j*8 + 8)::INT))) AS s
           FROM e),
         sel AS (SELECT vec_id FROM e
                 ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 256),
         cb AS (SELECT sub_j, vec_id AS cent_id, s AS ce,
                  list_sum(list_transform(s, x -> x * x)) AS cn
                FROM sub WHERE vec_id IN (SELECT vec_id FROM sel)),
         enc AS (SELECT sub.vec_id AS cand_id, sub.sub_j, cb.ce, cb.cn
           FROM sub JOIN cb ON sub.sub_j = cb.sub_j
           QUALIFY row_number() OVER (PARTITION BY sub.vec_id, sub.sub_j
             ORDER BY list_sum(list_transform(sub.s, x -> x * x)) + cb.cn
               - 2 * list_sum(list_transform(list_zip(sub.s, cb.ce),
                                             x -> x[1] * x[2])),
               cb.cent_id) = 1),
         qs AS (SELECT vec_id AS query_id, sub_j, s AS qsub FROM sub
                WHERE vec_id % 50 = 0),
         adc AS (SELECT dd.query_id, dd.cand_id,
             sum(list_sum(list_transform(list_zip(q.qsub, enc.ce),
                                         x -> x[1] * x[2]))) AS adot,
             sum(enc.cn) AS rn2
           FROM dd JOIN enc ON dd.cand_id = enc.cand_id
                   JOIN qs q ON dd.query_id = q.query_id
                     AND enc.sub_j = q.sub_j
           GROUP BY 1, 2 HAVING sum(enc.cn) > 0),
         shr AS (SELECT adc.query_id, adc.cand_id FROM adc
                 JOIN nr ON adc.query_id = nr.vec_id
                 QUALIFY row_number() OVER (PARTITION BY adc.query_id
                   ORDER BY adot / (sqrt(rn2) * nr.nrm) DESC, cand_id)
                   <= 160),
         ex AS (SELECT query_id, cand_id,
             list_reduce(list_transform(list_zip(ec.emb, eq.emb),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nc.nrm * nq.nrm) AS cos
           FROM shr JOIN e ec ON cand_id = ec.vec_id
                    JOIN e eq ON query_id = eq.vec_id
                    JOIN nr nc ON cand_id = nc.vec_id
                    JOIN nr nq ON query_id = nq.vec_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id) AS rnk FROM ex)
         SELECT query_id, cand_id, rnk, round(cos, 6) AS cosine
         FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // d4 shares d1's oracle verbatim — the custom TopKAggregator must
    // reproduce the window top-k bit-for-bit.
    "d4_ann_topk_agg" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                    FROM embeddings WHERE vec_id % 50 = 0),
         p AS (SELECT q.query_id, e.vec_id AS cand_id,
           list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qe::DOUBLE[]),
                                   x -> x[1] * x[2]))
           / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v * v)))
            * sqrt(list_sum(list_transform(q.qe::DOUBLE[], v -> v * v)))) AS cos
           FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id) AS rnk FROM p)
         SELECT query_id, cand_id, rnk, round(cos, 6) AS cosine
         FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // d6: the same exact double fold, thresholded instead of ranked —
    // the filter runs on the full-precision cosine in both engines, so
    // the boundary decision is identical.
    "d6_ann_range" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                    FROM embeddings WHERE vec_id % 10 = 0),
         p AS (SELECT q.query_id, e.vec_id AS cand_id,
           list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qe::DOUBLE[]),
                                   x -> x[1] * x[2]))
           / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v * v)))
            * sqrt(list_sum(list_transform(q.qe::DOUBLE[], v -> v * v)))) AS cos
           FROM embeddings e, q WHERE e.vec_id <> q.query_id)
         SELECT query_id, cand_id, round(cos, 6) AS cosine
         FROM p WHERE cos >= 0.15 ORDER BY query_id, cand_id""",
    // d7: d1's exact fold with the metadata PRE-filter — candidates
    // restricted to docs whose lang matches, queries unfiltered.
    "d7_ann_filtered" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                    FROM embeddings WHERE vec_id % 50 = 0),
         m AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         p AS (SELECT q.query_id, e.vec_id AS cand_id,
           list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qe::DOUBLE[]),
                                   x -> x[1] * x[2]))
           / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v * v)))
            * sqrt(list_sum(list_transform(q.qe::DOUBLE[], v -> v * v)))) AS cos
           FROM embeddings e JOIN m ON e.vec_id = m.doc_id, q
           WHERE e.vec_id <> q.query_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id) AS rnk FROM p)
         SELECT query_id, cand_id, rnk, round(cos, 6) AS cosine
         FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""",
    "d3_embedding_stats" ->
      """SELECT label, count(*) AS n_vecs,
         round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], v -> v * v)))), 4) AS avg_norm,
         round(avg(list_sum(embedding::DOUBLE[]) / len(embedding)), 6) AS avg_component_mean
         FROM embeddings GROUP BY label ORDER BY label""",
    // E-module rule: token logic = string_split(text,' ') in DuckDB ≡
    // split(text," ") in Spark; identical IEEE double expressions on
    // both sides before the final round().
    // CAST: DuckDB sums INTEGER (len()) into HUGEINT — see a5 note.
    "e1_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
         CAST(sum(len(regexp_extract_all(text, '[a-zA-Z0-9]+'))) AS BIGINT) AS total_re_tokens
         FROM documents GROUP BY lang ORDER BY lang""",
    "e2_quality_score" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                    FROM documents)
         SELECT doc_id, len(toks) AS n_tokens,
           round(len(list_filter(toks, t -> t IN ('the','a','of','to','and')))::DOUBLE
                 / len(toks), 6) AS stopword_ratio,
           round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
                 / length(text), 6) AS punct_ratio,
           round(len(list_distinct(toks))::DOUBLE / len(toks), 6) AS type_token_ratio,
           round(0.25 * least(len(toks) / 100.0, 1.0)
               + 0.25 * (1.0 - len(list_filter(toks, t -> t IN ('the','a','of','to','and')))::DOUBLE / len(toks))
               + 0.25 * (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text))
               + 0.25 * len(list_distinct(toks))::DOUBLE / len(toks), 4) AS quality
         FROM t ORDER BY doc_id""",
    // e3: the Cavnar–Trenkle replay — training (md5-rank per-lang
    // sample → top-K char-1..3-gram rank profiles) is plain relational
    // algebra on both sides, so the oracle re-derives the profiles
    // itself; constants interpolated from TextOps. All-integer
    // distances, (count DESC, gram) / (dist, lang) total orders.
    "e3_lang_id" ->
      s"""WITH d AS (SELECT doc_id, lang, text FROM documents),
         grams AS (SELECT doc_id, lang, unnest(
             (CASE WHEN len(text) >= 1 THEN list_transform(
                generate_series(1, len(text)), i -> substr(text, i, 1))
              ELSE [] END) ||
             (CASE WHEN len(text) >= 2 THEN list_transform(
                generate_series(1, len(text) - 1), i -> substr(text, i, 2))
              ELSE [] END) ||
             (CASE WHEN len(text) >= 3 THEN list_transform(
                generate_series(1, len(text) - 2), i -> substr(text, i, 3))
              ELSE [] END)) AS g
           FROM d),
         smp AS (SELECT doc_id FROM d
                 QUALIFY row_number() OVER (PARTITION BY lang
                   ORDER BY md5(doc_id::VARCHAR), doc_id)
                   <= ${TextOps.LangTrainPerLang}),
         prof AS (SELECT lang AS plang, g,
             row_number() OVER (PARTITION BY lang
               ORDER BY c DESC, g) AS prnk
           FROM (SELECT lang, g, count(*) AS c FROM grams
                 WHERE doc_id IN (SELECT doc_id FROM smp) GROUP BY 1, 2)
           QUALIFY prnk <= ${TextOps.LangProfileK}),
         dt AS (SELECT doc_id, g,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY c DESC, g) AS drnk
           FROM (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
           QUALIFY drnk <= ${TextOps.LangProfileK}),
         langs AS (SELECT DISTINCT plang FROM prof),
         sc AS (SELECT dt.doc_id, langs.plang,
             sum(coalesce(abs(dt.drnk - prof.prnk),
                          ${TextOps.LangProfileK}))::BIGINT AS dist
           FROM dt CROSS JOIN langs
                LEFT JOIN prof ON prof.plang = langs.plang AND prof.g = dt.g
           GROUP BY 1, 2),
         best AS (SELECT doc_id, plang AS guessed_lang, dist FROM sc
                  QUALIFY row_number() OVER (PARTITION BY doc_id
                    ORDER BY dist, plang) = 1)
         SELECT d.doc_id, d.lang AS labeled_lang,
                best.guessed_lang, best.dist AS profile_dist
         FROM d LEFT JOIN best ON d.doc_id = best.doc_id
         ORDER BY d.doc_id""",
    "e4_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
         md5(array_to_string(string_split(text, ' '), ' ')) AS fp_norm,
         length(text) AS n_chars_actual
         FROM documents ORDER BY doc_id""",
    // e5: same left fold — list_reduce has no init arg, so the seed 0
    // is prepended to the value list.
    "e5_rolling_fingerprint" ->
      """SELECT doc_id,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(string_split(text, ' '),
                            t -> (ascii(t) * 256 + length(t))::BIGINT)),
           (acc, v) -> (acc * 1000003 + v) % 2147483647) AS rolling_fp,
         len(string_split(text, ' ')) AS n_tokens
         FROM documents ORDER BY doc_id""",
    // e6: the DuckDB shingle twin (generate_series + list_slice +
    // array_to_string ≡ Spark's sequence + slice + concat_ws), counted
    // globally with the same (count desc, ngram) tiebreak.
    "e6_ngram_freq" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
         g AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS ngram
               FROM t WHERE len(toks) >= 2)
         SELECT ngram, count(*) AS n_occurrences
         FROM g GROUP BY ngram
         ORDER BY n_occurrences DESC, ngram LIMIT 50""",
    // e7: per-doc distinct-window ratio. Spark distinct-counts xxhash64
    // of each window (primitive fast path); the string-side
    // list_distinct here agrees — 64-bit collisions within a ~1k-window
    // doc are negligible.
    "e7_dup_ngram_ratio" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (SELECT doc_id,
           CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [] END AS gs
           FROM t)
         SELECT doc_id, len(gs) AS n_ngrams,
           len(list_distinct(gs)) AS n_distinct,
           round(CASE WHEN len(gs) = 0 THEN 0.0
                 ELSE 1.0 - len(list_distinct(gs))::DOUBLE / len(gs) END,
                 6) AS dup_ratio
         FROM g ORDER BY doc_id""",
    // p2: 8-gram twin + eval/corpus split + left join; the [NULL]
    // branch mirrors Spark's explode_outer keeping windowless docs
    // with n_shared = 0.
    "p2_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (SELECT doc_id,
           CASE WHEN len(toks) >= 8
                THEN list_transform(generate_series(1, len(toks) - 7),
                       i -> array_to_string(list_slice(toks, i, i + 7), ' '))
                ELSE [] END AS gs
           FROM t),
         ev AS (SELECT DISTINCT unnest(gs) AS ng FROM g WHERE doc_id % 97 = 0),
         corpus AS (SELECT doc_id,
            unnest(CASE WHEN len(gs) = 0 THEN [CAST(NULL AS VARCHAR)]
                   ELSE list_distinct(gs) END) AS ng
            FROM g WHERE doc_id % 97 <> 0)
         SELECT c.doc_id, count(e.ng) AS n_shared,
           CAST(count(e.ng) > 0 AS INTEGER) AS contaminated
         FROM corpus c LEFT JOIN ev e ON c.ng = e.ng
         GROUP BY c.doc_id ORDER BY c.doc_id""",
    // e8: identical deterministic augmentation (PII derived from
    // doc_id), identical Java∩RE2 regexes, counts + redacted md5.
    "e8_pii_scrub" ->
      """WITH a AS (SELECT doc_id,
           text ||
           CASE WHEN doc_id % 7 = 0
                THEN ' contact u' || doc_id || '@example.com' ELSE '' END ||
           CASE WHEN doc_id % 11 = 0
                THEN ' call 555-123-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                ELSE '' END AS t
           FROM documents)
         SELECT doc_id,
           len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+')) AS n_emails,
           len(regexp_extract_all(t, '555-[0-9]{3}-[0-9]{4}')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(t, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+', '[EMAIL]', 'g'),
                 '555-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS redacted_fp
         FROM a ORDER BY doc_id""",
    // p3: edges = ALL pairs with exact 3-gram-set Jaccard >= 0.8
    // (inverted-index candidates + list_intersect), closed with the
    // same recursive-CTE reachability as c6. Spark generates its
    // candidate pairs via MinHash-LSH instead — a tau=0.8 pair escapes
    // all 32 bands with prob (1-0.8^4)^32 ~= 5e-8, and DedupOpsSpec
    // checks candidate coverage of every >=tau pair on the test
    // corpus, which is what makes this exact oracle reproducible.
    "p3_fuzzy_dedup" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                ELSE [] END) AS gs FROM t),
         ex AS (SELECT doc_id, unnest(gs) AS s FROM g),
         cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id),
         j AS (SELECT a, b,
                 len(list_intersect(ga.gs, gb.gs))::DOUBLE
                   / (len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)))
                   AS jacc
               FROM cand JOIN g ga ON cand.a = ga.doc_id
                         JOIN g gb ON cand.b = gb.doc_id),
         prs AS (SELECT a, b FROM j WHERE jacc >= 0.8),
         edges AS (SELECT a, b FROM prs
                   UNION ALL SELECT b AS a, a AS b FROM prs),
         reach(src, dst) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         comp AS (SELECT src AS doc_id, min(dst) AS cluster_id
                  FROM reach GROUP BY src)
         SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           (doc_id = cluster_id) AS is_representative
         FROM comp ORDER BY doc_id""",
    // p5: the streaming corpus ingest — e2/e4's enrichment formulas,
    // deduped to the min-doc_id row per distinct content (the
    // deterministic winner the stateful fold keeps in its single
    // AvailableNow batch; duplicate-robust — sf0.1 has 8 dup texts).
    "p5_stream_ingest" ->
      """WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
         e AS (SELECT doc_id, lang, md5(text) AS fp, len(toks) AS n_tokens,
           round(0.25 * least(len(toks) / 100.0, 1.0)
               + 0.25 * (1.0 - len(list_filter(toks, t -> t IN ('the','a','of','to','and')))::DOUBLE / len(toks))
               + 0.25 * (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text))
               + 0.25 * len(list_distinct(toks))::DOUBLE / len(toks), 4) AS quality
           FROM t),
         r AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
               FROM e)
         SELECT doc_id, lang, fp, n_tokens, quality FROM r
         WHERE rn = 1 ORDER BY doc_id""",
    // p6: the greedy token-budget cut in md5 order — the oracle's
    // single global cumsum per lang equals Spark's block prefix-sum
    // because the bucket is a key prefix (same total order).
    "p6_token_budget_mix" ->
      """WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
                    md5(doc_id::VARCHAR) AS key FROM documents
                    WHERE text IS NOT NULL),
         c AS (SELECT doc_id, lang, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY lang
                   ORDER BY key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
               FROM d)
         SELECT doc_id, lang, n_tokens, cum_tokens FROM c
         WHERE cum_tokens <= 2000 ORDER BY lang, cum_tokens""",
    // p7: α = 0.5 so both engines use sqrt (IEEE-exact where a general
    // pow need not agree bit-for-bit); round(..., 6) before floor so
    // the 5-value denominator sum's addition-order ulp can't flip the
    // integer (boundary distance ≥ 0.01 at every test SF). The
    // oracle's single row_number per lang equals Spark's block
    // prefix-sum rank because the bucket is a key prefix.
    "p7_temperature_mix" ->
      """WITH n AS (SELECT lang, count(*)::BIGINT AS n_docs
                    FROM documents GROUP BY 1),
         w AS (SELECT lang, n_docs,
                 floor(round(sum(n_docs) OVER () * sqrt(n_docs)
                             / sum(sqrt(n_docs)) OVER (), 6))::BIGINT
                   AS target_docs
               FROM n),
         r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(doc_id::VARCHAR), doc_id) AS rnk
               FROM documents)
         SELECT r.lang, r.doc_id, w.target_docs,
                (w.target_docs // w.n_docs
                 + CASE WHEN rnk <= w.target_docs % w.n_docs
                        THEN 1 ELSE 0 END)::BIGINT AS n_copies
         FROM r JOIN w ON r.lang = w.lang
         WHERE w.target_docs // w.n_docs
               + CASE WHEN rnk <= w.target_docs % w.n_docs
                      THEN 1 ELSE 0 END > 0
         ORDER BY r.lang, r.doc_id""",
    // p8: one global cumsum in DuckDB equals Spark's block prefix-sum
    // (the bucket is a key prefix — same total order); integer bin
    // arithmetic on the exclusive prefix is engine-agnostic.
    "p8_sequence_pack" ->
      """WITH d AS (SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             md5(doc_id::VARCHAR) AS key
           FROM documents WHERE text IS NOT NULL),
         c AS (SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - n_tokens AS strt
           FROM d)
         SELECT doc_id, n_tokens,
                strt // 2048 AS bin_id,
                strt % 2048 AS bin_offset,
                (strt + n_tokens - 1) // 2048 - strt // 2048 AS extra_bins
         FROM c ORDER BY bin_id, bin_offset""",
    // e9: identical chunk grid (non-overlapping 16-token runs,
    // 1-indexed inclusive slices), md5 chunk fingerprints, distinct-doc
    // df, and in-order reassembly of the survivors; string_agg skips
    // the NULLs CASE leaves for dropped chunks exactly as collect_list
    // does, and coalesce('') matches Spark's empty array_join.
    "e9_para_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
         c AS (SELECT doc_id,
             unnest(generate_series(0, ((len(toks) + 15) // 16 - 1)::BIGINT))
               AS pos,
             unnest(list_transform(
               generate_series(0, ((len(toks) + 15) // 16 - 1)::BIGINT),
               j -> array_to_string(
                      list_slice(toks, (j*16 + 1)::INT, (j*16 + 16)::INT),
                      ' '))) AS chunk
           FROM t),
         d AS (SELECT md5(chunk) AS cfp, count(DISTINCT doc_id) AS df
               FROM c GROUP BY 1),
         k AS (SELECT c.doc_id, c.pos, c.chunk, d.df
               FROM c JOIN d ON md5(c.chunk) = d.cfp)
         SELECT doc_id,
                count(*)::BIGINT AS n_chunks,
                sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
                sum(CASE WHEN df < 2 THEN len(string_split(chunk, ' '))
                         ELSE 0 END)::BIGINT AS clean_n_tokens,
                md5(coalesce(string_agg(CASE WHEN df < 2 THEN chunk END,
                                        ' ' ORDER BY pos), '')) AS clean_fp
         FROM k GROUP BY doc_id ORDER BY doc_id""",
    // e10: the oracle takes the RELATIONAL route to the same mode
    // (explode → count → rank with (cnt DESC, gram) — the rank
    // tie-break equals Spark's sorted-run fold, which keeps the
    // lexicographically-smallest gram among ties); docs with no
    // n-grams fall out of the rank CTEs and coalesce to 0.
    "e10_top_ngram_share" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                    FROM documents),
         g2 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
                  THEN list_transform(generate_series(1, len(toks) - 1),
                         i -> array_to_string(list_slice(toks, i, i + 1), ' '))
                  ELSE [] END) AS gram FROM t),
         g3 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
                  THEN list_transform(generate_series(1, len(toks) - 2),
                         i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                  ELSE [] END) AS gram FROM t),
         g4 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 4
                  THEN list_transform(generate_series(1, len(toks) - 3),
                         i -> array_to_string(list_slice(toks, i, i + 3), ' '))
                  ELSE [] END) AS gram FROM t),
         t2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2
                QUALIFY row_number() OVER (PARTITION BY doc_id
                  ORDER BY cnt DESC, gram) = 1),
         t3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2
                QUALIFY row_number() OVER (PARTITION BY doc_id
                  ORDER BY cnt DESC, gram) = 1),
         t4 AS (SELECT doc_id, gram, count(*) AS cnt FROM g4 GROUP BY 1, 2
                QUALIFY row_number() OVER (PARTITION BY doc_id
                  ORDER BY cnt DESC, gram) = 1)
         SELECT t.doc_id,
           coalesce(round(t2.cnt * length(t2.gram) / length(t.text), 6),
                    0.0) AS top2gram_frac,
           coalesce(round(t3.cnt * length(t3.gram) / length(t.text), 6),
                    0.0) AS top3gram_frac,
           coalesce(round(t4.cnt * length(t4.gram) / length(t.text), 6),
                    0.0) AS top4gram_frac
         FROM t LEFT JOIN t2 ON t.doc_id = t2.doc_id
                LEFT JOIN t3 ON t.doc_id = t3.doc_id
                LEFT JOIN t4 ON t.doc_id = t4.doc_id
         ORDER BY t.doc_id""",
    // e11: same unigram table, same log10 average (round 4 absorbs
    // libm/sum-order ulps), and ntile(3) over (ROUNDED score DESC,
    // doc_id) — the standard first-buckets-take-the-remainder
    // assignment Spark computes arithmetically from its block-ranked
    // global rank.
    "e11_unigram_logprob" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         uni AS (SELECT tok, count(*)::BIGINT AS c FROM t GROUP BY 1),
         tot AS (SELECT sum(c) AS total FROM uni),
         sc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                  round(avg(log10(c::DOUBLE / total)), 4) AS avg_logprob
                FROM t JOIN uni USING (tok) CROSS JOIN tot
                GROUP BY doc_id)
         SELECT doc_id, n_tokens, avg_logprob,
           ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS bucket
         FROM sc ORDER BY doc_id""",
    // e12: identical arithmetic on both sides — mean word length from
    // (chars - spaces)/words, symbol count from replace-diff + regex
    // count, rule booleans on the UNROUNDED values (same doubles from
    // the same expressions ⇒ same flags).
    // e13: bigram LM with stupid backoff, trained on the ~2% reference
    // slice (doc_id % 50 = 1) and scored over every doc — generate_
    // series positions build the bigrams (e6's shape), LEFT joins
    // carry the seen/unseen arm, and the backoff base is the
    // add-one-smoothed reference unigram. round(,4)/(,6) absorb the
    // engines' float-summation order (e11's precedent).
    "e13_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
         ref AS (SELECT * FROM t WHERE doc_id % 50 = 1),
         uni AS (SELECT unnest(toks) AS tok FROM ref),
         uc AS (SELECT tok, count(*) AS cu FROM uni GROUP BY tok),
         tv AS (SELECT sum(cu) AS t, count(*) AS v FROM uc),
         rb AS (SELECT unnest(list_transform(
                  generate_series(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i + 1])) AS bg
                FROM ref WHERE len(toks) >= 2),
         bc AS (SELECT bg, count(*) AS cb FROM rb GROUP BY bg),
         g AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i,
                      toks
               FROM t WHERE len(toks) >= 2),
         p AS (SELECT doc_id, toks[i] AS prev, toks[i + 1] AS cur,
                      toks[i] || ' ' || toks[i + 1] AS bg FROM g),
         sc AS (SELECT p.doc_id,
             CASE WHEN bc.cb IS NOT NULL
                  THEN log10(bc.cb::DOUBLE / up.cu)
                  ELSE log10(0.4 * (coalesce(ucur.cu, 0) + 1)::DOUBLE
                             / (tv.t + tv.v + 1)) END AS lp,
             CASE WHEN bc.cb IS NULL THEN 1 ELSE 0 END AS oov
           FROM p
           LEFT JOIN bc USING (bg)
           LEFT JOIN uc up ON p.prev = up.tok
           LEFT JOIN uc ucur ON p.cur = ucur.tok
           CROSS JOIN tv)
         SELECT doc_id, count(*) AS n_bigrams,
           round(avg(lp), 4) AS avg_logprob,
           round(sum(oov)::DOUBLE / count(*), 6) AS unseen_rate
         FROM sc GROUP BY doc_id ORDER BY doc_id""",
    // e14b: e14's DuckDB-expressible half — whitespace counts + byte
    // length (the byte-level BPE's pre-merge token count); the learned
    // BPE columns stay JVM-spec'd in e14's rows-only row.
    "e14b_bpe_accounting" ->
      """SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
           strlen(text)::BIGINT AS n_bytes
         FROM documents WHERE text IS NOT NULL ORDER BY doc_id""",
    // e15: entropy folds over the SORTED distinct-token list in both
    // engines (list_reduce ≡ Spark's aggregate, same accumulation
    // order), so round(6) is presentation, not tolerance
    "e15_word_entropy" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
         u AS (SELECT doc_id, toks,
                 list_sort(list_distinct(toks)) AS uniq FROM t),
         c AS (SELECT doc_id, len(toks)::DOUBLE AS n, uniq,
                 list_transform(uniq, w ->
                   len(list_filter(toks, x -> x = w))::DOUBLE) AS counts
               FROM u),
         s AS (SELECT doc_id, n, len(uniq)::BIGINT AS d,
                 -list_reduce(
                    list_transform(counts,
                      c -> (c / n) * log2(c / n)),
                    (a, b) -> a + b) AS ent,
                 list_max(counts) AS mx
               FROM c)
         SELECT doc_id, n::BIGINT AS n_tokens, d AS n_distinct,
           round(d / n, 6) AS ttr,
           round(ent, 6) AS entropy,
           round(CASE WHEN d > 1 THEN ent / log2(d::DOUBLE)
                      ELSE 0.0 END, 6) AS norm_entropy,
           round(mx / n, 6) AS top_share
         FROM s ORDER BY doc_id""",
    // e16: BM25 over the literal query workload (values interpolated
    // from RetrievalOps.Bm25Queries — one source of truth). The score
    // fold runs over the (term ASC)-sorted contribution list in both
    // engines (the e15 convention), so the double accumulation order
    // is identical and round(6) is presentation, not tolerance.
    "e16_bm25_search" -> {
      val vals = RetrievalOps.Bm25Queries
        .map { case (i, t) => s"($i, '$t')" }.mkString(", ")
      s"""WITH q(query_id, qtext) AS (VALUES $vals),
         qt AS (SELECT query_id::BIGINT AS query_id,
                  unnest(list_distinct(list_filter(
                    string_split(qtext, ' '), w -> w <> ''))) AS term
                FROM q),
         $bm25Postings,
         ${bm25Scoring(exclSelf = false)}
         SELECT query_id, rnk, doc_id, n_terms, round(score, 6) AS score
         FROM rb WHERE rnk <= 10 ORDER BY query_id, rnk"""
    },
    // e16z: e16's replay over the ZipfCheck corpus — the `documents`
    // CTE shadows the table name and RE-DERIVES the corpus from the
    // shared arithmetic construction (sources.ZipfCheck), so the
    // replay is self-contained and only the corpus construction is
    // shared (BM25 re-derives independently on both sides)
    "e16z_bm25_zipf" -> {
      val vals = sources.ZipfCheck.Queries
        .map { case (i, t) => s"($i, '$t')" }.mkString(", ")
      s"""WITH documents AS (
           SELECT doc_id,
             array_to_string(list_transform(generate_series(0, dl - 1),
               p -> 'w' || greatest(1,
                 floor(pow(${sources.ZipfCheck.Vocab}::DOUBLE,
                   ((doc_id * 2654435761 + p * 40503) % 1048576)
                     / 1048576.0))::BIGINT)), ' ') AS text
           FROM (SELECT id AS doc_id, 24 + (id * 48271) % 16 AS dl
                 FROM range(0, ${sources.ZipfCheck.NDocs}) t(id))),
         q(query_id, qtext) AS (VALUES $vals),
         qt AS (SELECT query_id::BIGINT AS query_id,
                  unnest(list_distinct(list_filter(
                    string_split(qtext, ' '), w -> w <> ''))) AS term
                FROM q),
         $bm25Postings,
         ${bm25Scoring(exclSelf = false)}
         SELECT query_id, rnk, doc_id, n_terms, round(score, 6) AS score
         FROM rb WHERE rnk <= 10 ORDER BY query_id, rnk"""
    },
    // e17: the NB training is counts-based relational algebra, so the
    // oracle re-derives the model exactly (the e3 pattern); per-doc
    // log-odds folds over the sorted contribution list.
    "e17_quality_classifier" ->
      """WITH d AS (SELECT doc_id, source = 'src0' AS is_ref,
               list_filter(string_split(text, ' '), w -> w <> '') AS toks
             FROM documents WHERE text IS NOT NULL),
         b AS (SELECT doc_id, is_ref, unnest(toks) AS term FROM d),
         tc AS (SELECT term,
                  sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS cpos,
                  sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS cneg
                FROM b GROUP BY 1),
         tot AS (SELECT sum(cpos)::DOUBLE AS tpos, sum(cneg)::DOUBLE AS tneg,
                        count(*)::DOUBLE AS v FROM tc),
         pri AS (SELECT sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::DOUBLE AS npos,
                        sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::DOUBLE AS nneg
                 FROM d),
         wt AS (SELECT term,
                  ln((cpos + 1.0) / (tpos + v))
                    - ln((cneg + 1.0) / (tneg + v)) AS lw
                FROM tc CROSS JOIN tot),
         dtf AS (SELECT doc_id, is_ref, term, count(*)::DOUBLE AS tf
                 FROM b GROUP BY 1, 2, 3),
         ct AS (SELECT doc_id, is_ref, term, tf, tf * lw AS s
                FROM dtf JOIN wt USING (term)),
         sc AS (SELECT doc_id, is_ref,
                  list_reduce(list_prepend(0.0::DOUBLE, list_transform(
                    list_sort(list(struct_pack(term := term, s := s))),
                    x -> x.s)),
                    (acc, x) -> acc + x) AS score,
                  CAST(sum(tf) AS BIGINT) AS n_tokens
                FROM ct GROUP BY 1, 2)
         SELECT doc_id, n_tokens, is_ref,
           round((ln(npos) - ln(nneg)) + score, 6) AS log_odds,
           round((ln(npos) - ln(nneg)) + score, 6) > 0 AS keep
         FROM sc CROSS JOIN pri
         ORDER BY doc_id""",
    // c12: the bloom gate only PRUNES (no false negatives; false
    // positives resolved by the exact verify), so the replay is a
    // plain join on the normalized word-set key
    "c12_bloom_dedup" ->
      """WITH d AS (SELECT doc_id,
                 array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ') AS k
               FROM documents WHERE text IS NOT NULL),
         b AS (SELECT doc_id, k FROM d WHERE doc_id % 10 = 0),
         s AS (SELECT doc_id, k FROM d WHERE doc_id % 10 <> 0),
         m AS (SELECT b.doc_id, min(s.doc_id) AS dup_of
               FROM b JOIN s USING (k) GROUP BY b.doc_id)
         SELECT b.doc_id, m.dup_of,
           (m.dup_of IS NOT NULL) AS is_dup
         FROM b LEFT JOIN m USING (doc_id) ORDER BY doc_id""",
    "e12_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                    FROM documents),
         s AS (SELECT doc_id,
             len(toks)::BIGINT AS n_tokens,
             (length(text)::DOUBLE - len(toks) + 1) / len(toks) AS mw,
             ((length(text) - length(replace(text, '#', '')))
              + len(regexp_extract_all(text, '\.\.\.')))::DOUBLE
               / len(toks) AS sr,
             len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
               / len(toks) AS af,
             len(list_distinct(list_filter(toks,
               x -> x IN ('the','a','of','to','and'))))::BIGINT AS ns
           FROM t)
         SELECT doc_id, n_tokens,
           round(mw, 6) AS mean_word_len,
           round(sr, 6) AS symbol_ratio,
           round(af, 6) AS alpha_word_frac,
           ns AS n_distinct_stops,
           (n_tokens >= 50 AND n_tokens <= 100000) AS r_len,
           (mw >= 3.0 AND mw <= 10.0) AS r_mean_word,
           (sr < 0.1) AS r_symbol,
           (af > 0.8) AS r_alpha,
           (ns >= 2) AS r_stops,
           ((n_tokens >= 50 AND n_tokens <= 100000) AND
            (mw >= 3.0 AND mw <= 10.0) AND (sr < 0.1) AND
            (af > 0.8) AND (ns >= 2)) AS keep
         FROM s ORDER BY doc_id""",
    // F-module (round 7): the stub decode is md5-derived end-to-end
    // (checksum64 = Md5Hash64.hashBytes(payload), modality =
    // pmod(md5hash64(source), 3)), so the whole family replays in
    // DuckDB via the shared mediaMetaSql prelude. f2/f4's per-frame
    // hashes only need LOW bit-windows of `checksum ^ (i * K)`:
    // bits [0,8) and [16,32) of an xor are the xor of the operands'
    // same bit-windows, and (i*K) mod 2^64 is exact in HUGEINT — so
    // the oracle never materializes the full 64-bit seed.
    "f1_multimodal_meta" ->
      s"""WITH $mediaMetaSql
         SELECT doc_id, media_type, n_bytes, width, height, channels,
                duration_ms, checksum
         FROM meta ORDER BY doc_id""",
    "f2_frame_sample" ->
      s"""WITH $mediaMetaSql,
         fr AS (SELECT doc_id, u,
             least(greatest(1, duration_ms // 1000), 16) AS n FROM meta),
         fx AS (SELECT doc_id,
             unnest(generate_series(0, n - 1)) AS i, u FROM fr),
         ft AS (SELECT doc_id, i,
             ((xor((u % 256)::BIGINT, ((i * 21) % 256)::BIGINT) - 128)
               / 128.0) AS feat0
           FROM fx)
         SELECT doc_id, count(*)::BIGINT AS n_frames,
                (max(i) * 1000)::BIGINT AS last_frame_ms,
                round(avg(feat0), 6) AS avg_feat0
         FROM ft GROUP BY doc_id ORDER BY doc_id""",
    "f3_media_by_lang" ->
      s"""WITH $mediaMetaSql
         SELECT lang, media_type, count(*)::BIGINT AS n_media,
                sum(n_bytes)::BIGINT AS total_bytes,
                round(avg(n_bytes), 4) AS avg_bytes,
                sum(duration_ms)::BIGINT AS total_duration_ms
         FROM meta GROUP BY lang, media_type ORDER BY lang, media_type""",
    "f4_audio_windows" ->
      s"""WITH $mediaMetaSql,
         au AS (SELECT doc_id, u, greatest(duration_ms, 1000) AS dur
                FROM meta WHERE media_type = 'audio'),
         wn AS (SELECT doc_id, u,
                least((dur - 1000) // 500 + 1, 32) AS n FROM au),
         wx AS (SELECT doc_id, u,
                unnest(generate_series(0, n - 1)) AS i FROM wn),
         wr AS (SELECT doc_id, i,
             xor(((u // 65536) % 65536)::BIGINT,
                 (((i::HUGEINT * ${java.lang.Long
                     .toUnsignedString(0xD6E8FEB86659FD93L)}::HUGEINT)
                   % 18446744073709551616::HUGEINT // 65536) % 65536)::BIGINT)
               / 65535.0 AS rms
           FROM wx),
         pk AS (SELECT doc_id, i, row_number() OVER (PARTITION BY doc_id
                  ORDER BY rms DESC, i DESC) AS rn FROM wr)
         SELECT wr.doc_id, count(*)::BIGINT AS n_windows,
                round(avg(rms), 6) AS avg_rms,
                round(max(rms), 6) AS peak_rms,
                any_value(pk.i)::INT AS peak_window
         FROM wr JOIN pk ON wr.doc_id = pk.doc_id AND pk.rn = 1
         GROUP BY wr.doc_id ORDER BY wr.doc_id""",
    // f8: the stub arm is the whole story on the synthetic corpus —
    // f4's window-field replay (same HUGEINT wrap-around multiply)
    // compared pairwise into delta-sign bits, packed with the f6
    // bit_or idiom, then f6's band/cap/verify SQL (the generated
    // C(6,3) block-combination fragments) over the ≥33-window
    // eligible slice. Ints compare where Spark compares field/65535
    // doubles — the division is strictly monotone. Fingerprint
    // prelude (through sg) shared with f8b via audioFpSql — one
    // source of truth for the replay, the bm25Postings pattern.
    "f8_audio_neardup" ->
      s"""WITH $audioFpSql,
         el AS (SELECT doc_id, afp FROM sg WHERE n_windows >= 33),
         blk AS (SELECT doc_id, afp, ${b6Sql("afp")} AS b6 FROM el),
         e AS (SELECT doc_id, afp, band, $blockKeySql AS bkey
               FROM blk CROSS JOIN $combosSql),
         cap AS (SELECT * FROM (
             SELECT e.*, count(*) OVER (PARTITION BY band, bkey) AS cnt
             FROM e)
           WHERE cnt <= 64),
         p AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
           FROM cap x JOIN cap y ON x.band = y.band AND x.bkey = y.bkey
             AND x.doc_id < y.doc_id),
         nd AS (SELECT a_id, b_id FROM p
             JOIN el sa ON sa.doc_id = a_id
             JOIN el sb ON sb.doc_id = b_id
           WHERE bit_count(xor(sa.afp, sb.afp)) <= 3),
         prt AS (SELECT doc_id, min(partner) AS dup_of FROM
             (SELECT a_id AS doc_id, b_id AS partner FROM nd
              UNION ALL SELECT b_id, a_id FROM nd) GROUP BY 1)
         SELECT sg.doc_id, sg.afp, sg.n_windows, prt.dup_of,
                prt.dup_of IS NOT NULL AS is_neardup
         FROM sg LEFT JOIN prt USING (doc_id) ORDER BY doc_id""",
    // f8b: the shared fingerprint replay with the corpus split into a
    // standing catalog (doc_id % mod <> 0, ELIGIBLE rows only — the
    // index excludes sub-threshold fingerprints exactly as one-shot
    // candidacy does) and an arriving batch (= 0, ALL rows output);
    // the standing band index is capped at build time, candidates are
    // batch×standing only — the f7 split applied to f8's fingerprints.
    "f8b_audio_neardup_incr" ->
      s"""WITH $audioFpSql,
         st AS (SELECT doc_id, afp FROM sg
           WHERE n_windows >= 33
             AND doc_id % ${operators.MultimodalOps.NearDupBatchMod} <> 0),
         nb AS (SELECT doc_id, afp, n_windows FROM sg
           WHERE doc_id % ${operators.MultimodalOps.NearDupBatchMod} = 0),
         nbel AS (SELECT doc_id, afp FROM nb WHERE n_windows >= 33),
         stb AS (SELECT doc_id, afp, ${b6Sql("afp")} AS b6 FROM st),
         eb0 AS (SELECT doc_id, afp, band, $blockKeySql AS bkey
           FROM stb CROSS JOIN $combosSql),
         eb AS (SELECT * FROM (
             SELECT eb0.*, count(*) OVER (PARTITION BY band, bkey) AS cnt
             FROM eb0)
           WHERE cnt <= 64),
         nbb AS (SELECT doc_id, afp, ${b6Sql("afp")} AS b6 FROM nbel),
         qb AS (SELECT doc_id, afp, band, $blockKeySql AS bkey
           FROM nbb CROSS JOIN $combosSql),
         cand AS (SELECT DISTINCT q.doc_id AS b_id, e.doc_id AS s_id
           FROM qb q JOIN eb e ON q.band = e.band AND q.bkey = e.bkey),
         nd AS (SELECT b_id, s_id FROM cand
             JOIN sg sa ON sa.doc_id = b_id
             JOIN sg sb ON sb.doc_id = s_id
           WHERE bit_count(xor(sa.afp, sb.afp)) <= 3),
         prt AS (SELECT b_id AS doc_id, min(s_id) AS dup_of
           FROM nd GROUP BY 1)
         SELECT nb.doc_id, nb.afp, nb.n_windows, prt.dup_of,
                prt.dup_of IS NOT NULL AS is_neardup
         FROM nb LEFT JOIN prt USING (doc_id) ORDER BY doc_id""",
    "f5_resize_images" ->
      s"""WITH $mediaMetaSql,
         im AS (SELECT doc_id, width, height,
             least(1.0, least(256.0 / width, 256.0 / height)) AS sc
           FROM meta WHERE media_type = 'image'),
         rz AS (SELECT doc_id, width, height,
             greatest(1, floor(width * sc))::INT AS out_w,
             greatest(1, floor(height * sc))::INT AS out_h, sc FROM im)
         SELECT doc_id, width, height, out_w, out_h,
                round(sc, 6) AS scale,
                (out_w::BIGINT * out_h * 3) AS est_bytes
         FROM rz ORDER BY doc_id""",
    // f6: the stub arm is the whole story on the synthetic corpus
    // (c3's simhash replay restricted to the image modality slice),
    // then the generated C(6,3) block-combination banding, 64-cap,
    // hamming ≤ 3 verify, and the bidirectional min-partner verdict.
    // Image selection replays mediaTable's pmod(md5hash64(source), 3)
    // = 0 exactly as mediaMetaSql does.
    "f6_image_neardup" ->
      s"""WITH md0 AS (SELECT doc_id, text, md5(source) AS msrc
             FROM documents WHERE text IS NOT NULL),
         hx AS (SELECT doc_id, text,
             list_reduce(list_transform(generate_series(1, 16),
               i -> (strpos('0123456789abcdef', substr(msrc, i::INT, 1)) - 1)::HUGEINT),
               (a, x) -> a * 16 + x) AS usrc
           FROM md0),
         img AS (SELECT doc_id, text FROM hx
           WHERE ((CASE WHEN usrc >= 9223372036854775808::HUGEINT
                        THEN (usrc - 18446744073709551616::HUGEINT)::BIGINT
                        ELSE usrc::BIGINT END % 3) + 3) % 3 = 0),
         t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM img),
         h AS (SELECT doc_id, md5(tok) AS m FROM t),
         bv AS (SELECT doc_id, b,
             CASE WHEN ((strpos('0123456789abcdef',
                                substr(m, ((63 - b) // 4 + 1)::INT, 1)) - 1)
                        >> (b % 4)::INT) & 1 = 1 THEN 1 ELSE -1 END AS v
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)),
         s AS (SELECT doc_id, b, sum(v) AS sv FROM bv GROUP BY 1, 2),
         sg AS (SELECT doc_id,
             bit_or(CASE WHEN sv > 0 THEN
               CASE WHEN b = 63 THEN (-9223372036854775808)::BIGINT
                    ELSE 1::BIGINT << b::INT END
               ELSE 0 END) AS phash
           FROM s GROUP BY 1),
         blk AS (SELECT doc_id, phash, ${b6Sql("phash")} AS b6 FROM sg),
         e AS (SELECT doc_id, phash, band, $blockKeySql AS bkey
           FROM blk CROSS JOIN $combosSql),
         cap AS (SELECT * FROM (
             SELECT e.*, count(*) OVER (PARTITION BY band, bkey) AS n FROM e)
           WHERE n <= 64),
         p AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
           FROM cap x JOIN cap y ON x.band = y.band AND x.bkey = y.bkey
             AND x.doc_id < y.doc_id),
         nd AS (SELECT a_id, b_id FROM p
             JOIN sg sa ON sa.doc_id = a_id
             JOIN sg sb ON sb.doc_id = b_id
           WHERE bit_count(xor(sa.phash, sb.phash)) <= 3),
         prt AS (SELECT doc_id, min(partner) AS dup_of FROM
             (SELECT a_id AS doc_id, b_id AS partner FROM nd
              UNION ALL SELECT b_id, a_id FROM nd) GROUP BY 1)
         SELECT sg.doc_id, sg.phash, prt.dup_of,
                prt.dup_of IS NOT NULL AS is_neardup
         FROM sg LEFT JOIN prt USING (doc_id) ORDER BY doc_id""",
    // f7: f6's hash/band/verify replay with the corpus split into a
    // standing catalog (doc_id % mod <> 0) and an arriving batch
    // (= 0); the standing band index is bucket-capped at build time,
    // candidates are batch×standing only, and each batch image gets
    // its min standing partner. Mod interpolated from
    // MultimodalOps.NearDupBatchMod (source cycles with doc_id % 20,
    // so mod 7 samples every source — documented at the constant).
    "f7_image_neardup_incr" ->
      s"""WITH md0 AS (SELECT doc_id, text, md5(source) AS msrc
             FROM documents WHERE text IS NOT NULL),
         hx AS (SELECT doc_id, text,
             list_reduce(list_transform(generate_series(1, 16),
               i -> (strpos('0123456789abcdef', substr(msrc, i::INT, 1)) - 1)::HUGEINT),
               (a, x) -> a * 16 + x) AS usrc
           FROM md0),
         img AS (SELECT doc_id, text FROM hx
           WHERE ((CASE WHEN usrc >= 9223372036854775808::HUGEINT
                        THEN (usrc - 18446744073709551616::HUGEINT)::BIGINT
                        ELSE usrc::BIGINT END % 3) + 3) % 3 = 0),
         t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM img),
         h AS (SELECT doc_id, md5(tok) AS m FROM t),
         bv AS (SELECT doc_id, b,
             CASE WHEN ((strpos('0123456789abcdef',
                                substr(m, ((63 - b) // 4 + 1)::INT, 1)) - 1)
                        >> (b % 4)::INT) & 1 = 1 THEN 1 ELSE -1 END AS v
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)),
         s AS (SELECT doc_id, b, sum(v) AS sv FROM bv GROUP BY 1, 2),
         sg AS (SELECT doc_id,
             bit_or(CASE WHEN sv > 0 THEN
               CASE WHEN b = 63 THEN (-9223372036854775808)::BIGINT
                    ELSE 1::BIGINT << b::INT END
               ELSE 0 END) AS phash
           FROM s GROUP BY 1),
         st AS (SELECT * FROM sg
           WHERE doc_id % ${operators.MultimodalOps.NearDupBatchMod} <> 0),
         nb AS (SELECT * FROM sg
           WHERE doc_id % ${operators.MultimodalOps.NearDupBatchMod} = 0),
         stb AS (SELECT doc_id, phash, ${b6Sql("phash")} AS b6 FROM st),
         eb0 AS (SELECT doc_id, phash, band, $blockKeySql AS bkey
           FROM stb CROSS JOIN $combosSql),
         eb AS (SELECT * FROM (
             SELECT eb0.*, count(*) OVER (PARTITION BY band, bkey) AS n FROM eb0)
           WHERE n <= 64),
         nbb AS (SELECT doc_id, phash, ${b6Sql("phash")} AS b6 FROM nb),
         qb AS (SELECT doc_id, phash, band, $blockKeySql AS bkey
           FROM nbb CROSS JOIN $combosSql),
         cand AS (SELECT DISTINCT q.doc_id AS b_id, e.doc_id AS s_id
           FROM qb q JOIN eb e ON q.band = e.band AND q.bkey = e.bkey),
         nd AS (SELECT b_id, s_id FROM cand
             JOIN sg sa ON sa.doc_id = b_id
             JOIN sg sb ON sb.doc_id = s_id
           WHERE bit_count(xor(sa.phash, sb.phash)) <= 3),
         prt AS (SELECT b_id AS doc_id, min(s_id) AS dup_of
           FROM nd GROUP BY 1)
         SELECT nb.doc_id, nb.phash, prt.dup_of,
                prt.dup_of IS NOT NULL AS is_neardup
         FROM nb LEFT JOIN prt USING (doc_id) ORDER BY doc_id""",
    // p4: md5(doc_id) is the deterministic pseudo-random order in both
    // engines; rank-based selection meets each lang quota exactly.
    "p4_stratified_sample" ->
      """WITH r AS (SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
             ORDER BY md5(doc_id::VARCHAR), doc_id) AS sample_rank
           FROM documents)
         SELECT doc_id, lang, sample_rank FROM r
         WHERE sample_rank <= 50 ORDER BY lang, sample_rank""",
    "a11_props_stats" ->
      """SELECT event_type,
         CAST(floor(CAST(props->>'k' AS BIGINT) / 10) AS BIGINT) * 10 AS k_decile,
         count(*) AS n_events,
         round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
         round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY event_type, k_decile""",
    // a12: DuckDB's native ASOF LEFT JOIN is the oracle for the
    // union+window as-of re-expression (greatest view_ms <= purchase_ms
    // per purchase row; right side pre-deduped per (user, ms) so the
    // match is deterministic in both engines).
    "a12_asof_attribution" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS purchase_ms
                    FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, epoch_ms(ts) AS view_ms,
                      arg_max(value, event_id) AS view_value
               FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.purchase_ms, v.view_ms, v.view_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.view_ms <= p.purchase_ms
         ORDER BY p.event_id""",
    // a14 streams the same result a12 computes in batch — the
    // flatMapGroupsWithState as-of fold verifies against the identical
    // ASOF JOIN oracle.
    "a14_stream_asof" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS purchase_ms
                    FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, epoch_ms(ts) AS view_ms,
                      arg_max(value, event_id) AS view_value
               FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.purchase_ms, v.view_ms, v.view_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.view_ms <= p.purchase_ms
         ORDER BY p.event_id""",
    // a15: the watermark-buffered OOO-tolerant as-of — same result as
    // a12/a14 over ordered data, so the same ASOF oracle verifies it.
    // a16: per-(user, week) activity, per-user first week as a min
    // over that same aggregate, join back, count — DuckDB floor
    // division on BIGINT ms mirrors Spark's floor(ms / week).
    "a16_retention_cohorts" ->
      """WITH uw AS (SELECT user_id,
             epoch_ms(ts) // 604800000 AS wk,
             count(*) AS n_events
           FROM events GROUP BY 1, 2),
         c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
         SELECT cohort_wk * 604800000 AS cohort_week_ms,
           CAST(uw.wk - c.cohort_wk AS INT) AS week_offset,
           count(DISTINCT uw.user_id) AS n_active_users,
           CAST(sum(n_events) AS BIGINT) AS n_events
         FROM uw JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // a17: the PLAIN join — the Spark side salts it; salting must be
    // invisible in the answer, so the oracle deliberately doesn't.
    // Dim = latest tick per type (argmax on ms, event_id).
    "a17_salted_type_join" ->
      """WITH dim AS (SELECT event_type, value AS rate FROM (
             SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1)
         SELECT e.event_type, count(*) AS n,
           round(sum(e.value * d.rate), 2) AS weighted
         FROM events e JOIN dim d USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",
    // a18: trailing-24-OBSERVED-bucket z-score; the CASE guards make
    // null the common value where the engines' stddev/division edge
    // semantics differ (1-row window: Spark NaN vs DuckDB NULL;
    // sd = 0: both would divide to ±Infinity).
    "a18_hourly_anomaly" ->
      """WITH h AS (SELECT event_type,
             CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) * 3600000
               AS hour_ms,
             count(*) AS n_events
           FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, hour_ms, n_events,
             avg(n_events) OVER wt AS mu,
             CASE WHEN count(n_events) OVER wt >= 2
                  THEN stddev_samp(n_events) OVER wt END AS sd
           FROM h
           WINDOW wt AS (PARTITION BY event_type ORDER BY hour_ms
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
         z AS (SELECT *, CASE WHEN sd > 0 THEN (n_events - mu) / sd END
                 AS zv FROM s)
         SELECT event_type, hour_ms, n_events,
                round(mu, 6) AS trail_mean, round(sd, 6) AS trail_std,
                round(zv, 6) AS zscore,
                (zv IS NOT NULL AND abs(zv) >= 3.0) AS is_anomaly
         FROM z ORDER BY event_type, hour_ms""",
    "a15_stream_asof_ooo" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS purchase_ms
                    FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, epoch_ms(ts) AS view_ms,
                      arg_max(value, event_id) AS view_value
               FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.purchase_ms, v.view_ms, v.view_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.view_ms <= p.purchase_ms
         ORDER BY p.event_id""",
    // a13: the stream-stream interval join's batch-SQL equivalent —
    // all time arithmetic on epoch-ms, matching the ms-derived
    // timestamps the streaming join compares.
    "a13_stream_join" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
         p.user_id, epoch_ms(p.ts) AS purchase_ms, epoch_ms(v.ts) AS view_ms
         FROM events p JOIN events v
           ON p.user_id = v.user_id
          AND p.event_type = 'purchase' AND v.event_type = 'view'
          AND epoch_ms(v.ts) <= epoch_ms(p.ts)
          AND epoch_ms(v.ts) >= epoch_ms(p.ts) - 1800000
         ORDER BY purchase_id, view_id""",
    "b1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "b2_top_sellers" ->
      """SELECT s_suppkey, s_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_sales
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_suppkey, s_name
         ORDER BY revenue DESC, s_suppkey LIMIT 10""",
    "b3_marketplace_listing" ->
      """SELECT o_orderkey, o_totalprice, c_name,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 20""",
    "b4_latest_order_per_customer" ->
      """SELECT c_custkey, c_name, o_orderkey AS last_orderkey,
         CAST(o_orderdate AS DATE) AS last_order_date,
         o_totalprice AS last_totalprice
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) o
         JOIN customer ON o_custkey = c_custkey
         WHERE rn = 1 ORDER BY c_custkey""",
    "b5_collection_stats" ->
      """SELECT p_brand, count(*) AS items,
         count(DISTINCT l_suppkey) AS owners,
         round(sum(l_extendedprice), 2) AS volume,
         round(min(l_extendedprice), 2) AS floor_price
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "b6_revenue_by_nation" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "b7_keyword_search" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice
         FROM part WHERE p_name LIKE '%gear%'
         ORDER BY p_partkey LIMIT 50""",
    "b8_price_histogram" ->
      """SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS bucket_volume
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "b9_union_history" ->
      """SELECT day, kind, count(*) AS n FROM (
           SELECT CAST(o_orderdate AS DATE) AS day, 'order' AS kind FROM orders
           UNION ALL
           SELECT CAST(l_shipdate AS DATE) AS day, 'ship' AS kind FROM lineitem
         ) GROUP BY day, kind ORDER BY day, kind""",
    "b10_earned_by_customer" ->
      """SELECT c_custkey, c_name,
         round(sum(o_totalprice), 2) AS earned, count(*) AS n_filled
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'F'
         GROUP BY c_custkey, c_name
         ORDER BY earned DESC, c_custkey LIMIT 20""",
    "b11_running_volume" ->
      """SELECT day, round(vol, 2) AS day_volume,
         round(sum(vol) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_volume
         FROM (SELECT CAST(o_orderdate AS DATE) AS day,
               sum(o_totalprice) AS vol FROM orders GROUP BY 1)
         ORDER BY day""",
    "b12_first_sale" ->
      """SELECT l_partkey,
         min(CAST(l_shipdate AS DATE)) AS first_ship_day,
         count(*) AS n_sales,
         (count(*) = 1) AS single_sale
         FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""",
    "b13_attribute_facets" ->
      """SELECT p_brand, p_type, count(*) AS n,
         round(avg(p_retailprice), 4) AS avg_price
         FROM part GROUP BY p_brand, p_type ORDER BY p_brand, p_type""",
    "b14_priority_share" ->
      """SELECT o_orderpriority, round(vol, 2) AS volume, n,
         round(vol / sum(vol) OVER (), 6) AS share
         FROM (SELECT o_orderpriority, sum(o_totalprice) AS vol,
               count(*) AS n FROM orders GROUP BY 1)
         ORDER BY o_orderpriority""",
    "b15_recent_listings" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         o_totalprice, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY order_date DESC, o_orderkey DESC LIMIT 30""",
    "b16_token_history" ->
      """SELECT l_orderkey AS orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS ship_day,
         l_extendedprice AS price, l_quantity AS qty,
         o_custkey AS buyer, o_orderstatus AS status
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_partkey = 42
         ORDER BY ship_day DESC, orderkey DESC, l_linenumber""",
    "b17_user_transactions" ->
      """SELECT orderkey, day, kind, amount FROM (
           SELECT o_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS day,
                  'order' AS kind, o_totalprice AS amount
           FROM orders WHERE o_custkey = 7
           UNION ALL
           SELECT l_orderkey, CAST(l_shipdate AS DATE), 'ship', l_extendedprice
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_custkey = 7
         ) ORDER BY day DESC, kind, orderkey DESC, amount DESC LIMIT 25""",
    "b18_price_history_token" ->
      """SELECT CAST(l_shipdate AS DATE) AS day,
         round(min(l_extendedprice), 2) AS low,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(max(l_extendedprice), 2) AS high,
         count(*) AS n_sales
         FROM lineitem WHERE l_partkey = 42 GROUP BY 1 ORDER BY day""",
    "b19_customer_profile" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending,
         round(sum(o_totalprice), 2) AS lifetime_value,
         min(CAST(o_orderdate AS DATE)) AS first_order_day,
         max(CAST(o_orderdate AS DATE)) AS last_order_day
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "b21_latest_bids" ->
      """SELECT l_orderkey AS orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS day, l_partkey,
         l_extendedprice AS bid
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'O'
         ORDER BY day DESC, orderkey DESC, l_linenumber LIMIT 20""",
    "b22_collection_directory" ->
      """SELECT p_brand, count(DISTINCT p_partkey) AS n_items,
         round(sum(l_extendedprice), 2) AS volume,
         round(min(l_extendedprice), 2) AS floor_price
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY volume DESC, p_brand LIMIT 10""",
    // b56: each check row = two independently-derived counts that must
    // agree on a consistent store (the data-check cron's DB-vs-chain
    // reconciliation shape re-expressed over the tables themselves)
    "b56_consistency_audit" ->
      """WITH checks AS (
         SELECT 'lineitem_order_refs' AS check_name,
           (SELECT count(DISTINCT l_orderkey) FROM lineitem)::BIGINT AS lhs_n,
           (SELECT count(DISTINCT l_orderkey) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders))::BIGINT AS rhs_n
         UNION ALL
         SELECT 'orders_customer_refs',
           (SELECT count(DISTINCT o_custkey) FROM orders)::BIGINT,
           (SELECT count(DISTINCT o_custkey) FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer))::BIGINT
         UNION ALL
         SELECT 'lineitem_part_refs',
           (SELECT count(DISTINCT l_partkey) FROM lineitem)::BIGINT,
           (SELECT count(DISTINCT l_partkey) FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part))::BIGINT
         UNION ALL
         SELECT 'lineitem_supplier_refs',
           (SELECT count(DISTINCT l_suppkey) FROM lineitem)::BIGINT,
           (SELECT count(DISTINCT l_suppkey) FROM lineitem
            WHERE l_suppkey IN (SELECT s_suppkey FROM supplier))::BIGINT)
         SELECT check_name, lhs_n, rhs_n, lhs_n = rhs_n AS consistent
         FROM checks ORDER BY check_name""",
    "b23_platform_counts" ->
      """SELECT (SELECT count(*) FROM orders) AS n_orders,
         (SELECT count(*) FROM lineitem) AS n_lineitems,
         (SELECT count(*) FROM customer) AS n_customers,
         (SELECT count(*) FROM part) AS n_parts,
         (SELECT count(*) FROM supplier) AS n_suppliers,
         (SELECT round(sum(o_totalprice), 2) FROM orders) AS total_volume""",
    "b25_global_search" ->
      """SELECT src, id, name FROM (
           SELECT 'part' AS src, p_partkey AS id, p_name AS name
           FROM part WHERE p_name LIKE '%42%'
           UNION ALL
           SELECT 'customer', c_custkey, c_name
           FROM customer WHERE c_name LIKE '%42%'
           UNION ALL
           SELECT 'supplier', s_suppkey, s_name
           FROM supplier WHERE s_name LIKE '%42%'
         ) ORDER BY src, id LIMIT 100""",
    "b26_token_detail" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice,
         n_sales, total_qty, revenue, first_sale_day, last_sale_day, top_price
         FROM part JOIN (
           SELECT l_partkey, count(*) AS n_sales,
                  round(sum(l_quantity), 2) AS total_qty,
                  round(sum(l_extendedprice), 2) AS revenue,
                  min(CAST(l_shipdate AS DATE)) AS first_sale_day,
                  max(CAST(l_shipdate AS DATE)) AS last_sale_day,
                  round(max(l_extendedprice), 2) AS top_price
           FROM lineitem WHERE l_partkey = 42 GROUP BY 1
         ) ON p_partkey = l_partkey
         WHERE p_partkey = 42""",
    "b27_collection_browse" ->
      """SELECT p_partkey, p_name, p_retailprice, n_sales, revenue
         FROM (
           SELECT p_partkey, p_name, p_retailprice,
                  count(*) AS n_sales,
                  round(sum(l_extendedprice), 2) AS revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#1'
           GROUP BY 1, 2, 3
         ) ORDER BY revenue DESC, p_partkey LIMIT 5 OFFSET 5""",
    "b28_user_income_series" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS income
         FROM orders WHERE o_custkey = 7
         GROUP BY 1 ORDER BY month""",
    "b20_supplier_portfolio" ->
      """SELECT s_suppkey, s_name, n_parts, n_sales, revenue
         FROM supplier JOIN (
           SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
                  count(*) AS n_sales,
                  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
           FROM lineitem GROUP BY l_suppkey
           ORDER BY revenue DESC, l_suppkey LIMIT 25
         ) ON l_suppkey = s_suppkey
         ORDER BY revenue DESC, s_suppkey""",
    // per-wallet family: wallet = suppkey 1 (seller persona) / custkey 7
    // (buyer persona); every variant carries the reference's {total,
    // data} contract as a `total` column on each page row.
    "b29_wallet_listed" ->
      """SELECT l_orderkey AS orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS ship_day, l_extendedprice AS price,
         o_custkey AS buyer, p_partkey, p_name,
         (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_suppkey = 1 AND o_orderstatus = 'O') AS total
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         WHERE l_suppkey = 1 AND o_orderstatus = 'O'
         ORDER BY ship_day DESC, orderkey DESC, l_linenumber, p_partkey, price
         LIMIT 10""",
    "b30_wallet_bids" ->
      """SELECT l_orderkey AS orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS bid_day, l_extendedprice AS bid,
         p_partkey, p_name,
         (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_custkey = 7 AND o_orderstatus = 'O') AS total
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         WHERE o_custkey = 7 AND o_orderstatus = 'O'
         ORDER BY bid DESC, orderkey DESC, l_linenumber, p_partkey LIMIT 10""",
    // b31: "minted by wallet" = parts whose lexicographically FIRST sale
    // line (ship ts, orderkey, linenumber) belongs to the wallet; the
    // latest-order lookup is arg_max over the same ordinal.
    // ordinal = (ship ts, orderkey, linenumber, suppkey, price) via
    // per-part row_number windows — the printf key can't carry the
    // double price, and the base triple can tie in this data.
    "b31_wallet_minted" ->
      """WITH r AS (
           SELECT *,
             row_number() OVER (PARTITION BY l_partkey
               ORDER BY epoch_ms(l_shipdate), l_orderkey, l_linenumber,
                        l_suppkey, l_extendedprice) AS rn_first,
             row_number() OVER (PARTITION BY l_partkey
               ORDER BY epoch_ms(l_shipdate) DESC, l_orderkey DESC,
                        l_linenumber DESC, l_suppkey DESC,
                        l_extendedprice DESC) AS rn_last
           FROM lineitem),
         a AS (
           SELECT l_partkey,
             max(CASE WHEN rn_first = 1 THEN l_suppkey END) AS first_supp,
             min(CAST(l_shipdate AS DATE)) AS mint_day,
             count(*) AS n_sales,
             round(max(CASE WHEN rn_last = 1 THEN l_extendedprice END), 2) AS last_price,
             max(CAST(l_shipdate AS DATE)) AS last_sale_day
           FROM r GROUP BY l_partkey)
         SELECT p_partkey, p_name, p_brand, mint_day, n_sales,
                last_price, last_sale_day
         FROM a JOIN part ON l_partkey = p_partkey
         WHERE first_supp = 1 ORDER BY p_partkey""",
    "b32_wallet_sold" ->
      """SELECT l_orderkey AS orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS ship_day, l_extendedprice AS price,
         o_custkey AS buyer, p_partkey, p_name,
         (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_suppkey = 1 AND o_orderstatus = 'F') AS total
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         WHERE l_suppkey = 1 AND o_orderstatus = 'F'
         ORDER BY ship_day DESC, orderkey DESC, l_linenumber, p_partkey, price
         LIMIT 10""",
    "b33_wallet_collections" ->
      """WITH b AS (
           SELECT p_brand, count(DISTINCT p_partkey) AS n_items,
                  count(*) AS n_sales,
                  round(sum(l_extendedprice), 2) AS volume
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_suppkey = 1 GROUP BY p_brand)
         SELECT p_brand, n_items, n_sales, volume,
                (SELECT count(*) FROM b) AS total
         FROM b ORDER BY volume DESC, p_brand LIMIT 10""",
    "b34_marketplace_page" ->
      """SELECT o_orderkey, o_totalprice, c_name,
         CAST(o_orderdate AS DATE) AS order_date,
         (SELECT count(*) FROM orders WHERE o_orderstatus = 'O') AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 20""",
    "b35_keyset_page" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         o_totalprice
         FROM orders
         WHERE o_orderstatus = 'O'
           AND o_orderdate >= TIMESTAMP '1997-07-01'
           AND (o_orderdate > TIMESTAMP '1997-07-01' OR o_orderkey > 0)
         ORDER BY order_date, o_orderkey LIMIT 20""",
    // b36: the parameterized-sort page at mode 4 (price ascending —
    // b3 already exercises the descending form).
    "b36_marketplace_sorted" ->
      """SELECT o_orderkey, o_totalprice, c_name,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY o_totalprice ASC, o_orderkey LIMIT 20""",
    // b38: point lookup — one order + customer (left, the unwind's
    // null-preserving form) + line rollup.
    "b38_order_detail" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         o_orderstatus, o_totalprice, c_name, n_lines, total_qty, lines_value
         FROM orders
         LEFT JOIN customer ON o_custkey = c_custkey
         LEFT JOIN (SELECT l_orderkey, count(*) AS n_lines,
                      round(sum(l_quantity), 2) AS total_qty,
                      round(sum(l_extendedprice), 2) AS lines_value
                    FROM lineitem WHERE l_orderkey = 42 GROUP BY 1)
           ON o_orderkey = l_orderkey
         WHERE o_orderkey = 42""",
    // b39: owner = buyer of the part's LAST sale line (b31's five-part
    // ordinal, rn_last=1), burn custkey excluded, createTime sort =
    // mint day desc, {total, data}.
    "b39_nft_directory" ->
      """WITH r AS (SELECT l_partkey, l_orderkey, l_shipdate,
             row_number() OVER (PARTITION BY l_partkey
               ORDER BY epoch_ms(l_shipdate) DESC, l_orderkey DESC,
                        l_linenumber DESC, l_suppkey DESC,
                        l_extendedprice DESC) AS rn
           FROM lineitem),
         a AS (SELECT l_partkey,
                 min(CAST(l_shipdate AS DATE)) AS mint_day,
                 count(*) AS n_sales,
                 max(CASE WHEN rn = 1 THEN l_orderkey END) AS last_orderkey
               FROM r GROUP BY 1),
         own AS (SELECT a.*, o_custkey AS owner
                 FROM a JOIN orders ON last_orderkey = o_orderkey
                 WHERE o_custkey <> 7)
         SELECT p_partkey, p_name, owner, mint_day, n_sales,
           (SELECT count(*) FROM own) AS total
         FROM own JOIN part ON l_partkey = p_partkey
         ORDER BY mint_day DESC, p_partkey DESC LIMIT 10""",
    // b40: one collection's info card (getCollectionInfo point lookup).
    "b40_collection_detail" ->
      """SELECT 'Brand#1' AS p_brand,
         count(DISTINCT p_partkey) AS n_items,
         count(DISTINCT l_suppkey) AS owners,
         count(*) AS n_sales,
         round(sum(l_extendedprice), 2) AS volume,
         round(min(l_extendedprice), 2) AS floor_price,
         min(CAST(l_shipdate AS DATE)) AS first_day,
         max(CAST(l_shipdate AS DATE)) AS last_day
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand = 'Brand#1'""",
    // c7: the CDC twin — identical rolling window hash (e5's token
    // value fn, window 4 unrolled), identical cut-set construction
    // (list_sort(list_distinct) ≡ Spark's already-ascending
    // array_distinct), md5 chunk fingerprints, df-capped
    // inverted-index join. list_slice is INCLUSIVE [begin, end] —
    // equals Spark's slice(start = cuts[j]+1, length = cuts[j+1]-cuts[j]).
    "c7_cdc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents
           WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 1),
         v AS (SELECT doc_id, toks,
             list_transform(toks, s -> (ascii(s) * 256 + length(s))::BIGINT)
               AS vals
           FROM t),
         b AS (SELECT doc_id, toks,
             list_sort(list_distinct(list_concat(list_concat(
               [0::BIGINT],
               list_filter(generate_series(4::BIGINT, len(vals)::BIGINT),
                 i -> ((((((vals[i-3] * 1000003 + vals[i-2]) % 2147483647)
                          * 1000003 + vals[i-1]) % 2147483647)
                          * 1000003 + vals[i]) % 2147483647) % 8 = 0)),
               [len(vals)::BIGINT]))) AS cuts
           FROM v),
         c AS (SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(cuts) - 1),
               j -> md5(array_to_string(
                      list_slice(toks, (cuts[j] + 1)::INT, cuts[j+1]::INT),
                      ' ')))) AS cfp
           FROM b),
         cap AS (SELECT doc_id, cfp FROM (
             SELECT doc_id, cfp, count(*) OVER (PARTITION BY cfp) AS df
             FROM c) WHERE df <= 100),
         sz AS (SELECT doc_id, count(*) AS n FROM cap GROUP BY 1),
         pr AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id,
                  count(*) AS shared_chunks
                FROM cap x JOIN cap y
                  ON x.cfp = y.cfp AND x.doc_id < y.doc_id
                GROUP BY 1, 2)
         SELECT a_id, b_id, shared_chunks,
                sa.n AS a_chunks, sb.n AS b_chunks,
                round(shared_chunks::DOUBLE / least(sa.n, sb.n), 6) AS overlap
         FROM pr
         JOIN sz sa ON pr.a_id = sa.doc_id
         JOIN sz sb ON pr.b_id = sb.doc_id
         ORDER BY overlap DESC, a_id, b_id LIMIT 50""",
    // c8: DuckDB groups windows on substr(md5(gram), 1, 16) — the same
    // equivalence classes as Spark's Md5Hash64 long (a bijection of the
    // first 8 digest bytes), so the duplicated-window set matches
    // without any hex parse; lag() is NULL on each doc's first
    // duplicated window, and NULL > k falls to ELSE 0 in both engines.
    "c8_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
         g AS (SELECT doc_id, len(toks) AS n_tokens,
             CASE WHEN len(toks) >= 8
               THEN list_transform(generate_series(1, len(toks) - 7),
                      i -> array_to_string(list_slice(toks, i, i + 7), ' '))
               ELSE [] END AS gs
           FROM t),
         px AS (SELECT doc_id, gs,
             unnest(generate_series(1, len(gs))) AS pos
           FROM g),
         w AS (SELECT doc_id, pos, substr(md5(gs[pos::INT]), 1, 16) AS h
           FROM px),
         dup AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
         dp AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)),
         m AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER
                    (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS ni
           FROM dp),
         isl AS (SELECT doc_id, pos,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
           FROM m),
         sp AS (SELECT doc_id, island,
             (max(pos) - min(pos) + 8)::BIGINT AS span_tokens
           FROM isl GROUP BY 1, 2),
         pd AS (SELECT doc_id, count(*)::BIGINT AS n_spans,
             sum(span_tokens)::BIGINT AS dup_tokens
           FROM sp GROUP BY 1)
         SELECT g.doc_id,
                coalesce(n_spans, 0)::BIGINT AS n_spans,
                coalesce(dup_tokens, 0)::BIGINT AS dup_tokens,
                round(coalesce(dup_tokens, 0)::DOUBLE / n_tokens, 6)
                  AS dup_token_frac
         FROM g LEFT JOIN pd USING (doc_id) ORDER BY g.doc_id""",
    // c10: c8's window/hash CTEs, then rank occurrences per hash class
    // ((doc_id, pos) order — the corpus-wide first survives), explode
    // cut windows to covered token positions, anti-join the token
    // stream, rebuild text in position order. Same
    // substr(md5(gram),1,16) ≡ Md5Hash64 class equivalence as c8.
    "c10_dedup_cut" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
         g AS (SELECT doc_id, len(toks) AS n_tokens, toks,
             CASE WHEN len(toks) >= 8
               THEN list_transform(generate_series(1, len(toks) - 7),
                      i -> array_to_string(list_slice(toks, i, i + 7), ' '))
               ELSE [] END AS gs
           FROM t),
         px AS (SELECT doc_id, gs,
             unnest(generate_series(1, len(gs))) AS pos
           FROM g),
         w AS (SELECT doc_id, pos, substr(md5(gs[pos::INT]), 1, 16) AS h
           FROM px),
         o AS (SELECT doc_id, pos,
             count(*) OVER (PARTITION BY h) AS cnt,
             row_number() OVER (PARTITION BY h
               ORDER BY doc_id, pos) AS r
           FROM w),
         cut AS (SELECT DISTINCT doc_id, tpos FROM
              (SELECT doc_id,
                 unnest(generate_series(pos, pos + 7)) AS tpos
               FROM o WHERE cnt > 1 AND r > 1)),
         tp AS (SELECT doc_id, unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS tpos
           FROM t),
         kept AS (SELECT tp.doc_id, tp.tok, tp.tpos
           FROM tp LEFT JOIN cut
             ON tp.doc_id = cut.doc_id AND tp.tpos = cut.tpos
           WHERE cut.doc_id IS NULL),
         rb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
             array_to_string(list(tok ORDER BY tpos), ' ') AS clean_text
           FROM kept GROUP BY 1)
         SELECT g.doc_id, g.n_tokens::BIGINT AS n_tokens,
                (g.n_tokens - coalesce(rb.n_kept, 0))::BIGINT AS n_removed,
                coalesce(rb.clean_text, '') AS clean_text
         FROM g LEFT JOIN rb USING (doc_id) ORDER BY g.doc_id""",
    // c9: the d5 oracle's md5-sampled centroids + single-nearest
    // routing, then the SemDeDup keep rule as plain relational
    // algebra: rank members (cent_cos ASC, vec_id), remove any member
    // an earlier-ranked one matches at cos >= tau. Same bit-exact
    // sequential double folds as the d-family oracles, so the raw
    // threshold compare agrees between engines. nlist/tau/clusterCap
    // are interpolated from DedupOps' registered-default constants —
    // changing a Scala default moves this replay with it (the c2/c5
    // no-drift pattern).
    "c9_semdedup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                    FROM embeddings),
         nr AS (SELECT vec_id,
             sqrt(list_reduce(list_transform(emb, v -> v * v),
                              (a, x) -> a + x)) AS nrm FROM e),
         ct AS (SELECT e.vec_id AS cent_id, emb AS ce, nrm AS cnrm
                FROM e JOIN nr ON e.vec_id = nr.vec_id
                ORDER BY md5(e.vec_id::VARCHAR), e.vec_id LIMIT ${DedupOps.SemNlist}),
         sc AS (SELECT e.vec_id, ct.cent_id,
             list_reduce(list_transform(list_zip(e.emb, ct.ce),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nr.nrm * ct.cnrm) AS csim
           FROM e JOIN nr ON e.vec_id = nr.vec_id CROSS JOIN ct),
         asg AS (SELECT vec_id, cent_id, csim AS cent_cos FROM sc
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cent_id) = 1),
         rk AS (SELECT vec_id, cent_id, cent_cos,
             row_number() OVER (PARTITION BY cent_id
               ORDER BY cent_cos ASC, vec_id) AS krnk
           FROM asg),
         wi AS (SELECT rk.vec_id, rk.cent_id, rk.krnk, e.emb, nr.nrm
                FROM rk JOIN e ON rk.vec_id = e.vec_id
                        JOIN nr ON rk.vec_id = nr.vec_id
                WHERE rk.krnk <= ${DedupOps.SemClusterCap}),
         rm AS (SELECT DISTINCT py.vec_id
                FROM wi px JOIN wi py ON px.cent_id = py.cent_id
                  AND px.krnk < py.krnk
                WHERE list_reduce(list_transform(list_zip(px.emb, py.emb),
                        z -> z[1] * z[2]), (a, x) -> a + x)
                      / (px.nrm * py.nrm) >= ${DedupOps.SemTau})
         SELECT rk.vec_id, rk.cent_id, round(rk.cent_cos, 6) AS cent_cos,
                rm.vec_id IS NULL AS kept
         FROM rk LEFT JOIN rm ON rk.vec_id = rm.vec_id
         ORDER BY rk.vec_id""",
    // c11: c9's replay with the HIERARCHICAL routing in front — coarse
    // level = the md5-rank prefix of the SAME centroid sample, each
    // fine centroid homed to its max-cosine coarse cell, each vector
    // probing its top-`SemCoarseProbes` coarse cells and taking the
    // fine argmax among the homed candidates. All float folds are the
    // identical sequential double reductions as c9's, so the per-level
    // row_number ranks agree bit-exactly; the keep/remove tail is
    // byte-identical to c9's CTEs.
    "c11_semdedup_hier" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                    FROM embeddings),
         nr AS (SELECT vec_id,
             sqrt(list_reduce(list_transform(emb, v -> v * v),
                              (a, x) -> a + x)) AS nrm FROM e),
         ct AS (SELECT e.vec_id AS cent_id, emb AS ce, nrm AS cnrm
                FROM e JOIN nr ON e.vec_id = nr.vec_id
                ORDER BY md5(e.vec_id::VARCHAR), e.vec_id LIMIT ${DedupOps.SemNlist}),
         co AS (SELECT cent_id AS co_id, ce AS coe, cnrm AS conrm FROM ct
                ORDER BY md5(cent_id::VARCHAR), cent_id LIMIT ${DedupOps.SemNCoarse}),
         fs AS (SELECT ct.cent_id, ct.ce, ct.cnrm, co.co_id,
             list_reduce(list_transform(list_zip(ct.ce, co.coe),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (ct.cnrm * co.conrm) AS fsim
           FROM ct CROSS JOIN co),
         fh AS (SELECT co_id, cent_id, ce, cnrm FROM fs
                QUALIFY row_number() OVER (PARTITION BY cent_id
                  ORDER BY fsim DESC, co_id) = 1),
         ps AS (SELECT e.vec_id, co.co_id,
             list_reduce(list_transform(list_zip(e.emb, co.coe),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nr.nrm * co.conrm) AS cosim
           FROM e JOIN nr ON e.vec_id = nr.vec_id CROSS JOIN co),
         pr AS (SELECT vec_id, co_id FROM ps
                QUALIFY row_number() OVER (PARTITION BY vec_id
                  ORDER BY cosim DESC, co_id) <= ${DedupOps.SemCoarseProbes}),
         sc AS (SELECT e.vec_id, fh.cent_id,
             list_reduce(list_transform(list_zip(e.emb, fh.ce),
                                        z -> z[1] * z[2]), (a, x) -> a + x)
               / (nr.nrm * fh.cnrm) AS csim
           FROM pr JOIN fh USING (co_id)
                   JOIN e ON pr.vec_id = e.vec_id
                   JOIN nr ON pr.vec_id = nr.vec_id),
         asg AS (SELECT vec_id, cent_id, csim AS cent_cos FROM sc
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cent_id) = 1),
         rk AS (SELECT vec_id, cent_id, cent_cos,
             row_number() OVER (PARTITION BY cent_id
               ORDER BY cent_cos ASC, vec_id) AS krnk
           FROM asg),
         wi AS (SELECT rk.vec_id, rk.cent_id, rk.krnk, e.emb, nr.nrm
                FROM rk JOIN e ON rk.vec_id = e.vec_id
                        JOIN nr ON rk.vec_id = nr.vec_id
                WHERE rk.krnk <= ${DedupOps.SemClusterCap}),
         rm AS (SELECT DISTINCT py.vec_id
                FROM wi px JOIN wi py ON px.cent_id = py.cent_id
                  AND px.krnk < py.krnk
                WHERE list_reduce(list_transform(list_zip(px.emb, py.emb),
                        z -> z[1] * z[2]), (a, x) -> a + x)
                      / (px.nrm * py.nrm) >= ${DedupOps.SemTau})
         SELECT rk.vec_id, rk.cent_id, round(rk.cent_cos, 6) AS cent_cos,
                rm.vec_id IS NULL AS kept
         FROM rk LEFT JOIN rm ON rk.vec_id = rm.vec_id
         ORDER BY rk.vec_id""",
    // d8: same double-precision folds as the d1 oracle family;
    // floor(x + 0.5) quantization in both engines (round() disagrees
    // on HALF_UP vs HALF_EVEN at exact .5).
    "d8_embedding_quantize" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings
                    WHERE embedding IS NOT NULL),
         m AS (SELECT label, v,
                 list_max(list_transform(v, x -> abs(x))) AS abs_max
               FROM e),
         q AS (SELECT label, v, 127.0 / abs_max AS scale
               FROM m WHERE abs_max > 0),
         d AS (SELECT label,
                 list_transform(v, x -> floor(x * scale + 0.5) / scale) AS dv,
                 v
               FROM q),
         s AS (SELECT label,
                 list_max(list_transform(list_zip(dv, v),
                                         x -> abs(x[1] - x[2]))) AS max_err,
                 list_sum(list_transform(list_zip(dv, v), x -> x[1] * x[2]))
                   / (sqrt(list_sum(list_transform(dv, x -> x * x)))
                    * sqrt(list_sum(list_transform(v, x -> x * x)))) AS cosp
               FROM d)
         SELECT label, count(*) AS n_vecs,
                round(avg(cosp), 6) AS avg_cos_preserved,
                round(min(cosp), 6) AS min_cos_preserved,
                round(max(max_err), 6) AS max_abs_err
         FROM s GROUP BY label ORDER BY label""",
    // d9: same double folds in identical index order on both sides
    // (sequential list_sum ≡ the expression's left-to-right loop); the
    // distance is the SAME norm decomposition sn + cn - 2*dot with the
    // same parenthesization, so argmin ordering is bit-identical;
    // ties broken by centroid id in both; per-subspace decomposition
    // of the reconstruction cosine avoids any physical reassembly.
    // Codebook = the 256 vec_ids of smallest (md5(vec_id), vec_id)
    // rank — DuckDB's md5(VARCHAR) and Spark's md5(CAST AS STRING)
    // hash the same decimal text to the same lowercase hex.
    "d9_pq_quantize" ->
      """WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE embedding IS NOT NULL),
         s AS (SELECT label, vec_id,
             unnest(generate_series(0, 7)) AS sub_j,
             unnest(list_transform(generate_series(0, 7),
               j -> list_slice(v, (j*8 + 1)::INT, (j*8 + 8)::INT))) AS sub
           FROM e),
         sn AS (SELECT label, vec_id, sub_j, sub,
                  list_sum(list_transform(sub, x -> x * x)) AS sn
                FROM s),
         sel AS (SELECT vec_id FROM e
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
         c AS (SELECT sub_j, vec_id AS cent_id, sub AS ce,
                 list_sum(list_transform(sub, x -> x * x)) AS cn
               FROM s WHERE vec_id IN (SELECT vec_id FROM sel)),
         a AS (SELECT sn.label, sn.vec_id, sn.sub_j, c.cent_id,
             sn.sn + c.cn - 2 * list_sum(list_transform(
               list_zip(sn.sub, c.ce), x -> x[1] * x[2])) AS dist,
             list_sum(list_transform(list_zip(sn.sub, c.ce),
               x -> x[1] * x[2])) AS dotj,
             c.cn AS qn,
             sn.sn AS onr
           FROM sn JOIN c ON sn.sub_j = c.sub_j
           QUALIFY row_number() OVER (PARTITION BY sn.vec_id, sn.sub_j
                                      ORDER BY dist, c.cent_id) = 1),
         p AS (SELECT label, vec_id,
                 sum(dotj) / (sqrt(sum(qn)) * sqrt(sum(onr))) AS cos_pq,
                 sum(dist) AS sq
               FROM a GROUP BY 1, 2
               HAVING sum(qn) > 0 AND sum(onr) > 0)
         SELECT label, count(*)::BIGINT AS n_vecs,
                round(avg(cos_pq), 6) AS avg_cos_preserved,
                round(min(cos_pq), 6) AS min_cos_preserved,
                round(avg(sq), 6) AS avg_sq_err
         FROM p GROUP BY label ORDER BY label""",
    // b24: the oracle recomputes the EXACT aggregates and expects TRUE
    // for the in-bound booleans — Spark computes those booleans from
    // its sketch vs its own exact aggregate, so an out-of-tolerance
    // sketch fails the hash compare. Non-vacuous: the bound is the
    // sketch's contract, and the sketches are deterministic (seed-free).
    "b24_collection_stats_sketch" ->
      """SELECT p_brand, count(*) AS items,
         count(DISTINCT l_suppkey) AS owners,
         round(sum(l_extendedprice), 2) AS volume,
         round(min(l_extendedprice), 2) AS floor_price,
         TRUE AS owners_in_bound,
         TRUE AS median_in_bound
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    // b41: feeds-channel directory — keyword regex over both text
    // fields (same (?i) RE2∩Java pattern literal in both engines),
    // b39's last-sale-buyer owner mapping + burn exclusion, mint-day
    // (blockNumber) desc sort, {total, data}.
    "b41_feeds_channels" ->
      """WITH ch AS (SELECT p_partkey, p_name, p_type FROM part
           WHERE regexp_matches(p_name, '(?i)(gear|ivory)')
              OR regexp_matches(p_type, '(?i)(gear|ivory)')),
         r AS (SELECT l_partkey, l_orderkey, l_shipdate, l_linenumber,
             row_number() OVER (PARTITION BY l_partkey
               ORDER BY epoch_ms(l_shipdate) DESC, l_orderkey DESC,
                        l_linenumber DESC, l_suppkey DESC,
                        l_extendedprice DESC) AS rn
           FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM ch)),
         a AS (SELECT l_partkey,
                 max(CASE WHEN rn = 1 THEN l_orderkey END) AS last_orderkey,
                 min(CAST(l_shipdate AS DATE)) AS mint_day,
                 count(*) AS n_sales
               FROM r GROUP BY 1),
         own AS (SELECT a.*, o_custkey AS owner
                 FROM a JOIN orders ON last_orderkey = o_orderkey
                 WHERE o_custkey <> 7)
         SELECT p_partkey, p_name, p_type, owner, mint_day, n_sales,
           (SELECT count(*) FROM own) AS total
         FROM own JOIN ch ON l_partkey = p_partkey
         ORDER BY mint_day DESC, p_partkey DESC LIMIT 10""",
    // b42: per-pool reward totals — groupBy(pool).sum(amount); pool =
    // payload k mod 4 (k ∈ [0, 99] in this data, so plain % agrees
    // between engines), amount = event value.
    "b42_pool_rewards" ->
      """SELECT CAST(props->>'k' AS BIGINT) % 4 AS pool,
         round(sum(value), 2) AS total_amount,
         count(*) AS n_rewards
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY pool""",
    // b43: "today" = the latest day with a filled order; same
    // earnings match as b10 windowed to that one day.
    "b43_today_earned" ->
      """WITH f AS (SELECT o_custkey, o_totalprice,
                    CAST(o_orderdate AS DATE) AS day
             FROM orders WHERE o_orderstatus = 'F'),
         t AS (SELECT max(day) AS today FROM f)
         SELECT c_custkey, c_name, today,
                round(sum(o_totalprice), 2) AS earned_today,
                count(*) AS n_filled_today
         FROM f JOIN t ON day = today
         JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2, 3
         ORDER BY earned_today DESC, c_custkey""",
    // b44: b32's wallet-filled-lines shape without paging, plus the
    // fee/net projection of the reference's earnings list.
    "b44_earned_list" ->
      """SELECT l_orderkey AS orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS ship_day, l_extendedprice AS price,
         l_tax AS royalty_fee, l_discount AS platform_fee,
         round(l_extendedprice * (1.0 - l_discount), 2) AS net_earned,
         o_custkey AS buyer, p_partkey, p_name
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         WHERE l_suppkey = 1 AND o_orderstatus = 'F'
         ORDER BY ship_day DESC, orderkey DESC, l_linenumber, p_partkey,
                  price""",
    // b45: seller + V1 chain (priority arm) + open state, first 5 in
    // insertion order.
    "b45_v1_wallet_market" ->
      """SELECT l_orderkey AS orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS ship_day, l_extendedprice AS price,
         o_custkey AS buyer, o_orderpriority AS chain
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_suppkey = 1 AND o_orderstatus = 'O'
           AND o_orderpriority = '1-URGENT'
         ORDER BY orderkey, l_linenumber LIMIT 5""",
    // b37: the same page through the DEFAULT sort arm — the
    // reference's getSortOfToken default branch is listing-date
    // descending (mode 0), which any unknown mode also degrades to.
    "b37_marketplace_default" ->
      """SELECT o_orderkey, o_totalprice, c_name,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 20""",
    // b46: findOne({address}) — unique-key point lookup.
    "b46_did_lookup" ->
      """SELECT c_custkey AS did, c_name AS address, c_nationkey,
         c_mktsegment
         FROM customer WHERE c_name = 'Customer#000000042' LIMIT 1""",
    // b47: findOne sorted timestamp desc — latest rate tick.
    "b47_latest_rate" ->
      """SELECT epoch_ms(ts) AS ms, event_id, event_type AS rate_type,
         value AS rate
         FROM events ORDER BY ms DESC, event_id DESC LIMIT 1""",
    // b48: getTradingVolume's rate-conversion arithmetic replayed —
    // filled orders, derived quote token (every 7th order native →
    // fallback rate 1), amount-or-1 fallback, latest-tick-per-type
    // rates dim LEFT JOIN, rollup with grand-total row (NULL qt).
    "b48_trading_volume_rates" ->
      """WITH rates AS (SELECT event_type AS token, value AS rate FROM (
             SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1),
         f AS (SELECT
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE ['click','error','purchase','signup','view']
                       [(o_orderkey % 5 + 1)::INT] END AS quote_token,
             CASE WHEN o_orderkey % 4 = 0 THEN 1
                  ELSE o_orderkey % 4 END AS amount,
             o_totalprice
           FROM orders WHERE o_orderstatus = 'F'),
         j AS (SELECT coalesce(f.quote_token, '(native)') AS qt,
             f.amount * f.o_totalprice * coalesce(r.rate, 1.0)
               / 1000000.0 AS vol
           FROM f LEFT JOIN rates r ON f.quote_token = r.token)
         SELECT qt, count(*) AS n_orders, round(sum(vol), 4) AS volume
         FROM j GROUP BY ROLLUP(qt) ORDER BY qt NULLS FIRST""",
    // b49: the raw (updateTime, price) tick list of one token's sales.
    "b49_token_price_history_raw" ->
      """SELECT l_shipdate AS update_ts, l_extendedprice AS price
         FROM lineitem WHERE l_partkey = 42
         ORDER BY update_ts, price""",
    // b50: listTransactions' pipeline order replayed literally — each
    // branch sorts and truncates to page*pageSize BEFORE anything
    // joins, the union re-sorts globally, the page slices, and only
    // then the null-preserving buyer lookup runs (order/ship resolve
    // via orders→customer; event arms have no order behind them →
    // NULL buyer, the reference's preserveNullAndEmptyArrays). Sort
    // keys are unique per branch ((kind, orderkey, seq)), so every
    // LIMIT is deterministic. Event day = epoch-day arithmetic on
    // epoch_ms (the A-module time rule).
    "b50_transactions_union" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day,
             'order' AS kind, o_orderkey AS orderkey, 0 AS seq,
             o_totalprice AS amount
           FROM orders ORDER BY day DESC, orderkey DESC, seq LIMIT 50),
         sh AS (SELECT CAST(l_shipdate AS DATE) AS day, 'ship' AS kind,
             l_orderkey AS orderkey, l_linenumber AS seq,
             l_extendedprice AS amount
           FROM lineitem ORDER BY day DESC, orderkey DESC, seq LIMIT 50),
         pu AS (SELECT DATE '1970-01-01'
               + ((epoch_ms(ts) // 86400000)::INT) AS day,
             'purchase' AS kind, event_id AS orderkey, 0 AS seq,
             value AS amount
           FROM events WHERE event_type = 'purchase'
           ORDER BY day DESC, orderkey DESC, seq LIMIT 50),
         ck AS (SELECT DATE '1970-01-01'
               + ((epoch_ms(ts) // 86400000)::INT) AS day,
             'click' AS kind, event_id AS orderkey, 0 AS seq,
             value AS amount
           FROM events WHERE event_type = 'click'
           ORDER BY day DESC, orderkey DESC, seq LIMIT 50),
         u AS (SELECT * FROM o UNION ALL SELECT * FROM sh
               UNION ALL SELECT * FROM pu UNION ALL SELECT * FROM ck),
         pg AS (SELECT * FROM u
                ORDER BY day DESC, kind, orderkey DESC, seq
                LIMIT 25 OFFSET 25),
         res AS (SELECT pg.kind, pg.day, pg.orderkey, pg.seq, pg.amount,
                   c_name AS buyer
                 FROM pg JOIN orders ON pg.orderkey = o_orderkey
                         JOIN customer ON o_custkey = c_custkey
                 WHERE pg.kind IN ('order', 'ship')),
         evp AS (SELECT kind, day, orderkey, seq, amount,
                   NULL AS buyer
                 FROM pg WHERE kind NOT IN ('order', 'ship'))
         SELECT * FROM (SELECT * FROM res UNION ALL SELECT * FROM evp)
         ORDER BY day DESC, kind, orderkey DESC, seq""",
    // b51-b54: the b36 page under getSortOfToken's remaining modes
    // (1 = creation desc, 2 = listing asc, 3 = creation asc,
    // 5 = price desc; b55 shares b52's replay).
    "b51_sorted_created_desc" ->
      """SELECT o_orderkey, o_totalprice, c_name,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY o_orderkey DESC LIMIT 20""",
    "b52_sorted_oldest" ->
      """SELECT o_orderkey, o_totalprice, c_name,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY o_orderdate ASC, o_orderkey LIMIT 20""",
    "b53_sorted_created_asc" ->
      """SELECT o_orderkey, o_totalprice, c_name,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY o_orderkey ASC LIMIT 20""",
    "b54_sorted_price_desc" ->
      """SELECT o_orderkey, o_totalprice, c_name,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
  )
}
